"""Structured Streaming layer: the reference's streaming semantics
(SURVEY.md §2A S1-S3, D1, A0, M1-M6) on Spark's micro-batch engine."""
