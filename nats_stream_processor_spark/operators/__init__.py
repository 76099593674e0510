"""Operator library: pure DataFrame -> DataFrame transforms.

Each operator works identically on batch and streaming DataFrames (the
idiomatic Structured Streaming contract), and is designed shuffle-safe for
the 100 TB posture: no collect() in any path, broadcast hints on dimension
joins, aggregation is always partial+final via Catalyst.
"""

from .enrich import enrich_posts, enriched_route_counts  # noqa: F401
