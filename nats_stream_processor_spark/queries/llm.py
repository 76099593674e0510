"""LLM-training-data pipeline queries (north star): deduplication,
similarity search, text analysis, multimodal plumbing.

Populated incrementally; operators live in operators/dedup.py,
operators/similarity.py, operators/textstats.py, operators/multimodal.py.
"""

from __future__ import annotations
