"""Reusable Spark operator implementations.

Each module re-expresses a family of reference operators (SURVEY.md §2)
as composable DataFrame transforms:

- windows.py     — cumulative / moving / lag / latest-per-key analytics (§2.5)
- asof.py        — as-of (point-in-time) join (J10)
- pagination.py  — keyset pagination (L1)
- topk.py        — ranking & share-of-total (W11, A21, A22)
- dedup.py       — exact + fuzzy deduplication (D3-D7 + LLM-pipeline ops)
- similarity.py  — embedding similarity search (LLM-pipeline ops)
"""
