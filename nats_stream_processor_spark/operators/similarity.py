"""Similarity search over embedding columns (array<float>).

Two paths, mirroring what a 100 TB pipeline needs:

- Brute-force cosine top-k: broadcast the (small) query set against the
  corpus, fold the dot product JVM-side, rank per query. Exact; cost is
  |Q| x |corpus| dot products with NO shuffle of the corpus (queries are
  broadcast), so it scales linearly in corpus size for bounded |Q|.
- LSH-bucketed ANN: sign-random-projection buckets (pinned hyperplanes) on
  both sides; candidates = bucket collisions; exact cosine within bucket.
  Sub-linear candidate sets; recall < 1 by construction (single table —
  production would union several hyperplane tables to trade compute for
  recall; the plan shape is identical).

Determinism: hyperplane weights derive from md5 (functions/hashing.py) at
Python build time and are embedded as literals in both engines' plans; dot
products fold left-to-right over the same element order in both engines, so
values are bit-identical and every query here is oracle-checkable.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

EMBED_DIM = 64
LSH_PLANES = 4  # 16 buckets — sized for the test corpus; see module doc


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def hyperplanes(planes: int = LSH_PLANES, dim: int = EMBED_DIM) -> list[list[float]]:
    """Pinned pseudo-random hyperplanes in [-1, 1]^dim."""
    return [
        [((_h32(f"{p}_{d}") % 2001) - 1000) / 1000.0 for d in range(dim)]
        for p in range(planes)
    ]


def as_double(arr: Column) -> Column:
    """Cast array<float> to array<double> BEFORE any arithmetic — per-element
    widening is exact, so both engines then do identical double math."""
    return F.transform(arr, lambda x: x.cast("double"))


def as_double_sql(expr: str) -> str:
    return f"list_transform({expr}, x -> CAST(x AS DOUBLE))"


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of the element products — same summation order as
    the DuckDB twin, hence bit-identical doubles."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str, dim: int = EMBED_DIM) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i])), "
        f"(acc, v) -> acc + v)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a: str, dim: int = EMBED_DIM) -> str:
    return f"sqrt({dot_sql(a, a, dim)})"


def cosine(dot_ab: Column, norm_a: Column, norm_b: Column, dp: int = 6) -> Column:
    return F.round(dot_ab / (norm_a * norm_b), dp)


def plane_lit(weights: list[float]) -> Column:
    return F.array(*[F.lit(w) for w in weights])


def plane_sql(weights: list[float]) -> str:
    return "[" + ", ".join(repr(w) for w in weights) + "]"


def lsh_bucket(demb: Column, planes: list[list[float]] | None = None) -> Column:
    """Sign-random-projection bucket id: bit p = (dot(w_p, v) >= 0)."""
    planes = planes or hyperplanes()
    bucket = F.lit(0)
    for p, w in enumerate(planes):
        bucket = bucket + F.when(dot(plane_lit(w), demb) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


LSH_TABLES = 8  # hash tables unioned for recall (multi-probe tradeoff)


def lsh_buckets_multi(demb: Column, tables: int = LSH_TABLES,
                      planes: int = LSH_PLANES) -> Column:
    """Array of per-table sign-random-projection bucket ids (each table its
    own pinned hyperplane set). Candidates = collision in ANY table:
    recall 1-(1-p^b)^L instead of p^b — compute traded for recall by L,
    the standard multi-table LSH layout."""
    all_planes = hyperplanes(tables * planes)
    return F.array(*[
        lsh_bucket(demb, all_planes[t * planes:(t + 1) * planes])
        for t in range(tables)
    ])


def lsh_buckets_multi_sql(demb_expr: str, tables: int = LSH_TABLES,
                          planes: int = LSH_PLANES,
                          dim: int = EMBED_DIM) -> str:
    all_planes = hyperplanes(tables * planes)
    exprs = [
        lsh_bucket_sql(demb_expr, all_planes[t * planes:(t + 1) * planes], dim)
        for t in range(tables)
    ]
    return "[" + ", ".join(exprs) + "]"


def lsh_bucket_sql(demb_expr: str, planes: list[list[float]] | None = None,
                   dim: int = EMBED_DIM) -> str:
    planes = planes or hyperplanes()
    terms = [
        f"(CASE WHEN {dot_sql(plane_sql(w), demb_expr, dim)} >= 0 "
        f"THEN {1 << p} ELSE 0 END)"
        for p, w in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"
