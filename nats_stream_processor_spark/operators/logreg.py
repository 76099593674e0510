"""Distributed logistic-regression training by full-batch gradient
descent — the quality-classifier trainer a curation pipeline bootstraps
from weak labels (here: predict `lang == 'en'` from the deterministic
text-quality signals).

This is the complement of operators/kmeans.py's SAMPLED training: the
logistic gradient is a plain sum over rows, so training distributes
natively — each round is ONE pass over the (cached) feature projection
producing |w| exact partial sums, and only the tiny gradient vector
reaches the driver. The 100 TB shape is identical: cache/checkpoint the
features once, then R scans with map-side partial aggregation.

Cross-engine determinism (the DuckDB oracle REPLAYS training round by
round and value-checks the learned weights):

- Features are exact: round6_stable ratios and single-division
  normalizations — bit-identical in both engines.
- Per-row gradient contributions (p - y) * x_j quantize to a 1e-9 int
  grid BEFORE summation (floor(g*1e9 + 0.5) as int), so the per-round
  sums are exact and partition-order-independent; sums accumulate in
  DECIMAL(38,0)/HUGEINT so no corpus size overflows them. A 1-ulp
  libm exp() difference can flip a boundary-straddling row's quantized
  cell by one — that moves a weight by ~lr/(n*1e9) per round, absorbed
  by the final 6-dp emit (same accepted hazard class as the
  entropy/JS-divergence queries).
- The driver-side update w -= lr * ((float(G)/1e9)/n) is the same IEEE
  op sequence the oracle's CTE chain performs (int->double conversions
  are correctly rounded in both), so the weights stay bit-identical
  round for round.
- lr = 0.5 (dyadic), fixed ROUNDS (no convergence test on floats),
  zero-initialized weights (no RNG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import round6_stable_sql
from .textstats import quality_cols, quality_sql

LR = 0.5
ROUNDS = 5
GRAD_QUANT = 1e9

FEATURES = ("bias", "punct_ratio", "stopword_ratio", "len_norm")


def feature_cols(text: Column) -> dict[str, Column]:
    """Deterministic feature map; every value is bit-identical across
    engines (see module doc)."""
    q = quality_cols(text)
    from ..functions.text import tokens_col

    n_tok = F.size(tokens_col(text))
    return {
        "bias": F.lit(1.0),
        "punct_ratio": q["punct_ratio"],
        "stopword_ratio": q["stopword_ratio"],
        "len_norm": F.least(n_tok, F.lit(100)) / F.lit(100.0),
    }


def feature_sql(expr: str) -> dict[str, str]:
    q = quality_sql(expr)
    from ..functions.text import TOKEN_RE

    n_tok = f"len(regexp_extract_all(lower({expr}), '{TOKEN_RE}'))"
    return {
        "bias": "CAST(1.0 AS DOUBLE)",
        "punct_ratio": q["punct_ratio"],
        "stopword_ratio": q["stopword_ratio"],
        "len_norm": f"(least({n_tok}, 100) / 100.0)",
    }


def _margin(weights: list[float]) -> Column:
    m = F.lit(0.0)
    for w, name in zip(weights, FEATURES):
        m = m + F.lit(w) * F.col(f"x_{name}")
    return m


def margin_sql(w_prefix: str) -> str:
    """Margin with weights from a cross-joined 1-row CTE — same
    left-associated fold as :func:`_margin`."""
    e = "CAST(0.0 AS DOUBLE)"
    for name in FEATURES:
        e = f"({e} + {w_prefix}.w_{name} * f.x_{name})"
    return e


def train_logreg(feat: DataFrame, rounds: int = ROUNDS,
                 lr: float = LR) -> list[float]:
    """Full-batch GD; ``feat`` must have columns y (double) and
    x_<feature> for every FEATURES entry. Returns the final weights.
    Collects |w| decimal sums per round — nothing else leaves the
    executors."""
    n = feat.count()
    weights = [0.0] * len(FEATURES)
    qf = F.lit(GRAD_QUANT)
    for _ in range(rounds):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(weights)))
        sums = feat.agg(*[
            F.sum(F.floor((p - F.col("y")) * F.col(f"x_{name}") * qf
                          + F.lit(0.5)).cast("long").cast("decimal(38,0)"))
            .alias(f"g_{name}")
            for name in FEATURES
        ]).collect()[0]
        weights = [
            w - lr * ((float(int(sums[f"g_{name}"])) / GRAD_QUANT) / n)
            for w, name in zip(weights, FEATURES)
        ]
    return weights


def logreg_train_cte_sql(rounds: int = ROUNDS, lr: float = LR) -> str:
    """CTE chain replaying training round for round. Expects a CTE
    ``feat`` with y and x_<feature> columns; emits ``w{rounds}`` holding
    the final weights and ``nn`` holding the row count."""
    parts = [
        "nn AS (SELECT count(*) AS n FROM feat)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS w_{f}" for f in FEATURES)
        + ")",
    ]
    for r in range(1, rounds + 1):
        wp = f"w{r - 1}"
        prob = f"(1.0 / (1.0 + exp(-{margin_sql('w')})))"
        gsums = ", ".join(
            f"sum(CAST(floor(({prob} - f.y) * f.x_{name} * {GRAD_QUANT!r}"
            f" + 0.5) AS BIGINT)) AS g_{name}"
            for name in FEATURES
        )
        parts.append(f"g{r} AS (SELECT {gsums} FROM feat f CROSS JOIN {wp} w)")
        upd = ", ".join(
            f"w.w_{name} - {lr!r} * ((CAST(g.g_{name} AS DOUBLE)"
            f" / {GRAD_QUANT!r}) / nn.n) AS w_{name}"
            for name in FEATURES
        )
        parts.append(
            f"w{r} AS (SELECT {upd} FROM {wp} w CROSS JOIN g{r} g"
            f" CROSS JOIN nn)")
    return ",\n".join(parts)


def weights_rows_sql(rounds: int = ROUNDS) -> str:
    """UNPIVOT of the final weight row into (feature, weight) pairs, in
    FEATURES order via a literal position column."""
    arms = " UNION ALL ".join(
        f"SELECT {i} AS pos, '{name}' AS feature,"
        f" {round6_stable_sql(f'w_{name}')} AS weight FROM w{rounds}"
        for i, name in enumerate(FEATURES)
    )
    return f"({arms})"
