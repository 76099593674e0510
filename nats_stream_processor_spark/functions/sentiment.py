"""Deterministic lexicon sentiment classifier (stand-in for the reference's
RoBERTa int8 ONNX model).

Output shape and semantics mirror the reference exactly
(reference: src/sentiment.py:124-174):

- 3-class {negative, neutral, positive} with a numerically-stable softmax
  over class scores (reference: src/sentiment.py:22-25, max-subtracted);
- ``sentiment`` = argmax with numpy argmax tie-breaking (first index wins,
  index order negative=0, neutral=1, positive=2 — reference:
  src/sentiment.py:35,156-158);
- ``confidence`` = max probability;
- the 0.4 confidence gate is applied OUTSIDE this function, between the
  sentiment and topic stages (reference: src/service.py:118-120).

Scores: pos = #positive-lexicon tokens, neg = #negative-lexicon tokens,
neutral = constant bias 1.0. Pure function of ``text``; the SQL builder
emits the identical computation in DuckDB dialect so the oracle can verify
it bit-for-bit (floats rounded to FLOAT_ROUND_DP, see config.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..config import FLOAT_ROUND_DP, SENTIMENT_CONFIDENCE_THRESHOLD
from .text import tokens_col, tokens_sql

# Lexicons cover both the synthetic documents vocabulary and the reference's
# smoke corpus ("This is a great day!" / "I hate this weather" —
# reference: docker-compose.yml:31-32).
POSITIVE_WORDS = (
    "fast", "big", "value", "great", "good", "love", "happy", "best",
    "win", "awesome", "excellent", "nice",
)
NEGATIVE_WORDS = (
    "slow", "small", "dup", "hate", "bad", "terrible", "worst", "sad",
    "awful", "error", "fail", "broken",
)
# Constant "neutral" logit. Below 1.0 so a single lexicon hit decides the
# class (at 1.0 a one-hit text ties the bias and the numpy-argmax tie-break
# would label it neutral, unlike the reference model on its smoke corpus
# "This is a great day!" -> positive, docker-compose.yml:31).
NEUTRAL_BIAS = 0.5

LABELS = ("negative", "neutral", "positive")  # index order = reference id2label


def _count_in(tokens: Column, words: tuple[str, ...]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def sentiment_struct(text: Column | str, dp: int = FLOAT_ROUND_DP) -> Column:
    """struct<sentiment string, confidence double,
    probabilities struct<negative,neutral,positive double>>"""
    toks = tokens_col(text)
    neg = _count_in(toks, NEGATIVE_WORDS).cast("double")
    pos = _count_in(toks, POSITIVE_WORDS).cast("double")
    neu = F.lit(NEUTRAL_BIAS)
    mx = F.greatest(neg, neu, pos)
    e_neg, e_neu, e_pos = (F.exp(x - mx) for x in (neg, neu, pos))
    denom = e_neg + e_neu + e_pos
    p_neg, p_neu, p_pos = (F.round(e / denom, dp) for e in (e_neg, e_neu, e_pos))
    # numpy-argmax tie-breaking: first max in index order neg, neu, pos.
    label = (
        F.when((neg >= neu) & (neg >= pos), F.lit("negative"))
        .when(neu >= pos, F.lit("neutral"))
        .otherwise(F.lit("positive"))
    )
    conf = F.greatest(p_neg, p_neu, p_pos)
    return F.struct(
        label.alias("sentiment"),
        conf.alias("confidence"),
        F.struct(
            p_neg.alias("negative"), p_neu.alias("neutral"), p_pos.alias("positive")
        ).alias("probabilities"),
    )


def confidence_gate(sentiment: Column | str,
                    threshold: float = SENTIMENT_CONFIDENCE_THRESHOLD) -> Column:
    """F5: rows below the sentiment-confidence threshold are dropped before
    the topic stage (reference: src/sentiment.py:108-115, src/service.py:118-120)."""
    c = F.col(sentiment) if isinstance(sentiment, str) else sentiment
    return c["confidence"] >= F.lit(threshold)


# ---------------------------------------------------------------- SQL twin
#
# Composed as a CTE chain (see topics.py for the pattern):
#   WITH d AS (SELECT *, {tokens_sql('text')} AS toks FROM documents),
#        c AS (SELECT *, {sentiment_count_sql_defs('toks')} FROM d)
#   SELECT {sentiment_sql_columns()} FROM c


def sentiment_count_sql_defs(toks_expr: str = "toks") -> str:
    """SELECT-list fragment defining ``sc_neg`` / ``sc_pos`` lexicon counts."""
    def in_list(words: tuple[str, ...]) -> str:
        lits = ", ".join(f"'{w}'" for w in words)
        return f"CAST(len(list_filter({toks_expr}, t -> t IN ({lits}))) AS DOUBLE)"
    return (
        f"{in_list(NEGATIVE_WORDS)} AS sc_neg, {in_list(POSITIVE_WORDS)} AS sc_pos"
    )


def sentiment_sql_columns(dp: int = FLOAT_ROUND_DP) -> dict[str, str]:
    """DuckDB SQL fragments over the ``sc_neg``/``sc_pos`` count columns.

    Returns {name: sql_expr} for: sentiment, confidence, p_negative,
    p_neutral, p_positive — same values as :func:`sentiment_struct`.
    """
    neg, pos, neu = "sc_neg", "sc_pos", f"{NEUTRAL_BIAS:.1f}"
    mx = f"greatest({neg}, {neu}, {pos})"
    e = {k: f"exp({v} - {mx})" for k, v in {"neg": neg, "neu": neu, "pos": pos}.items()}
    denom = f"({e['neg']} + {e['neu']} + {e['pos']})"
    p = {k: f"round({v} / {denom}, {dp})" for k, v in e.items()}
    label = (
        f"CASE WHEN {neg} >= {neu} AND {neg} >= {pos} THEN 'negative' "
        f"WHEN {neu} >= {pos} THEN 'neutral' ELSE 'positive' END"
    )
    conf = f"greatest({p['neg']}, {p['neu']}, {p['pos']})"
    return {
        "sentiment": label,
        "confidence": conf,
        "p_negative": p["neg"],
        "p_neutral": p["neu"],
        "p_positive": p["pos"],
    }
