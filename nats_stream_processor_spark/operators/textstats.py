"""Text-analysis operators for LLM training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All are pure Column expressions (JVM-side, whole-stage codegen — no Python
in the hot path) with DuckDB SQL twins for the oracle. The reference's only
text analysis is its two classifiers (SURVEY.md §2B "LLM-pipeline: text
analysis"); these generalize that to the standard corpus-curation stats.

Determinism discipline: all formulas are rational arithmetic (no libm) so
cross-engine values are bit-identical after round(., 6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..functions.hashing import (
    FINGERPRINT_MOD,
    FINGERPRINT_MULT,
    hash32_sql_duck,
)
from ..functions.text import TOKEN_RE, tokens_col
from .similarity import round6_stable, round6_stable_sql

PUNCT_RE = "[^a-zA-Z0-9 ]"

# Stopword list for the quality score (English function words; the corpus
# vocabulary is English-ish regardless of the `lang` column).
STOPWORDS = ("a", "the", "is", "this", "of", "and", "to", "in", "for", "on")

# Per-language marker words for the n-gram-heuristic language ID. The
# classifier is the operator under test, not a linguistics claim — markers
# are frequent function words per language.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en": ("the", "is", "and", "of", "to", "a", "this"),
    "es": ("el", "los", "las", "es", "una", "para"),
    "fr": ("le", "la", "les", "est", "une", "pour"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}
LANG_CODES = tuple(sorted(LANG_MARKERS))  # tie-break order


def token_stats_cols(text: Column) -> dict[str, Column]:
    """n_chars / whitespace tokens / regex tokens / BPE-ish estimate."""
    toks = tokens_col(text)
    n_chars = F.length(text)
    ws = F.when(
        F.length(F.trim(text)) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(text), r"\s+")))
    return {
        "n_chars": n_chars,
        "n_ws_tokens": ws,
        "n_re_tokens": F.size(toks),
        # crude BPE estimate: ~4 chars/token (standard rule of thumb)
        "est_bpe_tokens": F.ceil(n_chars / 4.0).cast("int"),
        "n_punct": F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)),
    }


def token_stats_sql(expr: str) -> dict[str, str]:
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"
    return {
        "n_chars": f"length({expr})",
        "n_ws_tokens": (
            f"CASE WHEN length(trim({expr})) = 0 THEN 0 "
            f"ELSE len(string_split_regex(trim({expr}), '\\s+')) END"
        ),
        "n_re_tokens": f"len({toks})",
        "est_bpe_tokens": f"CAST(ceil(length({expr}) / 4.0) AS INT)",
        "n_punct": f"len(regexp_extract_all({expr}, '{PUNCT_RE}'))",
    }


def quality_cols(text: Column) -> dict[str, Column]:
    """Deterministic quality score in [0,1]:

    0.4 * min(n_tokens,100)/100        (length credit)
    + 0.3 * (1 - punct_ratio)          (clean-text credit)
    + 0.3 * (1 - |stopword_ratio-0.4|) (natural-language credit)

    Rational arithmetic only — no exp/log — so the oracle matches exactly.
    """
    toks = tokens_col(text)
    n_tok = F.size(toks)
    n_chars = F.greatest(F.length(text), F.lit(1))
    punct_ratio = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0)) / n_chars
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    score = (
        0.4 * F.least(n_tok, F.lit(100)) / 100.0
        + 0.3 * (1.0 - punct_ratio)
        + 0.3 * (1.0 - F.abs(stop_ratio - 0.4))
    )
    bucket = (
        F.when(score >= 0.75, "high").when(score >= 0.55, "medium").otherwise("low")
    )
    # round6_stable, not F.round: these are int/int ratios, which can land
    # exactly on a 7th-decimal half-boundary where engine round() builtins
    # disagree (see operators/similarity.round6_stable).
    return {
        "punct_ratio": round6_stable(punct_ratio),
        "stopword_ratio": round6_stable(stop_ratio),
        "quality_score": round6_stable(score),
        "quality_bucket": bucket,
    }


def quality_sql(expr: str) -> dict[str, str]:
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"
    n_tok = f"len({toks})"
    n_chars = f"greatest(length({expr}), 1)"
    punct = f"(len(regexp_extract_all({expr}, '{PUNCT_RE}')) / CAST({n_chars} AS DOUBLE))"
    stops = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_ratio = (
        f"(len(list_filter({toks}, t -> t IN ({stops})))"
        f" / CAST(greatest({n_tok}, 1) AS DOUBLE))"
    )
    score = (
        f"(0.4 * least({n_tok}, 100) / 100.0 + 0.3 * (1.0 - {punct})"
        f" + 0.3 * (1.0 - abs({stop_ratio} - 0.4)))"
    )
    bucket = (
        f"CASE WHEN {score} >= 0.75 THEN 'high' "
        f"WHEN {score} >= 0.55 THEN 'medium' ELSE 'low' END"
    )
    return {
        "punct_ratio": round6_stable_sql(punct),
        "stopword_ratio": round6_stable_sql(stop_ratio),
        "quality_score": round6_stable_sql(score),
        "quality_bucket": bucket,
    }


def lang_id_cols(text: Column) -> dict[str, Column]:
    """Marker-word language ID: per-language hit counts -> argmax with
    alphabetical tie-break; 'und' when nothing matches."""
    toks = tokens_col(text)
    codes = F.array(*[F.lit(c) for c in LANG_CODES])

    def _hit(words: tuple[str, ...]):
        # closure factory — a default-arg lambda would change the arity
        # F.filter sees
        return lambda t: t.isin(*words)

    cnts = F.array(*[
        F.size(F.filter(toks, _hit(LANG_MARKERS[c]))) for c in LANG_CODES
    ])
    mx = F.array_max(cnts)
    pred = F.when(mx == 0, F.lit("und")).otherwise(
        F.element_at(codes, F.array_position(cnts, mx).cast("int"))
    )
    return {"pred_lang": pred, "lang_score": mx}


def lang_id_sql(expr: str) -> dict[str, str]:
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"
    cnt = {}
    for c in LANG_CODES:
        words = ", ".join(f"'{w}'" for w in LANG_MARKERS[c])
        cnt[c] = f"len(list_filter({toks}, t -> t IN ({words})))"
    mx = "greatest(" + ", ".join(cnt.values()) + ")"
    pred = (
        f"CASE WHEN {mx} = 0 THEN 'und' "
        + " ".join(f"WHEN {cnt[c]} = {mx} THEN '{c}'" for c in LANG_CODES[:-1])
        + f" ELSE '{LANG_CODES[-1]}' END"
    )
    return {"pred_lang": pred, "lang_score": mx}


def fingerprint_col(text: Column) -> Column:
    """Rolling polynomial hash (Rabin-Karp) over the token stream:
    h = fold(tokens, 0, (h, t) -> (h*31 + hash32(t)) mod 1e9+7).
    Order-sensitive (unlike a bag-of-words hash) and bounded — the
    standard cheap document fingerprint for exact-ish dedup at scale."""
    toks = tokens_col(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (
            h * FINGERPRINT_MULT
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        ) % FINGERPRINT_MOD,
    )


def fingerprint_sql(expr: str) -> str:
    toks = f"regexp_extract_all(lower({expr}), '{TOKEN_RE}')"
    h32 = hash32_sql_duck("t")
    # DuckDB's list_reduce has no init argument (first element seeds the
    # fold); prepending 0 reproduces Spark's aggregate(toks, 0, ...).
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> {h32})), "
        f"(h, x) -> (h * {FINGERPRINT_MULT} + x) % {FINGERPRINT_MOD})"
    )
