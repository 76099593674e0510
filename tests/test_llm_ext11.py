"""Correctness of the round-11 second-wave operators (queries/llm_ext11.py):

- events_moments_merge: plain-Python replication at sf0.001 (quantize ->
  exact integer power sums -> the same IEEE op sequence), a planted
  known-moments fixture (explicit mean/variance/skewness of a hand
  analyzable value set), and the merge theorem itself — per-hour partials
  merged must equal a direct single-group computation bit-for-bit because
  the sums are integers.
- ivm_agg_delta: the equality flag must be TRUE for every group (it is a
  theorem of the exact-decimal discipline, asserted at sf0.001), the
  base/delta decomposition must cover the table, and a planted fixture
  pins the watermark boundary (an order AT the watermark timestamp is
  delta, one microsecond before is base).
"""

from __future__ import annotations

import math

import pytest

from nats_stream_processor_spark import registry
from tests.conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _release():
    yield
    registry.release_pins()


# ------------------------------------------------ events_moments_merge


def _py_moments(values):
    """The module's documented estimator, replicated in plain Python:
    unit-grid quantization, exact integer power sums, then the pinned
    IEEE op sequence."""
    vs = [math.floor(v + 0.5) for v in values]
    n = len(vs)
    s1, s2, s3 = sum(vs), sum(v * v for v in vs), sum(v ** 3 for v in vs)
    nd = float(n)
    mean = s1 / nd
    ex2 = s2 / nd
    var = s2 / nd - mean * mean
    skew = (s3 / nd - 3.0 * mean * ex2 + 2.0 * mean ** 3) / (
        math.sqrt(var) * var)

    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    return n, r6(mean), r6(var), r6(skew)


def test_moments_merge_matches_python_reference(spark):
    import duckdb
    rows = {r["event_type"]: r for r in registry.REGISTRY[
        "events_moments_merge"].fn(spark, SF_SMOKE).collect()}
    raw = duckdb.sql(
        f"SELECT event_type, value FROM '{SF_SMOKE}/events.parquet' "
        "WHERE value IS NOT NULL").fetchall()
    by_type: dict[str, list[float]] = {}
    for t, v in raw:
        by_type.setdefault(t, []).append(v)
    assert set(rows) == set(by_type)
    for t, vals in by_type.items():
        n, mean, var, skew = _py_moments(vals)
        r = rows[t]
        assert r["n_events"] == n
        assert r["mean_value"] == pytest.approx(mean, abs=1e-9)
        assert r["variance"] == pytest.approx(var, abs=1e-9)
        assert r["skewness"] == pytest.approx(skew, abs=1e-9)
        assert r["n_hours"] >= 1


def test_moments_merge_planted_known_values(spark, tmp_path):
    """Values {0, 0, 0, 12} per type: mean 3, variance 27,
    skewness (E[x^3] - 3 m E[x^2] + 2 m^3) / var^1.5
    = (432 - 3*3*36 + 54) / 27^1.5 = 162 / 140.296... = 2/sqrt(3)."""
    import datetime as dt
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i, v in enumerate([0.0, 0.0, 0.0, 12.0]):
        # spread across two hours -> n_hours == 2, so the asserted
        # equality exercises an actual merge of unequal partials
        rows.append((i, base + dt.timedelta(hours=i % 2), 1, "t", v, "{}"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "events.parquet"))
    out = registry.REGISTRY["events_moments_merge"].fn(
        spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_hours"] == 2 and r["n_events"] == 4
    assert r["mean_value"] == 3.0
    assert r["variance"] == 27.0
    expected_skew = math.floor(2 / math.sqrt(3) * 1e6 + 0.5) / 1e6
    assert r["skewness"] == expected_skew


def test_moments_partials_merge_exactly_to_direct(spark):
    """The merge theorem: because power sums are exact integers, the
    hourly-partial route must equal a direct per-type aggregate not
    approximately but on the ROUNDED 6-dp outputs exactly."""
    from pyspark.sql import functions as F
    from nats_stream_processor_spark.operators import similarity as sim
    from nats_stream_processor_spark.registry import table

    merged = {r["event_type"]: r for r in registry.REGISTRY[
        "events_moments_merge"].fn(spark, SF_SMOKE).collect()}
    ev = table(spark, SF_SMOKE, "events")
    q = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.floor(F.col("value") + F.lit(0.5)).cast("long").alias("v"))
    dec = "decimal(38,0)"
    direct = (q.groupBy("event_type")
              .agg(F.count("*").alias("n"),
                   F.sum(F.col("v").cast(dec)).alias("s1"),
                   F.sum((F.col("v") * F.col("v")).cast(dec)).alias("s2"),
                   F.sum((F.col("v") * F.col("v") * F.col("v")).cast(dec))
                    .alias("s3"))
              .select("event_type", "n",
                      (F.col("s1").cast("double") / F.col("n").cast("double"))
                      .alias("mean"),
                      (F.col("s2").cast("double") / F.col("n").cast("double"))
                      .alias("ex2"),
                      F.col("s3").cast("double").alias("s3d"),
                      F.col("n").cast("double").alias("nd")))
    for r in direct.collect():
        mean = r["mean"]
        var = r["ex2"] - mean * mean
        skew = (r["s3d"] / r["nd"] - 3.0 * mean * r["ex2"]
                + 2.0 * mean * mean * mean) / (math.sqrt(var) * var)

        def r6(x):
            return math.floor(x * 1e6 + 0.5) / 1e6

        m = merged[r["event_type"]]
        assert m["mean_value"] == r6(mean)
        assert m["variance"] == r6(var)
        assert m["skewness"] == r6(skew)


# ------------------------------------------------------- ivm_agg_delta


def test_ivm_equality_flag_is_always_true(spark):
    out = registry.REGISTRY["ivm_agg_delta"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 5  # one per o_orderpriority
    for r in out:
        assert r["merged_eq_full"] is True
        assert r["n_base"] + r["n_delta"] == r["n_total"]
    # the watermark must actually split the table, or the proof is vacuous
    assert sum(r["n_base"] for r in out) > 0
    assert sum(r["n_delta"] for r in out) > 0


def test_ivm_planted_watermark_boundary(spark, tmp_path):
    """An order AT the watermark instant belongs to the delta; one
    microsecond earlier belongs to the base (>= semantics, pinned)."""
    import datetime as dt
    from nats_stream_processor_spark.queries.llm_ext11 import IVM_WATERMARK
    wm = dt.datetime.fromisoformat(IVM_WATERMARK)
    rows = [
        (1, 1, "O", 10.0, wm, "1-URGENT"),                    # delta
        (2, 1, "O", 20.0, wm - dt.timedelta(microseconds=1),  # base
         "1-URGENT"),
        (3, 1, "O", 40.0, wm + dt.timedelta(days=1), "5-LOW"),  # delta
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "orders.parquet"))
    out = {r["o_orderpriority"]: r for r in registry.REGISTRY[
        "ivm_agg_delta"].fn(spark, str(tmp_path)).collect()}
    assert out["1-URGENT"]["n_base"] == 1
    assert out["1-URGENT"]["n_delta"] == 1
    assert out["1-URGENT"]["revenue_total"] == 30.0
    assert out["5-LOW"]["n_base"] == 0
    assert out["5-LOW"]["n_delta"] == 1
    assert all(r["merged_eq_full"] for r in out.values())
