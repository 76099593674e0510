"""Correctness of the late round-12 operators (queries/llm_ext13.py,
behind the r12 window — honest headers in the module):

- sim_ivf_list_balance: numpy replication of the whole report from the
  same trained centroids (assignment argmax with the operator's
  cosine/tie-break, sizes, ppm/load integer arithmetic), totals
  conservation, and a planted-skew corpus where the overload verdict
  must fire.
- quality_gate_agreement: plain-Python composition against all three
  certified parent operators (quality_filter_pipeline verdicts,
  quality_gopher_rules keep, score_quality_logreg probabilities) —
  confusion counts, agreement ppm, kappa — plus the kappa lattice
  (symmetric bounds) and the degenerate constant-gates NULL case on a
  planted corpus.
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


def _r6(x):
    return math.floor(x * 1e6 + 0.5) / 1e6


def test_ivf_list_balance_matches_numpy_reference(spark):
    import numpy as np
    import duckdb
    from nats_stream_processor_spark.operators import kmeans as km
    from nats_stream_processor_spark.operators import similarity as sim
    from nats_stream_processor_spark.queries.llm import IVF_NLIST
    from pyspark.sql import functions as F

    out = {r.cent_id: r for r in registry.REGISTRY[
        "sim_ivf_list_balance"].fn(spark, SF_SMOKE).collect()}
    registry.release_pins()
    assert set(out) == set(range(IVF_NLIST))

    e = registry.table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", sim.as_double(F.col("embedding")).alias("demb"))
    cents = np.array(km.train_ivf_centroids(e, IVF_NLIST))
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"'{SF_SMOKE}/embeddings.parquet' ORDER BY vec_id").fetchall()
    V = np.array([[float(x) for x in emb] for _, emb in raw])
    cos = (V @ cents.T) / (
        np.linalg.norm(V, axis=1)[:, None]
        * np.linalg.norm(cents, axis=1)[None, :])
    # operator tie-break: highest cosine, then lowest cent_id — argmax
    # on ties returns the first (lowest) index, matching row_number
    assign = cos.argmax(axis=1)
    sizes = {c: int((assign == c).sum()) for c in range(IVF_NLIST)}
    n = len(V)
    assert sum(r.n_vecs for r in out.values()) == n
    for c, r in out.items():
        assert r.n_vecs == sizes[c], c
        assert r.share_ppm == r.n_vecs * 1000000 // n
        assert r.load_x1000 == r.n_vecs * IVF_NLIST * 1000 // n
        assert r.overloaded == (r.load_x1000 >= 2000)


def test_ivf_list_balance_flags_planted_skew(spark, tmp_path):
    """Planted skew that k-means CANNOT balance away: 90% of vectors
    are exact duplicates of one vector (the duplicate-heavy corpus a
    dedup-less embedding pipeline produces). Even if training parks
    several centroids on the duplicate point, every copy's
    centroid-cosine ties resolve to the same lowest centroid id
    (row_number tie-break), so one list absorbs the whole mass — the
    overload verdict must fire, totals conserve, and every centroid
    row is present (empty lists included via the left join). A merely
    DENSE (not duplicate) cluster is balanced by the trainer — that
    is k-means doing its job, and an earlier draft of this test
    proved it empirically."""
    import numpy as np
    from nats_stream_processor_spark.queries.llm import IVF_NLIST

    rng = np.random.RandomState(11)
    dim = 8
    hub = rng.randn(dim)
    dense = np.tile(hub, (360, 1))  # exact duplicates
    sparse = rng.randn(40, dim)
    V = np.vstack([dense, sparse])
    spark.createDataFrame(
        [(int(i), [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "embeddings.parquet"))
    out = registry.REGISTRY["sim_ivf_list_balance"].fn(
        spark, str(tmp_path)).collect()
    assert len(out) == IVF_NLIST
    assert sum(r.n_vecs for r in out) == len(V)
    assert any(r.overloaded for r in out), [
        (r.cent_id, r.load_x1000) for r in out]


def test_gate_agreement_composes_parent_operators(spark):
    from nats_stream_processor_spark.queries.llm_ext13 import GATE_PAIRS

    out = {(r.gate_a, r.gate_b): r for r in registry.REGISTRY[
        "quality_gate_agreement"].fn(spark, SF_SMOKE).collect()}
    registry.release_pins()
    assert set(out) == set(GATE_PAIRS)

    c4 = {r.doc_id: 1 if r.verdict == "keep" else 0
          for r in registry.REGISTRY["quality_filter_pipeline"].fn(
              spark, SF_SMOKE).collect()}
    registry.release_pins()
    gopher = {r.doc_id: r.keep
              for r in registry.REGISTRY["quality_gopher_rules"].fn(
                  spark, SF_SMOKE).collect()}
    registry.release_pins()
    logreg = {r.doc_id: 1 if int(round(r.p_en * 1e6)) >= 500000 else 0
              for r in registry.REGISTRY["score_quality_logreg"].fn(
                  spark, SF_SMOKE).collect()}
    registry.release_pins()
    flags = {"c4": c4, "gopher": gopher, "logreg": logreg}
    docs = sorted(c4)
    assert sorted(gopher) == docs and sorted(logreg) == docs

    for (a, b), r in out.items():
        ka, kb = flags[a], flags[b]
        n11 = sum(1 for d in docs if ka[d] and kb[d])
        n10 = sum(1 for d in docs if ka[d] and not kb[d])
        n01 = sum(1 for d in docs if not ka[d] and kb[d])
        n00 = sum(1 for d in docs if not ka[d] and not kb[d])
        n = len(docs)
        assert (r.n_both, r.n_a_only, r.n_b_only, r.n_neither,
                r.n_docs) == (n11, n10, n01, n00, n), (a, b)
        assert r.agree_ppm == (n11 + n00) * 1000000 // n
        pa, pb = (n11 + n10) / n, (n11 + n01) / n
        pe = pa * pb + (1.0 - pa) * (1.0 - pb)
        if (n11 + n10 == n and n11 + n01 == n) or \
                (n11 + n10 == 0 and n11 + n01 == 0):
            assert r.kappa6 is None, (a, b)
        else:
            po = (n11 + n00) / n
            assert r.kappa6 == _r6((po - pe) / (1.0 - pe)), (a, b)
            assert r.kappa6 <= 1.0


def test_gate_agreement_constant_gates_yield_null_kappa(spark, tmp_path):
    """Planted corpus where C4 and Gopher both keep EVERY document
    (clean natural-English texts inside every threshold): the
    (c4, gopher) pair is the degenerate both-constant-and-equal case —
    kappa must be NULL (chance agreement is 1, the correction is
    undefined), agreement must be exactly 1e6 ppm, and the operator
    must not divide by zero on either engine (oracle run included)."""
    import duckdb
    stop = ("the and is of to a in that it with for on as are this be "
            "or an at by from")
    rows = []
    for i in range(40):
        body = " ".join(f"word{i}item{j}" for j in range(30))
        rows.append((i, f"{stop} {body} {stop}",
                     "en" if i % 2 == 0 else "fr"))
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(tmp_path / "documents.parquet"))
    entry = registry.REGISTRY["quality_gate_agreement"]
    out = {(r.gate_a, r.gate_b): r for r in
           entry.fn(spark, str(tmp_path)).collect()}
    r = out[("c4", "gopher")]
    assert (r.n_both, r.n_a_only, r.n_b_only, r.n_neither) == \
        (40, 0, 0, 0)
    assert r.agree_ppm == 1000000
    assert r.kappa6 is None
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet/*.parquet'")
    orc = {(a, b): k for a, b, *_rest, k in con.sql(entry.oracle).fetchall()}
    assert orc[("c4", "gopher")] is None
