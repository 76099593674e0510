"""ANN quality: recall of the approximate paths against brute force.

Oracle parity proves each ANN query computes ITS OWN definition correctly;
this asserts the definitions are *good* — the approximate neighbor sets
actually recover most of the exact top-k. Bounds are set below measured
values (IVF ≈ 0.92-0.94, multi-table LSH ≈ 0.64-0.66 on the test corpus)
with slack for corpus regeneration.
"""

from __future__ import annotations

import pytest

from nats_stream_processor_spark import registry

SF = "/root/testdata/sf0.01"


def pairs(spark, name):
    return {(r.query_id, r.neighbor_id)
            for r in registry.REGISTRY[name].fn(spark, SF).collect()}


@pytest.mark.parametrize("name,min_recall", [
    ("sim_ann_ivf", 0.8),   # nprobe=2/nlist=16 — probes 1/8 of the corpus
    ("sim_ann_lsh", 0.5),   # L=8 tables x 4 planes, union of collisions
])
def test_ann_recall_vs_brute_force(spark, name, min_recall):
    exact = pairs(spark, "sim_cosine_topk")
    approx = pairs(spark, name)
    recall = len(approx & exact) / len(exact)
    assert recall >= min_recall, f"{name} recall {recall:.2f} < {min_recall}"


def test_pq_recall_vs_exact_l2(spark):
    """PQ ranks by L2 (not cosine), so its floor is measured against the
    exact squared-L2 top-5. ~0.2 measured on these i.i.d. synthetic
    embeddings (no cluster structure -> distance concentration); the floor
    guards against machinery regressions, not literature-grade recall."""
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    exact = set()
    for qid in range(10):
        q = vecs[qid]
        d = sorted(((sum((a - b) ** 2 for a, b in zip(q, vecs[v])), v)
                    for v in vecs if v != qid))
        exact |= {(qid, v) for _, v in d[:5]}
    approx = pairs(spark, "sim_ann_pq")
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.1, f"pq recall {recall:.2f}"
