"""Python-reference replication and invariants for graph_nn_descent
(queries/llm_ext7.py): the full stride-init + 2-round NN-Descent loop
recomputed in plain Python over the sf0.001 embeddings, plus the
monotone-convergence property the algorithm guarantees."""

from __future__ import annotations

import math

import pytest

from nats_stream_processor_spark import registry
from nats_stream_processor_spark.queries import llm_ext7 as x7

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release():
    yield
    registry.release_pins()


def _python_nn_descent(vecs):
    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    norms = {u: math.sqrt(fold_dot(v, v)) for u, v in vecs.items()}

    def ppm(u, w):
        return math.floor(fold_dot(vecs[u], vecs[w])
                          / (norms[u] * norms[w]) * 1e6 + 0.5)

    n = len(vecs)
    init = set()
    for u in vecs:
        for j in range(1, x7.ND_K + 1):
            w = (u + j * x7.ND_STRIDE) % n
            w = (w + (1 if w == u else 0)) % n
            if w != u:
                init.add((u, w))
    edges = {(u, w): ppm(u, w) for u, w in init}
    stats = []

    def stat(r, ed):
        tot = sum(ed.values())
        stats.append((r, len(ed), tot // len(ed)))

    stat(0, edges)
    for t in range(1, x7.ND_ROUNDS + 1):
        by_u = {}
        for (u, w) in edges:
            by_u.setdefault(u, set()).add(w)
        cand = set(edges)
        for u, ws in by_u.items():
            for w in ws:
                for w2 in by_u.get(w, ()):
                    if u != w2:
                        cand.add((u, w2))
        for (u, w) in list(edges):
            if w != u:
                cand.add((w, u))
        scored = {}
        for (u, w) in cand:
            scored.setdefault(u, []).append((-ppm(u, w), w))
        edges = {}
        for u, lst in scored.items():
            for negppm, w in sorted(lst)[:x7.ND_K]:
                edges[(u, w)] = -negppm
        stat(t, edges)
    return stats


def test_nn_descent_matches_python_reference(spark):
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in embs}
    expect = _python_nn_descent(vecs)
    got = [(r.round, r.n_edges, r.mean_sim_ppm)
           for r in registry.REGISTRY["graph_nn_descent"].fn(
               spark, SF).collect()]
    assert got == expect


def test_nn_descent_mean_similarity_is_nondecreasing(spark):
    """Each round's per-node top-K candidate set contains the previous
    round's edges, so mean neighbor similarity cannot fall — the
    convergence property that makes the report actionable. It must
    also strictly improve at least once on this fixture, or the
    refinement is vacuous."""
    rows = registry.REGISTRY["graph_nn_descent"].fn(spark, SF).collect()
    means = [r.mean_sim_ppm for r in sorted(rows, key=lambda r: r.round)]
    assert len(means) == x7.ND_ROUNDS + 1
    assert all(b >= a for a, b in zip(means, means[1:])), means
    assert means[-1] > means[0], "no refinement happened at all"
