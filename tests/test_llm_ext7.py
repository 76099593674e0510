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
        # Truncate toward zero (exact int arithmetic) to mirror Spark's
        # `div` and DuckDB's `//` — plain Python // floors, which would
        # diverge from both engines on a negative sim_ppm sum.
        tot, n = sum(ed.values()), len(ed)
        q = abs(tot) // n
        stats.append((r, n, q if tot >= 0 else -q))

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


def test_nn_descent_mean_similarity_rises_on_fixture(spark):
    """FIXTURE PROPERTY, not an invariant: on the shipped sf0.001
    embeddings every node's list stays full, so the global mean rises.
    (A node holding fewer than ND_K edges — stride self-collisions on
    adversarial corpus sizes — tops up with lower-similarity edges that
    can legally pull the global mean down; the true invariant is
    per-node dominance, asserted below.) The mean must also strictly
    improve at least once here, or the refinement is vacuous."""
    rows = registry.REGISTRY["graph_nn_descent"].fn(spark, SF).collect()
    means = [r.mean_sim_ppm for r in sorted(rows, key=lambda r: r.round)]
    assert len(means) == x7.ND_ROUNDS + 1
    assert all(b >= a for a, b in zip(means, means[1:])), means
    assert means[-1] > means[0], "no refinement happened at all"


def test_nn_descent_per_node_dominance_invariant(spark):
    """The TRUE invariant: each round's candidate set contains the
    previous round's edges, so for every node the j-th best kept
    similarity never falls (for j up to the previous list length).
    Replayed in plain Python over the sf0.001 embeddings."""
    embs = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in embs}

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
    edges = set()
    for u in vecs:
        for j in range(1, x7.ND_K + 1):
            w = (u + j * x7.ND_STRIDE) % n
            w = (w + (1 if w == u else 0)) % n
            if w != u:
                edges.add((u, w))

    def by_node(ed):
        d = {}
        for (u, w) in ed:
            d.setdefault(u, []).append(ppm(u, w))
        return {u: sorted(v, reverse=True) for u, v in d.items()}

    prev = by_node(edges)
    for _t in range(1, x7.ND_ROUNDS + 1):
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
            cand.add((w, u))
        scored = {}
        for (u, w) in cand:
            scored.setdefault(u, []).append((-ppm(u, w), w))
        edges = set()
        for u, lst in scored.items():
            for negppm, w in sorted(lst)[:x7.ND_K]:
                edges.add((u, w))
        cur = by_node(edges)
        for u, old in prev.items():
            new = cur[u]
            for j, old_sim in enumerate(old[:len(new)]):
                assert new[j] >= old_sim, (u, j, old, new)
        prev = cur
