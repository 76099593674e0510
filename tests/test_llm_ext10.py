"""Correctness of the maximal-duplicated-run operator
(queries/llm_ext10.py): a planted nested/partial-overlap fixture
replicated by a plain-Python diagonal scan (token-level, no hashing —
an independent formulation of the same quantity), explicit expected
values for the planted regimes, and the full-containment flag's
semantics on both sides of its boundary."""

from __future__ import annotations

import itertools
import random

import pytest

from nats_stream_processor_spark import registry
from nats_stream_processor_spark.queries import llm_ext10 as x10


@pytest.fixture(autouse=True)
def _release():
    yield
    registry.release_pins()


def _write_docs(spark, tmp_path, texts):
    d = tmp_path / "sf_synth"
    spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                          "doc_id long, text string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(d / "documents.parquet"))
    return str(d)


def _toks(text):
    import re
    return re.findall("[a-z0-9]+", text.lower())


def _max_common_run(xs, ys):
    """Longest common token run via the diagonal scan — the O(n*m)
    independent reference for what the span islands compute."""
    best = 0
    for d in range(-(len(ys) - 1), len(xs)):
        run = 0
        for i in range(max(0, d), min(len(xs), len(ys) + d)):
            if xs[i] == ys[i - d]:
                run += 1
                best = max(best, run)
            else:
                run = 0
    return best


def _shared_positions(xs, ys, k):
    """Number of (pa, pb) K-gram position matches (the n_shared_positions
    column), from raw token K-grams."""
    ga = [tuple(xs[i:i + k]) for i in range(len(xs) - k + 1)]
    gb = [tuple(ys[j:j + k]) for j in range(len(ys) - k + 1)]
    return sum(1 for a in ga for b in gb if a == b)


def _vocab_texts():
    """The planted regimes. Token vocabulary is synthetic (wNNN) so no
    accidental cross-doc repeats occur outside the plants."""
    rng = random.Random(7)
    base = [f"w{i:03d}" for i in range(60)]           # doc 0
    nested = base[10:41]                              # doc 1: 31 tokens, contiguous in 0
    partial = base[40:] + [f"p{i:03d}" for i in range(20)]  # doc 2: 20-token suffix overlap
    # doc 3: copy of 0 with ONE token changed mid-run -> two runs (29 / 30)
    mutated = list(base)
    mutated[29] = "zzz"
    novel = [f"n{i:03d}" for i in range(40)]          # doc 4: no overlap
    short = [f"s{i:03d}" for i in range(x10.MR_K - 1)]  # doc 5: sub-K, excluded
    rng.shuffle(novel)
    return [" ".join(t) for t in
            (base, nested, partial, mutated, novel, short)]


def test_max_run_matches_diagonal_scan_reference(spark, tmp_path):
    texts = _vocab_texts()
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {(r.doc_a, r.doc_b): r for r in
           registry.REGISTRY["dedup_max_duplicated_run"].fn(
               spark, sf_dir).collect()}
    toks = [_toks(t) for t in texts]
    k = x10.MR_K
    expect = {}
    for a, b in itertools.combinations(range(len(toks)), 2):
        if len(toks[a]) < k or len(toks[b]) < k:
            continue  # sub-K docs carry no spans
        run = _max_common_run(toks[a], toks[b])
        if run >= k:
            expect[(a, b)] = run
    assert set(got) == set(expect)
    for (a, b), run in expect.items():
        r = got[(a, b)]
        assert r.max_run_tokens == run, (a, b)
        assert r.max_run_spans == run - k + 1, (a, b)
        assert r.n_shared_positions == _shared_positions(
            toks[a], toks[b], k), (a, b)
        n_sp_small = min(len(toks[a]), len(toks[b])) - k + 1
        assert r.full_containment == (r.max_run_spans == n_sp_small), (a, b)


def test_planted_regimes_explicit_values(spark, tmp_path):
    texts = _vocab_texts()
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {(r.doc_a, r.doc_b): r for r in
           registry.REGISTRY["dedup_max_duplicated_run"].fn(
               spark, sf_dir).collect()}
    # nested: doc 1 is a verbatim 31-token extract of doc 0
    nested = got[(0, 1)]
    assert nested.max_run_tokens == 31
    assert nested.full_containment  # run covers ALL of doc 1's spans
    # partial: docs 0 and 2 share a 20-token suffix/prefix overlap only
    partial = got[(0, 2)]
    assert partial.max_run_tokens == 20
    assert not partial.full_containment
    # one mid-run mutation splits doc 0 vs doc 3 into runs of 29 and 30
    mutated = got[(0, 3)]
    assert mutated.max_run_tokens == 30
    assert not mutated.full_containment
    # doc 4 (novel) and doc 5 (sub-K) pair with nothing
    assert not any(4 in p or 5 in p for p in got)
    # the nested extract also overlaps the mutated copy (tokens 10..28
    # run of 19, 30..40 run of 11 -> max 19 < 31: mutation landed inside)
    assert got[(1, 3)].max_run_tokens == 19


def test_fixture_corpus_has_planted_duplicate_runs(spark):
    """The driver fixtures contain planted near-duplicates — the formal
    row must be non-vacuous (the operator reports real runs there, not
    an empty relation)."""
    rows = registry.REGISTRY["dedup_max_duplicated_run"].fn(
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "no duplicated runs found at sf0.001 — vacuous row"
    assert all(r.max_run_tokens >= x10.MR_K for r in rows)
    assert all(r.max_run_spans <= r.n_shared_positions for r in rows)


def _expected_drop_plan(toks, k):
    """Independent drop-plan reference off raw tokens: doc d drops iff
    its whole span sequence appears contiguously in a doc with more
    spans, or an equal-content doc with smaller id."""
    n_spans = {i: len(t) - k + 1 for i, t in enumerate(toks)
               if len(t) >= k}
    def contained(small, big):
        s, g = toks[small], toks[big]
        return any(g[i:i + len(s)] == s for i in range(len(g) - len(s) + 1))
    plan = {}
    for d in n_spans:
        containers = []
        for o in n_spans:
            if o == d:
                continue
            if (n_spans[o] > n_spans[d] or (n_spans[o] == n_spans[d]
                                            and o < d)) \
                    and contained(d, o):
                containers.append(o)
        if containers:
            best = max(containers, key=lambda o: (n_spans[o], -o))
            plan[d] = (best, n_spans[d], n_spans[d] + k - 1)
    return plan


def test_drop_plan_matches_containment_reference(spark, tmp_path):
    texts = _vocab_texts()
    # add an exact duplicate of doc 0 (id 6) and a chain link: doc 7 is
    # an extract of doc 1 (which is itself an extract of doc 0)
    toks0 = _toks(texts[0])
    toks1 = _toks(texts[1])
    texts = texts + [" ".join(toks0), " ".join(toks1[5:25])]
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {r.doc_id: (r.kept_in, r.n_spans, r.tokens_saved) for r in
           registry.REGISTRY["dedup_containment_drop_plan"].fn(
               spark, sf_dir).collect()}
    toks = [_toks(t) for t in texts]
    expect = _expected_drop_plan(toks, x10.MR_K)
    assert got == expect
    # the planted regimes land as designed: the nested extract (1), the
    # exact duplicate (6, kept in 0 by the id tie-break), and the chain
    # tail (7) are dropped; every container is a SURVIVOR
    assert {1, 6, 7} <= set(got)
    assert got[6][0] == 0
    # doc 7's containers are 1 (16 spans), 0 and 6 (45 spans each); the
    # best-container rule (most spans, tie on smaller id) picks 0 — not
    # the dropped middle link 1
    assert got[7][0] == 0
    survivors = set(range(len(texts))) - set(got)
    assert all(kept in survivors for kept, _, _ in got.values())


def test_drop_plan_chain_kept_in_is_transitive_survivor(spark, tmp_path):
    """A -> B -> C extraction chain: B and C both drop, and C's kept_in
    must be A (the transitivity argument — the argmax container is
    never itself dropped), not the dropped middle link B."""
    base = [f"c{i:03d}" for i in range(50)]
    texts = [" ".join(base),           # A (doc 0)
             " ".join(base[5:40]),     # B = extract of A (doc 1)
             " ".join(base[10:30])]    # C = extract of B and A (doc 2)
    sf_dir = _write_docs(spark, tmp_path, texts)
    got = {r.doc_id: r.kept_in for r in
           registry.REGISTRY["dedup_containment_drop_plan"].fn(
               spark, sf_dir).collect()}
    assert got == {1: 0, 2: 0}
