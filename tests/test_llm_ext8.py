"""Plain-Python replication and cross-operator consistency for
media_shot_curation (queries/llm_ext8.py)."""

from __future__ import annotations

import re

import pytest

from nats_stream_processor_spark import registry
from nats_stream_processor_spark.queries import llm_ext6 as x6
from nats_stream_processor_spark.queries import llm_ext8 as x8

SF = "/root/testdata/sf0.001"


@pytest.fixture(autouse=True)
def _release():
    yield
    registry.release_pins()


def _python_shot_curation(docs):
    """Replica of q_media_shot_curation: utf-8 payload, the scene-cut
    frame sampler, lag deltas, running-sum sessionization, per-shot
    aggregates and the three-gate keep decision."""
    out = []
    for doc_id, text in docs:
        p = text.encode("utf-8")
        toks = len(re.findall(r"[a-z0-9]+", text.lower()))
        feats = [f for _j, f in x6.scene_frame_features(p)]
        shots = {}
        shot = 0
        prev = None
        for f in feats:
            ad = 0 if prev is None else abs(f - prev)
            if ad >= x6.SCENE_THRESH:
                shot += 1
            st = shots.setdefault(shot, [0, 0, 0])
            st[0] += 1       # n_frames
            st[1] += f       # feat sum
            st[2] += ad      # shot delta
            prev = f
        for s in sorted(shots):
            nf, fs, sd = shots[s]
            fm = fs // nf    # nonneg: truncation == floor
            keep = int(nf >= x8.SHOT_MIN_FRAMES
                       and fm >= x8.SHOT_MIN_FEAT
                       and toks >= x8.SHOT_MIN_DOC_TOKENS)
            out.append((doc_id, s, nf, fm, sd, toks, keep))
    return sorted(out)


def test_shot_curation_matches_python_reference(spark):
    docs = [(r.doc_id, r.text) for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").collect()]
    expect = _python_shot_curation(docs)
    got = [tuple(r) for r in
           registry.REGISTRY["media_shot_curation"].fn(spark, SF).collect()]
    assert sorted(got) == expect


def test_shot_curation_agrees_with_scene_cuts(spark):
    """The per-shot table must roll up to exactly media_scene_cuts'
    per-video report: shot count, longest shot, and total delta agree
    doc for doc (same sampler, same sessionization — asserted, not
    assumed)."""
    shots = registry.REGISTRY["media_shot_curation"].fn(spark, SF).collect()
    per_doc = {}
    for r in shots:
        st = per_doc.setdefault(r.doc_id, [0, 0, 0])
        st[0] += 1
        st[1] = max(st[1], r.n_frames)
        st[2] += r.shot_delta
    cuts = registry.REGISTRY["media_scene_cuts"].fn(spark, SF).collect()
    assert len(cuts) == len(per_doc)
    for r in cuts:
        n_shots, max_frames, total_delta = per_doc[r.doc_id]
        assert n_shots == r.n_shots, r.doc_id
        assert max_frames == r.max_shot_frames, r.doc_id
        assert total_delta == r.total_delta, r.doc_id


def test_shot_curation_decision_genuinely_splits(spark):
    """The keep gate must be a real decision on the fixtures — some
    shots kept, some dropped, and every gate individually responsible
    for at least one drop (otherwise a threshold is dead code at the
    shipped constants)."""
    rows = registry.REGISTRY["media_shot_curation"].fn(spark, SF).collect()
    kept = [r for r in rows if r.keep == 1]
    dropped = [r for r in rows if r.keep == 0]
    assert kept and dropped
    assert any(r.n_frames < x8.SHOT_MIN_FRAMES for r in dropped)
    assert any(r.n_frames >= x8.SHOT_MIN_FRAMES
               and r.feat_mean < x8.SHOT_MIN_FEAT for r in dropped)
    assert any(r.n_frames >= x8.SHOT_MIN_FRAMES
               and r.feat_mean >= x8.SHOT_MIN_FEAT
               and r.doc_tokens < x8.SHOT_MIN_DOC_TOKENS for r in dropped)
    for r in kept:
        assert r.n_frames >= x8.SHOT_MIN_FRAMES
        assert r.feat_mean >= x8.SHOT_MIN_FEAT
        assert r.doc_tokens >= x8.SHOT_MIN_DOC_TOKENS
