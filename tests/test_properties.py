"""Property-based invariants (hypothesis) for the classifier batch
functions — the Python halves of the U1/U2 pandas UDFs. These run without
a SparkSession, so hypothesis can hammer them with arbitrary unicode:
the invariants the reference guarantees per message
(src/sentiment.py:124-174, src/topic_classifier.py:130-200) must hold for
EVERY input, not just the corpus.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from nats_stream_processor_spark.functions.classify import (
    sentiment_batch,
    topics_batch,
)
from nats_stream_processor_spark.functions.topics import LABELS

texts = st.lists(
    st.one_of(st.none(), st.text(max_size=200)), min_size=1, max_size=20)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_sentiment_invariants(batch):
    out = sentiment_batch(pd.Series(batch))
    assert len(out) == len(batch)
    for _, row in out.iterrows():
        p = row["probabilities"]
        probs = [p["negative"], p["neutral"], p["positive"]]
        # rounded to 6dp per element -> sum within 2e-6 of 1
        assert math.isclose(sum(probs), 1.0, abs_tol=2e-6)
        assert all(0.0 <= x <= 1.0 for x in probs)
        # label is the argmax, confidence is the max prob
        labels = ["negative", "neutral", "positive"]
        assert row["sentiment"] == labels[probs.index(max(probs))]
        assert row["confidence"] == max(probs)


@settings(max_examples=200, deadline=None)
@given(texts)
def test_topics_invariants(batch):
    out = topics_batch(pd.Series(batch))
    assert len(out) == len(batch)
    for _, row in out.iterrows():
        # U2d: the top topic is ALWAYS in the published set (reference:
        # src/topic_classifier.py:179-182) — the routing subject invariant
        assert row["top_topic"] in row["topics"]
        assert row["top_topic"] in LABELS
        assert set(row["topics"]) <= set(LABELS)
        assert 0.0 < row["top_confidence"] < 1.0


@settings(max_examples=200, deadline=None)
@given(texts)
def test_classifiers_deterministic(batch):
    s = pd.Series(batch)
    a, b = sentiment_batch(s), sentiment_batch(s)
    pd.testing.assert_frame_equal(a, b)
    ta, tb = topics_batch(s), topics_batch(s)
    pd.testing.assert_frame_equal(ta, tb)
