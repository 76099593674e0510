"""ONNX classifier plugin: import guard behavior (the libraries are not in
this container, so the real-inference path is exercised only where
onnxruntime+transformers exist)."""

from __future__ import annotations

import pytest

from nats_stream_processor_spark.functions import onnx_classify


def test_import_guard_raises_without_onnx():
    if onnx_classify.HAVE_ONNX:
        pytest.skip("onnxruntime present; guard not applicable")
    with pytest.raises(ImportError, match="onnxruntime"):
        onnx_classify.make_onnx_sentiment_udf("m.onnx", "tok")
    with pytest.raises(ImportError, match="onnxruntime"):
        onnx_classify.make_onnx_topics_udf("m.onnx", "tok", {0: "x"})


def test_softmax_sigmoid_shapes():
    import numpy as np

    p = onnx_classify._softmax(np.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0]]))
    assert p.shape == (2, 3)
    assert abs(p.sum(axis=1) - 1.0).max() < 1e-12
    assert p[1].tolist() == pytest.approx([1 / 3] * 3)
    s = onnx_classify._sigmoid(np.array([0.0, 100.0, -100.0]))
    assert s[0] == 0.5 and s[1] > 0.999 and s[2] < 0.001


@pytest.mark.env_gated
@pytest.mark.skipif(
    not onnx_classify.HAVE_ONNX,
    reason="needs onnxruntime + transformers (and a downloaded model); "
           "unlock with: `pip install onnxruntime transformers && pytest "
           "tests/test_onnx_plugin.py::test_onnx_udf_runs` — the scripted-"
           "fake e2e below covers the plugin path without them")
def test_onnx_udf_runs(spark):  # pragma: no cover
    udf = onnx_classify.make_onnx_sentiment_udf(
        "model_int8.onnx", "cardiffnlp/twitter-roberta-base-sentiment-latest")
    df = spark.createDataFrame([("great day",)], "text string")
    assert df.select(udf("text")).count() == 1


def test_onnx_udfs_execute_with_scripted_runtime(spark):
    """Drive the REAL plugin code (per-worker _load cache, batch
    tokenize-pad-feed, softmax/argmax, sigmoid/threshold/U2d) end-to-end
    on Spark using scripted fake onnxruntime/transformers modules shipped
    to the workers via addPyFile — the same pattern the NATS transport
    tests use for nats-py."""
    import os

    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    from nats_stream_processor_spark.functions import onnx_classify as oc
    from nats_stream_processor_spark.functions.topics import LABELS

    fake_dir = os.path.join(os.path.dirname(__file__), "fake_onnx")
    for f in ("onnxruntime.py", "transformers.py"):
        spark.sparkContext.addPyFile(os.path.join(fake_dir, f))

    import importlib.util as ilu

    def _load_fake(name):
        spec = ilu.spec_from_file_location(
            name, os.path.join(fake_dir, f"{name}.py"))
        mod = ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    fake_ort = _load_fake("onnxruntime")
    fake_tf = _load_fake("transformers")

    # driver side: satisfy the factory guard with the same fakes the
    # workers will import from the shipped files
    old = (oc.ort, oc.AutoTokenizer, oc.HAVE_ONNX)
    oc.ort, oc.AutoTokenizer, oc.HAVE_ONNX = (
        fake_ort, fake_tf.AutoTokenizer, True)
    try:
        sent_udf = oc.make_onnx_sentiment_udf(
            "/models/sentiment-int8.onnx", "/models/sentiment-tok")
        topics_udf = oc.make_onnx_topics_udf(
            "/models/topics-int8.onnx", "/models/topics-tok",
            {i: lab for i, lab in enumerate(LABELS)})

        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .select("doc_id", "text").limit(40)
                .repartition(4))
        out = docs.select(
            "doc_id",
            sent_udf(F.col("text")).alias("s"),
            topics_udf(F.col("text")).alias("t"),
        ).select("doc_id", "s.*", "t.*")
        rows = {r.doc_id: r for r in out.collect()}
        assert len(rows) == 40
        for r in rows.values():
            assert r.sentiment in oc.SENTIMENT_LABELS
            p = r.probabilities
            assert abs(p.negative + p.neutral + p.positive - 1.0) < 1e-9
            assert r.confidence == max(p.negative, p.neutral, p.positive)
            assert r.confidence >= 1.0 / 3 - 1e-9
            assert r.top_topic in LABELS
            assert r.top_topic in r.topics  # U2d: top always included
            assert all(t in LABELS for t in r.topics)

        # deterministic across executions (fresh plan, same fakes)
        rows2 = {r.doc_id: r for r in docs.select(
            "doc_id", sent_udf(F.col("text")).alias("s")).select(
            "doc_id", "s.*").collect()}
        for k, r in rows2.items():
            assert r.sentiment == rows[k].sentiment
            assert r.confidence == rows[k].confidence
    finally:
        oc.ort, oc.AutoTokenizer, oc.HAVE_ONNX = old
