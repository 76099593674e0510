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


@pytest.mark.skipif(not onnx_classify.HAVE_ONNX,
                    reason="onnxruntime/transformers not installed")
def test_onnx_udf_runs(spark):  # pragma: no cover
    udf = onnx_classify.make_onnx_sentiment_udf(
        "model_int8.onnx", "cardiffnlp/twitter-roberta-base-sentiment-latest")
    df = spark.createDataFrame([("great day",)], "text string")
    assert df.select(udf("text")).count() == 1
