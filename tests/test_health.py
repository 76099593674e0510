"""Health/readiness/metrics surface (H1; reference src/health.py:7-25,
src/metrics.py:5-70). Spark-free: the exposition renders from
MetricsListener records, which we construct directly."""

from __future__ import annotations

import json
import urllib.request

from nats_stream_processor_spark.streaming.health import (
    HealthServer,
    prometheus_text,
    snapshot,
)
from nats_stream_processor_spark.streaming.metrics import (
    MetricsListener,
    ProgressRecord,
)


def _listener() -> MetricsListener:
    lst = MetricsListener()
    lst.records.append(ProgressRecord(
        batch_id=0, num_input_rows=100, input_rows_per_second=50.0,
        processed_rows_per_second=48.0, batch_duration_ms=120,
        observed_metrics={"pipeline": {
            "n_processed": 100, "n_empty_text": 3,
            "n_gated": 17, "n_published": 80}},
    ))
    lst.records.append(ProgressRecord(
        batch_id=1, num_input_rows=60, input_rows_per_second=30.0,
        processed_rows_per_second=29.0, batch_duration_ms=80,
        observed_metrics={"pipeline": {
            "n_processed": 60, "n_empty_text": 1,
            "n_gated": 9, "n_published": 50}},
    ))
    return lst


def test_snapshot_totals():
    s = snapshot(_listener())
    assert s["posts_processed_total"] == 160
    assert s["posts_published_total"] == 130
    assert s["posts_empty_text_total"] == 4
    assert s["posts_gated_total"] == 26
    assert s["batches_total"] == 2
    assert s["input_rows_total"] == 160
    assert s["input_rows_per_second"] == 30.0
    assert s["last_batch_duration_ms"] == 80


def test_prometheus_exposition_format():
    text = prometheus_text(_listener())
    assert "# TYPE stream_processor_posts_processed_total counter" in text
    assert "stream_processor_posts_processed_total 160" in text
    assert "stream_processor_posts_published_total 130" in text
    assert "# TYPE stream_processor_nats_connected gauge" in text
    assert "stream_processor_nats_connected 1" in text
    # histogram: 0.08s and 0.12s both <= 0.2; only 0.08 <= 0.1
    assert 'stream_processor_processing_duration_seconds_bucket{le="0.1"} 1' in text
    assert 'stream_processor_processing_duration_seconds_bucket{le="0.2"} 2' in text
    assert 'stream_processor_processing_duration_seconds_bucket{le="+Inf"} 2' in text
    assert "stream_processor_processing_duration_seconds_count 2" in text
    # every non-comment line is "name{labels} value" — parseable exposition
    for line in text.strip().splitlines():
        if line.startswith("#"):
            continue
        name, value = line.rsplit(" ", 1)
        assert name.startswith("stream_processor_")
        float(value)


def test_disconnected_gauge():
    text = prometheus_text(_listener(), connected=False)
    assert "stream_processor_nats_connected 0" in text


def test_http_endpoints():
    ready = {"v": True}
    srv = HealthServer(_listener(), port=0,
                       ready_check=lambda: ready["v"]).start()
    base = f"http://127.0.0.1:{srv.port}"
    try:
        with urllib.request.urlopen(f"{base}/health") as r:
            assert r.status == 200
            assert json.load(r) == {"status": "ok"}
        with urllib.request.urlopen(f"{base}/ready") as r:
            assert json.load(r) == {"ready": True}
        with urllib.request.urlopen(f"{base}/metrics") as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            body = r.read().decode()
            assert "stream_processor_posts_processed_total 160" in body
        ready["v"] = False
        try:
            urllib.request.urlopen(f"{base}/ready")
            raise AssertionError("expected 503")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert json.load(e) == {"ready": False}
    finally:
        srv.stop()
