"""NATS connector tests against the in-memory JetStream stand-in.

The SimpleDataSourceStreamReader runs driver-side, so format("nats") works
end-to-end against the mem:// broker; the stream writer's publish logic is
driven in-process (executor python workers can't see the fake broker — a
real deployment talks to a real broker from executors).
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from nats_stream_processor_spark.sources.nats import (
    NatsCommitMessage,
    NatsStreamReader,
    NatsStreamWriter,
    ensure_output_stream,
    mem_reset,
    mem_stream,
    register,
)
from nats_stream_processor_spark.streaming.pipeline import (
    decode_posts,
    start_enrichment_query,
)


def seed_posts(server: str, stream: str, posts: list[dict]) -> None:
    ms = mem_stream(server, stream)
    for p in posts:
        ms.publish(f"bluesky.posts.{p['uri'].split('/')[-1]}",
                   json.dumps(p).encode(), ts=time.time())


def test_reader_offsets_and_batching():
    server, stream = "mem://offsets", "bluesky-posts"
    mem_reset(server)
    seed_posts(server, stream, [
        {"uri": f"at://t/{i}", "cid": str(i), "text": "great"} for i in range(7)
    ])
    r = NatsStreamReader({"servers": server, "stream": stream,
                          "maxbatchsize": "3"})
    start = r.initialOffset()
    assert start == {"seq": 1}
    rows1, end1 = r.read(start)
    rows1 = list(rows1)
    assert len(rows1) == 3 and end1 == {"seq": 4}          # S2 admission cap
    rows2, end2 = r.read(end1)
    assert len(list(rows2)) == 3 and end2 == {"seq": 7}
    rows3, end3 = r.read(end2)
    assert len(list(rows3)) == 1 and end3 == {"seq": 8}
    rows4, end4 = r.read(end3)
    assert list(rows4) == [] and end4 == {"seq": 8}        # idle: offset stable
    # deterministic replay of a committed range
    replay = list(r.readBetweenOffsets({"seq": 4}, {"seq": 7}))
    assert [m[2] for m in replay] == [4, 5, 6]


def test_reader_subject_filter():
    server, stream = "mem://filter", "bluesky-posts"
    mem_reset(server)
    ms = mem_stream(server, stream)
    ms.publish("bluesky.posts.a", b"x")
    ms.publish("other.subject", b"y")
    ms.publish("bluesky.posts.b", b"z")
    r = NatsStreamReader({"servers": server, "stream": stream,
                          "subjectprefix": "bluesky.posts."})
    rows, end = r.read({"seq": 1})
    assert [m[0] for m in rows] == ["bluesky.posts.a", "bluesky.posts.b"]


def test_writer_idempotent_publish_and_routing():
    server, stream = "mem://writer", "bluesky-posts-enriched"
    mem_reset(server)
    ensure_output_stream(server, stream)
    w = NatsStreamWriter({"servers": server, "stream": stream})

    class Row:
        def __init__(self, d):
            self._d = d

        def asDict(self, recursive=False):  # noqa: N802
            return dict(self._d)

    rows = [
        Row({"route_subject": "bluesky.posts.enriched.positive.music",
             "uri": "at://t/1", "cid": "c1", "value": '{"uri": "at://t/1"}'}),
        Row({"route_subject": "bluesky.posts.enriched.negative.sports",
             "uri": "at://t/2", "cid": "c2", "value": '{"uri": "at://t/2"}'}),
        Row({"route_subject": "bluesky.posts.enriched.positive.music",
             "uri": "at://t/1", "cid": "c1", "value": '{"uri": "at://t/1"}'}),
        Row({"route_subject": "bluesky.posts.enriched.neutral.daily_life",
             "uri": "at://t/3", "cid": None, "value": '{"uri": "at://t/3"}'}),
    ]
    msg: NatsCommitMessage = w.write(iter(rows))
    # duplicate (uri:cid) dropped by the msg-id window (D1); null cid rows
    # publish without a msg-id header (reference skips the header then)
    assert msg.n_published == 3 and msg.n_duplicates == 1
    ms = mem_stream(server, stream)
    assert [m.subject for m in ms.messages] == [
        "bluesky.posts.enriched.positive.music",
        "bluesky.posts.enriched.negative.sports",
        "bluesky.posts.enriched.neutral.daily_life",
    ]
    # task-retry simulation: re-publishing the same batch is a no-op
    msg2 = w.write(iter(rows[:2]))
    assert msg2.n_published == 0 and msg2.n_duplicates == 2


def test_format_nats_end_to_end_enrichment(spark, tmp_path):
    """readStream.format('nats') -> decode -> enrich -> routed publish back
    into the mem broker's output stream: the reference's full topology."""
    register(spark)
    server = "mem://e2e"
    mem_reset(server)
    seed_posts(server, "bluesky-posts", [
        {"uri": "at://t/1", "cid": "c1", "text": "This is a great day!"},
        {"uri": "at://t/2", "cid": "c2", "text": "I hate this weather"},
        {"uri": "at://t/2", "cid": "c2", "text": "I hate this weather"},
    ])
    raw = (
        spark.readStream.format("nats")
        .option("servers", server)
        .option("stream", "bluesky-posts")
        .load()
    )
    posts = decode_posts(raw, value_col="value")
    out = ensure_output_stream(server, "bluesky-posts-enriched")

    def publisher(subject, payload, msg_id):
        headers = {"Nats-Msg-Id": msg_id} if msg_id else {}
        out.publish(subject, payload.encode(), headers)

    q = start_enrichment_query(posts, publisher, str(tmp_path / "nats_ckpt"))
    q.processAllAvailable()
    q.stop()
    assert len(out.messages) == 2
    subjects = sorted(m.subject for m in out.messages)
    assert subjects[0].startswith("bluesky.posts.enriched.negative.")
    assert subjects[1].startswith("bluesky.posts.enriched.positive.")
    enriched = json.loads(out.messages[0].data)
    assert "sentiment" in enriched and "topics" in enriched
    assert enriched["processor"] == "nats-stream-processor-spark"


def test_writestream_format_nats(spark, tmp_path):
    """writeStream.format('nats'): the DataSourceStreamWriter runs in
    executor python workers and publishes to the (file-backed) broker."""
    register(spark)
    server = "mem://sinktest"
    mem_reset(server)
    seed_posts(server, "bluesky-posts", [
        {"uri": "at://t/1", "cid": "c1", "text": "This is a great day!"},
        {"uri": "at://t/1", "cid": "c1", "text": "This is a great day!"},
        {"uri": "at://t/9", "cid": "c9", "text": "great technology news"},
    ])
    raw = (spark.readStream.format("nats")
           .option("servers", server).option("stream", "bluesky-posts").load())
    from nats_stream_processor_spark.streaming.pipeline import enrich_stream
    enriched = enrich_stream(decode_posts(raw)).select(
        "uri", "cid", "route_subject",
        F.to_json(F.struct("uri", "sentiment", "topics")).alias("value"))
    q = (enriched.writeStream.format("nats")
         .option("servers", server).option("stream", "bluesky-posts-enriched")
         .option("checkpointLocation", str(tmp_path / "sink_ckpt"))
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()
    out = mem_stream(server, "bluesky-posts-enriched")
    msgs = out.messages
    assert len(msgs) == 2  # duplicate deduped upstream
    assert all(m.headers.get("Nats-Msg-Id") for m in msgs)
    assert {json.loads(m.data)["uri"] for m in msgs} == {"at://t/1", "at://t/9"}


def test_start_enrichment_query_default_natssink(spark, tmp_path):
    """The production sink path: start_enrichment_query with a NatsSink
    publishes executor-side via format('nats') — no driver collect."""
    from nats_stream_processor_spark.streaming.pipeline import NatsSink

    register(spark)
    server = "mem://sinkdefault"
    mem_reset(server)
    seed_posts(server, "bluesky-posts", [
        {"uri": "at://t/1", "cid": "c1", "text": "This is a great day!"},
        {"uri": "at://t/2", "cid": "c2", "text": "I hate this weather"},
        {"uri": "at://t/2", "cid": "c2", "text": "I hate this weather"},
    ])
    raw = (spark.readStream.format("nats")
           .option("servers", server).option("stream", "bluesky-posts").load())
    ensure_output_stream(server, "bluesky-posts-enriched")
    q = start_enrichment_query(
        decode_posts(raw),
        NatsSink(servers=server, stream="bluesky-posts-enriched"),
        str(tmp_path / "sink_default_ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    out = mem_stream(server, "bluesky-posts-enriched")
    msgs = out.messages
    assert len(msgs) == 2  # dup dropped upstream by watermarked dedup
    assert all(m.headers.get("Nats-Msg-Id") for m in msgs)
    assert all(m.subject.startswith("bluesky.posts.enriched.") for m in msgs)
    body = json.loads(msgs[0].data)
    assert "sentiment" in body and "topics" in body


def test_partitioned_reader_seq_ranges():
    """DataSourceStreamReader path: offsets, admission cap, and the split
    of a batch range into multiple InputPartitions (queue-group analog)."""
    from nats_stream_processor_spark.sources.nats import (
        NatsPartitionedStreamReader,
        SeqRangePartition,
    )

    server, stream = "mem://parts", "bluesky-posts"
    mem_reset(server)
    seed_posts(server, stream, [
        {"uri": f"at://t/{i}", "cid": str(i), "text": "great"}
        for i in range(10)
    ])
    r = NatsPartitionedStreamReader({
        "servers": server, "stream": stream,
        "maxbatchsize": "6", "numpartitions": "4",
    })
    assert r.initialOffset() == {"seq": 1}
    first = r.latestOffset()
    assert first == {"seq": 11}  # first trigger uncapped (no prev end)
    parts = r.partitions({"seq": 1}, first)
    assert len(parts) == 4
    assert parts[0] == SeqRangePartition(1, 4)  # 10 seqs -> 3/3/2/2
    assert parts[-1].end_seq == 11
    # ranges tile the batch exactly
    assert [p.start_seq for p in parts[1:]] == [p.end_seq for p in parts[:-1]]
    rows = [row for p in parts for row in r.read(p)]
    assert [row[2] for row in rows] == list(range(1, 11))
    # admission cap applies from the second trigger on
    seed_posts(server, stream, [
        {"uri": f"at://t/{i}", "cid": str(i), "text": "great"}
        for i in range(10, 30)
    ])
    second = r.latestOffset()
    assert second == {"seq": 17}  # 11 + maxbatchsize
    # idle stream: offset is stable, single empty partition
    r2 = NatsPartitionedStreamReader({"servers": server, "stream": stream})
    empty = r2.partitions({"seq": 31}, {"seq": 31})
    assert len(empty) == 1 and list(r2.read(empty[0])) == []


def test_partitioned_reader_e2e_and_restart(spark, tmp_path):
    """format('nats') now defaults to the partitioned reader: a micro-batch
    over 40 messages runs with numPartitions=4 input partitions, results
    match, and a checkpoint restart replays nothing."""
    register(spark)
    server = "mem://parts_e2e"
    mem_reset(server)
    seed_posts(server, "bluesky-posts", [
        {"uri": f"at://t/{i}", "cid": f"c{i}", "text": "This is a great day!"}
        for i in range(40)
    ])
    ckpt = str(tmp_path / "parts_ckpt")
    seen: list[int] = []

    def run_once():
        raw = (spark.readStream.format("nats")
               .option("servers", server).option("stream", "bluesky-posts")
               .option("numPartitions", "4").load())
        q = (raw.writeStream.foreachBatch(
                lambda df, _bid: seen.extend(
                    r["seq"] for r in df.select("seq").collect()))
             .outputMode("append").option("checkpointLocation", ckpt).start())
        q.processAllAvailable()
        q.stop()

    run_once()
    assert sorted(seen) == list(range(1, 41))
    # restart over the same checkpoint: no replay
    run_once()
    assert len(seen) == 40
