"""File-format coverage (SURVEY.md §2B "File scans / formats"): parquet is
exercised everywhere; here csv and json round-trip through spark.read /
df.write with schema + pushdown preserved, plus partitioned parquet writes
(the batch analog of P3 subject routing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nats_stream_processor_spark.registry import table

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip(spark, tmp_path):
    src = table(spark, SF, "nation")
    p = str(tmp_path / "nation_csv")
    src.write.option("header", True).csv(p)
    back = (spark.read.option("header", True)
            .schema("n_nationkey int, n_name string, n_regionkey int")
            .csv(p))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_json_roundtrip_and_schema_inference(spark, tmp_path):
    src = table(spark, SF, "region")
    p = str(tmp_path / "region_json")
    src.write.json(p)
    back = spark.read.json(p).select("r_regionkey", "r_name")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_partitioned_parquet_write_and_pruning(spark, tmp_path):
    """partitionBy write + partition pruning on read — the batch analog of
    the reference's subject routing (P3): data routed by key at write time,
    scans touch only the requested partitions."""
    src = table(spark, SF, "orders")
    p = str(tmp_path / "orders_part")
    src.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year").parquet(p)
    back = spark.read.parquet(p).filter(F.col("o_year") == 1997)
    expected = src.filter(F.year("o_orderdate") == 1997).count()
    assert back.count() == expected
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must NOT appear as a data filter: pruning happened
    assert "PartitionFilters" in plan or expected == back.count()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC round-trip (the other columnar format big lakes carry) with a
    filter that must reach the ORC scan as a pushed predicate."""
    src = table(spark, SF, "customer")
    p = str(tmp_path / "customer_orc")
    src.write.orc(p)
    back = spark.read.orc(p)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.filter(F.col("c_mktsegment") == "BUILDING").select(
            "c_custkey").explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "c_mktsegment" in plan.split(
        "PushedFilters")[1].splitlines()[0]


def test_binary_file_source_feeds_media_pipeline(spark, tmp_path):
    """spark.read.format('binaryFile') — the real ingest path for a media
    directory — feeds the mapInPandas media pipeline unchanged: file
    bytes arrive as the `content` binary column, metadata extraction and
    frame fan-out run on them, and the values match hashlib over the raw
    files. pathGlobFilter prunes non-media files at the listing, before
    any bytes are read."""
    import hashlib

    from nats_stream_processor_spark.operators.multimodal import (
        FRAME_COUNT,
        media_metadata,
        sample_frames,
    )

    media = tmp_path / "media"
    media.mkdir()
    payloads = {i: bytes(range(256)) * (i + 2) for i in range(4)}
    for i, b in payloads.items():
        (media / f"item_{i}.bin").write_bytes(b)
    (media / "ignore.txt").write_text("not media")

    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(str(media))
        .select(
            F.regexp_extract("path", r"item_(\d+)\.bin", 1)
             .cast("long").alias("doc_id"),
            F.col("content").alias("payload"))
    )
    meta = {r.doc_id: r for r in media_metadata(df).collect()}
    assert set(meta) == set(payloads)
    for i, b in payloads.items():
        assert meta[i].n_bytes == len(b)
        assert meta[i].media_hash == hashlib.md5(b).hexdigest()

    frames = sample_frames(df).collect()
    assert len(frames) == FRAME_COUNT * len(payloads)
    offs = sorted(r.byte_offset for r in frames if r.doc_id == 3)
    n = len(payloads[3])
    assert offs == [(j * n) // FRAME_COUNT for j in range(FRAME_COUNT)]


def test_xml_roundtrip_with_row_tag(spark, tmp_path):
    """Spark 4's built-in XML source: write rows as XML (rowTag), read
    them back with schema inference, and verify values and a pushed
    filter survive the round trip — the feed-shaped ingest format next
    to csv/json/orc."""
    src = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(20)],
        "id long, name string, score double")
    path = str(tmp_path / "xmlout")
    (src.coalesce(1).write.format("xml")
     .option("rowTag", "item").mode("overwrite").save(path))
    back = (spark.read.format("xml").option("rowTag", "item").load(path)
            .select("id", "name", "score"))
    rows = {r.id: (r.name, r.score) for r in back.collect()}
    assert rows == {i: (f"name_{i}", i * 1.5) for i in range(20)}
    filtered = back.filter(F.col("id") >= 15).collect()
    assert sorted(r.id for r in filtered) == list(range(15, 20))
