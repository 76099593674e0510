"""The driver-facing contract (__spark_entry__.py), exercised the way the
round driver consumes it: importlib-load the module by path, run
entry(spark) and check it returns rows with a stable schema on re-run,
and verify queries()/oracle_sql() key discipline (every oracle key is a
query key; exactly one registry entry is oracle-less — the
xxhash-variant whose value check is its md5 parity twin)."""

from __future__ import annotations

import importlib.util
import pathlib

import pytest

from nats_stream_processor_spark import registry


@pytest.fixture(scope="module")
def entry_mod():
    path = (pathlib.Path(__file__).resolve().parent.parent
            / "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs_and_is_stable(spark, entry_mod):
    df1 = entry_mod.entry(spark)
    rows1 = df1.collect()
    registry.release_pins()
    df2 = entry_mod.entry(spark)
    rows2 = df2.collect()
    registry.release_pins()
    assert len(rows1) > 0
    assert df1.schema == df2.schema
    assert sorted(map(tuple, rows1)) == sorted(map(tuple, rows2))


def test_queries_and_oracles_key_discipline(entry_mod):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(qs) == set(registry.REGISTRY)
    assert set(os_) <= set(qs)
    oracle_less = set(qs) - set(os_)
    assert oracle_less == {"dedup_minhash_lsh_fast"}
    for name, sql in os_.items():
        assert isinstance(sql, str) and sql.strip(), name
    for name, fn in qs.items():
        assert callable(fn), name


def test_window_queries_return_driver_safe_schemas(spark, entry_mod):
    """The driver canonicalizes via pandas sort_values over ALL output
    columns; an array/map/struct/binary output column is unhashable
    there and reds the row even when values are correct (the r4
    embed_random_projection incident). Every sampled-window query must
    therefore keep a scalar-only FINAL schema — asserted on the plan
    schema (no execution), for all 50 window entries."""
    from pyspark.sql import types as T
    bad = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
    qs = entry_mod.queries()
    for name in list(registry.REGISTRY)[:50]:
        df = qs[name](spark, "/root/testdata/sf0.001")
        for f in df.schema.fields:
            assert not isinstance(f.dataType, bad), (name, f)
        registry.release_pins()
