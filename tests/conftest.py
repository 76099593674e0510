from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "env_gated: needs a binary/package this container lacks; the skip "
        "reason names the exact unlock command (select the whole set with "
        "`pytest -m env_gated -rs`)")


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from nats_stream_processor_spark.config import SparkEngineConf
    from nats_stream_processor_spark.session import get_spark

    # Small local session for tests: few cores/partitions keeps JVM startup
    # and shuffle overhead low at sf0.001 while exercising the same plans.
    spark = get_spark(
        SparkEngineConf(master="local[4]", shuffle_partitions=4),
        **{
            # static conf: saveAsTable targets (bucketed-join tests)
            "spark.sql.warehouse.dir": "/tmp/spark_graft_warehouse",
        },
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()
