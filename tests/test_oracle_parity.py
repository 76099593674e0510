"""Every registry query vs its DuckDB oracle at sf0.001 — the same check
the driver runs at sf0.01 (row count + schema + order-insensitive value
hash). Parametrized so a failure names the query."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import check_one  # noqa: E402

from conftest import SF_SMOKE  # noqa: E402

from nats_stream_processor_spark import registry  # noqa: E402


@pytest.mark.parametrize("name", list(registry.REGISTRY))
def test_query_matches_oracle(spark, duck, name):
    problem = check_one(spark, duck, name, SF_SMOKE)
    assert problem is None, f"{name}: {problem}"
