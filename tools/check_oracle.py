"""Driver-mimic harness: run every registry query on Spark AND its DuckDB
oracle, compare row-count + sorted-column schema + order-insensitive value
hash. Run locally before every commit:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v):
    """Canonicalize a value for cross-engine comparison."""
    import datetime
    import decimal
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return canon(float(v))
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def _spark_num_kind(dt, has_null: bool) -> str | None:
    """'i'/'f' for numeric Spark types as pandas would materialize them
    (integral-with-nulls becomes float64 in a toPandas round-trip)."""
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "f" if has_null else "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.DecimalType):
        return "dec"
    return None


def dtype_drift(oracle_rel_sql, con, scols, srows, sdf) -> list[str]:
    """Detect int-vs-float dtype drift between the Spark result and the
    DuckDB oracle as PANDAS would see them — the class behind the r3
    driver hash mismatches: DuckDB sum(BIGINT) returns HUGEINT, which
    fetchdf() materializes as float64, so a dtype-faithful hasher renders
    "1234.0" against Spark's int64 "1234". fetchall() hides this (HUGEINT
    comes back as a Python int), hence the separate probe.

    ``oracle_rel_sql`` is any SQL yielding the oracle result with its
    original types — since r16, check_one passes a scan of the temp
    table it materialized once (a CTAS preserves result types exactly,
    HUGEINT included), so the probe no longer re-executes the full
    oracle: the heavy training-CTE oracles ran TWICE per check before,
    which was a large share of the parity sweep's wall time."""
    import decimal
    try:
        odf = con.execute(oracle_rel_sql).fetchdf()
    except Exception as ex:
        return [f"dtype probe duckdb error: {str(ex)[:200]}"]
    nulls = {c: any(r[i] is None for r in srows) for i, c in enumerate(scols)}
    skinds = {f.name: _spark_num_kind(f.dataType, nulls.get(f.name, False))
              for f in sdf.schema.fields}
    problems = []
    for c in odf.columns:
        ok = odf[c].dtype.kind
        if ok == "O" and len(odf) and isinstance(odf[c].iloc[0], decimal.Decimal):
            ok = "dec"
        sk = skinds.get(c)
        if sk is None:
            continue
        if (sk == "i" and ok == "f") or (sk == "f" and ok in "iu") \
                or ("dec" in (sk, ok) and sk != ok):
            problems.append(
                f"dtype drift on '{c}': spark={sk} oracle-pandas={ok} "
                f"(cast the oracle expression explicitly)")
    return problems


def driver_canon_hazard(cols: list[str], rows: list[tuple],
                        side: str) -> list[str]:
    """Replicate the round driver's canonicalization step: it materializes
    the result as a pandas DataFrame and calls ``sort_values`` over ALL
    output columns before hashing. pandas factorizes each sort key, which
    raises ``TypeError: unhashable type`` for list-/dict-valued cells — the
    exact failure that made embed_random_projection a driver red for two
    rounds while the fetchall-based mimic kept passing. Probing it here
    closes that blind spot: any query whose final schema the driver cannot
    sort/hash fails the mimic pre-commit, not in CORRECTNESS_r{N}."""
    import pandas as pd
    df = pd.DataFrame(rows, columns=cols)
    try:
        df.sort_values(list(df.columns), kind="stable")
    except Exception as ex:
        return [f"driver-canon hazard ({side}): sort_values over all "
                f"columns raises {type(ex).__name__}: {str(ex)[:120]} — "
                f"reshape array/map outputs into scalar columns or rows"]
    return []


def check_one(spark, con, name: str, sf_dir: str, explain: bool = False,
              strict: bool = True, plan_sink: dict | None = None) -> str | None:
    """Run one registry query vs its oracle; return a failure description or
    None on pass. Rows-only entries pass when they produce >= 1 row.

    ``plan_sink``: when given, receives {"cartesian": bool} from the
    query's pre-execution simple plan — captured here because the plan
    already exists on the DataFrame being checked, so registry-wide plan
    sweeps (tests/test_plan_audit.py's cartesian audit) can ride the
    sharded parity workers instead of re-building all 273 plans
    serially in a second pass."""
    from nats_stream_processor_spark import registry

    e = registry.REGISTRY[name]
    try:
        sdf = e.fn(spark, sf_dir)
        if explain:
            sdf.explain("formatted")
        if plan_sink is not None:
            plan_sink["cartesian"] = (
                "CartesianProduct"
                in sdf._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("simple")))
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as ex:
        return f"spark error: {str(ex)[:400]}"
    if e.oracle is None:
        if len(srows) == 0:
            return "rows-only query returned zero rows"
        hazards = driver_canon_hazard(scols, srows, "spark") if strict else []
        return "; ".join(hazards) if hazards else None
    try:
        # Materialize the oracle ONCE (CTAS keeps result types exact —
        # HUGEINT stays HUGEINT); the value fetch and the strict-mode
        # pandas dtype probe both read the temp table instead of
        # re-running the query (see dtype_drift).
        con.execute("CREATE OR REPLACE TEMP TABLE _oracle_result AS "
                    + e.oracle)
        cur = con.execute("SELECT * FROM _oracle_result")
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
    except Exception as ex:
        return f"duckdb error: {str(ex)[:400]}"
    problems = []
    if strict:
        problems.extend(driver_canon_hazard(scols, srows, "spark"))
        problems.extend(driver_canon_hazard(ocols, orows, "oracle"))
        problems.extend(dtype_drift("SELECT * FROM _oracle_result", con,
                                    scols, srows, sdf))
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
    if len(srows) != len(orows):
        problems.append(f"rowcount {len(srows)} != {len(orows)}")
    if not problems:
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        if sh != oh:
            problems.append(f"hash {sh} != {oh}")
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
            ls = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
            lo = sorted("|".join(canon(r[i]) for i in order_o) for r in orows)
            for a, b in zip(ls, lo):
                if a != b:
                    problems.append(f"first diff: spark={a[:150]} oracle={b[:150]}")
                    break
    return "; ".join(problems) if problems else None


def make_duck(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument(
        "--no-strict", action="store_true",
        help="skip the pandas dtype-drift probe (HUGEINT/decimal class)")
    ap.add_argument(
        "--plain", action="store_true",
        help="use a bare local[*] SparkSession (no engine conf) — mimics "
        "the round driver's session, catching any accidental dependence "
        "on our tuned settings (timezone, shuffle partitions, Arrow, "
        "broadcast thresholds)")
    args = ap.parse_args()

    from nats_stream_processor_spark import registry
    from nats_stream_processor_spark.session import get_spark

    if args.plain:
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.master("local[*]").getOrCreate()
    else:
        spark = get_spark()
    con = make_duck(args.sf)

    names = args.names or list(registry.REGISTRY)
    failures = 0
    for name in names:
        t0 = time.time()
        problem = check_one(spark, con, name, args.sf, explain=args.explain,
                            strict=not args.no_strict)
        oracle = registry.REGISTRY[name].oracle
        if problem:
            print(f"FAIL {name}: {problem}")
            failures += 1
        else:
            kind = "PASS" if oracle is not None else "ok? (rows-only)"
            print(f"{kind} {name} ({time.time()-t0:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
