"""Runs every registered query against its DuckDB oracle at sf0.001
(fast iteration twin of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from flink_realtime_2024_spark.plans.registry import all_queries

from .conftest import SF_DIR
from .parity import compare

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, duck):
    q = _QUERIES[name]
    sdf = q.builder(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only: builder must at least run
        return
    oracle_pdf = duck.execute(q.oracle).df()
    compare(spark_pdf, oracle_pdf, name=name)


def test_compare_is_type_faithful():
    """int64 vs decimal128 columns with equal VALUES must fail compare() —
    the driver's arrow value-hash is type-sensitive, and round 1's only red
    cell (agg_conditional) was exactly this class slipping past a
    value-only comparison."""
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    ints = pd.DataFrame({"n": np.array([1000, 2000], dtype=np.int64)})
    decs = pd.DataFrame({"n": [Decimal(1000), Decimal(2000)]})
    with pytest.raises(AssertionError):
        compare(ints, decs, name="int64-vs-decimal128")
    # same-type equal values still pass
    compare(ints, ints.copy(), name="int64-vs-int64")


def test_compare_engine_side(spark, tmp_path):
    """r12 (verdict #2): the no-driver-collect comparison path must
    carry the same contract as compare() — multiset value equality,
    column-name schema, TYPE sensitivity — computed entirely inside
    the two engines. Pins: match passes (and returns the row count),
    a single changed value fails, a changed duplicate-row COUNT fails
    (multiset, not set, semantics), an int64-vs-HUGEINT type drift
    fails, and a timestamp column survives the parquet round trip
    (Spark writes UTC-adjusted micros that DuckDB reads back as
    TIMESTAMP WITH TIME ZONE; the path casts to naive to meet a naive
    oracle)."""
    import duckdb

    from .parity import compare_engine_side

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(1, 2.5, "a", "2024-01-01 10:00:00"),
         (2, float("nan"), "b", "2024-01-02 11:30:00"),
         (2, float("nan"), "b", "2024-01-02 11:30:00"),  # duplicate row
         (3, None, None, None)],
        "k long, v double, s string, t string",
    ).selectExpr("k", "v", "s", "CAST(t AS TIMESTAMP) AS t")

    base = ("SELECT * FROM (VALUES "
            "(1::BIGINT, 2.5::DOUBLE, 'a', TIMESTAMP '2024-01-01 10:00:00'), "
            "(2::BIGINT, 'NaN'::DOUBLE, 'b', TIMESTAMP '2024-01-02 11:30:00'), "
            "(2::BIGINT, 'NaN'::DOUBLE, 'b', TIMESTAMP '2024-01-02 11:30:00'), "
            "(3::BIGINT, NULL::DOUBLE, NULL::VARCHAR, NULL::TIMESTAMP)"
            ") _t(k, v, s, t)")

    def oracle(sql):
        con.execute(f"CREATE OR REPLACE TEMP TABLE _oracle AS {sql}")
        return "_oracle"

    # match (NaN==NaN, NULL==NULL, duplicates preserved)
    n = compare_engine_side(df, con, oracle(base), "ok", str(tmp_path))
    assert n == 4
    # one value changed -> fail
    with pytest.raises(AssertionError, match="multiset"):
        compare_engine_side(
            df, con, oracle(base.replace("2.5::DOUBLE", "2.6::DOUBLE")),
            "val", str(tmp_path))
    # duplicate multiplicity changed -> fail (EXCEPT ALL, not EXCEPT)
    dedup = f"SELECT DISTINCT * FROM ({base}) _d"
    with pytest.raises(AssertionError, match="multiset"):
        compare_engine_side(df, con, oracle(dedup), "dup", str(tmp_path))
    # type drift: BIGINT vs HUGEINT with equal values -> fail
    hug = base.replace("1::BIGINT", "1::HUGEINT").replace(
        "2::BIGINT", "2::HUGEINT").replace("3::BIGINT", "3::HUGEINT")
    with pytest.raises(AssertionError, match="type mismatch"):
        compare_engine_side(df, con, oracle(hug), "typ", str(tmp_path))

    # decimal reconciliation (r13 review): equal VALUES at differing
    # precision AND differing scale pass the pandas gate (both cells
    # tag 'Decimal'; Decimal('1.50') == Decimal('1.500')), so the
    # engine-side path must agree — widened to DECIMAL(38, max_scale)
    ddf = spark.createDataFrame([(1, "1.50"), (2, "2.25")], "k long, m string")
    ddf = ddf.selectExpr("k", "CAST(m AS DECIMAL(12,2)) AS m")
    dec_oracle = ("SELECT * FROM (VALUES "
                  "(1::BIGINT, 1.500::DECIMAL(18,3)), "
                  "(2::BIGINT, 2.250::DECIMAL(18,3))) _t(k, m)")
    n = compare_engine_side(ddf, con, oracle(dec_oracle), "dec", str(tmp_path))
    assert n == 2
    # but a genuine VALUE difference at the widened scale still fails
    with pytest.raises(AssertionError, match="multiset"):
        compare_engine_side(
            ddf, con,
            oracle(dec_oracle.replace("1.500", "1.501")),
            "dec_val", str(tmp_path))


def test_deltas_skip_quarantined_history(tmp_path, monkeypatch):
    """r12 (verdict #3): a bench_history entry carrying `quarantined`
    (a record taken under known contamination) must never become the
    delta baseline — the next-best clean entry wins instead."""
    import json

    import bench

    hist = [
        {"round": 10, "sf": 0.1, "queries": {"q1": 20.0}},
        {"round": 11, "sf": 0.1, "quarantined": "noisy box",
         "queries": {"q1": 45.0}},
    ]
    (tmp_path / "bench_history.jsonl").write_text(
        "\n".join(json.dumps(e) for e in hist) + "\n"
    )
    monkeypatch.setenv("BENCH_ROUND", "12")
    d = bench._deltas_vs_previous({"q1": 21.0}, 0.1, here=str(tmp_path))
    assert d["vs"] == "r10 (bench_history)", d
    assert d["queries"]["q1"] == pytest.approx(1.0)
    # and the real repo history has the r11 contaminated entry marked
    import os
    repo_hist = os.path.join(os.path.dirname(bench.__file__), "bench_history.jsonl")
    marked = [
        json.loads(ln) for ln in open(repo_hist) if "quarantined" in ln
    ]
    assert any(e.get("value") == 45.273 for e in marked)


def test_bench_round_malformed_env_falls_through(monkeypatch):
    """r11 advice: BENCH_ROUND='r12' (or whitespace) must fall through
    to the PROGRESS.jsonl inference instead of aborting the bench."""
    import bench

    monkeypatch.setenv("BENCH_ROUND", "r12")
    assert isinstance(bench._bench_round(), int)
    monkeypatch.setenv("BENCH_ROUND", "12")
    assert bench._bench_round() == 12


def test_stream_breakdown_accumulates_per_tag():
    """r11 advice: two run_stream calls under one tag within a clear()
    window must SUM their stats, not overwrite."""
    from flink_realtime_2024_spark.streaming.jobs import (
        _accumulate_breakdown,
        last_stream_breakdown,
    )

    last_stream_breakdown.clear()
    _accumulate_breakdown("t", {"batches": 2, "input_rows": 10,
                                "duration_ms": {"addBatch": 5}})
    _accumulate_breakdown("t", {"batches": 3, "input_rows": 7,
                                "duration_ms": {"addBatch": 4, "walCommit": 1},
                                "progress_truncated": True})
    bd = last_stream_breakdown["t"]
    assert bd["batches"] == 5 and bd["input_rows"] == 17
    assert bd["duration_ms"] == {"addBatch": 9, "walCommit": 1}
    assert bd["progress_truncated"] is True
    # truncation flag survives even when the LATER run is clean
    _accumulate_breakdown("t", {"batches": 1, "input_rows": 1,
                                "duration_ms": {}})
    assert last_stream_breakdown["t"]["progress_truncated"] is True
    last_stream_breakdown.clear()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue", "order_lines"}


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "flagship_revenue_by_nation" in qs


def test_live_spark_resurrects_stopped_context():
    """r14 (verdict #1): a JVM-side context stop (what the uncaught
    executor-OOM handler does — python never hears about it) must be
    detected by bench._live_spark(), which rebuilds a working session
    in the same gateway JVM and records the rebuild. Runs in a
    subprocess so the suite's shared session is never touched."""
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = """
import sys
sys.path.insert(0, %r)
import bench
s1 = bench._live_spark()
assert s1.range(10).count() == 10
# stop the context JVM-SIDE only, as SparkUncaughtExceptionHandler does
s1.sparkContext._jsc.sc().stop()
assert bench._context_stopped(s1)
s2 = bench._live_spark()
assert s2 is not s1
assert s2.range(10).count() == 10
assert len(bench._ACTIVE["rebuilds"]) == 1
assert bench._ACTIVE["dead"] == [s1]  # id() pinned, no recycle
print("RESURRECT_OK")
""" % (root,)
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    env["SPARK_DRIVER_MEM"] = "1g"
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, env=env, cwd=root,
    )
    assert "RESURRECT_OK" in proc.stdout, proc.stderr[-2000:]
