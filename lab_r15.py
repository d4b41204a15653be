#!/usr/bin/env python
"""Round-15 optimization lab: isolate one (or a few) queries, time them
with the bench methodology (noop sink, warm-up at sf0.001, min of N reps)
and optionally capture .explain("formatted").

Usage:
  python lab_r15.py time <query> [<query> ...] [--reps N]
  python lab_r15.py plan <query> [--out plans/r15/<query>_before.txt]

Not part of the driver contract; a measurement tool only.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_realtime_2024_spark.plans.registry import all_queries  # noqa: E402
from flink_realtime_2024_spark.session import get_spark  # noqa: E402
from flink_realtime_2024_spark.sources.io import enable_hot_cache, load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_SF = "/root/testdata/sf0.001"


def materialize(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    mode = sys.argv[1]
    names = [a for a in sys.argv[2:] if not a.startswith("--")]
    reps = 3
    out_path = None
    for i, a in enumerate(sys.argv):
        if a == "--reps":
            reps = int(sys.argv[i + 1])
        if a == "--out":
            out_path = sys.argv[i + 1]

    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark(app_name="lab_r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # same staging as bench.py so scans hit the hot layout
    enable_hot_cache(True)
    from concurrent.futures import ThreadPoolExecutor

    tables = (
        "lineitem orders customer supplier part nation region events documents embeddings"
    ).split()
    with ThreadPoolExecutor(max_workers=len(tables)) as pool:
        list(pool.map(lambda t: load_table(spark, SF_DIR, t), tables))
    try:
        from flink_realtime_2024_spark.plans.warehouse import ensure_bucketed_tables

        ensure_bucketed_tables(spark, SF_DIR)
    except Exception as e:
        print(f"bucketed staging failed: {e}", file=sys.stderr)

    if mode == "plan":
        name = names[0]
        df = qs[name].builder(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if out_path:
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
            with open(out_path, "w") as fh:
                fh.write(txt)
            print(f"wrote {out_path} ({len(txt)} bytes)")
        else:
            print(txt)
        return

    results = {}
    for name in names:
        q = qs[name]
        try:
            materialize(q.builder(spark, WARM_SF))  # codegen warm-up
        except Exception as e:
            print(f"warmup {name}: {type(e).__name__}: {e}", file=sys.stderr)
        times = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"lab:{name}")
            t0 = time.perf_counter()
            materialize(q.builder(spark, SF_DIR))
            times.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = times
        print(f"{name}: min={min(times):.3f} reps={times}", flush=True)
    print("RESULT", results)


if __name__ == "__main__":
    main()
