#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the noop sink (computes
everything, writes nothing) so timings measure engine work, not driver
collection. One shared SparkSession; a warm-up action first so JVM/
codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_realtime_2024_spark.plans.registry import all_queries  # noqa: E402
from flink_realtime_2024_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = {name: q for name, q in all_queries().items() if q.bench}

    # warm-up: JVM, codegen, parquet footer caches
    materialize(queries["flagship_revenue_by_nation"].builder(spark, SF_DIR).limit(1))

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name in sorted(queries):
        t0 = time.perf_counter()
        materialize(queries[name].builder(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
