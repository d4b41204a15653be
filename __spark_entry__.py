"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``flink_realtime_2024_spark.plans.registry``: every
implemented operator from SURVEY.md §2 registers a named query builder
plus (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_realtime_2024_spark.plans.registry import driver_order  # noqa: E402
from flink_realtime_2024_spark.session import prepare  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation) on /root/testdata/sf0.001."""
    prepare(spark)
    q = driver_order()["flagship_revenue_by_nation"]
    return q.builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by ``registry.driver_order()``: the verification driver
    samples the first 50 ids; the rotation that spreads coverage across
    rounds self-computes from the committed CORRECTNESS_r*.json
    recordings (``registry._auto_rotation``), with ``DRIVER_PRIORITY``
    as the fallback.
    """
    return {name: q.builder for name, q in driver_order().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query id (rows-only ids omitted)."""
    return {name: q.oracle for name, q in driver_order().items() if q.oracle}
