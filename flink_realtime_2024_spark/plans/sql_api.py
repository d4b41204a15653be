"""SQL entry point (SURVEY §3.2 — the reference's Table/SQL API).

The reference exposes two equivalent surfaces: the DataStream API and
``tEnv.executeSql`` (flink-table-api-java-bridge, reference
pom.xml:111-116). This engine mirrors that: every fixture table is
registered as a temp view and queries can be written as ANSI SQL via
``spark.sql`` — same Catalyst pipeline, same plans as the DataFrame
builders (asserted by the oracle match).

The SQL text here is intentionally the *same dialect* DuckDB runs as the
oracle, demonstrating surface portability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.io import register_views
from .registry import register

_PRICING_SQL = """
SELECT
  l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST((1 - CAST(l_discount AS DECIMAL(9,4)))
                       * (1 + CAST(l_tax AS DECIMAL(9,4))) AS DECIMAL(12,8)))
            AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("sql_pricing_summary", oracle=_PRICING_SQL, section="§3.2 SQL API", bench=True)
def sql_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-style pricing summary submitted as SQL text — the identical
    string runs on Spark and on the DuckDB oracle side."""
    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(_PRICING_SQL)


_SQL_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49
)
GROUP BY o_orderpriority
"""


@register("sql_exists_subquery", oracle=_SQL_EXISTS, section="§3.2 SQL API,J6")
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS through the SQL surface — Catalyst decorrelates
    to a left-semi join (RewritePredicateSubquery, SURVEY §4)."""
    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(_SQL_EXISTS)
