"""Flagship query: revenue by nation (the DWS 'trade by province' shape).

The reference's DWS layer lands per-dimension trade aggregates in Doris
(module realtime-dws, reference pom.xml:11-16; Doris connector
realtime-common/pom.xml:50-53). Batch analog: fact⋈fact⋈dim⋈dim star
join + filtered aggregation + sort — exercises S8, F1, F2, J1, J2, A1,
O1 in one query.

Scale notes: lineitem⋈orders is the big shuffle (both sides hash-
partitioned on orderkey; AQE handles skew); customer⋈nation is a
broadcast hash join (25-row dim) — explicitly hinted so the plan never
degrades to a shuffle at any SF. Revenue is computed in DECIMAL so the
result is independent of partial-aggregation order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table
from .registry import register

_ORACLE = """
SELECT
  n.n_name AS nation,
  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4))
       AS DOUBLE) AS revenue,
  COUNT(*) AS order_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, nation
"""


@register("flagship_revenue_by_nation", oracle=_ORACLE, section="S8,F1,F2,J1,J2,A1,O1", bench=True)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    revenue_expr = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(revenue_expr).cast("decimal(38,4)").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("order_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )
