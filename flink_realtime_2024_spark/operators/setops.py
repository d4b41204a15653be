"""Sort / limit / set operations (SURVEY §2.6).

Reference surface: SQL ORDER BY / LIMIT / UNION / INTERSECT / EXCEPT
(flink-table-planner pom.xml:118-123).

Scale notes: global ORDER BY is a range-partitioned sort (sampled
boundaries) — fine for serving-sized results, avoided on raw facts;
top-k compiles to TakeOrderedAndProject (per-partition heap + driver
merge of k rows, no full sort). INTERSECT/EXCEPT rewrite to semi/anti
joins under the hood.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table
from ..plans.registry import register

_ORDERBY_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY o_orderpriority
ORDER BY total DESC
"""


@register("sort_orderby", oracle=_ORDERBY_ORACLE, section="O1")
def sort_orderby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 global ORDER BY on an aggregated (serving-sized) result — the
    Doris-side sort of the reference, done engine-side."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("total"),
        )
        .orderBy(F.col("total").desc())
    )


_TOPK_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
"""


@register("sort_limit_topk", oracle=_TOPK_ORACLE, section="O2")
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 top-k: orderBy+limit → TakeOrderedAndProject (no global sort;
    each partition keeps a k-heap). Unique tiebreaker ⇒ deterministic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


_UNION_DISTINCT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_union_distinct", oracle=_UNION_DISTINCT_ORACLE, section="O3")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 UNION (distinct): concat + hash-dedup shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.union(o).distinct()


_INTERSECT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_intersect", oracle=_INTERSECT_ORACLE, section="O4")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 INTERSECT — customers having both finished and open orders;
    Catalyst rewrites to a distinct + left-semi join."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersect(o)


_EXCEPT_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_except", oracle=_EXCEPT_ORACLE, section="O4")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 EXCEPT (distinct) — rewrites to distinct + left-anti join."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.subtract(o)


_INTERSECT_ALL_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_intersect_all", oracle=_INTERSECT_ALL_ORACLE, section="O4")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 INTERSECT ALL — bag semantics: each custkey appears
    min(count_left, count_right) times. Catalyst rewrites to a
    per-key count comparison + generate, one shuffle per side."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.intersectAll(o)


_EXCEPT_ALL_ORACLE = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


@register("set_except_all", oracle=_EXCEPT_ALL_ORACLE, section="O4")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 EXCEPT ALL — bag semantics: each custkey survives
    max(count_left - count_right, 0) times."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = orders.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return f.exceptAll(o)
