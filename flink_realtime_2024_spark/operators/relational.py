"""Row-level operators: project / filter / flatMap / union / JSON parse.

Reference surface (SURVEY §2.2): Flink DataStream map/filter/flatMap/union
(flink-streaming-java, reference pom.xml:32-37), fastjson parsing of ODS
payloads (realtime-common/pom.xml:23-26), beanutils field copy
(realtime-common/pom.xml:55-58 — subsumed by select-with-alias).

Spark-first: all narrow transformations → fused into one
WholeStageCodegen stage, zero shuffle; filters/projections push into the
parquet scan (visible as PushedFilters/ReadSchema in .explain). At
100 TB these queries are pure scan-throughput, no exchange at all until
an aggregation is introduced.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table
from ..plans.registry import register
from ._util import dec

_PROJECT_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
            * CAST((1 - CAST(l_discount AS DECIMAL(9,4)))
                   * (1 + CAST(l_tax AS DECIMAL(9,4))) AS DECIMAL(12,8))
            AS DECIMAL(24,6)) AS DOUBLE) AS charge,
  concat(l_returnflag, '/', l_linestatus) AS flag_status,
  CAST(l_quantity >= 25 AS INTEGER) AS is_bulk
FROM lineitem
"""


@register("project_compute", oracle=_PROJECT_ORACLE, section="F1,F6")
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 map/project + F6 bean-copy (select with aliases); per-record
    compute stays inside whole-stage codegen — no Python, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    # pre-multiply the small factors into exact DECIMAL(12,8): a triple
    # wide-decimal product would exceed 38 digits and the engines round
    # the overflow differently
    rate = (
        (F.lit(1) - F.col("l_discount").cast("decimal(9,4)"))
        * (F.lit(1) + F.col("l_tax").cast("decimal(9,4)"))
    ).cast("decimal(12,8)")
    charge = (dec("l_extendedprice") * rate).cast("decimal(24,6)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge.cast("double").alias("charge"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        (F.col("l_quantity") >= 25).cast("int").alias("is_bulk"),
    )


_FILTER_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity, l_discount
FROM lineitem
WHERE l_quantity > 30
  AND l_discount BETWEEN 0.02 AND 0.08
  AND l_returnflag <> 'R'
  AND l_shipdate >= TIMESTAMP '1997-01-01'
"""


@register("filter_predicate", oracle=_FILTER_ORACLE, section="F2")
def filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 predicate filter incl. range + inequality; every conjunct is
    pushed to the parquet scan (PushedFilters)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_returnflag") != "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


_EXPLODE_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
WHERE doc_id % 10 = 0
"""


@register("explode_split", oracle=_EXPLODE_ORACLE, section="F3")
def explode_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 flatMap (1→N): split + explode, the Spark-native UDTF shape.
    Generator runs inside codegen; no Python row loop."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    )


_UNION_ORACLE = """
SELECT c_name AS name, 'customer' AS side FROM customer
UNION ALL
SELECT s_name AS name, 'supplier' AS side FROM supplier
"""


@register("set_union_all", oracle=_UNION_ORACLE, section="F5,O3")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5/O3 UNION ALL of same-schema streams — unionByName, a zero-cost
    logical concat (no shuffle, partitions are appended)."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    a = customer.select(F.col("c_name").alias("name"), F.lit("customer").alias("side"))
    b = supplier.select(F.col("s_name").alias("name"), F.lit("supplier").alias("side"))
    return a.unionByName(b)


_JSON_ORACLE = """
SELECT
  event_id,
  event_type,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
  CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL AS parsed_ok
FROM events
"""


_DIRTY_SPLIT_ORACLE = """
WITH x AS (
  SELECT event_id,
         CASE WHEN event_id % 10 = 0
              THEN substr(props, 1, length(props) - 1)  -- break the JSON
              ELSE props END AS p
  FROM events
)
SELECT CASE WHEN json_valid(p) THEN 'clean' ELSE 'dirty' END AS branch,
       COUNT(*) AS n
FROM x GROUP BY 1
"""


@register("json_dirty_split", oracle=_DIRTY_SPLIT_ORACLE, section="F7,F4")
def json_dirty_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7+F4 dirty-record routing (the reference's ODS parse step:
    fastjson try/catch → dirty side output): every 10th record's JSON
    is deliberately truncated; parse failure yields NULL, and the
    NULL-ness routes the record to the dirty branch. Parsing stays
    JVM-side (get_json_object) — the dirty path costs nothing extra.
    (Oracle uses json_valid — DuckDB's json_extract throws on malformed
    input rather than returning NULL; equivalent here because every
    valid fixture props object carries the k key.)"""
    ev = load_table(spark, sf_dir, "events")
    p = F.when(
        F.col("event_id") % 10 == 0,
        F.expr("substr(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    k = F.get_json_object(p, "$.k").cast("bigint")
    return (
        ev.select(F.when(k.isNotNull(), "clean").otherwise("dirty").alias("branch"))
        .groupBy("branch")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register("json_extract", oracle=_JSON_ORACLE, section="F7,X5,S10")
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7/X5 JSON parse+validate (reference: fastjson per record,
    realtime-common/pom.xml:23-26). get_json_object is JVM-side — no UDF.
    Malformed rows yield NULL → parsed_ok=false (the dirty-data side
    output becomes a filter on this flag)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select(
        "event_id",
        "event_type",
        k.alias("k"),
        k.isNotNull().alias("parsed_ok"),
    )
