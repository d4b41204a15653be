"""Scalar function library (SURVEY §2.7).

Reference surface: flink-table-runtime built-ins (pom.xml:125-130) +
fastjson field access (realtime-common/pom.xml:23-26; JSON covered by
``json_extract`` in operators/relational.py).

Everything here is a JVM built-in inside whole-stage codegen — the fast
path. No Python UDFs (those live in functions/udfs.py as the U1-U3
surface).

Oracle notes: DuckDB regexp_replace needs the 'g' flag to match Spark's
global default; day-of-week is skipped (engines disagree on numbering);
map lookups are mirrored by their *result value* in SQL (the oracle
verifies values, not mechanics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table
from ..plans.registry import register

_STRING_ORACLE = """
SELECT
  p_partkey,
  upper(p_name) AS name_upper,
  concat(p_brand, '|', p_type) AS brand_type,
  substring(p_name, 1, 8) AS name_prefix,
  trim(p_name) AS name_trim,
  regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
  CAST(p_type LIKE '%BRASS%' AS INTEGER) AS is_brass,
  length(p_name) AS name_len,
  CAST(strpos(p_name, 'a') AS INTEGER) AS first_a
FROM part
"""


@register("scalar_string", oracle=_STRING_ORACLE, section="X1")
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 string family: concat/substring/trim/regexp/like/length/locate."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.trim("p_name").alias("name_trim"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowel"),
        F.col("p_type").like("%BRASS%").cast("int").alias("is_brass"),
        F.length("p_name").alias("name_len"),
        F.locate("a", F.col("p_name")).alias("first_a"),
    )


_DATETIME_ORACLE = """
SELECT
  o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS order_day,
  strftime(o_orderdate, '%Y-%m') AS order_month,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
  CAST(month(o_orderdate) AS BIGINT) AS order_monthnum,
  CAST(day(o_orderdate) AS BIGINT) AS order_daynum,
  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_day,
  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
    AS days_since_1995,
  epoch_ms(o_orderdate) AS order_epoch_ms
FROM orders
"""


@register("scalar_datetime", oracle=_DATETIME_ORACLE, section="X2")
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 date/time family — DATE_FORMAT partition keys (the reference's
    ts→'yyyy-MM-dd' DWS bucketing), extraction, arithmetic, epoch ms."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.month("o_orderdate").cast("bigint").alias("order_monthnum"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_daynum"),
        F.date_format(F.timestamp_add("DAY", F.lit(30), F.col("o_orderdate")), "yyyy-MM-dd").alias("due_day"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_1995"),
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("order_epoch_ms"),
    )


_MATH_ORACLE = """
SELECT
  l_orderkey, l_linenumber,
  abs(l_discount - 0.05) AS disc_dist,
  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
  CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
  power(1 + CAST(l_tax AS DOUBLE), 2) AS tax_sq,
  sqrt(l_quantity) AS qty_sqrt,
  CASE WHEN l_quantity >= 40 THEN 'heavy'
       WHEN l_quantity >= 20 THEN 'medium'
       ELSE 'light' END AS qty_class,
  coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_or_none,
  greatest(l_discount, l_tax) AS max_rate,
  least(l_discount, l_tax) AS min_rate
FROM lineitem
"""


@register("scalar_math_case", oracle=_MATH_ORACLE, section="X3")
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 math + conditional family: abs/ceil/floor/mod/power/sqrt,
    CASE WHEN, coalesce/nullif, greatest/least."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("disc_dist"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.pow(F.lit(1) + F.col("l_tax"), 2).alias("tax_sq"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.when(F.col("l_quantity") >= 40, "heavy")
        .when(F.col("l_quantity") >= 20, "medium")
        .otherwise("light")
        .alias("qty_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias("flag_or_none"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


# The oracle mirrors results, not mechanics: DuckDB's MAP lookup returns a
# list, so brand_lookup is mirrored by its value (p_brand).
_ARRAY_ORACLE = """
SELECT
  p_partkey,
  array_to_string(string_split(p_type, ' ')[1:2], '-') AS type_head,
  string_split(p_type, ' ')[1] AS first_word,
  CAST(len(string_split(p_type, ' ')) AS INTEGER) AS n_words,
  CAST(list_contains(string_split(p_type, ' '), 'PLATED') AS INTEGER) AS has_plated,
  'brand,type' AS meta_keys,
  p_brand AS brand_lookup,
  array_to_string(list_sort(string_split(p_type, ' ')), ' ') AS words_sorted
FROM part
"""


@register("scalar_array_map", oracle=_ARRAY_ORACLE, section="X4")
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 array/map family: construction, 1-based element access, size,
    contains, map keys/values. Array/map results are reduced to strings
    or scalars (cross-engine arrays don't hash identically)."""
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    meta = F.create_map(
        F.lit("brand"), F.col("p_brand"), F.lit("type"), F.col("p_type")
    )
    return part.select(
        "p_partkey",
        F.array_join(F.slice(words, 1, 2), "-").alias("type_head"),
        F.element_at(words, 1).alias("first_word"),
        F.size(words).alias("n_words"),
        F.array_contains(words, "PLATED").cast("int").alias("has_plated"),
        F.array_join(F.map_keys(meta), ",").alias("meta_keys"),
        F.element_at(meta, F.lit("brand")).alias("brand_lookup"),
        F.array_join(F.sort_array(words), " ").alias("words_sorted"),
    )


_CJK_ORACLE = """
WITH x AS (
  SELECT doc_id,
         '数据仓库实时计算 ' || lower(substr(text, 1, 40)) AS mixed
  FROM documents
), t AS (
  SELECT doc_id, regexp_extract_all(mixed, '[a-z0-9]+|\\p{Han}') AS toks FROM x
)
SELECT doc_id,
       CAST(len(list_filter(toks, x -> regexp_matches(x, '^\\p{Han}$'))) AS BIGINT)
         AS n_cjk,
       CAST(len(list_filter(toks, x -> NOT regexp_matches(x, '^\\p{Han}$'))) AS BIGINT)
         AS n_latin,
       array_to_string(list_sort(list_distinct(
         list_filter(toks, x -> regexp_matches(x, '^\\p{Han}$')))), '') AS cjk_sorted
FROM t
"""


@register("udtf_tokenize_cjk", oracle=_CJK_ORACLE, section="U2,X1")
def udtf_tokenize_cjk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 CJK-aware tokenization — the reference's IK analyzer row
    (pom.xml:203-207) made concrete: Latin runs tokenize as words, Han
    ideographs as single-character tokens (IK's smallest-grain mode).
    The corpus is English, so a fixed CJK phrase is injected per doc
    and the mixed text tokenized. All JVM regex — the engines' regex
    dialects differ only in script-class spelling (Java \\p{IsHan} vs
    RE2 \\p{Han}); outputs are reduced to counts + a sorted joined
    string per the cross-engine array rule."""
    docs = load_table(spark, sf_dir, "documents")
    mixed = F.concat(F.lit("数据仓库实时计算 "), F.lower(F.substring("text", 1, 40)))
    toks = F.regexp_extract_all(mixed, F.lit(r"[a-z0-9]+|\p{IsHan}"), 0)
    is_han = lambda x: x.rlike(r"^\p{IsHan}$")  # noqa: E731
    cjk = F.filter(toks, is_han)
    return docs.select(
        "doc_id",
        F.size(cjk).cast("bigint").alias("n_cjk"),
        (F.size(toks) - F.size(cjk)).cast("bigint").alias("n_latin"),
        F.array_join(F.sort_array(F.array_distinct(cjk)), "").alias("cjk_sorted"),
    )
