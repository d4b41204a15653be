"""Aggregation operators (SURVEY §2.4).

Reference surface: keyed reduce/aggregate (flink-streaming-java
pom.xml:32-37), SQL agg incl. grouping sets / approx distinct
(table planner+runtime pom.xml:118-130).

Scale notes: every groupBy below benefits from Spark's built-in
two-phase aggregation (partial HashAggregate before the shuffle — the
reference planner's local/global & mini-batch agg, SURVEY §4); verify
with .explain: partial_sum/partial_count appear map-side. Distinct
aggregates rewrite to expand+two-shuffle; approx_count_distinct is the
constant-memory HLL path for 100 TB UV-style metrics.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..sources.io import load_table
from ..plans.registry import register
from ._util import dec, money_sum

# --- A1/A2 keyed hash aggregation (TPC-H Q1 shape) -----------------------------

_Q1_ORACLE = """
SELECT
  l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DECIMAL(38,4))
       AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@register("agg_hash_groupby", oracle=_Q1_ORACLE, section="A1,A2", bench=True)
def agg_hash_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 keyed multi-metric aggregate; A2 two-phase agg is automatic
    (map-side partial HashAggregate). DECIMAL sums → order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum(dec("l_quantity")).alias("sum_qty"),
            money_sum(dec("l_extendedprice")).alias("sum_base_price"),
            F.sum(disc_price).cast("decimal(38,4)").cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- A3 exact distinct ----------------------------------------------------------

_DISTINCT_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS uniq_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_count_distinct", oracle=_DISTINCT_ORACLE, section="A3")
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 exact COUNT(DISTINCT): Catalyst expands to a two-stage plan
    (distinct keys shuffled first). Exact UV per key."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("uniq_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- A4 approx distinct (HLL) -----------------------------------------------------


@register("agg_approx_distinct", oracle=None, section="A4")
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 APPROX_COUNT_DISTINCT — HyperLogLog++, constant memory per key;
    the 100 TB UV path (exact distinct shuffles every key). Rows-only:
    Spark's HLL++ and DuckDB's HLL give different estimates by design.

    Self-reported error (r14, the recall_at_k idiom): the frame carries
    ``exact_uv`` and ``rel_err`` so the driver's rows-only recording
    pins estimate quality, not just row count. The exact column is
    EVIDENCE instrumentation — a production 100 TB UV query runs the
    sketch alone; closeness is also pytest-asserted."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_uv"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_uv"),
    ).withColumn(
        "rel_err",
        F.round(
            F.abs(F.col("approx_uv") - F.col("exact_uv"))
            / F.greatest(F.col("exact_uv"), F.lit(1)),
            4,
        ),
    )


# --- A4a exact percentiles ---------------------------------------------------------

_PERCENTILE_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


_HISTOGRAM_ORACLE = """
SELECT CAST(CASE WHEN CAST(o_totalprice AS DOUBLE) < 0 THEN 0
            WHEN CAST(o_totalprice AS DOUBLE) >= 600000 THEN 13
            ELSE 1 + floor(CAST(o_totalprice AS DOUBLE) / 50000) END AS BIGINT)
         AS bucket,
       COUNT(*) AS n,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS lo,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS hi
FROM orders
GROUP BY 1
"""


@register("agg_histogram", oracle=_HISTOGRAM_ORACLE, section="A1,X3")
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/X3 equi-width histogram via width_bucket (Spark side; the
    oracle spells out the identical SQL-standard bucket arithmetic —
    DuckDB 1.0 lacks the function): the serving-layer distribution
    chart in one aggregation — a two-phase count per bucket, no sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.width_bucket(F.col("o_totalprice").cast("double"), F.lit(0), F.lit(600000), F.lit(12)).alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(dec("o_totalprice")).cast("double").alias("lo"),
            F.max(dec("o_totalprice")).cast("double").alias("hi"),
        )
    )


@register("agg_approx_percentile", oracle=None, section="A4")
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 sketch percentiles: approx_percentile (Greenwald-Khanna) with
    accuracy 10000 — the 100 TB path where the exact interpolated
    percentile's full sort-per-group is too expensive. Mergeable sketch
    ⇒ two-phase aggregation like any other agg. Rows-only (DuckDB has
    no GK sketch with matching error bounds); closeness to the exact
    percentiles is pytest-asserted.

    Self-reported error (r14): ``exact_p50``/``exact_p95`` and the
    relative errors ride the same aggregation as evidence columns, so
    the rows-only recording pins sketch quality in-query."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("ap50"),
        F.approx_percentile("o_totalprice", F.lit(0.95), F.lit(10000)).alias("ap95"),
        F.count(F.lit(1)).alias("n_orders"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact_p50"),
        F.percentile("o_totalprice", F.lit(0.95)).alias("exact_p95"),
    ).select(
        "o_orderstatus", "ap50", "ap95", "n_orders",
        F.round("exact_p50", 4).alias("exact_p50"),
        F.round("exact_p95", 4).alias("exact_p95"),
        F.round(
            F.abs(F.col("ap50") - F.col("exact_p50")) / F.col("exact_p50"), 4
        ).alias("rel_err_p50"),
        F.round(
            F.abs(F.col("ap95") - F.col("exact_p95")) / F.col("exact_p95"), 4
        ).alias("rel_err_p95"),
    )


@register("agg_percentile", oracle=_PERCENTILE_ORACLE, section="A4a")
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4a exact interpolated percentiles per group (p25/p50/p75 of order
    value) — Spark ``percentile`` and DuckDB ``quantile_cont`` share the
    continuous index = p·(n-1) definition; round(4) absorbs last-ulp
    interpolation noise. At 100 TB swap to ``approx_percentile``
    (t-digest-style sketch, constant memory per key) the same way
    agg_approx_distinct trades exact distinct for HLL."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- A5 rollup / cube --------------------------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP(l_returnflag, l_linestatus)
"""


@register("agg_rollup", oracle=_ROLLUP_ORACLE, section="A5", bench=True)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 ROLLUP — hierarchical subtotals (the DWS multi-dim cube write
    path). Spark expands grouping sets in one pass over the data."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("bigint").alias("g_flag"),
        F.grouping("l_linestatus").cast("bigint").alias("g_status"),
        money_sum(dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "l_returnflag", "l_linestatus", "g_flag", "g_status", "sum_qty", "n"
    )


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""


@register("agg_cube", oracle=_CUBE_ORACLE, section="A5")
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 CUBE — all grouping-set combinations in one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        money_sum(dec("o_totalprice")).alias("sum_price"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "sum_price"
    )


_BITWISE_ORACLE = """
SELECT o_orderstatus,
       bit_and(o_orderkey % 256) AS and_bits,
       bit_or(o_orderkey % 256) AS or_bits,
       bit_xor(o_orderkey % 256) AS xor_bits,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_bitwise", oracle=_BITWISE_ORACLE, section="A1,X3")
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/X3 bitwise aggregates (flag-mask rollups): AND/OR/XOR over a
    byte-range key per group — associative+commutative, so they combine
    map-side like any sum and are order-independent by construction."""
    orders = load_table(spark, sf_dir, "orders")
    low = F.col("o_orderkey") % 256
    return orders.groupBy("o_orderstatus").agg(
        F.bit_and(low).alias("and_bits"),
        F.bit_or(low).alias("or_bits"),
        F.bit_xor(low).alias("xor_bits"),
        F.count(F.lit(1)).alias("n"),
    )


_STRING_AGG_ORACLE = """
SELECT o_orderstatus,
       string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
         AS priorities,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_string_agg", oracle=_STRING_AGG_ORACLE, section="A7,X1")
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/X1 ordered string aggregation (LISTAGG / string_agg): distinct
    values concatenated in a DEFINED order — Spark expresses it as
    sort_array(collect_set) + array_join, which is order-stable by
    construction (collect order never leaks into the result)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(
            F.sort_array(F.collect_set("o_orderpriority")), "|"
        ).alias("priorities"),
        F.count(F.lit(1)).alias("n"),
    )


_GROUPING_SETS_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("agg_grouping_sets", oracle=_GROUPING_SETS_ORACLE, section="A5")
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 arbitrary GROUPING SETS (not the rollup/cube lattice): status
    totals, priority totals, and the grand total in ONE pass — Spark's
    Expand replicates each row once per set before a single two-phase
    aggregate, vs three separate scans."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.grouping("o_orderstatus").cast("bigint").alias("g_status"),
        F.grouping("o_orderpriority").cast("bigint").alias("g_priority"),
        F.count(F.lit(1)).alias("n"),
        money_sum(dec("o_totalprice")).alias("sum_price"),
    ).select(
        "o_orderstatus", "o_orderpriority", "g_status", "g_priority", "n", "sum_price"
    )


# --- A6 conditional / filtered aggregation ---------------------------------------------

_CONDITIONAL_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
       COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_big,
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                     THEN CAST(o_totalprice AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
         AS finished_value
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_conditional", oracle=_CONDITIONAL_ORACLE, section="A6")
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 per-metric conditional aggregation (COUNT(IF(cond,1,NULL))-style,
    the DWS multi-metric bean pattern) — one pass, N metrics."""
    orders = load_table(spark, sf_dir, "orders")
    one_if = lambda cond: F.sum(F.when(cond, 1).otherwise(0))  # noqa: E731
    return orders.groupBy("o_orderpriority").agg(
        one_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        one_if(F.col("o_orderstatus") == "O").alias("n_open"),
        one_if(F.col("o_totalprice") > 200000).alias("n_big"),
        F.sum(
            F.when(F.col("o_orderstatus") == "F", dec("o_totalprice")).otherwise(F.lit(0))
        )
        .cast("double")
        .alias("finished_value"),
    )


# --- A7 collect list/set -------------------------------------------------------------

_COLLECT_ORACLE = """
SELECT c_mktsegment,
       array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
       COUNT(*) AS n
FROM customer
GROUP BY c_mktsegment
"""


@register("agg_collect", oracle=_COLLECT_ORACLE, section="A7")
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 collect_set → sorted, joined to a string so the value is
    order-stable across engines (arrays hash engine-specifically)."""
    customer = load_table(spark, sf_dir, "customer")
    nations = F.array_join(
        F.transform(F.sort_array(F.collect_set("c_nationkey")), lambda x: x.cast("string")),
        ",",
    )
    return customer.groupBy("c_mktsegment").agg(
        nations.alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


# --- A8 statistical moments ----------------------------------------------------------

_STATS_ORACLE = """
SELECT o_orderstatus,
       round(stddev_samp(o_totalprice), 4) AS sd_price,
       round(corr(o_totalprice, epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000.0), 6)
         AS corr_price_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_stats", oracle=_STATS_ORACLE, section="A8")
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 statistical moments per group: sample stddev, Pearson
    correlation (price vs order day), exact-decimal average. Both engines
    merge co-moments pairwise, so values agree to well under the round(4)
    / round(6) quantum; the average follows the decimal-sum-then-divide
    parity rule. One pass, map-side partial moments — the same
    constant-memory-per-key profile as sum/count at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    day = F.unix_millis(F.col("o_orderdate").cast("timestamp")) / 86400000.0
    return o.groupBy("o_orderstatus").agg(
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
        F.round(F.corr(F.col("o_totalprice"), day), 6).alias("corr_price_day"),
        (money_sum(dec("o_totalprice")) / F.count(F.lit(1))).alias("avg_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --- A9 pivot ------------------------------------------------------------------------

_PIVOT_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
FROM orders
GROUP BY o_orderpriority
"""


@register("agg_pivot", oracle=_PIVOT_ORACLE, section="A9")
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 pivot (rows→columns crosstab) with an EXPLICIT values list —
    without it Spark runs an extra eager distinct-values job over the
    fact table before it can even plan. The plan is two-phase: a
    map-side-combined sum per (group, pivot-value) cell, then a tiny
    pivotfirst shuffle carrying only O(groups) rows — the fact table is
    read and shuffled once. Money cells follow the decimal-sum parity
    rule."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )


_BITMAP_ORACLE = """
SELECT o_orderstatus,
       COUNT(DISTINCT o_custkey) AS n_distinct_cust
FROM orders
GROUP BY o_orderstatus
"""


@register("agg_bitmap_distinct", oracle=_BITMAP_ORACLE, section="A3,A4")
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via mergeable bitmaps — the Doris BITMAP
    column pattern the reference's serving layer relies on for exact
    UV counts (SURVEY §2.7): values map to (bucket, bit) positions,
    per-bucket bitmaps OR together in partial aggregation, and the
    final count is a sum of popcounts.

    Scale shape: the two-level groupBy means every map task emits at
    most one fixed-size (≤4 KB) bitmap per (group, bucket) — the
    shuffle carries bitmaps, never raw values, unlike count-distinct's
    value-expand. This is how exact UV survives 100 TB; results are
    bit-equal to COUNT(DISTINCT)."""
    orders = load_table(spark, sf_dir, "orders")
    per_bucket = orders.groupBy(
        "o_orderstatus", F.bitmap_bucket_number("o_custkey").alias("bkt")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("o_custkey")).alias("bm"))
    return per_bucket.groupBy("o_orderstatus").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_distinct_cust")
    )


@register("agg_hll_union", oracle=None, section="A4,S7")
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches — the Doris HLL column type: per-nation
    customer sketches built once, then UNIONED (not recomputed) up to
    region grain and estimated. Rows-only: DataSketches estimates are
    engine-specific by design; closeness to the exact count is asserted
    in tests/test_semantics.py.

    Scale shape: re-aggregation to coarser grains touches only sketch
    bytes (~KB per group), never the fact table — the pre-aggregated
    serving-table pattern (S7) for approximate UV at 100 TB.

    Self-reported error (r14): ``exact_customers``/``rel_err`` join in
    as evidence columns so the rows-only recording pins estimate
    quality. The exact side deliberately lives in a SEPARATE aggregate
    (the sketch path still never touches per-row data after the
    per-nation sketches) — instrumentation only, as with the kNN
    recall column."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    dim = F.broadcast(nation.select("n_nationkey", "n_regionkey"))
    per_nation = customer.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(14)).alias("sk")
    )
    est = (
        per_nation.join(dim, per_nation.c_nationkey == F.col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("bigint").alias("est_customers")
        )
    )
    exact = (
        customer.join(dim, customer.c_nationkey == F.col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(F.countDistinct("c_custkey").alias("exact_customers"))
    )
    return (
        est.join(exact, "n_regionkey")
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("est_customers") - F.col("exact_customers"))
                / F.greatest(F.col("exact_customers"), F.lit(1)),
                4,
            ),
        )
        .orderBy("n_regionkey")
    )
