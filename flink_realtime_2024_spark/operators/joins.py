"""Join operators: equi / outer / semi-anti / interval / windowed /
as-of / theta (SURVEY §2.3).

Reference surface: Flink streaming + SQL joins (flink-streaming-java
pom.xml:32-37; table planner pom.xml:118-123), HBase/Redis lookup joins
(realtime-common/pom.xml:39-47, 65-73).

Scale design notes:
- Dim joins are **broadcast hash joins** (Spark's idiom for the
  reference's HBase point-lookup + Redis cache): the dim ships once per
  executor, the fact side never shuffles. This replaces S5/S6/T9.
- Fact⋈fact joins shuffle both sides hash-partitioned on the key;
  AQE re-plans to broadcast when a side is small and splits skewed
  partitions at runtime.
- Interval/windowed joins bound state by time: the equi-key (and bucket)
  is in the join key, so Spark prunes the cross product to
  per-key×per-window — never a full cartesian.
- Theta join is an explicit BroadcastNestedLoopJoin with the SMALL side
  broadcast; output is aggregated before leaving the stage.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..sources.io import load_table
from ..plans.registry import register
from ._util import dec, money_sum, ts_ms, ORACLE_TS_MS

# --- J1 shuffled equi join --------------------------------------------------

_INNER_ORACLE = """
SELECT p.p_brand AS brand,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


@register("join_inner_hash", oracle=_INNER_ORACLE, section="J1", bench=True)
def join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 fact⋈dim equi join + aggregation. Catalyst/AQE pick the physical
    join (SMJ at scale, broadcast when part fits); partial aggregation
    runs map-side before the final shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"), "inner")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum(dec("l_quantity")).alias("sum_qty"),
        )
    )


# --- J2 broadcast dim (lookup) join ------------------------------------------

_BROADCAST_ORACLE = """
SELECT n.n_name AS nation, r.r_name AS region,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
"""


@register("join_broadcast_dim", oracle=_BROADCAST_ORACLE, section="J2,S5,S6")
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 lookup/dim join — the reference's HBase rowkey get + Redis cache
    (realtime-common/pom.xml:39-47,65-73) expressed as explicit broadcast
    hash joins: dim is memory-local on every executor, zero fact shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(dec("c_acctbal")).alias("sum_acctbal"),
        )
    )


# --- J3 outer joins -----------------------------------------------------------

_LEFT_ORACLE = """
SELECT c.c_custkey,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS total_spent
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
"""


@register("join_left_outer", oracle=_LEFT_ORACLE, section="J3")
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left outer: customers with zero orders survive with n_orders=0."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spent"),
        )
    )


_FULL_ORACLE = """
WITH f AS (SELECT o_custkey, COUNT(*) AS n_f FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey),
     o AS (SELECT o_custkey, COUNT(*) AS n_o FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey)
SELECT COALESCE(f.o_custkey, o.o_custkey) AS custkey,
       COALESCE(f.n_f, 0) AS n_finished,
       COALESCE(o.n_o, 0) AS n_open
FROM f FULL OUTER JOIN o ON f.o_custkey = o.o_custkey
"""


@register("join_full_outer", oracle=_FULL_ORACLE, section="J3")
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 full outer join of two keyed aggregates (changelog-merge shape)."""
    orders = load_table(spark, sf_dir, "orders")
    f = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("fk"))
        .agg(F.count(F.lit(1)).alias("n_f"))
    )
    o = (
        orders.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("ok"))
        .agg(F.count(F.lit(1)).alias("n_o"))
    )
    return f.join(o, F.col("fk") == F.col("ok"), "full").select(
        F.coalesce("fk", "ok").alias("custkey"),
        F.coalesce("n_f", F.lit(0)).alias("n_finished"),
        F.coalesce("n_o", F.lit(0)).alias("n_open"),
    )


# --- J6 semi / anti -----------------------------------------------------------

_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
"""


@register("join_semi", oracle=_SEMI_ORACLE, section="J6")
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 left-semi (SQL EXISTS/IN): probe side never duplicates rows."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F")
    return customer.join(
        finished, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""


@register("join_anti", oracle=_ANTI_ORACLE, section="J6")
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 left-anti (SQL NOT EXISTS): customers with no pending orders."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    pending = orders.filter(F.col("o_orderstatus") == "P")
    return customer.join(
        pending, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


# --- J4 interval join ----------------------------------------------------------

_INTERVAL_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, event_type, {ORACLE_TS_MS} AS ms FROM events)
SELECT p.event_id AS purchase_id, c.event_id AS click_id,
       p.ms - c.ms AS lead_ms
FROM e p JOIN e c
  ON c.user_id = p.user_id
 AND c.ms BETWEEN p.ms - 1800000 AND p.ms
WHERE p.event_type = 'purchase' AND c.event_type = 'click'
"""


@register("join_interval", oracle=_INTERVAL_ORACLE, section="J4", bench=True)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 interval join (Flink intervalJoin, pom.xml:32-37): clicks within
    30 min before each purchase, per user. The equi-key (user_id) keeps
    the physical join a hash join with a range residual — per-key state
    only; in streaming form the watermark bounds retained state to the
    interval width."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_id", "user_id", "event_type", ts_ms().alias("ms"))
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id").alias("pu"), F.col("ms").alias("pms")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id").alias("cu"), F.col("ms").alias("cms")
    )
    return p.join(
        c,
        (F.col("cu") == F.col("pu"))
        & F.col("cms").between(F.col("pms") - 1800000, F.col("pms")),
    ).select("purchase_id", "click_id", (F.col("pms") - F.col("cms")).alias("lead_ms"))


# --- J5 window join -------------------------------------------------------------

_WINDOWED_ORACLE = f"""
WITH e AS (SELECT event_id, user_id, event_type,
                  ({ORACLE_TS_MS} // 3600000) * 3600000 AS bucket_ms
           FROM events)
SELECT a.user_id, a.bucket_ms, COUNT(*) AS n_pairs
FROM e a JOIN e b
  ON a.user_id = b.user_id AND a.bucket_ms = b.bucket_ms
WHERE a.event_type = 'view' AND b.event_type = 'click'
GROUP BY a.user_id, a.bucket_ms
"""


@register("join_windowed", oracle=_WINDOWED_ORACLE, section="J5")
def join_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 window join: views⋈clicks of the same user in the same 1h
    tumbling bucket. Bucket is part of the equi-key → plain hash join,
    state bounded by one window per key."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (ts_ms() - ts_ms() % 3600000).alias("bucket_ms")
    e = ev.select("event_id", "user_id", "event_type", bucket)
    a = e.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("au"), F.col("bucket_ms").alias("ab")
    )
    b = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("bu"), F.col("bucket_ms").alias("bb")
    )
    return (
        a.join(b, (F.col("au") == F.col("bu")) & (F.col("ab") == F.col("bb")))
        .groupBy(F.col("au").alias("user_id"), F.col("ab").alias("bucket_ms"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- J7 as-of (temporal) join ----------------------------------------------------

_ASOF_ORACLE = """
WITH versions AS (
  SELECT c_custkey, g.i AS version,
         CAST(CAST(c_acctbal AS DECIMAL(18,4)) * (1 + g.i) AS DOUBLE) AS acctbal_v,
         TIMESTAMP '1994-01-01' + INTERVAL 1 DAY * (730 * g.i) AS valid_from
  FROM customer, (VALUES (0),(1),(2)) g(i)
)
SELECT o.o_orderkey, v.version, v.acctbal_v
FROM orders o JOIN versions v
  ON v.c_custkey = o.o_custkey AND v.valid_from <= o.o_orderdate
QUALIFY ROW_NUMBER() OVER (PARTITION BY o.o_orderkey ORDER BY v.valid_from DESC) = 1
"""


@register("join_asof_latest", oracle=_ASOF_ORACLE, section="J7,S3", bench=True)
def join_asof_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 temporal/as-of join (Flink temporal table join over CDC-versioned
    dims): each order joins the dim version valid at its event time.
    Implementation: shuffled equi-join on the entity key with the
    valid_from <= ts range as a residual predicate, then keep the latest
    version per probe row via row_number. The versioned dim here derives
    from customer — it SCALES with the data, so no explicit broadcast
    (that was round 1's plan and would OOM executors at 100 TB); AQE
    still auto-broadcasts whenever the dim side is actually small."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    versions = (
        customer.select("c_custkey", "c_acctbal")
        .withColumn("version", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
        .select(
            "c_custkey",
            "version",
            (dec("c_acctbal") * (F.lit(1) + F.col("version"))).cast("double").alias("acctbal_v"),
            F.timestamp_add(
                "DAY", F.col("version") * 730, F.lit("1994-01-01").cast("timestamp_ntz")
            ).alias("valid_from"),
        )
    )
    joined = orders.join(
        versions,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("valid_from") <= F.col("o_orderdate")),
    )
    w = Window.partitionBy("o_orderkey").orderBy(F.col("valid_from").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "version", "acctbal_v")
    )


# --- skew utility: salted join ------------------------------------------------------


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-buster for fact⋈fact joins on hot keys: the (skewed) left
    side gets a random-but-deterministic salt appended to its key; the
    right side is replicated n_salts× with every salt value, so a hot
    key's rows spread over n_salts reducers instead of one. AQE's skew
    handling covers sort-merge joins automatically — this is the manual
    pattern for the cases it can't see (e.g. aggregations downstream, or
    non-AQE engines), kept as a library utility + test.

    Salt is derived from a stable hash of a whole left row (xxhash64),
    not rand(): deterministic across retries — an exactly-once
    requirement under task re-execution.

    Join types preserving unmatched RIGHT rows are rejected: the right
    side is replicated n_salts×, so an unmatched right row would
    surface once per salt — inner/left/semi/anti are the sound forms
    (same restriction as targeted salting below).
    """
    _reject_right_preserving(how)
    salt = (F.abs(F.xxhash64(*left.columns)) % n_salts).alias("__salt")
    l_salted = left.withColumn("__salt", salt)
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    r_replicated = right.select("*", salts)
    joined = l_salted.join(
        r_replicated,
        (F.col(left_key) == F.col(right_key)) & (l_salted["__salt"] == r_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")


def _reject_right_preserving(how: str) -> None:
    """Salting replicates right rows, so any join type that emits
    UNMATCHED right rows (right/full outer) would duplicate them once
    per salt — refuse loudly instead of returning wrong rows."""
    if how.lower().replace("_", "") in ("right", "rightouter", "full", "fullouter", "outer"):
        raise ValueError(
            f"salted joins cannot preserve unmatched right rows (how={how!r}); "
            "use inner/left/left_semi/left_anti, or swap the sides"
        )


def detect_hot_keys(
    df: DataFrame,
    key: str,
    sample_fraction: float = 0.001,
    min_sampled_rows: int = 200,
    max_keys: int = 100,
) -> list:
    """Cheap hot-key detection for targeted salting: count keys over a
    deterministic sample (seeded — stable across retries) and return
    keys whose sampled frequency says they'd swamp one reducer. Driver
    memory is bounded by ``max_keys``; the sample pass is a
    scan+partial-agg, a small fraction of the join it protects. At
    100 TB this is the same pre-pass AQE's skew statistics do at
    runtime, available to plans AQE can't rewrite.

    NULL keys are excluded: they never match an equi-join predicate
    (so salting them buys nothing), and `F.col(key).isin(hot_keys)`
    can never select them anyway — without this filter a null-heavy
    key column (the most common real skew source) would silently get
    NO salting while its rows still hash to a single reducer. Callers
    with null-skewed inputs should filter nulls before the join; inner
    joins drop them by definition."""
    counts = (
        df.sample(fraction=sample_fraction, seed=7)
        .filter(F.col(key).isNotNull())
        .groupBy(key)
        .count()
        .filter(F.col("count") >= min_sampled_rows)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    return [r[key] for r in counts]


def salted_join_targeted(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 16,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """TARGETED skew salting — the form that actually scales. Blanket
    ``salted_join`` replicates the ENTIRE right side n_salts×, so its
    cost is O(n_salts × |right|): measured in the r8 bench skew probe,
    that replication overwhelms the straggler win (blanket salting ran
    0.8× — slower than the skewed plain join — on a corpus where one
    key owns 30% of 6M rows). The fix every production engine uses:
    salt ONLY the hot keys. Left rows with a hot key spread over
    n_salts reducers; right rows are replicated n_salts× ONLY for hot
    keys (everything else keeps salt 0 and joins exactly as before), so
    the added shuffle volume is O(n_salts × |right rows of hot keys|) —
    per-key constant, independent of |right|.

    ``hot_keys`` defaults to :func:`detect_hot_keys` on the left side;
    pass an explicit list when the hot set is known (e.g. from last
    run's AQE stats). The hot list is broadcast via an ``isin`` literal
    — bounded at ``max_keys``. Salt is a stable whole-row hash, not
    rand(): deterministic under task re-execution. Right/full outer are
    rejected (replicated right rows would duplicate when unmatched)."""
    _reject_right_preserving(how)
    if hot_keys is None:
        hot_keys = detect_hot_keys(left, left_key)
    if not hot_keys:  # nothing skewed: plain equi join, zero overhead
        return left.join(right, F.col(left_key) == F.col(right_key), how)
    is_hot_l = F.col(left_key).isin(hot_keys)
    l_salted = left.withColumn(
        "__salt",
        F.when(is_hot_l, F.abs(F.xxhash64(*left.columns)) % n_salts).otherwise(F.lit(0)),
    )
    is_hot_r = F.col(right_key).isin(hot_keys)
    r_replicated = right.withColumn(
        "__salts",
        F.when(
            is_hot_r, F.sequence(F.lit(0), F.lit(n_salts - 1))
        ).otherwise(F.array(F.lit(0))),
    ).withColumn("__salt", F.explode("__salts")).drop("__salts")
    joined = l_salted.join(
        r_replicated,
        (F.col(left_key) == F.col(right_key))
        & (l_salted["__salt"] == r_replicated["__salt"]),
        how,
    )
    return joined.drop("__salt")


_SKEW_SALTED_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


@register("join_skew_salted", oracle=_SKEW_SALTED_ORACLE, section="J1,SKEW", bench=True)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manual skew-salted fact⋈fact join, oracle-checked against the
    plain join: salting redistributes hot keys over n_salts reducers
    without changing semantics. This is the documented fallback when
    AQE's skew-join can't help (aggregation directly downstream, or a
    deliberately disabled AQE); the oracle equality IS the correctness
    claim that salting is invisible in the result."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return (
        salted_join(li, orders, "l_orderkey", "o_orderkey", n_salts=8)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@register("join_skew_salted_targeted", oracle=_SKEW_SALTED_ORACLE, section="J1,SKEW")
def join_skew_salted_targeted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TARGETED skew salting (r8), oracle-checked against the plain
    join: only a declared hot-key set is salted/replicated, so the
    added shuffle volume is per-hot-key constant instead of
    O(n_salts × |right|) — the form that wins the bench skew probe
    where blanket salting loses to its own replication. The fixture is
    uniform, so a known key set (the 5 smallest orderkeys — collected
    bounded) is forced hot here; the oracle equality proves the
    hot/cold split, per-key replication, and salt-matched join are
    semantics-invisible. The measured skew case lives in BENCH_r8's
    ``skew_probe`` block (one key owning 30% of a 10× corpus)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    hot = [r["o_orderkey"] for r in orders.orderBy("o_orderkey").limit(5).collect()]
    return (
        salted_join_targeted(
            li, orders, "l_orderkey", "o_orderkey", n_salts=8, hot_keys=hot
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


# --- J8 theta (non-equi) join ------------------------------------------------------

_THETA_ORACLE = """
SELECT s.s_suppkey,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
FROM supplier s JOIN part p
  ON p.p_retailprice BETWEEN s.s_acctbal / 10 AND s.s_acctbal / 10 + 200
GROUP BY s.s_suppkey
"""


@register("join_theta_range", oracle=_THETA_ORACLE, section="J8")
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 theta/non-equi join → BroadcastNestedLoopJoin with the smaller
    side (supplier) broadcast; result aggregated before any exchange.
    BNLJ is the ONLY physical form for a raw theta join, so this
    operator is inherently broadcast-bound; the scale path is
    join_range_banded below — same oracle, equi-join on a derived band
    key — which is what you'd run at 100 TB."""
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    lo = F.col("s_acctbal") / 10
    return (
        part.join(
            F.broadcast(supplier),
            F.col("p_retailprice").between(lo, lo + 200),
        )
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_sum(dec("p_retailprice")).alias("sum_price"),
        )
    )


@register("join_range_banded", oracle=_THETA_ORACLE, section="J8,SKEW", bench=True)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8 scale path: the same range join as join_theta_range, rewritten
    as a shuffled EQUI-join on a derived band key — no broadcast, no
    nested loop, survives both sides growing with the data.

    The interval [lo, lo+200] has exactly the band width (200), so each
    supplier row lands in at most 2 bands (explode ×2); each part row
    lands in exactly 1 (floor(price/200)). The equi-join on band
    restores hash partitioning; the original range predicate runs as a
    residual filter. Oracle equality with the BNLJ form proves the
    rewrite is semantics-invisible."""
    width = 200
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal")
    part = load_table(spark, sf_dir, "part").select("p_retailprice")
    lo = (F.col("s_acctbal") / 10).alias("lo")
    s_banded = supplier.select("s_suppkey", lo).select(
        "s_suppkey",
        "lo",
        F.explode(
            F.array(F.floor(F.col("lo") / width), F.floor(F.col("lo") / width) + 1)
        ).alias("band"),
    )
    p_banded = part.select(
        "p_retailprice", F.floor(F.col("p_retailprice") / width).alias("band")
    )
    return (
        p_banded.join(s_banded, "band")
        .filter(F.col("p_retailprice").between(F.col("lo"), F.col("lo") + width))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_sum(dec("p_retailprice")).alias("sum_price"),
        )
    )
