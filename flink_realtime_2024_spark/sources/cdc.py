"""CDC changelog emulation (SURVEY §2.1 S3/S4, §3.3).

Reference surface: flink-connector-mysql-cdc 2.4.0
(realtime-common/pom.xml:33-36; pom.xml:158-162) — embedded Debezium
takes a consistent snapshot then tails the binlog, emitting envelopes
``{before, after, op, ts_ms}`` that the DIM layer routes into HBase
(realtime-common/pom.xml:39-47).

Spark has no OSS CDC source, so the engine models the changelog as an
ordered DataFrame of envelope structs (the documented SURVEY §7
decision) and provides the two canonical consumers:

- ``cdc_latest_row`` — materialize current state: latest image per key,
  deletes drop the key (the Flink Deduplication/upsert-materialize op).
- ``dim_upsert`` — apply the changelog in ts-ordered micro-batches to a
  keyed parquet dim store via merge-overwrite (foreachBatch pattern),
  reference's HBase put/delete sink.

The synthetic changelog is derived deterministically from ``orders`` so
DuckDB can reproduce it exactly: every order inserts ('c') at its
orderdate; finished ('F') orders get an update ('u') a day later raising
o_totalprice 10%; every 50th orderkey gets a delete ('d') two days later.

Scale notes: latest-per-key is one hash shuffle on the key + per-key
sort (row_number) — linear in changelog size, no driver involvement;
the merge-overwrite dim store would be hash-bucketed by key range at
100 TB so each micro-batch rewrites only touched buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..plans.registry import register
from ..operators._util import dec
from .io import load_table

# Common CTE (DuckDB) mirroring build_changelog()
CHANGELOG_SQL = """
changelog AS (
  SELECT o_orderkey AS key, 'c' AS op,
         o_totalprice AS totalprice, o_orderstatus AS orderstatus,
         epoch_ms(o_orderdate) AS ts_ms
  FROM orders
  UNION ALL
  SELECT o_orderkey, 'u',
         CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 1.1 AS DOUBLE), o_orderstatus,
         epoch_ms(o_orderdate) + 86400000
  FROM orders WHERE o_orderstatus = 'F'
  UNION ALL
  SELECT o_orderkey, 'd', NULL, NULL, epoch_ms(o_orderdate) + 172800000
  FROM orders WHERE o_orderkey % 50 = 0
)
"""


def build_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered changelog of (key, op, after-image columns, ts_ms).

    Single-scan formulation: each order emits its 1-3 envelopes as an
    inline array that is exploded — one pass over the source instead of
    a 3-branch union (1 scan, not 3, per changelog build; matters when
    the snapshot table is the 100 TB side)."""
    o = load_table(spark, sf_dir, "orders")
    ts0 = F.unix_millis(F.col("o_orderdate").cast("timestamp"))
    env = "struct<op:string,totalprice:double,orderstatus:string,ts_ms:bigint>"

    def _env(op, totalprice, orderstatus, ts):
        return F.struct(
            op.alias("op"),
            totalprice.alias("totalprice"),
            orderstatus.alias("orderstatus"),
            ts.alias("ts_ms"),
        )

    envelopes = F.array_compact(
        F.array(
            _env(F.lit("c"), F.col("o_totalprice"), F.col("o_orderstatus"), ts0),
            F.when(
                F.col("o_orderstatus") == "F",
                _env(
                    F.lit("u"),
                    (dec("o_totalprice") * F.lit(1.1).cast("decimal(18,4)")).cast("double"),
                    F.col("o_orderstatus"),
                    ts0 + 86400000,
                ),
            ).cast(env),
            F.when(
                F.col("o_orderkey") % 50 == 0,
                _env(
                    F.lit("d"),
                    F.lit(None).cast("double"),
                    F.lit(None).cast("string"),
                    ts0 + 172800000,
                ),
            ).cast(env),
        )
    )
    return o.select(
        F.col("o_orderkey").alias("key"), F.explode(envelopes).alias("e")
    ).select("key", "e.op", "e.totalprice", "e.orderstatus", "e.ts_ms")


def latest_per_key(changelog: DataFrame) -> DataFrame:
    """Materialize current state from a changelog: last image per key by
    (ts_ms, op-precedence), deletes drop the key.

    Implemented as MAX_BY over an ordering struct rather than a
    row_number window: an aggregate gets map-side partial combining
    (each upstream partition pre-reduces to one candidate per key before
    the shuffle), while a window must shuffle and sort every changelog
    row — at 100 TB of CDC that is the difference between shuffling
    O(keys) and O(events)."""
    # op precedence breaks same-ts ties deterministically: d > u > c;
    # remaining ties (identical ts+op — possible in a replayed/merged
    # changelog) are broken by the image itself so the result is a
    # deterministic function of the input SET, not of arrival order
    prec = F.when(F.col("op") == "d", 2).when(F.col("op") == "u", 1).otherwise(0)
    latest = changelog.groupBy("key").agg(
        F.max_by(
            F.struct("op", "totalprice", "orderstatus", "ts_ms"),
            F.struct(
                F.col("ts_ms"),
                prec,
                F.coalesce(F.col("totalprice"), F.lit(-1.0)),
                F.coalesce(F.col("orderstatus"), F.lit("")),
            ),
        ).alias("last")
    )
    return latest.filter(F.col("last.op") != "d").select(
        "key", "last.op", "last.totalprice", "last.orderstatus", "last.ts_ms"
    )


_LATEST_ORACLE = f"""
WITH {CHANGELOG_SQL}
SELECT key, op, totalprice, orderstatus, ts_ms
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY key
    ORDER BY ts_ms DESC, CASE op WHEN 'd' THEN 2 WHEN 'u' THEN 1 ELSE 0 END DESC,
             COALESCE(totalprice, -1) DESC, COALESCE(orderstatus, '') DESC
  ) AS rn
  FROM changelog
)
WHERE rn = 1 AND op <> 'd'
"""


@register("cdc_latest_row", oracle=_LATEST_ORACLE, section="S3", bench=True)
def cdc_latest_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 MySQL-CDC materialization: snapshot+binlog → current table
    state (latest row per key, deletes applied)."""
    return latest_per_key(build_changelog(spark, sf_dir))


_SCD2_ORACLE = f"""
WITH {CHANGELOG_SQL}
SELECT key, totalprice, orderstatus,
       ts_ms AS valid_from_ms,
       LEAD(ts_ms) OVER w AS valid_to_ms,
       CAST(LEAD(ts_ms) OVER w IS NULL AS INTEGER) AS is_current
FROM changelog
WINDOW w AS (PARTITION BY key ORDER BY ts_ms,
             CASE op WHEN 'd' THEN 2 WHEN 'u' THEN 1 ELSE 0 END)
QUALIFY op <> 'd'
"""


@register("cdc_scd2_history", oracle=_SCD2_ORACLE, section="S3,S4,W3")
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4 slowly-changing-dimension type 2: the changelog becomes a
    full validity-interval history — each image valid from its own ts
    to the NEXT envelope's ts for that key (a delete closes the last
    interval; lead() computed over ALL envelopes, then delete rows
    dropped from the output). The canonical dim-table history the
    serving layer joins as-of (join_asof_latest is the consumer shape).
    One shuffle on key; W3 lead over per-key envelopes."""
    log = build_changelog(spark, sf_dir)
    prec = F.when(F.col("op") == "d", 2).when(F.col("op") == "u", 1).otherwise(0)
    w = Window.partitionBy("key").orderBy("ts_ms", prec)
    return (
        log.withColumn("valid_to_ms", F.lead("ts_ms").over(w))
        .filter(F.col("op") != "d")
        .select(
            "key",
            "totalprice",
            "orderstatus",
            F.col("ts_ms").alias("valid_from_ms"),
            "valid_to_ms",
            F.col("valid_to_ms").isNull().cast("int").alias("is_current"),
        )
    )


@register("dim_upsert", oracle=_LATEST_ORACLE, section="S4", reverify=5)
def dim_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 HBase-style dim sink: apply the changelog in ts-ordered
    micro-batches, each merged into a keyed parquet dim store
    (foreachBatch merge-overwrite). Because the batches partition the
    changelog into ascending event-time ranges, incremental
    merge-upsert converges to exactly the one-shot latest-per-key
    materialization — so the job carries the FULL ``cdc_latest_row``
    oracle (also asserted in tests/test_cdc.py).

    The batch loop is the test-harness replay of the streaming
    foreachBatch sink (streaming/sinks.py) — same merge function.
    """
    import tempfile

    changelog = build_changelog(spark, sf_dir).cache()
    try:
        # split into 3 micro-batches by event-time range (deterministic)
        bounds = changelog.select(
            F.min("ts_ms").alias("lo"), F.max("ts_ms").alias("hi")
        ).first()
        lo, hi = bounds["lo"], bounds["hi"]
        step = (hi - lo) // 3 + 1
        store = tempfile.mkdtemp(prefix="dim_store_")
        dim: DataFrame | None = None
        for i in range(3):
            batch = changelog.filter(
                (F.col("ts_ms") >= lo + i * step) & (F.col("ts_ms") < lo + (i + 1) * step)
            )
            merged = merge_upsert(dim, batch)
            merged.write.mode("overwrite").parquet(f"{store}/v{i}")
            dim = spark.read.parquet(f"{store}/v{i}")
        assert dim is not None
        return dim
    finally:
        changelog.unpersist()


@register("stream_cdc_upsert", oracle=_LATEST_ORACLE, section="S3,S4,T1")
def stream_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/S4 the CDC pipeline in its TRUE streaming form: the changelog
    is staged as a time-ordered multi-file 'binlog topic', consumed via
    readStream (maxFilesPerTrigger=1 → real micro-batches), and each
    batch is merge-upserted into the keyed dim store inside
    foreachBatch — the Flink CDC-source → HBase-sink job end to end.
    The final materialized state carries the full latest-row oracle:
    replaying the binlog through the streaming path must converge to
    the same table as the one-shot batch materialization.

    (dim_upsert is the batch-loop twin; this one exercises the real
    streaming machinery: source offsets, checkpointing, batch
    boundaries chosen by the engine.)"""
    import os
    import tempfile

    from ..session import prepare
    from ..streaming.jobs import run_stream

    prepare(spark)
    stream = cdc_binlog_stream(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="cdc_stream_dim_")
    state = {"dim": None}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merged = merge_upsert(state["dim"], batch_df)
        path = os.path.join(store, f"v{batch_id}")
        merged.write.mode("overwrite").parquet(path)
        state["dim"] = batch_df.sparkSession.read.parquet(path)

    run_stream(stream.writeStream.outputMode("append").foreachBatch(sink), "cdc_upsert")
    assert state["dim"] is not None
    return state["dim"].select("key", "op", "totalprice", "orderstatus", "ts_ms")


def merge_upsert(dim: DataFrame | None, batch: DataFrame) -> DataFrame:
    """MERGE INTO-equivalent for a keyed dim: union(current-as-oldest,
    batch) → latest per key → drop deletes."""
    if dim is None:
        return latest_per_key(batch)
    return latest_per_key(dim.unionByName(batch))


def cdc_binlog_stream(spark: SparkSession, sf_dir: str):
    """Stage the changelog ONCE as a 3-file event-time-ordered 'binlog
    topic' and open a readStream over it (maxFilesPerTrigger=1 → real
    micro-batches in commit order) — the shared CDC source for every
    streaming changelog consumer."""
    import os
    import tempfile

    staged = os.path.join(
        tempfile.gettempdir(), f"cdc_topic_{os.path.basename(os.path.normpath(sf_dir))}"
    )
    marker = os.path.join(staged, "_STAGED_OK")
    if not os.path.exists(marker):
        log = build_changelog(spark, sf_dir)
        log.repartitionByRange(3, "ts_ms").sortWithinPartitions("ts_ms").write.mode(
            "overwrite"
        ).parquet(staged)
        import pyarrow.parquet as pq

        files = [
            os.path.join(staged, f) for f in os.listdir(staged) if f.endswith(".parquet")
        ]
        files.sort(key=lambda p: pq.read_table(p, columns=["ts_ms"])["ts_ms"][0].as_py())
        base = int(os.path.getmtime(files[0]))
        for i, p in enumerate(files):
            os.utime(p, (base + i, base + i))
        with open(marker, "w") as fh:
            fh.write("ok")

    schema = "key bigint, op string, totalprice double, orderstatus string, ts_ms bigint"
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(staged)


# =============================================================================
# Changelog kinds / retract streams (flink-table-runtime, pom.xml:125-130)
# =============================================================================
#
# Flink's Table runtime tracks four RowKinds through every plan:
# +I (INSERT), -U (UPDATE_BEFORE), +U (UPDATE_AFTER), -D (DELETE). The
# upsert changelog a CDC source emits carries only after-images; the
# ChangelogNormalize operator re-derives the before-images so downstream
# operators (notably aggregates grouped on NON-key columns) can RETRACT
# the old row's contribution before applying the new one. These builders
# re-express that algebra in Spark: the normalize step is a per-key
# lag() (batch) or a dim-store lookup (streaming), and retract
# consumption is signed aggregation — exact, associative, and
# incremental.

_ROWKIND_PREC = "CASE op WHEN 'd' THEN 2 WHEN 'u' THEN 1 ELSE 0 END"


def changelog_to_retract(changelog: DataFrame) -> DataFrame:
    """ChangelogNormalize: upsert changelog → retract stream. Each
    envelope becomes its RowKind rows — 'c' → +I(new); 'u' → −U(old),
    +U(new); 'd' → −D(old) — with the before-image recovered by a
    per-key event-time lag. One shuffle on key; output carries an
    explicit ``sign`` so any downstream aggregate can consume it as
    signed contributions."""
    prec = F.when(F.col("op") == "d", 2).when(F.col("op") == "u", 1).otherwise(0)
    w = Window.partitionBy("key").orderBy("ts_ms", prec)
    lagged = changelog.select(
        "key",
        "op",
        "totalprice",
        "orderstatus",
        "ts_ms",
        F.lag("totalprice").over(w).alias("p_price"),
        F.lag("orderstatus").over(w).alias("p_status"),
    )

    def _kind(kind, price, status, sign):
        return F.struct(
            F.lit(kind).alias("kind"),
            price.alias("price"),
            status.alias("status"),
            F.lit(sign).cast("int").alias("sign"),
        )

    rows = (
        F.when(
            F.col("op") == "c",
            F.array(_kind("+I", F.col("totalprice"), F.col("orderstatus"), 1)),
        )
        .when(
            F.col("op") == "u",
            F.array(
                _kind("-U", F.col("p_price"), F.col("p_status"), -1),
                _kind("+U", F.col("totalprice"), F.col("orderstatus"), 1),
            ),
        )
        .otherwise(F.array(_kind("-D", F.col("p_price"), F.col("p_status"), -1)))
    )
    return lagged.select("key", "ts_ms", F.explode(rows).alias("r")).select(
        "key", "r.kind", "r.price", "r.status", "r.sign", "ts_ms"
    )


_RETRACT_STREAM_ORACLE = f"""
WITH {CHANGELOG_SQL},
lagged AS (
  SELECT key, op, totalprice, orderstatus, ts_ms,
         LAG(totalprice) OVER w AS p_price,
         LAG(orderstatus) OVER w AS p_status
  FROM changelog
  WINDOW w AS (PARTITION BY key ORDER BY ts_ms, {_ROWKIND_PREC})
)
SELECT key, '+I' AS kind, totalprice AS price, orderstatus AS status,
       CAST(1 AS INTEGER) AS sign, ts_ms FROM lagged WHERE op = 'c'
UNION ALL
SELECT key, '-U', p_price, p_status, -1, ts_ms FROM lagged WHERE op = 'u'
UNION ALL
SELECT key, '+U', totalprice, orderstatus, 1, ts_ms FROM lagged WHERE op = 'u'
UNION ALL
SELECT key, '-D', p_price, p_status, -1, ts_ms FROM lagged WHERE op = 'd'
"""


@register("cdc_retract_stream", oracle=_RETRACT_STREAM_ORACLE, section="S3,W3")
def cdc_retract_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink changelog kinds (flink-table-runtime): the upsert changelog
    normalized into an explicit ±I/±U/±D retract stream with recovered
    before-images — the dynamic-table algebra Flink tracks through
    every Table/SQL plan, full oracle."""
    return changelog_to_retract(build_changelog(spark, sf_dir))


_RETRACT_AGG_ORACLE = f"""
WITH {CHANGELOG_SQL},
latest AS (
  SELECT key, op, totalprice, orderstatus FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY key
      ORDER BY ts_ms DESC, {_ROWKIND_PREC} DESC,
               COALESCE(totalprice, -1) DESC, COALESCE(orderstatus, '') DESC
    ) AS rn
    FROM changelog
  ) WHERE rn = 1 AND op <> 'd'
)
SELECT orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM latest GROUP BY orderstatus
"""


@register("cdc_retract_aggregate", oracle=_RETRACT_AGG_ORACLE, section="S3,A1")
def cdc_retract_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a RETRACT stream: GROUP BY a NON-key column
    (orderstatus) of an updating table — impossible with append-only
    semantics, the motivating case for Flink's retract mode. Each
    RowKind row contributes ``sign``-weighted terms; updates cancel
    their before-image exactly (DECIMAL sums — associative, no float
    drift), so the signed aggregate over ALL kinds equals the aggregate
    over the final materialized state, which is what the oracle
    computes. One shuffle for the normalize lag + one for the group-by;
    both map-side combined."""
    retract = changelog_to_retract(build_changelog(spark, sf_dir))
    return (
        retract.groupBy(F.col("status").alias("orderstatus"))
        .agg(
            F.sum("sign").cast("bigint").alias("n_orders"),
            F.sum(F.col("sign") * dec("price")).alias("v"),
        )
        .filter(F.col("n_orders") > 0)
        .select(
            "orderstatus", "n_orders", F.col("v").cast("double").alias("total_price")
        )
    )


@register("stream_retract_agg", oracle=_RETRACT_AGG_ORACLE, section="S3,A1,T5")
def stream_retract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retract aggregate in its TRUE streaming form — incremental
    view maintenance over the binlog topic. Per micro-batch:

    1. the batch's touched keys look up their CURRENT images in the dim
       store (the streaming ChangelogNormalize — before-images come
       from state, exactly Flink's operator);
    2. old touched images retract (−1), the merged new touched images
       assert (+1), and the signed per-status delta — a handful of
       rows — merges into the running aggregate (driver-held exact
       Decimal sums, O(groups) state);
    3. the dim store is a lakehouse table (plans/lakehouse.py): the
       before-image lookup reads only manifest-stats-overlapping data
       files, and the state advance is the same stats-pruned MERGE
       commit.

    Per-batch cost is O(batch + overlapping state files + groups) on
    BOTH the aggregate and the store; the untouched dim majority is
    neither read nor rewritten. The final running
    aggregate carries the same full oracle as the batch twin — batch
    boundaries are invisible because signed DECIMAL addition is
    associative and commutative."""
    import tempfile
    from decimal import Decimal

    from ..session import prepare
    from ..streaming.jobs import run_stream

    prepare(spark)
    stream = cdc_binlog_stream(spark, sf_dir)
    store = tempfile.mkdtemp(prefix="cdc_retract_dim_")
    state: dict = {"table": None}
    agg: dict[str, list] = {}  # status -> [n_orders, Decimal total]

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # lakehouse-backed state: before-image lookup reads only the
        # manifest-stats-overlapping files, and the state update is the
        # same stats-pruned MERGE — so BOTH halves of the job are
        # O(batch + touched files), never O(all keys) (lazy import:
        # lakehouse registers queries and imports this module)
        from ..plans.lakehouse import LakeTable

        batch = batch_df.localCheckpoint()
        touched = batch.select("key").distinct()
        t: LakeTable | None = state["table"]
        old_touched = (
            t.read(batch_df.sparkSession).join(touched, "key", "semi")
            if t is not None
            else None
        )
        if old_touched is not None:
            old_touched = old_touched.localCheckpoint()
        new_touched = merge_upsert(old_touched, batch)
        signed = new_touched.select(
            F.col("orderstatus").alias("status"),
            F.lit(1).alias("sign"),
            F.col("totalprice").alias("price"),
        )
        if old_touched is not None:
            signed = signed.unionByName(
                old_touched.select(
                    F.col("orderstatus").alias("status"),
                    F.lit(-1).alias("sign"),
                    F.col("totalprice").alias("price"),
                )
            )
        delta = (
            signed.groupBy("status")
            .agg(
                F.sum("sign").cast("bigint").alias("dn"),
                F.sum(F.col("sign") * dec("price")).alias("dv"),
            )
            .collect()
        )
        for r in delta:
            cur = agg.setdefault(r["status"], [0, Decimal("0")])
            cur[0] += int(r["dn"])
            cur[1] += Decimal(str(r["dv"])) if r["dv"] is not None else Decimal("0")
        if t is None:
            state["table"] = LakeTable.create(
                latest_per_key(batch), store, "key", n_files=4
            )
        else:
            t.merge(spark, batch)

    run_stream(stream.writeStream.outputMode("append").foreachBatch(sink), "retract_agg")
    rows = [
        (status, n, float(total))
        for status, (n, total) in sorted(agg.items())
        if n > 0
    ]
    return spark.createDataFrame(
        rows, "orderstatus string, n_orders bigint, total_price double"
    )
