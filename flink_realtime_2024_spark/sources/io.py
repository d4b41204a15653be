"""Batch sources & sinks: parquet / CSV / JSON.

Reference surface: Flink filesystem connector + csv/json formats
(pom.xml:132-137, 60-65, 53-58) and the Doris sink for serving tables
(realtime-common/pom.xml:50-53). Spark-first mapping: ``spark.read`` /
``DataFrameWriter`` — Catalyst pushes predicates and prunes columns into
the parquet scan for free (verify with ``.explain``: ``PushedFilters``,
``ReadSchema``).

Scale notes:
- Scans stay fully distributed; nothing here collects to the driver.
- ``load_table`` applies the *declared* schema (schemas.py) — no
  inference pass over 100 TB.
- Sinks partition by a column when given (partition pruning on read).
"""

from __future__ import annotations

import os
import tempfile

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .. import schemas
from ..session import assert_environment, prepare

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Hot-table cache (bench mode): fixture files are single-row-group
# parquet, so a raw scan is a single task no matter the cluster size. A
# production 100 TB table is thousands of files/buckets and parallelizes
# by itself; locally we emulate that layout once per session by caching
# a repartitioned copy, amortized across the whole bench run.
_HOT: dict[tuple[int, str, str], DataFrame] = {}
_HOT_ENABLED = False

# Only the scan-dominant fact tables earn an in-memory cache; the rest
# read straight from the staged well-partitioned copy (a few-ms
# page-cached scan) — each cache+count is a full Spark job, and ten of
# them were most of the warm staging wall.
_HOT_MEMORY_TABLES = {"lineitem", "orders", "customer", "part", "events"}


def enable_hot_cache(enabled: bool = True) -> None:
    global _HOT_ENABLED
    _HOT_ENABLED = enabled
    if not enabled:
        _HOT.clear()


# Content-addressed staged layouts (round-7): the repartitioned hot
# copy is written ONCE per (fixture content, parallelism) to a shared
# tmp dir and REUSED by every later process — warm bench staging drops
# from ~6 s (a full shuffle per table) to the cost of re-caching
# already-well-partitioned parquet (~1.5 s for all ten tables).
# Commit protocol: write to a pid-suffixed dir, os.rename() into the
# final content-addressed path — atomic on POSIX, so readers only ever
# see complete copies; a lost race just discards the loser's dir.
_HOT_STAGE_ROOT = os.path.join(tempfile.gettempdir(), "spark_graft_hotstage")
# serializes stage WRITES within this process: two threads staging the
# same destination concurrently could otherwise both pass the isdir
# check and publish competing copies (cross-process writers are safe —
# unique tmp names + atomic rename). Locks are PER destination path so
# cold staging of different (sf, table) pairs stays parallel (bench.py
# stages tables from a thread pool); only the tiny dict itself is
# behind one global lock. Created eagerly: lazy init would itself race.
import threading as _threading

_STAGE_LOCKS: dict[str, _threading.Lock] = {}
_STAGE_LOCKS_GUARD = _threading.Lock()

# Bumped whenever the staged layout depends on code, not just fixture
# bytes: the staged copy bakes in events_ts_to_timestamp's normalization
# and schemas.TABLES dtypes, so a code change must miss the old digest
# (otherwise a stale /tmp layout with the old schema is silently reused
# across runs).
_STAGE_FORMAT_VERSION = "v2"


def stage_lock(dest: str) -> _threading.Lock:
    """The per-destination staging lock (created on first use)."""
    with _STAGE_LOCKS_GUARD:
        lock = _STAGE_LOCKS.get(dest)
        if lock is None:
            lock = _STAGE_LOCKS[dest] = _threading.Lock()
        return lock


def stage_digest(*parts) -> str:
    """16-hex content digest used to address staged layouts."""
    import hashlib

    return hashlib.sha1("|".join(str(p) for p in parts).encode()).hexdigest()[:16]


def _prune_stale(root: str, prefix: str, keep: str) -> None:
    """Best-effort removal of same-prefix dirs with a different digest
    (fixtures were regenerated / parallelism changed) so /tmp growth is
    bounded by one live copy per table. Orphaned ``.tmp.`` dirs from a
    crashed writer are reaped once they are over an hour old (a LIVE
    writer's tmp dir is minutes old at most)."""
    import shutil
    import time

    try:
        now = time.time()
        for d in os.listdir(root):
            if not d.startswith(prefix) or d == keep:
                continue
            path = os.path.join(root, d)
            if ".tmp." in d:
                try:
                    if now - os.path.getmtime(path) < 3600:
                        continue
                except OSError:
                    continue
            shutil.rmtree(path, ignore_errors=True)
    except OSError:
        pass


def _hot_staged_copy(spark: SparkSession, sf_dir: str, name: str, df: DataFrame) -> DataFrame:
    """Return ``df`` rewritten as (or re-read from) the shared
    content-addressed repartitioned copy."""
    import shutil

    par = spark.sparkContext.defaultParallelism
    st = os.stat(table_path(sf_dir, name))
    digest = stage_digest(
        os.path.normpath(sf_dir), name, st.st_size, st.st_mtime_ns, par,
        _STAGE_FORMAT_VERSION,
    )
    # the prune prefix MUST discriminate by sf dir, not just table name
    # — different SFs (the bench warms up at sf0.001) and probe replica
    # dirs stage the same table names concurrently, and pruning by bare
    # table name deletes a sibling SF's live copy mid-run
    tag = os.path.basename(os.path.normpath(sf_dir))
    stem = f"{tag}_{name}"
    dst = os.path.join(_HOT_STAGE_ROOT, f"{stem}_{digest}")
    if not os.path.isdir(dst):
        import uuid

        with stage_lock(dst):
            if not os.path.isdir(dst):  # re-check under the lock
                os.makedirs(_HOT_STAGE_ROOT, exist_ok=True)
                tmp = f"{dst}.tmp.{os.getpid()}_{uuid.uuid4().hex[:8]}"
                df.repartition(par).write.mode("overwrite").parquet(tmp)
                try:
                    os.rename(tmp, dst)
                    _prune_stale(_HOT_STAGE_ROOT, f"{stem}_", f"{stem}_{digest}")
                except OSError:
                    shutil.rmtree(tmp, ignore_errors=True)  # lost the race
    return spark.read.parquet(dst)


def drop_all_caches(spark) -> None:
    """Clear EVERY cached/persisted dataset and reset the hot-table
    registry (re-cached lazily on next load_table). For long-lived
    measurement sessions: kernel-internal persists (the LSH signature
    stores, exploded key frames) have no owner to unpersist them, and
    across a full bench run — 37 headline queries × reps plus four
    probe tiers up to 100× — the leaked blocks squeezed execution
    memory until the 100× probe OOM'd an 8 GiB driver JVM (r10)."""
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    _HOT.clear()


def reclaim_checkpoints(spark) -> None:
    """Free DEAD localCheckpoint blocks NOW instead of at an arbitrary
    future GC (companion to ``drop_all_caches``, which clears LIVE
    caches). The dedup kernels (minhash_pairs, simhash_pairs, ...)
    materialize their result via eager DISK_ONLY localCheckpoint; Spark's
    ContextCleaner frees those blocks only after the driver-side
    DataFrame reference is garbage-collected, so a consumer LOOPING a
    kernel accumulates dead blocks in the block manager's local dirs —
    the exact pressure that OOM'd the r11 bench's shared heap at the
    100× tier before its runner grew this call. Python ``gc.collect()``
    drops the py4j references; ``System.gc()`` makes the cleaner's weak
    references fire immediately instead of mid-job. Call it between
    kernel invocations in long-lived sessions; it is safe (a no-op) any
    time."""
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def events_ts_to_timestamp(df: DataFrame) -> DataFrame:
    """Normalize the ``events.ts`` column to TimestampType (µs, UTC).

    The fixture file's physical type has varied across environments, and
    PySpark's scan of it varies by version (Spark 4.1 dropped
    ``spark.sql.legacy.parquet.nanosAsLong`` — it sets without error but
    is ignored). Branch on what the scan actually produced:

    - ``LongType``     — epoch *nanos* (legacy nanosAsLong path): integer
      division truncates ns→µs exactly like DuckDB, so oracles agree.
    - ``TimestampNTZType`` — Spark 4.x scan of a no-timezone µs column:
      cast to TimestampType; with the UTC session timezone the instants
      (and the hash the oracles matched in r1) are identical.
    - ``TimestampType`` — already what the engine schema declares.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if isinstance(dt, T.TimestampType):
        return df
    raise TypeError(
        f"events.ts scanned as unsupported type {dt}; expected LongType "
        "(epoch-nanos), TimestampNTZType, or TimestampType"
    )


def events_raw_schema(spark: SparkSession, sf_dir: str) -> StructType:
    """The *on-scan* schema of events.parquet (readStream requires an
    explicit schema; it must match what the batch reader would produce
    in this environment, not a hard-coded guess). One footer read."""
    return spark.read.parquet(table_path(sf_dir, "events")).schema


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table with its declared schema.

    ``events`` needs care — its timestamp column scans differently by
    Spark version; see :func:`events_ts_to_timestamp`.
    """
    prepare(spark)
    assert_environment(spark, sf_dir)
    path = table_path(sf_dir, name)
    key = (id(spark), sf_dir, name)
    if _HOT_ENABLED and key in _HOT:
        return _HOT[key]
    if name == "events":
        df = events_ts_to_timestamp(spark.read.parquet(path))
    else:
        df = spark.read.schema(schemas.TABLES[name]).parquet(path)
    if _HOT_ENABLED:
        try:
            df = _hot_staged_copy(spark, sf_dir, name, df)
        except OSError:  # unwritable tmp: fall back to per-session shuffle
            df = df.repartition(spark.sparkContext.defaultParallelism)
        if name in _HOT_MEMORY_TABLES:
            df = df.cache()
            df.count()  # materialize the cached, well-partitioned copy
        _HOT[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    """Expose fixture tables as temp views so ``spark.sql`` works too
    (the reference's Table/SQL entry point, SURVEY §3.2)."""
    for n in names or list(schemas.TABLES):
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def sink_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None, mode: str = "overwrite") -> None:
    """Serving-table sink (reference: Doris stream-load; here: parquet).

    ``partition_by`` buys partition pruning for downstream readers — the
    Doris-side equivalent of a distribution key.
    """
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def csv_roundtrip(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """CSV format ser/de (reference flink-csv, pom.xml:60-65): write a
    DataFrame as CSV with header and read it back with the same schema."""
    df.write.mode("overwrite").option("header", "true").csv(path)
    return spark.read.schema(df.schema).option("header", "true").csv(path)
