"""SparkSession factory and runtime preparation.

The reference job bootstrap is ``StreamExecutionEnvironment.getExecutionEnvironment``
+ HDFS checkpointing (reference pom.xml:32-37, 68-74). Spark equivalent:
one shared ``SparkSession`` with AQE + Arrow on; checkpointing is per-sink
(``option("checkpointLocation", ...)`` — see streaming/).

Scale notes (100 TB design):
- ``spark.sql.adaptive.enabled`` — runtime re-planning: coalesces small
  shuffle partitions, converts sort-merge→broadcast when a side turns out
  small, splits skewed partitions (skew-join handling). Mandatory at scale.
- ``spark.sql.shuffle.partitions`` — sized for the local test harness via
  env; on a real cluster leave high (e.g. 2×cores) and let AQE coalesce.
- Arrow execution for every pandas_udf/mapInPandas kernel (vectorized
  Python, not row-at-a-time pickling).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied even to a session we did not create
# (the verification driver passes us its own SparkSession).
_RUNTIME_CONFS: dict[str, str] = {
    # Older environments: events.parquet stored TIMESTAMP(NANOS) which
    # the reader rejects without this legacy conf. Spark 4.1+ removed
    # the conf (it sets without error but is ignored) — the engine no
    # longer *depends* on it; sources/io.py:events_ts_to_timestamp
    # branches on whatever type the scan actually yields, and
    # assert_environment() below fails loudly if it's a type we don't
    # handle.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    # Recursive CTEs: the default 1M-ROW guardrail is a toy-scale
    # setting — the 100× probe's linear first-5-orders closure alone is
    # ~75M rows, and a 100 TB corpus is orders beyond that. Rows are
    # the wrong runaway signal for a LINEAR-in-data closure; the
    # level limit (default 100, kept) is what actually catches
    # non-terminating recursion. The conf is an INT conf — a value past
    # 2^31-1 doesn't error, it HANGS py4j session creation (measured:
    # 10_000_000_000 never returns from getOrCreate) — so this is the
    # largest round int-safe value.
    "spark.sql.cteRecursionRowLimit": str(2_000_000_000),
    # Harness-scale shuffle width (driver sessions default to 200 → 200
    # near-empty tasks per exchange at test SFs; stateful streaming ops
    # can't rely on AQE coalescing because AQE is disabled for them).
    # On a real cluster this would be ≥2× total cores and AQE-managed.
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow input-batch BYTES cap for every pandas-UDF / mapInPandas
    # stage (r14, advice r13): Spark slices kernel input batches at
    # min(maxRecordsPerBatch rows, maxBytesPerBatch bytes); the 64 MB
    # default meant a 10k-row batch of fat text rows was ~50-70 MB of
    # UNSPILLABLE direct/JNI allocation per concurrent task — the
    # winnow kernel OOM'd a 1 g-default JVM that way (PLANS.md r12
    # §2b), and the r13 fix (a temporary session-global
    # maxRecordsPerBatch=1024 around the staging job) was racy for
    # concurrent jobs on the same session. A BYTES cap is the
    # principled form: 8 MB × 32 concurrent tasks = 256 MB in-flight
    # ceiling at any row width, while narrow rows (embeddings, ids)
    # still hit the 10k-record cap first — their batch sizes are
    # unchanged. Set once per session, no bracket, no race.
    "spark.sql.execution.arrow.maxBytesPerBatch": "8m",
    # fixture files are single small parquets; don't waste time on
    # parallel footer reads / schema merging
    "spark.sql.parquet.mergeSchema": "false",
    # Streaming state lives OFF-HEAP in RocksDB (the production choice
    # at 100 TB: state size is bounded by disk, not executor heap —
    # Flink's RocksDBStateBackend, reference pom.xml's checkpointing
    # stack). Local evidence: stream_dedup over 6M rows (3M-entry
    # dedup state) completes in a 2 GiB JVM with this provider; it is
    # also the only provider transformWithStateInPandas supports.
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent).

    Every query builder calls this first so the engine behaves the same
    under the driver's session as under our own.

    A session may PIN confs against this sweep via a
    ``_flink_rt_pinned_confs`` attribute (an iterable of conf keys):
    the no-AQE planning clone (plans/analytics._noaqe_session) exists
    precisely to hold ``spark.sql.adaptive.enabled=false``, and a
    builder running ``load_table`` → ``prepare`` on that clone
    concurrently with an iterative loop must not silently re-enable
    AQE mid-loop (r14 review finding)."""
    pinned = frozenset(getattr(spark, "_flink_rt_pinned_confs", ()))
    for k, v in _RUNTIME_CONFS.items():
        if k in pinned:
            continue
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this session → keep its value
    return spark


# Flag attribute stashed on each verified SparkSession object. An
# id(spark)-keyed set would be wrong twice over: ids recycle after GC
# (a new session could silently skip the probe) and the set would grow
# without bound. An attribute dies with the session it verified.
_ENV_CHECKED_ATTR = "_flink_realtime_2024_env_checked"


def assert_environment(spark: SparkSession, sf_dir: str) -> None:
    """Fail loudly — once per session — if the environment drifted.

    Round-2 post-mortem: a PySpark upgrade silently ignored a legacy
    conf and every ``events`` query died at runtime with a type error.
    ``prepare()``'s best-effort conf loop cannot detect that (Spark
    accepts removed confs without error), so this probes the one thing
    that actually matters: the events scan must yield a ``ts`` type the
    engine knows how to normalize. One footer read, cached per session.
    """
    if getattr(spark, _ENV_CHECKED_ATTR, False):
        return
    import os as _os

    path = f"{sf_dir}/events.parquet"
    if not _os.path.exists(path):
        return  # nothing to probe against (unit tests with synth frames)
    from pyspark.sql import types as T

    dt = spark.read.parquet(path).schema["ts"].dataType
    ok = isinstance(dt, (T.LongType, T.TimestampNTZType, T.TimestampType))
    if not ok:
        raise RuntimeError(
            f"environment drift: events.ts scans as {dt} on this Spark "
            f"({spark.version}); sources/io.py:events_ts_to_timestamp "
            "handles LongType/TimestampNTZType/TimestampType only — add "
            "a branch before running queries"
        )
    setattr(spark, _ENV_CHECKED_ATTR, True)


def get_spark(
    app_name: str = "flink_realtime_2024_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine session.

    Local harness: ``local[$SPARK_GRAFT_CPUS]``; shuffle partitions default
    to _RUNTIME_CONFS' 32 (tiny SFs don't need more; AQE coalesces anyway);
    an explicit ``shuffle_partitions`` becomes the new process-wide default.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is not None:
        # An explicit choice must survive prepare() — which every query
        # builder re-runs — so update the module default rather than a
        # builder conf that the _RUNTIME_CONFS loop (and later prepare()
        # calls) would overwrite back to 32.
        _RUNTIME_CONFS["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # console progress bars share stdout with bench.py's one-line
        # JSON contract and truncated the driver's tail capture
        # (BENCH_r* "parsed": null every round) — never useful headless
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in _RUNTIME_CONFS.items():
        b = b.config(k, v)
    return prepare(b.getOrCreate())
