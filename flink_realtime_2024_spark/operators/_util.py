"""Shared expression helpers for cross-engine (Spark ↔ DuckDB) parity.

Rules (SURVEY §5.2):
- sums of money in DECIMAL → exact & order-independent → cast DOUBLE last;
- event timestamps reduced to epoch-ms BIGINT (``unix_millis``) — DuckDB
  oracles use ``epoch_ms(CAST(ts AS TIMESTAMP))`` (the CAST reproduces
  Spark's ns→µs truncation);
- ratios as DOUBLE/DOUBLE division of exactly-equal operands.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def dec(col: str | Column, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def money_sum(expr: Column) -> Column:
    """Exact, order-independent sum → DOUBLE (bit-identical across engines)."""
    return F.sum(expr).cast("double")


def ts_ms(col: str | Column = "ts") -> Column:
    """Event time as epoch milliseconds (BIGINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


# DuckDB-side fragment mirroring ts_ms()
ORACLE_TS_MS = "epoch_ms(CAST(ts AS TIMESTAMP))"


def widen(df):
    """Ensure a CPU-bound (pandas-kernel) stage runs with full-core
    parallelism. A single-file parquet input scans as ONE task, which
    would serialize every Arrow-batched Python kernel behind it; at
    100 TB the file count provides this for free, locally we repartition
    explicitly. Cheap for the small kernel inputs this guards."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


# --- process-lifetime tmp dirs ------------------------------------------------

_TMP_DIRS: list[str] = []


def register_tmp_dir(path: str) -> str:
    """Track a staged tmp directory for removal at interpreter exit, so
    repeated pytest/bench/driver processes don't accrete /tmp garbage
    (advice-r4 pattern, shared by every per-pid staging site)."""
    import atexit
    import shutil

    if not _TMP_DIRS:
        atexit.register(
            lambda: [shutil.rmtree(d, ignore_errors=True) for d in _TMP_DIRS]
        )
    _TMP_DIRS.append(path)
    return path
