"""Operator metrics (the reference's Flink metric counters, SURVEY §6).

Flink jobs expose per-operator counters (records in/out, dirty-record
counts) through the runtime's metric registry. Spark's equivalent for
batch and foreachBatch sinks is the Observation API: named aggregate
expressions evaluated DURING the action, with no second pass over the
data and no extra job — the engine collects them alongside the normal
result.

Streaming-side metrics (state rows, watermark drops) come from
StreamingQueryProgress instead — see streaming/jobs.py
late_rows_metrics for that path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Observation


def observe_counts(df: DataFrame, name: str, **metrics: Column):
    """Attach named metric expressions to a DataFrame.

    Returns (observed_df, observation). After ANY action on
    observed_df, ``observation.get`` holds the metric values computed
    in the same pass — zero extra scans, exactly Flink's
    counter-updated-as-records-flow contract.

    Example::

        obs_df, obs = observe_counts(
            parsed, "parse",
            n_rows=F.count(F.lit(1)),
            n_dirty=F.count(F.when(F.col("k").isNull(), 1)),
        )
        obs_df.write.parquet(out)   # the job
        obs.get["n_dirty"]          # the counter, for free
    """
    obs = Observation(name)
    observed = df.observe(obs, *[expr.alias(alias) for alias, expr in metrics.items()])
    return observed, obs


def row_count_metric() -> Column:
    """The canonical records-out counter."""
    return F.count(F.lit(1))
