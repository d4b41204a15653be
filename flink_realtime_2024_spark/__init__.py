"""flink_realtime_2024_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query & data-processing
capabilities of the reference repo ``Puchengh/flink-realtime-2024``
(a Flink 1.17 layered real-time warehouse: Kafka → DIM/DWD/DWS → Doris;
see SURVEY.md). Nothing here is a port: logical plans are declared with
the DataFrame/SQL API and Catalyst/Tungsten pick the physical strategy.

Layout (SURVEY.md §7):
  session.py       SparkSession factory + runtime conf prep
  schemas.py       StructTypes for the fixture tables + CDC envelope
  sources/         batch IO, CDC-changelog emulation, stream helpers
  operators/       relational / join / agg / window-fn / set-op / llm ops
  functions/       scalar function library + UDF/UDAF/UDTF surface
  streaming/       event-time windows, stateful ops, foreachBatch sinks
  plans/           query registry + warehouse-layer compositions
"""

__version__ = "0.1.0"

from . import plans  # noqa: F401  (importing registers all queries)
