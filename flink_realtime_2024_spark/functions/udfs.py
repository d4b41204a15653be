"""UDF / UDTF / UDAF surface (SURVEY §2.9).

Reference surface: ScalarFunction / TableFunction / AggregateFunction
registration via the Table API bridge (reference pom.xml:111-116); the
concrete UDTF in the reference stack is the IK Chinese analyzer
(ikanalyzer realtime-common/pom.xml:60-63) used as
``LATERAL TABLE(ik_analyze(kw))`` for keyword-frequency DWS. The test
corpus is English, so the tokenizer is a regex analyzer with the same
operator shape: 1 string → N tokens → explode → count.

Performance doctrine (SURVEY §4): Python UDFs are the slow path —
everything here is Arrow-vectorized (`pandas_udf`), never row-at-a-time;
tokenize+explode also exists UDF-free in operators/llm/ for the
100 TB path. The UDAF computes in exact integer cents so its result is
engine-reproducible.
"""

from __future__ import annotations

import pandas as pd

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..sources.io import load_table
from ..plans.registry import register
from ..operators._util import widen

# --- U1 scalar UDF -----------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def _net_price_tier(extended: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized scalar: net price bucketed to a 1000-unit tier.

    Pure float64 arithmetic → bit-identical to the SQL mirror.
    """
    import numpy as np

    return np.floor(extended * (1.0 - discount) / 1000.0)


_UDF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       floor(l_extendedprice * (1 - l_discount) / 1000) AS price_tier
FROM lineitem
"""


@register("udf_scalar", oracle=_UDF_ORACLE, section="U1")
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 ScalarFunction UDF as an Arrow-batched pandas_udf (the 10-100×
    faster path vs row-at-a-time Python)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _net_price_tier("l_extendedprice", "l_discount").alias("price_tier"),
    )


# --- U2 table UDTF: tokenizer ---------------------------------------------------


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize(text: pd.Series) -> pd.Series:
    """Regex analyzer standing in for IK (ikanalyzer 2012_u6,
    realtime-common/pom.xml:60-63): lowercase word tokens."""
    return text.str.lower().str.findall(r"[a-z0-9]+")


_UDTF_ORACLE = """
SELECT token, COUNT(*) AS freq
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents)
GROUP BY token
"""


@register("udtf_tokenize_explode", oracle=_UDTF_ORACLE, section="U2", bench=True)
def udtf_tokenize_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 TableFunction: tokenize → explode (LATERAL TABLE shape) →
    keyword frequency, the reference's search-keyword DWS job."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        widen(docs.select("text"))
        .select(F.explode(tokenize("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


# --- U3 aggregate UDAF -------------------------------------------------------------


@F.pandas_udf(T.DoubleType())
def _weighted_avg_cents(price: pd.Series, qty: pd.Series) -> float:
    """Quantity-weighted average price, accumulated in exact integer
    cents (prices are 2-decimal, quantities integral in the fixtures) so
    the result is independent of row order and bit-equal to the DECIMAL
    SQL mirror."""
    import numpy as np

    p = np.rint(price.to_numpy() * 100).astype("int64")  # cents
    q = np.rint(qty.to_numpy()).astype("int64")
    num = int((p * q).sum())  # python int: no overflow at any SF
    den = int(q.sum())
    # two-step rounding mirrors DECIMAL→DOUBLE then divide in the oracle
    return (float(num) / 100.0) / float(den)


_UDAF_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(18,0))) AS DOUBLE) AS weighted_avg_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


@F.pandas_udf(T.LongType())
def _count_rows(qty: pd.Series) -> int:
    # Spark disallows mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg(), so the row count is a pandas UDAF too.
    return len(qty)


@register("udaf_weighted_avg", oracle=_UDAF_ORACLE, section="U3")
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 AggregateFunction as a GROUPED_AGG pandas_udf (Arrow transfer,
    whole group per call)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _weighted_avg_cents("l_extendedprice", "l_quantity").alias("weighted_avg_price"),
        _count_rows("l_quantity").alias("n"),
    )


def bpe_ish_token_count_udf():
    """U1 factory for the SQL-surface registered-UDF demo
    (sql_udf_call): Arrow pandas UDF counting BPE-ish tokens
    (letter-runs | digit-runs | single punctuation) — the same pattern
    llm_token_count runs JVM-side, here as the catalog-registered
    Python path."""

    @F.pandas_udf(T.LongType())
    def tok_count(text: pd.Series) -> pd.Series:
        return text.str.lower().str.count(r"[a-z]+|[0-9]+|[^a-z0-9\s]")

    return tok_count
