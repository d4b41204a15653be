"""Runs every registered query against its DuckDB oracle at sf0.001
(fast iteration twin of the driver's sf0.01 gate)."""

from __future__ import annotations

import pytest

from flink_realtime_2024_spark.plans.registry import all_queries

from .conftest import SF_DIR
from .parity import compare

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_parity(name, spark, duck):
    q = _QUERIES[name]
    sdf = q.builder(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only: builder must at least run
        return
    oracle_pdf = duck.execute(q.oracle).df()
    compare(spark_pdf, oracle_pdf, name=name)


def test_compare_is_type_faithful():
    """int64 vs decimal128 columns with equal VALUES must fail compare() —
    the driver's arrow value-hash is type-sensitive, and round 1's only red
    cell (agg_conditional) was exactly this class slipping past a
    value-only comparison."""
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    ints = pd.DataFrame({"n": np.array([1000, 2000], dtype=np.int64)})
    decs = pd.DataFrame({"n": [Decimal(1000), Decimal(2000)]})
    with pytest.raises(AssertionError):
        compare(ints, decs, name="int64-vs-decimal128")
    # same-type equal values still pass
    compare(ints, ints.copy(), name="int64-vs-int64")


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"nation", "revenue", "order_lines"}


def test_contract_shape():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "flagship_revenue_by_nation" in qs
