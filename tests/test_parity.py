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
