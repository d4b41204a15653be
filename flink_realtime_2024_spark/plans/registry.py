"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers one named query:
a builder ``(spark, sf_dir) -> DataFrame`` plus (unless genuinely not
SQL-expressible) a DuckDB oracle SQL string over the same parquet views.
``__spark_entry__.py`` is a thin shim over this registry.

Conventions that keep the driver's order-insensitive value-hash stable
across engines (SURVEY §5.2 gotchas):
- alias every computed column identically in builder and oracle;
- money/sum aggregates computed in DECIMAL (exact, order-independent),
  cast to DOUBLE at the end — both engines then emit bit-identical f64;
- timestamps leave the result as epoch-ms BIGINT or formatted strings;
- arrays/maps leave the result as strings (array_join) or scalars.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    section: str  # SURVEY.md §2 row id(s), e.g. "J4"
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    section: str = "",
    bench: bool = False,
) -> Callable[[Builder], Builder]:
    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query id: {name}")
        _REGISTRY[name] = Query(
            name=name,
            builder=fn,
            oracle=oracle.strip() if oracle else None,
            section=section,
            doc=(fn.__doc__ or "").strip(),
            bench=bench,
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def get(name: str) -> Query:
    return _REGISTRY[name]
