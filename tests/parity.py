"""Spark-vs-DuckDB comparison mimicking the driver's correctness gate:
row-count + column-name schema + order-insensitive exact value match."""

from __future__ import annotations

import math
from typing import Any

import pandas as pd


def _canon_cell(v: Any) -> Any:
    """Canonicalize a cell to a (type_tag, value) pair.

    The driver's value-hash is TYPE-sensitive (it hashes arrow cells), so a
    DuckDB HUGEINT/decimal128 column with the same values as a Spark BIGINT
    column still fails its gate.  Tagging each cell with its Python type class
    makes Decimal(1000) != 1000 here too, so local green predicts driver green
    (VERDICT r1 "What's wrong" #2).
    """
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if pd.isna(v):
        return None
    if hasattr(v, "item") and not isinstance(v, pd.Timestamp):  # numpy scalar
        v = v.item()
        if isinstance(v, float):
            return ("float", "NaN") if math.isnan(v) else ("float", v)
    if isinstance(v, pd.Timestamp):
        return ("timestamp", v.isoformat())
    return (type(v).__name__, v)


def _canon(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    s_cols, s_rows = _canon(spark_pdf)
    o_cols, o_rows = _canon(oracle_pdf)
    assert s_cols == o_cols, f"{name}: column mismatch spark={s_cols} oracle={o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    mismatches = []
    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        if a != b:
            mismatches.append((i, a, b))
            if len(mismatches) >= 5:
                break
    if mismatches:
        detail = "\n".join(f"  row {i}:\n    spark : {a}\n    oracle: {b}" for i, a, b in mismatches)
        raise AssertionError(f"{name}: {len(mismatches)}+ value mismatches (of {len(s_rows)} rows)\n{detail}")
