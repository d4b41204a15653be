"""Spark-vs-DuckDB comparison mimicking the driver's correctness gate:
row-count + column-name schema + order-insensitive exact value match.

Two comparison paths share the gate's semantics:
- ``compare`` — both results as pandas frames through the driver
  (the gate's literal shape; right for the sf0.01 contract, where the
  largest result is ~60k rows).
- ``compare_engine_side`` — for multi-million-row full projections
  (r12, VERDICT r11 #2): the Spark result is WRITTEN to parquet by the
  executors (no driver collect) and DuckDB computes the multiset
  difference against the oracle with EXCEPT ALL in both directions —
  two engine-side aggregates and one scalar back, instead of 6M rows
  through a JVM driver that needed SIM_SPARK_DRIVER_MEM=8g.
"""

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


def _quote(ident: str) -> str:
    return '"' + ident.replace('"', '""') + '"'


_DECIMAL_RE = None


def _decimal_scale(type_text: str) -> int | None:
    """Scale of a DuckDB DECIMAL(p,s) DESCRIBE type, else None."""
    ps = _decimal_prec_scale(type_text)
    return ps[1] if ps else None


def _decimal_prec_scale(type_text: str) -> tuple[int, int] | None:
    """(precision, scale) of a DuckDB DECIMAL(p,s) type, else None."""
    global _DECIMAL_RE
    if _DECIMAL_RE is None:
        import re

        _DECIMAL_RE = re.compile(r"^DECIMAL\((\d+),(\d+)\)$")
    m = _DECIMAL_RE.match(type_text)
    return (int(m.group(1)), int(m.group(2))) if m else None


def compare_engine_side(spark_df, con, oracle_rel: str, name: str = "", workdir: str | None = None) -> int:
    """Order-insensitive multiset compare with NO driver-side collect:
    the Spark result lands in parquet via the executors, DuckDB reads
    it back and checks ``spark EXCEPT ALL oracle`` and the reverse are
    both empty (EXCEPT ALL in both directions == multiset equality,
    which subsumes the row-count check; DuckDB's set-op equality treats
    NULL==NULL and NaN==NaN like the pandas gate's canonicalization).

    Type-sensitivity is preserved at the same strength as ``compare``:
    DESCRIBE types of both relations must match column-for-column (so
    an oracle HUGEINT against a Spark BIGINT still fails, exactly like
    the Decimal-vs-int type tag in ``_canon_cell``). Two mapped
    differences keep the two paths from DISAGREEING on the same query
    (advice r12): Spark writes timestamps as UTC-adjusted micros, which
    DuckDB reads as TIMESTAMP WITH TIME ZONE — cast back to naive
    TIMESTAMP when (and only when) the oracle column is naive; and
    DECIMAL-vs-DECIMAL of any precision/scale carries the same Python
    ``Decimal`` tag through the pandas gate where trailing-zero scale
    differences compare equal (Decimal('1.50') == Decimal('1.500')),
    so both sides are widened to DECIMAL(38, max(scale)) here rather
    than failing on DESCRIBE text.

    ``oracle_rel`` is a table/view name already holding the oracle
    result (materialize the oracle ONCE via CREATE TEMP TABLE ... AS,
    then pass the table name — the expensive LSH re-derivations must
    not run twice). The staged parquet (multi-GB per query at
    sf1-equivalents) is removed as soon as the compare PASSES; a
    failing compare keeps its files for inspection (advice r12).
    Returns the compared row count."""
    import os
    import shutil
    import tempfile

    workdir = workdir or tempfile.mkdtemp(prefix="parity_engine_side_")
    path = os.path.join(workdir, f"{name or 'spark_result'}.parquet")
    spark_df.write.mode("overwrite").parquet(path)
    if not any(f.endswith(".parquet") for f in os.listdir(path)):
        raise AssertionError(f"{name}: spark wrote no parquet parts (empty result?)")
    con.execute(
        "CREATE OR REPLACE TEMP VIEW _parity_spark AS "
        f"SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    s_types = dict(
        con.execute(
            "SELECT column_name, column_type FROM (DESCRIBE _parity_spark)"
        ).fetchall()
    )
    o_types = dict(
        con.execute(
            f"SELECT column_name, column_type FROM (DESCRIBE {oracle_rel})"
        ).fetchall()
    )
    assert sorted(s_types) == sorted(o_types), (
        f"{name}: column mismatch spark={sorted(s_types)} oracle={sorted(o_types)}"
    )
    sel_s, sel_o, mismatched = [], [], []
    for c in sorted(s_types):
        st, ot = s_types[c], o_types[c]
        q = _quote(c)
        s_scale, o_scale = _decimal_scale(st), _decimal_scale(ot)
        if st == ot:
            sel_s.append(q)
            sel_o.append(q)
        elif st == "TIMESTAMP WITH TIME ZONE" and ot == "TIMESTAMP":
            sel_s.append(f"CAST({q} AS TIMESTAMP) AS {q}")
            sel_o.append(q)
        elif s_scale is not None and o_scale is not None and (
            # widening is only SAFE when both sides' integer digits fit
            # under 38 minus the widened scale — e.g. DECIMAL(38,0) vs
            # DECIMAL(10,2) would need 40 digits and the CAST would die
            # with a DuckDB conversion error instead of a clean
            # type-mismatch report (advice r13); such pairs fall through
            # to the mismatched-type assertion below
            max(
                p - s
                for p, s in (
                    _decimal_prec_scale(st), _decimal_prec_scale(ot)
                )
            )
            + max(s_scale, o_scale)
            <= 38
        ):
            # decimals vs decimals: the pandas gate tags both cells
            # 'Decimal' and Decimal('1.50') == Decimal('1.500'), so
            # differing precision AND differing scale both pass there —
            # widen both sides to DECIMAL(38, max_scale) so this path
            # agrees (advice r12; r13 review extended to unequal scale)
            wide = max(s_scale, o_scale)
            sel_s.append(f"CAST({q} AS DECIMAL(38,{wide})) AS {q}")
            sel_o.append(f"CAST({q} AS DECIMAL(38,{wide})) AS {q}")
        else:
            mismatched.append((c, st, ot))
            sel_o.append(q)
    assert not mismatched, f"{name}: column type mismatch (spark vs oracle): {mismatched}"
    s_sel = f"SELECT {', '.join(sel_s)} FROM _parity_spark"
    o_sel = f"SELECT {', '.join(sel_o)} FROM {oracle_rel}"
    n_diff = con.execute(
        f"SELECT count(*) FROM (({s_sel} EXCEPT ALL {o_sel}) "
        f"UNION ALL ({o_sel} EXCEPT ALL {s_sel})) _d"
    ).fetchone()[0]
    if n_diff:
        sample = con.execute(
            f"SELECT 'spark-only' AS side, * FROM ({s_sel} EXCEPT ALL {o_sel}) _a LIMIT 3"
        ).fetchall() + con.execute(
            f"SELECT 'oracle-only' AS side, * FROM ({o_sel} EXCEPT ALL {s_sel}) _b LIMIT 3"
        ).fetchall()
        detail = "\n".join(f"  {r}" for r in sample)
        raise AssertionError(
            f"{name}: {n_diff} multiset differences (engine-side compare)\n{detail}"
        )
    nrows = con.execute(f"SELECT count(*) FROM {oracle_rel}").fetchone()[0]
    con.execute("DROP VIEW IF EXISTS _parity_spark")
    shutil.rmtree(path, ignore_errors=True)
    return nrows
