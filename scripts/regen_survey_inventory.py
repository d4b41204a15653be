#!/usr/bin/env python
"""Regenerate SURVEY.md §2.11 (full registry inventory) from the
registry itself, so the table can never drift from the code.

Usage: python scripts/regen_survey_inventory.py  (from the repo root)
"""

from __future__ import annotations

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_realtime_2024_spark.plans.registry import all_queries  # noqa: E402

SURVEY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SURVEY.md"
)
HEADER = "| Query id | §2 rows | Check | Module | What |"


def main() -> None:
    lines = []
    n_oracle = 0
    for name, q in all_queries().items():
        mod = inspect.getmodule(q.builder).__name__.replace(
            "flink_realtime_2024_spark.", ""
        )
        doc = re.sub(r"\s+", " ", (q.doc or "")).strip()
        m = re.match(r"(.{20,110}?[.;:])\s", doc + " ")
        short = (m.group(1) if m else doc[:110]).rstrip(" .;:").replace("|", "/")
        if name == "flagship_revenue_by_nation":
            short = (
                "entry() smoke query: lineitem⋈orders⋈customer⋈nation "
                "star join + revenue agg"
            )
        oracle = "oracle" if q.oracle else "rows-only"
        n_oracle += bool(q.oracle)
        bench = ", bench" if q.bench else ""
        lines.append(
            f"| `{name}` | {q.section or '—'} | {oracle}{bench} | {mod} | {short} |"
        )
    table = (
        HEADER
        + "\n|---|---|---|---|---|\n"
        + "\n".join(lines)
        + f"\n\nRow count: {len(lines)} == `len(queries())`.\n"
    )
    s = open(SURVEY).read()
    start = s.index(HEADER)
    end = s.index("### 2.12 Evolution notes")
    open(SURVEY, "w").write(s[:start] + table + "\n" + s[end:])
    print(f"SURVEY §2.11 regenerated: {len(lines)} ids, {n_oracle} with oracles")


if __name__ == "__main__":
    main()
