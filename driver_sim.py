"""Driver simulation: a from-scratch vanilla SparkSession (none of the
test suite's fixtures or session tuning), sf0.01, every queries() entry
run against its DuckDB oracle using the same comparison the driver's
gate applies (tests/parity.py) — the same recipe the per-round
verification driver follows, so a green run here predicts a green
CORRECTNESS_r{N}.json.

Usage: python driver_sim.py [--sf /root/testdata/sf0.01] [name ...]
Exit 0 iff every checked query matches (rows-only ids must merely run).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
args = sys.argv[1:]
if "--sf" in args:
    i = args.index("--sf")
    SF = args[i + 1]
    del args[i : i + 2]
only = [a for a in args if not a.startswith("--")]

from pyspark.sql import SparkSession  # noqa: E402

_builder = SparkSession.builder.master("local[8]").config(
    "spark.ui.enabled", "false"
)
# Vanilla by default (the driver's gate gives us no conf). The
# sf1-equivalent evidence runs collect multi-million-row results
# through the driver — size it for those via env, never by default.
import os as _os  # noqa: E402

if _os.environ.get("SIM_SPARK_DRIVER_MEM"):
    _builder = _builder.config(
        "spark.driver.memory", _os.environ["SIM_SPARK_DRIVER_MEM"]
    )
spark = _builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e  # noqa: E402
from tests.parity import compare  # noqa: E402

rows = e.entry(spark).collect()
assert len(rows) > 0, "entry() smoke failed"
print(f"entry() smoke: {len(rows)} rows OK", flush=True)

import duckdb  # noqa: E402

con = duckdb.connect()
import os  # noqa: E402

# Resource fences for the oracle engine: at sf0.01 (the driver's gate)
# these never bind; at the sf1-equivalent evidence runs the two LSH
# re-derivation oracles are 10^8-row aggregates that OOM'd/filled /tmp
# when DuckDB sized itself against a machine it shares with a Spark JVM.
con.execute(f"SET memory_limit='{os.environ.get('SIM_DUCK_MEM', '24GB')}'")
spill = os.environ.get("SIM_DUCK_TMP", "/root/duck_spill")
os.makedirs(spill, exist_ok=True)
con.execute(f"SET temp_directory='{spill}'")

for n in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{SF}/{n}.parquet"
    # fixture tables are single files; staged/replicated corpora (the
    # sf1-equivalent parity run) are Spark-written part-file DIRECTORIES
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW {n} AS SELECT * FROM read_parquet('{src}')")

queries = e.queries()
oracles = e.oracle_sql()
names = only or sorted(queries)
n_pass = n_rowsonly = 0
failures = []
for name in names:
    t0 = time.time()
    try:
        sp = queries[name](spark, SF).toPandas()
        sql = oracles.get(name)
        if sql is None:
            n_rowsonly += 1
            status = f"rows-only ({len(sp)} rows)"
        else:
            od = con.execute(sql).df()
            compare(sp, od, name=name)
            n_pass += 1
            status = f"match ({len(sp)} rows)"
    except Exception as ex:  # noqa: BLE001
        failures.append((name, ex))
        status = f"FAIL: {type(ex).__name__}: {str(ex)[:200]}"
    print(f"  {name:32s} {time.time()-t0:5.1f}s  {status}", flush=True)

print(f"\n{n_pass} oracle-match, {n_rowsonly} rows-only, {len(failures)} FAIL")
if failures:
    for name, ex in failures:
        print(f"\n=== {name} ===\n{ex}")
    sys.exit(1)
