"""Driver simulation: plain session, every query vs DuckDB at sf0.01.

Set SPARK_GRAFT_ANSI=1 to pin spark.sql.ansi.enabled=true for the
sweep — the structural overflow audit (VERDICT r5 item 3): ANSI turns
any silent int64 wrap or bad cast anywhere in the registry into a
hard error instead of a wrong value. (Spark 4 defaults ANSI on, so
the plain sweep already runs under it; the flag makes the audit
explicit and robust to a session that turned it off.)
"""
import os
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
if os.environ.get("SPARK_GRAFT_ANSI") == "1":
    spark.conf.set("spark.sql.ansi.enabled", "true")
    print("ANSI mode: spark.sql.ansi.enabled=true")

import __spark_entry__ as e

df = e.entry(spark)
assert df.count() > 0, "entry() returned no rows"
print("entry(): ok")

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

queries = e.queries()
oracles = e.oracle_sql()


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            try:
                pdf[c] = pdf[c].dt.tz_localize(None)
            except TypeError:
                pdf[c] = pdf[c].dt.tz_convert("UTC").dt.tz_localize(None)
        elif pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


fails, rows_only = [], []
for name, fn in queries.items():
    try:
        spdf = fn(spark, SF).toPandas()
    except Exception as exc:
        fails.append((name, f"spark error: {exc}"))
        print(f"FAIL {name}: spark error {str(exc)[:160]}")
        continue
    if name not in oracles:
        rows_only.append(name)
        print(f"rows-only {name}: {len(spdf)} rows")
        continue
    try:
        opdf = con.sql(oracles[name]).df()
    except Exception as exc:
        fails.append((name, f"oracle error: {exc}"))
        print(f"FAIL {name}: oracle error {str(exc)[:160]}")
        continue
    a, b = canon(spdf), canon(opdf)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"cols {list(a.columns)} vs {list(b.columns)}"))
        print(f"FAIL {name}: column mismatch")
        continue
    if len(a) != len(b):
        fails.append((name, f"rows {len(a)} vs {len(b)}"))
        print(f"FAIL {name}: row count {len(a)} vs {len(b)}")
        continue
    ok = True
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            same = np.array_equal(
                av.astype("float64"), bv.astype("float64"), equal_nan=True
            )
        else:
            same = (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all()
        if not same:
            ok = False
            fails.append((name, f"value mismatch in {c}"))
            print(f"FAIL {name}: value mismatch in column {c}")
            break
    if ok:
        print(f"pass {name}: {len(a)} rows")

print(f"\n=== {len(queries)} queries: {len(queries)-len(fails)-len(rows_only)} "
      f"hash-pass, {len(rows_only)} rows-only, {len(fails)} FAIL ===")
for n, r in fails:
    print("FAILED:", n, "--", r[:200])
sys.exit(1 if fails else 0)
