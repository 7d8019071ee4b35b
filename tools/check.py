#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's correctness gate: runs each
oracle SQL in DuckDB against the test parquet tables and compares with the
Spark result parquet written by graft.Verify. NOT part of the engine."""
import sys, os, json, glob
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
vout = sys.argv[2] if len(sys.argv) > 2 else "/tmp/vout"

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.splitext(os.path.basename(f))[0]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{vout}/oracle_sql.json"))
fails = []
for name in sorted(os.listdir(vout)):
    d = os.path.join(vout, name)
    if not os.path.isdir(d):
        continue
    spark_df = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracle:
        status = f"rows-only rows={len(spark_df)}"
        if len(spark_df) == 0:
            fails.append(name); status += "  EMPTY!"
        print(f"{name:24s} {status}")
        continue
    try:
        ora_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append(name); print(f"{name:24s} ORACLE ERROR: {e}"); continue
    # canonical: sort columns by name, sort rows, stringify
    def canon(df):
        df = df[sorted(df.columns)]
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    a, b = canon(spark_df), canon(ora_df)
    if list(a.columns) != list(b.columns):
        fails.append(name); print(f"{name:24s} SCHEMA MISMATCH: {list(a.columns)} vs {list(b.columns)}"); continue
    if len(a) != len(b):
        fails.append(name); print(f"{name:24s} ROWCOUNT {len(a)} vs {len(b)}"); continue
    if str(list(a.dtypes)) != str(list(b.dtypes)):
        print(f"{name:24s} dtypes differ: {list(zip(a.dtypes,b.dtypes))}")
    eq = a.astype(str).equals(b.astype(str))
    if not eq:
        fails.append(name)
        diff = (a.astype(str) != b.astype(str)).any(axis=1)
        print(f"{name:24s} VALUE MISMATCH ({diff.sum()} rows)")
        print("  spark:", a[diff].head(3).to_dict('records'))
        print("  ora  :", b[diff].head(3).to_dict('records'))
    else:
        print(f"{name:24s} OK rows={len(a)}")
print("\nFAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
