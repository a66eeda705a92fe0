#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each Spark result
(parquet dumped by graft.Verify) against its DuckDB oracle SQL and compare
rows/schema/values. Usage: check_oracle.py <verify_out_dir> <sf_dir>"""
import sys, os, json, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(out_dir, name)
    files = glob.glob(os.path.join(spark_dir, "*.parquet"))
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
    # driver-style: sort columns by name, then sort rows, then compare
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
        fails += 1; continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fails += 1; continue
    if len(want) == 0:
        print(f"PASS {name} (0 rows)"); continue
    ws = want.astype(str).apply(lambda r: "\x00".join(r), axis=1).sort_values().reset_index(drop=True)
    gs = got.astype(str).apply(lambda r: "\x00".join(r), axis=1).sort_values().reset_index(drop=True)
    if not ws.equals(gs):
        bad = (ws != gs).idxmax()
        print(f"FAIL {name}: value mismatch, e.g.\n  duck:  {ws[bad]!r}\n  spark: {gs[bad]!r}")
        fails += 1; continue
    # dtype check (schema-level signal)
    dt = [(c, str(want[c].dtype), str(got[c].dtype)) for c in want.columns
          if str(want[c].dtype) != str(got[c].dtype)]
    note = f"  [dtype diff: {dt}]" if dt else ""
    print(f"PASS {name} ({len(got)} rows){note}")
print(f"\n{len(oracle) - fails}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
