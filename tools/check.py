#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify output
parquet against the DuckDB oracle SQL, exactly (sorted rows, bit-equal
values). Usage: tools/check.py [sfdir] [outdir] [query_filter]"""
import duckdb, sys, json, os
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_out"
filt = sys.argv[3] if len(sys.argv) > 3 else ""

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name in sorted(os.listdir(out)):
    if not os.path.isdir(f"{out}/{name}") or filt not in name:
        continue
    try:
        mine = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: cannot read output: {e}"); fail += 1; continue
    if name not in oracle:
        print(f"---- {name}: no oracle (rows-only), rows={mine.num_rows}")
        if mine.num_rows == 0:
            print(f"WARN {name}: zero rows"); fail += 1
        continue
    try:
        theirs = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fail += 1; continue
    mcols, tcols = sorted(mine.column_names), sorted(theirs.column_names)
    if mcols != tcols:
        print(f"FAIL {name}: columns {mcols} vs {tcols}"); fail += 1; continue
    m, t_ = mine.select(mcols), theirs.select(tcols)
    if m.schema != t_.schema:
        print(f"WARN {name}: schema diff:\n  mine:   {m.schema}\n  oracle: {t_.schema}")
    if m.num_rows != t_.num_rows:
        print(f"FAIL {name}: rows {m.num_rows} vs {t_.num_rows}"); fail += 1; continue
    dm = m.to_pandas().sort_values(by=mcols, kind="mergesort").reset_index(drop=True)
    dt = t_.to_pandas().sort_values(by=mcols, kind="mergesort").reset_index(drop=True)
    try:
        dt = dt.astype(dm.dtypes.to_dict())
    except Exception:
        pass
    if dm.equals(dt):
        print(f"PASS {name} ({m.num_rows} rows)"); ok += 1
    else:
        diff = (dm != dt) & ~(dm.isna() & dt.isna())
        bad = diff.any(axis=0)
        print(f"FAIL {name}: value mismatch in cols {list(bad[bad].index)}")
        idx = diff.any(axis=1)
        print(dm[idx].head(3)); print(dt[idx].head(3)); fail += 1
print(f"\n{ok} pass, {fail} fail")
sys.exit(1 if fail else 0)
