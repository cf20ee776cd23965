#!/usr/bin/env python3
"""Degenerate-corpus gate: run the FULL Verify + DuckDB oracle check over
a 5-document corpus (TPC-H/events/embeddings tables stay at sf0.001).
Complements tools/fuzz_corpus.py: that one fuzzes PER-DOC shapes inside a
400-doc corpus; this one attacks SET-LEVEL degeneracy — zero-variance
signals (Pearson r), empty decontamination modalities (flag rates),
single-doc sources (z-scores), near-empty training sets — the 0/0 class
that only shows up when whole aggregates collapse. Round-11 first run
caught four real ANSI divide-by-zero aborts (q154/q166/q169/q200), all
fixed with engine-matched nullif NULLs.

The corpus is FIXED (not seeded): degeneracy is the point, and a stable
fixture keeps failures reproducible.

Usage: tools/tiny_corpus.py [outdir]
"""
import os
import shutil
import subprocess
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_tiny_gate"
base = "/root/testdata/sf0.001"
os.makedirs(out, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

docs = [
    (0, "alpha beta gamma delta epsilon", "en", "src0", 29),
    (1, "alpha beta gamma delta epsilon", "fr", "src1", 29),  # cross-split exact dup
    (2, "one two", "en", "src0", 7),                          # 2-token boundary
    (3, None, "de", "src1", 0),                               # NULL text
    (4, "x y z", "fr", "src2", 5),                            # 3-token boundary, singleton source
]
con = duckdb.connect()
con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", docs)
con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")

print(f"tiny corpus at {out}; running full gate...")
env = dict(os.environ, SPARK_GRAFT_CPUS="16")
subprocess.run(["tools/run.sh", "graft.Verify", out, f"{out}_out"],
               env=env, capture_output=True, text=True,
               cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.exit(subprocess.call([sys.executable, "tools/check.py", out, f"{out}_out"]))
