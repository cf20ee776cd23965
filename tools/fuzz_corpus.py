#!/usr/bin/env python3
"""Adversarial-corpus gate: build a variant of sf0.001 whose documents/
embeddings tables carry the edge shapes the driver's synthetic corpus never
exercises (NULL / empty / whitespace-only text, BMP unicode, regex
metacharacters, quotes/backslashes, degenerate repetition, extreme
lengths), then run the FULL Verify + DuckDB gate over it. Catches
corpus-shape bugs the fixed testdata can't — the cross-engine analog of
the in-JVM fuzz specs (HtmlFuzzSpec / ContainersFuzzSpec).

Known fuzz boundary (deliberate): text stays within the Basic
Multilingual Plane. Spark's `split(text, '')` walks UTF-16 units while
DuckDB's `string_split(text, '')` walks codepoints, so non-BMP input
(emoji, SMP CJK) diverges by construction in char-fold queries
(q25/q119) — an engine-representation boundary, not an operator bug.
U+E000..U+F8FF stays out too: BpeOps.trainBpe REQUIREs a PUA-free corpus
(its merge placeholders live there), so PUA input fails fast by design.
The alphabet is also PINNED to Unicode-1.x-era codepoints (Latin-1,
Greek, CJK, kana) assigned in BOTH the JDK Normalizer's and DuckDB
utf8proc's Unicode tables: graft_nfc (q175) is oracle-checked against
nfc_normalize, and the two engines track different Unicode versions, so
recently-assigned codepoints would turn a version gap into a fake
operator failure (see TextUtil.nfc's parity-boundary note).

Usage: tools/fuzz_corpus.py [seed] [outdir]
"""
import os
import random
import shutil
import subprocess
import sys

import duckdb

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 1
out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/graft_fuzz_sf/{seed}"
base = "/root/testdata/sf0.001"
rnd = random.Random(seed)

os.makedirs(out, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]:
    shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

WORDS = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
         "part", "hash", "join", "merge", "sort", "café", "naïve", "münchen",
         "東京", "データ", "Ωμέγα", "a'b", 'q"t', "back\\slash", "dot.dot",
         "(paren)", "[brack]", "*star*", "pipe|pipe", "tab\tin", "per%cent"]


def rand_text(i):
    kind = i % 14
    if kind == 0:
        return None
    if kind == 1:
        return ""
    if kind == 2:
        return "   \t  "
    if kind == 3:
        return WORDS[rnd.randrange(len(WORDS))]  # single token
    if kind == 4:
        return " ".join(["dup"] * rnd.randint(5, 60))  # pure repetition
    if kind == 5:
        return " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(300, 600)))
    if kind == 6:
        # EXACTLY 2 tokens: below the 3-shingle/MinHash floor and the
        # trigram floor, at the bigram-LM boundary (q106/q123 score it,
        # q205 must exclude it).
        return " ".join(rnd.choice(WORDS) for _ in range(2))
    if kind == 7:
        # EXACTLY 3 tokens: one shingle, one trigram — the smallest doc
        # every sketch/LM path must carry without degenerating.
        return " ".join(rnd.choice(WORDS) for _ in range(3))
    if kind == 8:
        # EXACTLY 4 tokens: the 5-gram exclusion boundary (q210 must
        # drop it; every 4-gram-and-below path must still carry it).
        return " ".join(rnd.choice(WORDS) for _ in range(4))
    if kind == 9:
        # EXACTLY 5 tokens: exactly one 5-gram — the smallest doc the
        # order-5 KN gate scores.
        return " ".join(rnd.choice(WORDS) for _ in range(5))
    return " ".join(rnd.choice(WORDS) for _ in range(rnd.randint(2, 40)))


con = duckdb.connect()
docs = [(i, rand_text(i), rnd.choice(["en", "fr", "de"]),
         f"src{i % 5}", len(rand_text(i) or "")) for i in range(400)]
con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", docs)
con.execute(f"COPY d TO '{out}/documents.parquet' (FORMAT PARQUET)")

embs = []
for i in range(120):
    dim = 16
    if i % 7 == 0:
        v = [0.0] * dim
        v[i % dim] = 1.0  # axis vectors: exact ties in dot products
    elif i % 7 == 1 and i > 7:
        v = embs[i - 1][1][:]  # exact duplicate of the previous vector
    else:
        v = [round(rnd.uniform(-1, 1), 3) for _ in range(dim)]
    embs.append((i, v, i % 3))
con.execute("CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO e VALUES (?, ?, ?)", embs)
con.execute(f"COPY e TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

print(f"fuzz corpus seed={seed} at {out}; running full gate...")
env = dict(os.environ, SPARK_GRAFT_CPUS="16")
v = subprocess.run(["tools/run.sh", "graft.Verify", out, f"{out}_out"],
                   env=env, capture_output=True, text=True,
                   cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
for line in v.stderr.splitlines():
    if "[verify]" in line:
        print(line)
sys.exit(subprocess.call([sys.executable, "tools/check.py", out, f"{out}_out"]))
