#!/usr/bin/env python3
"""Adversarial oracle-parity fuzz for the text/dedup queries.

Generates a documents table full of nasty strings (odd whitespace incl.
\\x0B, unicode, repeated near-dup docs, short docs, punctuation), copies
the other sf0.001 tables alongside it, then runs graft.Verify +
check_oracle over the fuzzed dir. Any Spark-vs-DuckDB divergence on
inputs the fixed testdata never exercises shows up as a FAIL.

Usage: python3 scripts/fuzz_text_oracle.py [seed]
Dev tool only — not part of the shipped library.
"""
import random
import shutil
import subprocess
import sys
import tempfile

import duckdb

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def gen_docs(rnd, n=120):
    words = ["key", "agg", "row", "scan", "slow", "fast", "table", "value",
             "the", "a", "de", "la", "un", "und", "der", "données", "模型",
             "café", "naïve", "αβγ", "word.with,punct!", "x" * 30]
    ws = [" ", "  ", "\t", "\x0b", "\f", "\r", " \t "]
    docs = []
    for i in range(n):
        kind = rnd.randrange(8)
        if kind == 0:
            text = ""  # empty
        elif kind == 1:
            text = rnd.choice(ws) * rnd.randrange(1, 4)  # whitespace-only
        elif kind == 2:
            text = rnd.choice(words)  # single token (shingle-free)
        elif kind == 3:
            text = "ab"  # shorter than a trigram
        else:
            k = rnd.randrange(3, 60)
            toks = [rnd.choice(words) for _ in range(k)]
            text = rnd.choice(ws).join(toks)
            if kind == 7 and docs:  # plant exact + near dups
                base = docs[rnd.randrange(len(docs))][1]
                text = base if rnd.random() < 0.5 else (base + " extra")
        docs.append((i, text))
    return [(i, t, rnd.choice(["en", "fr", "zh"]), f"src{i%5}", len(t))
            for i, t in docs]


def main():
    rnd = random.Random(SEED)
    tmp = tempfile.mkdtemp(prefix="graft_fuzz_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", gen_docs(rnd))
    con.execute(f"COPY d TO '{tmp}/documents.parquet' (FORMAT PARQUET)")

    out = f"{tmp}/verify_out"
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {tmp} {out}"],
        capture_output=True, text=True, cwd="/root/repo")
    fails = [l for l in (r.stdout + r.stderr).splitlines()
             if "[verify]" in l and ("failed" in l or "pass=false" in l)]
    for l in fails:
        print(l)
    chk = subprocess.run(
        ["python3", "scripts/check_oracle.py", tmp, out],
        capture_output=True, text=True, cwd="/root/repo")
    print(chk.stdout[-3000:])
    sys.exit(chk.returncode or (1 if fails else 0))


if __name__ == "__main__":
    main()
