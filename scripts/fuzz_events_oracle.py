#!/usr/bin/env python3
"""Adversarial oracle-parity fuzz for the events-based queries.

Generates an events table with edge cases — tied timestamps (same user,
same instant), malformed / missing / negative / float / quoted JSON
props, zero and extreme values — copies the other sf0.001 tables
alongside, then runs graft.Verify + check_oracle over the fuzzed dir.

Usage: python3 scripts/fuzz_events_oracle.py [seed]
Dev tool only — not part of the shipped library.
"""
import random
import shutil
import subprocess
import sys
import tempfile

import duckdb

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def gen_events(rnd, n=800):
    props_pool = [
        lambda: '{"k": %d}' % rnd.randrange(100),
        lambda: '{"k": -%d}' % rnd.randrange(1, 50),
        lambda: '{"k": %.2f}' % (rnd.random() * 10),
        lambda: '{"k": "%d"}' % rnd.randrange(100),
        lambda: '{}',
        lambda: 'not json at all',
        lambda: '{"other": 1}',
        lambda: None,
    ]
    types = ["click", "view", "error"]
    rows = []
    base_us = 1704067200_000_000  # 2024-01-01 epoch µs
    for i in range(n):
        user = rnd.randrange(12)
        # heavy timestamp ties: only 200 distinct instants
        ts_us = base_us + rnd.randrange(200) * 3_600_000_000 // 4
        value = rnd.choice([0.0, 0.01, 490.02, rnd.random() * 100])
        rows.append((i, ts_us * 1000, user, rnd.choice(types),
                     round(value, 2), rnd.choice(props_pool)()))
    return rows


def main():
    rnd = random.Random(SEED)
    tmp = tempfile.mkdtemp(prefix="graft_efuzz_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = gen_events(rnd)
    cols = list(zip(*rows))
    # ts as timestamp[ns] to match the driver layout
    table = pa.table({
        "event_id": pa.array(cols[0], pa.int64()),
        "ts": pa.array(cols[1], pa.timestamp("ns")),
        "user_id": pa.array(cols[2], pa.int64()),
        "event_type": pa.array(cols[3], pa.string()),
        "value": pa.array(cols[4], pa.float64()),
        "props": pa.array(cols[5], pa.string()),
    })
    pq.write_table(table, f"{tmp}/events.parquet")

    out = f"{tmp}/verify_out"
    r = subprocess.run(["sbt", "-batch", f"runMain graft.Verify {tmp} {out}"],
                       capture_output=True, text=True, cwd="/root/repo")
    fails = [l for l in (r.stdout + r.stderr).splitlines()
             if "[verify]" in l and ("failed" in l or "pass=false" in l)]
    for l in fails:
        print(l)
    chk = subprocess.run(["python3", "scripts/check_oracle.py", tmp, out],
                         capture_output=True, text=True, cwd="/root/repo")
    print(chk.stdout[-3000:])
    sys.exit(chk.returncode or (1 if fails else 0))


if __name__ == "__main__":
    main()
