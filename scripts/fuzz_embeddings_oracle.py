#!/usr/bin/env python3
"""Adversarial oracle-parity fuzz for the embedding-based queries.

Generates an embeddings table with edge cases — zero vectors (no
direction), exact duplicate vectors (cosine exactly 1), near-duplicates,
tiny and large magnitudes, axis-aligned vectors — copies the other
sf0.001 tables alongside, then runs graft.Verify + check_oracle.

Usage: python3 scripts/fuzz_embeddings_oracle.py [seed]
Dev tool only — not part of the shipped library.
"""
import random
import shutil
import subprocess
import sys
import tempfile

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 1
DIM = 64


def gen_vectors(rnd, n=300):
    vecs = []
    for i in range(n):
        kind = rnd.randrange(10)
        if kind == 0:
            v = [0.0] * DIM  # zero vector: must be excluded, not NaN
        elif kind == 1 and vecs:
            v = list(vecs[rnd.randrange(len(vecs))][1])  # exact duplicate
        elif kind == 2 and vecs:
            v = [x + rnd.gauss(0, 1e-3) for x in vecs[rnd.randrange(len(vecs))][1]]
        elif kind == 3:
            v = [0.0] * DIM
            v[rnd.randrange(DIM)] = rnd.choice([1.0, -1.0])  # axis-aligned
        elif kind == 4:
            v = [rnd.gauss(0, 1e-6) for _ in range(DIM)]  # tiny magnitude
        elif kind == 5:
            v = [rnd.gauss(0, 1e4) for _ in range(DIM)]  # large magnitude
        else:
            v = [rnd.gauss(0, 1) for _ in range(DIM)]
        vecs.append((i, [float(f"{x:.6g}") for x in v]))
    return [(i, v, rnd.randrange(5)) for i, v in vecs]


def main():
    rnd = random.Random(SEED)
    tmp = tempfile.mkdtemp(prefix="graft_vfuzz_")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "events"]:
        shutil.copy(f"/root/testdata/sf0.001/{t}.parquet", f"{tmp}/{t}.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq
    rows = gen_vectors(rnd)
    table = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([[float(x) for x in r[1]] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(table, f"{tmp}/embeddings.parquet")

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
