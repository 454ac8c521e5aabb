#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by graft.Verify, runs the declared oracle SQL in
DuckDB over the same parquet tables and compares values column-by-column
(columns sorted by name), both order-sensitive and order-insensitive.

Additionally emulates the driver's pandas-based compare (round-1 lesson):
the driver loads both sides into pandas, sorts rows by all columns, and
hashes stringified values. That path (a) crashes on array columns
("unhashable type: numpy.ndarray" → never emit arrays from a query) and
(b) renders DuckDB HUGEINT aggregates as float ("12.0" vs Spark "12" →
CAST sums to BIGINT in oracle SQL). Dev tool only — not shipped.
"""
import json
import math
import sys

import duckdb


def pandas_check(con, name, sql, out_dir):
    """Emulate the driver's pandas sort+stringify compare; returns error or None."""
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        exp = con.execute(sql).df()
        cols = sorted(got.columns)
        if cols != sorted(exp.columns):
            return f"pandas columns differ: {cols} vs {sorted(exp.columns)}"
        g = got[cols].sort_values(by=cols).astype(str).values.tolist()
        e = exp[cols].sort_values(by=cols).astype(str).values.tolist()
        if g != e:
            diffs = [(a, b) for a, b in zip(g, e) if a != b][:2]
            return f"pandas value mismatch, e.g. {diffs}"
        return None
    except Exception as ex:
        return f"pandas-path error: {str(ex)[:160]}"


def canon(rows, ncols):
    out = []
    for row in rows:
        r = []
        for v in row:
            if isinstance(v, float):
                r.append(("f", repr(v)))
            elif hasattr(v, "as_integer_ratio") and not isinstance(v, (int, float)):
                r.append(("d", str(v)))
            elif isinstance(v, list):
                r.append(("l", json.dumps([str(x) for x in v])))
            else:
                r.append((type(v).__name__[:1], str(v)))
        out.append(tuple(r))
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_bad += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_bad += 1
            continue
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([[r[i] for i in gi] for r in got], len(gi))
        e = canon([[r[i] for i in ei] for r in exp], len(ei))
        pd_err = pandas_check(con, name, sql, out_dir)
        if (g == e or sorted(g) == sorted(e)) and pd_err:
            print(f"FAIL {name}: values match but driver-style {pd_err}")
            n_bad += 1
        elif g == e:
            print(f"OK   {name}: {len(g)} rows (ordered match)")
            n_ok += 1
        elif sorted(g) == sorted(e):
            print(f"OK~  {name}: {len(g)} rows (match only after row sort)")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(a, b) for a, b in zip(sorted(g), sorted(e)) if a != b]
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}; first diffs:")
            for a, b in diff[:3]:
                print(f"   spark={a}\n   duck ={b}")
            if len(g) != len(e):
                only_g = [r for r in sorted(g) if r not in set(e)][:2]
                only_e = [r for r in sorted(e) if r not in set(g)][:2]
                print(f"   only-spark={only_g}\n   only-duck ={only_e}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
