#!/usr/bin/env python3
"""Deterministic cross-round bench delta decomposition.

Usage:
    python3 scripts/bench_decompose.py OLD.json NEW.json [--top N]

Reads two canonical bench artifacts (the `bench_out.json` format graft.Bench
writes: per-query MINIMA under "queries", medians under "queries_median",
per-rep totals under "raw_totals") and prints a reproducible decomposition of
the total delta:

  - headline totals and rep protocol of both runs;
  - the AMBIENT band: the median per-query percentage move across all shared
    queries. Host co-load inflates everything multiplicatively, so a broad
    uniform band is the co-load signature, while real regressions concentrate;
  - per-FAMILY aggregation (family = first two '_'-separated tokens), sorted
    by absolute family delta, with each family's deviation from ambient;
  - the top-N individual movers by absolute delta with their pct move and
    deviation from ambient;
  - keys only present in one run (new/removed queries), whose contribution is
    accounted separately so the shared-key delta reconciles to the totals.

Output is deterministic for fixed inputs (sorted keys, fixed formatting) —
the committed decomposition must match a re-run byte for byte.
"""
import json
import sys
import statistics


def family_of(name: str) -> str:
    parts = name.split("_")
    return "_".join(parts[:2]) if len(parts) > 1 else name


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    top = 15
    for a in sys.argv[1:]:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1]) if "=" in a else top
    if len(args) != 2:
        sys.exit(__doc__)
    old = json.load(open(args[0]))
    new = json.load(open(args[1]))
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))

    print(f"# bench delta decomposition: {args[0]} -> {args[1]}")
    print()
    print(f"old: minima total {sum(oq.values()):9.3f} s over {len(oq)} queries, "
          f"reps={old.get('reps')}, raw_totals="
          f"[{', '.join(f'{t:.1f}' for t in old.get('raw_totals', []))}]")
    print(f"new: minima total {sum(nq.values()):9.3f} s over {len(nq)} queries, "
          f"reps={new.get('reps')}, raw_totals="
          f"[{', '.join(f'{t:.1f}' for t in new.get('raw_totals', []))}]")
    shared_old = sum(oq[k] for k in shared)
    shared_new = sum(nq[k] for k in shared)
    print(f"shared {len(shared)} queries: {shared_old:9.3f} s -> {shared_new:9.3f} s "
          f"({shared_new - shared_old:+9.3f} s, {100*(shared_new/shared_old-1):+6.1f}%)")
    if only_old:
        print(f"removed ({len(only_old)}): "
              f"{', '.join(f'{k}={oq[k]:.3f}s' for k in only_old)}  "
              f"[-{sum(oq[k] for k in only_old):.3f} s]")
    if only_new:
        print(f"added   ({len(only_new)}): "
              f"{', '.join(f'{k}={nq[k]:.3f}s' for k in only_new)}  "
              f"[+{sum(nq[k] for k in only_new):.3f} s]")
    print()

    pct = {k: 100.0 * (nq[k] / oq[k] - 1.0) for k in shared if oq[k] > 0}
    ambient = statistics.median(pct.values())
    print(f"AMBIENT band (median per-query move over shared queries): {ambient:+6.1f}%")
    print("  a broad uniform band is the host co-load signature; real regressions")
    print("  concentrate in a family and deviate from it.")
    print()

    fams = {}
    for k in shared:
        fams.setdefault(family_of(k), []).append(k)
    rows = []
    for f, ks in fams.items():
        o = sum(oq[k] for k in ks)
        n = sum(nq[k] for k in ks)
        p = 100.0 * (n / o - 1.0) if o > 0 else 0.0
        rows.append((f, len(ks), o, n, n - o, p, p - ambient))
    rows.sort(key=lambda r: (-abs(r[4]), r[0]))
    print("per-family (family = first two name tokens), by |delta|:")
    print(f"  {'family':24s} {'n':>3s} {'old s':>9s} {'new s':>9s} "
          f"{'delta s':>9s} {'move%':>8s} {'vs-amb%':>8s}")
    for f, n, o, nn, d, p, dev in rows:
        print(f"  {f:24s} {n:3d} {o:9.3f} {nn:9.3f} {d:+9.3f} {p:+8.1f} {dev:+8.1f}")
    print()

    movers = sorted(shared, key=lambda k: (-abs(nq[k] - oq[k]), k))[:top]
    print(f"top {top} individual movers by |delta|:")
    print(f"  {'query':36s} {'old s':>9s} {'new s':>9s} {'delta s':>9s} "
          f"{'move%':>8s} {'vs-amb%':>8s}")
    for k in movers:
        d = nq[k] - oq[k]
        p = pct.get(k, 0.0)
        print(f"  {k:36s} {oq[k]:9.3f} {nq[k]:9.3f} {d:+9.3f} {p:+8.1f} {p-ambient:+8.1f}")
    print()
    recon = (shared_new - shared_old) + sum(nq[k] for k in only_new) \
        - sum(oq[k] for k in only_old)
    print(f"reconciliation: shared delta {shared_new - shared_old:+.3f} s "
          f"+ added {sum(nq[k] for k in only_new):+.3f} s "
          f"- removed {sum(oq[k] for k in only_old):+.3f} s "
          f"= total delta {recon:+.3f} s "
          f"(totals: {sum(nq.values()) - sum(oq.values()):+.3f} s)")


if __name__ == "__main__":
    main()
