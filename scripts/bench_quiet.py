#!/usr/bin/env python3
"""Canonical-bench runner with a VERIFIED-QUIET protocol (round 16).

r13-r15 all closed on ambient arbitration: +10-14% cross-round bands on
byte-identical code, attributed to host co-load that /proc/loadavg
inside this VM cannot see (we are the only tenant — the noise is
hypervisor-level). Two measurements close that hole:

 1. CPU STEAL share across the run (`/proc/stat` field 8): ticks the
    hypervisor withheld from this VM — the direct co-tenancy signal.
    A quiet run has steal ~0%; the r15 band would have shown here.
 2. Rep-total SPREAD: the bench's raw per-rep totals must agree with
    each other — (max-min)/median over the reps.

The script runs the bench, computes both, and ACCEPTS the run only if
steal <= --max-steal (default 1%) and spread <= --max-spread (default
6%, i.e. every rep within ~±3% of the median). Otherwise it retries up
to --attempts times and finally keeps the best (lowest spread) run,
loudly marked unaccepted. The accepted artifact is bench_out.json
copied to --out, with a sidecar --out.quiet.json recording per-attempt
loadavg, steal share, spreads, and the acceptance verdict — the bench
artifact carries its own quietness evidence instead of a prose
ambient-band argument.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=5 \
    python3 scripts/bench_quiet.py --out BENCH_FULL_r16.json [--attempts 4]
Extra env (SPARK_GRAFT_ONLY etc.) passes through to graft.Bench.
"""
import json
import os
import shutil
import subprocess
import sys
import time


def cpu_ticks():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def loadavg():
    with open("/proc/loadavg") as f:
        return f.read().split()[0]


def main():
    out = "BENCH_FULL.json"
    attempts = 4
    max_steal = 0.01
    max_spread = 0.06
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        if argv[i] == "--out":
            out = argv[i + 1]; i += 2
        elif argv[i] == "--attempts":
            attempts = int(argv[i + 1]); i += 2
        elif argv[i] == "--max-steal":
            max_steal = float(argv[i + 1]); i += 2
        elif argv[i] == "--max-spread":
            max_spread = float(argv[i + 1]); i += 2
        else:
            sys.exit(f"unknown arg {argv[i]}\n{__doc__}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    runs = []
    best = None  # (spread, attempt_index)
    for attempt in range(1, attempts + 1):
        la0, (t0, s0) = loadavg(), cpu_ticks()
        wall0 = time.time()
        print(f"[quiet] attempt {attempt}/{attempts}: loadavg {la0}, starting bench",
              flush=True)
        r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                           cwd=repo, capture_output=True, text=True)
        wall = time.time() - wall0
        la1, (t1, s1) = loadavg(), cpu_ticks()
        if r.returncode != 0:
            print(r.stdout[-2000:], r.stderr[-2000:])
            sys.exit(f"[quiet] bench failed (exit {r.returncode})")
        with open(os.path.join(repo, "bench_out.json")) as f:
            bench = json.load(f)
        raws = bench["raw_totals"]
        med = sorted(raws)[len(raws) // 2]
        spread = (max(raws) - min(raws)) / med
        steal = (s1 - s0) / max(1, t1 - t0)
        rec = {"attempt": attempt, "loadavg_before": la0, "loadavg_after": la1,
               "steal_share": round(steal, 5), "rep_spread": round(spread, 4),
               "raw_totals": raws, "wall_s": round(wall, 1),
               "accepted": steal <= max_steal and spread <= max_spread}
        runs.append(rec)
        print(f"[quiet] attempt {attempt}: total {bench['value']:.1f}s, "
              f"raw {['%.1f' % x for x in raws]}, spread {spread:.1%}, "
              f"steal {steal:.2%} -> "
              f"{'ACCEPT' if rec['accepted'] else 'retry'}", flush=True)
        if best is None or spread < best[0]:
            best = (spread, attempt)
            shutil.copy(os.path.join(repo, "bench_out.json"), out)
        if rec["accepted"]:
            break
        time.sleep(30)
    verdict = {"accepted": runs[-1]["accepted"], "kept_attempt": best[1],
               "max_steal": max_steal, "max_spread": max_spread,
               "attempts": runs}
    with open(out + ".quiet.json", "w") as f:
        json.dump(verdict, f, indent=1)
    print(f"[quiet] kept attempt {best[1]} -> {out} "
          f"({'ACCEPTED' if runs[-1]['accepted'] else 'NOT accepted — best effort'})")
    sys.exit(0 if runs[-1]["accepted"] else 3)


if __name__ == "__main__":
    main()
