#!/usr/bin/env python3
"""Per-family wall-time scaling curves across sf0.001 / sf0.01 / sf0.1.

Inputs: three bench_out.json artifacts produced by `graft.Bench` at the
same HEAD, one per scale factor (the per-query MINIMA are used — the
same numbers the canonical bench headlines). Queries are grouped into
operator families; for each family the script fits the log-log slope
(time ~ c * sf^alpha) over the top decade (sf0.01 -> sf0.1, the least
overhead-polluted span) and over the full two decades, and flags any
family whose top-decade exponent exceeds SUPERLINEAR_ALPHA.

Interpretation notes (also printed):
 - alpha << 1 means the family is still overhead-bound at these scales
   (fixed per-query driver actions dominate); that is expected at smoke
   scale and says nothing bad about 100x growth.
 - alpha ~ 1 is linear scan behavior; n log n over one decade shows up
   as ~1.04-1.08, hence the flag threshold leaves log-factor headroom.
 - alpha > SUPERLINEAR_ALPHA on the top decade is the loud flag: that
   family's cost curve is bending the wrong way exactly where data
   starts to dominate overhead.

Usage:
  python3 scripts/scaling_curve.py bench_sf0.001.json bench_sf0.01.json bench_sf0.1.json [bench_sf1.json ...] [--top N] [--sfs 0.001,0.01,0.1,...]

Round 16: accepts MORE than three artifacts (--sfs names each one's
scale factor; defaults extend 0.001/0.01/0.1 by decades). Artifacts may
cover different query SUBSETS (the per-family sf1-synthetic sweep runs
only the top families): each family/query is fitted over the points
where it appears, requiring at least two for a slope and reporting the
TOP decade as the slope over the last two points it has.
"""
import json
import math
import sys

SUPERLINEAR_ALPHA = 1.30

# longest-prefix family map: ordered, first match wins
FAMILY_PREFIXES = [
    ("stream_ingest", "stream_ingest (dedup/curate/manifest loops)"),
    ("stream_token_ledger", "token ledger"),
    ("stream_ledger_health", "token ledger"),
    ("stream_text_ingest", "lexical ingest"),
    ("stream_ann_ingest", "ann ingest"),
    ("stream_ivf_ingest", "ann ingest"),
    ("stream_decontam", "decontam ingest"),
    ("stream_", "event streaming"),
    ("text_bpe", "bpe tokenizer"),
    ("text_bm25", "lexical serving (bm25)"),
    ("text_phrase", "lexical serving (bm25)"),
    ("text_inverted_index", "lexical serving (bm25)"),
    ("text_index_health", "lexical serving (bm25)"),
    ("text_tfidf", "tfidf"),
    ("text_", "text analysis"),
    ("corpus_clean", "text analysis"),
    ("search_hybrid", "hybrid retrieval"),
    ("sim_autopilot", "index lifecycle"),
    ("sim_index", "index lifecycle"),
    ("sim_", "ann / similarity"),
    ("dedup_", "dedup"),
    ("decontaminate", "decontamination"),
    ("curate_", "curation"),
    ("ev_", "events / time-series"),
    ("mm_", "multimodal"),
    ("mr_", "reference workloads"),
    ("pipe_", "reference workloads"),
    ("w1_", "reference workloads"),
    ("w2_", "reference workloads"),
    ("w3_", "reference workloads"),
    ("w4_", "reference workloads"),
    ("q", "relational"),
]


def family_of(q: str) -> str:
    for p, fam in FAMILY_PREFIXES:
        if q.startswith(p):
            return fam
    return "other"


def load_minima(path: str) -> dict:
    with open(path) as f:
        j = json.load(f)
    # bench_out.json carries {"queries": {name: {"min": s, ...}}} or flat minima
    qs = j.get("queries", j)
    out = {}
    for k, v in qs.items():
        out[k] = v["min"] if isinstance(v, dict) else float(v)
    return out


def fit_alpha(sfs, ts):
    xs = [math.log(s) for s in sfs]
    ys = [math.log(max(t, 1e-6)) for t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main():
    argv = sys.argv[1:]
    top_n = 8
    args = []
    i = 0
    sfs_arg = None
    while i < len(argv):
        if argv[i] == "--top":
            top_n = int(argv[i + 1])
            i += 2
        elif argv[i].startswith("--top="):
            top_n = int(argv[i].split("=", 1)[1])
            i += 1
        elif argv[i] == "--sfs":
            sfs_arg = [float(x) for x in argv[i + 1].split(",")]
            i += 2
        elif argv[i].startswith("--sfs="):
            sfs_arg = [float(x) for x in argv[i].split("=", 1)[1].split(",")]
            i += 1
        else:
            args.append(argv[i])
            i += 1
    if len(args) < 3:
        sys.exit(__doc__)
    if sfs_arg is None:
        sfs_arg = [0.001 * (10 ** k) for k in range(len(args))]
    assert len(sfs_arg) == len(args), "--sfs must name one factor per artifact"
    sfs = sfs_arg
    runs = [load_minima(p) for p in args]
    # shared across the FIRST THREE (the full canonical sweep); later
    # artifacts may cover subsets and contribute points where they do
    shared = set(runs[0]) & set(runs[1]) & set(runs[2])

    def points_for(qs):
        """(sfs, summed times) over the artifacts containing EVERY q in qs."""
        pts = [(sf, sum(r[q] for q in qs)) for sf, r in zip(sfs, runs)
               if all(q in r for q in qs)]
        return [p[0] for p in pts], [p[1] for p in pts]

    fams = {}
    for q in shared:
        fams.setdefault(family_of(q), []).append(q)
    rows = []
    for fam, qs in fams.items():
        fsfs, ts = points_for(qs)
        a_top = fit_alpha(fsfs[-2:], ts[-2:])
        a_all = fit_alpha(fsfs, ts)
        rows.append((ts[2], fam, len(qs), ts, a_top, a_all))
    rows.sort(reverse=True)
    hdr_ts = " | ".join(f"sf{s:g} s" for s in sfs)
    print(f"# scaling curves over {len(shared)} shared queries "
          f"({len(fams)} families; top {top_n} by sf0.1 cost shown; "
          "alpha (top) fits each family's LAST decade of available points)")
    print(f"| family | queries | {hdr_ts} | alpha (top decade) | alpha (all points) | flag |")
    print("|---|---|" + "---|" * len(sfs) + "---|---|---|")
    flagged = []
    def ts_cells(ts):
        cells = [f"{t:.2f}" for t in ts] + ["-"] * (len(sfs) - len(ts))
        return " | ".join(cells)

    for t01, fam, nq, ts, a_top, a_all in rows[:top_n]:
        flag = "SUPER-LINEAR" if a_top > SUPERLINEAR_ALPHA else ""
        if flag:
            flagged.append(fam)
        print(f"| {fam} | {nq} | {ts_cells(ts)} "
              f"| {a_top:.2f} | {a_all:.2f} | {flag} |")
    rest = rows[top_n:]
    for t01, fam, nq, ts, a_top, a_all in rest:
        if a_top > SUPERLINEAR_ALPHA:
            flagged.append(fam)
            print(f"| {fam} (below top-{top_n}) | {nq} | {ts_cells(ts)} "
                  f"| {a_top:.2f} | {a_all:.2f} | SUPER-LINEAR |")
    # per-QUERY sweep: a super-linear query can hide inside a sub-linear
    # family aggregate. Only queries costing >= 0.5 s at sf0.1 are
    # eligible — below that, fixed overhead noise dominates the fit.
    for q in sorted(shared):
        qsfs, ts = points_for([q])
        if ts[2] < 0.5:
            continue
        a_top = fit_alpha(qsfs[-2:], ts[-2:])
        if a_top > SUPERLINEAR_ALPHA:
            flagged.append(q)
            print(f"| query {q} | 1 | {ts_cells(ts)} "
                  f"| {a_top:.2f} | {fit_alpha(qsfs, ts):.2f} | SUPER-LINEAR (per-query) |")
    print()
    if flagged:
        print(f"FLAGGED super-linear (top-decade alpha > {SUPERLINEAR_ALPHA}): "
              + ", ".join(sorted(set(flagged))))
        sys.exit(2)
    print(f"no family exceeds top-decade alpha {SUPERLINEAR_ALPHA} "
          "(n log n over one decade is ~1.04-1.08; headroom is deliberate)")


if __name__ == "__main__":
    main()
