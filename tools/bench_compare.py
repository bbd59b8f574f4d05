"""Diff two bench_full_*.json artifacts per query, floor-adjusted.

Usage: ``python tools/bench_compare.py OLD.json NEW.json [--top N]``

`bench.py` writes the full untruncated result (timings + spreads +
the measured per-job scheduling floor) to ``bench_full_latest.json``;
committing one per round (``bench_full_rN.json``) makes regressions
diffable from artifacts alone — the gap VERDICT r10 called out.

Comparison is done on FLOOR-ADJUSTED times (max(t − floor, 0) with each
file's own measured floor): on local[N] every query pays a fixed ~0.2 s
job-submission cost that a real cluster amortizes away, so raw ratios on
sub-0.5 s queries measure the box, not the plan. Queries whose adjusted
time is under ``--floor-x`` floors in BOTH runs are reported but never
flagged: they are scheduling-floor-bound and their ratio is noise by
construction.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=15, help="rows to print")
    ap.add_argument(
        "--flag-ratio", type=float, default=1.5,
        help="flag queries whose adjusted ratio exceeds this",
    )
    ap.add_argument(
        "--floor-x", type=float, default=2.0,
        help="adjusted times under this many floors are never flagged",
    )
    ap.add_argument(
        "--floor-guard", type=float, default=1.3,
        help="when the two runs' measured floors differ by more than this "
        "factor, the whole comparison is flagged as load-contaminated and "
        "per-query flags are suppressed (exit code 2)",
    )
    args = ap.parse_args()

    def load(path):
        d = json.load(open(path))
        # driver BENCH_rN.json artifacts wrap the bench line in "parsed"
        return d["parsed"] if "parsed" in d and "queries" not in d else d

    old = load(args.old)
    new = load(args.new)
    f_old = old.get("floor_sec")
    f_new = new.get("floor_sec")
    if f_old is None or f_new is None:
        # one-sided floor adjustment is asymmetric: subtracting the
        # scheduling floor from only ONE run flatters it on every
        # sub-second query. Say so loudly and quote raw numbers first.
        missing = [
            p for p, f in ((args.old, f_old), (args.new, f_new)) if f is None
        ]
        print(
            "WARNING: no measured floor_sec in "
            f"{', '.join(missing)} — treating as 0; the floor-adjusted "
            "ratio is ASYMMETRIC (flatters the side with a measured "
            "floor). Trust the RAW ratio for this pair.",
            file=sys.stderr,
        )
    f_old = f_old or 0.0
    f_new = f_new or 0.0
    # Load-contamination guard (VERDICT r13 What's-wrong #2): when one
    # run's measured scheduling floor is far above the other's, the box
    # was loaded during that run and EVERY per-query ratio is suspect —
    # the r13 driver artifact (floor 0.158 s vs the quiet 0.078 s)
    # produced 13 phantom per-query regressions (span_scrub "8.6×" that
    # re-measured at 1.0×). Flag the COMPARISON once instead of emitting
    # per-query flags that masquerade as plan regressions.
    contaminated = (
        f_old > 0 and f_new > 0
        and max(f_new / f_old, f_old / f_new) > args.floor_guard
    )
    common = sorted(set(old["queries"]) & set(new["queries"]))
    added = sorted(set(new["queries"]) - set(old["queries"]))
    removed = sorted(set(old["queries"]) - set(new["queries"]))

    rows = []
    flagged = []
    for q in common:
        to, tn = old["queries"][q], new["queries"][q]
        ao, an = max(to - f_old, 0.0), max(tn - f_new, 0.0)
        ratio = an / ao if ao > 1e-9 else (1.0 if an < 1e-9 else float("inf"))
        floor_bound = ao < args.floor_x * f_old and an < args.floor_x * f_new
        rows.append((ratio, q, to, tn, ao, an, floor_bound))
        if ratio > args.flag_ratio and not floor_bound:
            flagged.append(q)

    rows.sort(reverse=True)
    tot_o = sum(old["queries"][q] for q in common)
    tot_n = sum(new["queries"][q] for q in common)
    adj_o = sum(max(old["queries"][q] - f_old, 0.0) for q in common)
    adj_n = sum(max(new["queries"][q] - f_new, 0.0) for q in common)
    print(f"common {len(common)} queries | raw {tot_o:.2f}s -> {tot_n:.2f}s "
          f"({tot_n / tot_o:.2f}x) | floor-adjusted {adj_o:.2f}s -> "
          f"{adj_n:.2f}s ({adj_n / max(adj_o, 1e-9):.2f}x) | "
          f"floors {f_old:.3f}/{f_new:.3f}s")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    print(f"\nworst adjusted ratios (top {args.top}; * = floor-bound, not flagged):")
    for ratio, q, to, tn, ao, an, fb in rows[: args.top]:
        mark = "*" if fb else (
            " <-- FLAG" if q in flagged and not contaminated else ""
        )
        print(f"  {ratio:6.2f}x  {q:45s} raw {to:7.3f}->{tn:7.3f}  "
              f"adj {ao:7.3f}->{an:7.3f}{mark}")
    if contaminated:
        print(
            f"\nCOMPARISON FLAGGED: measured floors differ by "
            f"{max(f_new / f_old, f_old / f_new):.2f}x "
            f"({f_old:.3f}s vs {f_new:.3f}s; guard {args.floor_guard}x) — "
            f"one run is load-contaminated. Per-query flags suppressed "
            f"({len(flagged)} would have fired); re-run the slower-floor "
            f"side on a quiet box before trusting any ratio here."
        )
        return 2
    print(f"\nflagged (> {args.flag_ratio}x adjusted, not floor-bound): "
          f"{flagged or 'none'}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
