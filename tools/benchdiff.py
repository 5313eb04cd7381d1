#!/usr/bin/env python3
"""Per-query bench diff: current round's full bench dump vs a baseline dump.

Usage:
    python3 tools/benchdiff.py bench/r15.json [bench/r14.json] > bench/DIFF_r15.md

Compares the per-query medians of two `graft.Bench` full dumps (the
committed `bench/r{NN}.json` files; BASELINE.md's standing table is
bench/r19.json — 237 queries recorded at r19 HEAD). Because the two
runs may have
executed on different
ambient machine load, each query is compared SAME-RUN-NORMALIZED: its
share of the run's total over the queries both runs share. A normalized
ratio > 1.5 means the query got slower relative to its own run's
baseline mix - a real plan/code regression, not ambient noise.

Emits a markdown report: flagged regressions first, then the full table
(worst ratio first), then queries added/removed vs the baseline.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    qs = d.get("queries", {})
    if not qs:
        sys.exit(f"{path}: no 'queries' map - need a full bench dump")
    return d, qs


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    cur_path = sys.argv[1]
    # Default baseline: the round-19 standing table (re-recorded at r19
    # HEAD per BASELINE.md's own rule after r18 moved the suite ~0.8x
    # past the r14 table; r14/r08 remain available as explicit args for
    # cross-era comparisons, which then need drift normalization — the
    # r19 box runs ~1.26x the r18 driver box on identical code).
    base_path = sys.argv[2] if len(sys.argv) > 2 else "bench/r19.json"
    cur_d, cur = load(cur_path)
    base_d, base = load(base_path)

    shared = sorted(set(cur) & set(base))
    added = sorted(set(cur) - set(base))
    removed = sorted(set(base) - set(cur))
    # Normalization denominators exclude queries whose own raw ratio moved
    # >2x in either direction: one query that legitimately got much faster
    # (e.g. a gate split: 12s -> 0.2s) would otherwise shrink cur_total and
    # inflate every OTHER query's normalized ratio past the flag bar on an
    # improvement, not a regression. Fall back to all shared queries if the
    # filter leaves too little mass to normalize against.
    stable = [q for q in shared
              if base[q] > 0 and 0.5 <= cur[q] / base[q] <= 2.0]
    if sum(base[q] for q in stable) < 0.25 * sum(base[q] for q in shared):
        stable = shared
    cur_total = sum(cur[q] for q in stable)
    base_total = sum(base[q] for q in stable)

    rows = []
    for q in shared:
        raw_ratio = cur[q] / base[q] if base[q] > 0 else float("inf")
        norm_ratio = (cur[q] / cur_total) / (base[q] / base_total) if base[q] > 0 else float("inf")
        rows.append((q, base[q], cur[q], raw_ratio, norm_ratio))
    rows.sort(key=lambda r: -r[4])
    flagged = [r for r in rows if r[4] > 1.5]

    print(f"# Bench diff: {cur_path} vs {base_path}")
    print()
    print(f"- shared queries: {len(shared)}; added: {len(added)}; removed: {len(removed)}")
    print(f"- normalization basis: {len(stable)} stable queries (raw ratio in [0.5, 2]); "
          f"{len(shared) - len(stable)} big movers excluded from the denominators")
    print(f"- stable-query totals: {cur_total:.2f}s vs {base_total:.2f}s "
          f"(raw {cur_total / base_total:.2f}x; per-query ratios below are "
          f"normalized by these totals to cancel ambient machine speed)")
    print(f"- **flagged (>1.5x normalized): {len(flagged)}**")
    print()
    if flagged:
        print("## Flagged regressions")
        print()
        print("| query | base s | cur s | raw x | normalized x |")
        print("|---|---|---|---|---|")
        for q, b, c, rr, nr in flagged:
            print(f"| {q} | {b:.3f} | {c:.3f} | {rr:.2f} | **{nr:.2f}** |")
        print()
    print("## All shared queries (worst normalized ratio first)")
    print()
    print("| query | base s | cur s | raw x | normalized x |")
    print("|---|---|---|---|---|")
    for q, b, c, rr, nr in rows:
        print(f"| {q} | {b:.3f} | {c:.3f} | {rr:.2f} | {nr:.2f} |")
    print()
    if added:
        print("## Added (no baseline)")
        print()
        for q in added:
            print(f"- {q}: {cur[q]:.3f}s")
        print()
    if removed:
        print("## Removed since baseline")
        print()
        for q in removed:
            print(f"- {q}: was {base[q]:.3f}s")
        print()
    if flagged:
        sys.exit(1)


if __name__ == "__main__":
    main()
