#!/usr/bin/env python3
"""Noise-aware diff of two graft bench.json files.

Usage: bench_diff.py <old_bench.json> <new_bench.json> [--threshold 1.5]

Compares per-query times using the most noise-robust statistic each file
carries: the per-query "mins" map when present (bench noise is strictly
additive, so min-of-3 is the stablest point estimate), falling back to
the median "queries" map for pre-r6 files. Flags a query only when BOTH
the ratio exceeds the threshold AND the absolute delta exceeds 0.5 s —
sub-second swings at local[32] are scheduling noise regardless of ratio
(measured: same-code back-to-back runs disagree up to ~1.5x on heavy
queries, ~25% on totals; see COVERAGE.md bench methodology).

Exit status: 0 = no flagged regressions, 1 = at least one flagged.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    stat = d.get("mins") or d["queries"]
    return d, stat


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1]) if "=" in a else float(
                sys.argv[sys.argv.index(a) + 1])
    old_doc, old = load(args[0])
    new_doc, new = load(args[1])

    print(f"totals: {old_doc['value']:.1f}s -> {new_doc['value']:.1f}s "
          f"(n_errors {old_doc.get('n_errors', '?')} -> {new_doc.get('n_errors', '?')})")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")

    flagged = []
    for q in sorted(set(old) & set(new)):
        a, b = old[q], new[q]
        if b > a * thr and b - a > 0.5:
            flagged.append((q, a, b))
    if flagged:
        print(f"\nflagged regressions (> {thr}x and > 0.5s, on "
              f"{'mins' if 'mins' in new_doc else 'medians'}):")
        for q, a, b in sorted(flagged, key=lambda x: x[1] - x[2]):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
        print("re-run the bench before believing any single flag — "
              "a real regression reproduces, noise does not")
        sys.exit(1)
    print("no flagged regressions")


if __name__ == "__main__":
    main()
