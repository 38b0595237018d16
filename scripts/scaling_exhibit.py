#!/usr/bin/env python3
"""Build the sf0.1 -> sf1.0 scaling exhibit table from two bench_full.json
files produced in the same session (same box, same build).

Usage: python3 scripts/scaling_exhibit.py target/bench_sf0.1_r9.json \
           target/bench_sf1.0_r9.json [threshold]

Prints a markdown table of per-query ratios sorted descending, flags
queries whose sf1.0/sf0.1 ratio exceeds the threshold (default 15x — 10x
data plus generous headroom for the log factor in shuffle sorts and the
>=2x candidate growth in gram/band joins), and a summary.
"""
import json
import sys


def main():
    a, b = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qa = json.load(open(a))["queries"]
    qb = json.load(open(b))["queries"]
    common = sorted(set(qa) & set(qb))
    rows = []
    for q in common:
        lo, hi = qa[q], qb[q]
        rows.append((hi / lo if lo > 0 else float("inf"), q, lo, hi))
    rows.sort(reverse=True)
    flagged = [r for r in rows if r[0] > threshold]
    print(f"| query | sf0.1 s | sf1.0 s | ratio |")
    print(f"|---|---|---|---|")
    for ratio, q, lo, hi in rows:
        mark = " **(flag)**" if ratio > threshold else ""
        print(f"| `{q}` | {lo:.2f} | {hi:.2f} | {ratio:.1f}x{mark} |")
    tot_a = sum(qa[q] for q in common)
    tot_b = sum(qb[q] for q in common)
    import statistics
    med = statistics.median(r[0] for r in rows)
    print()
    print(f"queries: {len(common)}; total {tot_a:.1f} s -> {tot_b:.1f} s "
          f"({tot_b / tot_a:.2f}x on 10x data); median ratio {med:.1f}x; "
          f"flagged >{threshold:.0f}x: {len(flagged)}")
    for _, q, lo, hi in flagged:
        print(f"  FLAG {q}: {lo:.2f} -> {hi:.2f}")


if __name__ == "__main__":
    main()
