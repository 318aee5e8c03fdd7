#!/usr/bin/env python3
"""Same-window A/B of two Bench sweeps (BENCH_SPREAD.json files).

Usage: python3 tools/ab_compare.py <baseline_spread.json> <head_spread.json>
       [ratio_bar, default 1.3]

For every query present in both sweeps, compares the ADJUDICATED min —
min(sweep min, stable_min when one was re-run) — and prints a markdown
table sorted worst-first plus a summary. Queries only in one sweep are
listed separately (renames / new operators).
"""
import sys, json


def load(path):
    line = next(l for l in open(path) if '"metric":"total_full"' in l)
    j = json.loads(line)
    qs = {k: v[0] for k, v in j["queries"].items() if v and v[0] >= 0}
    stable = {k: v for k, v in j.get("stable_min", {}).items() if v >= 0}
    adj = {k: min(v, stable.get(k, v)) for k, v in qs.items()}
    return adj, j


def main():
    a_path, b_path = sys.argv[1], sys.argv[2]
    bar = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    a, aj = load(a_path)   # baseline (e.g. the r15 commit)
    b, bj = load(b_path)   # head
    shared = sorted(set(a) & set(b))
    rows = [(q, a[q], b[q], b[q] / a[q] if a[q] > 0 else float("inf"))
            for q in shared]
    rows.sort(key=lambda r: -r[3])
    over = [r for r in rows if r[3] > bar and r[2] - r[1] > 0.3]
    print(f"| query | baseline s | head s | head/baseline |")
    print(f"|---|---|---|---|")
    for q, av, bv, r in rows[:25]:
        print(f"| {q} | {av:.3f} | {bv:.3f} | {r:.2f} |")
    ta = sum(a[q] for q in shared)
    tb = sum(b[q] for q in shared)
    print(f"\nshared queries: {len(shared)}; totals {ta:.1f}s -> {tb:.1f}s "
          f"({tb/ta:.3f}x); median ratio "
          f"{sorted(r[3] for r in rows)[len(rows)//2]:.3f}; "
          f"p90 {sorted(r[3] for r in rows)[int(len(rows)*0.9)]:.3f}")
    print(f"over {bar}x (and +0.3s): {len(over)} -> "
          f"{', '.join(f'{q} {r:.2f}' for q, _, _, r in over) or 'none'}")
    only_b = sorted(set(b) - set(a))
    if only_b:
        print(f"head-only queries ({len(only_b)}): "
              f"total {sum(b[q] for q in only_b):.1f}s")


if __name__ == "__main__":
    main()
