#!/usr/bin/env python3
"""Per-query min-of-N across bench run JSONs; optional scaling ratio
between two groups of runs (e.g. sf0.1 vs sf1).

Usage:
  tools/min3.py bench_runs/sf1_run*.json                 # min-of-N table
  tools/min3.py --ratio bench_runs/sf0.1_run*.json -- bench_runs/sf1_run*.json
"""
import json, sys


def load_min(paths):
    runs = [json.load(open(p)) for p in paths]
    qs = {}
    for r in runs:
        for q, t in r["queries"].items():
            qs.setdefault(q, []).append(t)
    mins = {q: min(ts) for q, ts in qs.items()}
    stamps = [(r.get("load_start"), r.get("load_max"), r.get("load_end")) for r in runs]
    return mins, stamps


def main():
    args = sys.argv[1:]
    if args and args[0] == "--ratio":
        sep = args.index("--")
        a, _ = load_min(args[1:sep])
        b, stamps = load_min(args[sep + 1:])
        common = sorted(set(a) & set(b), key=lambda q: -b[q])
        print(f"{'query':<36}{'base':>9}{'target':>9}{'ratio':>8}")
        for q in common:
            print(f"{q:<36}{a[q]:>9.2f}{b[q]:>9.2f}{b[q]/a[q]:>8.1f}x")
        ta, tb = sum(a[q] for q in common), sum(b[q] for q in common)
        print(f"{'TOTAL (common, min-of-N)':<36}{ta:>9.1f}{tb:>9.1f}{tb/ta:>8.1f}x")
        print("target-run load stamps (start/max/end):", stamps)
    else:
        mins, stamps = load_min(args)
        for q in sorted(mins, key=lambda q: -mins[q]):
            print(f"{q:<36}{mins[q]:>9.2f}")
        print(f"{'TOTAL (min-of-N)':<36}{sum(mins.values()):>9.1f}")
        print("load stamps (start/max/end):", stamps)


if __name__ == "__main__":
    main()
