#!/usr/bin/env python3
"""Diff two graft bench JSONs (full per-query maps, e.g. BASELINE_bench_r4.json
vs BASELINE_bench_r5.json): per-query delta, new/removed entries, and the
regressions worth reading first.

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_ratio]
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items() if v >= 0}


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    tot_old = sum(old[k] for k in common)
    tot_new = sum(new[k] for k in common)
    print(f"common {len(common)}: {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({tot_new / tot_old:.2f}x)")
    if added:
        print(f"added {len(added)} (+{sum(new[k] for k in added):.1f}s): "
              + ", ".join(f"{k}={new[k]:.2f}" for k in added))
    if removed:
        print(f"removed {len(removed)}: " + ", ".join(removed))

    # regressions: ratio above threshold AND at least 0.2s absolute — tiny
    # queries flap on noise
    regr = [(k, old[k], new[k]) for k in common
            if new[k] > old[k] * thresh and new[k] - old[k] > 0.2]
    regr.sort(key=lambda t: t[1] - t[2])
    print(f"\nregressions (> {thresh}x and > 0.2s):")
    for k, o, n in regr:
        print(f"  {k:32s} {o:6.2f} -> {n:6.2f}  ({n / o:.2f}x)")
    if not regr:
        print("  none")

    imp = [(k, old[k], new[k]) for k in common
           if old[k] > new[k] * thresh and old[k] - new[k] > 0.2]
    imp.sort(key=lambda t: t[2] - t[1])
    print(f"\nimprovements (> {thresh}x and > 0.2s):")
    for k, o, n in imp:
        print(f"  {k:32s} {o:6.2f} -> {n:6.2f}  ({o / n:.2f}x)")
    if not imp:
        print("  none")


if __name__ == "__main__":
    main()
