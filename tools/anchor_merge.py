#!/usr/bin/env python3
"""Merge N full-battery Bench runs into a per-query-min anchor and compare
against a prior anchor: the round-over-round re-anchor protocol
(quiet host, per-query min, 1.3x & 0.2 s watch bar on common queries)."""
import json
import sys

def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())

def main():
    out, prior, *runs = sys.argv[1:]
    datas = [load(r) for r in runs]
    names = set()
    for d in datas:
        names |= set(d["queries"])
    merged = {}
    for n in sorted(names):
        vals = [d["queries"][n] for d in datas if n in d["queries"]
                and d["queries"][n] >= 0]
        merged[n] = min(vals) if vals else -1.0
    total = round(sum(v for v in merged.values() if v >= 0), 3)
    anchor = {
        "metric": "total", "value": total, "unit": "sec",
        "n": len(merged),
        "errors": sorted(n for n, v in merged.items() if v < 0),
        "sf": datas[0].get("sf", ""),
        "drifts": [d.get("drift") for d in datas],
        "queries": merged,
    }
    with open(out, "w") as f:
        json.dump(anchor, f, separators=(",", ":"))
    print(f"anchor: {len(merged)} queries, total {total}s, "
          f"drifts {anchor['drifts']}, errors {anchor['errors']}")
    if prior and prior != "-":
        p = load(prior)["queries"] if "queries" in load(prior) else load(prior)
        common = [n for n in merged if n in p and merged[n] >= 0 and p[n] > 0]
        tot_new = sum(merged[n] for n in common)
        tot_old = sum(p[n] for n in common)
        print(f"common {len(common)} queries: {tot_new:.1f}s vs prior "
              f"{tot_old:.1f}s = {tot_new / tot_old:.3f}x")
        flagged = [(n, merged[n], p[n]) for n in common
                   if merged[n] > 1.3 * p[n] and merged[n] - p[n] > 0.2]
        for n, a, b in sorted(flagged, key=lambda t: t[2] - t[1]):
            print(f"  WATCH {n}: {a:.3f}s vs {b:.3f}s ({a / b:.2f}x)")
        if not flagged:
            print("  no query past the 1.3x & 0.2s watch bar")

if __name__ == "__main__":
    main()
