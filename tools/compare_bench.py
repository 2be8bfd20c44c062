#!/usr/bin/env python3
"""Compare two full-bench JSONs (the BENCH_FULL.json one-line format):
per-query ratios, geomean, movers. Usage:
  tools/compare_bench.py BEFORE.json AFTER.json [threshold]
"""
import json
import math
import sys


def main() -> None:
    before = json.load(open(sys.argv[1]))
    after = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    b, a = before["queries"], after["queries"]
    common = sorted(set(b) & set(a))
    ratios = {k: a[k] / b[k] for k in common if b[k] > 0}
    geo = math.exp(sum(math.log(r) for r in ratios.values()) / len(ratios))
    print(f"n_common={len(common)} total {before['value']:.1f} -> "
          f"{after['value']:.1f} s  geomean(after/before)={geo:.3f}")
    print(f"loadavg before-run: {before['loadavg_before']} -> {before['loadavg_after']}")
    print(f"loadavg after-run:  {after['loadavg_before']} -> {after['loadavg_after']}")
    movers = [(k, r) for k, r in ratios.items()
              if (r > thr or r < 1 / thr) and max(a[k], b[k]) > 0.5]
    for k, r in sorted(movers, key=lambda x: x[1]):
        print(f"  {k:38s} {b[k]:7.2f} -> {a[k]:7.2f}  ({r:0.2f}x)")
    dropped = sorted(set(b) - set(a))
    added = sorted(set(a) - set(b))
    if dropped:
        print("DROPPED:", dropped)
    if added:
        print("added:", added)


if __name__ == "__main__":
    main()
