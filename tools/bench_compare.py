#!/usr/bin/env python3
"""Cross-round bench adjudication (round-18 verdict item 3 made
mechanical): compare two idle per-query bench artifacts (the line-2
"compact" JSON with the `queries` map, saved as
target/bench_r{N}_local.json) and print geomean/median ratio over the
common entries plus every per-query regression past a threshold.

Usage: tools/bench_compare.py OLD.json NEW.json [threshold]
"""
import json
import math
import sys


def _as_float(v):
    # keep only values that genuinely parse as numbers: "err" (and any
    # other sentinel a future artifact grows) must be dropped, not
    # crash float() (round-19 advisor)
    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return None
    return None


def load(path):
    with open(path) as f:
        j = json.load(f)
    out = {}
    for k, v in j.get("queries", {}).items():
        f_v = _as_float(v)
        if f_v is not None:
            out[k] = f_v
    return out


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    common = sorted(set(old) & set(new))
    if not common:
        print("no common entries")
        return 1
    ratios = []
    for k in common:
        if old[k] > 0:
            ratios.append((new[k] / old[k], k))
    ratios.sort(reverse=True)
    logs = [math.log(r) for r, _ in ratios if r > 0]
    if not logs:
        # every common entry had a zero/negative old value — nothing
        # ratio-comparable (round-19 advisor: no ZeroDivisionError)
        print(f"common entries: {len(common)}, none ratio-comparable")
        return 1
    geomean = math.exp(sum(logs) / len(logs))
    median = sorted(r for r, _ in ratios)[len(ratios) // 2]
    print(f"common entries: {len(common)}  "
          f"old-only: {len(set(old) - set(new))}  "
          f"new-only: {sorted(set(new) - set(old))}")
    print(f"geomean ratio: {geomean:.3f}  median ratio: {median:.3f}")
    regressions = [(r, k) for r, k in ratios if r >= thr]
    print(f"regressions >= {thr}x: {len(regressions)}")
    for r, k in regressions:
        print(f"  {k}: {old[k]:.3f}s -> {new[k]:.3f}s ({r:.2f}x)")
    print("worst 5 either way:")
    for r, k in ratios[:5]:
        print(f"  up   {k}: {old[k]:.3f} -> {new[k]:.3f} ({r:.2f}x)")
    for r, k in ratios[-5:]:
        print(f"  down {k}: {old[k]:.3f} -> {new[k]:.3f} ({r:.2f}x)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
