#!/usr/bin/env python3
"""Fit each query's scaling exponent from the multi-factor ScaleBench
records: wall(factor) ~ c * factor^e, estimated as the least-squares
slope of log(wall) vs log(factor) over the committed runs (sf0.1 = 1x
plus every scale_bench_*x record given). Dev tooling - runs driver-side
only.

Usage:
  python3 dev/scale_exponents.py dev/records/bench_sf0.1_r7.json \
      dev/records/scale_bench_10x_r7.json \
      dev/records/scale_bench_20x_r7.json [more...]

An exponent near 1.0 is linear scaling; below 1.0 means fixed overhead
still dominates at these factors; materially above 1.0 is a superlinear
term to explain or fix. Queries whose absolute wall stays under MIN_SEC
at the largest factor are skipped (task-wave noise dominates the fit).
"""
import json
import math
import sys

MIN_SEC = 1.0


def main(base_path, *scale_paths):
    with open(base_path) as f:
        base = json.load(f)
    points = {name: [(1.0, sec)] for name, sec in base["queries"].items()
              if sec > 0}
    largest = {}
    for p in scale_paths:
        with open(p) as f:
            rec = json.load(f)
        factor = float(rec["factor"])
        for name, q in rec["queries"].items():
            if q["sec"] > 0 and name in points:
                points[name].append((factor, q["sec"]))
                if factor >= largest.get(name, (0, 0))[0]:
                    largest[name] = (factor, q["sec"])

    rows = []
    for name, pts in points.items():
        if len(pts) < 3:
            continue
        if largest.get(name, (0, 0))[1] < MIN_SEC:
            continue
        xs = [math.log(f) for f, _ in pts]
        ys = [math.log(s) for _, s in pts]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys)) /
                 sum((x - mx) ** 2 for x in xs))
        rows.append((slope, name, pts))

    rows.sort(reverse=True)
    print("| Query | exponent | walls (1x .. largest) |")
    print("|---|---|---|")
    for slope, name, pts in rows:
        walls = " / ".join(f"{s:.2f}" for _, s in sorted(pts))
        print(f"| {name} | {slope:.2f} | {walls} |")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
