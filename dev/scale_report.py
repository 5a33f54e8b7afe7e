#!/usr/bin/env python3
"""Merge a ScaleBench run (target/scale_bench.json) with a same-machine
sf0.1 Bench run (target/bench.json) into the SCALING.md markdown table:
per-query seconds at both scales, the wall-clock ratio, and the contract
status. Dev tooling — runs driver-side only.

Usage: python3 dev/scale_report.py target/bench.json target/scale_bench.json
"""
import json
import sys


def main(base_path: str, scale_path: str) -> int:
    with open(base_path) as f:
        base = json.load(f)
    with open(scale_path) as f:
        scale = json.load(f)

    base_q = base["queries"]
    rows = []
    for name, rec in scale["queries"].items():
        b = base_q.get(name)
        ratio = (rec["sec"] / b) if b and b > 0 and rec["sec"] >= 0 else None
        rows.append((name, b, rec["sec"], ratio, rec["rows"], rec["contracts_ok"]))

    rows.sort(key=lambda r: -(r[2] if r[2] is not None else 0))
    print(f"factor: {scale['factor']}  base: {scale['base']}")
    print(f"scale total: {scale['value']} s   sf0.1 total: {base['value']:.1f} s")
    print(f"all_contracts_ok: {scale['all_contracts_ok']}\n")
    print("| Query | sf0.1 s | 10x s | ratio | 10x rows | contracts |")
    print("|---|---|---|---|---|---|")
    worst = []
    for name, b, s, ratio, nrows, ok in rows:
        rtxt = f"{ratio:.1f}x" if ratio is not None else "-"
        btxt = f"{b:.2f}" if b is not None else "-"
        print(f"| {name} | {btxt} | {s:.2f} | {rtxt} | {nrows} | "
              f"{'ok' if ok else 'FAIL'} |")
        if ratio is not None and ratio > 10:
            worst.append((name, ratio))
    if worst:
        print("\nsuperlinear (>10x wall at 10x data):")
        for name, ratio in sorted(worst, key=lambda x: -x[1]):
            print(f"  {name}: {ratio:.1f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
