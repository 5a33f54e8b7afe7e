#!/usr/bin/env python3
"""Scale-run gate (dev tooling): scan a graft.Verify output directory and
assert every contract boolean column — recall_ok, *_within_*, *_bound —
is all-true. These columns are the operators' self-reported accuracy
contracts (ANN recall vs exact, sketch error vs sigma bound); at a larger
SF they are exactly the signals that can silently flip (the k1 rsd
lesson), so the scale-proof run checks them explicitly.

Usage: python3 dev/check_scale.py /tmp/graft_scale_out
"""
import glob
import os
import re
import sys

import pyarrow.parquet as pq

CONTRACT = re.compile(r"(_ok$|within|_bound$)")

def main(outdir: str) -> int:
    bad = 0
    checked = 0
    # graft.Verify writes one DIRECTORY of part files per query
    for path in sorted(glob.glob(os.path.join(outdir, "*"))):
        if not os.path.isdir(path):
            continue
        name = os.path.basename(path)
        tbl = pq.read_table(path)
        for field in tbl.schema:
            if not CONTRACT.search(field.name):
                continue
            col = tbl.column(field.name)
            n_true = col.to_pandas().sum()
            checked += 1
            status = "PASS" if n_true == tbl.num_rows else "FAIL"
            if status == "FAIL":
                bad += 1
            print(f"{status} {name}.{field.name}: "
                  f"{n_true}/{tbl.num_rows} true")
    if checked == 0:
        print("FAIL: no contract boolean columns found — wrong outdir?")
        return 1
    print("ALL CONTRACTS GREEN" if bad == 0 else f"{bad} CONTRACTS RED")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
