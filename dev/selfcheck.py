#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
Scala library has no Python dependency).

Usage: python3 dev/selfcheck.py [sfdir] [outdir]

1. Runs `graft.Verify sfdir outdir` via sbt (Spark results -> parquet,
   oracle SQL -> oracle_sql.json).
2. Registers each testdata parquet as a DuckDB view named after the table.
3. Runs every oracle SQL; compares against the Spark parquet: columns
   sorted by name, rows sorted by all columns, exact value equality
   (floats compared exactly — queries are designed to be deterministic).
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return repr(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    skip_run = "--no-run" in sys.argv
    if not skip_run:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            capture_output=True, text=True, cwd="/root/repo")
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-15:])
        if r.returncode != 0:
            print(tail)
            sys.exit(1)
        if "[verify]" in r.stdout + r.stderr:
            print("verify-time failures:")
            for line in (r.stdout + r.stderr).splitlines():
                if "[verify]" in line:
                    print(" ", line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        pq = Path(f"{outdir}/{name}")
        if not pq.exists():
            results[name] = "MISSING-RESULT"
            continue
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {e}"
            continue
        got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        wc, wr = canon(want_rows, want_cols)
        gc, gr = canon(got_rows, got_cols)
        if wc != gc:
            results[name] = f"SCHEMA-MISMATCH spark={gc} oracle={wc}"
        elif len(wr) != len(gr):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(gr)} oracle={len(wr)}"
        elif wr != gr:
            diffs = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
            results[name] = f"VALUE-MISMATCH first_diffs(spark,oracle)={diffs}"
        else:
            results[name] = f"OK ({len(gr)} rows)"

    # queries without an oracle: rows-only check
    for pq in sorted(Path(outdir).iterdir()):
        if pq.is_dir() and pq.name not in oracle:
            n = con.execute(f"SELECT count(*) FROM '{pq}/*.parquet'").fetchone()[0]
            results[pq.name] = f"ROWS-ONLY ({n} rows)" if n > 0 else "ROWS-ONLY-EMPTY!"

    ok = all(v.startswith(("OK", "ROWS-ONLY (")) for v in results.values())
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith(('OK','ROWS-ONLY (')) else 'FAIL':4} {k}: {v}")
    print("ALL PASS" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()
