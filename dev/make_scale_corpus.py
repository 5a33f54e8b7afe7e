#!/usr/bin/env python3
"""Build an N-fold scale corpus from a testdata SF dir (dev tooling, like
selfcheck.py — runs driver-side; the engine never depends on it).

Replication is key-remapped and content-decorrelated so the result behaves
like a genuinely larger corpus of the SAME workload, not a pathological
dup-bomb (SCALING.md's 20x stress corpus covers that case separately):

- every key column gets a per-copy offset of k * 100_000_000, so joins stay
  consistent within a copy and never cross copies;
- nation/region stay single-copy (fixed dimension tables, as in TPC-H);
- document text is mutated per copy so copies share NO word trigram: every
  3rd token (all tokens for docs under 3 tokens) gets a per-copy suffix.
  Within-copy near-dup structure is preserved exactly (identical docs get
  identical mutations); cross-copy jaccard is 0, so dedup workloads scale
  linearly. n_chars is recomputed (fixture invariant n_chars = len(text));
- embeddings get a per-copy deterministic +-1 sign mask (md5 parity of
  (copy, dim)). Within-copy cosine geometry is EXACTLY preserved (masks
  cancel); cross-copy cosines are ~N(0, 1/sqrt(dim)) noise, so no ghost
  near-dups appear. Copy 0 is the untouched base corpus;
- events keep their TIMESTAMP(NANOS) ts column bit-for-bit (pyarrow
  preserves it; Spark could not write it back).

Usage: python3 dev/make_scale_corpus.py /root/testdata/sf0.1 target/scale10 10
"""
import hashlib
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFF = 100_000_000
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ["nation", "region"]


def mutate_text(text: str, k: int) -> str:
    toks = text.split(" ")
    tag = "~" + str(k)
    if len(toks) < 3:
        return " ".join(t + tag for t in toks)
    r = k % 3
    return " ".join(t + tag if i % 3 == r else t
                    for i, t in enumerate(toks))


def sign_mask(k: int, dim: int) -> np.ndarray:
    # md5 parity per (copy, dim): deterministic across machines/versions
    bits = [hashlib.md5(f"scale:{k}:{i}".encode()).digest()[0] & 1
            for i in range(dim)]
    return np.where(np.array(bits) == 1, -1.0, 1.0).astype(np.float32)


def copy_table(name: str, tbl: pa.Table, k: int) -> pa.Table:
    out = tbl
    for c in KEY_COLS[name]:
        idx = out.schema.get_field_index(c)
        shifted = pc.add(out.column(c), pa.scalar(k * OFF, pa.int64()))
        out = out.set_column(idx, out.schema.field(idx), shifted)
    if name == "documents" and k > 0:
        texts = [mutate_text(t, k) for t in out.column("text").to_pylist()]
        ti = out.schema.get_field_index("text")
        out = out.set_column(ti, out.schema.field(ti),
                             pa.array(texts, pa.string()))
        ni = out.schema.get_field_index("n_chars")
        out = out.set_column(ni, out.schema.field(ni),
                             pa.array([len(t) for t in texts], pa.int64()))
    if name == "embeddings" and k > 0:
        embs = out.column("embedding").to_pylist()
        mask = sign_mask(k, len(embs[0]))
        flipped = [(np.asarray(e, np.float32) * mask).tolist() for e in embs]
        ei = out.schema.get_field_index("embedding")
        out = out.set_column(ei, out.schema.field(ei),
                             pa.array(flipped, out.schema.field(ei).type))
    return out


def main(src: str, dst: str, n: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in SINGLE_COPY:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(tbl.replace_schema_metadata(None),
                       f"{dst}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} rows (single copy)")
    for name in KEY_COLS:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        copies = [copy_table(name, tbl, k) for k in range(n)]
        big = pa.concat_tables(copies).replace_schema_metadata(None)
        pq.write_table(big, f"{dst}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    main(src, dst, int(sys.argv[3]) if len(sys.argv) > 3 else 10)
