"""Deterministic sf1/sf10 generator: scale-up of sf0.1 by key-shifted
replication (TESTDATA.md conventions; /root/testdata stays read-only —
output goes to a scratch dir, never checked in).

Usage::

    python scripts/gen_sf1.py [out_dir]                    # sf1 (default /tmp/sf1)
    python scripts/gen_sf1.py /tmp/sf10 --reps 100         # sf10
    python scripts/gen_sf1.py /tmp/sf10 --reps 100 \\
        --tables lineitem,events,documents                 # subset (dims always copied)

Design (so sf1 stresses the same plan shapes, not new semantics):

* region/nation stay fixed (TPC-H dimensions don't scale).
* customer/supplier/part/orders/lineitem/events replicate 10x with key
  shifts of stride max(key)+1 per replica — every FK link lands in its
  own replica, so join fan-outs, group cardinalities per key, and skew
  profiles match sf0.1 exactly while totals are 10x.
* documents: each replica permutes every doc's words with an RNG seeded
  by (replica, md5(text)) — unigram stats (token counts, quality,
  langid) are IDENTICAL, exact-duplicate structure is preserved within
  a replica (same text => same permutation), but 5-gram shingles differ
  across replicas so MinHash/LSH candidate counts grow linearly, not
  quadratically (10 verbatim copies of the corpus would make every doc
  a 10-way near-dup and blow candidate pairs up 45x — a different
  workload, not a scale-up of this one).
* embeddings: replicas add tiny deterministic N(0, 0.01) noise seeded by
  (replica, vec_id) — cluster structure survives for IVF/ANN recall,
  exact ties don't multiply.

Everything is seeded; two runs produce byte-identical row multisets.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
REPS = 10


def _stride(con, path: str, col: str) -> int:
    return con.sql(f"SELECT max({col}) + 1 FROM '{path}'").fetchone()[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/sf1")
    ap.add_argument("--reps", type=int, default=REPS)
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tables",
        default="",
        help="comma list of scaled tables to emit (default all); "
        "region/nation dimensions are always copied",
    )
    args = ap.parse_args()
    out, REPS_N, SRC_D = args.out_dir, args.reps, args.src
    if REPS_N < 1:
        ap.error("--reps must be >= 1")
    known = {
        "customer", "supplier", "part", "orders", "lineitem", "events",
        "documents", "embeddings",
    }
    wanted = set(args.tables.split(",")) if args.tables else None
    if wanted is not None and wanted - known:
        # a typo'd table name must fail loudly, not silently skip the
        # coverage the run was meant to produce
        ap.error(f"unknown tables: {sorted(wanted - known)}; "
                 f"choose from {sorted(known)}")

    def want(t: str) -> bool:
        return wanted is None or t in wanted

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # fixed dimensions
    for t in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM '{SRC_D}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    s_cust = _stride(con, f"{SRC_D}/customer.parquet", "c_custkey")
    s_supp = _stride(con, f"{SRC_D}/supplier.parquet", "s_suppkey")
    s_part = _stride(con, f"{SRC_D}/part.parquet", "p_partkey")
    s_ord = _stride(con, f"{SRC_D}/orders.parquet", "o_orderkey")
    s_evt = _stride(con, f"{SRC_D}/events.parquet", "event_id")
    s_usr = _stride(con, f"{SRC_D}/events.parquet", "user_id")

    rep = f"(SELECT unnest(range({REPS_N})) AS rep)"
    scaled = {
        "customer": f"""
            SELECT c_custkey + rep * {s_cust} AS c_custkey, c_name,
                   c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC_D}/customer.parquet' CROSS JOIN {rep}""",
        "supplier": f"""
            SELECT s_suppkey + rep * {s_supp} AS s_suppkey, s_name,
                   s_nationkey, s_acctbal
            FROM '{SRC_D}/supplier.parquet' CROSS JOIN {rep}""",
        "part": f"""
            SELECT p_partkey + rep * {s_part} AS p_partkey, p_name,
                   p_brand, p_type, p_size, p_retailprice
            FROM '{SRC_D}/part.parquet' CROSS JOIN {rep}""",
        "orders": f"""
            SELECT o_orderkey + rep * {s_ord} AS o_orderkey,
                   o_custkey + rep * {s_cust} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC_D}/orders.parquet' CROSS JOIN {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + rep * {s_ord} AS l_orderkey,
                   l_partkey + rep * {s_part} AS l_partkey,
                   l_suppkey + rep * {s_supp} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC_D}/lineitem.parquet' CROSS JOIN {rep}""",
        "events": f"""
            SELECT event_id + rep * {s_evt} AS event_id, ts,
                   user_id + rep * {s_usr} AS user_id,
                   event_type, value, props
            FROM '{SRC_D}/events.parquet' CROSS JOIN {rep}""",
    }
    for t, q in scaled.items():
        if not want(t):
            continue
        con.sql(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: {con.sql(f'SELECT count(*) FROM {chr(39)}{out}/{t}.parquet{chr(39)}').fetchone()[0]} rows")

    # documents: word permutation seeded by (rep, md5(text)). Written
    # replica-by-replica as row groups of ONE parquet file so sf10
    # (100 reps, ~5M docs) never concatenates the corpus in memory.
    if want("documents"):
        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = con.sql(f"SELECT * FROM '{SRC_D}/documents.parquet'").df()
        s_doc = int(docs["doc_id"].max()) + 1
        writer = None
        n_docs = 0
        try:
            for r in range(REPS_N):
                d = docs.copy()
                d["doc_id"] = d["doc_id"] + r * s_doc
                if r > 0:
                    def perm(text: str, _r=r) -> str:
                        seed = int.from_bytes(
                            hashlib.md5(f"{_r}:{text}".encode()).digest()[:4], "big"
                        )
                        words = text.split(" ")
                        rng = np.random.RandomState(seed)
                        rng.shuffle(words)
                        return " ".join(words)

                    d["text"] = d["text"].map(perm)
                tbl = pa.Table.from_pandas(d, preserve_index=False)
                if writer is None:
                    writer = pq.ParquetWriter(
                        f"{out}/documents.parquet", tbl.schema
                    )
                writer.write_table(tbl)
                n_docs += len(d)
        finally:
            # close even on ENOSPC/OOM mid-replication so the footer is
            # written and the failure surfaces here, not as an opaque
            # parquet read error in a later prove_sf10.py run
            if writer is not None:
                writer.close()
        print(f"documents: {n_docs} rows")

    # embeddings: per-replica deterministic jitter
    if want("embeddings"):
        emb = con.sql(f"SELECT * FROM '{SRC_D}/embeddings.parquet'").df()
        s_vec = int(emb["vec_id"].max()) + 1
        out_emb = []
        for r in range(REPS_N):
            e = emb.copy()
            e["vec_id"] = e["vec_id"] + r * s_vec
            if r > 0:
                def jitter(row, _r=r):
                    v = np.asarray(row["embedding"], dtype=np.float32)
                    rng = np.random.RandomState(_r * 1_000_003 + int(row["vec_id"]))
                    return (v + rng.normal(0, 0.01, v.shape).astype(np.float32)).tolist()

                e["embedding"] = e.apply(jitter, axis=1)
            out_emb.append(e)
        all_emb = pd.concat(out_emb, ignore_index=True)
        con.register("all_emb", all_emb)
        con.sql(
            f"COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding, label "
            f"FROM all_emb) TO '{out}/embeddings.parquet' (FORMAT PARQUET)"
        )
        print(f"embeddings: {len(all_emb)} rows")
    print(f"scaled data ({REPS_N} reps of {SRC_D}) written to {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
