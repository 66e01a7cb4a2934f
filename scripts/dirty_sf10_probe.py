"""sf10-grain hostile probe for the 5 cheapest headliners (r13, VERDICT
r12 #8): b11_tpch_q1, b05_join_inner, b15_window_rank,
b45_latest_per_key, b68_lateral_topn.

Full sf10-dirty is oracle-infeasible (the r12 sf1-dirty sweep already
needed a two-process composition), and ``dirty_corpus.make_dirty``
round-trips every cell through Python lists — fine at sf0.1/sf1, ~60 GB
of list objects at sf10. This probe therefore perturbs ONLY the four
tables those five queries read (customer, orders, lineitem, events),
VECTORIZED through pyarrow compute (masked ``if_else`` for in-place
corruption, ``take``+``concat`` for appended hostile rows) — the same
corruption classes as ``dirty_corpus.py`` where they apply to these
tables, plus two CRAFTED boundary classes aimed at the exact
divergences the r12 sf1 seed found:

* per-nation rows tying the 3rd-highest ``c_acctbal`` with a NULL
  ``c_name`` — the b68 LIMIT-3 NULLS-LAST boundary;
* duplicates of each returnflag's top-``l_extendedprice`` rows with a
  NULL ``l_orderkey`` — a NULL colliding with a tie inside b15's
  top-100.

Untouched tables are copied so the dir is a complete table set.

Usage::

    python scripts/dirty_sf10_probe.py /tmp/sf10 /tmp/dirty_sf10 20260917 \
        --out DIRTY_sf10_lite_seed20260917_r13.json
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil
import sys
import time

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "b05_join_inner",
    "b11_tpch_q1",
    "b15_window_rank",
    "b45_latest_per_key",
    "b68_lateral_topn",
]

# dirty_corpus._NULLABLE restricted to the probe tables
_NULLABLE = {
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ],
    "orders": [
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ],
    "customer": ["c_nationkey", "c_acctbal", "c_mktsegment", "c_name"],
    "events": ["ts", "user_id", "event_type", "value", "props"],
}

# dirty_corpus.overflow_magnitudes restricted to the probe tables
_EXTREMES = {
    ("lineitem", "l_quantity"): [9.9e5, -1.0, 0.0, 1e-9],
    ("lineitem", "l_extendedprice"): [9.9e11, 0.004, -123.45, 0.005],
    ("lineitem", "l_discount"): [0.999, -0.5, 1.0],
    ("lineitem", "l_tax"): [0.999, 2.0],
    ("orders", "o_totalprice"): [9.9e11, 0.004, -1.0],
    ("customer", "c_acctbal"): [9.9e11, -9.9e11, 1e-9],
    ("events", "value"): [1e15, -1e15, 1e-12, 0.0],
}

_KEYS = {"customer": "c_custkey", "orders": "o_orderkey", "events": "event_id"}


def _mask(n: int, idx: np.ndarray) -> pa.Array:
    m = np.zeros(n, dtype=bool)
    m[idx] = True
    return pa.array(m)


def _set_cells(t: pa.Table, col: str, idx: np.ndarray, value) -> pa.Table:
    """In-place cell corruption, vectorized: value (or NULL) at idx."""
    i = t.schema.get_field_index(col)
    c = t.column(i)
    if value is None:
        repl = pa.nulls(len(t), c.type)
    else:
        repl = pa.scalar(value, type=c.type)
    return t.set_column(i, t.schema.field(col), pc.if_else(_mask(len(t), idx), repl, c))


def perturb(src: str, dst: str, seed: int) -> dict:
    rng = np.random.default_rng(seed)
    os.makedirs(dst, exist_ok=True)
    note: dict = {"seed": seed, "classes": {}}

    for tname, nullable in sorted(_NULLABLE.items()):
        t = pq.read_table(os.path.join(src, f"{tname}.parquet"))
        n0 = len(t)
        # null_injection: ~0.2% of cells per nullable column (sf10 rows
        # are 10x sf1's — the absolute NULL count still dwarfs sf1's 1%)
        for col in nullable:
            idx = rng.choice(n0, size=max(3, n0 // 500), replace=False)
            t = _set_cells(t, col, idx, None)
        # overflow magnitudes (in-place, one cell per extreme value)
        for (tn, col), vals in sorted(_EXTREMES.items()):
            if tn != tname:
                continue
            for v in vals:
                t = _set_cells(t, col, rng.integers(0, n0, size=1), v)
        if tname == "events":
            # timestamp extremes (dirty_corpus.timestamp_extremes)
            for d in (dt.datetime(1900, 1, 1), dt.datetime(2262, 1, 1),
                      dt.datetime(1970, 1, 1)):
                t = _set_cells(t, "ts", rng.integers(0, n0, size=1), d)

        appended = [t]
        # duplicate_rows: exact dups of n/2000 sampled rows
        dup_idx = rng.choice(n0, size=max(2, n0 // 2000), replace=False)
        appended.append(t.take(pa.array(np.sort(dup_idx))))
        # rekeyed_rows: content dups under fresh keys (3e9+)
        if tname in _KEYS:
            key = _KEYS[tname]
            rk_idx = np.sort(rng.choice(n0, size=max(2, n0 // 2000), replace=False))
            rk = t.take(pa.array(rk_idx))
            ki = rk.schema.get_field_index(key)
            fresh = pa.array(
                (3_000_000_000 + np.arange(len(rk))).astype("int64"),
                type=rk.column(ki).type,
            )
            appended.append(rk.set_column(ki, rk.schema.field(key), fresh))
        # conflicting_duplicates: same key, mutated payload
        if tname == "events":
            cf_idx = np.sort(rng.choice(n0, size=max(2, n0 // 3000), replace=False))
            cf = t.take(pa.array(cf_idx))
            vi = cf.schema.get_field_index("value")
            mutated = pc.add(pc.coalesce(cf.column(vi), pa.scalar(0.0)), pa.scalar(1.5))
            appended.append(cf.set_column(vi, cf.schema.field("value"), mutated))
        if tname == "orders":
            cf_idx = np.sort(rng.choice(n0, size=max(2, n0 // 3000), replace=False))
            cf = t.take(pa.array(cf_idx))
            vi = cf.schema.get_field_index("o_totalprice")
            mutated = pc.add(
                pc.multiply(pc.coalesce(cf.column(vi), pa.scalar(0.0)), pa.scalar(2.0)),
                pa.scalar(0.01),
            )
            appended.append(cf.set_column(vi, cf.schema.field("o_totalprice"), mutated))
        # crafted boundary ties (the r12 divergence shapes)
        if tname == "customer":
            con = duckdb.connect()
            third = con.execute(
                f"""SELECT c_nationkey, c_acctbal FROM (
                      SELECT c_nationkey, c_acctbal,
                             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                                ORDER BY c_acctbal DESC) rn
                      FROM '{src}/customer.parquet'
                      WHERE c_nationkey IS NOT NULL) WHERE rn = 3"""
            ).fetchall()
            con.close()
            base = t.take(pa.array(np.arange(min(len(third) * 2, n0))))
            rows = {c: [] for c in t.column_names}
            for j, (nk, bal) in enumerate(sorted(third)):
                for name in (None, "zzz-crafted-tie"):
                    for c in t.column_names:
                        if c == "c_nationkey":
                            rows[c].append(nk)
                        elif c == "c_acctbal":
                            rows[c].append(bal)
                        elif c == "c_name":
                            rows[c].append(name)
                        elif c == "c_custkey":
                            rows[c].append(4_000_000_000 + 2 * j + (0 if name is None else 1))
                        else:
                            rows[c].append(base.column(c)[j % len(base)].as_py())
            appended.append(
                pa.table({c: pa.array(v, type=t.schema.field(c).type)
                          for c, v in rows.items()}, schema=t.schema)
            )
            note["classes"]["crafted_b68_ties"] = len(third) * 2
        if tname == "lineitem":
            # dup each returnflag's 40 highest-extendedprice rows with a
            # NULL l_orderkey: NULL inside a tie at the top-100 cut
            con = duckdb.connect()
            hot = con.execute(
                f"""SELECT rowid FROM (
                      SELECT ROW_NUMBER() OVER () - 1 AS rowid,
                             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                                ORDER BY l_extendedprice DESC) rn
                      FROM '{src}/lineitem.parquet') WHERE rn <= 40"""
            ).fetchnumpy()["rowid"].astype("int64")
            con.close()
            crafted = t.take(pa.array(np.sort(hot[hot < n0])))
            oi = crafted.schema.get_field_index("l_orderkey")
            crafted = crafted.set_column(
                oi, crafted.schema.field("l_orderkey"),
                pa.nulls(len(crafted), crafted.column(oi).type),
            )
            appended.append(crafted)
            note["classes"]["crafted_b15_null_in_top100"] = len(crafted)

        out = pa.concat_tables(appended)
        pq.write_table(out, os.path.join(dst, f"{tname}.parquet"))
        note["classes"][tname] = {"rows_in": n0, "rows_out": len(out)}

    for extra in os.listdir(src):
        s = os.path.join(src, extra)
        d = os.path.join(dst, extra)
        if os.path.isfile(s) and not os.path.exists(d):
            shutil.copy(s, d)
    return note


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    src, dst, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    t0 = time.time()
    note = perturb(src, dst, seed)
    note["perturb_sec"] = round(time.time() - t0, 1)
    print(f"# perturbed in {note['perturb_sec']}s")

    from event_streamer_spark.session import get_spark
    from scripts.check_oracles import run_sweep

    spark = get_spark("dirty-sf10-probe", shuffle_partitions=64)
    t0 = time.time()
    total, failures = run_sweep(spark, dst, exact_names=QUERIES)
    note.update(
        {
            "queries": QUERIES,
            "total": total,
            "failures": failures,
            "sweep_sec": round(time.time() - t0, 1),
            "src": src,
            "dst": dst,
        }
    )
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(note, fh, indent=1)
            fh.write("\n")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
