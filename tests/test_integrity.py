"""D16 referential-integrity audits: clean-fixture invariants plus the
dirty-fixture differential sweep (the validation-family lesson: these
operators exist FOR dirty data, but the oracle gate only sees the clean
fixture unless a test perturbs it)."""

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def test_fk_orphans_clean_fixture_is_clean(spark):
    rows = {r["edge"]: r for r in
            REGISTRY["d16_fk_orphans"].fn(spark, SF).collect()}
    assert len(rows) == 7  # all declared edges incl. both nation refs
    for edge, r in rows.items():
        assert r["n_orphans"] == 0, edge
        assert r["n_null_fk"] == 0, edge
        assert r["orphan_rate"] == 0.0, edge
        assert r["n_child"] > 0, edge


def test_fk_orphans_single_fact_scan(spark):
    """Review r8: lineitem's three edges must share ONE fact scan —
    the chained-join + stack shape, not three independent scans."""
    plan = (
        REGISTRY["d16_fk_orphans"]
        .fn(spark, SF)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    import re

    # l_partkey appears only in the lineitem relation; the optimized
    # logical plan prints each scan once (the executed-plan string
    # duplicates subtrees under AQE)
    li_scans = len(re.findall(r"Relation \[[^\]]*l_partkey", plan))
    assert li_scans == 1, f"lineitem scanned {li_scans}x:\n{plan}"


def test_dup_keys_clean_fixture(spark):
    rows = {r["key_name"]: r for r in
            REGISTRY["d16_dup_keys"].fn(spark, SF).collect()}
    assert len(rows) == 9  # 8 single-column PKs + lineitem composite
    composite = rows.pop("lineitem.(l_orderkey,l_linenumber)")
    for key, r in rows.items():
        assert r["n_rows"] == r["n_keys"], key
        assert r["n_dup_keys"] == 0, key
        assert r["max_multiplicity"] == 1, key
    # the synthetic generator does NOT enforce the composite lineitem
    # key — the audit must report that truth, not assume cleanliness
    assert composite["n_rows"] > composite["n_keys"]
    assert composite["n_dup_keys"] > 0
    assert composite["max_multiplicity"] >= 2


def test_order_reconcile_report_shape(spark):
    rows = REGISTRY["d16_order_reconcile"].fn(spark, SF).collect()
    # synthetic totals don't reconcile — the audit must SAY so; the
    # fixture also ships some orders with no lineitems at all
    assert sum(r["n_orders"] for r in rows) > 0
    assert sum(r["n_no_lines"] for r in rows) > 0
    assert any(r["max_abs_diff_e6"] > 0 for r in rows)
    assert all(r["mean_abs_diff_e6"] >= 0 for r in rows)


def test_integrity_parity_on_dirty_fixture(spark, tmp_path):
    """Inject every corruption class the audits exist to catch —
    orphan FKs, NULL FKs, duplicated PKs, an order with no lineitems,
    a sub-cent price — and require the full d16 sweep to hash-match
    DuckDB on the dirty corpus, then spot-check the Spark-side counts
    actually moved."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_oracles import run_sweep

    from event_streamer_spark.tables import TABLES

    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", dirty / f"{t}.parquet")

    li = pq.read_table(dirty / "lineitem.parquet")
    ship_type = li.schema.field("l_shipdate").type
    extra_li = pa.table(
        {
            # orphan orderkey; NULL orderkey; orphan partkey with a
            # sub-cent extendedprice (rounding must agree engine-wise)
            "l_orderkey": pa.array([10**9, None, 1], type=pa.int64()),
            "l_partkey": pa.array([1, 1, 10**9], type=pa.int64()),
            "l_suppkey": pa.array([1, 1, 1], type=pa.int64()),
            "l_linenumber": pa.array([901, 902, 903], type=pa.int32()),
            "l_quantity": [1.0, 1.0, 1.0],
            "l_extendedprice": [100.0, 100.0, 0.004],
            "l_discount": [0.05, 0.0, 0.1],
            "l_tax": [0.02, 0.0, 0.08],
            "l_returnflag": ["N", "N", "N"],
            "l_linestatus": ["O", "O", "O"],
            "l_shipdate": pa.array(
                [1704067200_000_000] * 3, type=ship_type
            ),
        },
        schema=li.schema,
    )
    pq.write_table(pa.concat_tables([li, extra_li]),
                   dirty / "lineitem.parquet")

    orders = pq.read_table(dirty / "orders.parquet")
    first = orders.slice(0, 1)
    od_type = orders.schema.field("o_orderdate").type
    extra_orders = pa.table(
        {
            # duplicate of an existing PK; a no-lineitem order with an
            # orphan custkey
            "o_orderkey": pa.array(
                [first.column("o_orderkey")[0].as_py(), 2 * 10**9],
                type=pa.int64(),
            ),
            "o_custkey": pa.array([1, 10**9], type=pa.int64()),
            "o_orderstatus": ["F", "F"],
            "o_totalprice": [123.45, 67.89],
            "o_orderdate": pa.array(
                [1704067200_000_000] * 2, type=od_type
            ),
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
        },
        schema=orders.schema,
    )
    pq.write_table(pa.concat_tables([orders, extra_orders]),
                   dirty / "orders.parquet")

    # orphan the supplier->nation edge: a supplier pointing at a
    # nation that does not exist
    supp = pq.read_table(dirty / "supplier.parquet")
    extra_supp = pa.table(
        {
            "s_suppkey": pa.array([10**9], type=pa.int64()),
            "s_name": ["dirty-supplier"],
            "s_nationkey": pa.array([10**6], type=pa.int32()),
            "s_acctbal": [0.0],
        },
        schema=supp.schema,
    )
    pq.write_table(pa.concat_tables([supp, extra_supp]),
                   dirty / "supplier.parquet")

    total, failures = run_sweep(spark, str(dirty), ["d16_"], quiet=True)
    assert total == 4 and failures == [], failures

    fk = {r["edge"]: r for r in
          REGISTRY["d16_fk_orphans"].fn(spark, str(dirty)).collect()}
    assert fk["lineitem.l_orderkey->orders"]["n_orphans"] == 1
    assert fk["lineitem.l_orderkey->orders"]["n_null_fk"] == 1
    assert fk["lineitem.l_partkey->part"]["n_orphans"] == 1
    assert fk["orders.o_custkey->customer"]["n_orphans"] == 1
    assert fk["supplier.s_nationkey->nation"]["n_orphans"] == 1
    assert fk["nation.n_regionkey->region"]["n_orphans"] == 0

    dup = {r["key_name"]: r for r in
           REGISTRY["d16_dup_keys"].fn(spark, str(dirty)).collect()}
    assert dup["orders.o_orderkey"]["n_dup_keys"] == 1
    assert dup["orders.o_orderkey"]["n_rows_in_dups"] == 2
    assert dup["orders.o_orderkey"]["max_multiplicity"] == 2

    base = REGISTRY["d16_order_reconcile"].fn(spark, SF).collect()
    rec = REGISTRY["d16_order_reconcile"].fn(spark, str(dirty)).collect()
    assert (
        sum(r["n_no_lines"] for r in rec)
        == sum(r["n_no_lines"] for r in base) + 1
    )


def test_weighted_median_first_principles(spark):
    """Recompute the lower weighted median in Python from the sorted
    (cents, qty) lines and require exact agreement; qty=1 degenerates
    to the plain lower median."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from event_streamer_spark.operators import REGISTRY
    from event_streamer_spark.tables import load

    li = (
        load(spark, SF, "lineitem")
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"),
            F.round(F.col("l_quantity")).cast("long").alias("q"),
            "l_orderkey",
            "l_linenumber",
        )
        .collect()
    )
    groups = defaultdict(list)
    for r in li:
        groups[r["l_returnflag"]].append(
            (r["c"], r["l_orderkey"], r["l_linenumber"], r["q"])
        )
    got = {r["l_returnflag"]: r for r in
           REGISTRY["b66_weighted_median"].fn(spark, SF).collect()}
    assert set(got) == set(groups)
    for f, rows in groups.items():
        rows.sort()
        tw = sum(q for *_, q in rows)
        cum = 0
        for c, _, _, q in rows:
            cum += q
            if 2 * cum >= tw:
                assert got[f]["wmedian_cents"] == c, f
                break
        assert got[f]["total_weight"] == tw, f


def test_consistency_audit_reports_fixture_truth(spark):
    rows = {r["rule"]: r for r in
            REGISTRY["d16_consistency_audit"].fn(spark, SF).collect()}
    assert len(rows) == 4
    # derived column and rate domains hold on the clean fixture
    assert rows["documents.n_chars==length(text)"]["n_violations"] == 0
    assert rows["lineitem.discount_in_[0,1]"]["n_violations"] == 0
    assert rows["lineitem.tax_in_[0,1]"]["n_violations"] == 0
    # the generator draws dates independently: the temporal rule
    # genuinely fails for roughly half the lines — report, not assume
    t = rows["lineitem.shipdate>=orderdate"]
    assert 0 < t["n_violations"] < t["n_checked"]
