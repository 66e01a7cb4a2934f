"""B67-B70 reshaping/streak/resample operators: semantic invariants on
the clean fixture plus the dirty-fixture differential sweep (NULL ts /
NULL order-date rows are the known ordered-window parity hazard; the
clean fixture cannot exercise them)."""

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def test_unpivot_totals_match_wide(spark):
    """The long-format SUM per measure must equal the wide-format SUM
    computed without the reshape (unpivot moves rows, never values)."""
    from event_streamer_spark.tables import load

    rows = REGISTRY["b67_unpivot"].fn(spark, SF).collect()
    li = load(spark, SF, "lineitem")
    wide = li.selectExpr(
        "l_returnflag",
        "CAST(ROUND(l_quantity*100) AS BIGINT) AS qty_c",
        "CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_c",
        "CAST(ROUND(l_discount*100) AS BIGINT) AS disc_c",
        "CAST(ROUND(l_tax*100) AS BIGINT) AS tax_c",
    ).groupBy("l_returnflag").sum()
    by_flag = {r["l_returnflag"]: r for r in wide.collect()}
    assert len(rows) == 3 * 4  # 3 return flags x 4 measures
    for r in rows:
        assert r["total_c"] == by_flag[r["l_returnflag"]][
            f"sum({r['measure']})"
        ]
    n_li = li.count()
    for flag, grp in by_flag.items():
        per_flag = [r for r in rows if r["l_returnflag"] == flag]
        assert {r["measure"] for r in per_flag} == {
            "qty_c", "price_c", "disc_c", "tax_c"
        }
    assert sum(r["n_rows"] for r in rows) == 4 * n_li


def test_lateral_topn_is_true_topn(spark):
    """The lateral subquery's rows must equal the window-rank top-3 per
    nation (the decorrelated plan and the window plan are two spellings
    of one semantics)."""
    from event_streamer_spark.tables import register_views

    rows = REGISTRY["b68_lateral_topn"].fn(spark, SF).collect()
    register_views(spark, SF)
    expected = spark.sql(
        """
        SELECT n_name, c_name, c_acctbal FROM (
          SELECT n.n_name, c.c_name, c.c_acctbal,
                 ROW_NUMBER() OVER (PARTITION BY n.n_nationkey
                                    ORDER BY c.c_acctbal DESC, c.c_name) rn
          FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey)
        WHERE rn <= 3
        """
    ).collect()
    key = lambda r: (r["n_name"], r["c_name"], r["c_acctbal"])
    assert sorted(map(key, rows)) == sorted(map(key, expected))


def test_gaps_islands_invariants(spark):
    """Islands are maximal: length == calendar span, disjoint per user,
    separated by at least one missing day, and they partition the
    user's distinct active days."""
    from collections import defaultdict

    from event_streamer_spark.tables import load

    rows = REGISTRY["b69_gaps_islands"].fn(spark, SF).collect()
    by_user = defaultdict(list)
    for r in rows:
        span = (r["streak_end"] - r["streak_start"]).days + 1
        assert span == r["streak_days"], r
        by_user[r["user_id"]].append(r)
    for user, islands in by_user.items():
        islands.sort(key=lambda r: r["streak_start"])
        for a, b in zip(islands, islands[1:]):
            # maximality: a gap of >= 1 full day between islands
            assert (b["streak_start"] - a["streak_end"]).days >= 2, (a, b)
    total_days = (
        load(spark, SF, "events")
        .filter("ts IS NOT NULL AND user_id IS NOT NULL")
        .selectExpr("user_id", "CAST(ts AS DATE) AS day")
        .distinct()
        .count()
    )
    assert sum(r["streak_days"] for r in rows) == total_days


def test_gap_fill_grid_dense_and_bounded(spark):
    """Per priority: the grid is dense over [min, max]; observed rows
    pass through exactly (cnt*1000); interpolated rows lie within the
    bracketing observations' range (linear interpolation never
    overshoots its endpoints)."""
    from collections import defaultdict

    rows = REGISTRY["b70_gap_fill_interp"].fn(spark, SF).collect()
    by_pri = defaultdict(list)
    for r in rows:
        by_pri[r["pri"]].append(r)
    assert len(by_pri) == 5
    for pri, series in by_pri.items():
        series.sort(key=lambda r: r["day"])
        span = (series[-1]["day"] - series[0]["day"]).days + 1
        assert len(series) == span, (pri, len(series), span)
        # endpoints of the span are observations by construction
        assert series[0]["observed"] == 1 and series[-1]["observed"] == 1
        # interpolated values bounded by the bracketing observations
        prev_obs = None
        pending = []
        for r in series:
            if r["observed"] == 1:
                if prev_obs is not None:
                    lo = min(prev_obs, r["interp_milli"])
                    hi = max(prev_obs, r["interp_milli"])
                    for g in pending:
                        assert lo <= g["interp_milli"] <= hi, (pri, g)
                pending = []
                prev_obs = r["interp_milli"]
                assert r["interp_milli"] % 1000 == 0
            else:
                pending.append(r)
        assert not pending  # nothing dangles past the last observation


def test_relational3_parity_on_dirty_fixture(spark, tmp_path):
    """NULL ts/user rows (b69) and NULL order dates (b70) must be
    excluded identically on both engines — the clean fixture has no
    NULLs, so only a perturbed copy exercises the filters."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_oracles import run_sweep

    from event_streamer_spark.tables import TABLES

    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", dirty / f"{t}.parquet")

    ev = pq.read_table(dirty / "events.parquet")
    extra = pa.table(
        {
            "event_id": [10**9, 10**9 + 1, 10**9 + 2],
            # NULL ts, NULL user, and a both-NULL row: all three must
            # drop out of the islands on BOTH engines
            "ts": pa.array(
                [None, 1704067200_000_000, None],
                type=ev.schema.field("ts").type,
            ),
            "user_id": [1, None, None],
            "event_type": ["view", "view", "view"],
            "value": pa.array([1.0, 1.0, 1.0], type=pa.float64()),
            "props": ["{}", "{}", "{}"],
        },
        schema=ev.schema,
    )
    pq.write_table(pa.concat_tables([ev, extra]), dirty / "events.parquet")

    li = pq.read_table(dirty / "lineitem.parquet")
    extra_li = pa.table(
        {
            # NULL measures: Spark's unpivot KEEPS null values while
            # DuckDB's UNPIVOT excludes them — the explicit isNotNull
            # filter in b67 is what reconciles the engines, and only a
            # NULL-measure row exercises it (module ledger)
            "l_orderkey": [10**9, 10**9],
            "l_partkey": [1, 1],
            "l_suppkey": [1, 1],
            "l_linenumber": [1, 2],
            "l_quantity": pa.array([None, 5.0], type=pa.float64()),
            "l_extendedprice": pa.array([100.0, None], type=pa.float64()),
            "l_discount": pa.array([None, None], type=pa.float64()),
            "l_tax": pa.array([0.01, None], type=pa.float64()),
            "l_returnflag": ["N", "A"],
            "l_linestatus": ["O", "F"],
            "l_shipdate": pa.array(
                [None, None], type=li.schema.field("l_shipdate").type
            ),
        },
        schema=li.schema,
    )
    pq.write_table(pa.concat_tables([li, extra_li]), dirty / "lineitem.parquet")

    orders = pq.read_table(dirty / "orders.parquet")
    extra_o = pa.table(
        {
            "o_orderkey": [10**9],
            "o_custkey": [1],
            "o_orderstatus": ["O"],
            "o_totalprice": pa.array([100.0], type=pa.float64()),
            "o_orderdate": pa.array(
                [None], type=orders.schema.field("o_orderdate").type
            ),
            "o_orderpriority": ["1-URGENT"],
        },
        schema=orders.schema,
    )
    pq.write_table(
        pa.concat_tables([orders, extra_o]), dirty / "orders.parquet"
    )

    total, failures = run_sweep(
        spark, str(dirty), ["b67_", "b68_", "b69_", "b70_"], quiet=True
    )
    assert total == 4 and failures == [], failures


def test_skyline_first_principles(spark):
    """The frontier from the dimensional-reduction plan must equal a
    naive O(n²) dominance scan computed driver-side from the raw
    table — including ALL ties at each frontier point."""
    from event_streamer_spark.tables import load

    pts = [
        (r["p_partkey"], r["p_size"], round(r["p_retailprice"] * 100))
        for r in load(spark, SF, "part").collect()
    ]
    naive = {
        (k, s, p)
        for k, s, p in pts
        if not any(
            qp <= p and qs >= s and (qp < p or qs > s)
            for _, qs, qp in pts
        )
    }
    rows = REGISTRY["b71_skyline"].fn(spark, SF).collect()
    got = {(r["p_partkey"], r["p_size"], r["price_c"]) for r in rows}
    assert got == naive and len(got) > 0


def test_skyline_parity_on_dirty_fixture(spark, tmp_path):
    """Frontier ties and exact-duplicate points are the skyline edge
    the clean fixture may not contain: plant (a) two parts tied at a
    new cheapest (price, size) point — NO strict dominance between
    them, both must survive — and (b) a same-size part one cent dearer
    that must NOT survive, then re-run the oracle compare."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_oracles import run_sweep

    from event_streamer_spark.tables import TABLES

    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", dirty / f"{t}.parquet")

    part = pq.read_table(dirty / "part.parquet")
    # size 50 at a price below the fixture minimum dominates weakly
    # everywhere: the planted pair IS the new single frontier point
    # the NULL-size row satisfies no dominance predicate, so DuckDB's
    # NOT EXISTS would crown it a frontier point while Spark's
    # recovery join drops it — the explicit NULL filter (both engines)
    # is what this row exercises
    extra = pa.table(
        {
            "p_partkey": [10**9, 10**9 + 1, 10**9 + 2, 10**9 + 3],
            "p_name": ["tied a", "tied b", "dominated", "null size"],
            "p_brand": ["Brand#00"] * 4,
            "p_type": ["PLANTED"] * 4,
            "p_size": pa.array([50, 50, 50, None], type=pa.int32()),
            "p_retailprice": pa.array(
                [0.01, 0.01, 0.02, 0.005], type=pa.float64()
            ),
        },
        schema=part.schema,
    )
    pq.write_table(pa.concat_tables([part, extra]), dirty / "part.parquet")

    total, failures = run_sweep(spark, str(dirty), ["b71_"], quiet=True)
    assert total == 1 and failures == [], failures

    rows = REGISTRY["b71_skyline"].fn(spark, str(dirty)).collect()
    keys = {r["p_partkey"] for r in rows}
    assert {10**9, 10**9 + 1} <= keys and 10**9 + 2 not in keys
    # the planted point dominates every other (size 50 is the max,
    # price 1c the min) — the frontier collapses to the tied pair
    assert len(rows) == 2
