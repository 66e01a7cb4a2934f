"""B60-B62 journey analytics: semantic invariants on the clean fixture
plus the dirty-fixture differential sweep (NULL ts is the known
ordered-window parity hazard: Spark NULLS FIRST vs DuckDB NULLS LAST)."""

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def test_attribution_partitions_users(spark):
    rows = REGISTRY["b60_attribution"].fn(spark, SF).collect()
    from event_streamer_spark.tables import load

    n_users = load(spark, SF, "events").select("user_id").distinct().count()
    assert sum(r["n_users"] for r in rows) == n_users
    # total attributed revenue == total purchase revenue in cents
    total = (
        load(spark, SF, "events")
        .filter("event_type = 'purchase'")
        .selectExpr("CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) s")
        .collect()[0]["s"]
    )
    assert sum(r["revenue_cents"] for r in rows) == total


def test_markov_rows_normalize(spark):
    rows = REGISTRY["b61_markov_transitions"].fn(spark, SF).collect()
    from collections import defaultdict

    by_prev = defaultdict(float)
    for r in rows:
        by_prev[r["prev_type"]] += r["prob"]
        assert r["n_transitions"] > 0
    for prev, s in by_prev.items():
        assert abs(s - 1.0) < 1e-4, (prev, s)
    # each user contributes (n_events - 1) transitions
    from event_streamer_spark.tables import load

    e = load(spark, SF, "events")
    expected = e.count() - e.select("user_id").distinct().count()
    assert sum(r["n_transitions"] for r in rows) == expected


def test_session_paths_shape(spark):
    rows = REGISTRY["b62_session_paths"].fn(spark, SF).collect()
    assert 0 < len(rows) <= 20
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= 8
        assert all(
            s in {"click", "view", "purchase", "signup", "error"}
            for s in steps
        )


def test_journey_parity_on_dirty_fixture(spark, tmp_path):
    """NULL ts and NULL value rows ride every ordered window in the
    family; the sweep must hash-match DuckDB on the perturbed corpus."""
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
    ts_type = ev.schema.field("ts").type
    extra = pa.table(
        {
            "event_id": [10**9, 10**9 + 1, 10**9 + 2, 10**9 + 3],
            # NULL ts on a purchase (revenue still counts, ordering
            # excluded); tie on (ts) resolved by event_id; NULL value
            # purchase attributes zero revenue; and a user whose ONLY
            # event is a NULL-ts purchase (review r8: no touch pair at
            # all — must surface via the FULL join, not vanish)
            "ts": pa.array(
                [None, 1704067200_000_000, 1704067200_000_000, None],
                type=ts_type,
            ),
            "user_id": [1, 2, 2, 10**6],
            "event_type": ["purchase", "signup", "purchase", "purchase"],
            "value": pa.array([5.0, None, None, 7.0], type=pa.float64()),
            "props": ["{}", "{}", "{}", "{}"],
        },
        schema=ev.schema,
    )
    pq.write_table(pa.concat_tables([ev, extra]), dirty / "events.parquet")

    total, failures = run_sweep(
        spark, str(dirty), ["b60_", "b61_", "b62_", "b63_"], quiet=True
    )
    assert total == 4 and failures == [], failures

    # the NULL-ts-only user's 700 cents land in the (NULL, NULL) arc
    rows = REGISTRY["b60_attribution"].fn(spark, str(dirty)).collect()
    null_arc = [
        r for r in rows
        if r["first_touch"] is None and r["last_touch"] is None
    ]
    assert len(null_arc) == 1
    assert null_arc[0]["n_users"] == 1
    assert null_arc[0]["revenue_cents"] == 700


def test_running_distinct_users_invariants(spark):
    """cum_distinct_users is the portable COUNT(DISTINCT) OVER rewrite:
    nondecreasing per type, >= daily active, and its final value equals
    the type's true distinct-user count."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from event_streamer_spark.tables import load

    rows = REGISTRY["b63_running_distinct_users"].fn(spark, SF).collect()
    by_type = defaultdict(list)
    for r in sorted(rows, key=lambda r: (r["event_type"], r["d"])):
        by_type[r["event_type"]].append(r)
    truth = {
        r["event_type"]: r["n"]
        for r in load(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(by_type) == set(truth)
    for t, seq in by_type.items():
        cums = [r["cum_distinct_users"] for r in seq]
        assert cums == sorted(cums), t
        assert all(
            r["cum_distinct_users"] >= r["n_active"] for r in seq
        ), t
        assert cums[-1] == truth[t], t


def test_session_conversion_shape(spark):
    rows = REGISTRY["b64_session_conversion"].fn(spark, SF).collect()
    assert rows
    assert any(r["n_converting"] > 0 for r in rows), (
        "no converting session on a fixture with signup+purchase events"
    )
    for r in rows:
        assert 0 <= r["n_converting"] <= r["n_sessions"]
        assert 0.0 <= r["conversion_rate"] <= 1.0
        assert (
            abs(r["conversion_rate"] - r["n_converting"] / r["n_sessions"])
            < 1e-6
        )


def test_conversion_pattern_token_boundaries(spark):
    """Review r8: the conversion regex must match whole path tokens on
    BOTH engines — `presignup` must not false-match, `page_view`-style
    intermediates must not break the chain."""
    import duckdb

    from event_streamer_spark.operators.journey import _CONVERSION_PATTERN

    cases = {
        "signup>purchase": True,
        "signup>page_view>purchase": True,
        "view>signup>click>error>purchase>view": True,
        "view>presignup>purchase": False,
        "signup>purchasex": False,
        "purchase>signup": False,
        "signup": False,
        "signup2>purchase": False,
    }
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(p,) for p in cases], "path string")
    got_spark = {
        r["path"]: r["m"]
        for r in df.select(
            "path", F.col("path").rlike(_CONVERSION_PATTERN).alias("m")
        ).collect()
    }
    con = duckdb.connect()
    got_duck = {
        p: con.execute(
            "SELECT REGEXP_MATCHES(?, ?)", [p, _CONVERSION_PATTERN]
        ).fetchone()[0]
        for p in cases
    }
    assert got_spark == cases
    assert got_duck == cases
