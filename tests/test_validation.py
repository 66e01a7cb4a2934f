"""D14 dataset validation: behavioral checks beyond the DuckDB oracle
(which pins exact values) — the constraint suite's verdicts on the
known-clean fixture, and PSI's mathematical properties."""

from __future__ import annotations

import math

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def test_quality_suite_passes_on_clean_fixture(spark):
    rows = {r["check_name"]: r for r in
            REGISTRY["d14_data_quality"].fn(spark, SF).collect()}
    assert set(rows) == {
        "completeness_text", "uniqueness_doc_id", "min_n_chars",
        "max_n_chars", "lang_allowed", "mean_n_chars",
    }
    # the fixture is clean by construction: every constraint passes
    assert all(r["passed"] for r in rows.values()), rows
    assert rows["completeness_text"]["metric"] == 1.0
    assert rows["uniqueness_doc_id"]["metric"] == 1.0


def test_quality_suite_fails_on_violations(spark):
    """The verdict logic must actually fire: nulling half the text and
    duplicating doc_ids flips the corresponding checks to failed."""
    import pyspark.sql.functions as F

    from event_streamer_spark.tables import load

    d = load(spark, SF, "documents")
    dirty = d.withColumn(
        "text", F.when(F.col("doc_id") % 2 == 0, F.col("text"))
    ).unionAll(d.limit(50))
    dirty.createOrReplaceTempView("documents")
    try:
        # re-run the SAME suite SQL over the dirty view via the oracle
        # text on Spark (the registry fn reads parquet directly, so the
        # constraint logic is exercised through its SQL twin here).
        # Oracles are canonical-DuckDB since r13's registration-time
        # CTE normalization; the AS MATERIALIZED hint is plan-only
        # (DuckDB syntax Spark can't parse), so strip it for this
        # Spark-side replay.
        import re

        sql = re.sub(
            r"\bAS\s+MATERIALIZED\s*\(", "AS (",
            REGISTRY["d14_data_quality"].oracle, flags=re.I,
        )
        rows = {r["check_name"]: r for r in spark.sql(sql).collect()}
        assert not rows["completeness_text"]["passed"]
        assert not rows["uniqueness_doc_id"]["passed"]
        assert rows["min_n_chars"]["passed"]
    finally:
        spark.catalog.dropTempView("documents")


def test_psi_properties(spark):
    rows = REGISTRY["d14_column_drift"].fn(spark, SF).collect()
    assert len(rows) == 10  # full bin spine, empty bins included
    # probabilities are smoothed distributions: positive, sum to ~1
    for col in ("p_ref", "p_cur"):
        s = sum(r[col] for r in rows)
        assert abs(s - 1.0) < 1e-4, (col, s)
        assert all(r[col] > 0 for r in rows)
    psi = sum(r["psi_term"] for r in rows)
    # each term (p-q)*ln(p/q) is non-negative, so PSI is too; finite
    assert all(r["psi_term"] >= 0 for r in rows)
    assert math.isfinite(psi) and psi >= 0


def test_ks_drift_matches_first_principles(spark):
    """Independent re-derivation: collect the sf0.001 documents and
    compute the two-sample KS statistic in plain Python — the query's
    distributed CDF merge must agree to the rounding pin."""
    from event_streamer_spark.tables import load

    rows = load(spark, SF, "documents").select("lang", "n_chars").collect()
    a = sorted(r["n_chars"] for r in rows if r["lang"] == "en")
    b = sorted(r["n_chars"] for r in rows if r["lang"] != "en")
    values = sorted(set(a) | set(b))
    import bisect

    ks = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in values
    )
    got = REGISTRY["d14_ks_drift"].fn(spark, SF).collect()[0]
    assert got["n_en"] == len(a) and got["n_other"] == len(b)
    assert abs(got["ks_stat"] - ks) < 1e-6
    assert 0.0 <= got["ks_stat"] <= 1.0


def test_anomaly_mad_matches_first_principles(spark):
    """Independent re-derivation of the robust z-score flags: per-type
    median and MAD computed in plain Python over the collected events
    must reproduce the query's med2/mad4/n_anomalies exactly."""
    import statistics

    from event_streamer_spark.tables import load

    rows = (
        load(spark, SF, "events")
        .select("event_type", "value")
        .collect()
    )
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            2 * round(r["value"] * 100)
        )
    got = {
        r["event_type"]: r
        for r in REGISTRY["d15_anomaly_mad"].fn(spark, SF).collect()
    }
    assert set(got) == set(by_type)
    for et, c2s in by_type.items():
        med2 = statistics.median(c2s)
        assert med2 == int(med2)  # doubled cents keep the median integral
        d4s = [2 * abs(c2 - int(med2)) for c2 in c2s]
        mad4 = statistics.median(d4s)
        assert mad4 == int(mad4)
        n_anom = sum(1 for d4 in d4s if d4 > 4.4478 * mad4)
        g = got[et]
        assert (g["n"], g["med2"], g["mad4"], g["n_anomalies"]) == (
            len(c2s), int(med2), int(mad4), n_anom,
        ), et


def test_benford_matches_first_principles(spark):
    """Independent re-derivation: first digits and chi-square terms
    computed in plain Python over the collected events."""
    import math

    from event_streamer_spark.tables import load

    vals = [
        r["value"]
        for r in load(spark, SF, "events").select("value").collect()
        if r["value"] > 0
    ]
    digits = [int(str(round(v * 100))[0]) for v in vals]
    n = len(digits)
    got = {r["digit"]: r for r in
           REGISTRY["d14_benford"].fn(spark, SF).collect()}
    assert set(got) == set(range(1, 10))  # full spine
    chi2 = 0.0
    for d in range(1, 10):
        obs = digits.count(d)
        exp = math.log10(1 + 1 / d) * n
        assert got[d]["n_obs"] == obs
        assert abs(got[d]["p_obs"] - obs / n) < 1e-6
        term = (obs - exp) ** 2 / exp
        assert abs(got[d]["chi2_term"] - term) < 1e-5
        chi2 += term
    # p_obs is a distribution over the spine
    assert abs(sum(r["p_obs"] for r in got.values()) - 1.0) < 1e-4
    assert chi2 >= 0


def test_cusum_matches_first_principles(spark):
    """Independent re-derivation: the closed form
    S_t = cum_t - min(cum_<=t) must equal the textbook recursion
    S_t = max(0, S_{t-1} + y_t) computed in plain Python."""
    import pyspark.sql.functions as F

    from event_streamer_spark.tables import load

    rows = (
        load(spark, SF, "events")
        .select(F.to_date("ts").alias("d"), "value")
        .collect()
    )
    daily = {}
    for r in rows:
        c, n = daily.get(r["d"], (0, 0))
        daily[r["d"]] = (c + round(r["value"] * 100), n + 1)
    days = sorted(daily)
    means = {d: daily[d][0] / daily[d][1] / 100 for d in days}
    target = sum(c for c, _ in daily.values()) / sum(
        n for _, n in daily.values()
    ) / 100
    # exact integer micro-dollar recursion (the round-9 fixed-point
    # spelling): dm_e6 = trunc(10000*cents / cnt) — TRUNCATION toward
    # zero (Spark DIV == DuckDB //), not Python's floor //
    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    dm_e6 = {d: tdiv(10000 * daily[d][0], daily[d][1]) for d in days}
    tgt_e6 = tdiv(
        10000 * sum(c for c, _ in daily.values()),
        sum(n for _, n in daily.values()),
    )
    s_e6, expect = 0, {}
    for d in days:
        s_e6 = max(0, s_e6 + (dm_e6[d] - tgt_e6))
        expect[d] = s_e6
    got = {r["d"]: r for r in
           REGISTRY["d15_changepoint_cusum"].fn(spark, SF).collect()}
    assert sorted(got) == days
    for d in days:
        assert int(got[d]["cusum_pos_e6"]) == expect[d], d
        assert got[d]["shifted"] == (expect[d] > 5_000_000)
        assert abs(got[d]["day_mean"] - means[d]) < 1e-6


def test_anomaly_mad_consumers_read_cache(spark):
    """Plan pin for the scan budget: exact median-of-deviations is
    two-pass, and both post-median consumers (MAD rank pass + final
    flag aggregate) must read the persisted deviation frame — the
    4-scans-to-2 rewrite stays in place."""
    from event_streamer_spark.caching import clear_slot

    clear_slot("d15_anomaly_dev")
    df = REGISTRY["d15_anomaly_mad"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2, plan
    clear_slot("d15_anomaly_dev")


def test_validation_parity_on_dirty_fixture(spark, tmp_path):
    """Review r8 regression: the three CONFIRMED Spark-vs-DuckDB
    divergences on dirty data — sub-cent Benford rows, NULL n_chars
    under the engines' opposite NULL orderings, out-of-spine PSI bins
    from negative n_chars — must stay fixed. Replays the reviewer's
    perturbations and requires the full d14/d15 oracle sweep to
    hash-match on the dirty corpus, not just the clean fixture."""
    import os
    import shutil
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_oracles import run_sweep

    from event_streamer_spark.tables import TABLES

    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", dirty / f"{t}.parquet")

    docs = pq.read_table(dirty / "documents.parquet")
    extra_docs = pa.table(
        {
            "doc_id": [10**9, 10**9 + 1],
            "text": ["dirty-null-nchars", "dirty-negative-nchars"],
            "lang": ["en", "fr"],
            "source": ["dirty", "dirty"],
            "n_chars": pa.array([None, -5], type=pa.int64()),
        },
        schema=docs.schema,
    )
    pq.write_table(
        pa.concat_tables([docs, extra_docs]), dirty / "documents.parquet"
    )

    ev = pq.read_table(dirty / "events.parquet")
    ts_type = ev.schema.field("ts").type
    extra_ev = pa.table(
        {
            "event_id": [10**9, 10**9 + 1, 10**9 + 2, 10**9 + 3],
            "ts": pa.array(
                [
                    1704067200_000_000,
                    1704067200_000_000,
                    None,
                    1704067200_000_000,
                ],
                type=ts_type,
            ),
            "user_id": [1, 1, 1, 1],
            "event_type": ["view", "view", "view", "refund"],
            # sub-cent amount; NULL value (MEDIAN skips it, a naive rank
            # would count it); NULL ts (would become its own day key);
            # a refund large enough to drive that day's total NEGATIVE
            # (review r8: negative EWMA numerators hit the Python-floor
            # vs DuckDB-truncate division divergence)
            "value": pa.array(
                [0.004, None, 1.0, -10**7], type=pa.float64()
            ),
            # diverse props for the JSON key census: an extra string
            # key, a renamed numeric key, MALFORMED JSON (Spark
            # from_json -> NULL map; DuckDB json_valid guard), and a
            # NULL — the schema-drift classes the census audits
            "props": [
                '{"k": 1, "extra": "x"}',
                '{"other": 2.5}',
                "{oops",
                None,
            ],
        },
        schema=ev.schema,
    )
    # review-r8 validity-contract classes: non-object JSON (DuckDB
    # json_valid accepts, a map parse nulls), single-quoted pseudo-JSON
    # (Spark's lenient parser accepts unless disabled), duplicate-key
    # objects (path extraction vs map explosion disagree), and
    # NaN/overflow numerics (an unguarded cents cast would crash) —
    # ALL must be treated identically by both engines
    extra_ev2 = pa.table(
        {
            "event_id": [10**9 + 10, 10**9 + 11, 10**9 + 12, 10**9 + 13],
            "ts": pa.array([1704067200_000_000] * 4, type=ts_type),
            "user_id": [2, 2, 2, 2],
            "event_type": ["view"] * 4,
            "value": pa.array([1.0, 1.0, 1.0, 1.0], type=pa.float64()),
            "props": [
                "[1, 2]",
                "{'k': 1}",
                '{"a": 1, "a": 2}',
                '{"big": 1e20, "nan": "NaN", "k": 3}',
            ],
        },
        schema=ev.schema,
    )
    # round-8 session 4: NULL categories for the entropy census —
    # NULL event_type must land in n_null (tracked separately), never
    # in the value distribution, identically on both engines
    extra_ev3 = pa.table(
        {
            "event_id": [10**9 + 20, 10**9 + 21],
            "ts": pa.array([1704067200_000_000] * 2, type=ts_type),
            "user_id": [3, 3],
            "event_type": pa.array([None, None], type=pa.string()),
            "value": pa.array([1.0, 1.0], type=pa.float64()),
            "props": ["{}", "{}"],
        },
        schema=ev.schema,
    )
    pq.write_table(
        pa.concat_tables([ev, extra_ev, extra_ev2, extra_ev3]),
        dirty / "events.parquet",
    )

    # round-8 session 4 (d15_seasonal_dow): a NULL order date (its own
    # NULL day/dow group on both engines) and one 10^9-dollar order
    # that must flip its day's LOO seasonal ratio to anomalous
    # identically on both sides
    orders = pq.read_table(dirty / "orders.parquet")
    od_type = orders.schema.field("o_orderdate").type
    extra_ord = pa.table(
        {
            "o_orderkey": [10**9, 10**9 + 1],
            "o_custkey": [1, 1],
            "o_orderstatus": ["O", "O"],
            "o_totalprice": pa.array(
                [100.0, 1_000_000_000.0], type=pa.float64()
            ),
            "o_orderdate": pa.array(
                [None, 820454400_000_000], type=od_type  # 1996-01-01 µs
            ),
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
        },
        schema=orders.schema,
    )
    pq.write_table(
        pa.concat_tables([orders, extra_ord]), dirty / "orders.parquet"
    )

    total, failures = run_sweep(
        spark, str(dirty), ["d14_", "d15_"], quiet=True
    )
    assert total >= 6 and failures == [], failures


def test_ewma_monitor_first_principles(spark):
    """Recompute the integer EWMA recursion independently from the
    daily cents and require exact agreement, including the flag."""
    from pyspark.sql import functions as F

    from event_streamer_spark.tables import load

    daily = {
        r["d"].strftime("%Y-%m-%d"): r["cents"]
        for r in load(spark, SF, "events")
        .filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
        .groupBy(F.to_date("ts").alias("d"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"))
        .collect()
    }
    got = {r["d"]: r for r in
           REGISTRY["d15_ewma_monitor"].fn(spark, SF).collect()}
    assert sorted(got) == sorted(daily)
    ewma = None
    for d in sorted(daily):
        x = daily[d]
        ewma = x if ewma is None else (20 * x + 80 * ewma) // 100
        assert got[d]["day_cents"] == x, d
        assert got[d]["ewma_cents"] == ewma, d
        assert got[d]["flagged"] == (4 * abs(x - ewma) > ewma), d


def test_trend_ols_first_principles(spark):
    """The DECIMAL(38,0) slope moments must equal an exact
    arbitrary-precision recount in Python ints, and the readable
    slope must be the num/den ratio."""
    from fractions import Fraction

    from event_streamer_spark.tables import load

    rows = REGISTRY["d15_trend_ols"].fn(spark, SF).collect()
    o = load(spark, SF, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    c = {r["c_custkey"]: r["c_nationkey"]
         for r in load(spark, SF, "customer").collect()}
    n = {r["n_nationkey"]: r["n_regionkey"]
         for r in load(spark, SF, "nation").collect()}
    reg = {r["r_regionkey"]: r["r_name"]
           for r in load(spark, SF, "region").collect()}
    from collections import defaultdict
    from datetime import date

    daily: dict[tuple, int] = defaultdict(int)
    for r in o.collect():
        rname = reg[n[c[r["o_custkey"]]]]
        od = r["o_orderdate"]
        od = od.date() if hasattr(od, "date") else od  # ts-typed fixture
        x = (od - date(1992, 1, 1)).days
        daily[(rname, x)] += round(r["o_totalprice"] * 100)
    moments: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for (rname, x), y in daily.items():
        m = moments[rname]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * x
        m[4] += x * y
    assert len(rows) == len(moments) == 5
    for r in rows:
        cnt, sx, sy, sxx, sxy = moments[r["r_name"]]
        num = cnt * sxy - sx * sy
        den = cnt * sxx - sx * sx
        assert r["n_days"] == cnt
        assert r["slope_num"] == str(num)
        assert r["slope_den"] == str(den)
        sign = -1 if num < 0 else 1
        exp_micro = sign * ((abs(num) * 10_000_000 // den + 5) // 10)
        assert r["slope_micro_per_day"] == exp_micro
        assert abs(exp_micro / 1e6 - Fraction(num, den)) <= 1e-6


def test_entropy_census_first_principles(spark):
    """Entropy/mode/distinct recomputed driver-side from raw value
    counts for every profiled column, plus the information-theoretic
    bound H <= ln(n_distinct) with equality only for uniform columns."""
    import math
    from collections import Counter

    from event_streamer_spark.operators.validation import _CENSUS_COLS
    from event_streamer_spark.tables import load

    rows = {r["col"]: r for r in
            REGISTRY["d14_entropy_census"].fn(spark, SF).collect()}
    assert set(rows) == {c for _, c in _CENSUS_COLS}
    for tbl, col in _CENSUS_COLS:
        vals = [r[col] for r in load(spark, SF, tbl).select(col).collect()]
        counts = Counter(v for v in vals if v is not None)
        n = sum(counts.values())
        got = rows[col]
        assert got["n_values"] == n
        assert got["n_distinct"] == len(counts)
        assert got["n_null"] == sum(1 for v in vals if v is None)
        assert got["top_share_ppm"] == (1_000_000 * max(counts.values())) // n
        h = math.log(n) - sum(c * math.log(c) for c in counts.values()) / n
        assert abs(got["entropy_nats"] - h) < 2e-6
        assert -1e-9 <= got["entropy_nats"] <= math.log(len(counts)) + 1e-9


def test_seasonal_dow_first_principles(spark):
    """LOO cohort ratios recomputed driver-side: every day's ratio_ppm
    must equal daily*(cnt-1)*1e6 // (cohort_sum - daily) over its
    weekday cohort, the anomaly band must be exactly [0.5x, 2x], and
    every cohort must appear (7 weekdays)."""
    from collections import defaultdict

    rows = REGISTRY["d15_seasonal_dow"].fn(spark, SF).collect()
    assert {r["dow1"] for r in rows} == set(range(1, 8))
    cohorts = defaultdict(list)
    for r in rows:
        cohorts[r["dow1"]].append(r)
    for dow, days in cohorts.items():
        total = sum(r["daily_c"] for r in days)
        cnt = len(days)
        for r in days:
            if cnt == 1:
                assert r["ratio_ppm"] is None and r["is_anomaly"] == 0
                continue
            exp = (1_000_000 * r["daily_c"] * (cnt - 1)) // (
                total - r["daily_c"]
            )
            assert r["ratio_ppm"] == exp
            assert r["is_anomaly"] == int(exp < 500_000 or exp > 2_000_000)


def test_ab_cuped_first_principles(spark):
    """Assignment, moments, and the CUPED adjustment recomputed
    driver-side: variants must partition the users deterministically
    by the md5 hash, pooled theta must be shared (the adjusted means
    must satisfy the identity sum_v n_v*(adj_v - raw_v) ~ 0 when the
    pooled covariate mean is used), and every emitted tally must match
    the raw recount."""
    import hashlib
    from datetime import datetime

    from event_streamer_spark.operators.validation import _AB_SPLIT
    from event_streamer_spark.tables import load

    split = datetime.fromisoformat(_AB_SPLIT)
    per_user: dict[int, list] = {}
    for r in load(spark, SF, "events").collect():
        if r["user_id"] is None or r["ts"] is None:
            continue
        u = per_user.setdefault(r["user_id"], [0, 0, 0])  # x, y, conv
        if r["ts"] < split:
            u[0] += 1
        else:
            if r["event_type"] == "purchase":
                u[2] = 1
                if r["value"] is not None and 0 <= r["value"] <= 1e9:
                    u[1] += round(r["value"] * 100)
    stats = {0: [0, 0, 0, 0], 1: [0, 0, 0, 0]}  # n, sy, sx, conv
    n = sx = sy = sxx = sxy = 0
    for uid, (x, y, conv) in per_user.items():
        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:13], 16)
        v = h % 2
        s = stats[v]
        s[0] += 1
        s[1] += y
        s[2] += x
        s[3] += conv
        n += 1
        sx += x
        sy += y
        sxx += x * x
        sxy += x * y
    rows = {r["variant"]: r for r in
            REGISTRY["d14_ab_cuped"].fn(spark, SF).collect()}
    assert set(rows) == {0, 1}
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for v, (nv, syv, sxv, convv) in stats.items():
        r = rows[v]
        assert (r["n_users"], r["sum_y_c"], r["sum_x"], r["conv_users"]) \
            == (nv, syv, sxv, convv)
        assert r["conv_rate_ppm"] == (1_000_000 * convv) // nv
        tn = n * sxy - sx * sy
        td = n * sxx - sx * sx
        n_adj = syv * td * n - tn * (sxv * n - sx * nv)
        d_adj = nv * td * n
        sign = -1 if n_adj < 0 else 1
        exp_micro = sign * ((abs(n_adj) * 10_000_000 // d_adj + 5) // 10)
        # emitted as an exact digit string since the seed-20260822
        # int64-overflow fix
        assert int(r["mean_y_adj_micro"]) == exp_micro
        adj = syv / nv - theta * (sxv / nv - sx / n)
        assert abs(exp_micro / 1e6 - adj) < 2e-6


def test_holt_monitor_first_principles(spark):
    """The Holt recursion replayed in plain Python over the raw daily
    table: level/trend/forecast/flag must match exactly (floor
    division, init trend 0), the forecast must be the PREVIOUS day's
    level+trend, and trend must go negative somewhere (the declining
    stretch that exercises the floor-vs-truncate divergence path)."""
    from collections import defaultdict

    from event_streamer_spark.tables import load

    rows = REGISTRY["d15_holt_monitor"].fn(spark, SF).collect()
    daily: dict = defaultdict(int)
    for e in load(spark, SF, "events").collect():
        if e["ts"] is None or e["value"] is None:
            continue
        daily[e["ts"].date()] += round(e["value"] * 100)
    series = sorted(daily.items())
    assert len(rows) == len(series)
    lvl = trd = fc = None
    neg_trend_seen = False
    for r, (d, cents) in zip(sorted(rows, key=lambda r: r["d"]), series):
        assert r["d"] == d.strftime("%Y-%m-%d")
        assert r["day_cents"] == cents
        if lvl is None:
            lvl, trd, fc = cents, 0, None
        else:
            fc = lvl + trd
            new_lvl = (20 * cents + 80 * fc) // 100
            trd = (10 * (new_lvl - lvl) + 90 * trd) // 100
            lvl = new_lvl
        assert (r["level_cents"], r["trend_cents"]) == (lvl, trd)
        assert r["forecast_cents"] == fc
        assert r["flagged"] == (
            fc is not None and 4 * abs(cents - fc) > abs(fc)
        )
        neg_trend_seen = neg_trend_seen or trd < 0
    assert neg_trend_seen


def test_chi2_independence_first_principles(spark):
    """Every cell's exact-integer chi2 contribution must match a pure
    Python recompute of (N*O - rt*ct)^2 * 1e6 // (N*rt*ct), and the
    marginals must be consistent (sum of obs per lang == rt etc.)."""
    import collections

    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    cells = collections.Counter(
        (r["lang"], r["source"])
        for r in docs
        if r["lang"] is not None and r["source"] is not None
    )
    rt = collections.Counter()
    ct = collections.Counter()
    for (lang, src), o in cells.items():
        rt[lang] += o
        ct[src] += o
    n = sum(cells.values())
    rows = REGISTRY["d14_chi2_independence"].fn(spark, SF).collect()
    assert len(rows) == len(cells)
    for r in rows:
        o = cells[(r["lang"], r["source"])]
        assert r["obs"] == o
        rtot, ctot = rt[r["lang"]], ct[r["source"]]
        assert int(r["exp_micro"]) == (1_000_000 * rtot * ctot) // n
        diff = n * o - rtot * ctot
        assert int(r["chi2_cell_micro"]) == (
            1_000_000 * diff * diff
        ) // (n * rtot * ctot)


def test_ab_cuped_whale_quotient_past_int64(spark, tmp_path):
    """ADVICE r10 (medium): the [0,1e9]-per-EVENT cap bounds every
    intermediate PRODUCT into DECIMAL(38,0) but not the final per-user
    adjusted-mean quotient — a whale variant (one user holding
    thousands of near-cap purchases) pushes |ȳ_adj|·1e7 past 2^63,
    where Spark's DIV wraps silently and DuckDB's HUGEINT // stays
    exact. The staged-long-division spelling must hash-match DuckDB on
    such a corpus AND actually emit a digit string beyond long range
    (proving the test reached the overflow regime the old spelling
    wrapped in)."""
    import hashlib
    import os
    import shutil
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "scripts")
    )
    from check_oracles import run_sweep

    from event_streamer_spark.tables import TABLES

    dirty = tmp_path / "dirty_sf"
    dirty.mkdir()
    for t in TABLES:
        shutil.copy(f"{SF}/{t}.parquet", dirty / f"{t}.parquet")

    # a fresh user id assigned to variant 0 by the md5 52-bit hash
    whale = next(
        u for u in range(10**7, 10**7 + 100)
        if int(hashlib.md5(str(u).encode()).hexdigest()[:13], 16) % 2 == 0
    )
    ev = pq.read_table(dirty / "events.parquet")
    ts_type = ev.schema.field("ts").type
    n_rows = 12_000  # 12k × $1e9 = $1.2e13 ≫ n_users(variant 0) × $9.2e9
    extra = pa.table(
        {
            "event_id": pa.array(
                [2 * 10**9 + i for i in range(n_rows)], type=pa.int64()
            ),
            # post-split (AB split is 2024-01-16): 2024-01-20
            "ts": pa.array([1705708800_000_000] * n_rows, type=ts_type),
            "user_id": pa.array([whale] * n_rows, type=pa.int64()),
            "event_type": ["purchase"] * n_rows,
            "value": pa.array([1e9] * n_rows, type=pa.float64()),
            "props": ["{}"] * n_rows,
        },
        schema=ev.schema,
    )
    pq.write_table(pa.concat_tables([ev, extra]), dirty / "events.parquet")

    total, failures = run_sweep(
        spark, str(dirty), ["d14_ab_cuped"], quiet=True
    )
    assert total == 1 and failures == [], failures

    rows = {r["variant"]: r for r in
            REGISTRY["d14_ab_cuped"].fn(spark, str(dirty)).collect()}
    adj0 = int(rows[0]["mean_y_adj_micro"])
    assert abs(adj0) > 2**63, adj0  # the regime a bare DIV wraps in
