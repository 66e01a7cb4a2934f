"""Meta-tests for the correctness harness itself: the canonical hash in
scripts/check_oracles.py must be insensitive to row/column ORDER (Spark
and DuckDB return rows in arbitrary order) yet sensitive to any VALUE,
row-count, or null difference — otherwise a green sweep proves nothing."""

import sys

import pytest

sys.path.insert(0, "scripts")

from check_oracles import canon_hash, canon_value  # noqa: E402


class TestCanonValue:
    def test_null_bool_float_formats(self):
        assert canon_value(None) == "NULL"
        assert canon_value(True) == "true"
        assert canon_value(False) == "false"
        assert canon_value(1.5) == "1.500000"
        assert canon_value(float("nan")) == "NaN"

    def test_float_grain_is_6_decimals(self):
        # differences below the 5e-7 grain canonicalize identically;
        # differences above it do not
        assert canon_value(0.1234567) == canon_value(0.12345674)
        assert canon_value(0.123456) != canon_value(0.123466)

    def test_nested_lists(self):
        assert canon_value([1, [2.0, None]]) == "[1,[2.000000,NULL]]"


class TestCanonHash:
    COLS = ["b", "a"]
    ROWS = [(1, "x"), (2, "y"), (3, None)]

    def test_row_order_insensitive(self):
        assert canon_hash(self.COLS, self.ROWS) == canon_hash(
            self.COLS, list(reversed(self.ROWS))
        )

    def test_column_order_insensitive(self):
        # (b, a) columns vs (a, b) columns with values swapped per row
        swapped = [(r[1], r[0]) for r in self.ROWS]
        assert canon_hash(["b", "a"], self.ROWS) == canon_hash(
            ["a", "b"], swapped
        )

    def test_value_change_detected(self):
        tampered = [(1, "x"), (2, "y"), (4, None)]
        assert canon_hash(self.COLS, self.ROWS) != canon_hash(
            self.COLS, tampered
        )

    def test_null_vs_string_null_detected(self):
        assert canon_hash(["a"], [(None,)]) != canon_hash(["a"], [("NULL2",)])

    def test_missing_row_detected(self):
        assert canon_hash(self.COLS, self.ROWS) != canon_hash(
            self.COLS, self.ROWS[:-1]
        )

    def test_duplicate_multiplicity_detected(self):
        # bag semantics: a duplicated row must change the hash
        assert canon_hash(["a"], [(1,), (2,)]) != canon_hash(
            ["a"], [(1,), (1,), (2,)]
        )

    def test_float_below_grain_matches(self):
        assert canon_hash(["a"], [(0.1234567,)]) == canon_hash(
            ["a"], [(0.12345674,)]
        )


@pytest.mark.oracle_sweep
def test_full_oracle_sweep_sf0001(spark):
    """Insurance for the off-panel queries: the driver's correctness
    gate replays a FIXED 50-name panel every round, so a regression in
    any of the other ~107 registered queries would only surface at
    judge time. This runs the complete Spark-vs-DuckDB sweep (row count
    + columns + canonical value hash per query) at sf0.001 inside
    pytest — any oracle break fails CI immediately."""
    from check_oracles import run_sweep

    total, failures = run_sweep(spark, "/root/testdata/sf0.001", quiet=True)
    assert total >= 157, f"registry shrank: {total}"
    assert not failures, failures


@pytest.mark.oracle_sweep
@pytest.mark.skipif(
    not __import__("os").environ.get("EVENT_STREAMER_SF01_SWEEP"),
    reason="bench-SF sweep (~7 min) — set EVENT_STREAMER_SF01_SWEEP=1; "
    "the per-round artifact ORACLES_sf0.1_r<N>.json records the same run",
)
def test_full_oracle_sweep_sf01(spark):
    """VERDICT r8 #4: the full-registry sweep at the BENCH scale factor
    (sf0.1), gated because it costs ~7 minutes — the driver records it
    per round as ORACLES_sf0.1_r<N>.json via
    ``check_oracles.py --out``; this test is the local way to reproduce
    that artifact's 246+/0 claim."""
    from check_oracles import run_sweep

    total, failures = run_sweep(spark, "/root/testdata/sf0.1", quiet=True)
    assert total >= 246, f"registry shrank: {total}"
    assert not failures, failures


def test_materialize_multiref_ctes_contract():
    """r13: the registration-time oracle normalizer materializes only
    top-level multi-referenced WITH CTEs — WINDOW clause definitions
    (same ``name AS (`` shape, MATERIALIZED is a syntax error there),
    single-reference CTEs, and nested subqueries stay untouched; the
    rewrite is idempotent."""
    from event_streamer_spark.operators.registry import (
        materialize_multiref_ctes as mat,
    )

    # multi-ref CTE -> materialized; single-ref stays
    s = mat(
        "WITH a AS (SELECT 1 AS x), b AS (SELECT x FROM a) "
        "SELECT * FROM a JOIN b USING (x)"
    )
    assert "a AS MATERIALIZED (" in s
    assert "b AS MATERIALIZED" not in s
    # WINDOW clause untouched even when the window name repeats
    w = (
        "SELECT SUM(x) OVER w, AVG(x) OVER w FROM t "
        "WINDOW w AS (PARTITION BY k ORDER BY x)"
    )
    assert mat(w) == w
    # WITH + WINDOW combined: CTE rewritten, window definition not
    c = mat(
        "WITH base AS (SELECT k, x FROM t) "
        "SELECT SUM(x) OVER w FROM base JOIN base b2 USING (k) "
        "WINDOW w AS (PARTITION BY k)"
    )
    assert "base AS MATERIALIZED (" in c
    assert "w AS (PARTITION BY k)" in c
    # nested balanced parens in the body survive; idempotent
    n = (
        "WITH a AS (SELECT (1 + (2 * 3)) AS x), "
        "c AS (SELECT x FROM a WHERE x IN (SELECT x FROM a)) "
        "SELECT * FROM c"
    )
    out = mat(n)
    assert "a AS MATERIALIZED (SELECT (1 + (2 * 3))" in out
    assert mat(out) == out
    # no WITH -> unchanged
    assert mat("SELECT 1") == "SELECT 1"
