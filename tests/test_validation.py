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
        # constraint logic is exercised through its SQL twin here)
        rows = {r["check_name"]: r for r in
                spark.sql(REGISTRY["d14_data_quality"].oracle).collect()}
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
