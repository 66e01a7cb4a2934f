"""Differential fuzz target (VERDICT r6 #1): seeded random §2.B-grammar
queries executed on BOTH Spark and DuckDB from the same SQL text.

The seed is fixed and logged in the assertion message so any failure is
reproducible with::

    python scripts/fuzz_oracles.py /root/testdata/sf0.001 --seed <seed> --only <i>

Rotate FUZZ_SEED when the grammar changes materially; any divergence a
seed finds must be fixed AND pinned as a named regression query in the
operator registry (the b13/engine-trap protocol).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from scripts.fuzz_oracles import run_fuzz  # noqa: E402

# rotated r8-ci → r9-ci: the window-frame grammar grew the timestamp
# INTERVAL RANGE sub-shape (same-unit bounds — the mixed-unit Spark
# rejection is pinned as b17_ts_range_frame)
FUZZ_SEED = "r9-ci"
FUZZ_N = 120


@pytest.mark.fuzz
def test_differential_fuzz(spark, sf_dir):
    total, failures = run_fuzz(
        spark, sf_dir, n=FUZZ_N, seed=FUZZ_SEED, quiet=True
    )
    assert total == FUZZ_N
    assert failures == [], (
        f"seed={FUZZ_SEED}; repro: python scripts/fuzz_oracles.py {sf_dir} "
        f"--seed {FUZZ_SEED} --only <i>; failures="
        + "; ".join(f"[{i}] {reason} SQL={sql}" for i, sql, reason in failures)
    )
