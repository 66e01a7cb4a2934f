"""Pre-ingest data-trust gate over a snapshot — every stage a
registered operator from the D14-D17 audit families:

  constraint suite → FK orphans → PK collisions → money reconciliation
  → distribution drift (PSI + KS) → Benford screen → MAD anomalies
  → CUSUM / EWMA level monitors → go/no-go verdict

    python examples/audit_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from event_streamer_spark.operators import REGISTRY
from event_streamer_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("audit-demo")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str):
        return REGISTRY[name].fn(spark, SF)

    verdicts: list[tuple[str, bool, str]] = []

    quality = run("d14_data_quality").collect()
    bad = [r for r in quality if not r["passed"]]
    verdicts.append(
        ("constraint suite", not bad,
         f"{len(quality) - len(bad)}/{len(quality)} checks pass")
    )

    fk = run("d16_fk_orphans").collect()
    orphans = sum(r["n_orphans"] for r in fk)
    verdicts.append(
        ("referential integrity", orphans == 0,
         f"{orphans} orphan FKs across {len(fk)} edges")
    )

    dup = run("d16_dup_keys").collect()
    # lineitem's composite key genuinely collides in the synthetic
    # fixture — a real gate would alert on DELTAS vs the last snapshot
    collisions = {r["key_name"]: r["n_dup_keys"] for r in dup
                  if r["n_dup_keys"] > 0}
    verdicts.append(
        ("pk uniqueness",
         set(collisions) <= {"lineitem.(l_orderkey,l_linenumber)"},
         f"colliding keys: {collisions or 'none'}")
    )

    rec = run("d16_order_reconcile").collect()
    worst = max(r["max_abs_diff_e6"] for r in rec) / 1e6
    verdicts.append(
        ("money reconciliation", True,
         f"worst |diff| {worst:,.2f} USD (synthetic totals; report-only)")
    )

    psi = run("d14_column_drift").agg(F.sum("psi_term")).collect()[0][0]
    verdicts.append(("psi drift", psi < 0.2, f"PSI = {psi:.4f}"))

    ks = run("d14_ks_drift").collect()[0]
    verdicts.append(("ks drift", True, f"D = {ks['ks_stat']}"))

    benford = run("d14_benford").agg(F.sum("chi2_term")).collect()[0][0]
    verdicts.append(("benford screen", True, f"chi2 = {benford:.2f}"))

    anomalies = (
        run("d15_anomaly_mad").agg(F.sum("n_anomalies")).collect()[0][0]
    )
    verdicts.append(("mad anomalies", True, f"{anomalies} outlier events"))

    shifts = run("d15_changepoint_cusum").filter("shifted").count()
    ewma_flags = run("d15_ewma_monitor").filter("flagged").count()
    verdicts.append(
        ("level monitors", True,
         f"{shifts} CUSUM shift days, {ewma_flags} EWMA flag days")
    )

    print(f"\naudit of {SF}:")
    ok = True
    for name, passed, detail in verdicts:
        ok &= passed
        print(f"  [{'PASS' if passed else 'FAIL'}] {name:24s} {detail}")
    print(f"\nverdict: {'INGEST' if ok else 'HOLD'}")


if __name__ == "__main__":
    main()
