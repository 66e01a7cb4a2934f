"""Growth-analytics readout over a snapshot — every stage a registered
operator from the round-8 session-4 families:

  RFM segmentation → market-basket rules → funnel latency →
  A/B CUPED readout → seasonal anomalies → revenue trend →
  skyline offers → collocations

    python examples/growth_analytics_demo.py [sf_dir]
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
    spark = get_spark("growth-demo")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str):
        return REGISTRY[name].fn(spark, SF)

    # 1. who are the customers? RFM value cube, best segment first
    rfm = run("b72_rfm_segments").orderBy(
        F.desc("r_score"), F.desc("f_score"), F.desc("m_score")
    )
    top = rfm.first()
    print(
        f"RFM: {rfm.count()} segments; best "
        f"R{top['r_score']}F{top['f_score']}M{top['m_score']} has "
        f"{top['n_customers']} customers, "
        f"${top['monetary_c_total'] / 100:,.0f} lifetime"
    )

    # 2. what do they buy together? strongest lift rules
    rules = run("d19_assoc_rules")
    best = rules.orderBy(F.desc("lift_ppm"), "antecedent").first()
    print(
        f"basket: {rules.count()} rules; strongest lift "
        f"{best['lift_ppm'] / 1e6:.1f}x for part {best['antecedent']} "
        f"-> {best['consequent']} (support {best['support']})"
    )

    # 3. how fast do signups convert?
    lat = run("b74_funnel_latency").first()
    print(
        f"funnel: {lat['n_converted']} conversions; median "
        f"{lat['p50_s'] / 3600:.1f}h, p90 {lat['p90_s'] / 3600:.1f}h"
    )

    # 4. did the experiment work? CUPED-adjusted readout
    ab = {r["variant"]: r for r in run("d14_ab_cuped").collect()}
    delta = (
        ab[1]["mean_y_adj_micro"] - ab[0]["mean_y_adj_micro"]
    ) / 1e6
    print(
        f"a/b: control {ab[0]['conv_rate_ppm'] / 1e4:.1f}% vs treatment "
        f"{ab[1]['conv_rate_ppm'] / 1e4:.1f}% conversion; "
        f"CUPED-adjusted spend delta {delta / 100:+,.2f} USD/user"
    )

    # 5. anything weird lately? seasonal anomalies + trend
    anom = run("d15_seasonal_dow").filter(F.col("is_anomaly") == 1)
    print(f"seasonal: {anom.count()} weekday-adjusted anomalous days")
    for r in run("d15_trend_ols").orderBy("r_name").collect():
        print(
            f"  trend {r['r_name']:<12} "
            f"{r['slope_micro_per_day'] / 1e6:+.2f} cents/day "
            f"over {r['n_days']} days"
        )

    # 6. which catalog items are unbeatable on (price, size)?
    sky = run("b71_skyline").collect()
    print(
        "skyline offers: "
        + ", ".join(
            f"part {r['p_partkey']} (size {r['p_size']}, "
            f"${r['price_c'] / 100:,.2f})"
            for r in sorted(sky, key=lambda r: r["p_size"])[:4]
        )
    )

    # 7. what phrases define the corpus? top PMI collocations
    pmi = run("d4_pmi_collocations")
    coll = pmi.orderBy(F.desc("pmi_ratio_ppm"), "prev", "tok").limit(3)
    print(
        "collocations: "
        + ", ".join(
            f"'{r['prev']} {r['tok']}' ({r['pmi_ratio_ppm'] / 1e6:.0f}x "
            f"chance)"
            for r in coll.collect()
        )
    )


if __name__ == "__main__":
    main()
