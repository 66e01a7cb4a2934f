"""Capture .explain("formatted") for every headline query.

Usage::

    python scripts/capture_plans.py <outdir> [suffix] [name ...]

Writes ``<outdir>/<query>_<suffix>.txt`` (suffix defaults to "before")
for each headline query (or the explicit name list). Also appends a
one-line plan-shape digest (exchange count, join strategies, python
eval nodes) to ``<outdir>/_digest_<suffix>.txt`` so plan diffs are
greppable.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streamer_spark.operators import REGISTRY  # noqa: E402
from event_streamer_spark.session import get_spark  # noqa: E402

from bench import HEADLINE  # noqa: E402


def plan_digest(plan: str) -> str:
    counts = {
        "Exchange": len(re.findall(r"\bExchange\b", plan)),
        "BroadcastExchange": len(re.findall(r"BroadcastExchange", plan)),
        "SortMergeJoin": len(re.findall(r"SortMergeJoin", plan)),
        "BroadcastHashJoin": len(re.findall(r"BroadcastHashJoin", plan)),
        "ShuffledHashJoin": len(re.findall(r"ShuffledHashJoin", plan)),
        "BatchEvalPython": len(re.findall(r"BatchEvalPython", plan)),
        "ArrowEvalPython": len(re.findall(r"ArrowEvalPython", plan)),
        "MapInPandas": len(re.findall(r"MapInPandas", plan)),
        "FlatMapGroupsInPandas": len(re.findall(r"FlatMapGroupsInPandas", plan)),
        "InMemoryTableScan": len(re.findall(r"InMemoryTableScan", plan)),
        "Scan parquet": len(re.findall(r"Scan parquet", plan)),
        "Window": len(re.findall(r"\bWindow\b", plan)),
        "TakeOrderedAndProject": len(re.findall(r"TakeOrderedAndProject", plan)),
    }
    return ", ".join(f"{k}={v}" for k, v in counts.items() if v)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    digest_lines = []
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        d = plan_digest(plan)
        digest_lines.append(f"{name}: {d}")
        print(f"{name}: {d}", flush=True)
    with open(os.path.join(outdir, f"_digest_{suffix}.txt"), "w") as f:
        f.write("\n".join(digest_lines) + "\n")


if __name__ == "__main__":
    main()
