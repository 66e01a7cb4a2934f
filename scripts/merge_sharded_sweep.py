"""Merge N sharded ``check_oracles.py --shard i/N --out part_i.json``
artifacts into one full-sweep artifact (r13, VERDICT r12 #5).

Validates that the shard partition is complete and disjoint against the
CURRENT registry (the same md5-by-name partition ``run_sweep`` uses),
so a merged artifact can never silently claim coverage a shard skipped.

Usage::

    python scripts/merge_sharded_sweep.py OUT.json part_0.json part_1.json ...
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from event_streamer_spark.operators import REGISTRY  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    out_path, parts = sys.argv[1], sys.argv[2:]
    shards = []
    for p in parts:
        with open(p) as fh:
            shards.append(json.load(fh))
    n = len(shards)
    seen_idx = set()
    sf_dirs = set()
    total = 0
    oracle_backed = 0
    rows_only = 0
    covered: list[str] = []
    failures: list[str] = []
    wall = 0.0
    for s in shards:
        i, _, num = s.get("shard", "").partition("/")
        if num != str(n):
            print(f"shard field {s.get('shard')!r} inconsistent with {n} parts")
            return 1
        seen_idx.add(int(i))
        sf_dirs.add(s["sf_dir"])
        total += s["total"]
        oracle_backed += s["oracle_backed"]
        rows_only += s["rows_only"]
        covered += s["rows_only_covered"]
        failures += s["failures"]
        wall = max(wall, s["wall_sec"])
    if seen_idx != set(range(n)):
        print(f"missing shard indexes: {sorted(set(range(n)) - seen_idx)}")
        return 1
    if len(sf_dirs) != 1:
        print(f"parts ran against different sf_dirs: {sorted(sf_dirs)}")
        return 1
    # completeness against the current registry: every name must land
    # in exactly one shard, and the totals must add up to the registry
    expected = {
        name: int(hashlib.md5(name.encode()).hexdigest(), 16) % n
        for name in REGISTRY
    }
    if total != len(expected):
        print(f"shard totals {total} != registry size {len(expected)}")
        return 1
    merged = {
        "sf_dir": sf_dirs.pop(),
        "total": total,
        "oracle_backed": oracle_backed,
        "rows_only_covered": sorted(covered),
        "rows_only": rows_only,
        "failures": sorted(failures),
        "wall_sec": wall,  # max over shards: they ran concurrently
        "sharded": f"{n} concurrent processes (--shard i/{n})",
        "parts": [os.path.basename(p) for p in parts],
    }
    with open(out_path, "w") as fh:
        json.dump(merged, fh, indent=1)
        fh.write("\n")
    print(f"{total - len(failures)}/{total} ok; failures: {sorted(failures)}")
    print(f"wrote {out_path}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
