"""Local replica of the driver's correctness gate.

Runs every REGISTRY query on Spark and its oracle on DuckDB, then
compares row count, column names, and an order-insensitive canonical
value hash (columns sorted by name; floats formatted to 6 decimals;
NULL literal for nulls). Usage::

    python scripts/check_oracles.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
from datetime import date, datetime

import duckdb

sys.path.insert(0, ".")

from event_streamer_spark.operators import REGISTRY  # noqa: E402
from event_streamer_spark.session import get_spark  # noqa: E402
from event_streamer_spark.tables import TABLES  # noqa: E402


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    return str(v)


def canon_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_value(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def run_sweep(
    spark,
    sf_dir: str,
    name_filters: list[str] | None = None,
    quiet: bool = False,
    exact_names: list[str] | None = None,
    shard: tuple[int, int] | None = None,
) -> tuple[int, list[str]]:
    """Run the full Spark-vs-DuckDB sweep; returns (total, failures).

    Reusable from pytest (tests/test_oracle_harness.py) so any oracle
    regression fails CI between driver rounds, not just this script.
    ``exact_names`` (r12) selects by exact registry name — used by
    ``--changed-since`` so substring matching can't widen the set.
    ``shard=(i, n)`` (r13, VERDICT #5) keeps only queries whose
    DETERMINISTIC name hash lands in shard i of n — a stable partition
    of the registry by name (md5, not Python ``hash()``, which is
    salted per process), so N processes each running one shard cover
    the full registry exactly once and the union of their artifacts
    equals the serial sweep.
    """
    name_filters = name_filters or []

    def in_shard(name: str) -> bool:
        if shard is None:
            return True
        i, n = shard
        digest = hashlib.md5(name.encode()).hexdigest()
        return int(digest, 16) % n == i

    def in_scope(name: str) -> bool:
        if not in_shard(name):
            return False
        if exact_names is not None and name not in exact_names:
            return False
        return not name_filters or any(f in name for f in name_filters)

    def say(msg: str) -> None:
        if not quiet:
            print(msg)

    con = duckdb.connect()
    # the canonical compare is ORDER-INSENSITIVE (rows sorted before
    # hashing), so DuckDB's default preserve_insertion_order buys
    # nothing and costs full materialization of giant join/aggregate
    # intermediates — at the sf1-dirty grain the d17_triangles oracle
    # exhausted ~80 GB of spill under it (r12); streaming execution
    # keeps the same results
    con.execute("SET preserve_insertion_order = false")
    # concurrent sharded sweeps (r13 #5): DuckDB's default memory limit
    # is ~80% of RAM PER PROCESS, so N shards would overcommit the box;
    # cap each shard's DuckDB explicitly when the launcher asks
    duck_mem = os.environ.get("EVENT_STREAMER_DUCKDB_MEM")
    if duck_mem:
        con.execute(f"SET memory_limit = '{duck_mem}'")
    # per-process spill dir (r13): DuckDB's default temp_directory is
    # CWD-relative ``.tmp`` — N concurrent shards in one repo checkout
    # deleted each other's spill files and two shards died with
    # IOException mid-sweep (observed on the first 4-way sf1-dirty
    # run). A pid-keyed dir under $TMPDIR also keeps spill out of the
    # repo tree entirely.
    spill = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), f"duckspill_{os.getpid()}"
    )
    os.makedirs(spill, exist_ok=True)
    con.execute(f"SET temp_directory = '{spill}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    for name, spec in sorted(REGISTRY.items()):
        if not in_scope(name):
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            say(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            cover = (
                f", bounded-check via {spec.covered_by}"
                if spec.covered_by else ""
            )
            say(f"ok*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s{cover})")
            if len(srows) == 0 and name not in ("d2_minhash_lsh",):
                say(f"      WARNING: zero rows")
            continue
        try:
            rel = con.sql(spec.oracle)
            ocols = rel.columns
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            say(f"FAIL  {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue

        problems = []
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"columns spark={scols} duckdb={ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if not problems:
            hs = canon_hash(scols, srows)
            ho = canon_hash(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a few differing rows for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                set_s = {
                    "\x1f".join(canon_value(r[i]) for i in order_s) for r in srows
                }
                set_o = {
                    "\x1f".join(canon_value(r[i]) for i in order_o) for r in orows
                }
                only_s = list(set_s - set_o)[:3]
                only_o = list(set_o - set_s)[:3]
                for x in only_s:
                    problems.append(f"  spark-only: {x!r}")
                for x in only_o:
                    problems.append(f"  duck-only:  {x!r}")
        if problems:
            say(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                say(f"      {p}")
            failures.append(name)
        else:
            say(f"PASS  {name} ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0:
                # an empty result matches an empty oracle no matter how
                # wrong the query logic is — flag vacuous passes loudly
                say("      WARNING: vacuous pass (0 rows on both engines)")

    say("")
    total = len([n for n in REGISTRY if in_scope(n)])
    say(f"{total - len(failures)}/{total} ok; failures: {failures}")
    return total, failures


def changed_query_names(rev: str) -> list[str]:
    """Registry names whose DEFINING module file changed since ``rev``
    (``git diff --name-only rev``, plus untracked files) — the
    targeted-sweep filter for between-gate iteration (VERDICT r11 #8).
    Conservative by construction: a query whose HELPER module changed
    but whose own module didn't is not selected, so the full sweep
    stays the round-close gate; this flag only shortens the inner loop.
    """
    import inspect
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # -z + NUL split (r13, ADVICE): whitespace splitting fragmented any
    # path containing a space, silently excluding its queries from the
    # targeted sweep — the opposite of conservative
    diff = subprocess.run(
        ["git", "diff", "--name-only", "-z", rev],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.split("\0")
    untracked = subprocess.run(
        ["git", "ls-files", "--others", "--exclude-standard", "-z"],
        cwd=repo, capture_output=True, text=True, check=True,
    ).stdout.split("\0")
    changed = {os.path.normpath(p) for p in diff + untracked if p}
    names = []
    for name, spec in REGISTRY.items():
        fn = getattr(spec.fn, "__wrapped__", spec.fn)
        try:
            src = os.path.relpath(inspect.getsourcefile(fn), repo)
        except (TypeError, ValueError):
            names.append(name)  # can't locate → stay conservative: run it
            continue
        if os.path.normpath(src) in changed:
            names.append(name)
    return sorted(names)


def main() -> int:
    """``--out PATH`` writes a machine-readable sweep artifact (VERDICT
    r8 #4: the per-round full-registry sweep at the bench SF is recorded
    as checked-in JSON, so regressions at sf0.1 diff between rounds
    instead of living only in COVERAGE prose).

    ``--changed-since REV`` restricts the sweep to queries whose
    defining source file changed since REV (plus untracked files) —
    the targeted between-gates sweep (VERDICT r11 #8). Combines with
    positional name filters (intersection). The FULL sweep remains the
    round-close gate.

    ``--shard i/N`` (r13, VERDICT #5) runs only the queries whose name
    hashes into shard i of N (0-based), so a full sweep can run as N
    concurrent processes: ``for i in 0..N-1: check_oracles.py SF --shard
    i/N --out part_i.json &``. The shard partition is deterministic by
    name, so the union of the N artifacts equals the serial sweep."""
    argv = sys.argv[1:]
    out_path = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    since_rev = None
    if "--changed-since" in argv:
        i = argv.index("--changed-since")
        since_rev = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    shard = None
    if "--shard" in argv:
        i = argv.index("--shard")
        si, _, sn = argv[i + 1].partition("/")
        shard = (int(si), int(sn))
        if not (0 <= shard[0] < shard[1]):
            print(f"bad --shard {argv[i + 1]!r}: want i/N with 0 <= i < N")
            return 2
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    name_filter = argv[1:]

    exact_names = None
    if since_rev is not None:
        changed = changed_query_names(since_rev)
        print(f"# --changed-since {since_rev}: {len(changed)} queries")
        if not changed:
            print("0/0 ok; failures: []")
            if out_path:
                _write_artifact(out_path, sf_dir, 0, [], 0.0, [], shard)
            return 0
        # exact-name filters: wrap so substring matching can't widen
        exact_names = [
            n for n in changed
            if not name_filter or any(f in n for f in name_filter)
        ]

    spark = get_spark("oracle-check", shuffle_partitions=8)
    t0 = time.time()
    total, failures = run_sweep(
        spark, sf_dir, name_filter, exact_names=exact_names, shard=shard
    )
    if out_path:
        # artifact on EVERY path (r13, ADVICE: the --changed-since
        # branch returned early and silently dropped --out)
        def in_scope(n: str) -> bool:
            if shard is not None:
                i, num = shard
                if int(hashlib.md5(n.encode()).hexdigest(), 16) % num != i:
                    return False
            if exact_names is not None and n not in exact_names:
                return False
            return not name_filter or any(f in n for f in name_filter)

        scoped = [s for n, s in REGISTRY.items() if in_scope(n)]
        _write_artifact(
            out_path, sf_dir, total, failures,
            round(time.time() - t0, 1), scoped, shard,
        )
    return 1 if failures else 0


def _write_artifact(
    out_path: str,
    sf_dir: str,
    total: int,
    failures: list[str],
    wall_sec: float,
    scoped_specs: list,
    shard: tuple[int, int] | None,
) -> None:
    import json

    n_oracle = sum(1 for s in scoped_specs if s.oracle is not None)
    covered = sorted(
        s.name for s in scoped_specs if s.oracle is None and s.covered_by
    )
    payload = {
        "sf_dir": sf_dir,
        "total": total,
        "oracle_backed": n_oracle,
        # oracle-less queries whose correctness is pinned by
        # a registered bounded-check twin (VERDICT r10 #2)
        "rows_only_covered": covered,
        "rows_only": total - n_oracle - len(covered),
        "failures": failures,
        "wall_sec": wall_sec,
    }
    if shard is not None:
        payload["shard"] = f"{shard[0]}/{shard[1]}"
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    sys.exit(main())
