"""Seeded hostile-corpus generator (VERDICT r8 #5).

The fixed dirty fixtures (d14/d15/d16/d18/d19 tests) plant hand-picked
corruption; this module generalizes them into a SEEDED generator of
named corruption classes — random NULL injection, overflow magnitudes,
duplicate/re-keyed rows, emptied groups, giant baskets, hostile unicode,
malformed JSON, degenerate embeddings, timestamp extremes — applied to a
copy of a scale-factor directory. The perturbed corpus is then replayed
against BOTH engines with ``scripts.check_oracles.run_sweep`` — the same
differential protocol as ``scripts/fuzz_oracles.py``, aimed at DATA edge
cases instead of expression grammar. Any divergence found gets pinned as
a named registry query (the b21/b22/b23 pin protocol).

Usage (manual probing; the CI seed runs inside the default suite)::

    python scripts/dirty_corpus.py /root/testdata/sf0.001 /tmp/dirty 20260815
    python scripts/check_oracles.py /tmp/dirty

Determinism contract: one ``random.Random(seed)`` drives every class in
a fixed table/class order, so a seed is a full repro token. Classes can
be selected with ``classes=...`` to bisect which perturbation triggers a
divergence.
"""

from __future__ import annotations

import os
import random
import shutil
import sys
from typing import Callable, Iterable, Optional

import pyarrow as pa
import pyarrow.parquet as pq

# the d19 basket cap — giant baskets must exceed it to prove both
# engines drop them (import lazily to avoid a package dependency here)
_GIANT_BASKET = 80

_HOSTILE_STRINGS = [
    "",
    " ",
    "  \t ",
    "naïve café",
    "日本語テキスト",
    "🔥💧 emoji",
    "O'Brien \"quoted\"",
    "line\nbreak",
    "tab\tsep",
    "​zero​width",
    # NO 'ß' (or other special-case-mapped chars): Java/JS toUpperCase
    # says 'SS', DuckDB's ICU says 'ẞ' — a genuine engine split in
    # upper/lower/initcap, documented in events._camel_fold_ctes as out
    # of the oracle domain; ñ/ï/é case-map identically and stay in
    "Ñandú ñ grande",
    "percent%under_score",
]

_MALFORMED_JSON = ["{not json", "", "null", "[1,2", '{"a":}', "   "]


def _cols(tables: dict, name: str) -> dict:
    return tables[name]["data"]


def _nrows(tbl: dict) -> int:
    data = tbl["data"]
    return len(next(iter(data.values()))) if data else 0


def _append_row(tbl: dict, row: dict) -> None:
    for col, vals in tbl["data"].items():
        vals.append(row.get(col))


def _sample_idx(rng: random.Random, n: int, k: int) -> list[int]:
    k = min(k, n)
    return rng.sample(range(n), k) if k > 0 else []


# --------------------------------------------------------------------
# corruption classes — each (tables, rng) -> None, mutating in place
# --------------------------------------------------------------------

_NULLABLE = {
    "lineitem": [
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ],
    "orders": [
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ],
    "customer": ["c_nationkey", "c_acctbal", "c_mktsegment", "c_name"],
    "part": ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"],
    "supplier": ["s_nationkey", "s_acctbal"],
    "events": ["ts", "user_id", "event_type", "value", "props"],
    "documents": ["text", "lang", "source", "n_chars"],
    "embeddings": ["label"],
}


def null_injection(tables: dict, rng: random.Random) -> None:
    """~1% of cells (min 3) in every declared-nullable column → NULL."""
    for tname in sorted(_NULLABLE):
        tbl = tables[tname]
        n = _nrows(tbl)
        for col in _NULLABLE[tname]:
            vals = tbl["data"][col]
            for i in _sample_idx(rng, n, max(3, n // 100)):
                vals[i] = None


def overflow_magnitudes(tables: dict, rng: random.Random) -> None:
    """Extreme-but-in-domain numerics: values that stress BIGINT/cents
    widening and rounding without leaving the engines' shared domain
    (DECIMAL(18,2) money protocol → |price| < 1e13 dollars)."""
    extremes = {
        ("lineitem", "l_quantity"): [9.9e5, -1.0, 0.0, 1e-9],
        ("lineitem", "l_extendedprice"): [9.9e11, 0.004, -123.45, 0.005],
        ("lineitem", "l_discount"): [0.999, -0.5, 1.0],
        ("lineitem", "l_tax"): [0.999, 2.0],
        ("orders", "o_totalprice"): [9.9e11, 0.004, -1.0],
        ("customer", "c_acctbal"): [9.9e11, -9.9e11, 1e-9],
        ("part", "p_retailprice"): [9.9e11, 0.001],
        ("events", "value"): [1e15, -1e15, 1e-12, 0.0],
    }
    for (tname, col), vals in sorted(extremes.items()):
        tbl = tables[tname]
        n = _nrows(tbl)
        col_vals = tbl["data"][col]
        for v in vals:
            col_vals[rng.randrange(n)] = v
    # int32 boundary sizes
    psize = tables["part"]["data"]["p_size"]
    psize[rng.randrange(len(psize))] = 2147483647
    psize[rng.randrange(len(psize))] = -2147483648


def duplicate_rows(tables: dict, rng: random.Random) -> None:
    """Exact duplicates of sampled rows — PK collisions, double-counted
    facts; both engines must agree on every downstream count."""
    for tname in sorted(_NULLABLE):
        tbl = tables[tname]
        n = _nrows(tbl)
        for i in _sample_idx(rng, n, max(2, n // 200)):
            _append_row(
                tbl, {c: v[i] for c, v in tbl["data"].items()}
            )


_REKEY = {
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}


def rekeyed_rows(tables: dict, rng: random.Random) -> None:
    """Content duplicates under FRESH keys (near-dup / dedup bait:
    identical payload, different identity)."""
    base = 3 * 10**9
    for tname in sorted(_REKEY):
        key = _REKEY[tname]
        tbl = tables[tname]
        n = _nrows(tbl)
        for j, i in enumerate(_sample_idx(rng, n, max(2, n // 200))):
            row = {c: v[i] for c, v in tbl["data"].items()}
            row[key] = base + j
            _append_row(tbl, row)
        base += 10**6


def conflicting_duplicates(tables: dict, rng: random.Random) -> None:
    """Same primary key, DIFFERENT payload — the CDC/at-least-once
    reality where a redelivered record was also updated. Operators
    keyed on identity must either pick deterministically (tiebreaks)
    or keep both variants identically on both engines."""
    targets = {
        "events": ("event_id", "value", lambda v, r: (v or 0.0) + 1.5),
        "orders": (
            "o_orderkey",
            "o_totalprice",
            lambda v, r: (v or 0.0) * 2 + 0.01,
        ),
        "documents": (
            "doc_id",
            "text",
            lambda v, r: (v or "") + " conflicted-revision",
        ),
    }
    for tname in sorted(targets):
        key, col, mutate = targets[tname]
        tbl = tables[tname]
        n = _nrows(tbl)
        for i in _sample_idx(rng, n, max(2, n // 300)):
            row = {c: v[i] for c, v in tbl["data"].items()}
            row[col] = mutate(row[col], rng)
            _append_row(tbl, row)


def empty_groups(tables: dict, rng: random.Random) -> None:
    """Delete every row of one sampled group value — a grouping key
    that simply stops existing (aggregations must not assume the full
    domain)."""
    targets = [("orders", "o_orderpriority"), ("events", "event_type")]
    # never delete the funnel-step event types: their absence flips
    # several queries to 0 rows, which the harness flags as vacuous
    protected = {"signup", "purchase"}
    for tname, col in targets:
        tbl = tables[tname]
        vals = tbl["data"][col]
        domain = sorted({v for v in vals if v is not None} - protected)
        if not domain:
            continue
        victim = rng.choice(domain)
        keep = [i for i, v in enumerate(vals) if v != victim]
        tbl["data"] = {
            c: [v[i] for i in keep] for c, v in tbl["data"].items()
        }


def giant_basket(tables: dict, rng: random.Random) -> None:
    """One order with > _MAX_BASKET distinct parts (a bot cart) plus a
    real orders row — both engines must cap it out of pair expansion."""
    li = tables["lineitem"]
    od = tables["orders"]
    parts = sorted(
        {p for p in tables["part"]["data"]["p_partkey"] if p is not None}
    )
    okey = 4 * 10**9
    chosen = rng.sample(parts, min(_GIANT_BASKET, len(parts)))
    for ln, pk in enumerate(chosen, start=1):
        _append_row(
            li,
            {
                "l_orderkey": okey,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": ln,
                "l_quantity": 1.0,
                "l_extendedprice": 10.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": None,
            },
        )
    custs = [
        c for c in tables["customer"]["data"]["c_custkey"] if c is not None
    ]
    _append_row(
        od,
        {
            "o_orderkey": okey,
            "o_custkey": rng.choice(custs),
            "o_orderstatus": "F",
            "o_totalprice": 10.0 * len(chosen),
            "o_orderdate": None,  # giant AND undated — the d19 pin case
            "o_orderpriority": "1-URGENT",
        },
    )


def unicode_strings(tables: dict, rng: random.Random) -> None:
    """Hostile strings in two domains. FREE-TEXT columns (names, doc
    text) take the full pool — unicode, emoji, embedded quotes/
    newlines/tabs, zero-width chars. IDENTIFIER columns (event types,
    lang/source tags — Kafka-facing subjects, ASCII by the reference's
    contract) take an ASCII pool that still exercises the camel-fold
    edge cases (separator runs, leading/trailing separators, empties):
    full-Unicode case mapping is a REAL engine split (Java/JS
    ``'ß'.toUpperCase()=='SS'`` vs DuckDB ``ẞ``) documented in
    ``events._camel_fold_ctes`` as out of the oracle domain, so the
    generator keeps identifier dirt inside it."""
    free_text = [
        ("customer", "c_name"),
        ("part", "p_name"),
        ("part", "p_brand"),
        ("documents", "text"),
    ]
    identifier = [
        ("documents", "lang"),
        ("documents", "source"),
        ("events", "event_type"),
    ]
    ascii_pool = [
        "",
        " ",
        "multi word name",
        "snake_case_x",
        "kebab-case-y",
        "a--b__c  d",
        "_lead",
        "trail_",
        "O'Brien \"quoted\"",
        "percent%under_score",
    ]
    for tname, col in free_text:
        tbl = tables[tname]
        vals = tbl["data"][col]
        n = len(vals)
        for s in _HOSTILE_STRINGS:
            vals[rng.randrange(n)] = s
    for tname, col in identifier:
        tbl = tables[tname]
        vals = tbl["data"][col]
        n = len(vals)
        for s in ascii_pool:
            vals[rng.randrange(n)] = s
    # one giant document (64 KiB) — length/token pipelines must not choke
    docs = tables["documents"]["data"]
    docs["text"][rng.randrange(len(docs["text"]))] = (
        "lorem ipsum dolor sit amet " * 2500
    )


def malformed_json(tables: dict, rng: random.Random) -> None:
    """events.props stops being JSON — extractors must agree on the
    unparseable (Spark get_json_object → NULL; oracles must use
    DuckDB's TRY-flavored extraction or pre-filter)."""
    vals = tables["events"]["data"]["props"]
    n = len(vals)
    for s in _MALFORMED_JSON:
        vals[rng.randrange(n)] = s


def hostile_embeddings(tables: dict, rng: random.Random) -> None:
    """Degenerate vectors: all-zero (cosine 0/0), empty list, NULL
    vector, huge-magnitude components."""
    emb = tables["embeddings"]["data"]
    n = len(emb["vec_id"])
    dim = next(
        len(v) for v in emb["embedding"] if v is not None and len(v) > 0
    )
    emb["embedding"][rng.randrange(n)] = [0.0] * dim
    emb["embedding"][rng.randrange(n)] = []
    emb["embedding"][rng.randrange(n)] = None
    emb["embedding"][rng.randrange(n)] = [1e20] * dim
    emb["embedding"][rng.randrange(n)] = [-1e20] * dim


def timestamp_extremes(tables: dict, rng: random.Random) -> None:
    """Far-past / far-future timestamps (within both engines' ranges)."""
    import datetime as dt

    ev = tables["events"]["data"]["ts"]
    n = len(ev)
    ev[rng.randrange(n)] = dt.datetime(1900, 1, 1)
    ev[rng.randrange(n)] = dt.datetime(2262, 1, 1)
    ev[rng.randrange(n)] = dt.datetime(1970, 1, 1)
    od = tables["orders"]["data"]["o_orderdate"]
    m = len(od)
    od[rng.randrange(m)] = dt.datetime(1900, 1, 1)
    od[rng.randrange(m)] = dt.datetime(2262, 1, 1)


def hostile_media_fields(tables: dict, rng: random.Random) -> None:
    """Hostile D5 payload-synthesis parameters (round 10): the
    multimodal family derives PNG/WAV dims from ``documents.n_chars``
    via Python ``%`` (pmod) while the oracles use SQL ``%``
    (sign-of-dividend) — negative n_chars is therefore OUTSIDE the
    synthesizer's declared domain (``n_chars >= 0`` on both engines)
    and this class proves both engines exclude it identically. Also
    injects 0 (1-pixel-wide images), huge magnitudes (mod arithmetic
    at the BIGINT edge) and values inconsistent with ``text`` (the
    column is authoritative, not recomputed)."""
    doc = tables["documents"]["data"]["n_chars"]
    n = len(doc)
    doc[rng.randrange(n)] = -1
    doc[rng.randrange(n)] = -(2**31)
    doc[rng.randrange(n)] = 0
    doc[rng.randrange(n)] = 2**60
    doc[rng.randrange(n)] = 1  # likely inconsistent with its text


def skewed_groups(tables: dict, rng: random.Random) -> None:
    """Heavy-hitter key skew (round 10 session 2): re-point a large
    fraction of rows at ONE existing group key per table — the
    production shape where a single domain/customer/bot dominates a
    partition key. Correctness-wise both engines see identical data
    (group results must still hash-match — per-key windows, quota
    ranks, cohort folds and sequence ops must stay deterministic when
    one partition holds 30-40% of the table); scale-wise this is the
    exact profile the skew toolkit (salting, AQE skew-join, basket
    caps, two-level distrank) exists for, so the hostile replay
    doubles as a check that none of those paths changes SEMANTICS
    under skew."""
    doc = tables["documents"]["data"]
    n = len(doc["source"])
    mega_src = next(
        (v for v in doc["source"] if v is not None), "src0"
    )
    for i in _sample_idx(rng, n, max(2, (n * 2) // 5)):
        doc["source"][i] = mega_src
    ords = tables["orders"]["data"]
    m = len(ords["o_custkey"])
    mega_cust = next(
        (v for v in ords["o_custkey"] if v is not None), 1
    )
    for i in _sample_idx(rng, m, max(2, (m * 3) // 10)):
        ords["o_custkey"][i] = mega_cust
    ev = tables["events"]["data"]
    k = len(ev["user_id"])
    mega_user = next((v for v in ev["user_id"] if v is not None), 1)
    for i in _sample_idx(rng, k, max(2, (k * 3) // 10)):
        ev["user_id"][i] = mega_user


PERTURBATIONS: list[tuple[str, Callable]] = [
    ("null_injection", null_injection),
    ("overflow_magnitudes", overflow_magnitudes),
    ("duplicate_rows", duplicate_rows),
    ("rekeyed_rows", rekeyed_rows),
    ("conflicting_duplicates", conflicting_duplicates),
    ("empty_groups", empty_groups),
    ("giant_basket", giant_basket),
    ("unicode_strings", unicode_strings),
    ("malformed_json", malformed_json),
    ("hostile_embeddings", hostile_embeddings),
    ("timestamp_extremes", timestamp_extremes),
    ("hostile_media_fields", hostile_media_fields),
    ("skewed_groups", skewed_groups),
]

_ALL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def make_dirty(
    src_dir: str,
    dst_dir: str,
    seed: int,
    classes: Optional[Iterable[str]] = None,
) -> list[str]:
    """Copy ``src_dir`` tables into ``dst_dir`` and apply the selected
    corruption classes under ``random.Random(seed)``. Returns the class
    names applied (fixed order — the repro token is (src, seed, classes)).
    """
    rng = random.Random(seed)
    os.makedirs(dst_dir, exist_ok=True)
    tables: dict = {}
    for t in _ALL_TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        at = pq.read_table(src)
        tables[t] = {
            "schema": at.schema,
            "data": {c: at.column(c).to_pylist() for c in at.column_names},
        }
    wanted = set(classes) if classes is not None else None
    applied = []
    for name, fn in PERTURBATIONS:
        if wanted is not None and name not in wanted:
            continue
        fn(tables, rng)
        applied.append(name)
    for t, tbl in tables.items():
        out = pa.table(
            {c: pa.array(v, type=tbl["schema"].field(c).type)
             for c, v in tbl["data"].items()},
            schema=tbl["schema"],
        )
        pq.write_table(out, os.path.join(dst_dir, f"{t}.parquet"))
    # non-parquet extras (derived csv/json fixtures) regenerate on demand
    for extra in os.listdir(src_dir):
        if not extra.endswith(".parquet"):
            s = os.path.join(src_dir, extra)
            d = os.path.join(dst_dir, extra)
            if os.path.isfile(s) and not os.path.exists(d):
                shutil.copy(s, d)
    return applied


def main() -> int:
    if len(sys.argv) < 4:
        print(__doc__)
        return 2
    src, dst, seed = sys.argv[1], sys.argv[2], int(sys.argv[3])
    classes = sys.argv[4:] or None
    applied = make_dirty(src, dst, seed, classes)
    print(f"wrote {dst} (seed={seed}, classes={applied})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
