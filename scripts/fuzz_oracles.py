"""Differential fuzzer: seeded random relational queries run on BOTH engines.

The fixed oracle corpus (check_oracles.py) can only catch divergences it
encodes — this project has already hit two engine-semantics traps
(DuckDB rounds double→bigint casts where Spark truncates; Spark's
``sequence(1, 0)`` descends) purely by luck. This fuzzer generates random
queries from the SURVEY §2.B grammar — projections, 3VL filters,
join type × key, aggregation, window, set ops, subqueries, order+limit —
as ONE portable SQL string executed verbatim by Spark (temp views from
``tables.load``) and DuckDB (parquet views), then compares row count,
columns, and the same canonical value hash ``check_oracles`` uses.

Determinism rules baked into the generator (each is a REAL engine
difference the grammar must not trip over, verified here once so the
174-query corpus doesn't have to re-learn them):

- money doubles are aggregated as integer cents
  (``CAST(ROUND(x*100) AS BIGINT)``) — raw double SUMs are
  order-dependent; cents sums stay < 2^53 so even a double accumulator
  is exact.  Raw doubles may be projected/compared (same parquet bits,
  same IEEE row-local arithmetic on both engines).
- no ``/`` anywhere (Spark int ``/`` → double vs DuckDB ``//`` tricks),
  no double→bigint CAST (round vs truncate), FLOOR instead.
- ORDER BY under LIMIT is always total (unique PK tiebreak) and always
  spells NULLS FIRST/LAST explicitly — Spark defaults ASC→NULLS FIRST
  while DuckDB defaults to NULLS LAST everywhere.
- string concat uses ``||`` (NULL-propagating on both), never CONCAT
  (DuckDB treats NULL as '' there).
- "date"-kind columns (o_orderdate, l_shipdate) enter only as
  ``CAST(col AS DATE)`` — their timestamp encodings differ per table
  (see ``tables.load``). ``events.ts`` ("ts" kind) is the exception:
  probed per-row hash-equal across engines at sf0.001 AND sf0.01
  (both truncate the parquet nanos to identical micros), so raw
  comparisons, BETWEEN, sampled TIMESTAMP literals, EXTRACT ints,
  MIN/MAX, COUNT DISTINCT, and ts+INTERVAL are emitted directly.
  Portable-spelling notes (round-8 probes): DuckDB
  ``DATE_TRUNC('day'|'month', ts)`` returns DATE while Spark returns
  TIMESTAMP — ``CAST(DATE_TRUNC(…) AS TIMESTAMP)`` is a no-op on
  Spark and fixes DuckDB (same text, both engines);
  ``EXTRACT(SECOND)`` is fractional DECIMAL(8,6) on Spark vs int on
  DuckDB — ``CAST(FLOOR(…) AS INT)`` aligns both; epoch seconds are
  dialect-mapped ``UNIX_TIMESTAMP`` ↔ ``CAST(FLOOR(EPOCH(…)) AS
  BIGINT)`` (EPOCH is a fractional double; positive-epoch data only),
  micros ``UNIX_MICROS`` ↔ ``EPOCH_US``, formats ``DATE_FORMAT``
  pattern letters ↔ ``STRFTIME`` percent codes (q_timestamp). The
  whole family is pinned by ``b22_timestamp_parity``.
- window ORDER BY is total within its partition (PK tiebreak) so
  rank/lag/sum-frames are deterministic.

Known divergences confirmed by direct probing (round 7) and excluded
from the grammar, each pinned by a named registry query showing the
portable recipe:

- ``CAST(double AS BIGINT)`` / ``TRY_CAST``: Spark truncates toward
  zero, DuckDB rounds half-away (-2.5 → -2 vs -3). Recipe: FLOOR (or
  TRUNC on the DuckDB side) before casting → ``b27_cast_trunc_double``.
- ``SIGN(double)``: Spark returns DOUBLE, DuckDB integer-typed — equal
  values, different canonical formatting. Recipe: explicit integer cast
  on both sides → ``b23_sign_bigint``.
- ``CAST(double AS DECIMAL(p,s))``: Spark rounds the SHORTEST DECIMAL
  REPRESENTATION of the double (2.675 → 2.68) while DuckDB rounds the
  true binary value (2.67499999…96 → 2.67). Recipe: never cast doubles
  to decimal in oracles; ``ROUND(x, s)`` agrees on both engines (it
  operates on the binary value in each).
- empty-input grand-total grouping set: see ``_known_divergence`` →
  ``b14_empty_grand_total``.
- ``EXTRACT(DOW ...)``: Spark is 1-based Sunday=1 (= ``dayofweek``),
  DuckDB/Postgres 0-based Sunday=0. Recipe: Spark ``dayofweek(d)`` ==
  DuckDB ``EXTRACT(DOW) + 1`` → ``b22_dow_parity``. DOY agrees.
- ``date + INTERVAL`` / ``DATE_TRUNC``: result is DATE on one engine,
  TIMESTAMP on the other — always wrap in ``CAST(... AS DATE)`` (the
  form the grammar emits). ``DATEDIFF`` signatures are incompatible
  (Spark wants an unquoted unit keyword); excluded.

Round-8 expression-library probe results (VERDICT r7 #1). Portable and
IN the grammar: TRIM/LTRIM/RTRIM, REPLACE, REVERSE, LPAD/RPAD
(non-empty pad; ``LPAD(s, n, '')`` returns s on Spark but ERRORS on
DuckDB), REPEAT, LEFT/RIGHT (non-negative n), SPLIT_PART (incl.
out-of-range → '' and absent-delimiter → whole string), ASCII, CHR,
INSTR, POSITION(x IN y), CONTAINS, TRANSLATE, CONCAT_WS (skips NULLs
on both), MD5, LIKE…ESCAPE, REGEXP_EXTRACT (group 0/1, '' on
no-match), JSON extraction values (missing key → NULL, object value →
compact JSON, both engines), ARRAY_CONTAINS / ARRAY_POSITION /
ARRAY_SORT (NULLS LAST both) / SLICE-equivalents on identical inputs.
NULL propagation through all of the above agrees.

Round-8 divergences (probed, excluded from portable clauses, each
pinned as a named registry query):

- ``LEFT(s, n)`` with n < 0: Spark returns '', DuckDB drops the last
  |n| chars. Recipe: ``CASE WHEN n < 0 THEN '' ELSE LEFT(s, n) END``
  → ``b21_left_neg_parity``.
- ``SUBSTR(s, 0, n)``: Spark clamps start 0 to 1 (n chars); DuckDB
  spends part of the length window before position 1 (n-1 chars).
  Negative starts agree. Recipe: ``GREATEST(start, 1)`` on the DuckDB
  side → ``b21_substr_zero_parity``.
- ``REGEXP_REPLACE``: Spark replaces ALL matches, DuckDB only the
  FIRST without the 'g' flag. Recipe: always pass 'g' on the DuckDB
  side → ``b21_regexp_replace_global`` (the dialect-mapped renderer
  below emits exactly that).
- ``arr[i]``: ZERO-based on Spark, ONE-based on DuckDB. Recipe: Spark
  ``arr[i]`` == DuckDB ``arr[i+1]``; Spark ``ELEMENT_AT`` (1-based)
  == DuckDB ``arr[i]`` → ``b24_array_index_base``.
- ``ARRAY_DISTINCT`` ordering: Spark keeps first-occurrence order,
  DuckDB hash order. Recipe: wrap in ``ARRAY_SORT`` before comparing
  → ``b24_array_distinct_order``.
- ``SPLIT_PART(s, d, 0)``: Spark raises INVALID_INDEX_OF_ZERO under
  ANSI, DuckDB returns ''. The grammar emits part >= 1 only.
- ``LATERAL``: Spark accepts bare ``JOIN LATERAL (subq)``; DuckDB
  requires a join keyword with an ON or the CROSS form. Recipe: emit
  ``JOIN LATERAL`` for Spark, ``CROSS JOIN LATERAL`` for DuckDB (same
  inner-join null semantics: childless outer rows drop on both) →
  ``b68_lateral_topn``.
- ``a ^ b``: bitwise XOR on Spark, POWER on DuckDB — different value
  AND type with no error on either side (5 ^ 2 → 7 vs 25.0), the worst
  divergence class. Recipe: Spark ``^`` == DuckDB ``XOR(a, b)`` →
  ``b23_xor_caret_parity``. ``&``, ``|``, ``<<``, ``>>``, ``%`` (incl.
  negative dividends), ``BIT_COUNT``, and ``MOD`` agree and ARE in the
  grammar, as are ABS / GREATEST / LEAST (both engines IGNORE NULL
  arguments — probed), and — BIGINT-only — integer division: DuckDB
  ``//`` over DECIMAL operands routes through DOUBLE (off-by-one at
  ~10^15 numerators, measured by d15_seasonal_dow's dirty fixture;
  use HUGEINT on the DuckDB side / DECIMAL ``DIV`` on Spark for wide
  integral division), ROUND over INTEGER-typed inputs (exact there;
  on DOUBLES the engines diverge at tie-adjacent quotients — Spark
  rounds the shortest decimal representation HALF_UP while DuckDB
  rounds a scaled double multiply, e.g. 13456305/3200 → 4205.095313
  vs 4205.095312 — so the grammar never emits ROUND over a double
  ratio; recipe ``b23_round_tie_parity``: keep ratios integer),
  POWER / SQRT / LN / EXP / LOG10 / LOG2 / FACTORIAL, and the date
  family DATE_ADD(d, n) / MAKE_DATE / DATE_PART / QUARTER /
  GREATEST-over-dates. Dialect-mapped: WEEKOFYEAR ↔ EXTRACT(WEEK),
  DATEDIFF(DAY, a, b) ↔ DATEDIFF('day', a, b), DATE_FORMAT(d,
  'EEEE') ↔ STRFTIME(d, '%A'). Excluded (missing on one engine or
  float-repr-divergent): XOR()/GCD/1-arg TRUNC on Spark;
  INITCAP/ADD_MONTHS/MONTHS_BETWEEN/UNIX_DATE on DuckDB; CBRT
  (3.0 vs 3.0000000000000004 — use POWER(x, 1.0/3) with ROUND).
  Negative-operand bitwise: ``&``/``|``/``>>`` agree on negatives, but
  ``x << k`` with negative x ERRORS on DuckDB (Spark returns the
  two's-complement shift) and ``BIT_COUNT(-1)`` is width-dependent
  (64 vs 32) — the grammar ABS-guards both.
- Integer division: Spark ``DIV`` ↔ DuckDB ``//`` BOTH truncate toward
  zero on negative dividends (probed: -107/10 → -10 on each), and
  signed ``%`` is truncated-mod on both — the q_intdiv shape keeps the
  pair proven. Python's ``//`` FLOORS (-107//10 → -11): any operator
  whose Spark side is a driver-side Python fold must spell floor
  division explicitly in its DuckDB oracle (see d15_ewma_monitor).
- Spark parser quirk (found by seed r8-dev7:20): ``>>`` ANYWHERE
  inside an ``ARRAY(…)`` or ``STRUCT(…)`` constructor is a parse error
  — the ``>`` tokens are consumed as type-parameter brackets
  (``array<…>``), regardless of parenthesization; ``<<`` is fine.
  Worse (seed r8-dev9:112): the re-tokenization applies to the REST of
  the statement — ``SELECT ARRAY(1,2), (5 >> 1) > 2`` fails while the
  reversed projection order parses. DuckDB has no SHIFTRIGHT function
  to map to, so array/struct shapes generate the ENTIRE statement
  shift-right-free (``no_shr=True`` threads through int_expr AND
  pred).
- ``DATEDIFF(YEAR|MONTH, a, b)`` — FOUND BY THE EXTENDED FUZZER's
  first seed (r8-dev4:46): Spark counts COMPLETE elapsed periods
  ('1995-08-15'→'2001-03-01' = 5 years) while DuckDB counts calendar
  BOUNDARY crossings (= 6). DAY agrees (both are elapsed days).
  Recipe: Spark ``DATEDIFF(YEAR, a, b)`` == DuckDB
  ``EXTRACT(YEAR FROM AGE(b, a))`` (AGE yields complete periods);
  months via ``year*12 + month`` of AGE → ``b22_datediff_unit_parity``.
  The grammar emits DAY only.
- Map extraction (round-8 probe): Spark ``m['k']`` is a SCALAR (value,
  or NULL on a missing key) while DuckDB 1.x returns a LIST
  (``[value]`` / ``[]``) — silent schema + value divergence. Recipe:
  append DuckDB's 1-based list index, ``m['k'][1]``, which unwraps
  hit → value, miss → NULL, NULL value → NULL (all three probed) →
  ``b25_map_extract_parity``. Construction is dialect-split
  (``MAP('k', v, …)`` ↔ ``MAP {'k': v, …}``); CARDINALITY /
  MAP_KEYS / MAP_VALUES agree in spelling AND key order (both preserve
  construction order for literal keys — probed); both engines REJECT
  duplicate literal keys at runtime, so generated keys are distinct by
  construction. Spark additionally rejects ``=`` on map types
  (no ordering) — map equality is never emitted.
- Missing outright in this DuckDB: INITCAP, REGEXP_LIKE,
  REGEXP_COUNT, CARDINALITY-on-lists; Spark rejects bare
  ``CAST(x AS VARCHAR)`` (needs a length) — use STRING. Excluded.

Dialect-mapped clauses: some semantics are identical but SPELLED
differently (array construction ``ARRAY(…)`` vs ``[…]``; ``RLIKE`` vs
``REGEXP_MATCHES``; ``GET_JSON_OBJECT`` vs ``JSON_EXTRACT_STRING``;
``ARRAY_SIZE`` vs ``ARRAY_LENGTH``; ``AGGREGATE`` lambda vs
``LIST_SUM``; ``ARRAY_JOIN`` vs ``ARRAY_TO_STRING``; ``REVERSE`` vs
``LIST_REVERSE`` on lists; ``SLICE(a, i, n)`` vs ``a[i:i+n-1]``).
Shapes covering those return a (spark_sql, duckdb_sql) PAIR built
from one skeleton — still one generated query, compared through the
same canonicalizer; the harness accepts either form.

Usage::

    python scripts/fuzz_oracles.py [sf_dir] [--n N] [--seed S]

On failure the offending SQL and its ``seed:index`` are printed — rerun
with ``--seed S --only I`` to reproduce a single case.
"""

from __future__ import annotations

import argparse
import random
import sys

import duckdb

sys.path.insert(0, ".")

from scripts.check_oracles import canon_hash, canon_value  # noqa: E402

# ---------------------------------------------------------------------------
# schema metadata (portable column pool; kinds drive expression typing)
# ---------------------------------------------------------------------------

# kind ∈ int | money (double, aggregate as cents) | str (low-card) |
#        name (high-card string) | date (timestamp → CAST AS DATE only)
TABLES = {
    "region": {
        "pk": ["r_regionkey"],
        "cols": {"r_regionkey": "int", "r_name": "str"},
    },
    "nation": {
        "pk": ["n_nationkey"],
        "cols": {"n_nationkey": "int", "n_name": "str", "n_regionkey": "int"},
    },
    "customer": {
        "pk": ["c_custkey"],
        "cols": {
            "c_custkey": "int",
            "c_name": "name",
            "c_nationkey": "int",
            "c_acctbal": "money",
            "c_mktsegment": "str",
        },
    },
    "supplier": {
        "pk": ["s_suppkey"],
        "cols": {
            "s_suppkey": "int",
            "s_name": "name",
            "s_nationkey": "int",
            "s_acctbal": "money",
        },
    },
    "part": {
        "pk": ["p_partkey"],
        "cols": {
            "p_partkey": "int",
            "p_name": "name",
            "p_brand": "str",
            "p_type": "str",
            "p_size": "int",
            "p_retailprice": "money",
        },
    },
    "orders": {
        "pk": ["o_orderkey"],
        "cols": {
            "o_orderkey": "int",
            "o_custkey": "int",
            "o_orderstatus": "str",
            "o_totalprice": "money",
            "o_orderdate": "date",
            "o_orderpriority": "str",
        },
    },
    "lineitem": {
        "pk": ["l_orderkey", "l_linenumber"],
        "cols": {
            "l_orderkey": "int",
            "l_partkey": "int",
            "l_suppkey": "int",
            "l_linenumber": "int",
            "l_quantity": "money",
            "l_extendedprice": "money",
            "l_discount": "money",
            "l_tax": "money",
            "l_returnflag": "str",
            "l_linestatus": "str",
            "l_shipdate": "date",
        },
    },
    "events": {
        "pk": ["event_id"],
        "cols": {
            "event_id": "int",
            "user_id": "int",
            "event_type": "str",
            "value": "money",
            # raw TIMESTAMP: per-row hash-equal across engines (probed
            # round 8 at sf0.001 AND sf0.01 — both engines truncate the
            # parquet nanos to identical micros), so ts participates in
            # predicates/projections/aggregates directly; ts-specific
            # clause pool in projections()/pred()/q_timestamp
            "ts": "ts",
        },
    },
    "documents": {
        "pk": ["doc_id"],
        "cols": {
            "doc_id": "int",
            "lang": "str",
            "source": "str",
            "text": "name",
            "n_chars": "int",
        },
    },
    # embeddings.embedding (FLOAT[]) is deliberately NOT in the generic
    # column pool — only q_array touches it, with mapped index bases
    "embeddings": {
        "pk": ["vec_id"],
        "cols": {"vec_id": "int", "label": "int"},
    },
}

# FK edges (child_table, child_col, parent_table, parent_col): inner joins
# along an edge return ≤ |child| rows — no accidental row explosions.
FKS = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    # user_id values are a subset of customer keys (probed round 8:
    # [0,14] ⊆ [0,149] at sf0.001; generator keys scale together) —
    # joins pull the timestamp-carrying table into q_join/q_join3
    ("events", "user_id", "customer", "c_custkey"),
]


def _cols_of(table: str, kinds: tuple[str, ...]) -> list[str]:
    return [c for c, k in TABLES[table]["cols"].items() if k in kinds]


# ---------------------------------------------------------------------------
# literal pools sampled from the data itself (predicates hit real values)
# ---------------------------------------------------------------------------


def build_literal_pools(con: duckdb.DuckDBPyConnection) -> dict:
    pools: dict[tuple[str, str], list] = {}
    for t, meta in TABLES.items():
        for c, kind in meta["cols"].items():
            if kind == "date":
                q = (
                    f"SELECT DISTINCT CAST({c} AS DATE) FROM {t} "
                    f"WHERE {c} IS NOT NULL ORDER BY 1 LIMIT 40"
                )
            else:
                q = (
                    f"SELECT DISTINCT {c} FROM {t} "
                    f"WHERE {c} IS NOT NULL ORDER BY 1 LIMIT 40"
                )
            pools[(t, c)] = [r[0] for r in con.sql(q).fetchall()]
    return pools


def _lit(kind: str, v) -> str:
    if kind == "date":
        return f"DATE '{v}'"
    if kind == "ts":
        return f"TIMESTAMP '{v}'"
    if kind in ("str", "name"):
        return "'" + str(v).replace("'", "''") + "'"
    if kind == "money":
        return f"{float(v):.2f}"
    return str(int(v))


# ---------------------------------------------------------------------------
# expression / predicate generators
# ---------------------------------------------------------------------------


def _cents(col: str) -> str:
    return f"CAST(ROUND({col}*100) AS BIGINT)"


class Gen:
    def __init__(self, rng: random.Random, pools: dict):
        self.rng = rng
        self.pools = pools

    def pick_lit(self, t: str, c: str, kind: str) -> str:
        pool = self.pools.get((t, c)) or []
        if not pool:
            return "0"
        return _lit(kind, self.rng.choice(pool))

    # -- scalar int expression over table t (alias a) -------------------
    # no_shr: suppress ``>>`` — unparseable inside Spark ARRAY()/
    # STRUCT() constructors (type-bracket ambiguity; module docstring)
    def int_expr(self, t: str, a: str, depth: int = 0,
                 no_shr: bool = False) -> str:
        rng = self.rng
        ints = _cols_of(t, ("int",))
        moneys = _cols_of(t, ("money",))
        base_choices = [f"{a}.{c}" for c in ints] + [
            _cents(f"{a}.{c}") for c in moneys
        ]
        base = rng.choice(base_choices)
        if depth >= 1 or rng.random() < 0.40:
            return base
        other = rng.choice(base_choices)
        pick = rng.random()
        if pick < 0.12:
            # round-8 portable math/bitwise pool (module docstring);
            # ^ is NEVER emitted (XOR vs POWER — pinned divergence)
            pool = [
                f"ABS({base} - {other})",
                f"GREATEST({base}, {other})",
                f"LEAST({base}, {other})",
                f"({base} & {other})",
                f"({base} | {other})",
                # ABS-guarded: only non-negative operands probed
                # for BIT_COUNT and shifts
                f"BIT_COUNT(ABS({base}))",
                f"((ABS({base}) % 10007) << {rng.randint(1, 4)})",
                f"MOD({base}, {rng.randint(2, 97)})",
            ]
            if not no_shr:
                pool.append(f"(ABS({base}) >> {rng.randint(1, 4)})")
            return rng.choice(pool)
        op = rng.choice(["+", "-", "+", "*"])
        if op == "*":
            # keep magnitudes far below 2^63 (ANSI overflow errors on Spark 4)
            return f"({base} % 10007) * {rng.randint(2, 9)}"
        return f"({base} {op} {other})"

    # -- portable string-valued expression over table t (alias a) -------
    def _frag(self, t: str, c: str, max_len: int = 4) -> str:
        """A short literal fragment of a real pooled value of (t, c),
        sanitized to quote-free text (safe inside '…' on both
        engines and free of LIKE/regex metacharacters)."""
        pool = self.pools.get((t, c)) or ["x"]
        v = str(self.rng.choice(pool))
        v = "".join(ch for ch in v if ch.isalnum() or ch == " ")
        k = self.rng.randint(1, max_len)
        start = self.rng.randint(0, max(0, len(v) - k))
        frag = v[start : start + k].strip()
        return frag or "x"

    def str_expr(self, t: str, a: str, depth: int = 0) -> str:
        """String-valued expression from the round-8 PORTABLE pool
        (module docstring): identical spelling AND semantics on both
        engines, NULL-propagating alike. Divergent forms (negative
        LEFT, SUBSTR start 0, empty pad, INITCAP) never emitted."""
        rng = self.rng
        strs = _cols_of(t, ("str", "name"))
        if not strs:
            return "'x'"
        c = rng.choice(strs)
        base = (
            self.str_expr(t, a, depth + 1)
            if depth < 2 and rng.random() < 0.35
            else f"{a}.{c}"
        )
        pick = rng.random()
        if pick < 0.10:
            return f"UPPER({base})"
        if pick < 0.20:
            return f"LOWER({base})"
        if pick < 0.28:
            fn = rng.choice(["TRIM", "LTRIM", "RTRIM", "REVERSE"])
            return f"{fn}({base})"
        if pick < 0.36:
            # start >= 1 only: SUBSTR(s, 0, n) is a pinned divergence
            return (
                f"SUBSTR({base}, {rng.randint(1, 5)}, {rng.randint(1, 8)})"
            )
        if pick < 0.44:
            fn = rng.choice(["LEFT", "RIGHT"])  # n >= 0 only (pin)
            return f"{fn}({base}, {rng.randint(0, 6)})"
        if pick < 0.52:
            return f"REPLACE({base}, '{self._frag(t, c)}', '_')"
        if pick < 0.58:
            fn = rng.choice(["LPAD", "RPAD"])  # pad never '' (pin)
            return f"{fn}({base}, {rng.randint(1, 12)}, 'xy')"
        if pick < 0.64:
            return f"SPLIT_PART({base}, ' ', {rng.randint(1, 4)})"
        if pick < 0.70:
            return f"TRANSLATE({base}, 'ae', '@3')"
        if pick < 0.76:
            return f"REPEAT(LEFT({base}, 2), {rng.randint(0, 3)})"
        if pick < 0.84:
            return f"{base} || '_' || '{self._frag(t, c)}'"
        if pick < 0.92:
            others = _cols_of(t, ("str", "name"))
            o = rng.choice(others)
            return f"CONCAT_WS('-', {base}, {a}.{o})"
        return f"CHR(65 + ASCII(LEFT({base}, 1)) % 26)"

    # -- predicate over table t (alias a), depth-bounded ----------------
    # no_shr: see int_expr — array/struct shapes must keep ``>>`` out
    # of the whole statement, predicates included
    def pred(self, t: str, a: str, depth: int = 0,
             no_shr: bool = False) -> str:
        rng = self.rng
        kind_pick = rng.random()
        cols = TABLES[t]["cols"]
        if depth < 2 and kind_pick < 0.30:
            left = self.pred(t, a, depth + 1, no_shr=no_shr)
            right = self.pred(t, a, depth + 1, no_shr=no_shr)
            conj = rng.choice(["AND", "OR"])
            neg = "NOT " if rng.random() < 0.2 else ""
            return f"{neg}({left} {conj} {right})"
        c, kind = rng.choice(list(cols.items()))
        col = f"{a}.{c}"
        if kind == "date":
            op = rng.choice(["<", "<=", ">", ">=", "="])
            return f"CAST({col} AS DATE) {op} {self.pick_lit(t, c, kind)}"
        if kind == "ts":
            choice = rng.random()
            if choice < 0.5:
                # raw timestamp comparison — portable (per-row equal,
                # module docstring); '=' included: literals are sampled
                # from the data so equality actually selects rows
                op = rng.choice(["<", "<=", ">", ">=", "="])
                return f"{col} {op} {self.pick_lit(t, c, kind)}"
            if choice < 0.8:
                lo = self.pick_lit(t, c, kind)
                hi = self.pick_lit(t, c, kind)
                return (
                    f"{col} BETWEEN LEAST({lo}, {hi})"
                    f" AND GREATEST({lo}, {hi})"
                )
            part = rng.choice(["HOUR", "MINUTE", "DAY", "MONTH"])
            cap = {"HOUR": 23, "MINUTE": 59, "DAY": 28, "MONTH": 12}[part]
            op = rng.choice(["<", "<=", ">=", "="])
            return (
                f"EXTRACT({part} FROM {col}) {op} {rng.randint(0, cap)}"
            )
        if kind in ("str", "name"):
            choice = rng.random()
            if choice < 0.35:
                op = rng.choice(["=", "<>", "<", ">"])
                return f"{col} {op} {self.pick_lit(t, c, kind)}"
            if choice < 0.6:
                pool = self.pools.get((t, c)) or [""]
                vals = ", ".join(
                    _lit(kind, v)
                    for v in rng.sample(pool, min(len(pool), rng.randint(1, 4)))
                )
                neg = "NOT " if rng.random() < 0.3 else ""
                return f"{col} {neg}IN ({vals})"
            if choice < 0.72:
                pool = self.pools.get((t, c)) or [""]
                v = str(rng.choice(pool))
                frag = v[: rng.randint(1, max(1, min(3, len(v))))]
                frag = frag.replace("'", "''").replace("%", "").replace("_", "")
                pat = rng.choice([f"{frag}%", f"%{frag}%"])
                return f"{col} LIKE '{pat}'"
            if choice < 0.8:
                # round-8 portable string predicates (probed: NULL
                # propagation and miss-behavior agree on both engines)
                frag = self._frag(t, c, max_len=3)
                return rng.choice(
                    [
                        f"CONTAINS({col}, '{frag}')",
                        f"INSTR({col}, '{frag}') > 0",
                        f"POSITION('{frag}' IN {col}) "
                        f"{rng.choice(['=', '>', '<='])} "
                        f"{rng.randint(0, 3)}",
                    ]
                )
            # 3VL: synthesize NULLs with NULLIF, then IS [NOT] NULL
            isnot = rng.choice(["", "NOT "])
            return (
                f"NULLIF({col}, {self.pick_lit(t, c, kind)}) "
                f"IS {isnot}NULL"
            )
        if kind == "money":
            op = rng.choice(["<", "<=", ">", ">=", "<>"])
            return f"{col} {op} {self.pick_lit(t, c, kind)}"
        # int
        choice = rng.random()
        if choice < 0.5:
            op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            return (
                f"{self.int_expr(t, a, no_shr=no_shr)} {op} "
                f"{self.pick_lit(t, c, 'int')}"
            )
        if choice < 0.75:
            lo = self.pick_lit(t, c, "int")
            hi = self.pick_lit(t, c, "int")
            return f"{col} BETWEEN LEAST({lo}, {hi}) AND GREATEST({lo}, {hi})"
        if choice < 0.9:
            return f"{col} % {self.rng.randint(2, 13)} = 0"
        isnot = rng.choice(["", "NOT "])
        return f"NULLIF({col}, {self.pick_lit(t, c, 'int')}) IS {isnot}NULL"

    # -- projection list (always aliased c0..cn; PK first for identity) -
    def projections(self, t: str, a: str) -> list[str]:
        rng = self.rng
        out = [f"{a}.{pk} AS pk{i}" for i, pk in enumerate(TABLES[t]["pk"])]
        n = rng.randint(1, 4)
        for i in range(n):
            kind_pick = rng.random()
            if kind_pick < 0.4:
                out.append(f"{self.int_expr(t, a)} AS c{i}")
            elif kind_pick < 0.6:
                strs = _cols_of(t, ("str", "name"))
                if strs:
                    c = rng.choice(strs)
                    fn = rng.choice(
                        [
                            f"UPPER({a}.{c})",
                            f"LOWER({a}.{c})",
                            f"SUBSTR({a}.{c}, 1, {rng.randint(1, 6)})",
                            f"LENGTH({a}.{c})",
                            f"{a}.{c}",
                        ]
                    )
                    out.append(f"{fn} AS c{i}")
                else:
                    out.append(f"{self.int_expr(t, a)} AS c{i}")
            elif kind_pick < 0.75:
                moneys = _cols_of(t, ("money",))
                if moneys:
                    out.append(f"{a}.{rng.choice(moneys)} AS c{i}")
                else:
                    out.append(f"{self.int_expr(t, a)} AS c{i}")
            elif kind_pick < 0.9:
                # CASE WHEN — 3VL result of a nested predicate
                p = self.pred(t, a, depth=2)
                out.append(
                    f"CASE WHEN {p} THEN {self.int_expr(t, a)} END AS c{i}"
                )
            else:
                dates = _cols_of(t, ("date",))
                strs = _cols_of(t, ("str", "name"))
                pick2 = rng.random()
                if dates and pick2 < 0.4:
                    out.append(
                        f"CAST({a}.{rng.choice(dates)} AS DATE) AS c{i}"
                    )
                elif dates and pick2 < 0.55:
                    # DOW excluded: Spark is 1-based Sunday=1, DuckDB
                    # 0-based Sunday=0 (pinned by b22_dow_parity)
                    part = rng.choice(
                        ["YEAR", "MONTH", "DAY", "QUARTER", "DOY"]
                    )
                    out.append(
                        f"EXTRACT({part} FROM CAST({a}.{rng.choice(dates)}"
                        f" AS DATE)) AS c{i}"
                    )
                elif dates and pick2 < 0.7:
                    d = f"CAST({a}.{rng.choice(dates)} AS DATE)"
                    # date+INTERVAL and DATE_TRUNC both promote to
                    # TIMESTAMP on one engine only — the explicit DATE
                    # cast is the portable form
                    expr = rng.choice(
                        [
                            f"CAST({d} + INTERVAL {rng.randint(1, 90)} DAY"
                            f" AS DATE)",
                            f"CAST({d} - INTERVAL {rng.randint(1, 6)} MONTH"
                            f" AS DATE)",
                            f"CAST(DATE_TRUNC('MONTH', {d}) AS DATE)",
                            f"LAST_DAY({d})",
                            # round-8 probed portable date arithmetic
                            f"DATE_ADD({d}, {rng.randint(1, 60)})",
                            f"GREATEST({d}, DATE "
                            f"'199{rng.randint(2, 8)}-06-15')",
                        ]
                    )
                    out.append(f"{expr} AS c{i}")
                elif _cols_of(t, ("ts",)) and pick2 < 0.7:
                    # round-8 portable timestamp clauses (probed; the
                    # CAST AS TIMESTAMP is a no-op on Spark and fixes
                    # DuckDB's DATE_TRUNC('day') returning DATE; the
                    # FLOOR+INT cast aligns Spark's fractional
                    # DECIMAL(8,6) EXTRACT(SECOND) with DuckDB's int)
                    ts = f"{a}.{rng.choice(_cols_of(t, ('ts',)))}"
                    g = rng.choice(["minute", "hour", "day", "month"])
                    part = rng.choice(["HOUR", "MINUTE", "DAY", "MONTH",
                                       "YEAR", "DOY"])
                    expr = rng.choice(
                        [
                            ts,
                            f"CAST(DATE_TRUNC('{g}', {ts}) AS TIMESTAMP)",
                            f"EXTRACT({part} FROM {ts})",
                            f"CAST(FLOOR(EXTRACT(SECOND FROM {ts}))"
                            f" AS INT)",
                            f"{ts} + INTERVAL {rng.randint(1, 300)}"
                            f" MINUTE",
                            f"CAST({ts} AS DATE)",
                            f"GREATEST({ts}, TIMESTAMP "
                            f"'2024-01-{rng.randint(10, 28)} 12:00:00')",
                        ]
                    )
                    out.append(f"{expr} AS c{i}")
                elif len(strs) >= 2:
                    s1, s2 = rng.sample(strs, 2)
                    # || is NULL-propagating on BOTH engines (CONCAT not)
                    out.append(f"{a}.{s1} || '_' || {a}.{s2} AS c{i}")
                else:
                    out.append(f"{self.int_expr(t, a)} AS c{i}")
        return out

    def group_keys(self, t: str, a: str) -> list[str]:
        rng = self.rng
        keys = []
        strs = _cols_of(t, ("str",))
        ints = _cols_of(t, ("int",))
        n = rng.randint(1, 2)
        for i in range(n):
            if strs and rng.random() < 0.6:
                keys.append((f"{a}.{rng.choice(strs)}", f"g{i}"))
            elif ints:
                c = rng.choice(ints)
                if rng.random() < 0.5:
                    keys.append((f"{a}.{c} % {rng.randint(2, 7)}", f"g{i}"))
                else:
                    keys.append((f"{a}.{c}", f"g{i}"))
        return keys or [(f"{a}.{TABLES[t]['pk'][0]} % 3", "g0")]

    def aggs(self, t: str, a: str) -> list[str]:
        rng = self.rng
        out = ["COUNT(*) AS cnt"]
        n = rng.randint(1, 3)
        for i in range(n):
            pick = rng.random()
            e = self.int_expr(t, a)
            if pick < 0.25:
                out.append(f"SUM({e}) AS a{i}")
            elif pick < 0.4:
                out.append(f"{rng.choice(['MIN', 'MAX'])}({e}) AS a{i}")
            elif pick < 0.5:
                # non-date columns only: the "date"-kind columns are
                # timestamp-encoded differently per table (tables.load)
                # and enter the grammar only as CAST(col AS DATE).
                # events.ts ("ts" kind) IS eligible — per-row
                # hash-equal across engines (round-8 probe)
                cols = [
                    c
                    for c, k in TABLES[t]["cols"].items()
                    if k != "date"
                ]
                out.append(f"COUNT(DISTINCT {a}.{rng.choice(cols)}) AS a{i}")
            elif pick < 0.55 and _cols_of(t, ("ts",)):
                ts = f"{a}.{rng.choice(_cols_of(t, ('ts',)))}"
                out.append(
                    f"{rng.choice(['MIN', 'MAX'])}({ts}) AS a{i}"
                )
            elif pick < 0.6:
                out.append(f"AVG({e}) AS a{i}")
            elif pick < 0.68:
                # aggregate FILTER clause — portable (probed round 7)
                fn = rng.choice([f"SUM({e})", "COUNT(*)"])
                out.append(
                    f"{fn} FILTER (WHERE {self.pred(t, a, depth=2)}) AS a{i}"
                )
            elif pick < 0.76:
                out.append(
                    f"{rng.choice(['BOOL_AND', 'BOOL_OR'])}"
                    f"({self.pred(t, a, depth=2)}) AS a{i}"
                )
            elif pick < 0.82:
                ints = _cols_of(t, ("int",))
                if ints:
                    out.append(
                        f"{rng.choice(['BIT_AND', 'BIT_OR', 'BIT_XOR'])}"
                        f"({a}.{rng.choice(ints)}) AS a{i}"
                    )
                else:
                    out.append(f"SUM({e}) AS a{i}")
            elif pick < 0.9:
                # exact percentile family: portable over INTEGER inputs
                # only (probed round 7: DOUBLE inputs diverge — DuckDB's
                # median/quantile_cont over DOUBLE is not interpolated
                # the way Spark's is; integer inputs agree exactly)
                ints = _cols_of(t, ("int",))
                if ints:
                    c = f"{a}.{rng.choice(ints)}"
                    out.append(
                        rng.choice(
                            [
                                f"MEDIAN({c}) AS a{i}",
                                f"PERCENTILE_CONT(0.5) WITHIN GROUP "
                                f"(ORDER BY {c}) AS a{i}",
                            ]
                        )
                    )
                else:
                    out.append(f"AVG({e}) AS a{i}")
            else:
                strs = _cols_of(t, ("str", "name"))
                if strs:
                    out.append(
                        f"{rng.choice(['MIN', 'MAX'])}"
                        f"({a}.{rng.choice(strs)}) AS a{i}"
                    )
                else:
                    out.append(f"SUM({e}) AS a{i}")
        return out


# ---------------------------------------------------------------------------
# query shapes
# ---------------------------------------------------------------------------


def q_scan(g: Gen) -> str:
    t = g.rng.choice(list(TABLES))
    projs = ", ".join(g.projections(t, "t"))
    return f"SELECT {projs} FROM {t} t WHERE {g.pred(t, 't')}"


def q_agg(g: Gen) -> str:
    t = g.rng.choice(list(TABLES))
    keys = g.group_keys(t, "t")
    key_sql = ", ".join(f"{e} AS {al}" for e, al in keys)
    group = ", ".join(e for e, _ in keys)
    aggs = ", ".join(g.aggs(t, "t"))
    pick = g.rng.random()
    if pick < 0.3:
        having = f" HAVING COUNT(*) >= {g.rng.randint(1, 5)}"
    elif pick < 0.5:
        having = f" HAVING SUM({g.int_expr(t, 't')}) > 0"
    else:
        having = ""
    return (
        f"SELECT {key_sql}, {aggs} FROM {t} t "
        f"WHERE {g.pred(t, 't')} GROUP BY {group}{having}"
    )


def q_join(g: Gen) -> str:
    rng = g.rng
    child, ck, parent, pk = rng.choice(FKS)
    jt = rng.choice(["JOIN", "LEFT JOIN", "FULL JOIN", "SEMI", "ANTI"])
    cpred = g.pred(child, "c")
    ppred = g.pred(parent, "p")
    if jt in ("SEMI", "ANTI"):
        exists = "EXISTS" if jt == "SEMI" else "NOT EXISTS"
        projs = ", ".join(g.projections(child, "c"))
        return (
            f"SELECT {projs} FROM {child} c WHERE {cpred} AND {exists} "
            f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck} AND {ppred})"
        )
    child_cols = [f"c.{x} AS ck{i}" for i, x in enumerate(TABLES[child]["pk"])]
    parent_cols = [f"p.{pk} AS ppk"]
    extra_c = g.int_expr(child, "c")
    strs_p = _cols_of(parent, ("str", "name"))
    extra_p = f"p.{rng.choice(strs_p)}" if strs_p else f"p.{pk}"
    if jt == "FULL JOIN":
        # filtered subqueries on both sides, join on the FK
        return (
            f"SELECT x.ck0, y.ppk, x.cv, y.pv FROM "
            f"(SELECT {TABLES[child]['pk'][0]} AS ck0, {ck} AS jk, "
            f"{g.int_expr(child, child[0])} AS cv FROM {child} {child[0]} "
            f"WHERE {g.pred(child, child[0])}) x "
            f"FULL JOIN "
            f"(SELECT {pk} AS ppk, {g.int_expr(parent, parent[0])} AS pv "
            f"FROM {parent} {parent[0]} WHERE {g.pred(parent, parent[0])}) y "
            f"ON x.jk = y.ppk"
        )
    sel = ", ".join(child_cols + parent_cols + [f"{extra_c} AS cv", f"{extra_p} AS pv"])
    q = (
        f"SELECT {sel} FROM {child} c {jt} {parent} p ON c.{ck} = p.{pk}"
        f" AND {ppred} WHERE {cpred}"
        if jt == "LEFT JOIN"
        else f"SELECT {sel} FROM {child} c {jt} {parent} p "
        f"ON c.{ck} = p.{pk} WHERE {cpred} AND {ppred}"
    )
    if rng.random() < 0.4:
        return (
            f"SELECT ppk, COUNT(*) AS cnt, SUM(cv) AS s0, MIN(pv) AS m0 "
            f"FROM ({q}) j GROUP BY ppk"
        )
    return q


def q_join3(g: Gen) -> str:
    """Three-table FK chain (child → parent → grandparent), aggregated
    on a grandparent key — the TPC-H star shape the registry leans on."""
    rng = g.rng
    chain = rng.choice(
        [
            ("lineitem", "l_orderkey", "orders", "o_orderkey",
             "o_custkey", "customer", "c_custkey"),
            ("orders", "o_custkey", "customer", "c_custkey",
             "c_nationkey", "nation", "n_nationkey"),
            ("customer", "c_nationkey", "nation", "n_nationkey",
             "n_regionkey", "region", "r_regionkey"),
            ("lineitem", "l_suppkey", "supplier", "s_suppkey",
             "s_nationkey", "nation", "n_nationkey"),
        ]
    )
    c, ck, p, pk, pfk, gp, gpk = chain
    e = g.int_expr(c, "c")
    strs_gp = _cols_of(gp, ("str", "name"))
    gcol = f"g.{rng.choice(strs_gp)}" if strs_gp else f"g.{gpk}"
    return (
        f"SELECT {gcol} AS g0, COUNT(*) AS cnt, SUM({e}) AS s0 "
        f"FROM {c} c JOIN {p} p ON c.{ck} = p.{pk} "
        f"JOIN {gp} g ON p.{pfk} = g.{gpk} "
        f"WHERE {g.pred(c, 'c')} AND {g.pred(gp, 'g')} "
        f"GROUP BY {gcol}"
    )


def q_window_frame(g: Gen) -> str:
    """Explicit ROWS BETWEEN frames over a total in-partition order."""
    rng = g.rng
    t = rng.choice([x for x in TABLES if x not in ("region", "nation")])
    part, _ = g.group_keys(t, "t")[0]
    val = g.int_expr(t, "t")
    pk_order = ", ".join(f"t.{p} ASC" for p in TABLES[t]["pk"])
    lo = rng.randint(1, 4)
    fn = rng.choice([f"SUM({val})", f"MIN({val})", f"MAX({val})",
                     "COUNT(*)", f"AVG({val})"])
    pks = ", ".join(f"t.{p} AS pk{i}" for i, p in enumerate(TABLES[t]["pk"]))
    pick = rng.random()
    if pick < 0.2:
        # RANGE value frame (round-8 probe: agrees on both engines):
        # single numeric order key, no tiebreak — peers are all
        # included by definition, so the frame aggregate is
        # deterministic even over ties
        frame = (
            f"RANGE BETWEEN {rng.randint(1, 500)} PRECEDING AND "
            f"CURRENT ROW"
        )
        return (
            f"SELECT {pks}, {part} AS g0, {val} AS v0, "
            f"{fn} OVER (PARTITION BY {part} ORDER BY {val} ASC "
            f"{frame}) AS w0 "
            f"FROM {t} t WHERE {g.pred(t, 't')}"
        )
    if pick < 0.4 and _cols_of(t, ("ts",)):
        # timestamp RANGE frame with INTERVAL bounds (round-9 probe:
        # same-unit bounds agree on both engines over ASC/DESC, NULL
        # order keys, and UNBOUNDED/FOLLOWING mixes; MIXED units —
        # '36' HOUR PRECEDING with '1' DAY FOLLOWING — are a Spark
        # ANALYSIS ERROR (SPECIFIED_WINDOW_FRAME_DIFF_TYPES) while
        # DuckDB runs them, pinned as b17_ts_range_frame — so the
        # generator draws ONE unit for both bounds)
        ts = f"t.{rng.choice(_cols_of(t, ('ts',)))}"
        unit = rng.choice(["DAYS", "HOUR"])
        lo_n = rng.randint(1, 4)
        direction = rng.choice(["ASC", "DESC"])
        hi = rng.choice(
            ["CURRENT ROW", f"INTERVAL {rng.randint(1, 2)} {unit} FOLLOWING"]
        )
        lo = rng.choice(
            ["UNBOUNDED PRECEDING", f"INTERVAL {lo_n} {unit} PRECEDING"]
        )
        return (
            f"SELECT {pks}, {part} AS g0, "
            f"{fn} OVER (PARTITION BY {part} ORDER BY {ts} {direction} "
            f"RANGE BETWEEN {lo} AND {hi}) AS w0 "
            f"FROM {t} t WHERE {g.pred(t, 't')}"
        )
    frame = rng.choice(
        [
            f"ROWS BETWEEN {lo} PRECEDING AND CURRENT ROW",
            f"ROWS BETWEEN {lo} PRECEDING AND {rng.randint(1, 3)} FOLLOWING",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        ]
    )
    return (
        f"SELECT {pks}, {part} AS g0, {val} AS v0, "
        f"{fn} OVER (PARTITION BY {part} ORDER BY {val} ASC NULLS FIRST, "
        f"{pk_order} {frame}) AS w0 "
        f"FROM {t} t WHERE {g.pred(t, 't')}"
    )


def q_window(g: Gen) -> str:
    rng = g.rng
    t = rng.choice([x for x in TABLES if x not in ("region", "nation")])
    a = "t"
    part, _ = g.group_keys(t, a)[0]
    val = g.int_expr(t, a)
    pk_order = ", ".join(f"{a}.{p} ASC" for p in TABLES[t]["pk"])
    fn = rng.choice(
        [
            "ROW_NUMBER()",
            "RANK()",
            "DENSE_RANK()",
            f"SUM({val})",
            f"LAG({val}, 1)",
            f"LEAD({val}, 1)",
        ]
    )
    order_dir = rng.choice(["ASC", "DESC"])
    nulls = "NULLS FIRST" if order_dir == "ASC" else "NULLS LAST"
    win = (
        f"PARTITION BY {part} ORDER BY {val} {order_dir} {nulls}, {pk_order}"
    )
    pks = ", ".join(f"{a}.{p} AS pk{i}" for i, p in enumerate(TABLES[t]["pk"]))
    inner = (
        f"SELECT {pks}, {part} AS g0, {val} AS v0, {fn} OVER ({win}) AS w0 "
        f"FROM {t} {a} WHERE {g.pred(t, a)}"
    )
    if fn in ("ROW_NUMBER()", "RANK()", "DENSE_RANK()") and rng.random() < 0.6:
        return f"SELECT * FROM ({inner}) s WHERE w0 <= {rng.randint(1, 5)}"
    return inner


def q_setop(g: Gen) -> str:
    rng = g.rng
    t = rng.choice(list(TABLES))
    cols = [TABLES[t]["pk"][0]] + _cols_of(t, ("str", "int"))[:2]
    proj = ", ".join(dict.fromkeys(cols))
    op = rng.choice(
        [
            "UNION ALL",
            "UNION",
            "INTERSECT",
            "EXCEPT",
            "INTERSECT ALL",
            "EXCEPT ALL",
        ]
    )
    return (
        f"SELECT {proj} FROM {t} t WHERE {g.pred(t, 't')} "
        f"{op} SELECT {proj} FROM {t} t WHERE {g.pred(t, 't')}"
    )


def q_rollup(g: Gen) -> str:
    rng = g.rng
    t = rng.choice(list(TABLES))
    strs = _cols_of(t, ("str",))
    if len(strs) >= 2:
        k0, k1 = rng.sample(strs, 2)
    elif strs:
        k0, k1 = strs[0], f"{TABLES[t]['pk'][0]} % 3"
    else:
        k0, k1 = f"{TABLES[t]['pk'][0]} % 3", f"{TABLES[t]['pk'][0]} % 5"
    grouping = rng.choice(
        [f"ROLLUP({k0}, {k1})", f"CUBE({k0}, {k1})",
         f"GROUPING SETS (({k0}), ({k0}, {k1}), ())"]
    )
    e = g.int_expr(t, "t")
    return (
        f"SELECT {k0} AS g0, {k1} AS g1, COUNT(*) AS cnt, "
        f"SUM({e}) AS a0, COALESCE(MIN({e}), 0) AS a1 "
        f"FROM {t} t WHERE {g.pred(t, 't')} GROUP BY {grouping}"
    )


def q_limit(g: Gen) -> str:
    rng = g.rng
    t = rng.choice(list(TABLES))
    e = g.int_expr(t, "t")
    pks = ", ".join(f"t.{p} AS pk{i}" for i, p in enumerate(TABLES[t]["pk"]))
    pk_order = ", ".join(
        f"pk{i} ASC" for i in range(len(TABLES[t]["pk"]))
    )
    direction = rng.choice(["ASC", "DESC"])
    nulls = rng.choice(["NULLS FIRST", "NULLS LAST"])
    offset = (
        f" OFFSET {rng.randint(1, 20)}" if rng.random() < 0.3 else ""
    )
    return (
        f"SELECT {pks}, {e} AS v0 FROM {t} t WHERE {g.pred(t, 't')} "
        f"ORDER BY v0 {direction} {nulls}, {pk_order} "
        f"LIMIT {rng.randint(1, 50)}{offset}"
    )


def q_scalar_subq(g: Gen) -> str:
    rng = g.rng
    t = rng.choice(list(TABLES))
    e = g.int_expr(t, "t")
    sub_e = g.int_expr(t, "s")
    agg = rng.choice(["AVG", "MIN", "MAX"])
    projs = ", ".join(g.projections(t, "t"))
    return (
        f"SELECT {projs} FROM {t} t WHERE {e} > "
        f"(SELECT {agg}({sub_e}) FROM {t} s WHERE {g.pred(t, 's')})"
    )


def q_exists(g: Gen) -> str:
    """Round-8 quantified subqueries along FK edges: correlated
    [NOT] EXISTS from the parent side, uncorrelated [NOT] IN from the
    child side, and the classic 3VL trap — NOT IN whose subquery
    yields a NULLIF-synthesized NULL (standard semantics: one NULL
    empties the NOT IN result; both engines implement it — fuzzed so
    a regression in either engine's null-aware anti-join surfaces)."""
    rng = g.rng
    child, ckey, parent, pkey = rng.choice(FKS)
    pick = rng.random()
    neg = rng.choice(["", "NOT "])
    if pick < 0.4:
        projs = ", ".join(g.projections(parent, "t"))
        return (
            f"SELECT {projs} FROM {parent} t WHERE {neg}EXISTS ("
            f"SELECT 1 FROM {child} s WHERE s.{ckey} = t.{pkey}"
            f" AND {g.pred(child, 's')})"
        )
    projs = ", ".join(g.projections(child, "t"))
    if pick < 0.75:
        return (
            f"SELECT {projs} FROM {child} t WHERE t.{ckey} {neg}IN ("
            f"SELECT s.{pkey} FROM {parent} s WHERE {g.pred(parent, 's')})"
        )
    # NOT IN + NULL in the subquery list: empties the result whenever
    # the NULLIF fires for any subquery row (3VL; agrees both engines)
    lit = g.pick_lit(parent, pkey, "int")
    return (
        f"SELECT {projs} FROM {child} t WHERE t.{ckey} NOT IN ("
        f"SELECT NULLIF(s.{pkey}, {lit}) FROM {parent} s"
        f" WHERE {g.pred(parent, 's')})"
    )


def q_lateral(g: Gen) -> tuple[str, str]:
    """Round-8 session-3 lateral joins: correlated top-k per outer row
    along an FK edge — the construct Spark DECORRELATES (window
    rank-filter rewrite) and DuckDB executes as a nested-loop lateral,
    so any decorrelation bug (LIMIT handling, extra conjuncts, the k
    cut's tie order) surfaces as a hash mismatch. Total ordering via
    (chosen column, child primary key) so LIMIT k is deterministic.
    Dialect split (module docstring): Spark accepts bare
    ``JOIN LATERAL (...)``; DuckDB wants ``CROSS JOIN LATERAL``."""
    rng = g.rng
    child, ckey, parent, pkey = rng.choice(FKS)
    oc = rng.choice(_cols_of(child, ("int",)))
    pk_cols = TABLES[child]["pk"]
    sel_cols = list(dict.fromkeys([oc] + pk_cols))
    sel = ", ".join(f"s.{c} AS t_{c}" for c in sel_cols)
    order = f"s.{oc} {rng.choice(['ASC', 'DESC'])}, " + ", ".join(
        f"s.{c}" for c in pk_cols
    )
    extra = f" AND {g.pred(child, 's')}" if rng.random() < 0.5 else ""
    k = rng.randint(1, 3)
    inner = (
        f"SELECT {sel} FROM {child} s"
        f" WHERE s.{ckey} = p.{pkey}{extra}"
        f" ORDER BY {order} LIMIT {k}"
    )
    outer = f"p.{pkey} AS pk, " + ", ".join(f"t.t_{c}" for c in sel_cols)
    return (
        f"SELECT {outer} FROM {parent} p JOIN LATERAL ({inner}) t",
        f"SELECT {outer} FROM {parent} p CROSS JOIN LATERAL ({inner}) t",
    )


def q_cte(g: Gen) -> str:
    inner = q_agg(g)
    return (
        f"WITH base AS ({inner}) "
        f"SELECT * FROM base b WHERE b.cnt >= 1"
    )


def q_derived(g: Gen) -> str:
    """Round-8 derived tables: an aggregate subquery in FROM with an
    outer filter/aggregate re-applied over its aliased columns — the
    shape optimizers rewrite most aggressively (subquery pull-up,
    predicate pushdown THROUGH the derived table, partial-agg
    reordering). Portable single-text (no dialect split needed)."""
    rng = g.rng
    inner = q_agg(g)
    if rng.random() < 0.5:
        return (
            f"SELECT * FROM ({inner}) d WHERE d.cnt"
            f" {rng.choice(['>=', '>', '='])} {rng.randint(1, 3)}"
        )
    return (
        f"SELECT COUNT(*) AS n, SUM(d.cnt) AS total,"
        f" {rng.choice(['MIN', 'MAX'])}(d.cnt) AS m"
        f" FROM ({inner}) d"
    )


def q_string(g: Gen) -> str:
    """Round-8 expression coverage: portable string-function clauses
    (str_expr pool) projected and string predicates in WHERE — catches
    padding/trim/case/split semantics drift on either engine."""
    rng = g.rng
    t = rng.choice(
        [x for x in TABLES if _cols_of(x, ("str", "name"))]
    )
    pks = ", ".join(f"t.{p} AS pk{i}" for i, p in enumerate(TABLES[t]["pk"]))
    projs = [pks]
    for i in range(rng.randint(2, 4)):
        se = g.str_expr(t, "t")
        if rng.random() < 0.3:
            projs.append(f"LENGTH({se}) AS n{i}")
        elif rng.random() < 0.15:
            projs.append(f"ASCII(LEFT({se}, 1)) AS n{i}")
        else:
            projs.append(f"{se} AS s{i}")
    pred = g.pred(t, "t")
    if rng.random() < 0.4:
        # concentrate on the string predicate class
        c = rng.choice(_cols_of(t, ("str", "name")))
        pred = (
            f"({pred}) AND INSTR(t.{c}, '{g._frag(t, c, 2)}') "
            f"{rng.choice(['>', '='])} 0"
        )
    return f"SELECT {', '.join(projs)} FROM {t} t WHERE {pred}"


def q_regexp(g: Gen) -> tuple[str, str]:
    """Round-8 regexp clauses, dialect-mapped: Spark ``RLIKE`` ↔ DuckDB
    ``REGEXP_MATCHES`` predicates, ``REGEXP_REPLACE`` with the 'g' flag
    on the DuckDB side only (pinned divergence), portable
    ``REGEXP_EXTRACT``. Patterns stay in the probed-portable subset:
    literal frags, [a-z]/[0-9] classes, ., +, ?, {m,n}, |, anchors,
    (?i) — no backslash classes (string-literal escaping differs)."""
    rng = g.rng
    t = rng.choice([x for x in TABLES if _cols_of(x, ("str", "name"))])
    c = rng.choice(_cols_of(t, ("str", "name")))
    col = f"t.{c}"
    frag = g._frag(t, c, 3)
    pat = rng.choice(
        [
            f"{frag}",
            f"^{frag}",
            f"{frag}$",
            "[a-z]+[0-9]+",
            "[0-9]{2,9}",
            f"({frag}|[0-9]+)",
            f"{frag[:1]}.{frag[1:2] or 'x'}",
            f"(?i){frag.upper()}",
            "[a-z]+ [a-z]+",
        ]
    )
    pk = TABLES[t]["pk"][0]
    extract = rng.choice(
        [
            f"REGEXP_EXTRACT({col}, '({pat})', 1)",
            f"REGEXP_EXTRACT({col}, '{pat}', 0)",
        ]
    )
    repl_s = f"REGEXP_REPLACE({col}, '{pat}', '#')"
    repl_d = f"REGEXP_REPLACE({col}, '{pat}', '#', 'g')"
    where_s = f"{col} RLIKE '{pat}'"
    where_d = f"REGEXP_MATCHES({col}, '{pat}')"
    neg = "NOT " if rng.random() < 0.3 else ""
    agg = rng.random() < 0.35
    if agg:
        skeleton = (
            "SELECT {repl} AS masked, COUNT(*) AS cnt, "
            "CAST(SUM(LENGTH({ex})) AS BIGINT) AS s0 "
            "FROM {t} t WHERE {base} GROUP BY masked"
        )
        return (
            skeleton.format(repl=repl_s, ex=extract, t=t,
                            base=f"{neg}({where_s})"),
            skeleton.format(repl=repl_d, ex=extract, t=t,
                            base=f"{neg}({where_d})"),
        )
    skeleton = (
        "SELECT t.{pk} AS pk0, {ex} AS x0, {repl} AS masked "
        "FROM {t} t WHERE {base} AND {p}"
    )
    base_pred = g.pred(t, "t", depth=1)
    return (
        skeleton.format(pk=pk, ex=extract, repl=repl_s, t=t,
                        base=f"{neg}({where_s})", p=base_pred),
        skeleton.format(pk=pk, ex=extract, repl=repl_d, t=t,
                        base=f"{neg}({where_d})", p=base_pred),
    )


def q_json(g: Gen) -> tuple[str, str]:
    """Round-8 JSON clauses, dialect-mapped: Spark ``GET_JSON_OBJECT``
    ↔ DuckDB ``JSON_EXTRACT_STRING`` (values agree incl. missing-key →
    NULL and object values → compact JSON, probed), portable
    ``JSON_ARRAY_LENGTH``. Documents come from the REAL events.props
    column or are synthesized from int expressions via CAST(… AS
    STRING) concatenation (identical on both engines)."""
    rng = g.rng

    def mapped(doc: str, path: str) -> tuple[str, str]:
        return (
            f"GET_JSON_OBJECT({doc}, '{path}')",
            f"JSON_EXTRACT_STRING({doc}, '{path}')",
        )

    if rng.random() < 0.45:
        # real column: events.props is '{"k": <int>}'
        path = rng.choice(["$.k", "$.zz"])
        ex_s, ex_d = mapped("t.props", path)
        pred = g.pred("events", "t", depth=1)
        skeleton = (
            "SELECT t.event_id AS pk0, {ex} AS x0, "
            "CAST({ex} AS BIGINT) AS n0 "
            "FROM events t WHERE {p}"
        )
        return (
            skeleton.format(ex=ex_s, p=pred),
            skeleton.format(ex=ex_d, p=pred),
        )
    # synthesized doc over any table: nested object + array
    t = rng.choice([x for x in TABLES if x != "embeddings"])
    e1 = g.int_expr(t, "t")
    e2 = g.int_expr(t, "t")
    doc = (
        "'{\"a\": ' || CAST(" + e1 + " AS STRING) || "
        "', \"o\": {\"x\": 7}, \"arr\": [' || CAST(" + e2 + " AS STRING)"
        " || ', 11, 19]}'"
    )
    path, as_int = rng.choice(
        [
            ("$.a", True),
            ("$.o.x", True),
            ("$.o", False),
            ("$.arr[0]", True),
            ("$.arr[2]", True),
            ("$.arr[5]", True),  # out of range → NULL on both
            ("$.missing", False),
        ]
    )
    ex_s, ex_d = mapped(doc, path)
    pk = TABLES[t]["pk"][0]
    cast = "CAST({ex} AS BIGINT)" if as_int else "{ex}"
    arr_len = (
        "JSON_ARRAY_LENGTH('[' || CAST(" + e2 + " AS STRING) ||"
        " ', 1]')"
    )
    skeleton = (
        "SELECT t.{pk} AS pk0, " + cast + " AS x0, {al} AS n0 "
        "FROM {t} t WHERE {p}"
    )
    pred = g.pred(t, "t", depth=1)
    return (
        skeleton.format(pk=pk, ex=ex_s, al=arr_len, t=t, p=pred),
        skeleton.format(pk=pk, ex=ex_d, al=arr_len, t=t, p=pred),
    )


def q_array(g: Gen) -> tuple[str, str]:
    """Round-8 array clauses, dialect-mapped. Two sub-shapes: (a) the
    REAL FLOAT[] embedding column — mapped element access (Spark
    0-based ``[i]`` / 1-based ``ELEMENT_AT`` ↔ DuckDB 1-based ``[i]``),
    mapped length spelling, slices; (b) synthesized INT arrays
    (``ARRAY(…)`` ↔ ``[…]``) through the portable list-function pool
    (CONTAINS/POSITION/SORT, sorted DISTINCT per the pinned ordering
    divergence, mapped sum/join/reverse)."""
    rng = g.rng
    if rng.random() < 0.45:
        i = rng.randint(0, 7)
        j = rng.randint(1, 8)
        n = rng.randint(2, 4)
        sl = rng.randint(1, 6)
        items_s = [
            ("e0", f"t.embedding[{i}]"),
            ("e1", f"ELEMENT_AT(t.embedding, {j})"),
            ("alen", "ARRAY_SIZE(t.embedding)"),
            ("sl", f"SLICE(t.embedding, {sl}, {n})"),
        ]
        items_d = [
            ("e0", f"t.embedding[{i + 1}]"),
            ("e1", f"t.embedding[{j}]"),
            ("alen", "ARRAY_LENGTH(t.embedding)"),
            ("sl", f"t.embedding[{sl}:{sl + n - 1}]"),
        ]
        keep = sorted(rng.sample(range(4), rng.randint(2, 4)))
        sel_s = ", ".join(f"{items_s[k][1]} AS {items_s[k][0]}" for k in keep)
        sel_d = ", ".join(f"{items_d[k][1]} AS {items_d[k][0]}" for k in keep)
        # guard: every index the clause touches exists (ANSI Spark
        # raises on ELEMENT_AT out-of-range; [i] returns NULL — the
        # guard keeps both legal AND equal)
        guard = max(i + 1, j, sl + n - 1)
        return (
            f"SELECT t.vec_id AS pk0, {sel_s} FROM embeddings t "
            f"WHERE ARRAY_SIZE(t.embedding) >= {guard}",
            f"SELECT t.vec_id AS pk0, {sel_d} FROM embeddings t "
            f"WHERE ARRAY_LENGTH(t.embedding) >= {guard}",
        )
    t = rng.choice([x for x in TABLES if x != "embeddings"])
    xs = [g.int_expr(t, "t", no_shr=True) for _ in range(3)]
    arr_s = f"ARRAY({xs[0]}, {xs[1]}, {xs[2]})"
    arr_d = f"[{xs[0]}, {xs[1]}, {xs[2]}]"
    lit = f"{xs[0]}"  # guaranteed hit for CONTAINS/POSITION sometimes
    wraps = [
        ("w0", f"ARRAY_CONTAINS({{a}}, {lit})",
         f"ARRAY_CONTAINS({{a}}, {lit})"),
        ("w1", f"ARRAY_POSITION({{a}}, {xs[1]})",
         f"ARRAY_POSITION({{a}}, {xs[1]})"),
        ("w2", "ARRAY_SORT({a})", "ARRAY_SORT({a})"),
        ("w3", "ARRAY_SORT(ARRAY_DISTINCT({a}))",
         "ARRAY_SORT(ARRAY_DISTINCT({a}))"),
        ("w4", "AGGREGATE({a}, CAST(0 AS BIGINT), (acc, x) -> acc + x)",
         "CAST(LIST_SUM({a}) AS BIGINT)"),
        ("w5", "REVERSE(ARRAY_SORT({a}))", "LIST_REVERSE(ARRAY_SORT({a}))"),
    ]
    keep = sorted(rng.sample(range(len(wraps)), rng.randint(2, 3)))
    sel_s = ", ".join(
        wraps[k][1].format(a=arr_s) + f" AS {wraps[k][0]}" for k in keep
    )
    sel_d = ", ".join(
        wraps[k][2].format(a=arr_d) + f" AS {wraps[k][0]}" for k in keep
    )
    pk = TABLES[t]["pk"][0]
    pred = g.pred(t, "t", depth=1, no_shr=True)
    return (
        f"SELECT t.{pk} AS pk0, {sel_s} FROM {t} t WHERE {pred}",
        f"SELECT t.{pk} AS pk0, {sel_d} FROM {t} t WHERE {pred}",
    )


def q_datemath(g: Gen) -> tuple[str, str]:
    """Round-8 date clauses, dialect-mapped: WEEKOFYEAR ↔
    EXTRACT(WEEK), DATEDIFF unit spelling (unquoted keyword vs quoted
    string), day-name formatting (DATE_FORMAT 'EEEE' ↔ STRFTIME '%A'),
    plus portable QUARTER / DATE_PART / DATE_ADD riding along."""
    rng = g.rng
    t = rng.choice([x for x in TABLES if _cols_of(x, ("date",))])
    c = rng.choice(_cols_of(t, ("date",)))
    d = f"CAST(t.{c} AS DATE)"
    pk = TABLES[t]["pk"][0]
    items = []
    if rng.random() < 0.6:
        items.append(
            ("wk", f"CAST(WEEKOFYEAR({d}) AS INT)",
             f"CAST(EXTRACT(WEEK FROM {d}) AS INT)")
        )
    if rng.random() < 0.6:
        ref = f"DATE '199{rng.randint(2, 8)}-0{rng.randint(1, 9)}-15'"
        # DAY only: YEAR/MONTH units count complete periods on Spark
        # but calendar-boundary crossings on DuckDB — found BY this
        # shape's first seed and pinned by b22_datediff_unit_parity
        items.append(
            ("dd", f"CAST(DATEDIFF(DAY, {ref}, {d}) AS BIGINT)",
             f"CAST(DATEDIFF('day', {ref}, {d}) AS BIGINT)")
        )
    if rng.random() < 0.5:
        items.append(
            ("dn", f"DATE_FORMAT({d}, 'EEEE')", f"STRFTIME({d}, '%A')")
        )
    items.append(
        ("q", f"CAST(QUARTER({d}) AS INT)", f"CAST(QUARTER({d}) AS INT)")
    )
    items.append(
        ("yr", f"CAST(DATE_PART('year', {d}) AS BIGINT)",
         f"CAST(DATE_PART('year', {d}) AS BIGINT)")
    )
    pred = g.pred(t, "t", depth=1)
    sel_s = ", ".join(f"{s} AS {al}" for al, s, _ in items)
    sel_d = ", ".join(f"{dd} AS {al}" for al, _, dd in items)
    return (
        f"SELECT t.{pk} AS pk0, {sel_s} FROM {t} t WHERE {pred}",
        f"SELECT t.{pk} AS pk0, {sel_d} FROM {t} t WHERE {pred}",
    )


def q_struct(g: Gen) -> tuple[str, str]:
    """Round-8 struct clauses, dialect-mapped construction
    (``NAMED_STRUCT('a', x, …)`` ↔ ``STRUCT_PACK(a := x, …)``) with
    portable field access (``.a``, nested), lexicographic struct
    comparison, and struct-in-array element reads (mapped index
    base). All probed identical round 8."""
    rng = g.rng
    t = rng.choice([x for x in TABLES if x != "embeddings"])
    e1 = g.int_expr(t, "t", no_shr=True)
    e2 = g.int_expr(t, "t", no_shr=True)
    strs = _cols_of(t, ("str", "name"))
    sv = f"t.{rng.choice(strs)}" if strs else "'x'"

    def pack(fields_s: str, fields_d: str) -> tuple[str, str]:
        return f"NAMED_STRUCT({fields_s})", f"STRUCT_PACK({fields_d})"

    s1_s, s1_d = pack(f"'a', {e1}, 'b', {sv}", f"a := {e1}, b := {sv}")
    s2_s, s2_d = pack(
        f"'i', NAMED_STRUCT('j', {e2})", f"i := STRUCT_PACK(j := {e2})"
    )
    pk = TABLES[t]["pk"][0]
    pick = rng.random()
    pred = g.pred(t, "t", depth=1, no_shr=True)
    if pick < 0.4:
        # lexicographic struct comparison as a predicate
        op = rng.choice(["<", "<=", ">", "="])
        lit = rng.randint(0, 500)
        return (
            f"SELECT t.{pk} AS pk0, ({s1_s}).a AS x0, ({s2_s}).i.j AS x1 "
            f"FROM {t} t WHERE {pred} AND "
            f"NAMED_STRUCT('k', {e1}) {op} NAMED_STRUCT('k', {lit})",
            f"SELECT t.{pk} AS pk0, ({s1_d}).a AS x0, ({s2_d}).i.j AS x1 "
            f"FROM {t} t WHERE {pred} AND "
            f"STRUCT_PACK(k := {e1}) {op} STRUCT_PACK(k := {lit})",
        )
    # struct-in-array with mapped element index (drawn ONCE — the two
    # renderings must address the same element)
    idx = rng.randint(0, 1)
    return (
        f"SELECT t.{pk} AS pk0, ARRAY({s1_s}, {s1_s})[{idx}].b"
        f" AS x0, ({s2_s}).i.j AS x1 FROM {t} t WHERE {pred}",
        f"SELECT t.{pk} AS pk0, [{s1_d}, {s1_d}][{idx + 1}].b"
        f" AS x0, ({s2_d}).i.j AS x1 FROM {t} t WHERE {pred}",
    )


def q_map(g: Gen) -> tuple[str, str]:
    """Round-8 map clauses, dialect-mapped (probe ledger in the module
    docstring): construction ``MAP('k', v, …)`` ↔ ``MAP {'k': v, …}``,
    extraction ``m['k']`` ↔ ``m['k'][1]`` (the 1-based index unwraps
    DuckDB's list-valued extract; pinned as ``b25_map_extract_parity``),
    CARDINALITY / MAP_KEYS / MAP_VALUES spelled identically with
    construction-order keys on both. Sub-shapes: (a) literal
    string-keyed maps over int exprs with hit + miss extraction;
    (b) int-keyed maps; (c) a dynamic column-keyed map extracted by
    the same column (NULL-key-guarded — both engines reject NULL map
    keys at runtime). Literal keys distinct by construction."""
    rng = g.rng
    t = rng.choice([x for x in TABLES if x != "embeddings"])
    pk = TABLES[t]["pk"][0]
    pred = g.pred(t, "t", depth=1, no_shr=True)
    e1 = g.int_expr(t, "t", no_shr=True)
    e2 = g.int_expr(t, "t", no_shr=True)
    pick = rng.random()
    strs = _cols_of(t, ("str", "name"))
    if pick < 0.3 and strs:
        # dynamic column-valued key, extracted by the same column
        c = rng.choice(strs)
        return (
            f"SELECT t.{pk} AS pk0, MAP(t.{c}, {e1})[t.{c}] AS m0 "
            f"FROM {t} t WHERE ({pred}) AND t.{c} IS NOT NULL",
            f"SELECT t.{pk} AS pk0, (MAP {{t.{c}: {e1}}})[t.{c}][1] AS m0 "
            f"FROM {t} t WHERE ({pred}) AND t.{c} IS NOT NULL",
        )
    if pick < 0.55:
        # int keys
        k1, k2 = rng.sample([1, 3, 7, 9], 2)
        m_s = f"MAP({k1}, {e1}, {k2}, {e2})"
        m_d = f"MAP {{{k1}: {e1}, {k2}: {e2}}}"
        hit, miss = k1, 5
        return (
            f"SELECT t.{pk} AS pk0, {m_s}[{hit}] AS m0, "
            f"{m_s}[{miss}] AS m1 FROM {t} t WHERE {pred}",
            f"SELECT t.{pk} AS pk0, ({m_d})[{hit}][1] AS m0, "
            f"({m_d})[{miss}][1] AS m1 FROM {t} t WHERE {pred}",
        )
    # literal string keys: hit/miss extraction, cardinality, keys/values
    k1, k2 = rng.sample(["aa", "bb", "cc", "dd"], 2)
    m_s = f"MAP('{k1}', {e1}, '{k2}', {e2})"
    m_d = f"MAP {{'{k1}': {e1}, '{k2}': {e2}}}"
    pool = [
        ("m0", f"{m_s}['{k1}']", f"({m_d})['{k1}'][1]"),
        ("m1", f"{m_s}['zz']", f"({m_d})['zz'][1]"),
        ("m2", f"CAST(CARDINALITY({m_s}) AS INT)",
         f"CAST(CARDINALITY({m_d}) AS INT)"),
        ("m3", f"MAP_KEYS({m_s})", f"MAP_KEYS({m_d})"),
        ("m4", f"MAP_VALUES({m_s})", f"MAP_VALUES({m_d})"),
    ]
    keep = sorted(rng.sample(range(len(pool)), rng.randint(2, 3)))
    sel_s = ", ".join(f"{pool[k][1]} AS {pool[k][0]}" for k in keep)
    sel_d = ", ".join(f"{pool[k][2]} AS {pool[k][0]}" for k in keep)
    return (
        f"SELECT t.{pk} AS pk0, {sel_s} FROM {t} t WHERE {pred}",
        f"SELECT t.{pk} AS pk0, {sel_d} FROM {t} t WHERE {pred}",
    )


def q_timestamp(g: Gen) -> tuple[str, str]:
    """Round-8 timestamp clauses needing DIALECT-mapped spellings
    (the same-text-portable ones — raw comparisons, EXTRACT ints,
    DATE_TRUNC+CAST, intervals, MIN/MAX — live in the generic
    projections()/pred()/aggs() pools): epoch seconds
    (``UNIX_TIMESTAMP`` ↔ ``CAST(FLOOR(EPOCH(…)) AS BIGINT)`` — DuckDB
    EPOCH is a fractional double; positive-epoch data only, where
    truncation == floor), epoch micros (``UNIX_MICROS`` ↔
    ``EPOCH_US``), and hour-format strings (``DATE_FORMAT`` pattern
    letters ↔ ``STRFTIME`` percent codes). Plus a trunc-bucket
    GROUP BY leg exercising the portable DATE_TRUNC recipe through an
    aggregate."""
    rng = g.rng
    t = "events"
    ts = "t.ts"
    pred = g.pred(t, "t", depth=1)
    if rng.random() < 0.45:
        g_gran = rng.choice(["minute", "hour", "day"])
        return (
            f"SELECT CAST(DATE_TRUNC('{g_gran}', {ts}) AS TIMESTAMP)"
            f" AS g0, COUNT(*) AS cnt, MIN(t.event_id) AS a0"
            f" FROM events t WHERE {pred}"
            f" GROUP BY CAST(DATE_TRUNC('{g_gran}', {ts}) AS TIMESTAMP)",
        ) * 2
    pick = rng.random()
    if pick < 0.2:
        # time-based RANGE frame — same text both engines (probed);
        # peers are frame-included by definition so tied ts stay
        # deterministic without a tiebreak
        n = rng.randint(5, 180)
        unit = rng.choice(["MINUTE", "HOUR"])
        fn = rng.choice(["COUNT(*)", "SUM(t.event_id)",
                         "MIN(t.event_id)"])
        return (
            f"SELECT t.event_id AS pk0, {fn} OVER ("
            f"PARTITION BY t.user_id ORDER BY t.ts "
            f"RANGE BETWEEN INTERVAL {n} {unit} PRECEDING"
            f" AND CURRENT ROW) AS w0"
            f" FROM events t WHERE {pred}",
        ) * 2
    if pick < 0.45:
        # the sessionization shape: per-user inter-event gap via
        # LAG over (ts, pk) — total order, NULL first-row on both
        w = ("OVER (PARTITION BY t.user_id "
             "ORDER BY t.ts ASC, t.event_id ASC)")
        return (
            f"SELECT t.event_id AS pk0, UNIX_MICROS(t.ts)"
            f" - UNIX_MICROS(LAG({ts}, 1) {w}) AS gap_us"
            f" FROM events t WHERE {pred}",
            f"SELECT t.event_id AS pk0, EPOCH_US(t.ts)"
            f" - EPOCH_US(LAG({ts}, 1) {w}) AS gap_us"
            f" FROM events t WHERE {pred}",
        )
    items = [
        ("u0", f"UNIX_TIMESTAMP({ts})",
         f"CAST(FLOOR(EPOCH({ts})) AS BIGINT)"),
        ("u1", f"UNIX_MICROS({ts})", f"EPOCH_US({ts})"),
        ("u2", f"DATE_FORMAT({ts}, 'yyyy-MM-dd HH')",
         f"STRFTIME({ts}, '%Y-%m-%d %H')"),
        ("u3", f"DATE_FORMAT({ts}, 'HH:mm')", f"STRFTIME({ts}, '%H:%M')"),
    ]
    keep = sorted(rng.sample(range(len(items)), rng.randint(2, 3)))
    sel_s = ", ".join(f"{items[k][1]} AS {items[k][0]}" for k in keep)
    sel_d = ", ".join(f"{items[k][2]} AS {items[k][0]}" for k in keep)
    return (
        f"SELECT t.event_id AS pk0, {sel_s} FROM events t WHERE {pred}",
        f"SELECT t.event_id AS pk0, {sel_d} FROM events t WHERE {pred}",
    )


def q_intdiv(g: Gen) -> tuple[str, str]:
    """Round-8 (late) integer division, dialect-mapped: Spark ``DIV``
    ↔ DuckDB ``//`` — probed to agree on NEGATIVE dividends (both
    truncate toward zero: -107/10 → -10), as does signed ``%``
    (truncated mod: -107 % 10 = -7). Pinned here because the EWMA
    review bug showed this exact class diverging between DuckDB and
    PYTHON floor division — the SQL pair is safe, the Python twin is
    not, and this shape keeps the SQL pair proven. The subtraction
    makes the dividend genuinely signed on fixture data."""
    rng = g.rng
    t = rng.choice(["lineitem", "orders", "events"])
    ints = _cols_of(t, ("int",))
    a = rng.choice(ints)
    b = rng.choice(ints)
    n = rng.randint(2, 97)
    pk = TABLES[t]["pk"][0]
    pred = g.pred(t, "t", depth=1)
    expr = f"(t.{a} - 3 * t.{b})"
    return (
        f"SELECT t.{pk} AS pk0, {expr} DIV {n} AS q0,"
        f" {expr} % {n} AS r0 FROM {t} t WHERE {pred}",
        f"SELECT t.{pk} AS pk0, {expr} // {n} AS q0,"
        f" {expr} % {n} AS r0 FROM {t} t WHERE {pred}",
    )


SHAPES = [
    (q_scan, 4),
    (q_agg, 4),
    (q_join, 5),
    (q_window, 3),
    (q_setop, 2),
    (q_limit, 2),
    (q_scalar_subq, 2),
    (q_cte, 1),
    (q_rollup, 2),
    (q_join3, 3),
    (q_window_frame, 2),
    (q_string, 3),
    (q_regexp, 2),
    (q_json, 2),
    (q_array, 3),
    (q_datemath, 2),
    (q_struct, 2),
    (q_map, 2),
    (q_timestamp, 2),
    (q_exists, 2),
    (q_derived, 2),
    (q_intdiv, 2),
    (q_lateral, 2),
]


def gen_query(rng: random.Random, pools: dict) -> str:
    g = Gen(rng, pools)
    shapes = [s for s, w in SHAPES for _ in range(w)]
    return rng.choice(shapes)(g)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _known_divergence(
    sql: str, srows: list, orows: list, ocols: list | None = None
) -> str | None:
    """Classify documented engine divergences so the fuzzer keeps
    GENERATING the risky construct (regressions in our handling would
    still surface as a different mismatch shape) without failing on the
    engine difference itself.

    Currently one entry: ANSI says GROUP BY ROLLUP/CUBE/GROUPING SETS
    containing the grand-total set ``()`` emits one aggregate row even
    over empty input; Spark's Expand-based implementation emits zero
    rows. Pinned (with the compliant Spark recipe) by the registry
    query ``b14_empty_grand_total``.
    """
    u = sql.upper()
    grouping = "ROLLUP" in u or "CUBE" in u or "GROUPING SETS" in u
    if grouping and len(srows) == 0 and len(orows) == 1:
        # the one extra DuckDB row must actually BE the grand total —
        # all group keys NULL, COUNT(*) zero — so a genuine Spark
        # zero-rows bug can't hide behind the classifier
        if ocols is not None:
            row = dict(zip(ocols, orows[0]))
            keys_null = all(
                row[c] is None for c in ocols if c.startswith("g")
            )
            cnt_zero = row.get("cnt", 0) == 0
            if not (keys_null and cnt_zero):
                return None
        return "empty-input grand-total row (b14_empty_grand_total)"
    return None


def run_fuzz(
    spark,
    sf_dir: str,
    n: int = 150,
    seed: str = "42",
    only: int | None = None,
    quiet: bool = False,
):
    """Generate+run n paired queries; returns (total, failures).

    failures: list of (index, sql, reason). Reusable from pytest
    (tests/test_fuzz.py) so the fuzz target runs in CI every round.
    """
    from event_streamer_spark.tables import register_views

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    register_views(spark, sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    pools = build_literal_pools(con)

    def say(msg):
        if not quiet:
            print(msg, flush=True)

    failures = []
    indices = [only] if only is not None else range(n)
    for i in indices:
        rng = random.Random(f"{seed}:{i}")
        q = gen_query(rng, pools)
        # portable shapes emit ONE string run verbatim on both engines;
        # dialect-mapped shapes (module docstring) emit a
        # (spark_sql, duckdb_sql) pair built from one skeleton
        ssql, dsql = (q, q) if isinstance(q, str) else q
        sql = ssql if ssql == dsql else f"{ssql}\n      DUCK: {dsql}"
        reason = None
        try:
            sdf = spark.sql(ssql)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            reason = f"SPARK ERROR {type(e).__name__}: {str(e)[:300]}"
            srows = scols = None
        if reason is None:
            try:
                rel = con.sql(dsql)
                ocols = rel.columns
                orows = rel.fetchall()
            except Exception as e:  # noqa: BLE001
                reason = f"DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}"
        if reason is None:
            if [c.lower() for c in sorted(scols)] != [
                c.lower() for c in sorted(ocols)
            ]:
                reason = f"columns spark={scols} duckdb={ocols}"
            elif len(srows) != len(orows):
                known = _known_divergence(sql, srows, orows, ocols)
                if known is not None:
                    say(f"known [{seed}:{i}] {known}")
                else:
                    reason = (
                        f"rowcount spark={len(srows)} duckdb={len(orows)}"
                    )
            elif canon_hash(scols, srows) != canon_hash(ocols, orows):
                order_s = sorted(range(len(scols)), key=lambda j: scols[j])
                order_o = sorted(range(len(ocols)), key=lambda j: ocols[j])
                set_s = {
                    "\x1f".join(canon_value(r[j]) for j in order_s)
                    for r in srows
                }
                set_o = {
                    "\x1f".join(canon_value(r[j]) for j in order_o)
                    for r in orows
                }
                diff = list(set_s - set_o)[:2] + [
                    "||duck: " + x for x in list(set_o - set_s)[:2]
                ]
                reason = f"value-hash mismatch: {diff}"
        if reason is not None:
            say(f"FAIL  [{seed}:{i}] {reason}\n      SQL: {sql}")
            failures.append((i, sql, reason))
        elif i % 25 == 0:
            say(f"ok    [{seed}:{i}] ({len(srows)} rows)")
    total = 1 if only is not None else n
    say(f"\n{total - len(failures)}/{total} ok (seed={seed}); "
        f"failures: {[i for i, _, _ in failures]}")
    return total, failures


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", default="42")
    ap.add_argument("--only", type=int, default=None)
    args = ap.parse_args()
    from event_streamer_spark.session import get_spark

    spark = get_spark("fuzz-oracles", shuffle_partitions=8)
    _, failures = run_fuzz(
        spark, args.sf_dir, n=args.n, seed=args.seed, only=args.only
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
