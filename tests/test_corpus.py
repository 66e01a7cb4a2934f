"""Corpus-curation extensions (corpus.py): DSIR importance resampling,
Zipf slope, incremental dedup, GROUPS-frame emulation — semantic
invariants against independent Python recomputes on the sf0.001
fixture (the DuckDB oracle harness covers cross-engine equality; these
pin the SEMANTICS against a second, non-SQL reference)."""

import collections
import hashlib
import math

import pyarrow.parquet as pq

from event_streamer_spark.operators import REGISTRY

SF = "/root/testdata/sf0.001"


def test_groups_frame_matches_python_reference(spark):
    """Every (priority, year) rollup of the emulated GROUPS ±1 frame
    must equal a brute-force peer-group recompute: for each order, the
    frame is all orders of its own orderdate plus the adjacent
    earlier/later DISTINCT orderdates within the priority class."""
    t = pq.read_table(f"{SF}/orders.parquet").to_pylist()
    by_prio = collections.defaultdict(list)
    for r in t:
        by_prio[r["o_orderpriority"]].append(r)
    expect = collections.defaultdict(
        lambda: {"n_rows": 0, "sum_total": 0, "max_total": None, "sum_n": 0}
    )
    for prio, rows in by_prio.items():
        dates = sorted({r["o_orderdate"] for r in rows})
        idx = {d: i for i, d in enumerate(dates)}
        by_date = collections.defaultdict(list)
        for r in rows:
            by_date[idx[r["o_orderdate"]]].append(
                round(float(r["o_totalprice"]) * 100)
            )
        for r in rows:
            g = idx[r["o_orderdate"]]
            frame = [
                c
                for gg in (g - 1, g, g + 1)
                for c in by_date.get(gg, [])
            ]
            key = (prio, r["o_orderdate"].year)
            e = expect[key]
            e["n_rows"] += 1
            e["sum_total"] += sum(frame)
            e["sum_n"] += len(frame)
            e["max_total"] = (
                sum(frame)
                if e["max_total"] is None
                else max(e["max_total"], sum(frame))
            )
    got = {
        (r["o_orderpriority"], r["yr"]): r
        for r in REGISTRY["b75_groups_frame"].fn(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for key, e in expect.items():
        r = got[key]
        assert r["n_rows"] == e["n_rows"], key
        assert r["sum_frame_total_c"] == e["sum_total"], key
        assert r["max_frame_total_c"] == e["max_total"], key
        assert r["sum_frame_n"] == e["sum_n"], key


def test_dsir_targets_english(spark):
    """DSIR with target = the lang='en' slice must score English
    documents above every other language on average (the whole point
    of importance resampling: up-weight docs that look like the
    target distribution)."""
    rows = REGISTRY["d7_dsir_resample"].fn(spark, SF).collect()
    langs = {
        r["doc_id"]: r["lang"]
        for r in pq.read_table(f"{SF}/documents.parquet").to_pylist()
    }
    by_lang = collections.defaultdict(list)
    for r in rows:
        by_lang[langs[r["doc_id"]]].append(r["dsir_score"])
    means = {
        lang: sum(v) / len(v) for lang, v in by_lang.items() if v
    }
    assert means["en"] > 0
    for lang, m in means.items():
        if lang != "en":
            assert means["en"] > m, (lang, m)


def test_dsir_rank_is_per_source_permutation(spark):
    """src_rank must be exactly 1..n within each source, ordered by
    (score desc, doc_id asc) — the per-source quota selection
    contract."""
    rows = REGISTRY["d7_dsir_resample"].fn(spark, SF).collect()
    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r["source"]].append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r["src_rank"])
        assert [r["src_rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["dsir_score"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys), src


def test_zipf_slope_negative_and_bounded(spark):
    """Token frequency is non-increasing in rank by construction, so
    every fitted slope must be <= 0; fixture sources are word-soup
    natural-ish text, so the slope should be in a sane (-3, 0) band
    and the rank cap must hold."""
    rows = REGISTRY["d4_zipf_slope"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_ranks"] <= 100
        if r["zipf_slope"] is not None:
            assert -3.0 < r["zipf_slope"] <= 0.0, r


def test_zipf_slope_matches_python_ols(spark):
    """Exact-integer OLS must equal a float OLS recompute to the
    rounding grain (the micro-int protocol changes the arithmetic
    path, never the fit)."""
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    # mirror the canonicalization: one (min text,lang,source) per id
    best = {}
    for r in docs:
        key = (
            r["text"] is None, r["text"],
            r["lang"] is None, r["lang"],
            r["source"] is None, r["source"],
        )
        if r["doc_id"] not in best or key < best[r["doc_id"]][0]:
            best[r["doc_id"]] = (key, r)
    cnt = collections.defaultdict(collections.Counter)
    for _, r in best.values():
        if r["text"] is not None:
            cnt[r["source"]].update(r["text"].split(" "))
    got = {
        r["source"]: r["zipf_slope"]
        for r in REGISTRY["d4_zipf_slope"].fn(spark, SF).collect()
    }
    for src, counter in cnt.items():
        ranked = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (math.log(i + 1), math.log(c))
            for i, (_, c) in enumerate(ranked[:100])
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        den = n * sxx - sx * sx
        if den == 0:
            assert got[src] is None
        else:
            assert abs(got[src] - (n * sxy - sx * sy) / den) < 1e-4, src


def test_incremental_dedup_matches_python_reference(spark):
    """is_dup / n_base_copies / first_seen must equal a hashlib-based
    recompute of the snapshot split."""
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    base = collections.defaultdict(list)
    incoming = []
    for r in docs:
        h = (
            hashlib.sha256(r["text"].encode()).hexdigest()
            if r["text"] is not None
            else None
        )
        if r["doc_id"] % 10 == 7:
            incoming.append((r["doc_id"], h))
        elif h is not None:
            base[h].append(r["doc_id"])
    got = {
        r["doc_id"]: r
        for r in REGISTRY["d2_incremental_dedup"].fn(spark, SF).collect()
    }
    assert set(got) == {d for d, _ in incoming}
    for doc_id, h in incoming:
        r = got[doc_id]
        hits = base.get(h, []) if h is not None else []
        assert r["is_dup"] == (1 if hits else 0), doc_id
        assert r["n_base_copies"] == len(hits), doc_id
        assert r["first_seen"] == (min(hits) if hits else None), doc_id


def test_pca_model_matches_numpy_reference(spark):
    """The distributed partial-Gram PCA must reproduce a full-matrix
    numpy PCA on the fixture: same eigenvalues (1e-6), same components
    up to the pinned sign convention, same mean, exact n."""
    import numpy as np

    from event_streamer_spark.operators.corpus import pca_model

    vals, comps, mu, n = pca_model(spark, SF)
    X = np.array(
        [
            r["embedding"]
            for r in pq.read_table(f"{SF}/embeddings.parquet").to_pylist()
            if r["embedding"] is not None and len(r["embedding"]) == 64
        ],
        dtype=np.float64,
    )
    assert n == len(X)
    ref_mu = X.mean(axis=0)
    C = np.cov(X.T, bias=True)
    ref_vals, ref_vecs = np.linalg.eigh(C)
    order = np.argsort(ref_vals)[::-1][: len(vals)]
    assert np.abs(mu - ref_mu).max() < 1e-9
    assert np.abs(vals - ref_vals[order]).max() < 1e-9
    for r in range(len(vals)):
        ref = ref_vecs[:, order[r]]
        # sign convention: largest-|.| component positive
        if ref[int(np.argmax(np.abs(ref)))] < 0:
            ref = -ref
        assert np.abs(comps[r] - ref).max() < 1e-8, r


def test_pca_variance_metrics_all_pass(spark):
    rows = {
        r["metric"]: r["value"]
        for r in REGISTRY["d3_pca_variance"].fn(spark, SF).collect()
    }
    assert rows["dim"] == 64
    assert rows["n_vectors"] > 0
    assert rows["pc1_dominates_axes"] == 1
    assert rows["eigs_sorted_desc"] == 1
    assert rows["components_orthonormal"] == 1
