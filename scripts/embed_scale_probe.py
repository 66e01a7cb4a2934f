"""Embedding-scale stress probe (VERDICT r10 #4): run the retrieval /
near-dup scale paths at realistic vector counts and pin recall + wall
curves in one artifact.

The fixture embeddings table is 2k–200k×64-dim; the 100 TB ANN claims
lean on designs (sqrt-n IVF cells, banded LSH, PQ codes) whose behavior
only shows at real vector counts. This measures, per corpus:

* **IVF kNN-graph build** — train a √n-cell spherical-k-means coarse
  quantizer, build the all-vectors top-3 graph (`_ivf_topk_impl`), and
  score recall@3 against EXACT brute-force for a 32-query sample (the
  full-corpus exact oracle is quadratic-infeasible at 2M — by design;
  the sampled oracle is one broadcast GEMM pass, linear).
* **Banded-LSH near-dup** — `neardup_lsh_pruned_pairs` at the
  PRODUCTION band geometry (16 bands × 24 rows, threshold 0.9 — deep
  bands are mandatory once n >> 2^rows; the fixture's 16×4 is a
  cos≈0.45-regime choice that goes quadratic at 50k, see the operator
  docstring) — wall + recall against the generator's PLANTED near-dup
  ground truth (cos ≈ 0.9999 pairs).
* **PQ+ADC top-10** — the registered `d3_pq_topk` plan verbatim,
  recall@10 vs exact brute-force for the fixed query vector.
* **Streaming IVF ingest** — the corpus replayed through
  `ivf_ingest_batch` in 10 micro-batches into the cell-partitioned
  parquet index, then one `ivf_query` probe (partition-pruned).

Usage::

    python scripts/gen_embed.py /tmp/emb500k --rows 500000  --dim 256
    python scripts/gen_embed.py /tmp/emb2m   --rows 2000000 --dim 256
    python scripts/embed_scale_probe.py /tmp/emb500k /tmp/emb2m \
        --out EMBED_SCALE_r11.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def exact_topk_sampled(spark, emb, query_ids, k=3):
    """Exact top-k for a bounded query sample: one broadcast-GEMM pass
    over the corpus (mapInPandas emits per-batch local top-k per query;
    the global merge is |queries|·k·n_batches rows — model-sized)."""
    qrows = emb.filter(F.col("vec_id").isin(query_ids)).collect()
    qids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    Q = np.array([r["v"] for r in qrows], dtype=np.float64)
    Q = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, Q))

    def local_topk(batches):
        ids_q, Qm = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            X = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = np.round(Qm @ X.T, 6)  # queries × batch
            vid = pdf["vec_id"].to_numpy()
            out = {"src": [], "nbr": [], "sim": []}
            for qi in range(len(ids_q)):
                sims = S[qi].copy()
                sims[vid == ids_q[qi]] = -2.0  # self
                take = min(k, len(vid))
                cand = np.argpartition(-sims, take - 1)[: max(take, 32)]
                order = cand[np.lexsort((vid[cand], -sims[cand]))][:take]
                out["src"].extend([ids_q[qi]] * len(order))
                out["nbr"].extend(vid[order].tolist())
                out["sim"].extend(sims[order].tolist())
            yield pd.DataFrame(out)

    local = emb.mapInPandas(
        local_topk, "src long, nbr long, sim double"
    ).collect()
    best: dict[int, list] = {}
    for r in local:
        best.setdefault(r["src"], []).append((-r["sim"], r["nbr"]))
    return {
        s: [n for _, n in sorted(v)[:k]] for s, v in best.items()
    }


def probe_corpus(spark, d: str) -> dict:
    from event_streamer_spark.operators.similarity import (
        _ivf_topk_impl,
        d3_pq_topk,
        load_embeddings,
        neardup_lsh_pruned_pairs,
        train_ivf_centroids,
    )
    from event_streamer_spark.streaming.ann import (
        ivf_ingest_batch,
        ivf_query,
    )

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    emb = load_embeddings(spark, d).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    n = emb.count()
    dim = emb.select(F.size("v")).head()[0]
    k_cells = int(math.sqrt(n))
    out: dict = {"dir": d, "n": n, "dim": dim, "ivf_cells": k_cells}
    log(f"{d}: n={n} dim={dim} k={k_cells}")

    # --- IVF kNN-graph build + sampled exact recall@3 ---------------
    t0 = time.time()
    cents = train_ivf_centroids(spark, emb, k=k_cells)
    out["ivf_train_sec"] = round(time.time() - t0, 2)
    log(f"ivf train {out['ivf_train_sec']}s")
    t0 = time.time()
    pairs = _ivf_topk_impl(spark, d, cents)
    step = n // 32
    qids = [i * step + 7 for i in range(32)]
    got = (
        pairs.filter(F.col("src").isin(qids))
        .orderBy("src", F.desc("sim"), "nbr")
        .collect()
    )
    out["ivf_build_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    truth = exact_topk_sampled(spark, emb, qids, k=3)
    out["exact_sample_sec"] = round(time.time() - t0, 2)
    by_src: dict[int, list] = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r["nbr"])
    hits = sum(
        len(set(by_src.get(s, [])[:3]) & set(t)) for s, t in truth.items()
    )
    out["ivf_recall_at3"] = round(hits / (3 * len(truth)), 4)
    log(
        f"ivf build {out['ivf_build_sec']}s exact {out['exact_sample_sec']}s "
        f"recall@3 {out['ivf_recall_at3']}"
    )

    # --- multi-probe leg (r12): single-probe recall is geometry-
    # dependent (sparse clusters lose boundary neighbors — see the
    # _ivf_topk_impl docstring); nprobe=4 is the standard cure. Same
    # qids, same truth, so the two recall columns are comparable.
    t0 = time.time()
    pairs4 = _ivf_topk_impl(spark, d, cents, nprobe=4)
    got4 = (
        pairs4.filter(F.col("src").isin(qids))
        .orderBy("src", F.desc("sim"), "nbr")
        .collect()
    )
    out["ivf_build_nprobe4_sec"] = round(time.time() - t0, 2)
    by_src4: dict[int, list] = {}
    for r in got4:
        by_src4.setdefault(r["src"], []).append(r["nbr"])
    hits4 = sum(
        len(set(by_src4.get(s, [])[:3]) & set(t)) for s, t in truth.items()
    )
    out["ivf_recall_at3_nprobe4"] = round(hits4 / (3 * len(truth)), 4)
    log(
        f"ivf nprobe4 build {out['ivf_build_nprobe4_sec']}s "
        f"recall@3 {out['ivf_recall_at3_nprobe4']}"
    )

    # --- banded-LSH near-dup + planted recall ------------------------
    # r13: isolate phases — at 2M×256 the IVF phases' persisted frames
    # (~4 GB of array columns + derivatives) outgrow the local 8 g
    # JVM's storage fraction and every LATER phase pays their eviction
    # GC churn instead of its own cost (measured: in-session pq read
    # 169 s vs 60 s in a fresh session, same code). Cleared caches make
    # each phase's wall ITS wall (guide §1.4/§5); phase order is
    # unchanged, so train/build columns stay comparable with r12.
    spark.catalog.clearCache()
    t0 = time.time()
    found = neardup_lsh_pruned_pairs(
        spark, d, bands=16, rows=24, threshold=0.9
    ).select("vec_a", "vec_b")
    planted = spark.read.parquet(f"{d}/planted_pairs.parquet")
    n_planted = planted.count()
    n_hit = found.join(planted, ["vec_a", "vec_b"], "left_semi").count()
    out["lsh_neardup_sec"] = round(time.time() - t0, 2)
    out["lsh_planted_pairs"] = n_planted
    out["lsh_planted_recall"] = round(n_hit / max(1, n_planted), 4)
    log(
        f"lsh {out['lsh_neardup_sec']}s planted recall "
        f"{out['lsh_planted_recall']}"
    )

    # --- PQ+ADC re-rank top-10 vs exact ------------------------------
    # pq cost curve (r12, VERDICT #1): the ADC shortlist saturates its
    # 4096 cap at every corpus here (n/5 >= 4096 from 20480 vectors
    # up), so the exact re-rank cost is CONSTANT across these corpora
    # and the wall should scale with the linear ADC scan alone — the
    # r11 artifact's 90 s at 500k vs 34 s at 2M was mixed code states
    # (shortlist sizing changed mid-probe), not a real inversion; the
    # shortlist size is recorded per corpus so that can't hide again.
    spark.catalog.clearCache()  # phase isolation (see the lsh note)
    t0 = time.time()
    pq_ids = {r["vec_id"] for r in d3_pq_topk(spark, d).collect()}
    out["pq_topk_sec"] = round(time.time() - t0, 2)
    out["pq_shortlist"] = max(64, min(4096, n // 5))
    exact10 = exact_topk_sampled(spark, emb, [0], k=10)[0]
    out["pq_recall_at10"] = round(len(pq_ids & set(exact10)) / 10, 4)
    log(f"pq {out['pq_topk_sec']}s recall@10 {out['pq_recall_at10']}")

    # --- streaming IVF ingest + pruned query --------------------------
    spark.catalog.clearCache()  # phase isolation (see the lsh note)
    state = f"/tmp/ivf_ingest_probe_{n}"
    shutil.rmtree(state, ignore_errors=True)
    ingest = ivf_ingest_batch(state, cents)
    t0 = time.time()
    n_batches = 10
    for b in range(n_batches):
        ingest(emb.filter(F.col("vec_id") % n_batches == b), b)
    out["stream_ingest_sec"] = round(time.time() - t0, 2)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 7).head()["v"]]
    t0 = time.time()
    res = ivf_query(
        spark, state, cents, qv, k=10, nprobe=max(1, k_cells // 16)
    ).collect()
    out["stream_query_sec"] = round(time.time() - t0, 2)
    out["stream_query_rows"] = len(res)
    shutil.rmtree(state, ignore_errors=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from event_streamer_spark.session import get_spark

    # 2M×256 doubles is a ~4 GiB working set; local mode shares one
    # JVM between driver and all 32 executor threads, so the default
    # 8g heap OOMs under cache + Arrow buffers. A real cluster sizes
    # executor memory to the partition working set the same way.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    spark = get_spark("embed-scale-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # box-speed sentinel (r12): same convention as bench.py, so probe
    # walls compare across rounds in sentinel units, not raw seconds
    from bench import _sentinel

    spark.range(100).count()  # JVM warm-up before the sentinel
    sentinel = _sentinel(spark)
    print(f"# sentinel: {sentinel}", file=sys.stderr, flush=True)
    results = []
    for d in args.dirs:
        r = probe_corpus(spark, d)
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"corpora": results, "sentinel": sentinel}, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
