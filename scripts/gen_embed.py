"""Deterministic large-embedding corpus generator (VERDICT r10 #4).

The fixture embeddings table tops out at 200k×64-dim (sf10) — tiny
next to the 100 TB ANN/dedup claims. This writes a clustered unit-
vector corpus at arbitrary (rows, dim) so the retrieval/dedup scale
paths can be measured at realistic vector counts::

    python scripts/gen_embed.py /tmp/emb500k --rows 500000  --dim 256
    python scripts/gen_embed.py /tmp/emb2m   --rows 2000000 --dim 256

Output: ``{out}/embeddings.parquet`` with the fixture schema
(vec_id BIGINT, embedding FLOAT[], label INT) so every registered
similarity/dedup operator reads it through the normal ``tables.load``
path, plus ``{out}/planted_pairs.parquet`` — the ground-truth near-dup
pairs the generator planted, for recall scoring.

Geometry (all seeded, byte-reproducible):

* ``--clusters`` seeded Gaussian unit centroids; each vector is
  normalize(centroid + N(0, sigma) noise) with sigma set so the
  EXPECTED within-cluster cosine is ~0.30 — below the 0.45 near-dup
  threshold, so the bulk corpus is NOT one giant near-dup clique (2M
  mutually-similar vectors would make the exact pair set ~10^9 rows —
  a different workload, not a scale-up; same reasoning as gen_sf1's
  document permutation).
* ``--dup-frac`` of rows (default 0.5%) are PLANTED near-duplicates: a
  copy of an earlier row with tiny noise (cos ≥ ~0.99). These are the
  known positives for LSH recall at a scale where the exact all-pairs
  oracle is quadratic-infeasible.
* vec_id 0 exists (the similarity module's fixed query-vector id) and
  ``label`` is the cluster id, matching the fixture's column role.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CHUNK = 100_000


def generate(
    out_dir: str,
    rows: int = 2_000_000,
    dim: int = 256,
    clusters: int = 1024,
    dup_frac: float = 0.005,
    seed: int = 11,
) -> int:
    """Write the corpus; returns the number of planted near-dup pairs.

    Callable from pytest (tests/test_embed_scale.py, r12) so the
    dimension-generic IVF/PQ/LSH code paths get exercised at a
    non-fixture dim every round, not once per manual probe."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    cents = rng.standard_normal((clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    # within-cluster cosine for normalize(c + n), n ~ N(0, s^2 I):
    # E[cos] ≈ 1 / (1 + dim·s^2); target 0.30 → dim·s^2 ≈ 7/3
    sigma = float(np.sqrt((1 / 0.30 - 1.0) / dim))

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    planted_src: list[int] = []
    planted_dup: list[int] = []
    writer = pq.ParquetWriter(
        os.path.join(out_dir, "embeddings.parquet"), schema
    )
    for lo in range(0, rows, CHUNK):
        n = min(CHUNK, rows - lo)
        crng = np.random.RandomState(seed + lo + 1)
        labels = crng.randint(0, clusters, size=n)
        X = cents[labels] + sigma * crng.standard_normal((n, dim))
        # planted near-dups: overwrite a seeded subset with a tiny
        # perturbation of ANOTHER row in the same chunk (source index
        # strictly lower, so (src, dup) is a canonical lo<hi pair)
        n_dup = int(n * dup_frac)
        if n_dup:
            dup_pos = crng.choice(np.arange(1, n), size=n_dup, replace=False)
            src_pos = (crng.rand(n_dup) * dup_pos).astype(np.int64)
            # a src that is ITSELF a dup target gets overwritten by the
            # fancy assignment below, silently breaking that planted
            # pair's ground truth (~0.5% of pairs pre-r12) — resample
            # those srcs until every src is outside the dup set (always
            # terminates: position 0 is never a dup target)
            dup_set = set(dup_pos.tolist())
            bad = np.array([s in dup_set for s in src_pos])
            while bad.any():
                src_pos[bad] = (
                    crng.rand(int(bad.sum())) * dup_pos[bad]
                ).astype(np.int64)
                bad = np.array([s in dup_set for s in src_pos])
            X[dup_pos] = X[src_pos] + 0.01 * sigma * crng.standard_normal(
                (n_dup, dim)
            )
            labels[dup_pos] = labels[src_pos]
            planted_src.extend((lo + src_pos).tolist())
            planted_dup.extend((lo + dup_pos).tolist())
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        writer.write_table(
            pa.Table.from_arrays(
                [
                    pa.array(np.arange(lo, lo + n), type=pa.int64()),
                    pa.array(list(X.astype(np.float32))),
                    pa.array(labels.astype(np.int32)),
                ],
                schema=schema,
            )
        )
    writer.close()
    pq.write_table(
        pa.Table.from_arrays(
            [
                pa.array(planted_src, type=pa.int64()),
                pa.array(planted_dup, type=pa.int64()),
            ],
            names=["vec_a", "vec_b"],
        ),
        os.path.join(out_dir, "planted_pairs.parquet"),
    )
    print(
        f"wrote {rows}x{dim} ({clusters} clusters, "
        f"{len(planted_dup)} planted near-dups, sigma={sigma:.4f}) "
        f"-> {out_dir}"
    )
    return len(planted_dup)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--dup-frac", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=11)
    a = ap.parse_args()
    generate(a.out_dir, rows=a.rows, dim=a.dim, clusters=a.clusters,
             dup_frac=a.dup_frac, seed=a.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
