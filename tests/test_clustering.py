"""connected_components: known-topology graphs → exact component labels.

The DuckDB oracle covers the full d2_dup_clusters pipeline; these tests
pin the CC kernel itself on adversarial shapes (chains that need
multiple propagation rounds, singletons, dense cliques).
"""

from pyspark.sql import functions as F

from event_streamer_spark.operators.clustering import connected_components


def _cc(spark, n_vertices, edge_list):
    vertices = spark.createDataFrame(
        [(i,) for i in range(n_vertices)], "id long"
    )
    edges = spark.createDataFrame(edge_list, "u long, v long")
    rows = connected_components(vertices, edges).collect()
    return {r["id"]: r["label"] for r in rows}


def test_two_triangles_and_singleton(spark):
    labels = _cc(spark, 7, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    assert labels == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6}


def test_long_chain_converges(spark):
    # a 12-vertex path: worst case for plain propagation (diameter 11);
    # pointer jumping must still reach the fixpoint within max_rounds
    n = 12
    labels = _cc(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert labels == {i: 0 for i in range(n)}


def test_deep_chain_converges_through_adaptive_checkpoints(spark):
    # a 1,024-vertex path needs ~11 pointer-jumping rounds — enough to
    # cross the adaptive localCheckpoint trigger AND the hard cadence
    # cap (r14: the un-truncated plan grows ~4×/round; the r13
    # every-10 cadence OOMed a 32k chain on plan state). Correctness
    # through checkpoint boundaries is what this pins; the wall is
    # bounded by the adaptive cadence (~25 s at 4k in the round log).
    n = 1024
    labels = _cc(spark, n, [(i, i + 1) for i in range(n - 1)])
    assert labels == {i: 0 for i in range(n)}


def test_edges_direction_irrelevant(spark):
    # same component regardless of (u, v) orientation
    a = _cc(spark, 4, [(0, 1), (2, 1), (3, 2)])
    b = _cc(spark, 4, [(1, 0), (1, 2), (2, 3)])
    assert a == b == {0: 0, 1: 0, 2: 0, 3: 0}


def test_empty_edges_all_singletons(spark):
    vertices = [(i,) for i in range(5)]
    v = __import__("pyspark").sql.SparkSession.getActiveSession()
    df = v.createDataFrame(vertices, "id long")
    edges = v.createDataFrame([], "u long, v long")
    rows = connected_components(df, edges).collect()
    assert {r["id"]: r["label"] for r in rows} == {i: i for i in range(5)}


def test_dup_cluster_sizes_at_sf0001(spark):
    """End-to-end sanity at sf0.001: every cluster_id is the min doc_id
    of its member set, and labels partition the corpus."""
    from event_streamer_spark.operators.clustering import d2_dup_clusters

    rows = d2_dup_clusters(spark, "/root/testdata/sf0.001").collect()
    by_cluster: dict[int, list[int]] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    assert sum(len(v) for v in by_cluster.values()) == len(rows)
    for cid, members in by_cluster.items():
        assert cid == min(members)


def test_lsh_driven_clusters_match_union_find(spark):
    """d2_dup_clusters_lsh must equal a union-find ground truth computed
    from the same LSH edge list (est_jaccard >= 0.3) — proving the CC
    loop is edge-source-agnostic, per the 100 TB path contract."""
    from event_streamer_spark.operators.clustering import (
        _CLUSTER_THRESHOLD,
        d2_dup_clusters_lsh,
    )
    from event_streamer_spark.operators.dedup import d2_minhash_lsh

    sf = "/root/testdata/sf0.001"
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in d2_minhash_lsh(spark, sf)
        .filter(F.col("est_jaccard") >= _CLUSTER_THRESHOLD)
        .collect()
    ]
    assert edges, "no LSH edges at the cluster threshold"
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in d2_dup_clusters_lsh(spark, sf).collect()
    }

    parent = {d: d for d in got}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {d: find(d) for d in got}
    assert got == want


def test_leakage_safe_split_is_cluster_consistent(spark):
    """D13: every document in a near-dup cluster carries the SAME split
    label, and both splits are non-trivially populated."""
    from event_streamer_spark.operators import REGISTRY

    rows = REGISTRY["d13_leakage_safe_split"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val"}
    val_frac = sum(r["split"] == "val" for r in rows) / len(rows)
    assert 0.02 <= val_frac <= 0.25, val_frac
