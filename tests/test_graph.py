"""Connected-components / dedup-cluster tests (operators/graph.py, X30)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nginx_analytics_spark.operators import graph


def _union_find(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {v: v for v in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # resolve to component minimum
    comp: dict[int, int] = {}
    for v in n_nodes:
        root = find(v)
        comp[v] = min(comp.get(root, root), root)
    # second pass: min id per root
    by_root: dict[int, int] = {}
    for v in n_nodes:
        r = find(v)
        by_root[r] = min(by_root.get(r, v), v)
    return {v: by_root[find(v)] for v in n_nodes}


def _cc_dict(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    out = graph.connected_components(df).collect()
    return {r["node"]: r["component"] for r in out}


def test_cc_two_components_and_chain(spark):
    # component {1..5} as a chain (worst diameter) + triangle {10,11,12}
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)]
    got = _cc_dict(spark, edges)
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10}


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(60))
    edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc_dict(spark, edges)
    touched = sorted({v for e in edges for v in e})
    want = _union_find(touched, edges)
    assert got == want


def test_cc_long_chain_converges_within_log_rounds(spark):
    # 64-node chain: plain min-propagation needs 63 rounds; pointer
    # jumping must close it within the max_rounds=25 budget.
    edges = [(i, i + 1) for i in range(63)]
    got = _cc_dict(spark, edges)
    assert set(got.values()) == {0}


def test_dedup_clusters_singletons_and_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 3), (3, 5), (6, 7)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: (r["cluster_id"], r["is_duplicate"])
        for r in graph.dedup_clusters(docs, pairs).collect()
    }
    assert out == {
        0: (0, False),
        1: (1, False),
        2: (2, False),
        3: (1, True),
        4: (4, False),
        5: (1, True),
        6: (6, False),
        7: (6, True),
    }


def test_dedup_clusters_filter_is_the_deduped_corpus(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    pairs = spark.createDataFrame([(0, 1), (1, 2)], ["id_a", "id_b"])
    assign = graph.dedup_clusters(docs, pairs)
    survivors = assign.filter(~F.col("is_duplicate")).select("doc_id")
    assert sorted(r["doc_id"] for r in survivors.collect()) == [0, 3, 4]


def test_quality_survivors_argmax_and_tiebreak(spark):
    """X100: each cluster keeps its argmax-quality member; equal
    quality falls back to min id (so it strictly refines the min-id
    rule); singleton clusters are never duplicates; quality rides into
    the output."""
    docs = spark.createDataFrame([(i,) for i in range(7)], ["doc_id"])
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], ["id_a", "id_b"]
    )
    assign = graph.dedup_clusters(docs, pairs).select("doc_id", "cluster_id")
    quality = spark.createDataFrame(
        # cluster {0,1,2}: 2 wins on quality; cluster {3,4}: tie -> 3;
        # singletons 5, 6 survive regardless of score
        [(0, 0.2), (1, 0.5), (2, 0.9), (3, 0.7), (4, 0.7),
         (5, 0.1), (6, 0.8)],
        "doc_id long, quality double",
    )
    out = {
        r.doc_id: (r.cluster_id, r.quality, r.is_duplicate)
        for r in graph.quality_survivors(assign, quality).collect()
    }
    assert out == {
        0: (0, 0.2, True),
        1: (0, 0.5, True),
        2: (0, 0.9, False),   # best quality survives, not min id
        3: (3, 0.7, False),   # tie -> min id
        4: (3, 0.7, True),
        5: (5, 0.1, False),
        6: (6, 0.8, False),
    }
