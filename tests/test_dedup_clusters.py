"""Connected-components dedup clustering.

Pair lists can't answer "keep one doc per duplicate group" when dups
chain (A~B, B~C but A≁C directly); the component is the dedup unit.
Validates the iterative hash-min propagation against hand-computed
components, including a chain whose diameter forces multiple rounds.
"""

from pyspark.sql import functions as F

from llm_scraper_spark.operators.dedup import connected_components, dedup_clusters


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r["vertex"]: r["component"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # a 7-vertex path: min label must travel 6 hops — exercises the
    # iteration + convergence check, not just the first propagation
    chain = [(i, i + 1) for i in range(1, 7)]
    got = _cc(spark, chain)
    assert got == {v: 1 for v in range(1, 8)}


def test_star_fallback_on_long_chain(spark):
    # a 61-vertex path (diameter 60 > the hash-min max_iter of 25):
    # hash-min hands off to large-star/small-star, which must close
    # the whole chain to the minimum vertex — alongside a second
    # component to prove the fallback keeps components separate
    chain = [(i, i + 1) for i in range(100, 160)]
    got = _cc(spark, chain + [(900, 901)])
    assert got == {**{v: 100 for v in range(100, 161)}, 900: 900, 901: 900}


def test_star_components_directly(spark):
    from llm_scraper_spark.operators.dedup import _star_components

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 8), (8, 9), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {r["vertex"]: r["component"] for r in _star_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 8: 1, 9: 1, 20: 20, 21: 20}


def test_bridge_merges_cliques(spark):
    # two triangles bridged by one edge collapse into one component
    tri_a = [(1, 2), (2, 3), (1, 3)]
    tri_b = [(8, 9), (9, 10), (8, 10)]
    got = _cc(spark, tri_a + tri_b + [(3, 8)])
    assert set(got.values()) == {1}


def test_dedup_clusters_end_to_end(spark):
    out = dedup_clusters(spark, "/root/testdata/sf0.001").collect()
    assert out, "augmented corpus must produce at least one cluster"
    by_cluster: dict[int, list[int]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)  # canonical id = min member
        assert len(members) >= 2  # every vertex came from a pair
    # every doc appears in exactly one cluster
    all_docs = [r["doc_id"] for r in out]
    assert len(all_docs) == len(set(all_docs))
    # cluster_size annotation is consistent
    for r in out:
        assert r["cluster_size"] == len(by_cluster[r["cluster_id"]])
