"""Iterative operators: connected components + k-means invariants."""

from __future__ import annotations


from realtime_analytics_pipeline_spark.operators.clustering import (
    connected_components,
    connected_components_bounded,
    kmeans_lite,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE


def test_connected_components_on_known_graph(spark):
    # components: {1,2,3,4} (chain), {10,11}, isolated-by-edges {20,21}
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r.vertex: r.component for r in connected_components(df).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_chain_exceeding_one_round(spark):
    # a long path needs multiple propagation rounds
    n = 12
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.vertex: r.component for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_bounded_cc_matches_loop(spark):
    """The single-task union-find kernel is row-identical to the
    iterative loop on every graph shape the bounded gate subgraphs
    produce: multi-component, long chains (many propagation rounds),
    duplicate and reversed edges, self-loops, and the empty set."""
    edges = (
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)]
        + [(i, i + 1) for i in range(100, 112)]  # 13-vertex chain
        + [(3, 2), (2, 1), (40, 40)]  # reversed dups + self-loop
        + [(55, 50), (50, 53)]  # min-id arrives via dst side
    )
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    loop = {
        (r.vertex, r.component) for r in connected_components(df).collect()
    }
    fast = {
        (r.vertex, r.component)
        for r in connected_components_bounded(df).collect()
    }
    assert fast == loop

    empty = df.where("doc_a < 0")
    assert connected_components_bounded(empty).count() == 0
    assert connected_components(empty).count() == 0


def test_bounded_cc_guard_rejects_oversized_input(spark):
    """The boundedness guard (r14): an edge set past max_edges must
    fail LOUDLY instead of silently funneling an unbounded graph into
    one task — the failure mode VERDICT r13 item 6 flagged as a
    single-executor OOM at scale. Small threshold here; the default
    guard is 1e6 edges."""
    import pytest

    edges = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    with pytest.raises(Exception, match="max_edges"):
        connected_components_bounded(df, max_edges=10).collect()
    # at or under the limit the kernel still answers
    ok = connected_components_bounded(df, max_edges=40).collect()
    assert {r.component for r in ok} == {0}


def test_bounded_cc_matches_loop_on_gate_subgraph(spark):
    """Parity on the ACTUAL gate pair set (jaccard 1-gram >= 0.95 over
    the bounded doc_id < 300 smoke slice) — the subgraph every
    bounded=True registry caller feeds the kernel."""
    from realtime_analytics_pipeline_spark.operators import dedup as D

    docs = load_table(spark, SF_SMOKE, "documents").where("doc_id < 300")
    pairs = D.jaccard_pairs(docs, n=1, threshold=0.95).localCheckpoint()
    loop = {
        (r.vertex, r.component)
        for r in connected_components(pairs).collect()
    }
    fast = {
        (r.vertex, r.component)
        for r in connected_components_bounded(pairs).collect()
    }
    assert fast == loop
    assert fast  # the smoke slice does contain near-dup pairs


def test_ivf_topk_recall_and_score_parity(spark):
    """IVF hits must carry exact cosines (same scores the brute-force
    scorer computes) and reach reasonable recall@5 with nprobe=4 of 8
    lists on unclustered data (candidates ≈ half the corpus)."""
    from realtime_analytics_pipeline_spark.operators.similarity import cosine_topk

    from realtime_analytics_pipeline_spark.operators.clustering import ivf_topk

    embs = load_table(spark, SF_SMOKE, "embeddings")
    exact_all = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk(embs, query_max_id=10, k=500).collect()
    }
    exact_top5 = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, query_max_id=10, k=5).collect()
    }
    ivf = ivf_topk(embs, query_max_id=10, k=5, nprobe=4).collect()
    assert ivf
    for r in ivf:
        assert exact_all[(r.query_id, r.neighbor_id)] == r.cos
    hits = {(r.query_id, r.neighbor_id) for r in ivf}
    recall = len(hits & exact_top5) / len(exact_top5)
    assert recall >= 0.3, f"recall@5 {recall:.2f}"


def test_kmeans_deterministic_and_total(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    a1 = {(r.vec_id, r.cluster) for r in kmeans_lite(embs, k=5).collect()}
    a2 = {(r.vec_id, r.cluster) for r in kmeans_lite(embs, k=5).collect()}
    assert a1 == a2  # deterministic across runs
    assert len({v for v, _ in a1}) == embs.count()  # total assignment
    assert len({c for _, c in a1}) <= 5
    # every sim is a valid cosine
    for r in kmeans_lite(embs, k=5).collect():
        assert -1.000001 <= r.sim <= 1.000001


def test_pagerank_mass_and_symmetry(spark):
    """No dangling mass on an undirected graph: total rank stays 1.0
    each iteration; vertices of a symmetric graph rank equally; a hub
    outranks its spokes on a star."""
    from realtime_analytics_pipeline_spark.operators.clustering import (
        pagerank_lite,
    )

    tri = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "doc_a long, doc_b long"
    )
    out = {r["vertex"]: r["pagerank"] for r in pagerank_lite(tri).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-5
    assert len(set(out.values())) == 1  # perfect symmetry

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    ranks = {
        r["vertex"]: r["pagerank"] for r in pagerank_lite(star).collect()
    }
    assert abs(sum(ranks.values()) - 1.0) < 1e-5
    assert all(ranks[0] > ranks[i] for i in range(1, 6))  # hub dominates
