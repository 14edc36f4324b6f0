"""k-core peeling: equality with a reference implementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators.clustering import k_core
from realtime_analytics_pipeline_spark.sources.batch import load_table
from tests.conftest import SF_SMOKE


def _ref_kcore(edges: set, k: int) -> dict:
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
                changed = True
    return {n: len(vs) for n, vs in adj.items()}


def _edges(spark):
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )


def test_kcore_matches_reference_peeling(spark):
    edges_df = _edges(spark)
    edges = {(r.src, r.dst) for r in edges_df.collect()}
    for k in (2, 3, 4):
        got = {r.node: r.deg for r in k_core(edges_df, k=k).collect()}
        want = _ref_kcore(edges, k)
        assert got == want, f"k={k}"


def test_kcore_small_fixture(spark):
    # triangle + pendant: 2-core is exactly the triangle
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.node: r.deg for r in k_core(df, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    assert k_core(df, k=3).count() == 0
