"""ANN quality gates: recall@k curves vs the exact brute-force
baseline, with asserted floors and monotonicity.

Both knobs trade candidates for recall in a provable direction:

- IVF: a larger ``nprobe`` probes a superset of inverted lists, so
  recall@k is monotone non-decreasing; nprobe == n_centroids scans
  the whole corpus, so recall is exactly 1.0.
- hyperplane LSH: plane j is identical across ``bits`` settings
  (seeded by j), so a b-bit bucket is a prefix-refinement of the
  (b-1)-bit bucket — fewer bits means superset candidates and
  monotone non-increasing recall as bits grow.

The synthetic embeddings are UNCLUSTERED (near-uniform directions), a
worst case for locality methods: IVF still reaches 0.8 recall@5 at
nprobe=1 because candidates ≈ N/8 per list, while LSH with 8 bits has
~N/256 ≈ 2-vector buckets and honestly collapses — the measured
values below are floors with margin, not tuned targets.
"""

from __future__ import annotations

from realtime_analytics_pipeline_spark.operators.clustering import ivf_topk
from realtime_analytics_pipeline_spark.operators.similarity import (
    cosine_topk,
    lsh_ann_topk,
)
from realtime_analytics_pipeline_spark.sources.batch import load_table

from tests.conftest import SF_SMOKE

K = 5
N_QUERIES = 10


def _exact_top(spark):
    embs = load_table(spark, SF_SMOKE, "embeddings")
    return embs, {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(embs, N_QUERIES, K).collect()
    }


def _recall(hits, exact):
    return len(hits & exact) / len(exact)


def test_ivf_recall_curve_vs_nprobe(spark):
    embs, exact = _exact_top(spark)
    curve = {}
    for nprobe in (1, 2, 4, 8):
        hits = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(
                embs, N_QUERIES, K, n_centroids=8, nprobe=nprobe
            ).collect()
        }
        curve[nprobe] = _recall(hits, exact)
    rs = [curve[n] for n in (1, 2, 4, 8)]
    assert rs == sorted(rs), f"recall must not decrease with nprobe: {curve}"
    assert curve[1] >= 0.5, curve  # measured 0.80 on unclustered data
    assert curve[4] >= 0.7, curve  # measured 0.94
    assert curve[8] == 1.0, curve  # full probe == exact by construction


def test_lsh_recall_curve_vs_bits(spark):
    embs, exact = _exact_top(spark)
    curve = {}
    for bits in (2, 4, 8):
        hits = {
            (r.query_id, r.neighbor_id)
            for r in lsh_ann_topk(embs, N_QUERIES, K, bits=bits).collect()
        }
        curve[bits] = _recall(hits, exact)
    rs = [curve[b] for b in (2, 4, 8)]
    assert rs == sorted(rs, reverse=True), (
        f"recall must not increase with bits (prefix buckets): {curve}"
    )
    assert curve[2] >= 0.2, curve  # measured 0.34 on unclustered data
    # every LSH hit must be a true neighbor pair with its exact cosine
    all_pairs = {
        (r.query_id, r.neighbor_id): r.cos
        for r in cosine_topk(embs, N_QUERIES, k=10**6).collect()
    }
    for r in lsh_ann_topk(embs, N_QUERIES, K, bits=4).collect():
        assert all_pairs[(r.query_id, r.neighbor_id)] == r.cos


def test_ivfpq_recall_floor_and_full_probe_parity(spark):
    """IVF-PQ recall@5 vs exact cosine: the compressed-domain search
    keeps a usable fraction of true neighbors even on the
    worst-case unclustered corpus, and scores stay in [-1, 1]."""
    from realtime_analytics_pipeline_spark.operators.clustering import (
        ivfpq_topk,
    )
    from realtime_analytics_pipeline_spark.operators.similarity import (
        cosine_topk,
    )

    emb = spark.read.parquet(SF_SMOKE + "/embeddings.parquet")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, query_max_id=10, k=5).collect()
    }

    def recall(nprobe):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                emb, query_max_id=10, k=5, nprobe=nprobe
            ).collect()
        }
        return len(got & exact) / len(exact)

    r2 = recall(2)
    r8 = recall(8)  # full probe: only PQ distortion remains
    # NOTE: unlike exact-scored IVF, recall is NOT monotone in nprobe
    # here — a PQ-distorted high-scorer from a newly probed list can
    # displace a true neighbor — so only floors are asserted.
    # Measured 0.36 / 0.30 on the near-uniform corpus (PQ's worst
    # case — see operator docstring); floors set with margin.
    assert r8 >= 0.15
    assert r2 >= 0.05
    rows = ivfpq_topk(emb, query_max_id=3, k=5, nprobe=2).collect()
    assert all(-1.0 <= r["cos_pq"] <= 1.0 for r in rows)
