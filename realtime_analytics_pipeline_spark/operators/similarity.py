"""Similarity search over embedding columns.

- `cosine_topk`: brute-force exact top-k — broadcast the (small) query
  set against the full corpus, per-query heap via row_number. The
  exact baseline every ANN variant is measured against. Scales
  linearly in corpus size; the broadcast keeps it shuffle-free until
  the final tiny top-k window.
- `lsh_ann_topk`: random-hyperplane LSH — deterministic hyperplanes
  (seeded, data-independent), bucket by sign bits, search only within
  the query's bucket. The 100 TB path: candidate set per query is
  ~corpus/2^bits, and bucketing is a plain shuffle-by-key. Recall is
  approximate by construction (documented; no oracle).
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.functions.vectors import (
    as_double,
    cosine,
    dot,
    unit,
)


def cosine_topk(
    embeddings: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors by cosine for queries vec_id < query_max_id.

    Output: query_id, neighbor_id, cos, rnk — ranked by (rounded cos
    desc, neighbor_id) so the result set is deterministic across
    engines even under float-ULP differences.
    """
    # unit-normalize once per vector: each candidate pair costs ONE dot
    e = embeddings.select("vec_id", unit(as_double("embedding")).alias("v"))
    q = e.where(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cos", F.round(dot(F.col("qv"), F.col("v")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cos")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from md5 bytes —
    reproducible across sessions, no RNG state."""
    planes = []
    for j in range(bits):
        vals = []
        for d in range(0, dim, 4):
            h = hashlib.md5(f"{seed}:{j}:{d}".encode()).digest()
            vals.extend(
                struct.unpack(">4i", h[:16])[i] / 2**31 for i in range(4)
            )
        planes.append(vals[:dim])
    return planes


def lsh_bucket_expr(vec_col: str, planes: list[list[float]]):
    """Bucket id = sign-bit string over the hyperplanes (JVM-side
    zip_with/aggregate dot products, no UDF)."""
    bits = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        bits.append(
            F.when(dot(F.col(vec_col), lit_plane) >= 0, F.lit("1")).otherwise(
                F.lit("0")
            )
        )
    return F.concat(*bits)


def lsh_ann_topk(
    embeddings: DataFrame,
    query_max_id: int = 10,
    k: int = 5,
    bits: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket.

    Output schema matches `cosine_topk` (query_id, neighbor_id, cos,
    rnk). Recall < 1 by design; candidates fall to ~N/2^bits.
    """
    planes = _hyperplanes(dim, bits)
    # hyperplane signs are scale-invariant, so bucketing the unit
    # vector is identical — and each candidate then costs one dot
    e = embeddings.select(
        "vec_id",
        unit(as_double("embedding")).alias("v"),
    ).withColumn("bucket", lsh_bucket_expr("v", planes))
    q = e.where(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    cands = e.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket"))
        & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cands.withColumn(
        "cos", F.round(dot(F.col("qv"), F.col("v")), 6)
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), "cos")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def label_centroid_assignment(embeddings: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (IVF building block): centroids =
    per-label mean vectors, each vector assigned to its nearest
    centroid by cosine. Demonstrates the coarse-quantizer step of an
    IVF index as pure DataFrame ops (posexplode → per-dim mean →
    rebuild array → broadcast join)."""
    dims = embeddings.select(
        "vec_id", "label", F.posexplode(as_double("embedding")).alias("d", "x")
    )
    cent = (
        dims.groupBy("label", "d")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
        .select(
            F.col("label").alias("c_label"),
            F.expr("transform(dm, p -> p.m)").alias("cv"),
        )
    )
    e = embeddings.select("vec_id", "label", as_double("embedding").alias("v"))
    scored = e.join(F.broadcast(cent)).withColumn(
        "cos", cosine(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("c_label"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(
            "vec_id",
            "label",
            F.col("c_label").alias("assigned_label"),
            F.round("cos", 6).alias("cos"),
        )
    )


def quantize_int8(embeddings: DataFrame) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization + reconstruction
    error — the storage-compression step an embedding corpus goes
    through before ANN serving (4x smaller than float32; public
    technique, e.g. faiss SQ8).

    scale = max|v| / 127; q_i = round(v_i / scale); the emitted stats
    (scale, max reconstruction error, MSE) characterize the loss. Pure
    array-HOF Column expressions — map-only at any corpus size; all
    arithmetic in DOUBLE (float32 widens exactly, so the DuckDB oracle
    computes bit-identical values)."""
    # Optimization round 13 (guide §4): the original
    # ``transform(v, x -> ... x / scale ...)`` re-evaluated the whole
    # O(d) ``scale`` subtree per element (interpreted HOF lambdas have
    # no loop-invariant hoisting → O(d²)/row). Hoist ``scale`` into a
    # child projection (multi-referenced, so CollapseProject keeps it)
    # and divide via zip_with/array_repeat — scale now evaluates once
    # per row; every arithmetic op and operand is unchanged, so the
    # emitted doubles are bit-identical. spread(): the per-row pass is
    # the scan stage's only work, and one-row-group parquet scans are
    # single-task (functions/scale.py).
    from realtime_analytics_pipeline_spark.functions.scale import spread

    v = F.transform("embedding", lambda x: x.cast("double"))
    d = F.size("embedding")
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    staged = spread(embeddings, "vec_id").select(
        "vec_id", v.alias("v"), d.alias("d"), scale.alias("scale")
    )
    errs = F.zip_with(
        "v",
        F.array_repeat("scale", F.col("d")),
        lambda x, s: F.abs(x - F.round(x / s) * s),
    )
    staged = staged.select("vec_id", "d", "scale", errs.alias("errs"))
    mse = F.aggregate(
        "errs", F.lit(0.0), lambda acc, e: acc + e * e
    ) / F.col("d").cast("double")
    return staged.select(
        "vec_id",
        F.col("d").cast("long").alias("n_dims"),
        F.round("scale", 9).alias("scale"),
        F.round(F.array_max("errs"), 9).alias("max_abs_err"),
        F.round(mse, 12).alias("mse"),
    )


def projection_coeffs(
    in_dim: int, out_dim: int
) -> list[list[float]]:
    """Deterministic sparse-JL-style projection matrix: integer-derived
    rational coefficients ((j*31 + k*17) % 7 - 3) / 3 ∈ [-1, 1] — no
    RNG, reproducible everywhere, and exactly representable enough
    that Spark and the DuckDB oracle agree bit-for-bit after round(6).
    """
    return [
        [((j * 31 + k * 17) % 7 - 3) / 3.0 for j in range(in_dim)]
        for k in range(out_dim)
    ]


def random_projection(
    embeddings: DataFrame, in_dim: int = 64, out_dim: int = 8
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction: project
    each embedding onto ``out_dim`` fixed pseudo-random directions.

    Map-only Column arithmetic (one zip_with+aggregate dot per output
    dimension — no UDF, no shuffle): at 100 TB this is a scan-stage
    pass that cuts downstream ANN/dedup cost by in_dim/out_dim.
    Output columns p0..p{k-1} (rounded 6) rather than an array: scalar
    columns keep the driver's value-hash stable and stay prunable.
    """
    from realtime_analytics_pipeline_spark.functions.vectors import (
        as_double,
        dot,
    )

    coeffs = projection_coeffs(in_dim, out_dim)
    v = as_double("embedding")
    cols = [
        F.round(
            dot(v, F.array(*[F.lit(c) for c in row])), 6
        ).alias(f"p{k}")
        for k, row in enumerate(coeffs)
    ]
    return embeddings.select("vec_id", *cols)


def mmr_rerank(
    embeddings: DataFrame,
    query_max_id: int = 10,
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k.

    Stage 1 (declarative): exact top-``n_candidates`` by rounded cosine
    per query — the same broadcast-query shape as ``cosine_topk``.
    Stage 2 (Arrow path): the greedy MMR selection runs per query via
    ``applyInPandas`` — per-group work is bounded by
    ``n_candidates``² regardless of corpus size, and groups distribute
    across executors, so the iterative part never touches the driver.

    Determinism across engines: relevance AND candidate-pair
    similarities are rounded to 6 decimals, then INTEGERIZED
    (×10⁶) so every MMR comparison is exact integer arithmetic — no
    float-rounding divergence between Spark, numpy, and the DuckDB
    oracle is possible. With λ = ½ the rule argmax(λ·rel − (1−λ)·ms)
    is scale-invariant, so pick r = argmax(rel_int − ms_int); ties
    break by neighbor_id asc. (A general rational λ = p/q integerizes
    the same way with weights p and q−p.)
    """
    import numpy as np
    import pandas as pd

    if lam != 0.5:
        raise NotImplementedError(
            "integerized MMR is implemented for lam=0.5; other rational "
            "lambdas integerize with weights p and q-p"
        )
    e = embeddings.select("vec_id", unit(as_double("embedding")).alias("v"))
    q = e.where(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("rel", F.round(dot(F.col("qv"), F.col("v")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "rel", "v")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id")
    )
    cand = scored.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") <= n_candidates
    )

    def _mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("neighbor_id").reset_index(drop=True)
        vecs = np.stack(pdf["v"].to_numpy())
        rel = pdf["rel"].to_numpy()
        nid = pdf["neighbor_id"].to_numpy()
        rel_int = np.rint(rel * 1e6).astype(np.int64)
        sims_int = np.rint(np.round(vecs @ vecs.T, 6) * 1e6).astype(np.int64)
        n = len(pdf)
        big = np.int64(1) << 40
        selected: list[int] = []
        for _ in range(min(k, n)):
            if not selected:
                score = rel_int.copy()
            else:
                ms = sims_int[:, selected].max(axis=1)
                score = rel_int - ms
            score[selected] = -big
            # argmax with (score desc, neighbor_id asc) tie-break;
            # rows are already nid-ascending so first max wins ties
            selected.append(int(np.argmax(score)))
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "rnk": np.arange(1, len(selected) + 1, dtype="int32"),
                "neighbor_id": nid[selected],
                "rel": rel[selected],
            }
        )

    return cand.groupBy("query_id").applyInPandas(
        _mmr,
        "query_id long, rnk int, neighbor_id long, rel double",
    )


def _sqdist(a, b):
    """Squared L2 distance between two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


def pq_quantize(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """Product quantization: split each embedding into ``m`` equal
    subvectors, learn a ``k``-centroid codebook per subspace with a
    deterministic L2 k-means (init = subvectors of the k smallest
    vec_ids, fixed iteration count, argmin ties by centroid id), and
    emit per vector the m-code assignment plus the full-vector
    reconstruction error.

    The memory-bound ANN path at 100 TB: codebooks are tiny (m·k
    vectors, always broadcast); each pass over the corpus is a
    broadcast-join + argmin — shuffle-free except the per-dim mean
    update, which aggregates k·dims rows. Codes compress dims·4 bytes
    to m bytes per vector.
    """
    e = embeddings.select(
        "vec_id", as_double("embedding").alias("full")
    ).localCheckpoint()
    dims = len(e.select("full").first()["full"])
    assert dims % m == 0, "embedding dims must divide evenly into m"
    sub = dims // m
    # r13 (guide §1.2 job-count): the historical per-subspace loop ran
    # m independent k-means pipelines with an eager localCheckpoint
    # per (subspace, iteration) — 2·m driver-serialized jobs — then an
    # m-way join chain to assemble codes. MELTED: one (vec_id, j, v)
    # frame trains every subspace in the same jobs (2 checkpoints
    # total), and a conditional-agg pivot assembles the codes. Every
    # per-(subspace) candidate pair, argmin tie-break (dist asc,
    # cluster), centroid-mean group, and the final _d0.._dm-1 sum
    # order are identical to the loop form; oracle hash== re-verified
    # at sf0.001/sf0.01 (emb_pq_codes) after the change.
    ej = e.select(
        "vec_id",
        F.posexplode(
            F.array(
                *[F.slice("full", j * sub + 1, sub) for j in range(m)]
            )
        ).alias("j", "v"),
    )
    init_ids = (
        e.select("vec_id")
        .orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cluster"))
    )
    centroids = ej.join(
        F.broadcast(init_ids), ej["vec_id"] == init_ids["cluster"]
    ).select("j", "cluster", F.col("v").alias("cv"))
    assigned = None
    for it in range(iterations):
        scored = ej.join(F.broadcast(centroids), "j").withColumn(
            "dist", _sqdist(F.col("v"), F.col("cv"))
        )
        w = Window.partitionBy("vec_id", "j").orderBy(
            F.col("dist").asc(), F.col("cluster")
        )
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", "j", "cluster", "v", "dist")
            .localCheckpoint()
        )
        if it < iterations - 1:
            dims_df = assigned.select(
                "j", "cluster", F.posexplode("v").alias("d", "x")
            )
            centroids = (
                dims_df.groupBy("j", "cluster", "d")
                .agg(F.avg("x").alias("mu"))
                .groupBy("j", "cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("d", "mu"))
                    ).alias("dm")
                )
                .select(
                    "j",
                    "cluster",
                    F.expr("transform(dm, p -> p.mu)").alias("cv"),
                )
            )
    out = assigned.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("j") == j, F.col("cluster"))).alias(
                f"code{j}"
            )
            for j in range(m)
        ],
        *[
            F.max(F.when(F.col("j") == j, F.col("dist"))).alias(f"_d{j}")
            for j in range(m)
        ],
    )
    err = F.sqrt(
        sum((F.col(f"_d{j}") for j in range(1, m)), F.col("_d0"))
    )
    return out.select(
        "vec_id",
        *[f"code{j}" for j in range(m)],
        F.round(err, 6).alias("recon_err"),
    )


def pair_cosine_histogram(
    embeddings: DataFrame,
    sample_bucket_max: int = 6553,
    vec_cap: int = 2000,
) -> DataFrame:
    """Distribution of pairwise cosine similarity over an md5-sampled
    ~10% of pairs of an md5-ordered ``vec_cap``-vector slice — the
    "is my embedding space collapsed?" diagnostic (a healthy space
    spreads mass across buckets; a collapsed one piles into
    [0.9, 1.0)).

    The vector slice is a FIXED-SIZE deterministic cap (md5-ordered
    LIMIT, the dedup_tokenset_jaccard convention) rather than a
    fraction: a distribution diagnostic needs fixed sample precision,
    not a pair count that grows quadratically with the corpus —
    round-13, closing the scale gate's quadratic-replay skip. The cap
    does not bind at the driver gate SFs (<= 500 vectors), so gate
    outputs there are unchanged.

    Buckets are floor(round(cos, 6) * 10) clamped to [-10, 9] — the
    round-6 happens BEFORE bucketing so the oracle's
    list_cosine_similarity and our expression tree agree on boundary
    values the same way every other cosine query in this repo does.
    Output is counts only (bigints — no float aggregation to flake the
    cross-engine hash). The pair sample is content-hashed (stable
    under partitioning/order), and at 100 TB this runs on a fixed-size
    md5-sampled slice by construction — it is a diagnostic, not a
    corpus-scale join; the sampling filter is applied ON the join
    output of ids only (32-byte keys), embeddings join in after.
    """
    from realtime_analytics_pipeline_spark.functions.vectors import (
        as_double,
        cosine,
    )
    from realtime_analytics_pipeline_spark.operators.dedup import (
        all_pairs_equi,
    )

    embeddings = embeddings.join(
        F.broadcast(
            embeddings.select("vec_id")
            .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
            .limit(vec_cap)
        ),
        "vec_id",
        "left_semi",
    )
    ids = embeddings.select("vec_id")
    pair_ids = all_pairs_equi(ids, "vec_id").where(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ph#"),
                        F.col("a_vec_id").cast("string"),
                        F.lit("|"),
                        F.col("b_vec_id").cast("string"),
                    )
                ), 1, 4,
            ), 16, 10,
        ).cast("long")
        < sample_bucket_max
    ).select(
        F.col("a_vec_id").alias("id_a"), F.col("b_vec_id").alias("id_b")
    )
    va = embeddings.select(
        F.col("vec_id").alias("id_a"), as_double("embedding").alias("va")
    )
    vb = embeddings.select(
        F.col("vec_id").alias("id_b"), as_double("embedding").alias("vb")
    )
    cos = (
        pair_ids.join(va, "id_a")
        .join(vb, "id_b")
        .select(F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"))
    )
    bucket = F.greatest(
        F.lit(-10), F.least(F.lit(9), F.floor(F.col("cos") * 10))
    ).cast("long")
    return (
        cos.select(bucket.alias("cos_bucket"))
        .groupBy("cos_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
