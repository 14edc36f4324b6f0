"""Vectorized (Arrow + NumPy/BLAS) similarity kernels.

The expression-tree cosine (functions/vectors.py) is exact,
oracle-matching, and JVM-only — but evaluates element-by-element. For
dense numeric kernels the right 100 TB tool is an Arrow-batched pandas
iterator doing block matrix products: ~100× the throughput at the cost
of a Python worker per task (guide: Pandas UDFs are the sanctioned
path when built-ins can't express the computation efficiently).

Pattern: broadcast the (small) query/corpus matrix as a NumPy array;
each Arrow batch of candidate vectors does ONE gemm against it. The
shuffle story is unchanged — this swaps only the per-row kernel.

These are registered rows-only (BLAS summation order is library/
thread dependent at the last ULP; the expression-tree twins carry the
oracles) with tests pinning them to the exact results.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cos", DoubleType()),
        StructField("rnk", IntegerType()),
    ]
)

_PAIRS_SCHEMA = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cos", DoubleType()),
    ]
)


def _unit_matrix(rows: list) -> tuple[np.ndarray, np.ndarray]:
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    m = np.array([r[1] for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    return ids, m


def cosine_topk_blas(
    embeddings: DataFrame, query_max_id: int = 10, k: int = 5
) -> DataFrame:
    """Exact top-k via per-batch gemm against the broadcast query
    matrix. Same output contract as similarity.cosine_topk."""
    spark = embeddings.sparkSession
    q_rows = [
        (r.vec_id, r.embedding)
        for r in embeddings.where(F.col("vec_id") < query_max_id)
        .select("vec_id", "embedding")
        .collect()
    ]
    q_ids, q_mat = _unit_matrix(q_rows)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            ids_c = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.array(list(pdf["embedding"]), dtype=np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ mat_q.T  # (batch, queries) in one gemm
            n_c, n_q = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids_q[np.newaxis, :], n_c, 0).ravel(),
                    "neighbor_id": np.repeat(ids_c, n_q),
                    "cos": np.round(sims.ravel(), 6),
                    "rnk": np.zeros(n_c * n_q, dtype=np.int32),
                }
            )

    scored = (
        embeddings.select("vec_id", "embedding")
        .mapInPandas(score, schema=_TOPK_SCHEMA)
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos", "rnk")
    )


def embedding_dup_pairs_blas(
    embeddings: DataFrame, threshold: float = 0.3
) -> DataFrame:
    """All-pairs cosine ≥ threshold via blocked gemm: each Arrow batch
    multiplies against the full broadcast unit matrix and keeps only
    upper-triangle hits over the threshold. Same output contract as
    dedup.embedding_dup_pairs."""
    spark = embeddings.sparkSession
    all_rows = [
        (r.vec_id, r.embedding)
        for r in embeddings.select("vec_id", "embedding").collect()
    ]
    ids_all, mat_all = _unit_matrix(all_rows)
    bc = spark.sparkContext.broadcast((ids_all, mat_all))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_b, mat_b = bc.value
        for pdf in batches:
            ids_a = pdf["vec_id"].to_numpy(dtype=np.int64)
            a = np.array(list(pdf["embedding"]), dtype=np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ mat_b.T
            ai, bi = np.nonzero(
                (np.round(sims, 6) >= threshold)
                & (ids_a[:, None] < ids_b[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": ids_a[ai],
                    "id_b": ids_b[bi],
                    "cos": np.round(sims[ai, bi], 6),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema=_PAIRS_SCHEMA
    )
