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


def gemm_block_count(n: int, block_rows: int = 2048) -> int:
    """Block-count sizing shared by the all-pairs gemm kernels: at
    least ceil(n/block_rows) so a block pair fits in task memory at any
    corpus size, at least min(16, n/64) so small corpora still fan out
    ~B²/2 concurrent gemm tasks, capped at 512."""
    mem_blocks = -(-n // block_rows)  # per-task memory bound
    par_blocks = min(16, max(2, n // 64))  # small-corpus parallelism
    return min(512, max(mem_blocks, par_blocks))


def _block_pair_groups(df: DataFrame, id_col: str, n_blocks: int):
    """All-pairs block fan-out shared by the gemm kernels: each row
    hashes into one of ``n_blocks`` blocks and is exploded to every
    block PAIR (gi ≤ gj) it belongs to, so each unordered row pair
    meets in exactly ONE applyInPandas group. Returns the grouped
    frame (columns: df's + blk, grouped by gi, gj).

    Shuffle cost (ADVICE r08): the explode replicates every row —
    INCLUDING its full vector payload — ``n_blocks`` times, so shuffle
    volume is O(n · B · row_bytes). This is the deliberate trade for
    all-pairs exactness: B is sized by ``gemm_block_count`` so blocks
    fit task memory, and its 512 cap bounds replication at ≤512×.
    When vectors are wide and B is large, the scale-out alternative is
    shipping only (id, blk) into the pair groups and joining the
    vector payload per block — one extra shuffle, n·row_bytes each
    side, in exchange for dropping the ×B replication; the current
    form wins while n·B·row_bytes fits comfortably in cluster shuffle
    capacity (true for every gated corpus here: ≤ a few GiB)."""
    blk = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).cast("int")
    pair_of = F.explode(
        F.array(
            *[
                F.struct(
                    F.least("blk", F.lit(j)).alias("gi"),
                    F.greatest("blk", F.lit(j)).alias("gj"),
                )
                for j in range(n_blocks)
            ]
        )
    )
    cols = df.columns
    return (
        df.withColumn("blk", blk)
        .select(*cols, "blk", pair_of.alias("g"))
        .select(*cols, "blk", "g.gi", "g.gj")
        .groupBy("gi", "gj")
    )


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
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_blocks: int | None = None,
    block_rows: int = 2048,
) -> DataFrame:
    """All-pairs cosine ≥ threshold via BLOCK-PARTITIONED gemm.

    Nothing is collected to the driver (the round-1 version broadcast
    the full corpus matrix from a driver-side collect — a driver OOM
    at scale). Instead each vector hashes into one of ``n_blocks``
    blocks and is exploded to the ``n_blocks`` block-PAIRS it belongs
    to; one applyInPandas group per pair (gi <= gj) runs a single gemm
    between the two block matrices and keeps rounded hits over the
    threshold. Peak executor memory per task is two blocks
    (~2·N/n_blocks vectors), tunable via ``n_blocks``; shuffle volume
    is N·n_blocks rows. Total flops stay O(N²) — exact all-pairs is
    inherently quadratic; the LSH/IVF operators are the true 100 TB
    path and this kernel is the exact verifier. Same output contract
    as dedup.embedding_dup_pairs.

    Sizing rule (``n_blocks=None``): blocks scale with the corpus so
    neither memory nor parallelism is a fixed cap — at least
    ceil(N / block_rows) blocks so a block pair (two slabs + the
    block_rows² sim matrix, ~35 MB at the 2048 default) fits in task
    memory at ANY corpus size, and at least min(16, N/64) blocks so
    small corpora still fan out ~B²/2 concurrent gemm tasks. The
    linear-in-B shuffle replication this buys is the price of exact
    all-pairs, paid deliberately.
    """
    if n_blocks is None:
        n_blocks = gemm_block_count(embeddings.count(), block_rows)

    def pair_gemm(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(key[0]), int(key[1])
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        if gi == gj:
            ids, m = _unit_matrix(
                list(zip(pdf["vec_id"], pdf["embedding"]))
            )
            sims = m @ m.T
            ai, bi = np.nonzero(
                (np.round(sims, 6) >= threshold)
                & (ids[:, None] < ids[None, :])
            )
            ids_a, ids_b = ids[ai], ids[bi]
        else:
            left = pdf[pdf["blk"] == gi]
            right = pdf[pdf["blk"] == gj]
            if left.empty or right.empty:
                return empty
            ids_l, m_l = _unit_matrix(
                list(zip(left["vec_id"], left["embedding"]))
            )
            ids_r, m_r = _unit_matrix(
                list(zip(right["vec_id"], right["embedding"]))
            )
            sims = m_l @ m_r.T
            ai, bi = np.nonzero(np.round(sims, 6) >= threshold)
            # canonical (id_a < id_b) regardless of block order
            ids_a = np.minimum(ids_l[ai], ids_r[bi])
            ids_b = np.maximum(ids_l[ai], ids_r[bi])
        if len(ids_a) == 0:
            return empty
        return pd.DataFrame(
            {
                "id_a": ids_a,
                "id_b": ids_b,
                "cos": np.round(sims[ai, bi], 6),
            }
        )

    return _block_pair_groups(
        embeddings.select("vec_id", "embedding"), "vec_id", n_blocks
    ).applyInPandas(pair_gemm, schema=_PAIRS_SCHEMA)


def knn_topk_blas(
    embeddings: DataFrame,
    query_pred,
    k: int = 5,
) -> DataFrame:
    """(query_id, neighbor_id, cos) of each sampled query's exact
    top-``k`` corpus neighbors, via per-batch gemm WITH an in-kernel
    partial top-k — the combiner pattern: each Arrow batch emits at
    most k candidates per query (argpartition on an exact integer
    composite key: round-6 cos scaled ×1e7 minus neighbor id, so ties
    break identically to the SQL ``ORDER BY cos DESC, nid``), and the
    global window only merges n_batches·k·|Q| rows instead of
    |corpus|·|Q|. The query matrix is collect+broadcast — the eval-
    sample contract (|Q| ≈ 20% here; a corpus-scale run samples or
    switches to the ANN buckets).
    """
    spark = embeddings.sparkSession
    # query_pred: boolean Column, or a DataFrame of query vec_ids
    # (fixed-size md5-ordered caps pass the id frame — round-13)
    qsrc = (
        embeddings.join(
            query_pred.select("vec_id"), "vec_id", "left_semi"
        )
        if isinstance(query_pred, DataFrame)
        else embeddings.where(query_pred)
    )
    q_rows = [
        (r.vec_id, r.embedding)
        for r in qsrc.select("vec_id", "embedding").collect()
    ]
    q_ids, q_mat = _unit_matrix(q_rows)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        n_q = len(ids_q)
        for pdf in batches:
            ids_c = pdf["vec_id"].to_numpy(dtype=np.int64)
            c = np.array(list(pdf["embedding"]), dtype=np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = np.round(c @ mat_q.T, 6)  # (batch, queries)
            # exact integer composite: cos6*1e7 - neighbor_id. Self
            # pairs sink to the bottom so they never displace a real
            # candidate from the per-batch top-k.
            # rint, not astype-truncate: 0.123457*1e6 floats a hair
            # under the integer and truncation would shift the key
            keys = np.rint(sims * 1_000_000).astype(np.int64) * 10_000_000
            keys -= ids_c[:, np.newaxis]
            keys[ids_c[:, np.newaxis] == ids_q[np.newaxis, :]] = np.iinfo(
                np.int64
            ).min
            kk = min(k, keys.shape[0])
            top = np.argpartition(keys, -kk, axis=0)[-kk:]  # (kk, n_q)
            cols = np.repeat(np.arange(n_q)[np.newaxis, :], kk, 0)
            sel_rows = top.ravel()
            sel_cols = cols.ravel()
            mask = keys[sel_rows, sel_cols] != np.iinfo(np.int64).min
            yield pd.DataFrame(
                {
                    "query_id": ids_q[sel_cols[mask]],
                    "neighbor_id": ids_c[sel_rows[mask]],
                    "cos": sims[sel_rows[mask], sel_cols[mask]],
                    "rnk": np.zeros(int(mask.sum()), dtype=np.int32),
                }
            )

    scored = embeddings.select("vec_id", "embedding").mapInPandas(
        score, schema=_TOPK_SCHEMA
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


_ACT_PART_SCHEMA = StructType(
    [
        StructField("u1", LongType()),
        StructField("u2", LongType()),
        StructField("raw", DoubleType()),
        StructField("shared_days", LongType()),
    ]
)


def activity_topk_pairs_blas(
    daily: DataFrame,
    n_days: int,
    top_k: int = 10,
    n_blocks: int | None = None,
    block_rows: int = 4096,
) -> DataFrame:
    """Partial top-k candidate pairs for user-activity cosine — the
    vectorized twin of the day-bucketed self-join in
    registry_analytics._users_activity_similarity (round-8).

    Input: ``daily`` = (user_id BIGINT, idx INT, c BIGINT) — each
    user's sparse day-count vector on a global 0-based day spine of
    width ``n_days``. Users hash into blocks; every block PAIR
    (gi ≤ gj) runs one dense int-count gemm and emits its local top-k
    pairs by (raw DESC, u1, u2) — the partial-top-k combiner: any
    global top-k pair is in its block pair's local top-k, so the
    caller's global window merges ~B²/2·k rows instead of users².

    Bit-exactness vs the join form (why this twin can share the SQL
    oracle): counts are INTEGERS, so dot = Σ c_a·c_b and s2 = Σ c²
    are exact in float64 gemm (< 2^53), and raw = dot/sqrt(s2a·s2b)
    performs the identical IEEE ops (exact int multiply → sqrt →
    divide) as the JVM/DuckDB expressions. Unlike the embedding
    kernels (fractional floats ⇒ rows-only), nothing here depends on
    summation order.

    Work is still Θ(users²·days) flops — exact all-pairs is
    inherently quadratic — but vectorized ~100× over the interpreted
    pair join, and pairs with no shared day never materialize rows.
    The LSH sibling (users_activity_similarity_lsh) remains the
    sub-quadratic path.
    """
    vecs = daily.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("idx", "c"))).alias("ic")
    )
    if n_blocks is None:
        n_blocks = gemm_block_count(vecs.count(), block_rows)

    def dense(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        ids = pdf["user_id"].to_numpy(dtype=np.int64)
        m = np.zeros((len(ids), n_days), dtype=np.float64)
        for row, ic in enumerate(pdf["ic"]):
            for e in ic:
                m[row, int(e["idx"])] = float(e["c"])
        return ids, m

    def pair_gemm(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gi, gj = int(key[0]), int(key[1])
        empty = pd.DataFrame(
            {"u1": [], "u2": [], "raw": [], "shared_days": []}
        )
        if gi == gj:
            # each user reaches group (g, g) exactly once (j == blk)
            ids_l, m_l = dense(pdf)
            ids_r, m_r = ids_l, m_l
        else:
            left = pdf[pdf["blk"] == gi]
            right = pdf[pdf["blk"] == gj]
            if left.empty or right.empty:
                return empty
            ids_l, m_l = dense(left)
            ids_r, m_r = dense(right)
        dot = m_l @ m_r.T  # exact: integer values in float64
        s2_l = (m_l * m_l).sum(axis=1)
        s2_r = (m_r * m_r).sum(axis=1)
        shared = (m_l > 0).astype(np.float64) @ (m_r > 0).astype(
            np.float64
        ).T
        # identical IEEE sequence to the join form / SQL oracle:
        # exact integer product, sqrt, divide
        raw = dot / np.sqrt(s2_l[:, None] * s2_r[None, :])
        mask = (dot >= 1.0) & (ids_l[:, None] != ids_r[None, :])
        if gi == gj:
            mask &= ids_l[:, None] < ids_r[None, :]
        ai, bi = np.nonzero(mask)
        if len(ai) == 0:
            return empty
        u1 = np.minimum(ids_l[ai], ids_r[bi])
        u2 = np.maximum(ids_l[ai], ids_r[bi])
        r = raw[ai, bi]
        order = np.lexsort((u2, u1, -r))[: min(top_k, len(ai))]
        return pd.DataFrame(
            {
                "u1": u1[order],
                "u2": u2[order],
                "raw": r[order],
                "shared_days": shared[ai, bi][order].astype(np.int64),
            }
        )

    return _block_pair_groups(vecs, "user_id", n_blocks).applyInPandas(
        pair_gemm, schema=_ACT_PART_SCHEMA
    )
