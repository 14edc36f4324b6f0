"""Deterministic corpus sampling for training-data pipelines.

Unlike ``DataFrame.sample`` (seeded per-partition RNG — resampling
changes when partitioning changes), these operators key every decision
on a content hash of a stable id column:

- reproducible across runs, partitionings, engines, and SFs (a doc
  keeps its fate when the corpus grows around it);
- map-only: a pure Column-expression filter, NO shuffle, NO state —
  at 100 TB a sample is exactly one pushdown-friendly scan;
- salt-parameterized so independent samples (e.g. train vs holdout
  re-draws) decorrelate.

Bucket = first 16 bits of md5(salt ++ id) → [0, 65536); a rate r
keeps buckets < r·65536. The same arithmetic is expressible in ANSI
SQL, so every operator here carries a DuckDB oracle in the registry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1 << 16


def hash_bucket(key: Column | str, salt: str = "s0") -> Column:
    """Deterministic bucket in [0, 65536): first 4 hex chars of
    md5(salt ++ key) parsed base-16 — engine-portable (md5 is md5
    everywhere; no reliance on Spark's hash())."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(F.lit(salt), c.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def threshold(rate: float) -> int:
    """Bucket threshold for a sampling rate (exact integer compare —
    no float comparison in the hot filter)."""
    return int(rate * BUCKETS)


def deterministic_sample(
    df: DataFrame, key: str, rate: float, salt: str = "s0"
) -> DataFrame:
    """Keep ~rate of rows, decided per-row by content hash."""
    return df.where(hash_bucket(key, salt) < F.lit(threshold(rate)))


def stratified_sample(
    df: DataFrame,
    key: str,
    strata: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "s0",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample web crawl, keep all books):
    the threshold is a CASE over the stratum column — still map-only,
    no join, no shuffle."""
    thr: Column = F.lit(threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata) == value, threshold(rate)).otherwise(thr)
    return df.where(hash_bucket(key, salt) < thr)


def train_eval_split(
    df: DataFrame, key: str, eval_frac: float, salt: str = "split"
) -> DataFrame:
    """Label every row 'eval' (~eval_frac) or 'train' — a total,
    deterministic, leakage-free split (a row's side depends only on
    its own id, never on the rest of the corpus)."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(key, salt) < F.lit(threshold(eval_frac)), "eval"
        ).otherwise("train"),
    )


def weighted_sample(
    df: DataFrame, key: str, weight: Column | str, salt: str = "w0"
) -> DataFrame:
    """Importance sampling: keep each row with probability equal to
    its weight column (clamped to [0, 1]) — e.g. quality-proportional
    corpus retention. Same md5-bucket mechanics, so the draw stays
    deterministic and map-only; the threshold is per-row instead of a
    constant."""
    w = F.col(weight) if isinstance(weight, str) else weight
    thr = F.floor(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0), w)) * F.lit(BUCKETS)
    ).cast("int")
    return df.where(hash_bucket(key, salt) < thr)


def pack_token_budget(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    partition_col: str,
    order_col: str,
) -> DataFrame:
    """Sequence packing for training batches: documents are laid out
    in deterministic (partition, order) sequence and chunked into
    fixed token-budget bins — ``bin_id`` = which context-window a doc
    STARTS in, ``start_offset`` = its token position within the
    partition's stream. One window cumsum per partition: a single
    shuffle on the partition key, no iteration, no driver loop (the
    greedy first-fit loop a naive packer runs is not expressible at
    100 TB; contiguous chunking is the distributed-friendly semantics
    and is what block-packing data loaders do).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias(
        "start_offset"
    )
    return df.withColumn("start_offset", start).withColumn(
        "bin_id",
        F.floor(F.col("start_offset") / F.lit(budget)).cast("long"),
    )


def md5_bucket_sql(key_sql: str, salt: str = "s0") -> str:
    """The DuckDB twin of ``hash_bucket`` — nibble-parse of the first
    4 hex chars (DuckDB has no hex→int cast)."""
    h = f"md5('{salt}' || {key_sql})"
    digits = "0123456789abcdef"
    nibbles = [
        f"(strpos('{digits}', substr({h}, {i + 1}, 1)) - 1)" for i in range(4)
    ]
    expr = nibbles[0]
    for n in nibbles[1:]:
        expr = f"(({expr}) * 16 + {n})"
    return expr


def source_mixing_weights(
    df: DataFrame,
    strata: str = "source",
    weight_col: str = "n_chars",
    targets: dict[str, float] | None = None,
) -> DataFrame:
    """Per-source sampling multipliers to hit a target mixture.

    A training-data pipeline rarely wants the corpus's natural domain
    mix — it wants declared proportions (public practice: the Pile /
    LLaMA training mixtures). For each stratum this emits its actual
    share of the token-proxy mass (sum of ``weight_col``), the target
    share, and ``mix_weight = target / actual`` — the per-document
    sampling multiplier (>1 upsample, <1 downsample) that a sampler
    (e.g. weighted_sample) applies downstream.

    With no explicit ``targets`` the goal is the UNIFORM mixture
    (1/n_strata each) — computed from the data itself via a window
    over the 1-row total, so the whole plan is one partial→final
    aggregation over the strata; nothing driver-side, no collect."""
    from pyspark.sql import Window

    agg = df.groupBy(strata).agg(
        F.sum(F.col(weight_col).cast("double")).alias("mass"),
        F.count(F.lit(1)).alias("docs"),
    )
    total_w = Window.partitionBy()
    actual = F.col("mass") / F.sum("mass").over(total_w)
    if targets is None:
        target = F.lit(1.0) / F.count(F.lit(1)).over(total_w)
    else:
        mapping = F.create_map(
            *[F.lit(x) for kv in targets.items() for x in kv]
        )
        target = F.coalesce(mapping[F.col(strata)], F.lit(0.0))
    return agg.select(
        F.col(strata),
        "docs",
        F.round(actual, 6).alias("actual_share"),
        F.round(target, 6).alias("target_share"),
        F.round(target / actual, 6).alias("mix_weight"),
    ).orderBy(strata)


def greedy_coverage_selection(
    docs, k: int = 10, text_col: str = "text", id_col: str = "doc_id"
):
    """Greedy max-coverage subset selection (submodular facility-
    location-lite): pick ``k`` documents maximizing the vocabulary
    they jointly cover. Each round scores every candidate by its
    MARGINAL new-token count against the covered set (one distributed
    aggregation over an exploded token view with an anti-join on
    covered tokens), takes the argmax (doc_id tiebreak), and adds its
    tokens — the classic 1-1/e-approximate algorithm, with only the
    single winning row collected per round. The data-pruning
    literature's coverage-selection baseline, at corpus scale.
    """
    from pyspark.sql import functions as F

    toks = (
        docs.select(
            F.col(id_col).alias("did"),
            F.explode(F.array_distinct(F.split(text_col, " "))).alias("tok"),
        )
        .where(F.length("tok") > 0)
        .localCheckpoint()
    )
    spark = docs.sparkSession
    covered = spark.createDataFrame([], "tok string")
    picked: list[tuple] = []
    for rank in range(k):
        marginal = (
            toks.join(covered, "tok", "left_anti")
            .groupBy("did")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("did"))
            .limit(1)
            .collect()
        )
        if not marginal or marginal[0].gain == 0:
            break
        did, gain = marginal[0].did, int(marginal[0].gain)
        picked.append((rank, did, gain))
        covered = (
            covered.unionByName(
                toks.where(F.col("did") == did).select("tok")
            )
            .distinct()
            .localCheckpoint()
        )
    total = covered.count()
    return spark.createDataFrame(
        [(r, d, g, total) for r, d, g in picked],
        "rank bigint, doc_id bigint, marginal_gain bigint,"
        " total_covered bigint",
    )
