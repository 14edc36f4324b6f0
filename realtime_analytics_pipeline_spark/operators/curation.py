"""Corpus-curation operators: PII redaction, TF-IDF term profiling,
canonical-document selection, cohort retention, robust outlier flags.

These extend the reference's analytics surface (the reference computes
windowed event/performance/session metrics only) with the curation
steps a large-scale training-data pipeline runs between ingestion and
training — all as pure Column expressions / window functions so the
whole family stays JVM-side inside WholeStageCodegen.

Scale notes (100 TB):
- ``redact_pii`` is map-only — no shuffle, fully pushdown-friendly;
  regex work is per-row in the JVM (no Python).
- ``tfidf_top_terms`` shuffles (doc_id, term) pairs once for TF and
  the vocabulary once for DF; the DF side is vocabulary-sized (≪
  corpus) and the join is left to AQE rather than hard-broadcast so a
  web-scale vocabulary degrades to a shuffle join instead of an OOM.
- ``canonical_docs`` is two window functions over the cluster id —
  one shuffle on cluster, no self-join.
- ``cohort_retention`` pre-aggregates to distinct (user, day) with
  map-side combine before any join; both joins key on user/cohort so
  they co-partition with the aggregation shuffle.
- ``value_mad_outliers`` is two order-statistic passes; the per-key
  medians are dimension-sized and broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Redaction patterns — restricted to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB oracle): char classes, \d, \b,
# bounded repetition. No lookaround, no backreferences.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub email / IPv4 / phone-shaped spans from ``text_col``.

    Adds ``n_emails``/``n_ips``/``n_phones`` (match counts) and
    ``clean_text`` (the redacted text). Patterns are applied in a fixed
    order — emails first, then IPs, then phones — with each count taken
    from the text as the PREVIOUS stage left it, so a digit run can
    never be double-counted by two patterns.

    Map-only: counts and replacement are single-pass Column
    expressions; at 100 TB this pipelines inside the scan stage.
    """
    after_email = F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4, "<IP>")
    after_phone = F.regexp_replace(after_ip, PII_PHONE, "<PHONE>")
    return df.withColumns(
        {
            "n_emails": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL), F.lit(0))
            ).cast("long"),
            "n_ips": F.size(
                F.regexp_extract_all(after_email, F.lit(PII_IPV4), F.lit(0))
            ).cast("long"),
            "n_phones": F.size(
                F.regexp_extract_all(after_ip, F.lit(PII_PHONE), F.lit(0))
            ).cast("long"),
            "clean_text": after_phone,
        }
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms.

    TF = term count within the document; IDF = ln(N / document
    frequency); ties broken deterministically by (rounded score desc,
    term asc). Returns (doc_id, term, tf, df, tfidf, rank).

    The DF side is vocabulary-sized — orders of magnitude smaller than
    the corpus — so the tf⋈df join is left to AQE (broadcast when it
    fits, shuffle when a web-scale vocabulary doesn't); only the
    single-row corpus count is hard-broadcast.
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_counts = tf.groupBy("term").agg(
        F.count_distinct("doc_id").alias("df")
    )
    n_docs = docs.select(F.count_distinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(df_counts, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "term", "tf", "df", "tfidf", "rank")
    )


def canonical_docs(
    docs: DataFrame,
    cc: DataFrame,
    quality_col: str = "n_chars",
) -> DataFrame:
    """Survivor selection after near-dup clustering: every document
    joins its duplicate cluster (``cc`` = (vertex, component) from
    ``clustering.connected_components``; unpaired docs form singleton
    clusters), and the best-quality member — highest ``quality_col``,
    ties to the smallest doc_id — is flagged canonical.

    This is the decision step of a dedup pipeline: keep rows where
    ``is_canonical``, drop the rest. Two window functions over one
    shuffle on cluster_id; no self-join.
    """
    base = (
        docs.join(cc, docs["doc_id"] == cc["vertex"], "left")
        .select(
            docs["doc_id"],
            F.coalesce(cc["component"], docs["doc_id"]).alias("cluster_id"),
            docs[quality_col].alias("quality"),
        )
    )
    w_rank = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    w_all = Window.partitionBy("cluster_id")
    return (
        base.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("cluster_size", F.count(F.lit(1)).over(w_all))
        .select(
            "doc_id",
            "cluster_id",
            (F.col("rn") == 1).alias("is_canonical"),
            "cluster_size",
        )
    )


def cohort_retention(events: DataFrame) -> DataFrame:
    """Classic cohort-retention matrix over event-time days.

    Users are cohorted by their first active day; for every
    (cohort_day, day-offset) cell the output carries the distinct
    active users and the retention rate vs the cohort's day-0 size.
    Day boundaries are TZ-immune epoch-ms floors (epoch_ms //
    86400000), matching the repo's daily-rollup convention.

    Shuffle budget: one distinct over (user, day) with map-side
    combine, one min-per-user agg (co-partitioned with it on user_id),
    one cell agg, and a broadcast of the cohort-size dimension.
    """
    day_ms = F.expr("(unix_millis(event_time) DIV 86400000) * 86400000")
    user_days = events.select(
        "user_id", day_ms.alias("day_ms")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(
        F.min("day_ms").alias("cohort_ms")
    )
    cells = (
        user_days.join(cohorts, "user_id")
        .withColumn(
            "offset_days",
            ((F.col("day_ms") - F.col("cohort_ms")) / F.lit(86400000)).cast(
                "long"
            ),
        )
        .groupBy("cohort_ms", "offset_days")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )
    day0 = cells.where(F.col("offset_days") == 0).select(
        F.col("cohort_ms").alias("c0_ms"),
        F.col("active_users").alias("cohort_size"),
    )
    return (
        cells.join(F.broadcast(day0), cells["cohort_ms"] == day0["c0_ms"])
        .select(
            "cohort_ms",
            "offset_days",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
                "retention_rate"
            ),
        )
    )


def value_mad_outliers(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust per-type outlier monitoring via median absolute
    deviation: a value is an outlier when |value − median| exceeds
    ``k`` × 1.4826 × MAD (1.4826 scales MAD to σ under normality —
    standard robust-statistics constant). Unlike mean/stddev z-scores
    (cf. ``doc_length_zscores``), the median/MAD fences are themselves
    immune to the outliers they detect.

    Two order-statistic aggregations per key; the per-key fences are
    dimension-sized and rejoined to the fact rows (dimension join left
    to AQE/broadcast). Output is one monitoring row per event_type.
    """
    vals = events.where(F.col("value").isNotNull()).select(
        "event_type", "value"
    )
    med = vals.groupBy("event_type").agg(F.median("value").alias("med"))
    dev = vals.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    fences = dev.groupBy("event_type").agg(
        F.max("med").alias("med"), F.median("adev").alias("mad")
    )
    flagged = (
        vals.join(fences, "event_type")
        .withColumn(
            "is_outlier",
            F.col("value")
            > F.col("med") + F.lit(k * 1.4826) * F.col("mad"),
        )
        .withColumn(
            "is_outlier",
            F.col("is_outlier")
            | (
                F.col("value")
                < F.col("med") - F.lit(k * 1.4826) * F.col("mad")
            ),
        )
    )
    return flagged.groupBy("event_type").agg(
        F.round(F.max("med"), 6).alias("med"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_outlier").cast("long")).alias("n_outliers"),
        F.round(
            F.sum(F.col("is_outlier").cast("long")) / F.count(F.lit(1)), 6
        ).alias("outlier_rate"),
    )


def ks_drift_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic of each group's
    ``value_col`` distribution against the POOLED distribution — the
    source-drift monitor for mixed training corpora.

    Everything runs on the aggregated (group, value) grid, never on raw
    rows: per-group and pooled counts first (one shuffle each), then the
    ECDF windows walk |groups| × |distinct values| rows. The pooled-ECDF
    window is single-partition but over |distinct values| AGGREGATED
    rows — bounded by the value domain, not the corpus.

    KS is computed on exact integer cumulative counts divided once at
    the end, so both engines see identical rationals — no ULP drift.
    """
    gv = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    pooled = gv.groupBy(value_col).agg(F.sum("c").alias("pc"))
    n_total = pooled.agg(F.sum("pc").alias("nn"))
    w_pool = Window.orderBy(value_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    pooled_cum = pooled.select(
        value_col, F.sum("pc").over(w_pool).alias("cum_pc")
    )
    groups = gv.groupBy(group_col).agg(F.sum("c").alias("ng"))
    grid = groups.crossJoin(F.broadcast(pooled_cum)).join(
        gv, [group_col, value_col], "left"
    )
    w_g = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ecdf = grid.select(
        group_col,
        "ng",
        "cum_pc",
        F.sum(F.coalesce("c", F.lit(0))).over(w_g).alias("cum_c"),
    ).crossJoin(F.broadcast(n_total))
    return (
        ecdf.groupBy(group_col)
        .agg(
            F.max("ng").alias("n_rows"),
            (
                F.round(
                    F.max(
                        F.abs(
                            F.col("cum_c") / F.col("ng")
                            - F.col("cum_pc") / F.col("nn")
                        )
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("ks"),
        )
        .select(group_col, "n_rows", "ks")
    )
