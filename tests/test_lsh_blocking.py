"""Hot-bucket guards for the LSH pair-forming surfaces (round-11).

tests/test_record_linkage.py pins the linkage blocking keys; these pin
the dedup surfaces that docs_lsh_blocking_quality audits — the same
degenerate-block doctrine (a hot bucket hides a cross join inside a
clean equi-join plan; only the VALUE DISTRIBUTION shows it). Relative
properties, not generator constants, so the guards survive testdata
regeneration (round-10 ADVICE on the linkage pins).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from realtime_analytics_pipeline_spark.operators import dedup as D
from realtime_analytics_pipeline_spark.operators.clustering import (
    kmeans_lite,
)
from realtime_analytics_pipeline_spark.registry import QUERIES
from realtime_analytics_pipeline_spark.sources.batch import load_table
from tests.conftest import SF_CORRECTNESS


def _band_profile(spark, shingle_n):
    docs = load_table(spark, SF_CORRECTNESS, "documents")
    n = docs.count()
    sigs = D.minhash_signatures(docs, n=shingle_n, num_perm=64)
    buckets = D.minhash_band_buckets(sigs, num_perm=64, bands=8)
    row = (
        buckets.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt").alias("mx"), F.count(F.lit(1)).alias("nb"))
        .collect()[0]
    )
    return n, row


def test_production_minhash_band_buckets_not_degenerate(spark):
    """The PRODUCTION xxhash64 8x8 banding (what minhash_lsh_pairs
    pair-joins on) over 3-gram shingles — the configuration the gated
    dedup query runs: many buckets, and no bucket holding a constant
    fraction of the corpus — the direct analog of the linkage
    max-block guard, over the real pair-forming key."""
    n, row = _band_profile(spark, shingle_n=3)
    assert row.nb >= n / 2, row
    assert row.mx <= 0.25 * n, row


def test_word_shingle_banding_is_hot_on_dense_corpus(spark):
    """The COUNTEREXAMPLE, kept as a pin (the rejected-key pattern
    from test_record_linkage): 1-gram shingles over this corpus's
    ~31-word vocabulary make random docs highly similar, so banding
    concentrates a double-digit share of the corpus in one bucket
    (measured 182/500 at sf0.01). This is exactly the hot-bucket
    failure docs_lsh_blocking_quality exists to catch BEFORE the pair
    join — shingle choice is a blocking-selectivity decision, not a
    tokenization detail."""
    n, row = _band_profile(spark, shingle_n=1)
    assert row.mx > 0.1 * n, row


def test_kmeans_hot_cell_bounded(spark):
    """Quantizer cells are ALLOWED to be skewed (clustered_dup_pairs
    salts hot cells — round-10 measured a 34%-hot cell at sf0.1), but
    one cell must never swallow the corpus outright."""
    emb = load_table(spark, SF_CORRECTNESS, "embeddings")
    n = emb.count()
    mx = (
        kmeans_lite(emb)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.max("cnt"))
        .collect()[0][0]
    )
    assert mx <= 0.6 * n, (mx, n)


def test_audit_surfaces_and_relative_health(spark):
    """The gated audit reports all three surfaces with the relative
    health properties the blocking doctrine demands."""
    rows = {
        r.surface: r
        for r in QUERIES["docs_lsh_blocking_quality"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    assert set(rows) == {
        "minhash_band_4x4", "kmeans_cell", "exact_md5_text"
    }
    mh = rows["minhash_band_4x4"]
    # 4 band keys per doc; max block a small multiple of the mean
    mean_block = mh.n_entities * 4 / mh.n_blocks
    assert mh.max_block <= 10 * max(1.0, mean_block), mh
    km = rows["kmeans_cell"]
    assert km.n_blocks == 8, km
    assert km.max_block <= 0.6 * km.n_entities, km
    # the hot cell owns a measurable but bounded candidate share
    assert 0 < km.hot_share_ppm <= 600000, km
    ex = rows["exact_md5_text"]
    # exact-dedup blocks are duplicate classes: max block is the
    # largest duplicate family, never a corpus-constant key
    assert ex.max_block <= 0.25 * ex.n_entities, ex


def test_production_banding_recall_floor(spark):
    """VERDICT r11 item 4: docs_lsh_recall_audit scores the md5
    16-perm 4x4 oracle twin; THIS pins the PRODUCTION xxhash64
    64-perm 8x8 banding (what minhash_lsh_pairs joins on) against the
    same exact-Jaccard truth on the same bounded subgraph — engine
    side only (xxhash64 has no DuckDB twin). The 8x8 s-curve midpoint
    (1/8)^(1/8) ~ 0.77 sits BELOW the 4x4 twin's (1/4)^(1/4) ~ 0.71
    cutover at t=0.9... both are far under 0.9, so both should catch
    everything; the pin is the ORDER (production >= twin) plus an
    absolute floor."""
    docs = load_table(spark, SF_CORRECTNESS, "documents").where(
        "doc_id < 300"
    )
    truth = {
        (r.doc_a, r.doc_b)
        for r in D.jaccard_pairs(docs, n=3, threshold=0.9).collect()
    }
    assert truth, "bounded subgraph must contain true near-dup pairs"

    def band_pairs(sigs, num_perm, bands):
        buckets = D.minhash_band_buckets(sigs, num_perm, bands)
        return {
            (r.doc_a, r.doc_b)
            for r in D._salted_pairs(buckets, ["band", "bucket"])
            .distinct()
            .collect()
        }

    prod = band_pairs(D.minhash_signatures(docs, n=3, num_perm=64), 64, 8)
    twin = band_pairs(D.minhash_md5_signatures(docs), 16, 4)
    caught_prod = len(truth & prod)
    caught_twin = len(truth & twin)
    assert caught_prod >= caught_twin, (caught_prod, caught_twin)
    assert caught_prod >= 0.99 * len(truth), (caught_prod, len(truth))


def test_lsh_recall_audit_floors(spark):
    """Measured banding quality must hold: the sparse (3-gram,
    production) config catches everything it proposes; the dense
    1-gram config keeps recall above the s-curve floor while honestly
    paying precision for sub-threshold candidates."""
    rows = {
        r.shingles: r
        for r in QUERIES["docs_lsh_recall_audit"](
            spark, SF_CORRECTNESS
        ).collect()
    }
    g3, g1 = rows["3gram"], rows["1gram"]
    # floors, not generator constants (ADVICE r11): the current
    # testdata measures 1000000/1000000 for 3-gram, but a regenerated
    # corpus may legitimately produce one borderline pair — pin the
    # doctrine (near-perfect at t=0.9), not the exact ppm.
    assert g3.recall_ppm >= 990000, g3
    assert g3.precision_ppm >= 990000, g3
    assert g1.recall_ppm >= 900000, g1
    assert 0 < g1.precision_ppm < 1000000, g1
