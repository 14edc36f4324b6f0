"""Fellegi–Sunter record-linkage pins (round-10).

Two kinds of guarantees: LINKAGE SEMANTICS (recall numbers, decision
bands, residue characterization) and BLOCK-KEY SELECTIVITY — the
property whose violation hid a full cross join in the first draft
(corpus-constant name-prefix key ⇒ one block holding every row).
Plan audits cannot see block degeneracy (the join stays a clean equi
join); these data-level pins can.
"""

from __future__ import annotations

import duckdb

from realtime_analytics_pipeline_spark.registry import QUERIES
from realtime_analytics_pipeline_spark.registry_relational import (
    _RL_FS_MULTIPASS_SQL,
    _RL_FS_SQL,
)
from tests.conftest import SF_CORRECTNESS, SF_SMOKE


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM '{sf_dir}/customer.parquet'"
    )
    return con


def test_single_pass_recall_pinned(spark):
    con = _duck(SF_CORRECTNESS, _RL_FS_SQL)
    n = con.execute("SELECT count(*) FROM customer").fetchone()[0]
    hit = con.execute(
        "SELECT count(*) FROM (" + _RL_FS_SQL + ") WHERE is_true_pair = 1"
    ).fetchone()[0]
    assert n == 1500 and hit == 1212  # nation-intact twins only


def test_multipass_recall_and_residue(spark):
    """Pass 2 recovers nation-corrupted twins; pass 3 (round-11,
    (tail, balance-band) with the bounded-drift band explode) reaches
    the remaining twins whose nation is corrupted AND segment dropped
    — FULL recall, the residue characterized in round 10 eliminated
    by exactly the predicted third key."""
    con = _duck(SF_CORRECTNESS, _RL_FS_MULTIPASS_SQL)
    hit = con.execute(
        "SELECT count(*) FROM ("
        + _RL_FS_MULTIPASS_SQL
        + ") WHERE is_true_pair = 1"
    ).fetchone()[0]
    assert hit == 1500  # 1212 (pass 1) -> 1451 (+pass 2) -> all
    residue = con.execute(
        """
        WITH hit AS (SELECT twin_id FROM ("""
        + _RL_FS_MULTIPASS_SQL
        + """) WHERE is_true_pair = 1)
        SELECT count(*) FROM customer c
        WHERE c.c_custkey NOT IN (SELECT twin_id FROM hit)
        """
    ).fetchone()[0]
    assert residue == 0  # no twin is unreachable any more


def test_spark_matches_oracle_row_sets(spark):
    for name, sql in (
        ("customers_record_linkage_fs", _RL_FS_SQL),
        ("customers_record_linkage_multipass", _RL_FS_MULTIPASS_SQL),
    ):
        got = {
            (r.custkey_a, r.twin_id, r.score, r.decision, r.is_true_pair)
            for r in QUERIES[name](spark, SF_SMOKE).collect()
        }
        con = _duck(SF_SMOKE, sql)
        want = {tuple(r) for r in con.execute(sql).fetchall()}
        assert got == want, name


def test_block_keys_are_selective(spark):
    """The degeneracy guard: for each blocking key used by the two
    linkage queries, the LARGEST block must stay a small constant
    multiple of n / #blocks as n grows 10x — a corpus-constant or
    low-cardinality key fails this immediately (the first draft's
    12-char name prefix put 100% of rows in one block)."""
    for sf_dir, n in ((SF_SMOKE, 150), (SF_CORRECTNESS, 1500)):
        con = _duck(sf_dir, "")
        for key in (
            # pass 1: (nation, case-folded name tail)
            "(c_nationkey, upper(substr(c_name, length(c_name)-3, 4)))",
            # pass 2: (name tail, segment)
            "(upper(substr(c_name, length(c_name)-3, 4)), c_mktsegment)",
            # pass 3: (name tail, balance band)
            "(upper(substr(c_name, length(c_name)-3, 4)),"
            " CAST(floor(c_acctbal) AS BIGINT))",
        ):
            mx, blocks = con.execute(
                f"""SELECT max(cnt), count(*) FROM (
                    SELECT count(*) AS cnt FROM customer
                    GROUP BY {key})"""
            ).fetchone()
            # RELATIVE properties (survive corpus regeneration): the
            # block count must scale with n, and the largest block
            # must stay a small constant multiple of the mean block
            # size n / #blocks — absolute pins on generator details
            # (max <= 10, exactly-one prefix block) would break on any
            # testdata regen without a real regression.
            assert blocks >= n / 10, (sf_dir, key, blocks)
            assert mx <= 10 * max(1.0, n / blocks), (sf_dir, key, mx)
        # the REJECTED first-draft key, kept here as the counterexample:
        # a near-corpus-constant key concentrates the corpus in one
        # giant block at every n
        mx, blocks = con.execute(
            """SELECT max(cnt), count(*) FROM (
                 SELECT count(*) AS cnt FROM customer
                 GROUP BY upper(substr(c_name, 1, 12)))"""
        ).fetchone()
        assert mx > 0.5 * n  # degenerate — why it was dropped


def test_em_recovers_planted_model(spark):
    """The 2-iteration EM fit must land near the PLANTED corruption
    model without labels: match prior ~ true twin fraction of the
    block, m/u cleanly separated on the balance comparator (the
    near-perfect discriminator), and m_name mass on exact+close."""
    row = QUERIES["customers_record_linkage_em"](
        spark, SF_CORRECTNESS
    ).collect()[0]
    # true pairs in the nation block / block pairs = 1212/91619
    assert abs(row.p_hat - 1212 / 91619) < 0.002
    assert row.m_bal_agree > 0.95 and row.u_bal_agree < 0.01
    assert row.m_name_exact + row.m_name_close > 0.95
    assert row.u_name_exact < 0.01
