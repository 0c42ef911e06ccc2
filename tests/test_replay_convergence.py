"""North-rule end-to-end properties (SURVEY.md §5):

1. full run vs chunked run vs duplicated-epoch run all converge to the
   identical final state (content hash) — the reference's idempotent-
   replay invariant (/root/reference/src/ch_eth/init.rs:169,
   scripts/optimize_db.py:27) upgraded to exactly-once;
2. final state matches an independent DuckDB LWW oracle;
3. schema evolution mid-stream (payload v1→v2→v3) lands adds/renames/
   widens correctly;
4. resume-from-checkpoint: replay starting from a mid-run snapshot's
   ledger offsets reconverges.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.ledger import open_ledger, resume_offsets
from web3research_etl_spark.operators.apply import apply_changelog_batch
from web3research_etl_spark.registry import default_registry
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER

N_EVENTS = 3000


@pytest.fixture(scope="module")
def changelog_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ch") / "changelog.parquet")
    generate_changelog(spark, N_EVENTS).write.mode("overwrite").parquet(p)
    return p


def _new_table(spark, d, name):
    return LakeTable.create(
        spark,
        f"{d}/{name}",
        PAGES_SCHEMA,
        key=PAGES_KEY,
        version_order=PAGES_VERSION_ORDER,
        n_buckets=8,
    )


def _run(spark, d, name, ch, epochs):
    """epochs: list of (epoch_id, filter_expr) — applied in order."""
    t = _new_table(spark, d, name)
    for epoch_id, cond in epochs:
        apply_changelog_batch(t, ch.filter(cond), epoch_id=epoch_id)
    return t


def test_replay_and_duplicate_convergence(spark, tmp_table_dir, changelog_path):
    ch = spark.read.parquet(changelog_path)
    third = N_EVENTS // 3
    chunks = [
        (0, F.col("event_seq") < third),
        (1, (F.col("event_seq") >= third) & (F.col("event_seq") < 2 * third)),
        (2, F.col("event_seq") >= 2 * third),
    ]
    t_full = _run(spark, tmp_table_dir, "full", ch, [(0, F.lit(True))])
    t_chunked = _run(spark, tmp_table_dir, "chunked", ch, chunks)
    # duplicated-batch re-delivery: every chunk applied twice
    t_dup = _run(
        spark, tmp_table_dir, "dup", ch, [c for pair in zip(chunks, chunks) for c in pair]
    )
    h_full, h_chunked, h_dup = (
        t_full.state_hash(),
        t_chunked.state_hash(),
        t_dup.state_hash(),
    )
    assert h_full == h_chunked == h_dup


def test_final_state_matches_duckdb_oracle(spark, tmp_table_dir, changelog_path):
    ch = spark.read.parquet(changelog_path)
    t = _run(spark, tmp_table_dir, "oracle", ch, [(0, F.lit(True))])
    got = sorted(
        (r["url"], r["event_seq"], r["lang"]) for r in t.read().collect()
    )
    expected = sorted(
        duckdb.sql(
            f"""
            SELECT url, event_seq, lang FROM (
              SELECT url, event_seq, lang, op,
                     row_number() OVER (PARTITION BY url
                                        ORDER BY warc_ts DESC, event_seq DESC) rn
              FROM parquet_scan('{changelog_path}/*.parquet')
            ) WHERE rn = 1 AND op <> 'D'
            """
        ).fetchall()
    )
    assert got == expected


def test_schema_evolution_mid_stream(spark, tmp_table_dir, changelog_path):
    ch = spark.read.parquet(changelog_path)
    reg = default_registry(spark)
    t = _new_table(spark, tmp_table_dir, "evo")
    # three epochs in payload_version order: v1-only, v2, v3
    for epoch, v in [(0, 1), (1, 2), (2, 3)]:
        apply_changelog_batch(
            t, ch.filter(F.col("payload_version") == v), epoch_id=epoch, registry=reg
        )
    cols = dict(t.read().dtypes)
    assert cols["content_len"] == "bigint"  # widened
    assert "http_status" in cols and "fetch_status" not in cols  # renamed
    # v3 rows carry http_status; surviving v1/v2-era rows readable (nulls ok)
    latest = t.read().filter(F.col("http_status").isNotNull())
    assert latest.count() > 0


def test_resume_from_ledger_offsets(spark, tmp_table_dir, changelog_path):
    ch = spark.read.parquet(changelog_path)
    half = N_EVENTS // 2
    d = tmp_table_dir
    t = _new_table(spark, d, "resume")
    ledger = open_ledger(spark, f"{d}/resume_ledger")
    apply_changelog_batch(t, ch.filter(F.col("event_seq") < half), 0, ledger=ledger)
    offs = resume_offsets(ledger)
    assert offs and all(v < half for v in offs.values())
    # resume: per-partition tail strictly after the recorded offsets
    tail_conds = [
        (F.col("source_partition") == p) & (F.col("event_seq") > o)
        for p, o in offs.items()
    ]
    cond = tail_conds[0]
    for c in tail_conds[1:]:
        cond = cond | c
    apply_changelog_batch(t, ch.filter(cond), 1, ledger=ledger)

    t_ref = _run(spark, d, "resume_ref", ch, [(0, F.lit(True))])
    assert t.state_hash() == t_ref.state_hash()


def test_evolution_out_of_order_epochs(spark, tmp_table_dir, changelog_path):
    """Regression: a v3 batch followed by another v3 batch must not re-add
    a column under its pre-rename name (net-diff sync, not change replay)."""
    ch = spark.read.parquet(changelog_path)
    reg = default_registry(spark)
    t = _new_table(spark, tmp_table_dir, "evo_ooo")
    v3 = ch.filter(F.col("payload_version") == 3)
    apply_changelog_batch(t, v3.filter(F.col("event_seq") % 2 == 0), 0, registry=reg)
    apply_changelog_batch(t, v3.filter(F.col("event_seq") % 2 == 1), 1, registry=reg)
    # mixed-version batch after full evolution
    apply_changelog_batch(t, ch.filter(F.col("payload_version") == 1).limit(50), 2, registry=reg)
    cols = [c for c, _ in t.read().dtypes]
    assert cols.count("http_status") == 1 and "fetch_status" not in cols
    assert t.read().count() > 0
