"""Streaming tail + reconcile/heal end-to-end (reference `sync`/`check`).
"""

import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.ledger import open_ledger
from web3research_etl_spark.operators.apply import apply_changelog_batch
from web3research_etl_spark.operators.reconcile import expected_state, heal, reconcile
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER
from web3research_etl_spark.streaming.pipeline import run_sync

N = 2000


def _new_table(spark, d, name, n_buckets=8):
    return LakeTable.create(
        spark, f"{d}/{name}", PAGES_SCHEMA, key=PAGES_KEY,
        version_order=PAGES_VERSION_ORDER, n_buckets=n_buckets,
    )


@pytest.fixture(scope="module")
def ch_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "changelog")
    generate_changelog(spark, N).repartition(6).write.mode("overwrite").parquet(d)
    return d


def test_streaming_matches_batch(spark, tmp_table_dir, ch_dir):
    ch = spark.read.parquet(ch_dir)

    t_stream = _new_table(spark, tmp_table_dir, "stream")
    ledger = open_ledger(spark, f"{tmp_table_dir}/ledger")
    q = run_sync(
        spark, ch_dir, t_stream, f"{tmp_table_dir}/ckpt",
        ledger=ledger, available_now=True, max_files_per_trigger=2,
    )
    q.awaitTermination()

    t_batch = _new_table(spark, tmp_table_dir, "batch")
    apply_changelog_batch(t_batch, ch, epoch_id=0)
    assert t_stream.state_hash() == t_batch.state_hash()
    # multiple micro-batches actually happened (maxFilesPerTrigger=2, 6 files)
    assert len(t_stream.committed_epochs()) >= 3
    # ledger saw every epoch
    assert set(ledger.read().select("epoch_id").distinct().toPandas()["epoch_id"]) == \
        t_stream.committed_epochs()


def test_streaming_restart_is_exactly_once(spark, tmp_table_dir, ch_dir):
    """Kill the checkpoint after a full drain, rerun from scratch: sink
    epoch markers are keyed by Spark epoch ids which restart at 0 — but
    the re-delivered batches are the SAME data, so LWW + force of the
    idempotent merge keeps the state identical."""
    t = _new_table(spark, tmp_table_dir, "restart")
    q = run_sync(spark, ch_dir, t, f"{tmp_table_dir}/ckpt1", available_now=True)
    q.awaitTermination()
    h1 = t.state_hash()
    # same checkpoint → no new data → no-op
    q = run_sync(spark, ch_dir, t, f"{tmp_table_dir}/ckpt1", available_now=True)
    q.awaitTermination()
    assert t.state_hash() == h1


def test_reconcile_statuses(spark, tmp_table_dir, ch_dir):
    ch = spark.read.parquet(ch_dir)
    t = _new_table(spark, tmp_table_dir, "recon")
    apply_changelog_batch(t, ch, epoch_id=0)
    # pristine table ⇒ all ok
    rep = reconcile(t.read(), expected_state(ch))
    assert rep.filter(F.col("status") != "ok").count() == 0

    # corrupt: drop some keys (missing) and merge a bogus newer row (divergent)
    victims = t.read().limit(5).select("url").collect()
    missing_urls = [r["url"] for r in victims[:3]]
    divergent_url = victims[3]["url"]
    fake = t.read().filter(F.col("url") == divergent_url).select(
        F.lit("U").alias("op"), "url", "warc_ts",
        (F.col("event_seq") + 10_000).alias("event_seq"), "html", "text", "lang",
    )
    t.merge_changelog(fake, epoch_id=9001)
    del_batch = t.read().filter(F.col("url").isin(missing_urls)).select(
        F.lit("D").alias("op"), "url", "warc_ts",
        (F.col("event_seq") + 10_000).alias("event_seq"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    t.merge_changelog(del_batch, epoch_id=9002)

    rep2 = reconcile(t.read(), expected_state(ch))
    bad = {r["url"]: r["status"] for r in rep2.filter(F.col("status") != "ok").collect()}
    assert set(bad.values()) == {"missing", "divergent"}
    assert bad[divergent_url] == "divergent"
    assert all(bad[u] == "missing" for u in missing_urls)

    # heal converges back to oracle state
    heal(t, ch, epoch_id=9003)
    rep3 = reconcile(t.read(), expected_state(ch))
    assert rep3.filter(F.col("status") != "ok").count() == 0


def test_heal_removes_orphans(spark, tmp_table_dir, ch_dir):
    ch = spark.read.parquet(ch_dir)
    t = _new_table(spark, tmp_table_dir, "orphan")
    apply_changelog_batch(t, ch, epoch_id=0)
    ghost = spark.createDataFrame(
        [("I", "https://ghost.example.com/x", 1, "g")],
        "op string, url string, event_seq long, v string",
    ).select(
        "op", "url", F.timestamp_seconds(F.lit(2_000_000_000)).alias("warc_ts"),
        "event_seq", F.lit(b"<p>ghost</p>").alias("html"),
        F.lit("ghost").alias("text"), F.lit("en").alias("lang"),
    )
    t.merge_changelog(ghost, epoch_id=9004)
    rep = reconcile(t.read(), expected_state(ch))
    assert rep.filter(F.col("status") == "orphan").count() == 1
    heal(t, ch, epoch_id=9005)
    assert t.read().filter(F.col("url") == "https://ghost.example.com/x").count() == 0
    assert reconcile(t.read(), expected_state(ch)).filter(F.col("status") != "ok").count() == 0
