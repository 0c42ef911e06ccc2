"""Streaming-only semantics (SURVEY §2.7): watermarked windowed aggs and
the applyInPandasWithState custom stateful operator."""

import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.schemas import CHANGELOG_SCHEMA
from web3research_etl_spark.streaming.stateful import (
    running_key_state,
    windowed_event_rates,
)

N = 1500


@pytest.fixture(scope="module")
def ch_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stateful") / "changelog")
    generate_changelog(spark, N).repartition(4).write.mode("overwrite").parquet(d)
    return d


def _stream(spark, ch_dir, max_files=2):
    return (
        spark.readStream.schema(CHANGELOG_SCHEMA)
        .format("parquet")
        .option("maxFilesPerTrigger", max_files)
        .load(ch_dir)
    )


def _drain(df, name, output_mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_windowed_rates_match_batch_windows(spark, ch_dir):
    """Streaming watermark windows over a bounded drain == batch window
    agg (no event is later than the watermark relative to the final
    watermark position once the stream is fully drained in order)."""
    _drain(
        windowed_event_rates(_stream(spark, ch_dir, max_files=4)),
        "win_rates",
        "append",
    )
    got = spark.sql(
        "SELECT window_start, op, sum(n_events) AS n FROM win_rates "
        "GROUP BY window_start, op"
    )

    batch = spark.read.parquet(ch_dir)
    expected = (
        batch.groupBy(F.window("warc_ts", "10 minutes").alias("w"), "op")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "op", "n")
    )
    # append mode only emits windows the watermark has CLOSED; every
    # emitted window must exactly match the batch computation, and most
    # windows must have been emitted (the tail ones stay open).
    emitted = {tuple(r) for r in got.collect()}
    full = {tuple(r) for r in expected.collect()}
    assert emitted <= full
    assert len(emitted) >= 0.8 * len(full)


def test_running_key_state_accumulates_across_batches(spark, ch_dir):
    """Final state per key == batch groupBy; keys spanning multiple
    micro-batches must have batches_seen > 1 (state really crossed
    batch boundaries)."""
    _drain(
        running_key_state(_stream(spark, ch_dir, max_files=1)),
        "key_state",
        "update",
    )
    # update mode re-emits a row per key per batch; keep the last
    last = spark.sql(
        "SELECT url, max(n_events_total) AS n_events_total, "
        "max(max_event_seq) AS max_event_seq, max(batches_seen) AS batches_seen "
        "FROM key_state GROUP BY url"
    )
    expected = (
        spark.read.parquet(ch_dir)
        .groupBy("url")
        .agg(
            F.count("*").alias("exp_n"),
            F.max("event_seq").alias("exp_max"),
        )
    )
    j = last.join(expected, "url", "full_outer")
    assert (
        j.filter(
            F.col("n_events_total").isNull()
            | F.col("exp_n").isNull()
            | (F.col("n_events_total") != F.col("exp_n"))
            | (F.col("max_event_seq") != F.col("exp_max"))
        ).count()
        == 0
    )
    assert last.filter(F.col("batches_seen") > 1).count() > 0


def test_dedup_within_watermark_matches_batch_distinct(spark, ch_dir):
    from web3research_etl_spark.streaming.stateful import dedup_within_watermark

    s = dedup_within_watermark(
        _stream(spark, ch_dir), watermark="365 days"
    ).select("url", "warc_ts", "event_seq")
    _drain(s, "dedup_wm", "append")
    got = spark.table("dedup_wm").count()
    want = (
        spark.read.parquet(ch_dir)
        .select("url", "warc_ts", "event_seq")
        .distinct()
        .count()
    )
    total = spark.read.parquet(ch_dir).count()
    assert total > want  # the generator really did emit duplicates
    assert got == want  # removed across micro-batch boundaries
