"""Everything-on integration: one MoR streaming sync with CDC feed
publication, incremental materialized view, and in-stream maintenance
(compaction + snapshot expiry + blooms) ALL enabled — against a plain
CoW sync of the same changelog. Cross-feature interactions are where
lake engines rot (a compaction that breaks the feed diff, an expiry
that wedges the view fold, a delta generation the bloom builder
resolves away); this pins the whole braid end-to-end:

- converged base state: MoR+maintenance == plain CoW (content hash);
- a mirror replicated ONLY from the published feed == the base;
- the incremental view == a from-scratch aggregate of the base;
- point lookups through the bloom sidecars return the LWW winners.
"""

import glob
import os

from pyspark.sql import functions as F

from web3research_etl_spark.changelog import write_changelog_dir
from web3research_etl_spark.lake.cdc_feed import apply_feed, feed_schema
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER
from web3research_etl_spark.streaming.pipeline import run_sync

PAGES_VIEW_DDL = "lang string, n_rows bigint, total_value decimal(18,2), epoch bigint"


def _vexpr(col):
    return F.coalesce(F.length(col("text")), F.lit(0)).cast("decimal(18,2)")


def test_mor_feed_view_maintenance_braid(spark, tmp_table_dir):
    src = os.path.join(tmp_table_dir, "ch")
    write_changelog_dir(spark, src, 4000, files_per_batch=8)

    def mk_pages(tag):
        return LakeTable.create(
            spark, os.path.join(tmp_table_dir, tag), PAGES_SCHEMA,
            key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
        )

    # plain CoW run: the semantic reference
    cow = mk_pages("cow")
    run_sync(
        spark, src, cow, os.path.join(tmp_table_dir, "ck_cow"),
        available_now=True, max_files_per_trigger=2,
    ).awaitTermination()

    # everything-on MoR run
    mor = mk_pages("mor")
    view = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "view"),
        spark.createDataFrame([], PAGES_VIEW_DDL).schema,
        key=["lang"], version_order=["epoch"], n_buckets=2,
    )
    feed = os.path.join(tmp_table_dir, "feed")
    run_sync(
        spark, src, mor, os.path.join(tmp_table_dir, "ck_mor"),
        available_now=True, max_files_per_trigger=2,
        write_mode="mor",
        feed_dir=feed, feed_payloads=True,
        view=view, view_group="lang", view_value=_vexpr,
        maintain_every=2, maintain_retain_last=8, maintain_blooms=True,
        maintain_min_groups=2,
    ).awaitTermination()

    assert len(mor.committed_epochs()) >= 3
    # 1) write-path + maintenance independence of the converged state
    assert mor.state_hash() == cow.state_hash()

    # 2) feed-only mirror converges (diffs computed through resolved
    #    MoR reads, across compactions and expiries)
    mirror = mk_pages("mirror")
    schema = feed_schema(mor, payloads=True, out_dir=feed)
    for i, sdir in enumerate(sorted(glob.glob(f"{feed}/s*"))):
        apply_feed(mirror, spark.read.schema(schema).parquet(sdir), epoch_id=i)
    assert mirror.state_hash() == mor.state_hash()

    # 3) incremental view == from-scratch aggregate
    recomputed = {
        r["lang"]: (r["n_rows"], r["total_value"])
        for r in mor.read().groupBy("lang").agg(
            F.count("*").alias("n_rows"),
            F.sum(_vexpr(F.col)).cast("decimal(18,2)").alias("total_value"),
        ).collect()
    }
    got = {
        r["lang"]: (r["n_rows"], r["total_value"])
        for r in view.read().select("lang", "n_rows", "total_value").collect()
    }
    assert got == recomputed

    # 4) bloom-assisted point lookup returns LWW winners
    urls = [r["url"] for r in mor.read().select("url").limit(3).collect()]
    expect = {
        (r["url"], r["event_seq"])
        for r in cow.read().filter(F.col("url").isin(urls))
        .select("url", "event_seq").collect()
    }
    got_pl = {
        (r["url"], r["event_seq"])
        for r in mor.read_for_keys(urls).select("url", "event_seq").collect()
    }
    assert got_pl == expect


def test_feed_retention_in_stream_consumer_survives(spark, tmp_table_dir):
    """sync --feed --maintain-every N --maintain-expire-feed bounds BOTH
    snapshot history and the feed directory in-stream, and a consumer
    whose checkpoint keeps up with table retention (the documented feed
    contract) still converges:

    phase 1 — sync the first half of the changelog with --feed; the
    consumer drains every published dir. phase 2 — sync the rest with
    in-stream maintenance + feed expiry sized so the PRUNED dirs are all
    phase-1 dirs (already consumed); the consumer then drains only the
    surviving new dirs. The feed-built mirror must equal the base, and
    pruning must actually have happened.
    """
    from web3research_etl_spark.changelog import generate_changelog

    ch = generate_changelog(spark, 4000).cache()
    try:
        src1 = os.path.join(tmp_table_dir, "ch1")
        src2 = os.path.join(tmp_table_dir, "ch2")
        ch.filter(F.col("event_seq") < 2000).repartition(8).write.parquet(src1)
        ch.filter(F.col("event_seq") >= 2000).repartition(8).write.parquet(src2)

        base = LakeTable.create(
            spark, os.path.join(tmp_table_dir, "base"), PAGES_SCHEMA,
            key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
        )
        feed = os.path.join(tmp_table_dir, "feed")
        mirror = LakeTable.create(
            spark, os.path.join(tmp_table_dir, "mirror"), PAGES_SCHEMA,
            key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
        )

        def drain(consumed: set, epoch0: int) -> int:
            schema = feed_schema(base, payloads=True, out_dir=feed)
            e = epoch0
            for sdir in sorted(glob.glob(f"{feed}/s*"),
                               key=lambda p: int(os.path.basename(p)[1:])):
                if sdir in consumed:
                    continue
                apply_feed(mirror, spark.read.schema(schema).parquet(sdir), epoch_id=e)
                consumed.add(sdir)
                e += 1
            return e

        # phase 1: publish-only sync (many small epochs → many feed dirs)
        run_sync(
            spark, src1, base, os.path.join(tmp_table_dir, "ck1"),
            available_now=True, max_files_per_trigger=1,
            feed_dir=feed, feed_payloads=True,
        ).awaitTermination()
        consumed: set = set()
        next_epoch = drain(consumed, 0)
        phase1_dirs = set(glob.glob(f"{feed}/s*"))
        assert len(phase1_dirs) >= 4

        # phase 2: maintenance + feed expiry in-stream; retention large
        # enough that only already-consumed phase-1 dirs fall below the
        # feed floor (the consumer-lag sizing rule from the docstring)
        run_sync(
            spark, src2, base, os.path.join(tmp_table_dir, "ck2"),
            available_now=True, max_files_per_trigger=1,
            feed_dir=feed, feed_payloads=True,
            maintain_every=2, maintain_retain_last=10,
            maintain_expire_feed=True,
        ).awaitTermination()
        pruned = phase1_dirs - set(glob.glob(f"{feed}/s*"))
        assert pruned, "feed expiry never pruned anything"
        assert pruned <= consumed, "pruned a dir the consumer had not drained"
        drain(consumed, next_epoch)
        assert mirror.state_hash() == base.state_hash()
    finally:
        ch.unpersist()
