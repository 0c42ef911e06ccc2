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


def test_async_sidecars_converge_identically(spark, tmp_table_dir):
    """sidecar_async=True moves feed publish + view fold off the epoch
    critical path (VERDICT r4 next #2: they were a fixed driver-serial
    slice). The contract: a bounded run with async sidecars — drained
    via q.w3r_join_sidecars() — produces the IDENTICAL converged table,
    feed mirror, and view as the synchronous path, maintenance braid
    included (publish-before-expire still holds because maintenance
    joins the in-flight pass first)."""
    src = os.path.join(tmp_table_dir, "ch2")
    write_changelog_dir(spark, src, 3000, files_per_batch=8)

    def _run(tag, async_flag):
        t = LakeTable.create(
            spark, os.path.join(tmp_table_dir, f"t_{tag}"), PAGES_SCHEMA,
            key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
        )
        view = LakeTable.create(
            spark, os.path.join(tmp_table_dir, f"v_{tag}"),
            spark.createDataFrame([], PAGES_VIEW_DDL).schema,
            key=["lang"], version_order=["epoch"], n_buckets=2,
        )
        feed = os.path.join(tmp_table_dir, f"f_{tag}")
        q = run_sync(
            spark, src, t, os.path.join(tmp_table_dir, f"ck_{tag}"),
            available_now=True, max_files_per_trigger=2,
            feed_dir=feed, feed_payloads=True,
            view=view, view_group="lang", view_value=_vexpr,
            maintain_every=2, maintain_retain_last=8,
            sidecar_async=async_flag,
        )
        q.awaitTermination()
        q.w3r_join_sidecars()
        return t, view, feed

    t_sync, v_sync, f_sync = _run("sync", False)
    t_async, v_async, f_async = _run("async", True)
    assert t_async.state_hash() == t_sync.state_hash()

    def _view_rows(v):
        return sorted(
            (r["lang"], r["n_rows"], r["total_value"])
            for r in v.read().select("lang", "n_rows", "total_value").collect()
        )

    assert _view_rows(v_async) == _view_rows(v_sync)

    def _mirror_hash(feed, src_table, tag):
        mirror = LakeTable.create(
            spark, os.path.join(tmp_table_dir, f"m_{tag}"), PAGES_SCHEMA,
            key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
        )
        schema = feed_schema(src_table, payloads=True, out_dir=feed)
        for i, sdir in enumerate(sorted(glob.glob(f"{feed}/s*"))):
            apply_feed(mirror, spark.read.schema(schema).parquet(sdir), epoch_id=i)
        return mirror.state_hash()

    assert _mirror_hash(f_async, t_async, "a") == _mirror_hash(
        f_sync, t_sync, "s"
    ) == t_sync.state_hash()


def test_maintain_cluster_by_in_stream(spark, tmp_table_dir):
    """--maintain-cluster-by (VERDICT r4 next #7): the in-stream
    maintenance braid keeps z-order clustering fresh at the compaction
    cadence. After a bounded sync with maintain_every + cluster-by, a
    NON-key column range read must skip files via the per-column
    manifest stats the clustered rewrite recorded — and the converged
    state must be identical to a plain run (layout-only, like every
    maintenance op)."""
    src = os.path.join(tmp_table_dir, "ch3")
    write_changelog_dir(spark, src, 3000, files_per_batch=8)

    plain = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "plain3"), PAGES_SCHEMA,
        key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
    )
    run_sync(
        spark, src, plain, os.path.join(tmp_table_dir, "ck_p3"),
        available_now=True, max_files_per_trigger=2,
    ).awaitTermination()

    clustered = LakeTable.create(
        spark, os.path.join(tmp_table_dir, "clust3"), PAGES_SCHEMA,
        key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
    )
    run_sync(
        spark, src, clustered, os.path.join(tmp_table_dir, "ck_c3"),
        available_now=True, max_files_per_trigger=2,
        maintain_every=2, maintain_retain_last=8,
        maintain_cluster_by=["event_seq"], maintain_cluster_files=6,
    ).awaitTermination()

    assert clustered.state_hash() == plain.state_hash()

    # the braid left per-column stats behind: a mid-range event_seq
    # band must skip files, and read identically to the full scan
    q = clustered.read().approxQuantile("event_seq", [0.4, 0.5], 0.01)
    lo, hi = int(q[0]), int(q[1])
    snap = clustered.current_snapshot()
    _, kept, total = clustered._prune_groups_for_column_range(
        snap, "event_seq", lo, hi
    )
    assert total >= 12 and kept < total
    got = clustered.read_for_column_range("event_seq", lo, hi).count()
    want = clustered.read().filter(
        (F.col("event_seq") >= lo) & (F.col("event_seq") <= hi)
    ).count()
    assert got == want > 0
