"""Multi-table fan-out (SURVEY S7): one changelog batch → N route
tables with per-table epoch markers; convergence across a driver death
between table commits (the reference's torn-state window,
/root/reference/src/ch_eth/init.rs:403-425, here closed)."""

import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.changelog import write_changelog_dir
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.operators.dispatch import REST_ROUTE
from web3research_etl_spark.operators.fanout import apply_fanout_batch, run_fanout_sync
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER

ROUTES = ["en", "de", "fr"]


def _mk_tables(spark, root, tag):
    tables = {
        r: LakeTable.create(
            spark, f"{root}/{tag}_{r}", PAGES_SCHEMA, key=PAGES_KEY,
            version_order=PAGES_VERSION_ORDER, n_buckets=4,
        )
        for r in ROUTES
    }
    tables[REST_ROUTE] = LakeTable.create(
        spark, f"{root}/{tag}_rest", PAGES_SCHEMA, key=PAGES_KEY,
        version_order=PAGES_VERSION_ORDER, n_buckets=4,
    )
    return tables


@pytest.fixture(scope="module")
def ch_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fanout_ch"))
    write_changelog_dir(spark, f"{d}/ch", 3000)
    return f"{d}/ch"


def _hashes(tables):
    return {r: t.state_hash() for r, t in tables.items()}


def test_fanout_routes_and_idempotency(spark, tmp_table_dir, ch_dir):
    ch = spark.read.parquet(ch_dir)
    tables = _mk_tables(spark, tmp_table_dir, "a")
    res = apply_fanout_batch(tables, ch, epoch_id=0, discriminator=F.col("lang"))
    assert set(res) == set(tables)
    assert all(not r.get("skipped") for r in res.values())

    # every surviving row landed in its lang's table; deletes (lang null
    # in the changelog) flowed through REST
    for r in ROUTES:
        rows = tables[r].read()
        assert rows.count() > 0
        assert rows.filter(F.col("lang") != r).count() == 0
    # the routed tables partition the survivors of per-route LWW
    total = sum(tables[r].read().count() for r in tables)
    assert total > 0

    # re-delivery of the same epoch: every table skips, state unchanged
    before = _hashes(tables)
    res2 = apply_fanout_batch(tables, ch, epoch_id=0, discriminator=F.col("lang"))
    assert all(r.get("skipped") for r in res2.values())
    assert _hashes(tables) == before


def test_fanout_converges_after_crash_between_commits(spark, tmp_table_dir, ch_dir):
    """Kill the driver after the FIRST route's commit; the retry must
    skip the committed table, apply the rest, and land bit-identical to
    a crash-free run."""
    ch = spark.read.parquet(ch_dir)
    crashed = _mk_tables(spark, tmp_table_dir, "crash")
    clean = _mk_tables(spark, tmp_table_dir, "clean")

    class Die(RuntimeError):
        pass

    committed: list[str] = []

    def die_after_first(route, result):
        committed.append(route)
        raise Die(f"driver died after {route}")

    with pytest.raises(Die):
        apply_fanout_batch(
            crashed, ch, epoch_id=0, discriminator=F.col("lang"),
            on_route_committed=die_after_first,
        )
    first = committed[0]
    assert first == sorted(crashed)[0]
    # torn state: first table committed epoch 0, the others did not
    assert 0 in crashed[first].committed_epochs()
    for r in sorted(crashed)[1:]:
        assert 0 not in crashed[r].committed_epochs()

    # retry the SAME (batch, epoch): committed table skips, rest apply
    res = apply_fanout_batch(crashed, ch, epoch_id=0, discriminator=F.col("lang"))
    assert res[first].get("skipped") is True
    assert all(not res[r].get("skipped") for r in sorted(crashed)[1:])

    # crash-free reference run
    apply_fanout_batch(clean, ch, epoch_id=0, discriminator=F.col("lang"))
    assert {r: crashed[r].state_hash() for r in crashed} == {
        r: clean[r].state_hash() for r in clean
    }


@pytest.mark.slow
def test_fanout_streaming_end_to_end(spark, tmp_table_dir, ch_dir):
    """run_fanout_sync drains the changelog through foreachBatch into
    all route tables; final states equal a single-batch fanout."""
    tables = _mk_tables(spark, tmp_table_dir, "strm")
    oneshot = _mk_tables(spark, tmp_table_dir, "ones")
    q = run_fanout_sync(
        spark, ch_dir, tables, f"{tmp_table_dir}/ckpt",
        discriminator=F.col("lang"), max_files_per_trigger=3,
        available_now=True,
    )
    q.awaitTermination()
    # multiple epochs were committed per table
    assert all(len(t.committed_epochs()) >= 2 for t in tables.values())

    ch = spark.read.parquet(ch_dir)
    apply_fanout_batch(oneshot, ch, epoch_id=0, discriminator=F.col("lang"))
    assert {r: tables[r].state_hash() for r in tables} == {
        r: oneshot[r].state_hash() for r in oneshot
    }


def test_check_fanout_heals_corrupted_route(spark, tmp_table_dir, ch_dir):
    """Reference `check` heals every table of a block (sync.rs:100-115);
    check_fanout is the per-route sweep: corrupt ONE route mid-fleet,
    reconcile flags exactly that route, heal restores content-hash
    equality with an uncorrupted run."""
    from web3research_etl_spark.operators.fanout import check_fanout

    ch = spark.read.parquet(ch_dir)
    tables = _mk_tables(spark, tmp_table_dir, "healroute")
    clean = _mk_tables(spark, tmp_table_dir, "healclean")
    apply_fanout_batch(tables, ch, epoch_id=0, discriminator=F.col("lang"))
    apply_fanout_batch(clean, ch, epoch_id=0, discriminator=F.col("lang"))

    # corrupt route 'de': force-replace one stored row with a stale version
    victim = tables["de"].read().limit(1).collect()[0]
    stale = (
        tables["de"].read()
        .filter(F.col("url") == victim["url"])
        .select(
            F.lit("U").alias("op"), "url",
            F.timestamp_seconds(F.lit(1)).alias("warc_ts"),
            F.lit(0).cast("long").alias("event_seq"),
            "html", "text", "lang",
        )
    )
    tables["de"].merge_changelog(stale, epoch_id=7001, force_replace=True)
    assert tables["de"].state_hash() != clean["de"].state_hash()

    rep = check_fanout(tables, ch, discriminator=F.col("lang"))
    bad_routes = {r for r, v in rep.items() if any(k != "ok" for k in v["reconcile"])}
    assert bad_routes == {"de"}

    rep2 = check_fanout(tables, ch, discriminator=F.col("lang"), heal=True)
    assert rep2["de"]["healed"] and not rep2["en"]["healed"]
    assert {r: tables[r].state_hash() for r in tables} == {
        r: clean[r].state_hash() for r in clean
    }
    # post-heal sweep is all-ok everywhere
    rep3 = check_fanout(tables, ch, discriminator=F.col("lang"))
    assert all(set(v["reconcile"]) == {"ok"} or not v["reconcile"] for v in rep3.values())


def test_fanout_random_crash_schedules_converge(spark, tmp_table_dir, ch_dir):
    """Property (VERDICT r02 next #5): ANY schedule of crashes between
    route commits, retried to completion, converges every route table to
    the crash-free state — per-table epoch markers close each torn
    window. Seeded random schedules instead of the single fixed crash of
    test_fanout_converges_after_crash_between_commits."""
    import random

    ch = spark.read.parquet(ch_dir)
    clean = _mk_tables(spark, tmp_table_dir, "rc_clean")
    apply_fanout_batch(clean, ch, epoch_id=0, discriminator=F.col("lang"))
    clean_hashes = _hashes(clean)

    class Die(RuntimeError):
        pass

    for seed in (11, 23):
        rng = random.Random(seed)
        tables = _mk_tables(spark, tmp_table_dir, f"rc_{seed}")
        attempts = 0
        while True:
            attempts += 1
            # crash after a random number of route commits (maybe never)
            crash_after = rng.randrange(0, len(tables) + 1)
            seen = []

            def maybe_die(route, result, _n=crash_after, _seen=seen):
                _seen.append(route)
                if len(_seen) == _n:
                    raise Die(route)

            try:
                apply_fanout_batch(
                    tables, ch, epoch_id=0, discriminator=F.col("lang"),
                    on_route_committed=maybe_die,
                )
                break
            except Die:
                continue  # retry the SAME (batch, epoch) — the CDC contract
        assert attempts >= 1
        assert _hashes(tables) == clean_hashes, f"seed {seed} diverged"


def test_fanout_mor_converges_to_cow(spark, tmp_table_dir, ch_dir):
    """write_mode='mor' through the fan-out: every route table's
    resolved state equals the CoW fan-out's, per-route delta groups
    exist before compaction, and redelivery skips under MoR too."""
    ch = spark.read.parquet(ch_dir).cache()
    try:
        cow = _mk_tables(spark, tmp_table_dir, "wm_cow")
        mor = _mk_tables(spark, tmp_table_dir, "wm_mor")
        halves = [
            ch.filter(F.pmod(F.col("event_seq"), F.lit(2)) == i) for i in range(2)
        ]
        for e, part in enumerate(halves):
            apply_fanout_batch(cow, part, epoch_id=e, discriminator=F.col("lang"))
            apply_fanout_batch(
                mor, part, epoch_id=e, discriminator=F.col("lang"), write_mode="mor"
            )
        assert any(
            fg.get("delta")
            for t in mor.values()
            for fg in t.current_snapshot()["file_groups"]
        )
        redo = apply_fanout_batch(
            mor, halves[0], epoch_id=0, discriminator=F.col("lang"), write_mode="mor"
        )
        assert all(r.get("skipped") for r in redo.values())
        for r in mor:
            mor[r].rewrite_small_files()
            assert mor[r].state_hash() == cow[r].state_hash(), r
    finally:
        ch.unpersist()
