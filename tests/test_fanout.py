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
