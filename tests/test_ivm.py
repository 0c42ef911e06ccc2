"""Incremental view maintenance from CDC deltas must equal recompute.

The invariant: after every epoch, the delta-maintained grouped
aggregate (count + decimal sum per group) over the base table's live
state is IDENTICAL to a from-scratch groupBy of that state — including
across updates that MOVE a row between groups (retract old image, add
new) and deletes that empty a group (group row removed from the view).
"""

import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.operators.ivm import (
    aggregate_deltas,
    maintain_view,
)

BASE_DDL = "op string, url string, ts bigint, grp string, value double"
VIEW_DDL = "grp string, n_rows bigint, total_value decimal(18,2), epoch bigint"

VALUE_EXPR = lambda col: F.round(col("value"), 2).cast("decimal(18,2)")  # noqa: E731


def _mk_base(spark, path):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], BASE_DDL).drop("op").schema,
        key=["url"],
        version_order=["ts"],
        n_buckets=4,
    )


def _mk_view(spark, path):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], VIEW_DDL).schema,
        key=["grp"],
        version_order=["epoch"],
        n_buckets=2,
    )


def _recompute(base):
    return (
        base.read()
        .groupBy("grp")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
        )
    )


def _assert_view_matches(view, base):
    got = {
        r["grp"]: (r["n_rows"], r["total_value"])
        for r in view.read().select("grp", "n_rows", "total_value").collect()
    }
    want = {
        r["grp"]: (r["n_rows"], r["total_value"]) for r in _recompute(base).collect()
    }
    assert got == want


def test_view_tracks_base_across_epochs(spark, tmp_table_dir):
    base = _mk_base(spark, f"{tmp_table_dir}/base")
    view = _mk_view(spark, f"{tmp_table_dir}/view")
    epochs = [
        # epoch 0: seed two groups
        [("I", f"u{i}", 1, "a" if i < 6 else "b", 1.25) for i in range(10)],
        # epoch 1: update values in place, move u2 a→b, delete u9
        [
            ("U", "u0", 10, "a", 2.50),
            ("U", "u2", 11, "b", 1.25),
            ("D", "u9", 12, None, None),
        ],
        # epoch 2: empty group b entirely, insert a fresh group c
        [("D", f"u{i}", 20 + i, None, None) for i in (2, 6, 7, 8)]
        + [("I", "u42", 30, "c", 0.75)],
    ]
    prev = base.current_snapshot()["snapshot_id"]
    for e, rows in enumerate(epochs):
        r = base.merge_changelog(spark.createDataFrame(rows, BASE_DDL), epoch_id=e)
        maintain_view(view, base, prev, r["snapshot_id"], "grp", VALUE_EXPR, e)
        prev = r["snapshot_id"]
        _assert_view_matches(view, base)
    # group b must be GONE from the view (count reached zero), not zero-row
    groups = {r["grp"] for r in view.read().collect()}
    assert groups == {"a", "c"}


def test_group_migration_nets_exactly(spark, tmp_table_dir):
    base = _mk_base(spark, f"{tmp_table_dir}/base")
    base.merge_changelog(
        spark.createDataFrame([("I", "u1", 1, "a", 5.00)], BASE_DDL), epoch_id=0
    )
    s1 = base.current_snapshot()["snapshot_id"]
    base.merge_changelog(
        spark.createDataFrame([("U", "u1", 2, "b", 5.00)], BASE_DDL), epoch_id=1
    )
    s2 = base.current_snapshot()["snapshot_id"]
    chg = base.read_changes(s1, s2, include_before=True)
    row = chg.collect()[0]
    assert row["change_type"] == "update"
    assert row["grp"] == "b" and row["old_grp"] == "a"
    d = {
        r["grp"]: (r["d_rows"], r["d_value"])
        for r in aggregate_deltas(
            chg.withColumn("_v", VALUE_EXPR(F.col)).withColumn(
                "old__v", VALUE_EXPR(lambda c: F.col(f"old_{c}"))
            ),
            "grp",
            "_v",
        ).collect()
    }
    from decimal import Decimal

    assert d["a"] == (-1, Decimal("-5.00")) and d["b"] == (1, Decimal("5.00"))


def test_before_image_null_for_insert_over_tombstone(spark, tmp_table_dir):
    base = _mk_base(spark, f"{tmp_table_dir}/base")
    base.merge_changelog(
        spark.createDataFrame([("I", "u1", 1, "a", 1.0)], BASE_DDL), epoch_id=0
    )
    base.merge_changelog(
        spark.createDataFrame([("D", "u1", 2, None, None)], BASE_DDL), epoch_id=1
    )
    s2 = base.current_snapshot()["snapshot_id"]
    base.merge_changelog(
        spark.createDataFrame([("I", "u1", 3, "b", 2.0)], BASE_DDL), epoch_id=2
    )
    s3 = base.current_snapshot()["snapshot_id"]
    row = base.read_changes(s2, s3, include_before=True).collect()[0]
    assert row["change_type"] == "insert"
    assert row["old_grp"] is None and row["old_value"] is None


# ----------------------------------------------------------- streaming wiring

PAGES_VIEW_DDL = "lang string, n_rows bigint, total_value decimal(18,2), epoch bigint"
PAGES_VEXPR = lambda col: F.coalesce(  # noqa: E731
    F.length(col("text")), F.lit(0)
).cast("decimal(18,2)")


def _mk_pages_view(spark, path):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], PAGES_VIEW_DDL).schema,
        key=["lang"],
        version_order=["epoch"],
        n_buckets=2,
    )


def _pages_recompute(base):
    return {
        r["lang"]: (r["n_rows"], r["total_value"])
        for r in base.read()
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.coalesce(F.length("text"), F.lit(0)).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("total_value"),
        )
        .collect()
    }


def _view_rows(view):
    return {
        r["lang"]: (r["n_rows"], r["total_value"])
        for r in view.read().select("lang", "n_rows", "total_value").collect()
    }


def test_streaming_view_matches_recompute(spark, tmp_table_dir):
    """run_sync(view=...) maintains the per-lang view across every
    micro-batch; final view == from-scratch aggregate of the table."""
    from web3research_etl_spark.changelog import generate_changelog
    from web3research_etl_spark.schemas import (
        PAGES_KEY,
        PAGES_SCHEMA,
        PAGES_VERSION_ORDER,
    )
    from web3research_etl_spark.streaming.pipeline import run_sync

    ch_dir = f"{tmp_table_dir}/ch"
    generate_changelog(spark, 1200).repartition(4).write.parquet(ch_dir)
    base = LakeTable.create(
        spark, f"{tmp_table_dir}/base", PAGES_SCHEMA,
        key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=4,
    )
    view = _mk_pages_view(spark, f"{tmp_table_dir}/view")
    q = run_sync(
        spark, ch_dir, base, f"{tmp_table_dir}/ckpt",
        available_now=True, max_files_per_trigger=2,
        view=view, view_group="lang", view_value=PAGES_VEXPR,
    )
    q.awaitTermination()
    assert len(base.committed_epochs()) >= 2  # several micro-batches folded
    assert _view_rows(view) == _pages_recompute(base)
    assert (
        view.current_snapshot()["summary"]["view_through"]
        == base.current_snapshot()["snapshot_id"]
    )


def test_view_fold_telescopes_over_missed_epochs(spark, tmp_table_dir):
    """A crash between base-merge and view-fold just widens the next
    fold's span — net deltas telescope exactly."""
    from web3research_etl_spark.operators.ivm import sync_view

    base = _mk_base(spark, f"{tmp_table_dir}/base")
    view = _mk_view(spark, f"{tmp_table_dir}/view")
    base.merge_changelog(
        spark.createDataFrame([("I", f"u{i}", 1, "a", 1.0) for i in range(4)], BASE_DDL),
        epoch_id=0,
    )
    sync_view(view, base, "grp", VALUE_EXPR)
    # two merges with NO fold in between (simulated crash window)
    base.merge_changelog(
        spark.createDataFrame([("U", "u0", 10, "b", 2.0)], BASE_DDL), epoch_id=1
    )
    base.merge_changelog(
        spark.createDataFrame([("D", "u1", 11, None, None)], BASE_DDL), epoch_id=2
    )
    sync_view(view, base, "grp", VALUE_EXPR)
    _assert_view_matches(view, base)
    # re-running the same fold is the idempotent skip
    r = sync_view(view, base, "grp", VALUE_EXPR)
    assert r["skipped"] is True


def test_view_self_heals_after_snapshot_expiry(spark, tmp_table_dir):
    """Snapshot expiry breaking the incremental chain falls back to one
    full refresh — including deleting groups that vanished meanwhile."""
    from web3research_etl_spark.operators.ivm import sync_view

    base = _mk_base(spark, f"{tmp_table_dir}/base")
    view = _mk_view(spark, f"{tmp_table_dir}/view")
    base.merge_changelog(
        spark.createDataFrame(
            [("I", "u1", 1, "a", 1.0), ("I", "u2", 1, "b", 2.0)], BASE_DDL
        ),
        epoch_id=0,
    )
    sync_view(view, base, "grp", VALUE_EXPR)
    # group b vanishes; then expire history so the consumed-through
    # manifest is gone
    for e, rows in enumerate(
        [[("D", "u2", 5, None, None)], [("U", "u1", 6, "a", 3.0)],
         [("I", "u3", 7, "c", 4.0)]], start=1
    ):
        base.merge_changelog(spark.createDataFrame(rows, BASE_DDL), epoch_id=e)
    base.expire_snapshots(retain_last=1)
    r = sync_view(view, base, "grp", VALUE_EXPR)
    assert not r.get("skipped")
    _assert_view_matches(view, base)
    assert {x["grp"] for x in view.read().collect()} == {"a", "c"}
