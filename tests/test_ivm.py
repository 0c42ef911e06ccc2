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
