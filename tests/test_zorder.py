"""Z-order clustered compaction (rewrite_clustered) + per-column file
skipping (read_for_column_range): the fourth pruning level on top of
bucket pruning, leading-key range stats, and Bloom sidecars.

Re-expresses the reference's multi-column ClickHouse ORDER BY sparse
primary index (src/ch_eth/init.rs table DDL) as an Iceberg/Delta-style
OPTIMIZE ZORDER: interleaved-bit quantile codes, z-banded file split
within each hash bucket, per-file per-column manifest stats."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.lake.zorder import (
    compute_boundaries,
    quantile_code_expr,
    zvalue_expr,
)


def _schema():
    return T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )


def _table(spark, d, n=4000, n_keys=400):
    t = LakeTable.create(
        spark, f"{d}/t", _schema(), key=["url"],
        version_order=["ts", "event_id"], n_buckets=8,
    )
    df = spark.range(n).select(
        F.concat(
            F.lit("https://site-"), (F.col("id") % n_keys).cast("string")
        ).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
        F.col("id").alias("event_id"),
        (F.pmod(F.xxhash64("id"), F.lit(10000)) / F.lit(100.0)).alias("value"),
        F.lit("U").alias("op"),
    )
    t.merge_changelog(df, epoch_id=0)
    return t


# ---------------------------------------------------------------- kernel


def test_zvalue_interleaves_bits(spark):
    # z(code0, code1) with bits=2: bit layout [c0b1 c1b1 c0b0 c1b0]
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 3), (2, 1)], "a long, b long"
    ).withColumn(
        "z", zvalue_expr([F.col("a"), F.col("b")], bits=2)
    )
    got = {(r["a"], r["b"]): r["z"] for r in rows.collect()}
    # a owns the higher bit of each round: z = interleave(a1 b1 a0 b0)
    assert got[(0, 0)] == 0b0000
    assert got[(1, 0)] == 0b0010
    assert got[(0, 1)] == 0b0001
    assert got[(3, 3)] == 0b1111
    assert got[(2, 1)] == 0b1001


def test_zvalue_rejects_overflow():
    with pytest.raises(ValueError):
        zvalue_expr([F.lit(0)] * 8, bits=8)  # 64 > 62 bits


def test_quantile_code_strings_and_nulls(spark):
    df = spark.createDataFrame(
        [("a",), ("m",), ("z",), (None,)], "s string"
    ).withColumn("c", quantile_code_expr("s", ["b", "n"], bits=8))
    got = {r["s"]: r["c"] for r in df.collect()}
    # ranks 0,1,2 over 2 boundaries, left-scaled into [0, 255]:
    # rank * 255 // 2 — order preserved, MSB informative (127 vs 255)
    assert got["a"] == 0 and got["m"] == 127 and got["z"] == 255
    assert got[None] == 0  # nulls-first: code 0, never an error
    assert got["a"] < got["m"] < got["z"]


def test_quantile_code_low_cardinality_uses_high_bits(spark):
    """A 2-distinct-value column must split on the code MSB — the bit
    the z-band consumes first — not hide in the low bits."""
    df = spark.createDataFrame([("en",), ("fr",)], "s string").withColumn(
        "c", quantile_code_expr("s", ["fr"], bits=8)
    )
    got = {r["s"]: r["c"] for r in df.collect()}
    assert got["en"] == 0 and got["fr"] == 255
    assert (got["fr"] >> 7) != (got["en"] >> 7)


def test_boundaries_dedup_on_skew(spark):
    df = spark.createDataFrame([(1,)] * 100 + [(2,)] * 5, "v long")
    b = compute_boundaries(df, ["v"], bits=4, sample_rows=50)
    assert b["v"] == sorted(set(b["v"]))  # deduped, monotone


# ------------------------------------------------- clustered rewrite


def test_rewrite_clustered_preserves_state_and_prunes(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    h0 = t.state_hash()
    res = t.rewrite_clustered(["value", "event_id"], files_per_bucket=4)
    assert not res["skipped"]
    assert t.state_hash() == h0  # physical-only rewrite
    snap = t.current_snapshot()
    assert snap["operation"] == "cluster"
    # secondary-column range: stats must actually skip files
    _, kept, total = t._prune_groups_for_column_range(snap, "value", 10.0, 20.0)
    assert total > 8  # bucket split into multiple z-band files
    assert kept < total
    got = sorted(
        r["url"] for r in t.read_for_column_range("value", 10.0, 20.0).collect()
    )
    want = sorted(
        r["url"]
        for r in t.read()
        .filter((F.col("value") >= 10.0) & (F.col("value") <= 20.0))
        .collect()
    )
    assert got == want and got


def test_leading_key_range_still_correct_after_cluster(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.rewrite_clustered(["value"], files_per_bucket=4)
    lo, hi = "https://site-1", "https://site-199"
    got = sorted(r["url"] for r in t.read_for_key_range(lo, hi).collect())
    want = sorted(
        r["url"]
        for r in t.read()
        .filter((F.col("url") >= lo) & (F.col("url") <= hi))
        .collect()
    )
    assert got == want and got


def test_time_travel_past_cluster_rewrite(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    pre = t.current_snapshot()["snapshot_id"]
    h0 = t.state_hash(pre)
    t.rewrite_clustered(["value"])
    assert t.state_hash(pre) == h0  # old snapshot untouched


def test_cluster_requires_known_columns(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, n=50, n_keys=10)
    with pytest.raises(ValueError):
        t.rewrite_clustered(["nope"])
    with pytest.raises(ValueError):
        t.rewrite_clustered([])


# --------------------------------------------------------- MoR safety


def test_cluster_after_mor_folds_deltas(spark, tmp_table_dir):
    """rewrite_clustered reads through the MoR resolve, so clustering a
    delta-heavy table also acts as a full compaction: afterwards no
    bucket carries delta groups and value pruning is live everywhere."""
    t = _table(spark, tmp_table_dir, n=1000, n_keys=100)
    upd = spark.range(30).select(
        F.concat(F.lit("https://site-"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1800000000)).alias("ts"),
        (F.col("id") + 1_000_000).alias("event_id"),
        (F.col("id").cast("double") + 0.25).alias("value"),
        F.lit("U").alias("op"),
    )
    t.merge_changelog(upd, epoch_id=1, write_mode="mor")
    h = t.state_hash()
    t.rewrite_clustered(["value"], files_per_bucket=2)
    snap = t.current_snapshot()
    assert not any(g.get("delta") for g in snap["file_groups"])
    assert t.state_hash() == h
    # value pruning now applies to every bucket
    _, kept, total = t._prune_groups_for_column_range(snap, "value", 5.0, 9.0)
    assert kept < total


def test_mor_delta_buckets_never_value_pruned(spark, tmp_table_dir):
    """A delta'd bucket must scan in FULL for a non-key range: pruning
    an out-of-range winner file while an in-range loser survives in
    another generation would resurrect the loser through LWW."""
    t = _table(spark, tmp_table_dir, n=2000, n_keys=200)
    t.rewrite_clustered(["value"], files_per_bucket=4)
    # overwrite some keys via MoR deltas: new winners, value shifted
    upd = spark.range(50).select(
        F.concat(F.lit("https://site-"), F.col("id").cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1800000000)).alias("ts"),
        (F.col("id") + 1_000_000).alias("event_id"),
        (F.col("id").cast("double") + 0.5).alias("value"),
        F.lit("U").alias("op"),
    )
    t.merge_changelog(upd, epoch_id=1, write_mode="mor")
    snap = t.current_snapshot()
    delta_buckets = {g["bucket"] for g in snap["file_groups"] if g.get("delta")}
    assert delta_buckets  # the scenario is real
    groups, _, _ = t._prune_groups_for_column_range(snap, "value", 90.0, 99.0)
    by_bucket = {}
    for g in groups:
        by_bucket.setdefault(g["bucket"], []).extend(g["paths"])
    all_paths = {}
    for g in snap["file_groups"]:
        all_paths.setdefault(g["bucket"], []).extend(g["paths"])
    for b in delta_buckets:
        assert sorted(by_bucket.get(b, [])) == sorted(all_paths[b])
    # and the read is correct: updated keys' NEW values govern
    got = sorted(
        r["url"] for r in t.read_for_column_range("value", 90.0, 99.0).collect()
    )
    want = sorted(
        r["url"]
        for r in t.read()
        .filter((F.col("value") >= 90.0) & (F.col("value") <= 99.0))
        .collect()
    )
    assert got == want
