"""Lake-table sink: atomic snapshots, CoW merge, epoch idempotency,
time travel, schema evolution by field id."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from web3research_etl_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("event_seq", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


def _table(spark, d, n_buckets=4):
    return LakeTable.create(
        spark,
        os.path.join(d, "t"),
        SCHEMA,
        key=["url"],
        version_order=["warc_ts", "event_seq"],
        n_buckets=n_buckets,
    )


def _batch(spark, rows):
    df = spark.createDataFrame(
        [(op, u, ts, seq, v) for (op, u, ts, seq, v) in rows],
        "op string, url string, ts_s long, event_seq long, v string",
    )
    return df.select(
        "op",
        "url",
        F.timestamp_seconds("ts_s").alias("warc_ts"),
        "event_seq",
        "v",
    )


def test_merge_upsert_delete(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(
        _batch(spark, [("I", "a", 100, 1, "a1"), ("I", "b", 100, 2, "b1")]), epoch_id=1
    )
    assert {(r["url"], r["v"]) for r in t.read().collect()} == {("a", "a1"), ("b", "b1")}

    # newer update wins; delete removes; stale update loses to stored row
    t.merge_changelog(
        _batch(
            spark,
            [
                ("U", "a", 200, 3, "a2"),
                ("D", "b", 200, 4, None),
                ("U", "a", 50, 0, "stale"),
            ],
        ),
        epoch_id=2,
    )
    assert {(r["url"], r["v"]) for r in t.read().collect()} == {("a", "a2")}


def test_delete_beats_older_update_in_same_batch(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(
        _batch(spark, [("I", "x", 100, 1, "x1"), ("D", "x", 300, 3, None)]).transform(
            lambda df: df
        ),
        epoch_id=1,
    )
    # LWW winner is the delete → key absent
    assert t.read().filter(F.col("url") == "x").count() == 0


def test_epoch_idempotency(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    b = _batch(spark, [("I", "a", 100, 1, "a1")])
    r1 = t.merge_changelog(b, epoch_id=7)
    h = t.state_hash()
    r2 = t.merge_changelog(b, epoch_id=7)  # re-delivery
    assert r1["skipped"] is False and r2["skipped"] is True
    assert t.state_hash() == h
    assert t.current_snapshot()["snapshot_id"] == r1["snapshot_id"]


def test_cow_touches_only_dirty_buckets(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir, n_buckets=8)
    many = _batch(spark, [("I", f"u{i}", 100, i, f"v{i}") for i in range(64)])
    t.merge_changelog(many, epoch_id=1)
    before = {fg["bucket"]: tuple(fg["paths"]) for fg in t.current_snapshot()["file_groups"]}
    r = t.merge_changelog(_batch(spark, [("U", "u1", 200, 999, "v1b")]), epoch_id=2)
    after = {fg["bucket"]: tuple(fg["paths"]) for fg in t.current_snapshot()["file_groups"]}
    assert len(r["touched_buckets"]) == 1
    dirty = r["touched_buckets"][0]
    for b, paths in before.items():
        if b != dirty:
            assert after[b] == paths  # untouched buckets carried over verbatim


def test_time_travel(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "a", 100, 1, "a1")]), epoch_id=1)
    s1 = t.current_snapshot()["snapshot_id"]
    t.merge_changelog(_batch(spark, [("U", "a", 200, 2, "a2")]), epoch_id=2)
    assert t.read(s1).collect()[0]["v"] == "a1"
    assert t.read().collect()[0]["v"] == "a2"


def test_schema_evolution_field_ids(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "a", 100, 1, "a1")]), epoch_id=1)
    # add + rename + widen in one alter; old files must read aligned
    t.alter(
        [
            {"change": "add", "name": "score", "type": "int"},
            {"change": "rename", "name": "val", "renamed_from": "v"},
        ]
    )
    t.alter([{"change": "widen", "name": "score", "type": "bigint"}])
    row = t.read().collect()[0]
    assert row["val"] == "a1" and row["score"] is None
    assert dict(t.read().dtypes)["score"] == "bigint"

    # new writes under the new schema coexist with old files
    new = _batch(spark, [("I", "b", 100, 2, None)]).withColumnRenamed("v", "val")
    new = new.withColumn("score", F.lit(5).cast("bigint"))
    t.merge_changelog(new, epoch_id=2)
    got = {(r["url"], r["val"], r["score"]) for r in t.read().collect()}
    assert got == {("a", "a1", None), ("b", None, 5)}


def test_tombstone_blocks_resurrection_and_vacuum(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "a", 100, 1, "a1")]), epoch_id=1)
    t.merge_changelog(_batch(spark, [("D", "a", 300, 3, None)]), epoch_id=2)
    # stale out-of-order update in a LATER batch must NOT resurrect 'a'
    t.merge_changelog(_batch(spark, [("U", "a", 200, 2, "stale")]), epoch_id=3)
    assert t.read().filter(F.col("url") == "a").count() == 0
    assert t.read(include_deleted=True).filter(F.col("url") == "a").count() == 1

    # vacuum past the out-of-order window drops the tombstone physically
    t.vacuum_tombstones("2100-01-01")
    assert t.read(include_deleted=True).filter(F.col("url") == "a").count() == 0
    # ...after which an even-staler update CAN land (documented tradeoff)


def test_read_for_keys_bucket_pruning(spark, tmp_table_dir):
    """Point lookup must scan only the key's bucket files (SURVEY S9)."""
    t = _table(spark, tmp_table_dir, n_buckets=8)
    rows = [("I", f"u{i}", 100 + i, i, f"v{i}") for i in range(64)]
    t.merge_changelog(_batch(spark, rows), epoch_id=1)

    got = t.read_for_keys(["u7", "u13"]).orderBy("url").collect()
    assert [r["url"] for r in got] == ["u13", "u7"]
    assert [r["v"] for r in got] == ["v13", "v7"]
    # pruning really happened: the lookup's plan reads fewer files than
    # a full read (8 buckets -> at most 2)
    full_groups = t.current_snapshot()["file_groups"]
    assert len(full_groups) == 8
    # missing key -> empty, not error
    assert t.read_for_keys(["nope"]).count() == 0


def test_read_for_keys_composite(spark, tmp_table_dir):
    """Composite-key point lookup (the reference keys tables by
    multi-column tuples, src/ch_eth/init.rs:205-206): bucket pruning
    must work off the full tuple hash, and the row filter must match
    tuples exactly — not the cross product of the per-column values."""
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("shard", T.LongType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("event_seq", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    t = LakeTable.create(
        spark,
        os.path.join(tmp_table_dir, "ck"),
        schema,
        key=["url", "shard"],
        version_order=["warc_ts", "event_seq"],
        n_buckets=8,
    )
    rows = spark.createDataFrame(
        [("I", f"u{i % 8}", i % 4, 100 + i, i, f"v{i}") for i in range(32)],
        "op string, url string, shard long, ts_s long, event_seq long, v string",
    ).select(
        "op", "url", "shard",
        F.timestamp_seconds("ts_s").alias("warc_ts"), "event_seq", "v",
    )
    t.merge_changelog(rows, epoch_id=1)

    # (u1,1)=row 9 and (u6,2)=row 6/22→ the LWW winner per tuple
    got = t.read_for_keys([("u1", 1), ("u6", 2)]).orderBy("url").collect()
    assert [(r["url"], r["shard"]) for r in got] == [("u1", 1), ("u6", 2)]
    # cross-product contamination check: (u1,2) exists in the table but
    # was not requested, and must not appear
    assert all(not (r["url"] == "u1" and r["shard"] == 2) for r in got)

    # pruning really happened: requested tuples hash to <=2 of 8 buckets
    snap = t.current_snapshot()
    one = spark.range(1)
    b = one.select(
        *[
            F.pmod(
                F.xxhash64(F.concat_ws("\x1f", F.lit(u), F.lit(s).cast("string"))),
                F.lit(8),
            ).alias(f"b{i}")
            for i, (u, s) in enumerate([("u1", 1), ("u6", 2)])
        ]
    ).collect()[0]
    wanted = {b["b0"], b["b1"]}
    assert len(wanted) <= 2 < len(snap["file_groups"])

    # scalar shorthand stays valid for 1-col keys; wrong arity errors
    try:
        t.read_for_keys(["u1"])
        raise AssertionError("arity mismatch should raise")
    except ValueError:
        pass
    # missing tuple -> empty, not error
    assert t.read_for_keys([("nope", 99)]).count() == 0


def test_rewrite_small_files_compaction(spark, tmp_table_dir):
    """Compaction collapses per-bucket file fragments into one group and
    preserves state + time travel (SURVEY S10)."""
    t = _table(spark, tmp_table_dir, n_buckets=2)
    # merges are CoW per bucket (touched buckets never fragment); blind
    # appends are what accumulate file groups -> two appends fragment
    t.append(_batch(spark, [("I", "a", 100, 1, "a1"), ("I", "b", 100, 2, "b1")]).drop("op"), epoch_id=1)
    t.append(_batch(spark, [("I", "c", 100, 3, "c1"), ("I", "d", 200, 4, "d1")]).drop("op"), epoch_id=2)
    before_hash = t.state_hash()
    before_snap = t.current_snapshot()["snapshot_id"]

    res = t.rewrite_small_files()
    assert res["skipped"] is False
    # state identical after compaction
    assert t.state_hash() == before_hash
    # one file group per bucket now
    groups = t.current_snapshot()["file_groups"]
    assert len({g["bucket"] for g in groups}) == len(groups)
    # time travel to the pre-compaction snapshot still works
    assert t.read(snapshot_id=before_snap).count() == t.read().count()
    # idempotent: second run is a no-op
    assert t.rewrite_small_files()["skipped"] in (True, False)


def test_salted_merge_same_state_more_hot_bucket_files(spark, tmp_table_dir):
    """Salting changes the shuffle, never the result (SURVEY §7 hard
    point b): identical state hash salted vs unsalted, and the salted
    write spreads a hot bucket's rows over MORE writer tasks → more
    files for that bucket (the skew-break evidence, axis A)."""
    from web3research_etl_spark.changelog import generate_changelog

    # one hot domain: skew every event into few buckets
    ch = generate_changelog(spark, 2000, n_domains=1, pages_per_domain=40)
    t_plain = _table(spark, tmp_table_dir + "/plain", n_buckets=4)
    t_salt = _table(spark, tmp_table_dir + "/salt", n_buckets=4)
    cols = ["op", "url", "warc_ts", "event_seq", F.col("lang").alias("v")]
    t_plain.merge_changelog(ch.select(*cols), epoch_id=0)
    t_salt.merge_changelog(ch.select(*cols), epoch_id=0, salt_partitions=16)
    assert t_plain.state_hash() == t_salt.state_hash()

    def files_per_bucket(t):
        groups = t.current_snapshot()["file_groups"]
        return {g["bucket"]: len(g["paths"]) for g in groups}

    plain_f, salt_f = files_per_bucket(t_plain), files_per_bucket(t_salt)
    hot = max(salt_f, key=lambda b: salt_f[b])
    assert salt_f[hot] > plain_f.get(hot, 1)  # hot bucket fanned out


def test_empty_and_delete_only_batches(spark, tmp_table_dir):
    """Degenerate micro-batches must commit cleanly: an empty batch
    (quiet source poll) and a delete-only batch (mass retraction)."""
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "u1", 100, 1, "a"), ("I", "u2", 100, 2, "b")]), epoch_id=0)

    empty = _batch(spark, []).limit(0)
    r = t.merge_changelog(empty, epoch_id=1)
    # quiet epoch: no-op skip, no snapshot churn; re-delivery of an
    # empty batch is trivially idempotent so no marker is needed
    assert r.get("skipped")
    assert t.read().count() == 2
    assert t.current_snapshot()["snapshot_id"] == r["snapshot_id"]

    r = t.merge_changelog(
        _batch(spark, [("D", "u1", 200, 3, None), ("D", "u2", 200, 4, None)]),
        epoch_id=2,
    )
    assert not r.get("skipped")
    assert t.read().count() == 0


def test_read_changes_incremental_diff(spark, tmp_table_dir):
    """Incremental CDC read between snapshots: classification matches a
    full-state diff, and the scan is metadata-pruned to buckets whose
    file groups actually changed (a single-key epoch diffs one bucket,
    not the table)."""
    t = _table(spark, tmp_table_dir, n_buckets=4)
    r1 = t.merge_changelog(
        _batch(
            spark,
            [
                ("I", "a", 100, 1, "a1"),
                ("I", "b", 100, 2, "b1"),
                ("I", "c", 100, 3, "c1"),
                ("I", "d", 100, 4, "d1"),
            ],
        ),
        epoch_id=0,
    )
    r2 = t.merge_changelog(
        _batch(
            spark,
            [
                ("U", "a", 200, 5, "a2"),   # update
                ("D", "b", 200, 6, None),   # delete
                ("I", "e", 200, 7, "e1"),   # insert
                ("U", "c", 50, 0, "stale"), # stale: loses LWW -> NOT a change
            ],
        ),
        epoch_id=1,
    )
    chg = t.read_changes(r1["snapshot_id"], r2["snapshot_id"])
    got = {(r["url"], r["change_type"]) for r in chg.collect()}
    assert got == {("a", "update"), ("b", "delete"), ("e", "insert")}
    # version columns surfaced from both sides
    row = {r["url"]: r for r in chg.collect()}
    assert row["a"]["new_event_seq"] == 5 and row["a"]["old_event_seq"] == 1
    # the delete carries its tombstone's version (event 6), so a
    # downstream LWW consumer can order it; the insert has no old side
    assert row["e"]["old_event_seq"] is None and row["b"]["new_event_seq"] == 6

    # bucket pruning: an epoch touching only key "a" must diff only
    # a's bucket (file-group comparison is pure metadata)
    r3 = t.merge_changelog(_batch(spark, [("U", "a", 300, 8, "a3")]), epoch_id=2)
    assert len(r3["touched_buckets"]) == 1
    snap_a = t.snapshot(r2["snapshot_id"])
    snap_b = t.snapshot(r3["snapshot_id"])
    pa = {g["bucket"]: tuple(sorted(g["paths"])) for g in snap_a["file_groups"]}
    pb = {g["bucket"]: tuple(sorted(g["paths"])) for g in snap_b["file_groups"]}
    changed = {b for b in set(pa) | set(pb) if pa.get(b) != pb.get(b)}
    assert changed == set(r3["touched_buckets"])
    got3 = {(r["url"], r["change_type"]) for r in t.read_changes(r2["snapshot_id"], r3["snapshot_id"]).collect()}
    assert got3 == {("a", "update")}

    # reversed/equal snapshot order is a contract violation
    import pytest as _pytest
    with _pytest.raises(ValueError):
        t.read_changes(r2["snapshot_id"], r2["snapshot_id"])


def test_read_changes_across_schema_evolution(spark, tmp_table_dir):
    """A schema evolution (here: renaming a version column) between the
    two snapshots must not break the diff: both sides resolve through
    the newer snapshot's field-id map, so rows line up under the NEW
    column names."""
    t = _table(spark, tmp_table_dir, n_buckets=4)
    r1 = t.merge_changelog(
        _batch(spark, [("I", "a", 100, 1, "a1"), ("I", "b", 100, 2, "b1")]), epoch_id=0
    )
    t.alter([{"change": "rename", "name": "seq_no", "renamed_from": "event_seq"}])
    df = spark.createDataFrame(
        [("U", "a", 200, 3, "a2")],
        "op string, url string, ts_s long, seq_no long, v string",
    ).select("op", "url", F.timestamp_seconds("ts_s").alias("warc_ts"), "seq_no", "v")
    r2 = t.merge_changelog(df, epoch_id=1)
    chg = t.read_changes(r1["snapshot_id"], r2["snapshot_id"])
    rows = {r["url"]: r for r in chg.collect()}
    assert set(rows) == {"a"} and rows["a"]["change_type"] == "update"
    assert rows["a"]["new_seq_no"] == 3 and rows["a"]["old_seq_no"] == 1


def test_expire_snapshots_retention(spark, tmp_table_dir):
    """Retention drops old manifests + their exclusive data files;
    current state, exactly-once markers, and re-loadability survive."""
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "a", 100, 1, "a1")]), epoch_id=1)
    s1 = t.current_snapshot()["snapshot_id"]
    t.merge_changelog(_batch(spark, [("U", "a", 200, 2, "a2")]), epoch_id=2)
    t.merge_changelog(_batch(spark, [("I", "b", 300, 3, "b1")]), epoch_id=3)
    before_files = sum(len(fs) for _, _, fs in os.walk(t.data_dir))
    pre_state = t.state_hash()

    res = t.expire_snapshots(retain_last=2)
    assert not res["skipped"] and s1 in res["expired_snapshots"]
    # expired manifest gone → time travel raises; current read unchanged
    import pytest

    with pytest.raises(FileNotFoundError):
        t.read(s1)
    assert t.state_hash() == pre_state
    # s1's v=a1 file was referenced only by expired snapshots → deleted
    after_files = sum(len(fs) for _, _, fs in os.walk(t.data_dir))
    assert after_files < before_files
    # exactly-once markers are cumulative: every epoch still committed
    assert {1, 2, 3} <= t.committed_epochs()
    # table still loads and a re-delivered epoch is still skipped
    t2 = LakeTable.load(spark, t.path)
    r = t2.merge_changelog(_batch(spark, [("I", "a", 100, 1, "dup")]), epoch_id=2)
    assert r["skipped"] is True


def test_expire_snapshots_noop_and_bounds(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "a", 100, 1, "a1")]), epoch_id=1)
    import pytest

    with pytest.raises(ValueError):
        t.expire_snapshots(retain_last=0)
    assert t.expire_snapshots(retain_last=10)["skipped"] is True
    assert t.read().count() == 1


def test_remove_orphan_files(spark, tmp_table_dir):
    t = _table(spark, tmp_table_dir)
    t.merge_changelog(_batch(spark, [("I", "a", 100, 1, "a1")]), epoch_id=1)
    # plant an orphan (a crashed writer's leftover) + prove grace guards it
    orphan = os.path.join(t.data_dir, "bucket=0", "orphan.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"junk")
    assert t.remove_orphan_files(grace_seconds=3600)["data_files_removed"] == 0
    res = t.remove_orphan_files(grace_seconds=0)
    assert res["data_files_removed"] == 1 and not os.path.exists(orphan)
    # referenced files untouched
    assert t.read().count() == 1


def test_rebucket_partition_spec_evolution(spark, tmp_table_dir):
    """Changing the bucket count rewrites the table atomically: state
    identical, point lookups hash with the NEW count, time travel to a
    pre-rebucket snapshot prunes with the OLD count, merges continue."""
    t = _table(spark, tmp_table_dir, n_buckets=4)
    t.merge_changelog(
        _batch(spark, [("I", f"u{i}", 100, i, f"v{i}") for i in range(20)]),
        epoch_id=1,
    )
    pre_snap = t.current_snapshot()["snapshot_id"]
    pre = t.state_hash()

    res = t.rebucket(8)
    assert not res["skipped"] and res["n_buckets"] == 8
    assert t.current_snapshot()["n_buckets"] == 8
    assert t.state_hash() == pre
    # bucket-pruned lookup under the new spec
    assert {r["url"] for r in t.read_for_keys(["u7"]).collect()} == {"u7"}
    # old snapshot still reads (its groups carry old bucket numbers)
    assert t.read(pre_snap).count() == 20
    # merge after rebucket lands in the new layout and wins LWW
    t.merge_changelog(_batch(spark, [("U", "u7", 200, 99, "v7b")]), epoch_id=2)
    assert t.read_for_keys(["u7"]).collect()[0]["v"] == "v7b"
    assert t.rebucket(8)["skipped"] is True
