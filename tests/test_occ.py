"""Multi-writer optimistic concurrency on LakeTable commits.

The reference runs ONE sync process per chain (src/main.rs) — concurrent
writers are simply out of scope there, and its 5-deletes+5-inserts reorg
is torn even single-writer. Here the lake's commit protocol is
Iceberg-shaped OCC: writers race to atomically claim the next snapshot
manifest (``link(2)``); a loser whose touched buckets are DISJOINT from
the winner's rebases its commit on top (no recompute, metadata-only); an
overlapping loser gets ``CommitConflictError`` and re-runs; a loser that
discovers its own epoch marker already committed (crash-retry race of
the same micro-batch) returns the idempotent skip.

Determinism: the single-flight races monkeypatch the loser's ``_commit``
to run the competing writer's full merge first, then attempt the
original claim — the conflict happens on every run, no thread timing.
A final threaded stress test exercises the real arbiter end-to-end.
"""

import threading

import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.lake.table import CommitConflictError, LakeTable

DDL = "op string, url string, ts bigint, v double"


def _create(spark, path):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], DDL).drop("op").schema,
        key=["url"],
        version_order=["ts"],
        n_buckets=2,
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, DDL)


def _keys_by_bucket(spark, n_buckets=2, want_each=4):
    """Candidate keys split by the writer's own bucket hash."""
    cands = [f"k{i}" for i in range(32)]
    df = spark.createDataFrame([(c,) for c in cands], "url string").select(
        "url",
        F.pmod(F.xxhash64(F.concat_ws("\x1f", F.col("url").cast("string"))),
               F.lit(n_buckets)).alias("b"),
    )
    by_b = {0: [], 1: []}
    for r in df.collect():
        by_b[r["b"]].append(r["url"])
    assert all(len(v) >= want_each for v in by_b.values())
    return by_b[0][:want_each], by_b[1][:want_each]


def _race(loser: LakeTable, during_commit):
    """Monkeypatch loser._commit so the first claim attempt runs
    ``during_commit()`` (the competing writer) BEFORE claiming —
    guaranteeing the conflict deterministically."""
    orig = loser._commit

    def racing(snap):
        del loser._commit  # restore before any rebase retry
        during_commit()
        orig(snap)

    loser._commit = racing


def test_disjoint_buckets_rebase(spark, tmp_table_dir):
    b0_keys, b1_keys = _keys_by_bucket(spark)
    path = f"{tmp_table_dir}/t"
    t = _create(spark, path)
    seed = [("U", k, 1, 0.5) for k in b0_keys + b1_keys]
    t.merge_changelog(_batch(spark, seed), epoch_id=0)

    writer2 = LakeTable.load(spark, path)
    b1 = _batch(spark, [("U", k, 10, 1.0) for k in b0_keys])   # bucket 0 only
    b2 = _batch(spark, [("U", k, 20, 2.0) for k in b1_keys])   # bucket 1 only
    got = {}
    _race(t, lambda: got.update(r2=writer2.merge_changelog(b2, epoch_id=2)))
    r1 = t.merge_changelog(b1, epoch_id=1)

    assert not got["r2"]["skipped"] and not r1["skipped"]
    # loser rebased one id past the winner, no error
    assert r1["snapshot_id"] == got["r2"]["snapshot_id"] + 1
    final = LakeTable.load(spark, path)
    assert {1, 2} <= final.committed_epochs()
    # equals the sequential application
    ctrl = _create(spark, f"{tmp_table_dir}/ctrl")
    for i, b in enumerate([_batch(spark, seed), b1, b2]):
        ctrl.merge_changelog(b, epoch_id=i)
    assert final.state_hash().split(":")[0] == ctrl.state_hash().split(":")[0]
    assert final.state_hash() == ctrl.state_hash()


def test_overlapping_buckets_conflict_then_retry(spark, tmp_table_dir):
    b0_keys, _ = _keys_by_bucket(spark)
    path = f"{tmp_table_dir}/t"
    t = _create(spark, path)
    t.merge_changelog(_batch(spark, [("U", k, 1, 0.5) for k in b0_keys]), epoch_id=0)

    writer2 = LakeTable.load(spark, path)
    mine = _batch(spark, [("U", b0_keys[0], 10, 1.0)])
    theirs = _batch(spark, [("U", b0_keys[1], 20, 2.0)])  # same bucket
    _race(t, lambda: writer2.merge_changelog(theirs, epoch_id=2))
    with pytest.raises(CommitConflictError):
        t.merge_changelog(mine, epoch_id=1)

    # losing epoch was NOT committed; a plain re-run converges
    assert 1 not in LakeTable.load(spark, path).committed_epochs()
    r = t.merge_changelog(mine, epoch_id=1)
    assert not r["skipped"]
    final = LakeTable.load(spark, path)
    rows = {x["url"]: (x["ts"], x["v"]) for x in final.read().collect()}
    assert rows[b0_keys[0]] == (10, 1.0) and rows[b0_keys[1]] == (20, 2.0)
    # the aborted attempt's files are orphans; GC removes them and the
    # state is untouched
    before = final.state_hash()
    final.remove_orphan_files(grace_seconds=0.0)
    assert final.state_hash() == before


def test_same_epoch_race_is_idempotent_skip(spark, tmp_table_dir):
    b0_keys, _ = _keys_by_bucket(spark)
    path = f"{tmp_table_dir}/t"
    t = _create(spark, path)
    t.merge_changelog(_batch(spark, [("U", k, 1, 0.5) for k in b0_keys]), epoch_id=0)

    writer2 = LakeTable.load(spark, path)
    same = [("U", b0_keys[0], 10, 1.0)]
    _race(t, lambda: writer2.merge_changelog(_batch(spark, same), epoch_id=7))
    r = t.merge_changelog(_batch(spark, same), epoch_id=7)
    assert r["skipped"] is True
    final = LakeTable.load(spark, path)
    assert sorted(final.committed_epochs()) == [0, 7]
    assert {x["url"]: x["ts"] for x in final.read().collect()}[b0_keys[0]] == 10


def test_concurrent_appends_always_rebase(spark, tmp_table_dir):
    path = f"{tmp_table_dir}/t"
    t = _create(spark, path)
    writer2 = LakeTable.load(spark, path)
    a1 = _batch(spark, [("U", "a", 1, 1.0)]).drop("op")
    a2 = _batch(spark, [("U", "b", 2, 2.0)]).drop("op")
    _race(t, lambda: writer2.append(a2, epoch_id=2))
    sid = t.append(a1, epoch_id=1)
    final = LakeTable.load(spark, path)
    assert sid == final.current_snapshot()["snapshot_id"]
    assert final.read().count() == 2
    assert {1, 2} <= final.committed_epochs()


def test_full_rewrite_op_conflicts_loudly(spark, tmp_table_dir):
    b0_keys, b1_keys = _keys_by_bucket(spark)
    path = f"{tmp_table_dir}/t"
    t = _create(spark, path)
    t.merge_changelog(
        _batch(spark, [("U", k, 1, 0.5) for k in b0_keys + b1_keys]), epoch_id=0
    )
    # blind append of fresh keys stacks a second file group on their
    # buckets (both buckets are already populated) → compaction is
    # guaranteed to have work
    t.append(_batch(spark, [("U", "x1", 2, 0.5), ("U", "x2", 3, 0.5)]).drop("op"),
             epoch_id=1)

    writer2 = LakeTable.load(spark, path)
    _race(
        t,
        lambda: writer2.merge_changelog(
            _batch(spark, [("U", b0_keys[0], 30, 3.0)]), epoch_id=2
        ),
    )
    with pytest.raises(CommitConflictError):
        t.rewrite_small_files()
    # re-run against fresh state succeeds and preserves the racer's write
    r = t.rewrite_small_files()
    assert not r.get("skipped")
    rows = {x["url"]: x["ts"] for x in LakeTable.load(spark, path).read().collect()}
    assert rows[b0_keys[0]] == 30


def test_threaded_writers_converge(spark, tmp_table_dir):
    """Real concurrency through the real arbiter: two writers, three
    batches each, retry-on-conflict. LWW over a total version order is
    order-independent, so any interleaving must equal the sequential
    control."""
    b0_keys, b1_keys = _keys_by_bucket(spark)
    keys = b0_keys + b1_keys
    path = f"{tmp_table_dir}/t"
    _create(spark, path)

    batches = {
        # distinct ts everywhere → unambiguous winners
        100 + i: [("U", k, 100 + i * 8 + j, float(i)) for j, k in enumerate(keys[:4])]
        for i in range(3)
    }
    batches.update(
        {
            200 + i: [("U", k, 1000 + i * 8 + j, float(i)) for j, k in enumerate(keys[4:])]
            for i in range(3)
        }
    )
    errors = []

    def run(epochs):
        w = LakeTable.load(spark, path)
        for e in epochs:
            for attempt in range(6):
                try:
                    w.merge_changelog(_batch(spark, batches[e]), epoch_id=e)
                    break
                except CommitConflictError:
                    continue
            else:
                errors.append(f"epoch {e} never committed")

    t1 = threading.Thread(target=run, args=([100, 101, 102],))
    t2 = threading.Thread(target=run, args=([200, 201, 202],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors

    final = LakeTable.load(spark, path)
    assert set(batches) <= final.committed_epochs()
    ctrl = _create(spark, f"{tmp_table_dir}/ctrl")
    for e in sorted(batches):
        ctrl.merge_changelog(_batch(spark, batches[e]), epoch_id=e)
    assert final.state_hash() == ctrl.state_hash()


def test_mor_delta_rebases_across_any_commit_cow_conflicts_on_delta(
    spark, tmp_table_dir
):
    """Mixed-mode OCC: (1) a delta writer racing ANY concurrent data
    commit — even one rewriting the same bucket — rebases (touched=∅,
    replaces nothing) and its seq is refreshed to the id actually
    committed; (2) a CoW merge racing a concurrent delta append TO A
    BUCKET IT REWRITES must conflict loudly (its read of stored state
    predates the delta — silently rebasing would drop the delta's
    rows), and the caller's re-run against fresh state converges."""
    b0, b1 = _keys_by_bucket(spark)
    t = _create(spark, f"{tmp_table_dir}/mixed")
    t.merge_changelog(
        _batch(spark, [("I", b0[0], 100, 1.0), ("I", b1[0], 100, 2.0)]), epoch_id=0
    )

    # (1) delta writer vs CoW writer on the SAME bucket: delta rebases
    writer = LakeTable.load(spark, f"{tmp_table_dir}/mixed")
    _race(
        writer,
        lambda: t.merge_changelog(
            _batch(spark, [("U", b0[0], 200, 1.5)]), epoch_id=1
        ),
    )
    res = writer.merge_changelog(
        _batch(spark, [("U", b0[1], 200, 9.0)]), epoch_id=2, write_mode="mor"
    )
    assert not res.get("skipped")
    snap = writer.current_snapshot()
    deltas = [fg for fg in snap["file_groups"] if fg.get("delta")]
    assert deltas and all(d["seq"] == res["snapshot_id"] for d in deltas)
    live = {r["url"]: r["v"] for r in writer.read().collect()}
    assert live[b0[0]] == 1.5 and live[b0[1]] == 9.0  # neither write lost

    # (2) CoW writer vs concurrent delta on a bucket it rewrites: conflict
    writer2 = LakeTable.load(spark, f"{tmp_table_dir}/mixed")
    _race(
        writer2,
        lambda: t.merge_changelog(
            _batch(spark, [("U", b0[2], 300, 3.0)]), epoch_id=3, write_mode="mor"
        ),
    )
    with pytest.raises(CommitConflictError, match="touched bucket"):
        writer2.merge_changelog(
            _batch(spark, [("U", b0[3], 300, 4.0)]), epoch_id=4
        )
    # re-run against fresh state applies cleanly; nothing was dropped
    writer2 = LakeTable.load(spark, f"{tmp_table_dir}/mixed")
    writer2.merge_changelog(_batch(spark, [("U", b0[3], 300, 4.0)]), epoch_id=4)
    live = {r["url"]: r["v"] for r in writer2.read().collect()}
    assert live[b0[2]] == 3.0 and live[b0[3]] == 4.0
