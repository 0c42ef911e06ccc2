"""Property-style convergence (SURVEY.md §5, last bullet): ANY
partition of the changelog into epochs, applied in ANY order, with ANY
subset of epochs redelivered (same epoch id → exactly-once skip; fresh
epoch id → LWW idempotency), converges to the identical final state.

This is the reference's ReplacingMergeTree invariant (replaying any
block range cannot corrupt state, /root/reference/src/ch_eth/init.rs:169,
scripts/optimize_db.py:27) checked over randomized schedules instead of
the three fixed schedules in test_replay_convergence.py.
"""

import shutil
import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.operators.apply import apply_changelog_batch
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER

N_EVENTS = 600
N_CHUNKS = 4


def _new_table(spark, d):
    return LakeTable.create(
        spark,
        f"{d}/pages",
        PAGES_SCHEMA,
        key=PAGES_KEY,
        version_order=PAGES_VERSION_ORDER,
        n_buckets=8,
    )


@pytest.fixture(scope="module")
def ch_and_ref(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("propch") / "changelog.parquet")
    generate_changelog(spark, N_EVENTS).write.mode("overwrite").parquet(p)
    ch = spark.read.parquet(p).cache()
    ch.count()
    d = tempfile.mkdtemp(prefix="prop_ref_")
    t = _new_table(spark, d)
    apply_changelog_batch(t, ch, epoch_id=0)
    ref_hash = t.state_hash()
    shutil.rmtree(d, ignore_errors=True)
    yield ch, ref_hash
    ch.unpersist()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    order=st.permutations(list(range(N_CHUNKS))),
    redeliver=st.lists(st.booleans(), min_size=N_CHUNKS, max_size=N_CHUNKS),
    stale_replay=st.integers(min_value=0, max_value=N_CHUNKS - 1),
)
def test_any_schedule_converges(spark, ch_and_ref, order, redeliver, stale_replay):
    ch, ref_hash = ch_and_ref
    chunks = [ch.filter(F.col("event_seq") % N_CHUNKS == i) for i in range(N_CHUNKS)]
    d = tempfile.mkdtemp(prefix="prop_run_")
    try:
        t = _new_table(spark, d)
        next_epoch = 0
        for pos, i in enumerate(order):
            stats = apply_changelog_batch(t, chunks[i], epoch_id=i)
            assert not stats.get("skipped")
            if redeliver[pos]:
                # exact redelivery of the same epoch id must be a no-op
                stats = apply_changelog_batch(t, chunks[i], epoch_id=i)
                assert stats.get("skipped")
            next_epoch = max(next_epoch, i + 1)
        # a stale chunk replayed late under a FRESH epoch id: applied,
        # but LWW keeps newer versions → state unchanged
        apply_changelog_batch(t, chunks[stale_replay], epoch_id=next_epoch + 100)
        assert t.state_hash() == ref_hash
    finally:
        shutil.rmtree(d, ignore_errors=True)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    order=st.permutations(list(range(N_CHUNKS))),
    modes=st.lists(
        st.sampled_from(["cow", "mor"]), min_size=N_CHUNKS, max_size=N_CHUNKS
    ),
    compact_after=st.lists(st.booleans(), min_size=N_CHUNKS, max_size=N_CHUNKS),
    redeliver_mode=st.sampled_from(["cow", "mor"]),
)
def test_any_mixed_write_mode_schedule_converges(
    spark, ch_and_ref, order, modes, compact_after, redeliver_mode
):
    """Write-path independence under ANY schedule: every epoch applied
    CoW or MoR (hypothesis picks per-position), compaction injected at
    arbitrary points, redelivery under either mode — the converged
    state must equal the single-batch reference hash. This is the MoR
    analog of the reference's ReplacingMergeTree replay invariant: the
    stored LAYOUT may differ (delta generations vs rewritten buckets),
    the resolved STATE may not."""
    ch, ref_hash = ch_and_ref
    chunks = [ch.filter(F.col("event_seq") % N_CHUNKS == i) for i in range(N_CHUNKS)]
    d = tempfile.mkdtemp(prefix="prop_mor_")
    try:
        t = _new_table(spark, d)
        for pos, i in enumerate(order):
            stats = apply_changelog_batch(t, chunks[i], epoch_id=i, write_mode=modes[pos])
            assert not stats.get("skipped")
            if compact_after[pos]:
                t.rewrite_small_files()
            # same epoch id redelivered under EITHER mode must skip
            stats = apply_changelog_batch(t, chunks[i], epoch_id=i, write_mode=redeliver_mode)
            assert stats.get("skipped")
        assert t.state_hash() == ref_hash
    finally:
        shutil.rmtree(d, ignore_errors=True)
