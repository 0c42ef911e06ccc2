"""Streaming-only operators beyond the CDC apply path (SURVEY §2.7).

The reference has NO in-process streaming state — all state lives in
ClickHouse and the only windowing is the rolling 100k-block re-check
(/root/reference/src/ch_eth/sync.rs:348-352). These operators show the
Spark-native expressions of the semantics a changelog tail needs when
the sink is NOT the only state:

- :func:`windowed_event_rates` — watermark + tumbling-window counts
  (late events beyond the watermark are dropped, state is GC'd — the
  formal version of the reference's "re-check the last 100k blocks"
  informal lateness bound);
- :func:`running_key_state` — ``applyInPandasWithState`` per-key
  running aggregate across micro-batches (custom stateful operator:
  tracks the max version and event count per url, emitting one update
  row per key per batch it appears in). Arrow-batched; no per-row
  Python against the stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "url string, n_events_total bigint, max_event_seq bigint, batches_seen int"
)
STATE_SCHEMA = "n bigint, mx bigint, batches int"


def windowed_event_rates(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window event counts per op with a watermark.

    State for windows older than the watermark is dropped (bounded
    state at 10^10 events); events later than the watermark are
    discarded — the reconcile/heal pass (operators/reconcile.py) is the
    engine's correction channel for those, mirroring how the reference
    heals late divergence rather than holding state forever.
    """
    return (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("win"), F.col("op"))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
        )
    )


def _update_key_state(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key accumulator: (event count, max event_seq, batches seen).

    Receives ONLY this micro-batch's rows for the key (Arrow batches);
    prior totals come from `state`. Emits one row per key per batch —
    a changelog-of-the-changelog any downstream consumer can tail.
    """
    n = 0
    mx = -1
    for pdf in pdf_iter:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, int(pdf["event_seq"].max()))
    if state.exists:
        (pn, pmx, pb) = state.get
    else:
        pn, pmx, pb = 0, -1, 0
    new = (pn + n, max(pmx, mx), pb + 1)
    state.update(new)
    yield pd.DataFrame(
        {
            "url": [key[0]],
            "n_events_total": [new[0]],
            "max_event_seq": [new[1]],
            "batches_seen": [new[2]],
        }
    )


def running_key_state(stream: DataFrame) -> DataFrame:
    """``applyInPandasWithState`` over the changelog stream keyed by url.

    The custom-stateful-operator slot (task brief: 'applyInPandasWithState
    for custom stateful operators'): state is a fixed-size tuple per key,
    shuffled by key hash exactly like any keyed agg — scales to 10^10
    events because state size is O(live keys), not O(events).
    """
    return stream.groupBy("url").applyInPandasWithState(
        _update_key_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...] = ("url", "warc_ts", "event_seq"),
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming dedup for at-least-once sources:
    ``dropDuplicatesWithinWatermark`` removes re-delivered events whose
    duplicate arrives within the watermark horizon, ACROSS micro-batch
    boundaries, while keeping dedup state bounded (plain
    ``dropDuplicates`` state grows forever — unusable at 10^10 events).
    The merge's LWW apply remains the idempotency backstop for
    duplicates that straddle a horizon longer than this, so correctness
    never depends on the horizon choice — only shuffle volume does."""
    return stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
