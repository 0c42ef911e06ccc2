"""Last-writer-wins dedup — the engine's core operator.

Spark expression of ClickHouse ``ReplacingMergeTree ORDER BY (key...)``
(/root/reference/src/ch_eth/init.rs:169-170): keep exactly one row per
key, the one with the greatest version tuple. Two implementations with
identical semantics (tested equal):

- :func:`lww_dedup_window` — the textbook ``row_number() OVER
  (PARTITION BY key ORDER BY version DESC) = 1`` (north-star wording).
  Full shuffle + per-key sort; a hot key's rows all land on one reducer.
- :func:`lww_dedup_agg` — two-phase hash-agg + semi-join. Phase 1
  aggregates only the version tuple (fixed-size buffer → HashAggregate
  with map-side combine: a key with millions of duplicate events ships
  O(map tasks) rows through the shuffle, not O(rows)). Phase 2
  semi-joins the winning versions back, so large payloads (html binary)
  cross exactly one join probe and are never sorted. This is the scale
  path and the default used by the merge sink.

(A one-phase ``max_by(payload_struct, version_struct)`` looks simpler
but Spark plans it as SortAggregate when the payload struct contains
binary — externally sorting every payload byte; measured 10×+ slower
on 4 KB pages.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_dedup_window(
    df: DataFrame, key: list[str], version_order: list[str]
) -> DataFrame:
    w = Window.partitionBy(*key).orderBy(*[F.col(c).desc() for c in version_order])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def lww_dedup_agg(
    df: DataFrame,
    key: list[str],
    version_order: list[str],
    broadcast_threshold: int = 4_000_000,
) -> DataFrame:
    """Two-phase: (1) max version tuple per key — a FIXED-SIZE agg
    buffer, so Spark uses HashAggregate with map-side combine (max_by
    over a payload struct containing binary falls back to SortAggregate
    and externally sorts every payload byte — measured 10×+ slower on
    4 KB pages); (2) left-semi join the winning (key, version) back —
    payloads flow through one shuffle-free (broadcastable) join probe,
    never through a sort. Residual exact-duplicate events (same key+
    version emitted twice) collapse in a final tiny dropDuplicates."""
    version = F.struct(*[F.col(c) for c in version_order])
    winners = (
        df.groupBy(*key)
        .agg(F.max(version).alias("_v"))
        .select(*key, *[F.col(f"_v.{c}").alias(c) for c in version_order])
    )
    # Phase 1 scans only key+version columns (parquet-pruned — payload
    # bytes untouched). Counting it costs one cheap job and lets us pick
    # the join strategy explicitly (AQE is unavailable inside streaming
    # micro-batches): broadcast ⇒ the payload side is filtered IN PLACE,
    # zero payload shuffle; above the threshold fall back to
    # shuffle-hash (payload hashed once, never sorted — a sort-merge
    # semi-join here would externally sort every payload byte).
    n_winners = winners.count()
    if n_winners <= broadcast_threshold:
        winners = F.broadcast(winners)
    else:
        winners = winners.hint("SHUFFLE_HASH")
    deduped = df.join(winners, key + version_order, "left_semi")
    # collapse exact re-deliveries (same key+version emitted twice);
    # input here is already winners-only, so this shuffle is tiny
    return deduped.dropDuplicates(key)
