"""Last-writer-wins dedup — the engine's core operator.

Spark expression of ClickHouse ``ReplacingMergeTree ORDER BY (key...)``
(/root/reference/src/ch_eth/init.rs:169-170): keep exactly one row per
key, the one with the greatest version tuple. Two implementations with
identical semantics (tested equal):

- :func:`lww_dedup_window` — the textbook ``row_number() OVER
  (PARTITION BY key ORDER BY version DESC) = 1`` (north-star wording).
  Full shuffle + per-key sort; a hot key's rows all land on one reducer.
- :func:`lww_dedup_agg` — ``groupBy(key).agg(max_by(payload, version))``.
  Partial (map-side) aggregation: each map task pre-reduces its local
  duplicates, so a key with millions of duplicate events ships O(tasks)
  rows through the shuffle, not O(rows). This is the scale path and the
  default used by the merge sink.
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


def lww_dedup_agg(df: DataFrame, key: list[str], version_order: list[str]) -> DataFrame:
    payload_cols = [c for c in df.columns if c not in key]
    payload = F.struct(*[F.col(c) for c in payload_cols])
    version = F.struct(*[F.col(c) for c in version_order])
    out = (
        df.groupBy(*key)
        .agg(F.max_by(payload, version).alias("_w"))
        .select(*key, *[F.col(f"_w.{c}").alias(c) for c in payload_cols])
    )
    return out.select(*df.columns)
