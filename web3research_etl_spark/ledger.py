"""Per-partition lineage ledger (FIXTURES.md §4).

The reference resumes from a single scalar — ``SELECT max(number) FROM
blocks`` (/root/reference/src/ch_eth/sync.rs:341-343) — and keeps no
per-partition bookkeeping. Ours records, per (epoch, source_partition):
max offset, watermark, and row counts, appended atomically in the same
turn as the data commit, so `resume_offsets` can restart any source
shard exactly where it left off.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.schemas import LEDGER_SCHEMA


def open_ledger(spark: SparkSession, path: str) -> LakeTable:
    if os.path.exists(os.path.join(path, "metadata")):
        return LakeTable.load(spark, path)
    return LakeTable.create(spark, path, LEDGER_SCHEMA, key=[], n_buckets=1)


def ledger_rows_for_batch(
    batch: DataFrame, epoch_id: int, committed_at_snapshot: int
) -> DataFrame:
    """One aggregation over the micro-batch → one ledger row per source
    partition. Map-side combine keeps this a cheap pass.

    Rows are cast to LEDGER_SCHEMA column-by-column before they leave
    here: the ledger is append-only parquet, so one wrongly-typed column
    (e.g. a string epoch_id) poisons every later read with
    PARQUET_COLUMN_DATA_TYPE_MISMATCH. Belt-and-braces with the int
    check in LakeTable._check_epoch_id."""
    agg = batch.groupBy("source_partition").agg(
        F.lit(epoch_id).alias("epoch_id"),
        F.max("event_seq").alias("max_event_seq"),
        F.max("warc_ts").alias("watermark_ts"),
        F.count("*").alias("rows_in"),
        F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).alias("rows_upserted"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("rows_deleted"),
        F.lit(committed_at_snapshot).alias("committed_at_snapshot"),
    )
    return agg.select(
        [F.col(f.name).cast(f.dataType).alias(f.name) for f in LEDGER_SCHEMA.fields]
    )


def resume_offsets(ledger: LakeTable) -> dict[int, int]:
    """source_partition → max committed event_seq (the restart point)."""
    rows = (
        ledger.read()
        .groupBy("source_partition")
        .agg(F.max("max_event_seq").alias("m"))
        .collect()
    )
    return {r["source_partition"]: r["m"] for r in rows}
