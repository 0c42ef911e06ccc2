"""The CDC apply operator: one micro-batch of changelog events → one
atomic lake-table commit.

This is the Spark re-expression of the reference's per-block pipeline
(fetch → flatten → dedup-by-sink → insert,
/root/reference/src/ch_eth/init.rs:360-449) with the defect classes
fixed: dedup happens BEFORE the write (LWW agg), the commit is atomic,
and re-delivered epochs are skipped via commit markers instead of
relying on background merges.

Stage order per batch (order chosen for scale):
1. epoch already committed? → skip (exactly-once under retries);
2. registry sync: ALTER the table for any payload versions seen;
3. payload parse (from_json, registry types) — JVM-side;
4. LWW dedup within the batch (max_by partial agg — map-side combine,
   skew-proof) — BEFORE extraction so the expensive UDF runs once per
   surviving key, not once per duplicate event;
5. HTML→text extraction (Arrow pandas UDF) on winning upsert rows only;
6. bucketed copy-on-write MERGE (touched buckets only, optional salt);
7. lineage-ledger append for the same epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web3research_etl_spark.functions.extract import extract_text_udf
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.ledger import ledger_rows_for_batch
from web3research_etl_spark.operators.lww import lww_dedup_agg
from web3research_etl_spark.registry import parse_payload, sync_table_schema

_CORE_COLS = ["op", "url", "warc_ts", "event_seq", "html", "lang"]


def apply_changelog_batch(
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int,
    ledger: LakeTable | None = None,
    registry: DataFrame | None = None,
    salt_partitions: int | None = None,
) -> dict:
    """Apply one micro-batch exactly-once. Returns merge stats."""
    if epoch_id in table.committed_epochs():
        return {"skipped": True, "epoch_id": epoch_id}

    extra_cols: list[str] = []
    if registry is not None:
        max_v = batch.agg(F.max("payload_version")).collect()[0][0]
        if max_v is not None:
            sync_table_schema(table, registry, max_v)
            batch = parse_payload(batch, registry, max_v)
            table_cols = {f.name for f in table.schema().fields}
            extra_cols = [
                c
                for c in batch.columns
                if c in table_cols and c not in set(_CORE_COLS) | {"text"}
            ]

    # The micro-batch feeds several actions (dedup phase-1, winner join,
    # touched-bucket probe, write, ledger); without a cache each action
    # re-scans and re-decompresses the source — measured 3-4 full scans
    # per epoch. Cache once, unpersist at the end (micro-batches are
    # sized to cluster memory; MEMORY_AND_DISK spills instead of OOM).
    from pyspark import StorageLevel

    projected = batch.select(*_CORE_COLS, *extra_cols).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deduped = lww_dedup_agg(projected, key=["url"], version_order=["warc_ts", "event_seq"])
    # extraction after dedup: the Arrow UDF runs once per surviving key;
    # winners are cached so the merge's bucket probe + write don't rerun
    # the dedup join or the extraction
    with_text = deduped.withColumn(
        "text", F.when(F.col("op") != "D", extract_text_udf(F.col("html")))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        result = table.merge_changelog(
            with_text, epoch_id=epoch_id, salt_partitions=salt_partitions
        )
        if ledger is not None and not result.get("skipped"):
            rows = ledger_rows_for_batch(batch, epoch_id, result["snapshot_id"])
            ledger.append(rows, epoch_id=epoch_id)
    finally:
        with_text.unpersist(blocking=False)
        projected.unpersist(blocking=False)
    return result
