"""Materialized CDC feed: the table's change stream as a tailable dir.

``read_changes`` answers "what changed between two snapshots" on
demand; a downstream *streaming* consumer instead wants a topic it can
tail. This module materializes exactly that: for every data snapshot
committed since the last publish, the per-snapshot diff
(``read_changes(parent, snap)`` + snapshot/epoch provenance) is written
as parquet under ``out_dir/s<snapshot>/`` — an append-only directory a
Structured Streaming file source consumes like a Kafka topic
(``spark.readStream.schema(feed_schema(table)).parquet(out_dir)``).

This is the pragmatic scale shape for lake CDC (Iceberg deployments
materialize change topics the same way): the diff is computed ONCE,
bucket-pruned, by the publisher — not recomputed by every consumer —
and the feed directory partitions naturally by snapshot so consumers
resume by file-source checkpoint alone.

Delivery contract: at-least-once with idempotent payloads. The
publisher bumps its state file only AFTER a snapshot's directory is
fully written; a crash between the two republishes the same snapshot
into the same directory (overwrite). Consumers needing exactly-once
dedup on (snapshot_id, <key>) — which is exactly what the engine's own
merge does when the feed drives a downstream LakeTable.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_STATE_FILE = "_feed_state.json"


def _state_path(out_dir: str) -> str:
    return os.path.join(out_dir, _STATE_FILE)


def _load_state(out_dir: str) -> dict:
    try:
        with open(_state_path(out_dir)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"published_through": None}


def _store_state(out_dir: str, state: dict) -> None:
    tmp = _state_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(out_dir))


def feed_schema(table, payloads: bool = False) -> T.StructType:
    """The feed's fixed schema: key columns + change_type + both sides'
    version columns (+ the newer side's payload columns when the feed
    was published with ``payloads=True``) + provenance."""
    snap = table.current_snapshot()
    key, vorder = set(snap["key"]), snap["version_order"]
    fields = table.schema(snap).fields
    ver_fields = [f for f in fields if f.name in set(vorder)]
    pay_fields = [f for f in fields if f.name not in key | set(vorder)] if payloads else []
    return T.StructType(
        [f for f in fields if f.name in key]
        + [T.StructField("change_type", T.StringType(), False)]
        + [T.StructField(f"new_{f.name}", f.dataType, True) for f in ver_fields]
        + [T.StructField(f"old_{f.name}", f.dataType, True) for f in ver_fields]
        + [T.StructField(f.name, f.dataType, True) for f in pay_fields]
        + [
            T.StructField("snapshot_id", T.LongType(), False),
            T.StructField("epoch_id", T.LongType(), True),
        ]
    )


def _epoch_of(table, snap: dict) -> Any:
    """The epoch marker this snapshot committed, if any: committed_epochs
    grows by (at most) one element per commit, so the new tail element
    vs the parent's list IS this snapshot's epoch."""
    parent_id = snap.get("parent")
    parent_epochs = (
        table.snapshot(parent_id)["summary"].get("committed_epochs", [])
        if parent_id is not None
        else []
    )
    epochs = snap["summary"].get("committed_epochs", [])
    return epochs[-1] if len(epochs) > len(parent_epochs) else None


def publish_changes(table, out_dir: str, payloads: bool = False) -> dict:
    """Publish every not-yet-published data snapshot's diff to the feed.

    ``payloads=True`` rides the newer side's data columns along with
    every insert/update row (null for deletes) — a feed a downstream
    mirror can replicate from (see ``apply_feed``).

    Returns {"published": [snapshot ids], "through": last_id}. Pure
    metadata snapshots (schema evolution, compaction that rewrote no
    live rows) produce empty diffs and publish no directory — consumers
    never see them.
    """
    os.makedirs(out_dir, exist_ok=True)
    state = _load_state(out_dir)
    ids = table.snapshot_ids()
    start_after = state["published_through"]
    todo = [s for s in ids if start_after is None or s > start_after]
    published: list[int] = []
    for sid in todo:
        snap = table.snapshot(sid)
        parent = snap.get("parent")
        if parent is None:
            # snapshot 0 is CREATE — empty table, nothing to diff
            state["published_through"] = sid
            _store_state(out_dir, state)
            continue
        chg = table.read_changes(parent, sid, include_payload=payloads)
        epoch = _epoch_of(table, snap)
        out = chg.withColumn("snapshot_id", F.lit(sid).cast("long")).withColumn(
            "epoch_id",
            F.lit(int(epoch)).cast("long") if epoch is not None else F.lit(None).cast("long"),
        )
        sdir = os.path.join(out_dir, f"s{sid:08d}")
        # overwrite => crash-idempotent: a republish lands byte-equivalent
        # rows in the same directory
        if not out.isEmpty():
            out.write.mode("overwrite").parquet(sdir)
            published.append(sid)
        state["published_through"] = sid
        _store_state(out_dir, state)
    return {"published": published, "through": state["published_through"]}


def stream_feed(spark, table, out_dir: str, payloads: bool = False) -> DataFrame:
    """Tail the materialized feed as a Structured Streaming source."""
    return spark.readStream.schema(feed_schema(table, payloads=payloads)).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(os.path.join(out_dir, "s*"))


def apply_feed(mirror, feed: DataFrame, epoch_id) -> dict:
    """Replicate a payload feed batch into a mirror LakeTable.

    Change rows map straight onto changelog ops (insert/update → U,
    delete → D) with the NEW-side version columns restored to their
    table names — deletes carry their tombstone's version, so LWW
    ordering in the mirror matches the source. Idempotent under the
    mirror's own epoch markers; applying every feed batch in snapshot
    order reproduces the source's live state exactly (test-pinned by
    content hash).
    """
    snap = mirror.current_snapshot()
    vorder = snap["version_order"]
    op = F.when(F.col("change_type") == "delete", F.lit("D")).otherwise(F.lit("U"))
    restored = feed.withColumn("op", op)
    for v in vorder:
        restored = restored.withColumn(v, F.col(f"new_{v}"))
    data_cols = [f.name for f in mirror.schema(snap).fields]
    return mirror.merge_changelog(restored.select("op", *data_cols), epoch_id=epoch_id)
