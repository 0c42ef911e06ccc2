"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_stub`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it derives fake
width/height/channels from the bytes — so the Spark-side plumbing
(schema, batch shape, partitioning, UDF signature) is real and tested
end-to-end while the codec is swappable.

At scale: binary payloads dominate partition size — size partitions by
``spark.sql.files.maxPartitionBytes`` (bytes, not rows), keep metadata
in separate columns so metadata-only queries never touch the blobs
(parquet column pruning), and run decode in mapInPandas so each Arrow
batch amortizes Python crossing.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes int, content_hash string"
)
IMAGE_FEATURES_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, mean_intensity double"
)


def attach_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture: wrap each document's text bytes as an opaque media
    blob + typed metadata (what a WARC/image ingest would produce)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        blob.alias("media"),
        F.lit("image/fake").alias("media_type"),
        F.length(blob).alias("n_bytes"),
        F.md5(F.col(text_col)).alias("content_hash"),
    )


def decode_image_stub(data: bytes, deterministic_fake: bool) -> dict:
    """Codec slot. Real deployment: PIL/libvips/ffmpeg here."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decode requires an imaging library not present in this "
            "container; pass deterministic_fake=True for the test path"
        )
    n = len(data)
    return {
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "channels": 3,
        "mean_intensity": round((sum(data[:64]) / max(min(n, 64), 1)) / 255.0, 6),
    }


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.
    Blob column is pruned from the output immediately so downstream
    stages never shuffle the bytes."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_stub(b, deterministic_fake) for b in pdf["media"]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.select("doc_id", "media").mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = "doc_id bigint, width int, height int, n_bytes_out int, resized binary"


def resize_images(
    media: DataFrame, width: int, height: int, deterministic_fake: bool = True
) -> DataFrame:
    """mapInPandas resize plumbing: binary in → binary out with updated
    metadata, batched through Arrow. Real deployment swaps the fake
    kernel for PIL/libvips; the fake truncates the blob to the target
    buffer size ``width*height*3`` (deterministic, size-correct), so the
    Spark-side shape — blob in AND out of Python, schema, batching — is
    exercised for real."""
    target = width * height * 3

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "image resize requires an imaging library not present in "
                    "this container; pass deterministic_fake=True for the "
                    "test path"
                )
            blobs = [bytes(b)[:target] for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": width,
                    "height": height,
                    "n_bytes_out": [len(b) for b in blobs],
                    "resized": blobs,
                }
            )

    return media.select("doc_id", "media").mapInPandas(_resize, schema=RESIZED_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_no) rows for
    frames 0, n, 2n, ... where the fake frame count derives from blob
    size. Real decode replaces the count expression; the explode shape
    (1 blob row → many frame rows) is the part that matters at scale."""
    n_frames = (F.col("n_bytes") % 100 + 1).cast("int")
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
