"""Deterministic synthetic changelog generator (FIXTURES.md §2).

Stand-in for the 10^10-event Common-Crawl changelog: fully distributed
(``spark.range`` → column expressions, no driver-side loops, no Python
randomness), seeded, and scale-free — the same code generates 10^4 rows
for tests and 10^10 on a cluster by changing ``n_events``.

Guarantees (all derived from xxhash64(id, seed) so they are reproducible
and partition-independent):
- Zipf-ish hot-domain skew: domain ids are drawn by squaring a uniform
  hash, concentrating mass on low ids (a few domains are hot) — this is
  the skew that salting/AQE must break (BASELINE.json axis A).
- ~10% deletes, ~30% updates, ~60% inserts (op derived from a hash).
- duplicated events: ~5% of events are emitted twice with identical
  (url, warc_ts, event_seq, html) — exercises idempotency.
- out-of-order arrival: event_seq is the LWW minor version; rows are
  generated in scrambled order within a bounded lag window.
- payload_version 1/2/3 in three chronological thirds (schema evolution).

HTML bytes are a deterministic function of (url, event_seq) so the
extraction invariant (byte-identical text per url) is checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SEED = 42


def _h(col, salt: str, seed: int):
    """Deterministic 64-bit hash stream, non-negative."""
    return F.abs(F.xxhash64(col, F.lit(salt), F.lit(seed)))


def generate_changelog(
    spark: SparkSession,
    n_events: int,
    n_domains: int = 50,
    pages_per_domain: int = 200,
    seed: int = DEFAULT_SEED,
    n_source_partitions: int = 8,
    dup_fraction: float = 0.05,
    shuffle_lag: int = 64,
    body_paragraphs: int = 0,
    n_partitions: int | None = None,
) -> DataFrame:
    """Return a changelog DataFrame matching schemas.CHANGELOG_SCHEMA.

    Row order (and parquet file order) is scrambled within a ``shuffle_lag``
    window relative to event_seq to simulate bounded out-of-orderness.
    """
    n_dups = int(n_events * dup_fraction)
    base = spark.range(n_events + n_dups).select(
        # duplicate tail re-emits an earlier event id verbatim
        F.when(
            F.col("id") >= n_events,
            _h(F.col("id"), "dupsel", seed) % F.lit(n_events),
        )
        .otherwise(F.col("id"))
        .alias("event_seq")
    )

    u = _h(F.col("event_seq"), "domain", seed) % F.lit(10_000)
    # square a uniform draw → density ∝ 1/sqrt(x): low domain ids are hot
    domain_id = ((u * u) / F.lit(100_000_000.0) * F.lit(n_domains)).cast("long")
    page_id = _h(F.col("event_seq"), "page", seed) % F.lit(pages_per_domain)
    opr = _h(F.col("event_seq"), "op", seed) % F.lit(100)
    lang_id = _h(F.col("event_seq"), "lang", seed) % F.lit(8)
    version_third = (
        F.col("event_seq") * F.lit(3) / F.lit(max(n_events, 1))
    ).cast("int") + F.lit(1)

    df = base.select(
        F.col("event_seq"),
        F.when(opr < 10, F.lit("D"))
        .when(opr < 40, F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
        F.concat(
            F.lit("https://site-"),
            domain_id.cast("string"),
            F.lit(".example.com/page/"),
            page_id.cast("string"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("event_seq") * 60
            + (_h(F.col("event_seq"), "jitter", seed) % 60)
        ).alias("warc_ts"),
        lang_id.alias("_lang_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["en", "de", "fr", "es", "it", "pt", "nl", "zh"]]),
            (lang_id + 1).cast("int"),
        ).alias("lang"),
        F.least(version_third, F.lit(3)).alias("payload_version"),
        (F.col("event_seq") % F.lit(n_source_partitions)).cast("int").alias(
            "source_partition"
        ),
    )

    # Deterministic synthetic HTML from (url, event_seq, lang).
    # body_paragraphs > 0 pads with deterministic filler paragraphs so
    # pages approach realistic Common-Crawl sizes (~90 bytes each).
    filler = (
        F.repeat(
            F.concat(
                F.lit("<p>filler para "),
                (_h(F.col("event_seq"), "filler", seed) % 1_000_000).cast("string"),
                F.lit(" with&nbsp;entities &amp; <b>tags</b> to strip.</p>"),
            ),
            body_paragraphs,
        )
        if body_paragraphs
        else F.lit("")
    )
    body = F.concat(
        F.lit("<html><head><title>Page "),
        F.col("url"),
        F.lit("</title><style>body{color:red}</style></head><body>"),
        F.lit("<script>var x = 1 < 2;</script>"),
        F.lit("<h1>Title "),
        F.col("event_seq").cast("string"),
        F.lit("</h1><p>Content rev "),
        F.col("event_seq").cast("string"),
        F.lit(" of "),
        F.col("url"),
        F.lit(" &amp; friends.</p><!-- hidden -->"),
        filler,
        F.lit("<div>tail "),
        (_h(F.col("event_seq"), "body", seed) % 1000).cast("string"),
        F.lit("</div></body></html>"),
    )
    status = (_h(F.col("event_seq"), "status", seed) % 3 * 100 + 200).cast("int")
    payload = (
        F.when(
            F.col("payload_version") == 1,
            F.to_json(F.struct(F.length(body).alias("content_len"))),
        )
        .when(
            F.col("payload_version") == 2,
            F.to_json(
                F.struct(
                    F.length(body).alias("content_len"),
                    status.alias("fetch_status"),
                )
            ),
        )
        .otherwise(
            F.to_json(
                F.struct(
                    F.length(body).cast("long").alias("content_len"),
                    status.alias("http_status"),
                )
            )
        )
    )

    df = df.select(
        "op",
        "url",
        "warc_ts",
        "event_seq",
        F.when(F.col("op") != "D", body.cast("binary")).alias("html"),
        F.when(F.col("op") != "D", F.col("lang")).alias("lang"),
        "payload_version",
        payload.alias("payload"),
        "source_partition",
    )

    # bounded out-of-order scramble: sort by (seq ÷ lag, hash) — rows stay
    # within `shuffle_lag` of home but local order is shuffled
    scramble = F.concat_ws(
        ":",
        (F.col("event_seq") / F.lit(shuffle_lag)).cast("long").cast("string"),
        (_h(F.col("event_seq"), "scramble", seed) % 1_000_000).cast("string"),
    )
    parts = [n_partitions] if n_partitions else []
    return df.repartitionByRange(*parts, F.col("event_seq")).sortWithinPartitions(scramble)


def write_changelog_dir(
    spark: SparkSession,
    path: str,
    n_events: int,
    files_per_batch: int = 8,
    **kwargs,
) -> DataFrame:
    """Materialize the changelog as a parquet directory — the file-stream
    source for Structured Streaming (push→pull conversion of the
    reference's WS head subscription, /root/reference/src/ch_eth/sync.rs:127-129)."""
    df = generate_changelog(spark, n_events, n_partitions=files_per_batch, **kwargs)
    df.write.mode("overwrite").parquet(path)  # one file per range partition
    return spark.read.parquet(path)
