"""Write-side skew detection: choose salt_partitions from the batch's
actual bucket histogram (the "hot-domain widening" of SURVEY.md §7
step 5 / BASELINE.json axis A).

The reference has no skew handling at all (single process). Here, a hot
domain concentrates a micro-batch's rows into few key-hash buckets; the
merge's write stage then runs as many tasks as buckets touched, so one
hot bucket serializes the epoch. ``choose_salt_partitions`` measures the
histogram (one skinny aggregate over the key columns — n_buckets longs
to the driver, nothing like a payload collect) and widens the write
shuffle only when imbalance is real. Salting changes only the shuffle,
never the result (tested: test_lake_table salted-equality,
test_skew below).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_histogram(batch: DataFrame, key: list[str], n_buckets: int) -> dict[int, int]:
    """rows per key-hash bucket — same bucket fn as the lake table
    (lake/table.py:_bucket_expr)."""
    key_concat = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key])
    bucket = F.pmod(F.xxhash64(key_concat), F.lit(n_buckets))
    rows = batch.groupBy(bucket.alias("b")).agg(F.count("*").alias("n")).collect()
    return {r["b"]: r["n"] for r in rows}


def choose_salt_partitions(
    batch: DataFrame,
    key: list[str],
    n_buckets: int,
    skew_threshold: float = 2.0,
    max_widening: int = 8,
) -> int | None:
    """None when the batch is balanced (salting would only add shuffle
    cost); otherwise a widened partition count proportional to the
    imbalance: hot-bucket rows fan out over ~(max/mean) extra writer
    tasks, capped at ``max_widening``×."""
    hist = bucket_histogram(batch, key, n_buckets)
    if not hist:
        return None
    counts = list(hist.values())
    # mean over ALL buckets — an absent bucket is an idle writer task,
    # which is exactly the imbalance being measured
    mean = sum(counts) / n_buckets
    peak = max(counts)
    if mean <= 0 or peak / mean < skew_threshold:
        return None
    widening = min(max_widening, int(round(peak / mean)))
    return n_buckets * widening
