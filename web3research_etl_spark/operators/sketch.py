"""Distinct-count sketching over web-scale key columns.

KMV (k-minimum-values) cardinality estimation: hash every value to a
uniform 60-bit integer, keep the k smallest DISTINCT hashes, and
estimate |distinct| = (k-1) * 2^60 / h_k (Bar-Yossef et al. 2002, the
bottom-k estimator HyperLogLog's literature benchmarks against). The
"how many distinct URLs are in this 100 TB crawl" question is the
motivating case: the exact answer is a full shuffle of every key;
the KMV answer shuffles at most a few distinct 8-byte hashes per
input partition.

Engine-portable by construction (the repo's oracle-parity trick,
operators/text.py): the hash is ``conv(substring(md5(x),1,15),16,10)``
— bit-identical in Spark and DuckDB — and the estimator is evaluated
in IEEE-754 double with one explicit terminal ROUND, so the DuckDB
oracle reproduces the estimate exactly, not approximately.

Scale shape (the part that matters at 10^10 rows):
- map-side partial aggregation: ``groupBy(hash)`` dedups within every
  input partition BEFORE the exchange, so the shuffle carries only
  per-partition-distinct 8-byte hashes — never payloads, never
  duplicate occurrences of a hot key (a hot URL crossing 10^6 times
  collapses to one hash per partition);
- the final ``orderBy(h).limit(k)`` compiles to TakeOrderedAndProject:
  each reducer keeps its own k smallest, the driver merges n_reducers
  × k candidates — no global sort;
- one pass, no state: unlike HLL register arrays this needs no UDAF —
  it is plain relational algebra, which also makes it incrementally
  mergeable (union two corpora's bottom-k sets, re-take bottom-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web3research_etl_spark.operators.text import md5_int60

# 2^60 — the hash domain size (md5_int60 draws uniformly from [0, 2^60))
_DOMAIN = float(1 << 60)


def kmv_bottom_hashes(df: DataFrame, col: str, k: int = 512) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``col`` — the KMV
    synopsis itself (one column ``h``, ≤ k rows, ordered). Kept as its
    own operator because synopses MERGE: the bottom-k of a union is the
    bottom-k of the concatenated synopses, so per-shard/per-day sketches
    roll up without touching the raw data again."""
    return (
        df.select(md5_int60(F.col(col)).alias("h"))
        # NULL keys are excluded, matching COUNT(DISTINCT col) semantics.
        # md5(NULL) hashes to NULL and Spark's ascending sort places NULL
        # FIRST, so an unfiltered NULL would silently occupy a bottom-k
        # slot that count("h") then skips — k_used=k-1 trips the
        # exact-count branch and a 5k-distinct + one-NULL input estimated
        # 511 (ADVICE r4, verified). Crawl key columns (urls, user ids)
        # are exactly where NULLs appear, so filter at the source.
        .filter(F.col("h").isNotNull())
        .groupBy("h")          # map-side combine: dedup before the shuffle
        .agg(F.lit(1).alias("__one"))
        .select("h")
        .orderBy("h")
        .limit(k)              # TakeOrderedAndProject — no global sort
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 512) -> DataFrame:
    """One row: (k_used, kth_min_hash, est_distinct).

    ``est_distinct`` = round((k_used - 1) * 2^60 / h_k) when the synopsis
    is full (k distinct hashes seen); when FEWER than k distinct values
    exist the synopsis IS the exact distinct set, so the estimate equals
    the exact count (the estimator's standard small-cardinality exact
    regime). (k-1)*2^60 for k ≤ 2^9 is exactly representable in a
    double (9 significant bits), so the only float op is one division +
    one round — deterministic IEEE-754, reproduced bit-for-bit by the
    DuckDB oracle."""
    bottom = kmv_bottom_hashes(df, col, k=k)
    return bottom.agg(
        F.count("h").alias("k_used"),
        F.max("h").alias("kth_min_hash"),
    ).select(
        "k_used",
        "kth_min_hash",
        F.when(
            F.col("k_used") < k, F.col("k_used").cast("bigint")
        )
        .otherwise(
            F.round(
                (F.col("k_used") - F.lit(1)).cast("double")
                * F.lit(_DOMAIN)
                / F.col("kth_min_hash").cast("double")
            ).cast("bigint")
        )
        .alias("est_distinct"),
    )
