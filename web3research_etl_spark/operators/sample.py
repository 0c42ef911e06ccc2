"""Deterministic sampling for training-data curation.

`df.sample()` is seeded per-partition: the rows it picks change whenever
the partitioning changes (a repartition, a file split resize, AQE), and
a retried task can sample DIFFERENT rows than its first attempt — which
breaks exactly-once sinks. For corpus curation the sample must be a pure
FUNCTION of the data, so membership is decided by a keyed hash:
md5-int60(key) < fraction · 2^60. Properties:

- narrow: a filter fused into the scan — no shuffle, no RNG state, and
  Parquet row-group statistics still prune (the filter is on a derived
  column, but every other pushed predicate survives);
- reproducible: same rows on any cluster size, any partitioning, any
  engine (the md5-int60 trick is bit-identical in DuckDB — oracle-able);
- composable: nested samples (salt "a" at 10% then salt "a" at 5%) are
  proper subsets; disjoint salts give independent samples.

Stratified exact-k uses hash-rank row_number per stratum — one shuffle
on the strata column; ties broken by key so the result is total-order
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web3research_etl_spark.operators.text import md5_int60


def _sample_hash(key_col: str, salt: str):
    return md5_int60(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = "s0"
) -> DataFrame:
    """Deterministic ~``fraction`` uniform sample keyed on ``key_col``."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    threshold = int(fraction * float(1 << 60))
    return df.filter(_sample_hash(key_col, salt) < F.lit(threshold))


def stratified_topk(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    k: int,
    salt: str = "s0",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum, chosen by hash rank —
    the deterministic equivalent of per-stratum reservoir sampling."""
    w = Window.partitionBy(strata_col).orderBy(
        _sample_hash(key_col, salt).asc(), F.col(key_col).asc()
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    salt: str = "shard0",
    check_unique: bool = False,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the training
    export's order-randomization step. Every input column is carried
    through (the export writer needs the payload in shard order, so the
    one shuffle this costs is the export's own); each row gains:

    - ``shard``  = md5-int60(salt:key) mod n_shards — balanced (hash
      uniformity), stable under any partitioning/retry/cluster size;
    - ``pos``    = its rank within the shard by a SECOND keyed hash
      (ties broken by key) — a reproducible random reading order.

    Together (shard, pos) define one global pseudorandom permutation of
    the corpus, chunked into ``n_shards`` sequential streams. Changing
    ``salt`` reshuffles; the same salt replays identically on any
    engine (md5-int60 is bit-identical in DuckDB — oracle-able).

    Scale shape: ONE shuffle, on ``shard`` (the window's partition key)
    — at export time the writer consumes this exact partitioning, one
    task per shard writing rows in ``pos`` order. No global sort: the
    permutation is global but materialized per-shard, which is the only
    order a sharded reader observes anyway.

    Precondition: ``key_col`` values must be unique — both the shard
    and the order hash are pure functions of the key, so duplicate keys
    land at the same (shard, order-hash) and their relative ``pos`` is
    broken only by the key tie-break, i.e. arbitrarily. Dedup first
    (operators/dedup) — that's the curation pipeline's job anyway.
    ``check_unique=True`` verifies the precondition with one extra
    count job (eager; off the hot path by default) and raises listing
    an offending key.
    """
    if check_unique:
        dup = (
            df.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"shard_assign: key_col {key_col!r} is not unique "
                f"(e.g. {dup[0][key_col]!r} appears {dup[0]['_n']}×); "
                "dedup before sharding"
            )
    shard = F.pmod(_sample_hash(key_col, salt), F.lit(n_shards))
    order_h = _sample_hash(key_col, f"{salt}:order")
    w = Window.partitionBy("shard").orderBy(
        F.col("_order_h").asc(), F.col(key_col).asc()
    )
    return (
        df.select(*df.columns, shard.alias("shard"), order_h.alias("_order_h"))
        .withColumn("pos", F.row_number().over(w))
        .drop("_order_h")
    )
