"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline (JVM zip_with/aggregate,
  no UDF, no collect — distributable as a broadcast of the query vector);
- LSH-bucketed ANN: random-hyperplane signatures (hyperplanes derived
  deterministically from md5-int60, no RNG state) shrink the candidate
  set; recall measured against the brute-force oracle in tests.

At 100 TB the brute force is a full scan per query — fine for batch
scoring (one pass, k small), wrong for interactive lookup; the LSH path
prunes to matching-signature buckets (partition-prunable if the table
is written bucketed by signature).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from web3research_etl_spark.operators.dedup import cosine_expr


def brute_force_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine to a constant query vector. The query is a
    literal array (broadcast by constant folding); one scan + TakeOrdered."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        "vec_id",
        F.round(cosine_expr(F.col("embedding"), q), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


def hyperplane_signature(emb_col, dim: int, n_planes: int = 8):
    """Sign-of-dot-product signature against n_planes deterministic
    pseudo-random hyperplanes. Plane p component d = a zero-centered
    value derived from md5_int60(p:d) — fixed at plan build, no RNG."""
    from web3research_etl_spark.operators.text import md5_int60

    sig = F.lit(0).cast("bigint")
    for p in range(n_planes):
        comps = [
            (md5_int60(F.lit(f"{p}:{d}")) % F.lit(2001) - F.lit(1000)).cast("double")
            for d in range(dim)
        ]
        dot = sum(
            F.element_at(emb_col, d + 1).cast("double") * comps[d] for d in range(dim)
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    max_hamming: int = 1,
) -> DataFrame:
    """ANN: compute the query's signature driver-side with the SAME
    md5-derived planes, scan only rows whose signature is within
    ``max_hamming`` bits, then exact-cosine re-rank the survivors."""
    import hashlib

    def _md5_int60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    qsig = 0
    for p in range(n_planes):
        dot = sum(
            query_vec[d] * ((_md5_int60(f"{p}:{d}") % 2001) - 1000)
            for d in range(dim)
        )
        if dot > 0:
            qsig |= 1 << p
    sig_col = hyperplane_signature(F.col("embedding"), dim, n_planes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    candidates = embeddings.withColumn("_sig", sig_col).filter(
        F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    return (
        candidates.select(
            "vec_id", F.round(cosine_expr(F.col("embedding"), q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )
