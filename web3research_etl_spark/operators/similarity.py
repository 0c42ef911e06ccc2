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


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Codebook = the first ``n_centroids`` vectors by vec_id. A real
    index build would k-means these; centroid CHOICE is orthogonal to
    the engine mechanics (assign / probe / prune) this operator pins,
    and a deterministic codebook keeps the result oracle-checkable."""
    return embeddings.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )


def ivf_assign(embeddings: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """IVF coarse quantization: add ``cell`` = argmax_c cos(v, centroid_c),
    ties to the lower centroid id.

    The codebook is inlined as literal arrays, so the argmax is a NARROW
    projection folded into whole-stage codegen — no join, no shuffle, no
    UDF; at 100 TB this is one map pass, and writing the table
    partitioned by ``cell`` afterwards makes probes partition-prunable
    (the IVF analog of the reference's sparse primary index,
    /root/reference/src/ch_eth/init.rs:206)."""
    best = None
    for cid, vec in centroids:
        c = F.array(*[F.lit(float(x)) for x in vec])
        cand = F.struct(
            cosine_expr(F.col("embedding"), c).alias("score"),
            F.lit(-int(cid)).alias("neg_id"),
        )
        best = cand if best is None else F.greatest(best, cand)
    return embeddings.withColumn("cell", (-best["neg_id"]).cast("int"))


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    n_centroids: int = 16,
    n_probe: int = 4,
    k: int = 10,
) -> DataFrame:
    """IVF ANN: probe the ``n_probe`` cells whose centroids are nearest
    the query, exact-cosine re-rank only rows assigned to those cells.
    The codebook collect is the (tiny) index-build step, not a
    driver-side loop over data."""
    cents = [
        (r["centroid_id"], [float(x) for x in r["centroid"]])
        for r in ivf_centroids(embeddings, n_centroids).collect()
    ]

    def _cos(a: list[float], b: list[float]) -> float:
        # sequential double fold — matches cosine_expr / DuckDB list_sum
        dot = n1 = n2 = 0.0
        for x, y in zip(a, b):
            dot += x * y
            n1 += x * x
            n2 += y * y
        return dot / ((n1**0.5) * (n2**0.5))

    probed = [
        cid
        for cid, _ in sorted(cents, key=lambda cv: (-_cos(query_vec, cv[1]), cv[0]))[
            :n_probe
        ]
    ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        ivf_assign(embeddings, cents)
        .filter(F.col("cell").isin(probed))
        .select(
            "vec_id", F.round(cosine_expr(F.col("embedding"), q), 6).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


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
