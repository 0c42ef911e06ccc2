"""One-off profiler: explode-based vs array-fold-based shingle ops.

Both variants compute IDENTICAL values (same md5-int60 hash family, min
over the same distinct-shingle multiset) — only the plan shape differs:

  explode path : shingle_array -> explode (~4k rows/doc) -> hash ->
                 groupBy(doc_id).agg(min...)   [partial agg + shuffle]
  fold path    : array_min(transform(shingle_array, hash))
                 [one narrow codegen'd projection, zero shuffle]

Usage: python tools/profile_shingle_ops.py [sf_dir] [variant...]
"""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from web3research_etl_spark.session import get_spark  # noqa: E402
from web3research_etl_spark.operators.text import md5_int60, shingle_array  # noqa: E402
from web3research_etl_spark.operators import dedup  # noqa: E402


def minhash_fold(docs, k=12, num_hashes=8):
    arr = shingle_array(F.col("text"), k)
    cols = [
        F.array_min(
            F.transform(arr, lambda s: md5_int60(F.concat(s, F.lit(f"#{i}"))))
        ).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return docs.select("doc_id", *cols)


def simhash_fold(docs, bits=16, k=12):
    hashes = F.transform(shingle_array(F.col("text"), k), lambda s: md5_int60(s))
    votes = [
        F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = docs.select("doc_id", *votes)
    sig = sum(
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0)) for i in range(bits)
    )
    return agg.select("doc_id", sig.cast("bigint").alias("simhash"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = set(sys.argv[2:]) or {"mh_explode", "mh_fold", "sh_explode", "sh_fold"}
    spark = get_spark(app_name="profile-shingle")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    print(f"docs={n}")

    variants = {
        "mh_explode": lambda: dedup.minhash_signatures(docs, k=12, num_hashes=8),
        "mh_fold": lambda: minhash_fold(docs, k=12, num_hashes=8),
        "sh_explode": lambda: dedup.simhash(docs, bits=16, k=12),
        "sh_fold": lambda: simhash_fold(docs, bits=16, k=12),
    }
    results = {}
    for name, fn in variants.items():
        if name not in which:
            continue
        for rep in range(2):
            t0 = time.time()
            df = fn()
            cnt = df.agg(F.count("*"), F.sum(F.pmod(F.col(df.columns[1]), F.lit(1000003)))).collect()
            dt = time.time() - t0
            results.setdefault(name, []).append(round(dt, 2))
            print(f"{name} rep{rep}: {dt:.2f}s  checksum={cnt}")
    print(results)
    # value identity spot check
    if {"mh_explode", "mh_fold"} <= which:
        a = dedup.minhash_signatures(docs, k=12, num_hashes=8)
        b = minhash_fold(docs, k=12, num_hashes=8)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"minhash value diff rows: {diff}")
    if {"sh_explode", "sh_fold"} <= which:
        a = dedup.simhash(docs, bits=16, k=12)
        b = simhash_fold(docs, bits=16, k=12)
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(f"simhash value diff rows: {diff}")
    spark.stop()


if __name__ == "__main__":
    main()
