"""Decompose minhash cost: shingling vs md5 count; try 2-chunks-per-md5."""
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
from web3research_etl_spark.session import get_spark  # noqa: E402
from web3research_etl_spark.operators.text import md5_int60, shingle_array  # noqa: E402


def timed(name, df):
    force = sum(F.pmod(F.col(c), F.lit(1000003)) for c in df.columns[1:])
    for rep in range(2):
        t0 = time.time()
        c = df.agg(F.count("*"), F.sum(force)).collect()[0]
        print(f"{name} rep{rep}: {time.time()-t0:.2f}s rows={c[0]} chk={c[1]}", flush=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="profile-minhash2")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arr = shingle_array(F.col("text"), 12)

    # 0) shingling only
    timed("shingle_only", docs.select("doc_id", F.size(arr).alias("n")))

    # 1) fold, 1 hash
    timed(
        "fold_h1",
        docs.select(
            "doc_id",
            F.array_min(F.transform(arr, lambda s: md5_int60(F.concat(s, F.lit("#0"))))).alias("m"),
        ),
    )

    # 2) fold, 8 hashes (baseline winner from profile_shingle_ops)
    cols8 = [
        F.array_min(F.transform(arr, lambda s: md5_int60(F.concat(s, F.lit(f"#{i}"))))).alias(f"mh{i}")
        for i in range(8)
    ]
    timed("fold_h8", docs.select("doc_id", *cols8))

    # 3) fold, 8 hashes from 4 md5s (two 60-bit chunks per digest:
    #    hex chars 1-15 and 17-31; both replicable in DuckDB via
    #    conv(substr(md5(x), pos, 15), 16, 10))
    def two_chunks(g):
        h = F.md5(F.concat(F.lit(f"c{g}:"), F.col("s")))
        return h

    chunk_cols = []
    for g in range(4):
        digest = F.transform(arr, lambda s, g=g: F.md5(F.concat(s, F.lit(f"#c{g}"))))
        lo = F.array_min(
            F.transform(digest, lambda d: F.conv(F.substring(d, 1, 15), 16, 10).cast("bigint"))
        ).alias(f"mh{2*g}")
        hi = F.array_min(
            F.transform(digest, lambda d: F.conv(F.substring(d, 17, 15), 16, 10).cast("bigint"))
        ).alias(f"mh{2*g+1}")
        chunk_cols += [lo, hi]
    timed("fold_h8_chunked", docs.select("doc_id", *chunk_cols))

    spark.stop()


if __name__ == "__main__":
    main()
