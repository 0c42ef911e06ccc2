"""Measure the exact-vs-LSH Jaccard crossover (VERDICT r02 next #4).

The LSH route (`ngram_jaccard_via_lsh`) pays a fixed overhead —
signatures + banding + candidate join — on top of verifying candidates,
so at small corpora the exact inverted-index operator
(`ngram_jaccard_pairs`) wins. The exact operator's cost, however, grows
with the PAIR count of the shingle index (superlinear as shingle
buckets fill toward the cap), while LSH verification grows with the
TRUE near-dup count (linear for a fixed dup rate). This tool measures
both at 1x/2x/4x the sf0.1 corpus and records where the lines cross.

Scaling recipe: copy i of the corpus gets doc_id += i*M and its letters
rotated by a per-copy Caesar shift — a character bijection preserves
every within-copy shingle-set relation EXACTLY (same dup pairs, same
jaccard values, so the dup RATE stays fixed) while making cross-copy
shingle collisions vanish (no artificial near-dups between copies).

Usage: python tools/jaccard_crossover.py [scales, default 1,2,4]
Prints one JSON line per scale + a summary line; paste the table into
BENCH.md.
"""

from __future__ import annotations

import json
import os
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("CROSSOVER_REPEATS", "2"))


def scaled_docs(spark, scale: int):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    n = docs.count()
    lower = string.ascii_lowercase
    upper = string.ascii_uppercase
    parts = []
    for i in range(scale):
        rot = (i * 7) % 26  # coprime-ish stride; i=0 is the identity
        src = lower + upper
        dst = lower[rot:] + lower[:rot] + upper[rot:] + upper[:rot]
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                F.translate(F.col("text"), src, dst).alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint(), n * scale


def main() -> None:
    scales = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,2,4").split(",")]
    from web3research_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_via_lsh,
    )
    from web3research_etl_spark.session import get_spark

    spark = get_spark(
        app_name="jaccard-crossover", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    rows = []
    for scale in scales:
        docs, n_docs = scaled_docs(spark, scale)

        def _time(fn) -> tuple[float, int]:
            best, n_pairs = float("inf"), 0
            for _ in range(REPEATS):
                t0 = time.time()
                n_pairs = fn().count()
                best = min(best, time.time() - t0)
            return round(best, 2), n_pairs

        exact_s, exact_pairs = _time(
            lambda: ngram_jaccard_pairs(docs, k=12, threshold=0.2, max_bucket_size=100)
        )
        lsh_s, lsh_pairs = _time(
            lambda: ngram_jaccard_via_lsh(
                docs, k=12, threshold=0.2, num_hashes=8, bands=4
            )
        )
        row = {
            "scale": scale,
            "n_docs": n_docs,
            "exact_sec": exact_s,
            "exact_pairs": exact_pairs,
            "lsh_sec": lsh_s,
            "lsh_pairs": lsh_pairs,
            "lsh_wins": lsh_s < exact_s,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        docs.unpersist()
    print(json.dumps({"crossover": rows, "sf_dir": SF_DIR, "repeats": REPEATS}))


if __name__ == "__main__":
    main()
