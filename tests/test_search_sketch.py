"""Inverted-index search (operators/search.py) and KMV distinct-count
sketch (operators/sketch.py)."""

import pyspark.sql.functions as F
import pytest

from web3research_etl_spark.operators.search import (
    doc_tokens,
    keyword_search,
    postings,
    term_stats,
)
from web3research_etl_spark.operators.sketch import (
    kmv_bottom_hashes,
    kmv_distinct_estimate,
)


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the merge joins the spark window plan"),
        (2, "merge merge spark"),                # tf: merge=2 spark=1, no window
        (3, "window spark merge window"),        # all three, window tf=2
        (4, "nothing relevant here"),
        (5, "sparkly windows merged"),           # substrings only, NOT tokens
        (6, "Merge SPARK Window"),               # case-folded match
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tokenization_splits_on_non_alnum_and_drops_empties(spark):
    df = spark.createDataFrame([(1, "A-b,,c  9x! ")], ["doc_id", "text"])
    toks = [r.token for r in doc_tokens(df).collect()]
    assert toks == ["a", "b", "c", "9x"]


def test_keyword_search_whole_tokens_conjunctive(docs):
    got = {
        r.doc_id: (r.n_terms_matched, r.tf_sum)
        for r in keyword_search(docs, ["merge", "spark", "window"]).collect()
    }
    # doc 1: one of each; doc 3: merge+spark+2×window; doc 6 case-folds.
    # doc 2 lacks 'window'; doc 5 only has superstrings (sparkly/windows/
    # merged) — the contains() pre-filter admits it, the token predicate
    # must reject it.
    assert got == {1: (3, 3), 3: (3, 4), 6: (3, 3)}


def test_keyword_search_rejects_non_token_terms(docs):
    with pytest.raises(ValueError):
        keyword_search(docs, ["Spark"])


def test_postings_and_term_stats(docs):
    p = {(r.token, r.doc_id): r.tf for r in postings(docs).collect()}
    assert p[("merge", 2)] == 2
    assert p[("window", 3)] == 2
    assert ("merge", 4) not in p
    st = {r.token: (r.df, r.cf) for r in term_stats(docs, min_df=2).collect()}
    # 'merge' appears in docs 1,2,3,6 (df=4) with 2 occurrences in doc 2
    assert st["merge"] == (4, 5)
    assert st["spark"] == (4, 4)
    # df=1 tokens are below min_df
    assert "nothing" not in st


def test_kmv_exact_regime_below_k(spark):
    # fewer distinct values than k: the synopsis IS the distinct set and
    # the estimate must be the exact count
    df = spark.range(0, 1000).select(
        (F.col("id") % 37).cast("string").alias("v")
    )
    row = kmv_distinct_estimate(df, "v", k=512).collect()[0]
    assert (row.k_used, row.est_distinct) == (37, 37)


def test_kmv_estimate_accuracy_and_determinism(spark):
    # 20k distinct keys, k=512 → relative standard error ≈ 1/sqrt(k-1)
    # ≈ 4.4%; assert within 4 sigma, and that repeated evaluation over a
    # different partitioning returns the identical estimate (the sketch
    # is a pure function of the value SET)
    n = 20000
    df = spark.range(0, n * 3).select(
        (F.col("id") % n).cast("string").alias("v")
    )
    est1 = kmv_distinct_estimate(df, "v", k=512).collect()[0]
    est2 = kmv_distinct_estimate(df.repartition(13), "v", k=512).collect()[0]
    assert est1 == est2
    assert est1.k_used == 512
    assert abs(est1.est_distinct - n) / n < 0.18


def test_kmv_null_keys_excluded(spark):
    # COUNT(DISTINCT) semantics: NULL keys contribute nothing. Before
    # the fix (ADVICE r4) md5(NULL)→NULL sorted FIRST in Spark, stole a
    # bottom-k slot that count("h") skipped, and k_used=k-1 tripped the
    # exact-count branch: 5000 distinct + one NULL estimated 511.
    base = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    with_null = base.union(
        spark.createDataFrame([(None,)], "v string")
    )
    clean = kmv_distinct_estimate(base, "v", k=512).collect()[0]
    nulled = kmv_distinct_estimate(with_null, "v", k=512).collect()[0]
    assert nulled == clean            # NULL is invisible to the sketch
    assert nulled.k_used == 512
    assert abs(nulled.est_distinct - 5000) / 5000 < 0.18
    # exact regime too: below-k distinct + NULLs stays exact
    small = spark.range(0, 37).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct_estimate(
        small.union(spark.createDataFrame([(None,), (None,)], "v string")),
        "v", k=512,
    ).collect()[0]
    assert (row.k_used, row.est_distinct) == (37, 37)


def test_search_terms_deduped_and_empty_rejected(docs):
    from web3research_etl_spark.operators.search import bm25_rank

    # duplicated terms must behave as the deduped query (pre-fix the
    # countDistinct == len(terms) conjunction was unsatisfiable → empty)
    dup = {r.doc_id: (r.n_terms_matched, r.tf_sum)
           for r in keyword_search(docs, ["merge", "merge", "spark"]).collect()}
    ded = {r.doc_id: (r.n_terms_matched, r.tf_sum)
           for r in keyword_search(docs, ["merge", "spark"]).collect()}
    assert dup == ded and dup
    b_dup = {r.doc_id: r.bm25
             for r in bm25_rank(docs, ["merge", "merge"]).collect()}
    b_ded = {r.doc_id: r.bm25 for r in bm25_rank(docs, ["merge"]).collect()}
    assert b_dup == b_ded and b_dup
    with pytest.raises(ValueError):
        keyword_search(docs, [])
    with pytest.raises(ValueError):
        bm25_rank(docs, [])


def test_kmv_synopses_merge(spark):
    # bottom-k of a union == bottom-k over the concatenated synopses —
    # the property that lets per-shard sketches roll up without rereading
    a = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2500, 9000).select(F.col("id").cast("string").alias("v"))
    direct = [r.h for r in kmv_bottom_hashes(a.union(b), "v", k=64).collect()]
    sa = kmv_bottom_hashes(a, "v", k=64)
    sb = kmv_bottom_hashes(b, "v", k=64)
    merged = [
        r.h
        for r in sa.union(sb).distinct().orderBy("h").limit(64).collect()
    ]
    assert direct == merged


def test_keyword_search_plan_prefilters_scan(docs):
    # the contains() pre-filter must sit in the plan as a data filter
    # (scan-fused on this in-memory frame; pushed to the source on
    # parquet) so non-candidate docs never reach the explode
    plan = keyword_search(docs, ["merge"])._jdf.queryExecution().executedPlan().toString()
    assert "contains" in plan.lower()


def test_bm25_scores_and_candidates(docs):
    from web3research_etl_spark.operators.search import bm25_rank

    got = {r.doc_id: r.bm25 for r in
           bm25_rank(docs, ["merge", "spark", "window"]).collect()}
    # same candidate set as conjunctive retrieval (docs 1, 3, 6)
    assert set(got) == {1, 3, 6}
    # all scores positive (plus-one idf is always > 0)
    assert all(v > 0 for v in got.values())
    # doc 3 repeats 'window' and is shorter than doc 1 → higher score
    assert got[3] > got[1]
    # hand-check doc 6 ("Merge SPARK Window": dl=3, each tf=1) to 6 dp
    import math

    n, tot = 6.0, float(7 + 3 + 4 + 3 + 3 + 3)
    dfs = {"merge": 4.0, "spark": 4.0, "window": 3.0}
    avgdl = tot / n
    exp = 0.0
    for t in ["merge", "spark", "window"]:
        idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
        exp += idf * (1.0 * 2.2) / (1.0 + 1.2 * (1.0 - 0.75 + 0.75 * (3.0 / avgdl)))
    assert got[6] == pytest.approx(round(exp, 6), abs=2e-6)


def test_int8_quantization_bounds_and_zero_vector(spark):
    from web3research_etl_spark.operators.similarity import quantized_int8

    df = spark.createDataFrame(
        [(0, [0.5, -1.0, 0.25]), (1, [0.0, 0.0, 0.0])],
        "vec_id INT, embedding ARRAY<FLOAT>",
    )
    rows = {r.vec_id: (r.q8, r.q8_norm2) for r in quantized_int8(df).collect()}
    # max-abs component maps to ±127; others scale proportionally
    assert rows[0][0] == [64, -127, 32]  # round(.5*127)=64 (half up), .25*127=31.75→32
    assert rows[0][1] == 64 * 64 + 127 * 127 + 32 * 32
    # zero vector: all-zero codes, zero norm (try_divide guard)
    assert rows[1] == ([0, 0, 0], 0)


def test_int8_topk_recall_vs_float_bruteforce(spark):
    from web3research_etl_spark.operators.similarity import (
        brute_force_topk,
        int8_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    exact = [r.vec_id for r in brute_force_topk(emb, qv, k=10).collect()]
    quant = [r.vec_id for r in int8_topk(emb, qv, k=10).collect()]
    # int8 quantization is near-lossless at 64 dims: require recall@10 ≥ 0.8
    assert len(set(exact) & set(quant)) >= 8
    # the query vector itself must rank first in both
    assert exact[0] == quant[0] == 0


def test_postings_as_clustered_laketable_token_lookup(spark, tmp_table_dir):
    # the persisted-retrieval-index story: write the inverted index as a
    # lake table, z-order-cluster it by token, and serve token lookups
    # from per-file per-column stats (files skipped, not just rows).
    # Hash bucketing alone CANNOT prune a token lookup here — the bucket
    # hash covers (token, doc_id), so one token spreads over all buckets
    # — which is exactly what the fourth pruning level exists for.
    import pyspark.sql.types as T

    from web3research_etl_spark.lake.table import LakeTable
    from web3research_etl_spark.operators.search import postings

    docs = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.concat(F.lit("w"), ((F.col("id") * k) % 97).cast("string"))
                for k in (1, 3, 7, 11, 13)
            ],
        ).alias("text"),
    )
    p = postings(docs)
    schema = T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("doc_id", T.LongType()),
            T.StructField("tf", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, f"{tmp_table_dir}/postings", schema,
        key=["token", "doc_id"], n_buckets=8,
    )
    t.append(p.select("token", "doc_id", "tf"))
    t.rewrite_clustered(["token"], files_per_bucket=6)

    expected = sorted(
        (r.doc_id, r.tf) for r in p.filter(F.col("token") == "w5").collect()
    )
    got_df = t.read_for_column_range("token", "w5", "w5")
    got = sorted((r.doc_id, r.tf) for r in got_df.collect())
    assert got == expected and len(got) > 0

    snap = t.current_snapshot()
    _, kept, total = t._prune_groups_for_column_range(snap, "token", "w5", "w5")
    # clustering by token must let a single-token lookup skip most files
    assert total >= 24 and kept <= total // 3


def test_kmv_plan_shape(spark):
    # the 100-TB contract, pinned: map-side dedup BEFORE the exchange
    # (shuffle carries per-partition-distinct hashes only) and a
    # TakeOrderedAndProject for bottom-k (no global sort)
    df = spark.range(0, 1000).select(F.col("id").cast("string").alias("v"))
    plan = kmv_bottom_hashes(df, "v", k=64)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    pre_exchange = plan.split("Exchange", 1)[1]
    assert "HashAggregate" in pre_exchange, "no partial (map-side) dedup below the exchange"


def test_int8_topk_plan_is_shuffle_free(spark):
    # quantize + integer dot + top-k must be one scan, no Exchange
    from web3research_etl_spark.operators.similarity import int8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]]
    plan = int8_topk(emb, qv, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_positional_postings_and_phrase_search(spark):
    from web3research_etl_spark.operators.search import (
        phrase_search,
        positional_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox, the quick dog"),
            (2, "quick the brown"),
            (3, "...the QUICK brown!"),   # punctuation + case
            (4, "a a a"),                 # overlapping repeats
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )
    # positions count non-empty tokens: leading punctuation shifts nothing
    pp = {
        (r.doc_id, r.pos): r.token
        for r in positional_postings(docs.filter("doc_id = 3")).collect()
    }
    assert pp == {(3, 0): "the", (3, 1): "quick", (3, 2): "brown"}

    got = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_search(docs, "The Quick").collect()
    }
    assert got == {(1, 2), (3, 1)}  # doc 2 has both words, NOT adjacent

    three = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_search(docs, "the quick brown").collect()
    }
    assert three == {(1, 1), (3, 1)}

    # overlapping repeated-term phrase: "a a" occurs twice in "a a a"
    rep = {
        (r.doc_id, r.n_occurrences) for r in phrase_search(docs, "a a").collect()
    }
    assert rep == {(4, 2)}

    # single-term phrase = occurrence count
    single = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_search(docs, "quick").collect()
    }
    assert single == {(1, 2), (2, 1), (3, 1)}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="alnum"):
        phrase_search(docs, "...")


def test_phrase_search_prefilter_reaches_scan(spark, tmp_path):
    """The per-term contains() pre-filter must be pushed into the
    parquet scan so the positional explode runs on candidates only."""
    from web3research_etl_spark.operators.search import phrase_search

    p = f"{tmp_path}/docs"
    spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 7 == 0 else "delta epsilon")
         for i in range(200)],
        "doc_id long, text string",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    q = phrase_search(docs, "alpha beta")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "alpha" in plan
    assert {(r.doc_id, r.n_occurrences) for r in q.collect()} == {
        (i, 1) for i in range(0, 200, 7)
    }
