"""Training-data operators: dedup family, similarity search, multimodal
plumbing — recall/correctness properties beyond the DuckDB oracles."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup_counts(spark, docs):
    from web3research_etl_spark.operators.dedup import exact_dedup

    dup = docs.union(docs.limit(10))  # inject 10 exact duplicates
    out = exact_dedup(dup)
    assert out.count() == docs.count()
    assert out.filter(F.col("n_copies") == 2).count() == 10


def test_minhash_estimates_jaccard(spark, docs):
    """MinHash est_jaccard should correlate with exact Jaccard on
    near-duplicate pairs: build synthetic near-dups by doubling text."""
    from web3research_etl_spark.operators.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    base = docs.limit(30).select("doc_id", "text")
    # copy with small suffix change → high (but <1) jaccard, id offset 10k
    near = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tweak")).alias("text"),
    )
    corpus = base.unionByName(near)
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    }
    est = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_candidates(corpus, num_hashes=16, bands=8).collect()
    }
    # every original/near pair must be found by LSH and estimated high
    expected_pairs = {(i, i + 10_000) for i in range(30) if (i, i + 10_000) in exact}
    assert expected_pairs, "fixture produced no high-jaccard pairs"
    found = expected_pairs & set(est)
    assert len(found) >= len(expected_pairs) * 0.9  # ≥90% recall
    for p in found:
        assert est[p] >= 0.5


def test_simhash_near_dups_find_planted(spark, docs):
    from web3research_etl_spark.operators.dedup import simhash_near_dups

    base = docs.limit(20).select("doc_id", "text")
    near = base.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" x")).alias("text"),
    )
    out = simhash_near_dups(base.unionByName(near), max_hamming=3)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    planted = {(i, i + 10_000) for i in range(20)}
    assert len(pairs & planted) >= 15  # simhash recall on near-identical docs


def test_lsh_topk_recall_vs_brute(spark, emb):
    from web3research_etl_spark.operators.similarity import brute_force_topk, lsh_topk

    qv = list(emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"])
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in lsh_topk(emb, qv, dim=64, k=10, n_planes=8, max_hamming=3).collect()
    ]
    # ANN top-10 must contain most of the exact top-10 (recall ≥ 0.6 at
    # these settings on 500 vectors; tightness isn't the point — the
    # bucketing plumbing is)
    assert len(set(exact) & set(approx)) >= 6
    assert exact[0] in approx  # the true nearest must survive


def test_multimodal_feature_extraction(spark, docs):
    from web3research_etl_spark.operators.multimodal import (
        attach_media,
        decode_image_stub,
        extract_image_features,
    )

    media = attach_media(docs.limit(50))
    feats = extract_image_features(media, deterministic_fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    # spot-check against the scalar stub
    one = media.limit(1).collect()[0]
    expect = decode_image_stub(bytes(one["media"]), True)
    got = {r["doc_id"]: r for r in rows}[one["doc_id"]]
    assert got["width"] == expect["width"] and got["height"] == expect["height"]


def test_multimodal_stub_raises_without_fake(spark, docs):
    from web3research_etl_spark.operators.multimodal import decode_image_stub

    with pytest.raises(NotImplementedError):
        decode_image_stub(b"bytes", deterministic_fake=False)


def test_ivf_topk_recall_and_prune(spark, emb):
    from web3research_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_centroids,
        ivf_topk,
    )

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 1).collect()[0]["embedding"]]
    exact = [r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()]
    approx = [
        r["vec_id"] for r in ivf_topk(emb, qv, n_centroids=16, n_probe=6, k=10).collect()
    ]
    assert len(set(exact) & set(approx)) >= 5  # probe-6/16 recall on 500 vecs
    assert exact[0] in approx  # query's own cell is always probed

    # assignment is total, deterministic, and actually prunes
    cents = [
        (r["centroid_id"], [float(x) for x in r["centroid"]])
        for r in ivf_centroids(emb, 16).collect()
    ]
    assigned = ivf_assign(emb, cents)
    n = emb.count()
    assert assigned.filter(F.col("cell").isNull()).count() == 0
    assert assigned.count() == n
    cells = assigned.groupBy("cell").count()
    assert cells.count() > 1  # vectors actually spread across cells
    probed_rows = assigned.filter(F.col("cell").isin([c for c, _ in cents[:6]])).count()
    assert probed_rows < n  # the prune removes work


def test_resize_images_plumbing(spark, docs):
    from web3research_etl_spark.operators.multimodal import attach_media, resize_images

    media = attach_media(docs.limit(30))
    out = resize_images(media, width=8, height=6).collect()
    assert len(out) == 30
    for r in out:
        assert r["width"] == 8 and r["height"] == 6
        assert r["n_bytes_out"] == len(r["resized"]) <= 8 * 6 * 3

    with pytest.raises(Exception):  # stub surfaces NotImplementedError from workers
        resize_images(media, 8, 6, deterministic_fake=False).collect()


def test_canonical_url_cases_and_idempotency(spark):
    from web3research_etl_spark.operators.text import canonical_url, url_domain

    cases = [
        ("HTTPS://A.Example.COM:443/Path#x", "https://a.example.com/Path"),
        ("http://b.example.com:80/", "http://b.example.com/"),
        ("http://b.example.com:80", "http://b.example.com"),
        ("https://c.example.com:8443/x", "https://c.example.com:8443/x"),
        ("ftp://Mixed.Case/KeepPath", "ftp://mixed.case/KeepPath"),
        ("no-scheme/path#frag", "no-scheme/path"),
        ("https://d.example.com/p#a#b", "https://d.example.com/p"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["c"] for r in df.select(canonical_url(F.col("u")).alias("c")).collect()]
    assert got == [want for _, want in cases]
    # idempotent: canonical(canonical(u)) == canonical(u)
    twice = [
        r["c2"]
        for r in df.select(
            canonical_url(canonical_url(F.col("u"))).alias("c2")
        ).collect()
    ]
    assert twice == got
    doms = [
        r["d"]
        for r in df.select(
            url_domain(canonical_url(F.col("u"))).alias("d")
        ).collect()
    ]
    assert doms[0] == "a.example.com" and doms[5] == ""


# ---------------------------------------------------------------------------
# blocked exact embedding near-dup (VERDICT r01: no cartesian at scale)
# ---------------------------------------------------------------------------


def test_blocked_near_dups_match_brute(spark, emb):
    """The blocked all-pairs path must return EXACTLY the brute-force
    result (same pairs, same rounded cosines) — it is a physical
    re-plan, not an approximation."""
    from web3research_etl_spark.operators.dedup import (
        embedding_near_dups,
        embedding_near_dups_brute,
    )

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups(emb, threshold=0.2, n_blocks=8).collect()
    }
    want = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dups_brute(emb, threshold=0.2).collect()
    }
    assert got == want and len(want) > 0


def test_blocked_near_dups_plan_has_no_nested_loop(spark, emb):
    """Scale gate: the blocked plan must contain no
    BroadcastNestedLoopJoin/CartesianProduct — the quadratic work must
    arrive as equi-join tasks on the block-pair key."""
    from web3research_etl_spark.operators.dedup import embedding_near_dups

    plan = (
        embedding_near_dups(emb, threshold=0.2, n_blocks=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_lsh_near_dups_full_recall_on_planted(spark):
    """High-threshold LSH near-dup: plant clusters of near-identical
    vectors among noise; the banded-LSH path must recover every
    brute-force pair at cosine >= 0.99 (expected misses ~5e-5/pair)."""
    import math

    from web3research_etl_spark.operators.dedup import (
        embedding_near_dups_brute,
        embedding_near_dups_lsh,
    )

    dim = 16
    rows = []
    # 10 clusters x 4 members: base vector + tiny deterministic tweak
    for c in range(10):
        base = [math.sin(0.7 * c * (d + 1)) + 1.5 for d in range(dim)]
        for m in range(4):
            vec = [v * (1.0 + 0.0005 * m * ((d % 3) - 1)) for d, v in enumerate(base)]
            rows.append((c * 4 + m, [float(x) for x in vec]))
    # 60 noise vectors, deterministic pseudo-random directions
    for i in range(60):
        vec = [math.sin(1.3 * (i + 41) * (d + 7)) for d in range(dim)]
        rows.append((1000 + i, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_brute(df, threshold=0.99).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dups_lsh(
            df, dim=dim, threshold=0.99, n_bands=8, planes_per_band=8
        ).collect()
    }
    assert want  # the plant worked: clusters produce pairs
    assert got == want  # full recall + no false positives after re-rank


def test_ivf_assign_array_matches_literal(spark, emb):
    """The array-fold assign must agree with the literal-expression
    assign on every row (same codebook), and must survive a 256-entry
    codebook without codegen failure."""
    from web3research_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_array,
        ivf_centroids,
    )

    cents = [
        (r["centroid_id"], [float(x) for x in r["centroid"]])
        for r in ivf_centroids(emb, 16).collect()
    ]
    lit = {r["vec_id"]: r["cell"] for r in ivf_assign(emb, cents).collect()}
    arr = {r["vec_id"]: r["cell"] for r in ivf_assign_array(emb, cents).collect()}
    assert lit == arr

    # large codebook: 256 centroids (first 256 vectors) — literal path
    # would push codegen past JIT limits; array path must just work
    big = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.filter(F.col("vec_id") < 256).collect()
    ]
    n = ivf_assign_array(emb, big).filter(F.col("cell") >= 0).count()
    assert n == emb.count()


def test_kmeans_centroids_improve_quantization(spark, emb):
    """k-means codebook: mean best-cosine over the corpus must not be
    worse than the first-N codebook it was initialized from."""
    from web3research_etl_spark.operators.dedup import cosine_expr
    from web3research_etl_spark.operators.similarity import (
        ivf_assign_array,
        ivf_centroids,
        kmeans_centroids,
    )

    first_n = [
        (r["centroid_id"], [float(x) for x in r["centroid"]])
        for r in ivf_centroids(emb, 8).collect()
    ]
    trained = kmeans_centroids(emb, dim=64, n_centroids=8, n_iters=3)

    def mean_best(cents):
        best = None
        for _, vec in cents:
            c = F.array(*[F.lit(float(x)) for x in vec])
            s = F.nanvl(cosine_expr(F.col("embedding"), c), F.lit(-2.0))
            best = s if best is None else F.greatest(best, s)
        return emb.select(F.avg(best).alias("m")).collect()[0]["m"]

    assert mean_best(trained) >= mean_best(first_n) - 1e-9


def test_zero_norm_embedding_handled(spark):
    """Degenerate zero vectors must not hijack top-k or IVF assignment
    (ADVICE r01: NaN ranks above every real score in Spark)."""
    from web3research_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
    )

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    top = [r["vec_id"] for r in brute_force_topk(df, [1.0, 0.0], k=2).collect()]
    assert 2 not in top and top[0] == 0

    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    cells = {r["vec_id"]: r["cell"] for r in ivf_assign(df, cents).collect()}
    assert cells[2] == 0  # deterministic lowest-id fallback, not NaN roulette

    # query path survives a zero-norm row in the corpus
    got = [r["vec_id"] for r in ivf_topk(df, [1.0, 0.0], n_centroids=2, n_probe=2, k=3).collect()]
    assert got[0] == 0 and 2 == got[-1] or 2 not in got


# ---------------------------------------------------------------------------
# LSH-routed exact Jaccard (VERDICT r01 perf-weak: ngram_jaccard at 100x)
# ---------------------------------------------------------------------------


def test_jaccard_via_lsh_agrees_with_exact(spark, docs):
    """ngram_jaccard_via_lsh must be a SUBSET of the exact operator
    (LSH can only miss pairs, never invent them) with bit-identical
    jaccard on every shared pair, and it must recover a healthy share
    of the exact pairs at this band setting (deterministic — md5
    banding has no RNG)."""
    from web3research_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_jaccard_via_lsh,
    )

    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, k=12, threshold=0.2, max_bucket_size=10**6
        ).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_via_lsh(
            docs, k=12, threshold=0.2, num_hashes=8, bands=4
        ).collect()
    }
    assert len(exact) > 0
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]
    # 8 hashes / 4 bands catches most >=0.2 pairs on this fixture
    assert len(lsh) >= len(exact) * 0.5


def test_jaccard_via_lsh_plan_is_equi_join_only(spark, docs):
    from web3research_etl_spark.operators.dedup import ngram_jaccard_via_lsh

    plan = (
        ngram_jaccard_via_lsh(docs, k=12, threshold=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_kmeans_recall_at_least_first_n(spark, emb):
    """The trained codebook (VERDICT r02 next #7) must not LOSE recall
    vs the first-N codebook at the gated query's settings (8 centroids,
    3 probes, k=10): Lloyd's iterations tighten cells around the data,
    so the probed fraction covers at least as much of the true top-k."""
    from web3research_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        ivf_topk_trained,
        kmeans_centroids,
    )

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    exact = {r["vec_id"] for r in brute_force_topk(emb, qv, k=10).collect()}
    first_n = {
        r["vec_id"]
        for r in ivf_topk(emb, qv, n_centroids=8, n_probe=3, k=10).collect()
    }
    cents = kmeans_centroids(emb, dim=64, n_centroids=8, n_iters=2, round_to=6)
    trained = {
        r["vec_id"]
        for r in ivf_topk_trained(emb, qv, cents, n_probe=3, k=10).collect()
    }
    assert len(exact & trained) >= len(exact & first_n)
    assert 0 in trained  # the query vector's own cell is always probed


def test_pack_sequences_invariants(spark, docs):
    """Stream packing conserves every doc and token, keeps chunk ids
    dense per shard, and fills every non-terminal chunk past its target
    (a doc STARTS in a chunk only when the previous chunks are full)."""
    from web3research_etl_spark.operators.text import pack_sequences, token_count

    target = 256
    out = pack_sequences(docs, target_tokens=target).collect()
    n_docs = docs.count()
    n_tokens = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["sum_tokens"] for r in out) == n_tokens
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["chunk_id"])
        ids = [r["chunk_id"] for r in rows]
        assert ids[0] == 0
        # a chunk with no STARTING doc can be skipped only if a long doc
        # straddles it entirely; token budget then still accounts for it
        for prev, cur in zip(rows, rows[1:]):
            assert cur["chunk_id"] > prev["chunk_id"]
            assert prev["first_doc"] <= prev["last_doc"] < cur["first_doc"]


def test_pack_sequences_single_shuffle(spark, docs):
    from web3research_etl_spark.operators.text import pack_sequences

    plan = pack_sequences(docs, 512)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_incremental_dedup_is_cross_side_slice_of_global(spark, docs):
    """dedup_against_corpus == the global LSH dedup restricted to
    (new, corpus) pairs: identical pair set and bit-identical jaccard.
    This is the contract that lets a standing corpus be deduped
    incrementally (per-batch cost O(batch), not O(corpus^2)) without
    changing WHAT is considered a duplicate."""
    from web3research_etl_spark.operators.dedup import (
        dedup_against_corpus,
        minhash_band_buckets,
        ngram_jaccard_via_lsh,
    )

    new = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
    inc = {
        (r["new_doc"], r["corpus_doc"]): r["jaccard"]
        for r in dedup_against_corpus(
            new, corpus, k=12, threshold=0.2, num_hashes=8, bands=4
        ).collect()
    }
    global_pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_via_lsh(
            docs, k=12, threshold=0.2, num_hashes=8, bands=4
        ).collect()
    }
    cross = {
        (a, b) if a % 5 == 0 else (b, a): j
        for (a, b), j in global_pairs.items()
        if (a % 5 == 0) != (b % 5 == 0)
    }
    assert len(inc) > 0
    assert inc == cross

    # persisted-index path: a prebuilt corpus index gives the same answer
    idx = minhash_band_buckets(corpus, k=12, num_hashes=8, bands=4)
    inc_idx = {
        (r["new_doc"], r["corpus_doc"]): r["jaccard"]
        for r in dedup_against_corpus(
            new, corpus, k=12, threshold=0.2, num_hashes=8, bands=4,
            corpus_index=idx,
        ).collect()
    }
    assert inc_idx == inc


def test_incremental_dedup_with_persisted_laketable_index(spark, docs, tmp_table_dir):
    """The standing-ingest loop from dedup_against_corpus's docstring,
    end-to-end with the band index PERSISTED as a LakeTable keyed by
    (bucket, doc_id): each crawl's bands are appended to the index
    table; the next crawl dedups against the index READ BACK FROM DISK
    (corpus docs never re-banded) and must equal from-scratch banding of
    the same corpus — over TWO update cycles, so an index built
    incrementally equals one built in one shot (the determinism
    minhash_band_buckets promises)."""
    import pyspark.sql.types as T

    from web3research_etl_spark.lake.table import LakeTable
    from web3research_etl_spark.operators.dedup import (
        dedup_against_corpus,
        minhash_band_buckets,
    )

    kw = dict(k=12, num_hashes=8, bands=4)
    crawls = [docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)]
    idx = LakeTable.create(
        spark,
        f"{tmp_table_dir}/band_index",
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("bucket", T.StringType()),
            ]
        ),
        key=["bucket", "doc_id"],
        n_buckets=8,
    )
    idx.append(minhash_band_buckets(crawls[0], **kw), epoch_id=0)

    corpus = crawls[0]
    total = 0
    for n in (1, 2):
        stored = LakeTable.load(spark, f"{tmp_table_dir}/band_index").read()
        got = {
            (r["new_doc"], r["corpus_doc"]): r["jaccard"]
            for r in dedup_against_corpus(
                crawls[n], corpus, threshold=0.2, corpus_index=stored, **kw
            ).collect()
        }
        want = {
            (r["new_doc"], r["corpus_doc"]): r["jaccard"]
            for r in dedup_against_corpus(
                crawls[n], corpus, threshold=0.2, **kw
            ).collect()
        }
        assert got == want
        total += len(got)
        idx.append(minhash_band_buckets(crawls[n], **kw), epoch_id=n)
        corpus = corpus.unionByName(crawls[n])
    assert total > 0  # the loop actually found cross-crawl near-dups
    # two appends + create → 3 snapshots; the index holds every band row
    assert idx.read().count() == minhash_band_buckets(docs, **kw).count()


def test_incremental_dedup_plan_is_equi_join_only(spark, docs):
    from web3research_etl_spark.operators.dedup import dedup_against_corpus

    new = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) == 0)
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(5)) != 0)
    plan = (
        dedup_against_corpus(new, corpus, k=12, threshold=0.2,
                             num_hashes=8, bands=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_shard_assign_is_deterministic_permutation(spark, docs):
    """shard_assign = one global pseudorandom permutation chunked into
    shards: every doc exactly once, pos dense 1..|shard| within each
    shard, assignment independent of input partitioning, reshuffled by
    salt but reproduced exactly by the same salt."""
    from web3research_etl_spark.operators.sample import shard_assign

    out = shard_assign(docs, "doc_id", 4, salt="s1").collect()
    n = docs.count()
    assert len(out) == n and len({r["doc_id"] for r in out}) == n
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), s
    # no empty/degenerate shard on this fixture (hash balance)
    assert len(by_shard) == 4

    key = lambda rows: sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)  # noqa: E731
    again = shard_assign(docs.repartition(17), "doc_id", 4, salt="s1").collect()
    assert key(again) == key(out)
    other = shard_assign(docs, "doc_id", 4, salt="s2").collect()
    assert key(other) != key(out)

    # payload columns ride through (the export writer consumes them in
    # shard order — no join-back needed)
    assert set(shard_assign(docs, "doc_id", 4).columns) == set(
        docs.columns + ["shard", "pos"]
    )


def test_shard_assign_check_unique_raises_on_dup_keys(spark, docs):
    from web3research_etl_spark.operators.sample import shard_assign

    dup = docs.unionByName(docs.limit(1))
    import pytest

    with pytest.raises(ValueError, match="not unique"):
        shard_assign(dup, "doc_id", 4, check_unique=True)
    # clean input passes the check and returns the same assignment
    ok = shard_assign(docs, "doc_id", 4, check_unique=True)
    assert ok.count() == docs.count()
