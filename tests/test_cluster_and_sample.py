"""Connected-components dup clustering + deterministic sampling."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from web3research_etl_spark.operators.cluster import connected_components, dup_clusters
from web3research_etl_spark.operators.sample import hash_sample, stratified_topk


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def test_cc_basic_components(spark):
    # two components: {1,2,3,4} (a path) and {10,11}; 99 isolated (absent)
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cc_long_chain_converges_via_pointer_jumping(spark):
    # a 64-node path — diameter 63; pointer jumping must converge in
    # far fewer rounds than the diameter (max_rounds=12 < 63 proves the
    # O(log d) behavior, not just termination)
    n = 64
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    got = connected_components(pairs, max_rounds=12)
    assert got.filter(F.col("component") != 0).count() == 0
    assert got.count() == n


def test_cc_empty_pairs(spark):
    got = connected_components(_pairs(spark, []))
    assert got.count() == 0


def test_dup_clusters_assigns_singletons_and_canonicals(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id bigint")
    pairs = _pairs(spark, [(1, 3), (3, 5)])
    rows = {r["doc_id"]: r for r in dup_clusters(docs, pairs).collect()}
    assert rows[1]["cluster_id"] == 1 and rows[3]["cluster_id"] == 1
    assert rows[5]["cluster_id"] == 1
    assert rows[0]["cluster_id"] == 0  # singleton clusters with itself
    canon = {d for d, r in rows.items() if r["is_canonical"] == 1}
    assert canon == {0, 1, 2, 4}


def test_hash_sample_deterministic_and_partitioning_proof(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    s1 = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.3).select("doc_id").collect())
    # same rows regardless of partitioning — the property df.sample lacks
    s2 = set(
        r["doc_id"]
        for r in hash_sample(docs.repartition(17), "doc_id", 0.3)
        .select("doc_id")
        .collect()
    )
    assert s1 == s2 and len(s1) > 0
    # nested property: a tighter fraction with the same salt is a subset
    s3 = set(r["doc_id"] for r in hash_sample(docs, "doc_id", 0.1).select("doc_id").collect())
    assert s3 <= s1
    # roughly uniform (binomial tolerance at n=50 docs is wide)
    n = docs.count()
    assert 0.05 * n <= len(s1) <= 0.6 * n


def test_hash_sample_fraction_bounds(spark):
    docs = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_sample(docs, "doc_id", 1.5)
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    assert hash_sample(docs, "doc_id", 1.0).count() == 5


def test_stratified_topk_exact_k_per_stratum(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    k = 3
    out = stratified_topk(docs, "lang", "doc_id", k=k)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(k, totals[lang])
    # deterministic under repartitioning
    a = sorted(map(tuple, out.select("lang", "doc_id").collect()))
    b = sorted(
        map(
            tuple,
            stratified_topk(docs.repartition(13), "lang", "doc_id", k=k)
            .select("lang", "doc_id")
            .collect(),
        )
    )
    assert a == b


def test_cc_property_random_graphs_vs_union_find(spark):
    """Property: the distributed CC fixpoint equals a driver-side
    union-find on random graphs (the CC analog of the replay-convergence
    property test)."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(2, 40)
        m = rng.randint(0, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # expected: min node id per component, only for nodes with edges
        touched = {a for e in edges for a in e}
        expected = {}
        for v in touched:
            r = find(v)
            expected.setdefault(r, []).append(v)
        want = {}
        for comp in expected.values():
            lo = min(comp)
            for v in comp:
                want[v] = lo
        got = {
            r["node"]: r["component"]
            for r in connected_components(_pairs(spark, edges)).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_dup_clusters_canonical_by_quality(spark):
    """Keeper policy by a quality column: the cluster's best row wins,
    ties broken by id; singletons are their own keeper."""
    docs = spark.createDataFrame(
        [(0, 10), (1, 5), (3, 9), (5, 9), (2, 1)], "doc_id bigint, q bigint"
    )
    pairs = _pairs(spark, [(1, 3), (3, 5)])
    rows = {
        r["doc_id"]: r
        for r in dup_clusters(docs, pairs, canonical_by="q").collect()
    }
    # cluster {1,3,5}: q = 5,9,9 -> keeper is 3 (q tie 3 vs 5, lower id)
    assert [rows[i]["cluster_id"] for i in (1, 3, 5)] == [1, 1, 1]
    assert [rows[i]["is_canonical"] for i in (1, 3, 5)] == [0, 1, 0]
    assert rows[0]["is_canonical"] == 1 and rows[2]["is_canonical"] == 1


def test_cc_raises_on_round_cap_instead_of_wrong_labels(spark):
    # a path graph cannot converge in one round; the cap must surface as
    # an error, never as silently-wrong cluster ids (ADVICE r02)
    pairs = _pairs(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1)


def test_cc_durable_checkpoint_switch(spark, tmp_path, monkeypatch):
    """W3R_CHECKPOINT_DIR flips every materialize() to a reliable
    checkpoint(): the CC rounds must still produce identical components
    AND leave rdd checkpoint files under the dir (proof the durable path
    actually ran — on a cluster that is what survives executor loss)."""
    import os

    ckpt = str(tmp_path / "durable_ckpt")
    monkeypatch.setenv("W3R_CHECKPOINT_DIR", ckpt)
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    found = [
        os.path.join(root, f)
        for root, _d, files in os.walk(ckpt)
        for f in files
    ]
    assert found, "no checkpoint files written under W3R_CHECKPOINT_DIR"


def test_lsh_jaccard_under_durable_checkpoint(spark, tmp_path, monkeypatch):
    """The LSH dedup path's materialize() sites also honor the switch —
    same pairs with and without the durable dir."""
    from web3research_etl_spark.operators.dedup import ngram_jaccard_via_lsh

    docs = spark.createDataFrame(
        [(i, ("the quick brown fox jumps over the lazy dog " * 4) + str(i % 3))
         for i in range(30)],
        "doc_id long, text string",
    )
    base = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_via_lsh(docs, threshold=0.3).collect()
    }
    monkeypatch.setenv("W3R_CHECKPOINT_DIR", str(tmp_path / "ck2"))
    dur = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in ngram_jaccard_via_lsh(docs, threshold=0.3).collect()
    }
    assert dur == base and len(base) > 0
