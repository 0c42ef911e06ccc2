"""Per-file key Bloom sidecars (the Iceberg puffin-stat analog).

Min/max file stats can't skip when generations' key ranges overlap —
the steady state of a CDC ingest where every epoch writes keys spread
over the whole space. Blooms answer per-file membership of the FULL
key tuple: probes must skip overlapping-range files that can't hold
the key, never skip a file that does (no false negatives), share
sidecars across snapshots, and die with their data file under
expiry/orphan GC."""

import os

import pytest
from pyspark.sql import functions as F

from web3research_etl_spark.lake.table import (
    _BLOOM_SUFFIX,
    _bloom_positions,
    LakeTable,
)

DDL = "url string, ts bigint, v double"


def _create(spark, path, n_buckets=1, key=None):
    return LakeTable.create(
        spark,
        path,
        spark.createDataFrame([], DDL).schema,
        key=key or ["url"],
        version_order=["ts"],
        n_buckets=n_buckets,
    )


def _append(t, spark, rows):
    t.append(spark.createDataFrame(rows, DDL))


def _overlapping_generations(t, spark, gens=3, per_gen=40):
    """Every generation spans the full key range (interleaved mod-gens
    keys) so leading-key [min,max] can never skip between them."""
    allk = []
    for g in range(gens):
        ks = [f"k{i:04d}" for i in range(per_gen * gens) if i % gens == g]
        _append(t, spark, [(k, 1, 0.5) for k in ks])
        allk.extend(ks)
    return allk


def test_bloom_skips_overlapping_generation_files(spark, tmp_table_dir):
    t = _create(spark, f"{tmp_table_dir}/t", n_buckets=1)
    _overlapping_generations(t, spark)
    snap = t.current_snapshot()
    n_files = sum(len(fg["paths"]) for fg in snap["file_groups"])
    assert n_files >= 3
    # k0004 sits inside every generation's [min,max] → ranges cannot skip
    pre = t._prune_groups_for_lookup(snap, {0: {"k0004"}})
    assert sum(len(fg["paths"]) for fg in pre) == n_files

    res = t.build_blooms()
    assert res["blooms_written"] == n_files
    # probe one key: bloom pruning must cut the file list (k0004 lives
    # in exactly one generation; FPR at 40 keys / 65536 bits ~ 0)
    h = (
        spark.range(1)
        .select(F.xxhash64(F.concat_ws("\x1f", F.lit("k0004"))).alias("h"))
        .collect()[0]["h"]
    )
    post = t._prune_groups_for_lookup(snap, {0: {"k0004"}}, {0: {h}})
    assert sum(len(fg["paths"]) for fg in post) == 1
    # and the end-to-end lookup is right
    assert [r["url"] for r in t.read_for_keys(["k0004"]).collect()] == ["k0004"]


def test_bloom_no_false_negatives_any_key(spark, tmp_table_dir):
    t = _create(spark, f"{tmp_table_dir}/t", n_buckets=2)
    keys = _overlapping_generations(t, spark, gens=3, per_gen=30)
    t.build_blooms()
    got = {r["url"] for r in t.read_for_keys(keys).collect()}
    assert got == set(keys)


def test_bloom_composite_key(spark, tmp_table_dir):
    t = _create(spark, f"{tmp_table_dir}/t", n_buckets=1, key=["url", "ts"])
    for g in range(3):
        _append(t, spark, [(f"u{i:03d}", g, 0.5) for i in range(30)])
    t.build_blooms()
    rows = t.read_for_keys([("u005", 1)]).collect()
    assert [(r["url"], r["ts"]) for r in rows] == [("u005", 1)]
    # absent tuple (valid url, wrong ts member) returns nothing
    assert t.read_for_keys([("u005", 9)]).count() == 0


def test_bloom_only_missing_is_incremental(spark, tmp_table_dir):
    t = _create(spark, f"{tmp_table_dir}/t", n_buckets=1)
    _append(t, spark, [(f"a{i}", 1, 0.5) for i in range(10)])
    assert t.build_blooms()["blooms_written"] >= 1
    _append(t, spark, [(f"b{i}", 1, 0.5) for i in range(10)])
    res = t.build_blooms()
    assert res["blooms_written"] >= 1  # only the new generation
    assert t.build_blooms() == {"skipped": True, "reason": "all files have blooms"}


def test_bloom_gc_lifecycle(spark, tmp_table_dir):
    t = _create(spark, f"{tmp_table_dir}/t", n_buckets=1)
    _append(t, spark, [(f"a{i}", 1, 0.5) for i in range(10)])
    t.append(spark.createDataFrame([(f"a{i}", 2, 0.9) for i in range(10)], DDL))
    t.build_blooms()

    def blooms():
        out = []
        for root, _d, files in os.walk(t.data_dir):
            out += [os.path.join(root, f) for f in files if f.endswith(_BLOOM_SUFFIX)]
        return out

    n0 = len(blooms())
    assert n0 >= 2
    # orphan GC must NOT eat live sidecars even with zero grace
    t.remove_orphan_files(grace_seconds=0.0)
    assert len(blooms()) == n0
    # compaction + expiry: doomed data files take their sidecars along
    t.rewrite_small_files()
    t.expire_snapshots(retain_last=1)
    survivors = blooms()
    live = {p for fg in t.current_snapshot()["file_groups"] for p in fg["paths"]}
    for b in survivors:
        rel = os.path.relpath(b, t.path)[: -len(_BLOOM_SUFFIX)]
        assert rel in live
    # lookups still correct post-GC (compacted files have no blooms yet
    # → conservative scan)
    assert t.read_for_keys(["a3"]).collect()[0]["v"] == 0.9


def test_bloom_positions_math_parity(spark):
    """The Python prober and the Spark builder must derive identical
    probe positions from one xxhash64 — including negative hashes."""
    m, k = 1 << 12, 7
    vals = ["x", "neg-hash-probe", "k0004\x1f3"]
    rows = (
        spark.range(1)
        .select(*[F.xxhash64(F.lit(v)).alias(f"h{i}") for i, v in enumerate(vals)])
        .collect()[0]
    )
    mask = 0x7FFFFFFFFFFFFFFF
    for i in range(len(vals)):
        h = rows[f"h{i}"]
        hu = h & mask
        h1, h2 = hu % m, ((hu >> 17) % m) | 1
        spark_pos = (
            spark.range(1)
            .select(
                F.array(
                    *[
                        F.pmod(
                            F.pmod(
                                F.xxhash64(F.lit(vals[i])).bitwiseAND(F.lit(mask)),
                                F.lit(m),
                            )
                            + F.lit(j)
                            * F.pmod(
                                F.shiftright(
                                    F.xxhash64(F.lit(vals[i])).bitwiseAND(F.lit(mask)),
                                    17,
                                ),
                                F.lit(m),
                            ).bitwiseOR(F.lit(1)),
                            F.lit(m),
                        )
                        for j in range(k)
                    ]
                ).alias("ps")
            )
            .collect()[0]["ps"]
        )
        assert list(spark_pos) == _bloom_positions(h, m, k)


def test_bloom_requires_key_and_byte_aligned_m(spark, tmp_table_dir):
    t = LakeTable.create(
        spark,
        f"{tmp_table_dir}/nokey",
        spark.createDataFrame([], DDL).schema,
        key=None,
        version_order=None,
    )
    with pytest.raises(ValueError):
        t.build_blooms()
    t2 = _create(spark, f"{tmp_table_dir}/t2")
    _append(t2, spark, [("a", 1, 0.5)])
    with pytest.raises(ValueError):
        t2.build_blooms(m_bits=1001)
