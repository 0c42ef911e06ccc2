"""LWW dedup: window vs agg implementations agree, and both match a
DuckDB row_number oracle (ReplacingMergeTree keep-last semantics,
/root/reference/src/ch_eth/init.rs:169-170)."""

import duckdb

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.operators.lww import lww_dedup_agg, lww_dedup_window


def _collect_sorted(df, cols=("url", "event_seq")):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_window_and_agg_agree(spark):
    ch = generate_changelog(spark, 2000).select("url", "warc_ts", "event_seq", "op")
    a = lww_dedup_window(ch, ["url"], ["warc_ts", "event_seq"])
    b = lww_dedup_agg(ch, ["url"], ["warc_ts", "event_seq"])
    assert _collect_sorted(a) == _collect_sorted(b)


def test_agg_matches_duckdb_oracle(spark, tmp_table_dir):
    path = f"{tmp_table_dir}/ch.parquet"
    generate_changelog(spark, 2000).write.mode("overwrite").parquet(path)
    ch = spark.read.parquet(path)
    got = _collect_sorted(lww_dedup_agg(ch, ["url"], ["warc_ts", "event_seq"]))
    expected = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT url, event_seq FROM (
              SELECT url, event_seq,
                     row_number() OVER (PARTITION BY url
                                        ORDER BY warc_ts DESC, event_seq DESC) AS rn
              FROM parquet_scan('{path}/*.parquet')
            ) WHERE rn = 1
            """
        ).fetchall()
    )
    assert got == expected


def test_duplicated_events_collapse(spark):
    # generator re-emits ~5% duplicates with identical payloads; after LWW
    # every (url) appears exactly once
    ch = generate_changelog(spark, 3000, dup_fraction=0.2)
    out = lww_dedup_agg(ch, ["url"], ["warc_ts", "event_seq"])
    n_keys = out.select("url").distinct().count()
    assert out.count() == n_keys
