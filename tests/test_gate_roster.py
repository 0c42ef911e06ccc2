"""The driver's correctness gate runs the FIRST 50 entries of
``__spark_entry__.queries()`` — registry ORDER is therefore a managed
artifact, not incidental dict order. Round 3 learned this the hard way:
five insertions before position 50 silently evicted five
previously-certified queries from the gate window. These tests pin the
round-5 roster so any future insertion that would rotate a query out of
(or into) the window fails loudly and forces a deliberate COVERAGE.md
ledger update."""

import __spark_entry__ as entry_mod

GATE_WINDOW_SIZE = 50

# The round-5 certification window (COVERAGE.md §gate-status):
# 23 queries on code actively changed in r5 (the cdc_*/lake family —
# the commit path's footer-stats read moved executor-side; the search/
# sketch family after the term-dedupe + NULL-key fixes; and the 3
# operators WRITTEN in r5: indexed BM25/keyword + incremental postings)
# + the 25 queries rotated out in r4 (longest-unrecertified, last
# driver-green r1–r3) + 2 LakeTable-persisting operators riding the
# changed append path.
R5_WINDOW = {
    # actively-changed code paths (23)
    "cdc_lww_converged", "cdc_lww_agg", "cdc_merge_state", "cdc_mor_state",
    "fanout_merge_state", "cdc_time_travel", "cdc_changes_between",
    "cdc_feed", "cdc_ivm_event_type", "cdc_range_scan", "cdc_zorder_scan",
    "cdc_reconcile_status", "cdc_resume_offsets", "cdc_presence_probe",
    "cdc_point_lookup", "cdc_bloom_lookup",
    "doc_keyword_search", "doc_term_stats", "doc_bm25",
    "kmv_distinct_users",
    "doc_bm25_indexed", "doc_keyword_indexed", "doc_postings_incremental",
    # longest-unrecertified (25 — rotated out in r4, green r1–r3)
    "revenue_by_nation", "events_json_extract", "topk_per_user",
    "q1_pricing_summary", "rollup_sales", "cube_sales",
    "grouping_sets_sales", "event_value_percentiles",
    "distinct_users_per_type", "url_canonical_domains",
    "events_running_30min", "customers_without_orders",
    "parts_by_brand_broadcast", "doc_token_counts", "doc_quality",
    "doc_lang_id", "doc_fingerprint", "events_windowed_rates",
    "clickers_minus_buyers", "media_metadata", "events_sessionize",
    "events_asof_join", "exact_dedup", "simhash", "cdc_tombstones",
    # LakeTable-persisting operators on the changed append path (2)
    "incremental_dedup", "dup_clusters",
}

# The registry tail (positions 51+): all driver-green in ROUND 4 on
# code untouched in round 5, all still oracle-checked locally every
# round (tools/oracle_check.py). No query in this set has gone more
# than one round without driver certification.
ROTATED_OUT = {
    "ngram_jaccard", "minhash_signatures", "minhash_lsh_candidates",
    "ngram_jaccard_lsh", "embedding_near_dups", "ann_brute_topk",
    "ann_ivf_topk", "ann_ivf_kmeans_topk", "ann_lsh_topk",
    "ann_int8_topk", "media_resize", "frame_sample", "dispatch_fanout",
    "kafka_wire_roundtrip", "map_type_rollup", "hex_roundtrip",
    "outlinks_explode", "doc_b58_fingerprint", "doc_b58_plain",
    "doc_sample_frac", "doc_sample_stratified", "corpus_curation",
    "doc_shard_assign", "doc_pack_chunks", "doc_segment_dedup",
    "doc_decontaminate", "doc_repetition_stats", "doc_pii_scrub",
}

# Registered AFTER the r5 gate window froze (rollback/WAP landed once
# the 50-seat roster above was already certified-in-flight): seated in
# the tail so the pinned window stands; locally oracle-checked; the
# natural r6-window candidates.
TAIL_NEW_R5 = {"cdc_rollback_replay", "cdc_wap_publish", "doc_phrase_search"}


def test_gate_window_is_exactly_the_declared_roster():
    names = list(entry_mod.queries().keys())
    window = set(names[:GATE_WINDOW_SIZE])
    assert window == R5_WINDOW, (
        "gate window drifted — a registry edit rotated queries in/out of "
        "the driver's first-50 certification window; update the roster "
        "DELIBERATELY (this test + COVERAGE.md §gate-status)",
        sorted(window - R5_WINDOW),
        sorted(R5_WINDOW - window),
    )
    assert set(names[GATE_WINDOW_SIZE:]) == ROTATED_OUT | TAIL_NEW_R5


def test_every_registered_query_has_an_oracle_or_a_documented_gap():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    # the ONE registered rows-only query: Base58Check's checksum is
    # double-sha256 over raw bytes, which DuckDB's VARCHAR-only sha256()
    # cannot replicate (see the registration-site comment)
    assert missing == ["doc_b58_fingerprint"]
    orphans = [n for n in oracles if n not in qs]
    assert orphans == []
