"""web3research_etl_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Capabilities re-expressed Spark-first from njublockchain/web3research-etl
(reference at /root/reference, a Rust chain-tail → ClickHouse sync CLI):

- changelog tail → lake-table upsert with last-writer-wins dedup
  (reference: ReplacingMergeTree ORDER BY key, src/ch_eth/init.rs:169-170)
- reorg healing / reconciliation (reference: src/ch_eth/sync.rs:100-115,157-327)
- resumable bounded backfill + unbounded streaming tail
  (reference: src/main.rs:26-75)
- idempotent at-least-once apply upgraded to exactly-once via epoch
  commit markers in snapshot metadata (reference defect class:
  src/ch_eth/init.rs:435-448 re-inserts unconditionally)
- schema evolution through an explicit registry (reference has none —
  SURVEY.md §1.4)

Architecture is idiomatic PySpark: DataFrame/SQL plans optimized by
Catalyst, Structured Streaming micro-batches, vectorized pandas/Arrow
UDFs for the single custom-compute slot (HTML→text extraction), and a
snapshot-based bucketed parquet lake table standing in for Iceberg
(same commit/merge semantics; swaps for `MERGE INTO` when an Iceberg
catalog is on the classpath).
"""

__version__ = "0.1.0"
