"""CLI end-to-end (the reference's init/sync/check surface) and
physical-plan quality gates (the 100-TB checklist: pushdown, pruning,
no payload sorts, broadcast where intended)."""

import json
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = "/root/repo"


def _run_cli(*args: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-m", "web3research_etl_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=420,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "8", "PYTHONPATH": REPO},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


@pytest.mark.slow
def test_cli_init_then_check(tmp_path):
    out = _run_cli("gen", "--out", f"{tmp_path}/ch", "--events", "3000")
    assert json.loads(out.strip().splitlines()[-1])["written"] >= 3000

    out = _run_cli(
        "init", "--source", f"{tmp_path}/ch", "--table", f"{tmp_path}/pages",
        "--ledger", f"{tmp_path}/ledger",
    )
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["rows"] > 0 and stats["epochs"]

    out = _run_cli("check", "--source", f"{tmp_path}/ch", "--table", f"{tmp_path}/pages")
    rec = json.loads(out.strip().splitlines()[0])["reconcile"]
    assert set(rec) == {"ok"}


# ---------------------------------------------------------------------------
# plan-quality gates
# ---------------------------------------------------------------------------


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lww_plan_has_no_payload_sort(spark):
    """The dedup path must never SortAggregate/sort the html payload."""
    from web3research_etl_spark.changelog import generate_changelog
    from web3research_etl_spark.operators.lww import lww_dedup_agg

    ch = generate_changelog(spark, 1000).select(
        "op", "url", "warc_ts", "event_seq", "html", "lang"
    )
    plan = _physical_plan(lww_dedup_agg(ch, ["url"], ["warc_ts", "event_seq"]))
    # load-bearing properties: the winner set joins back as a BROADCAST
    # left-semi (payload side never shuffled/sorted for the join), and
    # no Exchange ships the html column except the final tiny dropDup
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the one sort-free payload path: html must not appear in any Sort node
    for seg in plan.split("Sort [")[1:]:
        sort_keys = seg.split("]", 1)[0]
        assert "html" not in sort_keys


def test_lake_read_filter_pushdown(spark, tmp_table_dir):
    """A key-equality filter on a lake read must reach the parquet scan
    (PushedFilters), not run post-scan only."""
    from pyspark.sql import types as T

    from web3research_etl_spark.lake.table import LakeTable

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("event_seq", T.LongType(), False),
        ]
    )
    t = LakeTable.create(
        spark, f"{tmp_table_dir}/t", schema, key=["url"],
        version_order=["warc_ts", "event_seq"], n_buckets=4,
    )
    rows = spark.createDataFrame(
        [("I", f"u{i}", i) for i in range(100)], "op string, url string, event_seq long"
    ).select("op", "url", F.timestamp_seconds(F.lit(1) + F.col("event_seq")).alias("warc_ts"), "event_seq")
    t.merge_changelog(rows, epoch_id=1)
    plan = _physical_plan(t.read().filter(F.col("url") == "u5"))
    assert "PushedFilters: [" in plan and "u5" in plan


def test_small_dim_join_is_broadcast(spark):
    """revenue_by_nation must broadcast the dimension tables."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    df = entry.queries()["revenue_by_nation"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_scan_prunes_columns(spark):
    """Token counting must read only the needed columns from parquet."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    df = entry.queries()["doc_token_counts"](spark, "/root/testdata/sf0.001")
    plan = _physical_plan(df)
    scan = plan[plan.index("FileScan") :]
    head = scan[:400]
    assert "text" in head and "lang" not in head and "source" not in head