"""Auto-salt skew detection (operators/skew.py): fires on hot-domain
batches, stays off on balanced ones, and never changes the merged
state (axis A: salting alters the shuffle only)."""

from pyspark.sql import functions as F

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.operators.apply import apply_changelog_batch
from web3research_etl_spark.operators.skew import choose_salt_partitions
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER


def _table(spark, d, name):
    return LakeTable.create(
        spark,
        f"{d}/{name}",
        PAGES_SCHEMA,
        key=PAGES_KEY,
        version_order=PAGES_VERSION_ORDER,
        n_buckets=8,
    )


def test_auto_salt_fires_only_on_skew(spark):
    # one domain, 3 pages → nearly all rows in ≤3 of 8 buckets
    hot = generate_changelog(spark, 2000, n_domains=1, pages_per_domain=3)
    # many domains × many pages → near-uniform bucket histogram
    flat = generate_changelog(spark, 2000, n_domains=50, pages_per_domain=500)
    assert choose_salt_partitions(hot, ["url"], 8) is not None
    assert choose_salt_partitions(hot, ["url"], 8) > 8
    assert choose_salt_partitions(flat, ["url"], 8) is None


def test_auto_salt_apply_same_state(spark, tmp_table_dir):
    ch = generate_changelog(spark, 2000, n_domains=1, pages_per_domain=40)
    t_plain = _table(spark, tmp_table_dir, "plain")
    t_auto = _table(spark, tmp_table_dir, "auto")
    apply_changelog_batch(t_plain, ch, epoch_id=0)
    apply_changelog_batch(t_auto, ch, epoch_id=0, salt_partitions="auto")
    assert t_plain.state_hash() == t_auto.state_hash()
