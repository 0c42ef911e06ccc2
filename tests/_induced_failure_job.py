"""Subprocess job for test_task_retry: induce a REAL task failure inside
the merge's write stage and prove the commit still converges.

Run: python tests/_induced_failure_job.py <workdir>

Runs under master=local[4,2] — 4 worker threads, spark.task.maxFailures=2
(local's default of 1 would fail the job on the first induced error, so
this is the minimal config where Spark's task-retry machinery is live,
as it always is on a real cluster).

The bomb is an identity pandas UDF spliced into ``pre_write_transform``
— the same hook the production HTML→text extraction runs in — that
atomically claims a marker file and raises on exactly one task attempt.
Spark retries the task; the retry sees the marker and passes rows
through untouched. The job then asserts the converged state hash is
byte-identical to a clean run of the same batch, and that the epoch
committed exactly once.
"""

import json
import os
import sys

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web3research_etl_spark.changelog import generate_changelog
from web3research_etl_spark.lake.table import LakeTable
from web3research_etl_spark.schemas import PAGES_KEY, PAGES_SCHEMA, PAGES_VERSION_ORDER
from web3research_etl_spark.session import get_spark


def main(workdir: str) -> int:
    marker = os.path.join(workdir, "bomb_fired.marker")

    spark = get_spark(
        app_name="induced-failure-job",
        master="local[4,2]",
        shuffle_partitions=8,
    )

    @pandas_udf("string")
    def bomb(s: pd.Series) -> pd.Series:
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            return s  # a later batch/attempt: pass through
        from pyspark import TaskContext

        tc = TaskContext.get()
        raise RuntimeError(
            f"injected mid-merge failure (partition {tc.partitionId()}, "
            f"attempt {tc.attemptNumber()})"
        )

    def failing_transform(staged):
        return staged.withColumn("lang", bomb(F.col("lang")))

    batch = (
        generate_changelog(spark, 1200)
        .select("op", "url", "warc_ts", "event_seq", "html", "lang")
        .withColumn("text", F.lit(None).cast("string"))
        .cache()
    )

    def new_table(name):
        return LakeTable.create(
            spark, os.path.join(workdir, name), PAGES_SCHEMA,
            key=PAGES_KEY, version_order=PAGES_VERSION_ORDER, n_buckets=8,
        )

    t_clean = new_table("clean")
    t_clean.merge_changelog(batch, epoch_id=0)

    t_bombed = new_table("bombed")
    result = t_bombed.merge_changelog(
        batch, epoch_id=0, pre_write_transform=failing_transform
    )

    out = {
        "bomb_fired": os.path.exists(marker),
        "merge_skipped": bool(result.get("skipped")),
        "hash_clean": t_clean.state_hash(),
        "hash_bombed": t_bombed.state_hash(),
        "epochs_bombed": sorted(t_bombed.committed_epochs()),
    }
    print(json.dumps(out))
    ok = (
        out["bomb_fired"]
        and not out["merge_skipped"]
        and out["hash_clean"] == out["hash_bombed"]
        and out["epochs_bombed"] == [0]
    )
    return 0 if ok else 3


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
