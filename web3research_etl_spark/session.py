"""SparkSession factory.

Single place where engine-level physics are configured (the reference
hand-builds these in Rust — SURVEY.md §4; on Spark they are config):

- AQE for runtime re-planning / skew-join splitting,
- Arrow for vectorized pandas UDF transfer,
- UTC session timezone so results hash-compare against DuckDB oracles,
- shuffle partitions sized to cores for local mode (overridable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "web3research_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]).
    At cluster scale the same builder is used by ``spark-submit`` with
    ``--master`` taking precedence over anything set here.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_s = os.environ.get("SPARK_GRAFT_CPUS", "")
        shuffle_partitions = int(cpus_s) if cpus_s.isdigit() else 32

    # Shuffle/spill scratch on tmpfs when one exists: shuffle blocks are
    # written+read once per exchange, and a virtio root disk serializes
    # that I/O across all cores (measured: a hidden serial term that
    # caps N→4N scaling). On a real cluster this is "provision local
    # SSDs for spark.local.dir" — standard practice, not a bench trick.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's default 64 MB advisory partition size is tuned for
        # skinny relational rows; this engine's rows carry multi-KB
        # binary payloads that later fan into pandas-UDF work, so a
        # 64 MB post-shuffle partition becomes a multi-minute straggler
        # task (measured: the extraction stage coalesced to 11 tasks and
        # dominated the epoch). 16 MB keeps payload stages at full
        # parallelism while still coalescing truly tiny shuffles.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # File listing: >32 paths makes every scan node launch a
        # distributed listing JOB (measured: 4 × 0.5 s per merge epoch,
        # one per plan subtree reading the same file group). Local/fast
        # filesystems list thousands of paths in ms on the driver.
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        # keep stdout parseable (bench.py's one-line JSON contract):
        # stage progress bars otherwise interleave with printed results
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
