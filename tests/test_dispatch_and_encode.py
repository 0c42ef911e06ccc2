"""Type-dispatch router (SURVEY P8/S7) and byte-encoding functions
(SURVEY F2/F4)."""

from pyspark.sql import functions as F

from web3research_etl_spark.functions.encode import (
    b58check_bytes,
    b58check_udf,
    b58encode_bytes,
    b58encode_udf,
    hex_to_long,
)
from web3research_etl_spark.operators.dispatch import (
    REST_ROUTE,
    dispatch_by_type,
    fan_out_counts,
)


def test_dispatch_routes_and_rest(spark):
    df = spark.createDataFrame(
        [(i, ["click", "view", "purchase", "weird"][i % 4], i * 1.5) for i in range(40)],
        "id long, event_type string, value double",
    )
    routed = dispatch_by_type(
        df,
        "event_type",
        {
            "click": lambda d: d.select("id"),
            "view": lambda d: d.select("id", "value"),
            "purchase": lambda d: d.select(
                "id", (F.col("value") * 100).cast("long").alias("cents")
            ),
        },
    )
    counts = fan_out_counts(routed)
    assert counts == {"click": 10, "view": 10, "purchase": 10, REST_ROUTE: 10}
    # route-specific projections applied
    assert routed["click"].columns == ["id"]
    assert routed["purchase"].columns == ["id", "cents"]
    # rest keeps original shape (replayable) minus the route tag
    assert set(routed[REST_ROUTE].columns) == {"id", "event_type", "value"}
    # disjoint + complete partition of the input
    assert sum(counts.values()) == 40


def test_dispatch_null_discriminator_goes_to_rest(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None)], "id long, t string"
    )
    routed = dispatch_by_type(df, "t", {"a": lambda d: d})
    assert routed["a"].count() == 1
    assert routed[REST_ROUTE].count() == 1


def test_b58_vectors_and_udf(spark):
    # classic vectors
    assert b58encode_bytes(b"hello world") == "StV1DL6CwTryKyV"
    assert b58encode_bytes(b"\x00\x00abc") == "11ZiCa"
    assert b58check_bytes(b"\x00" * 20, 0) == "1111111111111111111114oLvT2"
    df = spark.createDataFrame(
        [(b"hello world",), (b"\x00\x00abc",), (None,)], "raw binary"
    )
    got = df.select(
        b58encode_udf(F.col("raw")).alias("b58"),
        b58check_udf(0)(F.col("raw")).alias("b58c"),
    ).collect()
    assert [r["b58"] for r in got] == ["StV1DL6CwTryKyV", "11ZiCa", None]
    # udf kernel == reference kernel
    assert got[0]["b58c"] == b58check_bytes(b"hello world", 0)


def test_hex_to_long(spark):
    df = spark.createDataFrame([("0x1a",), ("ff",), ("0x0",)], "h string")
    got = [r[0] for r in df.select(hex_to_long("h")).collect()]
    assert got == [26, 255, 0]


def test_fan_out_counts_is_one_job(spark):
    """The ops probe must count every route in ONE Spark job (a 43-way
    fan-out paying 43 job submissions per batch is the anti-pattern,
    VERDICT r02) — job count tracked via a dedicated job group."""
    df = spark.createDataFrame(
        [(i, ["click", "view", "purchase", "weird"][i % 4]) for i in range(40)],
        "id long, event_type string",
    )
    routed = dispatch_by_type(
        df,
        "event_type",
        {
            "click": lambda d: d.select("id"),
            "view": lambda d: d,
            "purchase": lambda d: d.select("event_type"),
        },
    )
    sc = spark.sparkContext
    sc.setJobGroup("fanout_counts_probe", "one-job probe")
    try:
        counts = fan_out_counts(routed)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("fanout_counts_probe")
    assert counts == {"click": 10, "view": 10, "purchase": 10, REST_ROUTE: 10}
    # one action; AQE may stage it as at most 2 jobs — never one per route
    assert 1 <= len(jobs) <= 2, jobs
