from web3research_etl_spark.lake.table import LakeTable  # noqa: F401
