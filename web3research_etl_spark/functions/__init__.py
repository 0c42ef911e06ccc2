from web3research_etl_spark.functions.extract import (  # noqa: F401
    extract_text_bytes,
    extract_text_udf,
    detect_lang_udf,
)
