"""Type-level oracle parity check.

The driver's correctness gate hashes RAW typed values from both engines,
so a DuckDB HUGEINT vs Spark BIGINT difference hash-mismatches even when
the numbers are equal (round-1 lesson: cdc_presence_probe /
events_json_extract / events_sessionize). This tool fetches every oracle
result as Arrow from DuckDB and compares each column's Arrow type against
the Spark result schema, flagging any physical-type divergence.

Usage: python tools/oracle_typecheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from web3research_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Spark simpleString -> acceptable Arrow type name prefixes
SPARK_TO_ARROW = {
    "bigint": ("int64",),
    "int": ("int32",),
    "smallint": ("int16",),
    "tinyint": ("int8",),
    "double": ("double", "float64"),
    "float": ("float", "float32"),
    "string": ("string", "large_string", "string_view"),
    "boolean": ("bool",),
    "date": ("date32",),
    "binary": ("binary", "large_binary"),
}


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    spark = get_spark(app_name="oracle_typecheck")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[SKIP] {name}: no oracle")
            continue
        try:
            sdf = fn(spark, sf_dir)
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
            tbl = con.sql(sql).fetch_arrow_table()
            dtypes = {f.name: str(f.type) for f in tbl.schema}
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"[FAIL] {name}: ERROR {type(e).__name__}: {str(e)[:200]}")
            continue
        bad = []
        for col, st in stypes.items():
            dt = dtypes.get(col)
            if dt is None:
                bad.append(f"{col}: missing in oracle")
                continue
            ok_prefixes = SPARK_TO_ARROW.get(st)
            if ok_prefixes is None:
                # complex type (timestamp/decimal/array/...) — report, don't fail
                print(f"  [note] {name}.{col}: spark={st} duck_arrow={dt}")
                continue
            if not dt.startswith(ok_prefixes):
                bad.append(f"{col}: spark={st} duck_arrow={dt}")
        if bad:
            failed.append(name)
            print(f"[FAIL] {name}: {'; '.join(bad)}")
        else:
            print(f"[PASS] {name}")
    print(f"\n{len(failed)} type failures: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
