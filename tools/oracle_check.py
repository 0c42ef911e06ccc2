"""Local replica of the driver's correctness gate: run every
__spark_entry__ query against its DuckDB oracle and compare row count,
column names, and order-insensitive values.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from web3research_etl_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def compare(spark, con, name: str, fn, sql: str | None, sf_dir: str) -> str:
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sorted(sdf.columns)
    sset = Counter(tuple(_norm(r[c]) for c in scols) for r in srows)
    if sql is None:
        return f"rows-only ({len(srows)} rows)"
    ddf = con.sql(sql)
    dcols_raw = [d[0] for d in ddf.description]
    drows = ddf.fetchall()
    dcols = sorted(dcols_raw)
    if scols != dcols:
        return f"SCHEMA MISMATCH spark={scols} duck={dcols}"
    idx = [dcols_raw.index(c) for c in dcols]
    dset = Counter(tuple(_norm(r[i]) for i in idx) for r in drows)
    if sum(sset.values()) != sum(dset.values()):
        return f"ROWCOUNT MISMATCH spark={sum(sset.values())} duck={sum(dset.values())}"
    if sset != dset:
        only_s = list((sset - dset).keys())[:2]
        only_d = list((dset - sset).keys())[:2]
        return f"VALUE MISMATCH spark-only={only_s} duck-only={only_d}"
    return f"OK ({sum(sset.values())} rows)"


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf_dir}/{t}.parquet')")
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = compare(spark, con, name, fn, oracles.get(name), sf_dir)
        except Exception as e:  # noqa: BLE001
            res = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        status = "PASS" if res.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failed.append(name)
        print(f"[{status}] {name}: {res}")
    print(f"\n{len(failed)} failures: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
