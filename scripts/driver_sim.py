"""Simulate the round driver: import __spark_entry__ in a fresh
process, smoke entry(), then run queries() at sf0.01 and compare each
against oracle_sql() in DuckDB (row-count + columns + order-insensitive
value hash). Usage: python scripts/driver_sim.py [query_id ...]"""

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as mod

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def vhash(pdf):
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(pdf.astype(str).to_csv(index=False).encode()).hexdigest()


def main() -> int:
    only = set(sys.argv[1:])
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    rows = mod.entry(spark).collect()
    print("SMOKE entry(): rows:", len(rows), rows[:3])
    assert len(rows) >= 1

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs, oracles = mod.queries(), mod.oracle_sql()
    results = {}
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        spdf = fn(spark, SF).toPandas()
        if name in oracles:
            dpdf = con.execute(oracles[name]).df()
            ok = (
                len(spdf) == len(dpdf)
                and sorted(spdf.columns) == sorted(dpdf.columns)
                and vhash(spdf) == vhash(dpdf)
            )
            results[name] = {"rows": len(spdf), "match": ok}
            if not ok:
                print(f"MISMATCH {name}: spark={len(spdf)} duck={len(dpdf)} rows")
                print("spark:", spdf.head(3).to_dict())
                print("duck:", dpdf.head(3).to_dict())
        else:
            results[name] = {"rows": len(spdf), "match": None}
    print(json.dumps(results, indent=1))
    all_ok = all(r["match"] in (True, None) for r in results.values())
    print("ALL_MATCH:", all_ok)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
