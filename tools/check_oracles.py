"""Local emulation of the driver's correctness gate: run each queries()
entry under Spark and its oracle_sql() under DuckDB on the same sf dir,
compare row count + sorted-by-name columns + sorted values.

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""
from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as em
    from mongoesindexer_spark.session import get_spark

    names = sys.argv[2:] or sorted(em.queries())
    oracles = em.oracle_sql()
    spark = get_spark("check-oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failed = []
    for name in names:
        fn = em.queries()[name]
        sdf = fn(spark, sf_dir).toPandas()
        scols = sorted(sdf.columns)
        sdf = sdf[scols]
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(sdf)} rows, cols {scols}")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        ocols = sorted(odf.columns)
        odf = odf[ocols]
        ok = True
        if scols != ocols:
            print(f"{name:28s} SCHEMA MISMATCH spark={scols} oracle={ocols}")
            ok = False
        elif len(sdf) != len(odf):
            print(f"{name:28s} ROWCOUNT MISMATCH spark={len(sdf)} oracle={len(odf)}")
            ok = False
        else:
            a = sorted(map(tuple, sdf.astype(str).values.tolist()))
            b = sorted(map(tuple, odf.astype(str).values.tolist()))
            if a != b:
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"{name:28s} VALUE MISMATCH e.g. {diffs}")
                ok = False
        if ok:
            print(f"{name:28s} OK ({len(sdf)} rows)")
        else:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        sys.exit(1)
    print("all checked entries match")


if __name__ == "__main__":
    main()
