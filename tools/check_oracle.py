"""Local mimic of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin at a given
scale factor, compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted by all columns, floats
compared exactly after both engines' own rounding).

Usage: python tools/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

import os

import duckdb

# derive the repo root from this file, like the sibling tools — a
# hardcoded /root/repo would break (or silently import a stale copy)
# when the repo is cloned elsewhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normalize(df, colnames):
    cols = sorted(colnames)
    pdf = df[cols].copy()
    rows = []
    for t in pdf.itertuples(index=False):
        rows.append(tuple(repr(v) for v in t))
    return cols, sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2:] or None

    import __spark_entry__ as entrymod
    from open_source_search_engine_spark.session import get_spark

    spark = get_spark(cores=8)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if name_filter and not any(f in name for f in name_filter):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        scols = sorted(spdf.columns)
        ocols = sorted(opdf.columns)
        if scols != ocols:
            print(f"FAIL {name}: schema {scols} vs {ocols}")
            n_fail += 1
            continue
        if len(spdf) != len(opdf):
            print(f"FAIL {name}: rows {len(spdf)} vs {len(opdf)}")
            n_fail += 1
            continue
        _, srows = normalize(spdf, spdf.columns)
        _, orows = normalize(opdf, opdf.columns)
        if srows != orows:
            diffs = [i for i, (a, b) in enumerate(zip(srows, orows)) if a != b][:3]
            print(f"FAIL {name}: values differ at sorted rows {diffs}")
            for i in diffs[:2]:
                print(f"   spark : {srows[i]}")
                print(f"   duckdb: {orows[i]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(spdf)} rows  ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
