"""Driver-style correctness harness: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` twin on DuckDB at sf=0.01, compare
row-count + schema-names + order-insensitive values (columns sorted by
name), like the driver's CORRECTNESS check.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from paperslicer_spark.session import get_spark

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    # Driver-faithful: dtype-sensitive and full-precision. A float64
    # cell renders via shortest round-trip repr ("25.0", 17 sig
    # digits when needed) so int64 25 vs float64 25.0 MISMATCH and a
    # 1-ULP double difference MISMATCHES — the round-5 x63/x85 reds
    # both slipped through the old "%.9g" + str() normalization.
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(float(v))
    return str(v)


def _rows_key(df):
    cols = sorted(df.columns)
    rows = ["\x1f".join(_norm_cell(r[c]) for c in cols)
            for _, r in df[cols].iterrows()]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle-check", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(sdf)} rows "
                  f"[{', '.join(sdf.columns)}]")
            if len(sdf) == 0 and not name.startswith("q17"):
                failures.append((name, "0 rows"))
            continue
        odf = con.sql(oracles[name]).df()
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rowcount {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems:
            a, b = _rows_key(sdf), _rows_key(odf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        status = "OK" if not problems else "FAIL: " + "; ".join(problems)
        print(f"{name:32s} {len(sdf):7d} rows  {status}")
        if problems:
            failures.append((name, problems))
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
