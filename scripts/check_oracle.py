"""Local stand-in for the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables,
comparing row count, column names, and an order-insensitive value hash
(columns sorted by name, cells stringified with float rounding).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    return str(v)


def frame_signature(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    normed = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.md5("\n".join(normed).encode()).hexdigest()
    return len(rows), sorted(columns), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            ssig = frame_signature([tuple(r) for r in srows], scols)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={ssig[0]} (no oracle)")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            osig = frame_signature(orows, ocols)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        if ssig == osig:
            print(f"ok    {name}: rows={ssig[0]}")
        else:
            failures += 1
            print(f"FAIL  {name}:")
            print(f"      spark  rows={ssig[0]} cols={ssig[1]} hash={ssig[2]}")
            print(f"      duckdb rows={osig[0]} cols={osig[1]} hash={osig[2]}")
            if ssig[0] == osig[0] and ssig[1] == osig[1]:
                # show first differing row for debugging
                sset = {
                    "|".join(
                        _norm_cell(t[i])
                        for i in sorted(range(len(scols)), key=lambda i: scols[i])
                    )
                    for t in (tuple(r) for r in srows)
                }
                oset = {
                    "|".join(
                        _norm_cell(t[i])
                        for i in sorted(range(len(ocols)), key=lambda i: ocols[i])
                    )
                    for t in orows
                }
                diff_s = sorted(sset - oset)[:3]
                diff_o = sorted(oset - sset)[:3]
                print(f"      only-spark: {diff_s}")
                print(f"      only-duck:  {diff_o}")
    spark.stop()
    print("FAILURES:" if failures else "ALL OK:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
