"""Driver-style correctness gate run locally: every queries() entry vs its
oracle_sql() on the same parquet tables, compared by row count, column
names, and a value hash over column-name-sorted, row-sorted data."""
import hashlib
import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        cells = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(f"{v:.6g}")
            elif hasattr(v, "isoformat"):
                cells.append(v.isoformat())
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    only = sys.argv[1:]
    fails = []
    for k in qs:
        if only and k not in only:
            continue
        try:
            sdf = qs[k](spark, SF_DIR).toPandas()
        except Exception as ex:
            fails.append(k)
            print(f"FAIL  {k}: spark error {ex}")
            continue
        if k not in osql:
            print(f"skip  {k}: no oracle (rows={len(sdf)})")
            continue
        try:
            odf = con.execute(osql[k]).df()
        except Exception as ex:
            fails.append(k)
            print(f"FAIL  {k}: oracle error {ex}")
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            fails.append(k)
            print(f"FAIL  {k}: columns {scols} vs {ocols}")
            continue
        if len(sdf) != len(odf):
            fails.append(k)
            print(f"FAIL  {k}: rows {len(sdf)} vs {len(odf)}")
            continue
        hs, ho = canon(sdf), canon(odf)
        status = "ok   " if hs == ho else "HASH?"
        if hs != ho:
            fails.append(k)
        print(f"{status} {k}: rows={len(sdf)} hash {hs} vs {ho}")
    print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL MATCH")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
