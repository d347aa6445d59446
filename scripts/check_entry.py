"""Local mimic of the driver's correctness gate: run every queries()
entry at sf0.01 and compare row-count + schema + order-insensitive
values against oracle_sql() via DuckDB."""
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as entry

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(got)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failed.append(name)
            continue
        g, w = norm(got), norm(want)
        ok_rows = len(g) == len(w)
        ok_cols = list(g.columns) == list(w.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    g, w, check_dtype=False, check_exact=False, rtol=0,
                    atol=1e-9)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0]
        dtypes_match = ok_cols and all(
            str(g[c].dtype) == str(w[c].dtype) for c in g.columns)
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        extra = "" if dtypes_match else " [dtype-diff: " + ", ".join(
            f"{c}:{g[c].dtype}/{w[c].dtype}" for c in g.columns
            if ok_cols and str(g[c].dtype) != str(w[c].dtype)) + "]"
        print(f"{status} {name}: spark={len(got)} duck={len(want)} "
              f"({time.time()-t0:.1f}s){extra}")
        if status == "FAIL":
            failed.append(name)
            if ok_rows and ok_cols and not ok_vals:
                print("   value diff:", msg)
            elif not ok_cols:
                print("   cols:", list(g.columns), "vs", list(w.columns))
            merged = g.merge(w, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            print(diff.head(6).to_string())
    print("\nFAILED:" if failed else "\nALL OK", failed or "")
    spark.stop()


if __name__ == "__main__":
    main()
