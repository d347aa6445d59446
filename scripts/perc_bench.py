"""Isolated op_percolate_200q timing (guide §1.4 noop-style isolation).

Times percolate_docs exactly as bench.py's op_percolate_200q does
(same watchlist, same .count() sink) on sf0.1 docs and on a 10x
replicated copy (~50k docs, the driver's sf1.0 scale).

Usage: python scripts/perc_bench.py [--reps 5] [--tag label]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("perc-bench")
             .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from openaleph_search_spark.query.percolate import (
        compile_watchlist, percolate_docs)
    vocab = ["table scan", "merge join", "vector stream", "hash group",
             "sort order", "query filter", "batch window", "data value"]
    watch = compile_watchlist(
        [{"entity_id": f"e{i}",
          "names": [vocab[i % len(vocab)]],
          "other_names": [vocab[(i + 3) % len(vocab)]]}
         for i in range(200)])

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    big = docs.crossJoin(spark.range(10).withColumnRenamed("id", "_r")) \
        .withColumn("doc_id", F.col("doc_id") * 10 + F.col("_r")) \
        .drop("_r")
    big_dir = "/tmp/perc_docs_x10"
    if not os.path.exists(os.path.join(big_dir, "_SUCCESS")):
        big.repartition(64).write.mode("overwrite").parquet(big_dir)
    big = spark.read.parquet(big_dir)

    out = {}
    for name, df in (("sf0.1", docs), ("x10", big)):
        n = df.count()
        res_n = percolate_docs(df, watch, id_cols=["doc_id"],
                               text_col="text", slop=2).count()  # warm
        secs = []
        for _ in range(args.reps):
            t0 = time.time()
            percolate_docs(df, watch, id_cols=["doc_id"], text_col="text",
                           slop=2).count()
            secs.append(round(time.time() - t0, 3))
        secs_s = sorted(secs)
        out[name] = {"docs": n, "result_rows": res_n, "reps": secs,
                     "median": secs_s[len(secs_s) // 2],
                     "min": secs_s[0]}
        print(f"{args.tag} {name}: docs={n} rows={res_n} "
              f"median={out[name]['median']} reps={secs}")
    print(json.dumps({"tag": args.tag, **out}))
    spark.stop()


if __name__ == "__main__":
    main()
