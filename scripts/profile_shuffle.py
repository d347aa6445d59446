"""Isolate the SPIMI job's non-UDF cost: scan+sha2+shuffle+Arrow
transfer with a NO-OP grouped-map fn, at several (cores, shuffle
partitions) combos.

Usage: python scripts/profile_shuffle.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

DOCS_DIR = os.environ.get("SPARK_GRAFT_PROFILE_DOCS",
                          "/tmp/bench_docs_r128")
P = 256


def session(cores: int, shuffle_parts: int):
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.master(f"local[{cores}]")
         .appName(f"shufprof-{cores}-{shuffle_parts}")
         .config("spark.sql.shuffle.partitions", str(shuffle_parts))
         .config("spark.sql.adaptive.coalescePartitions.enabled",
                 os.environ.get("SPARK_GRAFT_COALESCE", "true"))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .config("spark.ui.showConsoleProgress", "false"))
    return b.getOrCreate()


def run(cores: int, shuffle_parts: int):
    import pandas as pd
    from pyspark.sql import functions as F
    spark = session(cores, shuffle_parts)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(DOCS_DIR)
    docs.count()
    (spark.range(10_000).repartition(cores)
     .mapInPandas(lambda it: it, "id long").count())

    prepared = docs.select(
        "repo", "path", "commit", "lang", "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(P))
         .cast("int").alias("src_part"))

    def noop(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"src_part": int(pdf["src_part"].iloc[0]),
                              "docs": len(pdf),
                              "chars": int(pdf["content"].str.len().sum())}])

    t0 = time.time()
    prepared.groupBy("src_part").applyInPandas(
        noop, "src_part int, docs long, chars long").collect()
    noop_t = time.time() - t0

    # scan+sha2 only, no shuffle (count of a projected agg)
    t0 = time.time()
    prepared.agg(F.sum(F.length("content_sha256"))).collect()
    scan_t = time.time() - t0

    spark.stop()
    print({"cores": cores, "shuffle_parts": shuffle_parts,
           "noop_groupmap_sec": round(noop_t, 2),
           "scan_sha2_sec": round(scan_t, 2)}, flush=True)


if __name__ == "__main__":
    combos = [(1, 8), (4, 8), (4, 32), (4, 256), (1, 256)]
    if len(sys.argv) > 1:
        combos = [tuple(map(int, a.split(","))) for a in sys.argv[1:]]
    for c, sp in combos:
        run(c, sp)
