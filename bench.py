"""Benchmark: index-build throughput + query latency at two parallelism
levels (the sandbox stand-in for the north_rule's N vs 4N executors).

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "build": {...}, "scaling": {...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32),
     SPARK_GRAFT_BENCH_REPLICATE (default 8 — docs table multiplier).
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "32"))

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def session(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cores}]")
            .appName(f"bench-{cores}")
            .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate())


def build_at(cores: int, num_partitions: int, tag: str) -> dict:
    """Build the full index at a given core count; returns metrics."""
    from openaleph_search_spark.index.build import build_index
    from openaleph_search_spark.sources.code_table import load_docs
    spark = session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    out = f"/tmp/bench_idx_{tag}"
    shutil.rmtree(out, ignore_errors=True)
    docs = load_docs(spark, SF_DIR, replicate=REPLICATE)
    n_docs = docs.count()  # warms the scan; excluded from build timing
    t0 = time.time()
    # identical job shape at both parallelism levels: same partitions,
    # same shard count — only the executor-thread count varies
    st = build_index(spark, docs, out, num_partitions=num_partitions,
                     num_shards=max(4, CPUS // 2))
    dt = time.time() - t0
    meta = st.read_meta()
    # shuffle/skew evidence: postings rows + max block rows per term
    from pyspark.sql import functions as F
    p = st.postings(spark)
    skew = p.groupBy("term").agg(
        F.sum("doc_count").alias("df"),
        F.countDistinct("shard").alias("shards_used")).agg(
        F.max("df").alias("max_term_df"),
        F.max("shards_used").alias("max_shards_per_term"),
        F.count("*").alias("n_terms")).collect()[0].asDict()
    spark.stop()
    return {"cores": cores, "docs": n_docs, "build_sec": round(dt, 2),
            "docs_per_sec": round(n_docs / dt, 1),
            "partitions": meta["num_partitions"],
            "shards": meta["num_shards"], **skew, "index_dir": out}


def run_queries(cores: int, index_dir: str) -> tuple[dict, dict]:
    from pyspark.sql import functions as F
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.ops.dedup import minhash_lsh_pairs
    from openaleph_search_spark.ops.similarity import cosine_topk
    spark = session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark, index_dir)
    eng.doc_meta.cache().count()  # metadata warm, like ES fs cache

    timings = {}

    def bench(name, fn, warm=True):
        if warm:
            fn()
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        log(f"  {name}: {timings[name]}s")

    bench("q_match_and",
          lambda: eng.search({"q": "spark query join", "limit": 10})
          .hits.collect())
    bench("q_match_or",
          lambda: eng.search({"q": "merge OR window OR vector",
                              "limit": 10}).hits.collect())
    bench("q_phrase",
          lambda: eng.search({"q": '"table scan"', "limit": 10})
          .hits.collect())
    bench("q_filtered",
          lambda: eng.search({"q": "vector stream", "filter:lang": "de",
                              "limit": 10}).hits.collect())
    bench("q_facet",
          lambda: eng.search({"q": "vector", "facet": "lang", "limit": 0})
          .facets["lang"].collect())
    bench("q_count", lambda: eng.count({"q": "vector merge"}))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    bench("op_minhash_dedup",
          lambda: minhash_lsh_pairs(docs, threshold=0.95).count())
    probe = emb.limit(1).collect()[0]["embedding"]
    bench("op_cosine_topk",
          lambda: cosine_topk(emb, probe, k=10).collect())

    # p95 of the headline match query over 20 runs
    lat = []
    for _ in range(20):
        t0 = time.time()
        eng.search({"q": "spark query join", "limit": 10}).hits.collect()
        lat.append(time.time() - t0)
    lat.sort()
    p95 = {"q_match_p50_sec": round(lat[len(lat) // 2], 3),
           "q_match_p95_sec": round(lat[int(len(lat) * 0.95) - 1], 3)}
    spark.stop()
    return timings, p95


def main():
    n_small = max(2, CPUS // 4)
    partitions = 2 * CPUS  # same input partitioning at both levels

    log(f"== build @ local[{n_small}] ==")
    b_small = build_at(n_small, partitions, f"n{n_small}")
    log(str(b_small))
    log(f"== build @ local[{CPUS}] ==")
    b_big = build_at(CPUS, partitions, f"n{CPUS}")
    log(str(b_big))

    ratio = CPUS / n_small
    eff = (b_big["docs_per_sec"] / b_small["docs_per_sec"]) / ratio

    log(f"== queries @ local[{CPUS}] ==")
    timings, p95 = run_queries(CPUS, b_big["index_dir"])

    result = {
        "metric": "index-build docs/sec + query sec (BM25 engine, sf "
                  "documents-derived code table)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "build": {
            f"local[{n_small}]": b_small,
            f"local[{CPUS}]": b_big,
        },
        "scaling": {
            "n_cores": n_small, "4n_cores": CPUS,
            "docs_per_sec_n": b_small["docs_per_sec"],
            "docs_per_sec_4n": b_big["docs_per_sec"],
            "efficiency": round(eff, 3),
            "target": 0.8,
        },
        "latency": p95,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
