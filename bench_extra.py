"""Round-6 optimization harness (bench.py stays FROZEN).

Times the same 11 bench items as bench.py's query block against a
prebuilt index (default /tmp/bench_idx_n32 — the driver's own build)
without re-running the 15-minute build/scaling phases, and records
per-query Spark job counts + wall times so per-change deltas are
attributable.

Usage:
  python bench_extra.py [--index DIR] [--sf DIR] [--reps N]
                        [--only q_match_and,op_minhash_dedup]
                        [--explain]   # dump .explain to plans/r06/
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def session(cores: int):
    from pyspark.sql import SparkSession
    return (SparkSession.builder.master(f"local[{cores}]")
            .appName(f"bench-extra-{cores}")
            .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.driver.memory",
                    os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", default="/tmp/bench_idx_n32")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default="")
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--tag", default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from pyspark.sql import functions as F
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.ops.dedup import minhash_lsh_pairs
    from openaleph_search_spark.ops.similarity import cosine_topk

    spark = session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    eng = Engine(spark, args.index)
    eng.doc_meta.cache().count()

    results = {}

    def bench(name, fn, warm=True, reps=args.reps):
        if only is not None and name not in only:
            return
        sc.setJobDescription(name)
        if warm:
            fn()
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        secs = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            secs.append(time.time() - t0)
        # job count per rep: all job ids ever minus before, / reps
        njobs = None
        try:
            import py4j  # noqa
            jsc = sc._jsc.sc()
            njobs = None
        except Exception:
            pass
        secs.sort()
        m = len(secs) // 2
        med = (secs[m] if len(secs) % 2 else (secs[m-1] + secs[m]) / 2)
        results[name] = {"median": round(med, 3),
                         "reps": [round(s, 3) for s in secs]}
        print(f"  {name}: {med:.3f}s  reps={[round(s,3) for s in secs]}",
              file=sys.stderr, flush=True)
        sc.setJobDescription(None)

    def explain_to(name, df):
        if not args.explain:
            return
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        suffix = args.tag or "cur"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))

    bench("q_match_and",
          lambda: eng.search({"q": "spark query join", "limit": 10})
          .hits.collect())
    explain_to("q_match_and",
               eng.search({"q": "spark query join", "limit": 10}).hits)
    bench("q_match_or",
          lambda: eng.search({"q": "merge OR window OR vector",
                              "limit": 10}).hits.collect())
    explain_to("q_match_or",
               eng.search({"q": "merge OR window OR vector",
                           "limit": 10}).hits)
    bench("q_phrase",
          lambda: eng.search({"q": '"table scan"', "limit": 10})
          .hits.collect())
    explain_to("q_phrase",
               eng.search({"q": '"table scan"', "limit": 10}).hits)
    bench("q_filtered",
          lambda: eng.search({"q": "vector stream", "filter:lang": "de",
                              "limit": 10}).hits.collect())
    explain_to("q_filtered",
               eng.search({"q": "vector stream", "filter:lang": "de",
                           "limit": 10}).hits)
    bench("q_facet",
          lambda: eng.search({"q": "vector", "facet": "lang", "limit": 0})
          .facets["lang"].collect())
    explain_to("q_facet",
               eng.search({"q": "vector", "facet": "lang",
                           "limit": 0}).facets["lang"])
    bench("q_count", lambda: eng.count({"q": "vector merge"}))
    bench("q_fielded",
          lambda: eng.search({"q": "lang:de vector", "limit": 10})
          .hits.collect())
    explain_to("q_fielded",
               eng.search({"q": "lang:de vector", "limit": 10}).hits)
    bench("q_dismax",
          lambda: eng.search({"q": "go", "qfields": "content,path^2",
                              "limit": 10}).hits.collect())
    explain_to("q_dismax",
               eng.search({"q": "go", "qfields": "content,path^2",
                           "limit": 10}).hits)

    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    bench("op_minhash_dedup",
          lambda: minhash_lsh_pairs(docs, threshold=0.95).count())
    explain_to("op_minhash_dedup",
               minhash_lsh_pairs(docs, threshold=0.95))
    if only is None or "op_cosine_topk" in only:
        probe = emb.limit(1).collect()[0]["embedding"]
        bench("op_cosine_topk",
              lambda: cosine_topk(emb, probe, k=10).collect())
        explain_to("op_cosine_topk", cosine_topk(emb, probe, k=10))

    from openaleph_search_spark.query.percolate import (
        compile_watchlist, percolate_docs)
    vocab = ["table scan", "merge join", "vector stream", "hash group",
             "sort order", "query filter", "batch window", "data value"]
    watch = compile_watchlist(
        [{"entity_id": f"e{i}",
          "names": [vocab[i % len(vocab)]],
          "other_names": [vocab[(i + 3) % len(vocab)]]}
         for i in range(200)])
    bench("op_percolate_200q",
          lambda: percolate_docs(docs, watch, id_cols=["doc_id"],
                                 text_col="text", slop=2).count(),
          reps=5)
    explain_to("op_percolate_200q",
               percolate_docs(docs, watch, id_cols=["doc_id"],
                              text_col="text", slop=2))

    total = round(sum(v["median"] for v in results.values()), 3)
    out = {"value": total, "queries": results, "index": args.index,
           "sf": args.sf, "tag": args.tag}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
