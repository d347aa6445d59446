"""Query-side parallelism datapoint: p50 latency at S vs 2S shards.

Per-query task count in the executor is ``num_shards`` (the MaxScore
grouped-map runs one task per shard — executor.py ``groupBy("shard")``),
so shards are THE query-parallelism knob: a build with S=16 on a 32-core
box leaves half the cores idle during the scoring stage. This script
evidences the sizing guidance in BENCH.md ("shards ≥ 2× cluster cores")
by timing the same queries on the same corpus indexed at S and 2S.

Method: both indexes built once from the identical replicated corpus
(same as bench.py); one local[CPUS] session; latency reps INTERLEAVED
A/B/A/B so host-speed drift hits both variants equally; medians
reported with all reps retained. Rank/score identity between the two
indexes is asserted on every query (shard count must not change
results — the determinism invariant).

Usage: python scripts/shard_scaling.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (repo-root; also provides ambient probes)

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_shards.json"
S_BASE = max(4, bench.CPUS // 2)
REPS = 15
REPLICATE = int(os.environ.get("SPARK_GRAFT_SHARDS_REPLICATE",
                               str(bench.REPLICATE)))

QUERIES = [
    ("q_match_and", {"q": "spark query join", "limit": 10}),
    ("q_match_or", {"q": "merge OR window OR vector", "limit": 10}),
    ("q_dismax", {"q": "go", "qfields": "content,path^2", "limit": 10}),
]


def build(tag: str, shards: int, spark) -> str:
    from openaleph_search_spark.index.build import build_index
    out = f"/tmp/bench_idx_shards_{REPLICATE}_{shards}"
    if os.path.exists(os.path.join(out, "meta.json")):
        return out
    docs_dir = f"/tmp/bench_docs_r{REPLICATE}"
    if not os.path.exists(os.path.join(docs_dir, "_SUCCESS")):
        from openaleph_search_spark.sources.code_table import load_docs
        (load_docs(spark, bench.SF_DIR, replicate=REPLICATE)
         .write.mode("overwrite").parquet(docs_dir))
    docs = spark.read.parquet(docs_dir)
    t0 = time.time()
    build_index(spark, docs, out, num_partitions=8 * bench.CPUS,
                num_shards=shards, bigrams=True)
    bench.log(f"built S={shards} in {time.time() - t0:.1f}s")
    return out


def main() -> None:
    from openaleph_search_spark.query.engine import Engine
    spark = bench.session(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    engines = {}
    for s in (S_BASE, 2 * S_BASE):
        engines[s] = Engine(spark, build(f"s{s}", s, spark))
        engines[s].doc_meta.cache().count()

    result = {"cpus": bench.CPUS, "replicate": REPLICATE,
              "shards_base": S_BASE,
              "shards_2x": 2 * S_BASE, "reps": REPS, "queries": {}}
    for name, args in QUERIES:
        # rank/score identity across shard counts (determinism)
        rows = {s: [(r["doc_id"], round(r["score"], 9))
                    for r in engines[s].search(args).hit_rows()]
                for s in engines}
        assert rows[S_BASE] == rows[2 * S_BASE], \
            f"{name}: results differ between shard counts"
        secs = {s: [] for s in engines}
        for _ in range(REPS):  # interleaved, drift-fair
            for s in engines:
                t0 = time.time()
                engines[s].search(args).hits.collect()
                secs[s].append(round(time.time() - t0, 3))
        med = {s: sorted(v)[REPS // 2] for s, v in secs.items()}
        result["queries"][name] = {
            "p50_base_sec": med[S_BASE],
            "p50_2x_sec": med[2 * S_BASE],
            "speedup_2x": round(med[S_BASE] / med[2 * S_BASE], 3),
            "reps_base": secs[S_BASE],
            "reps_2x": secs[2 * S_BASE],
        }
        bench.log(f"{name}: S={S_BASE} p50={med[S_BASE]}s  "
                  f"S={2 * S_BASE} p50={med[2 * S_BASE]}s")
    sp = [q["speedup_2x"] for q in result["queries"].values()]
    result["median_speedup_2x"] = sorted(sp)[len(sp) // 2]
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
