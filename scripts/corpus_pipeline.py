"""End-to-end LLM corpus pipeline at sf1 scale (6.4M docs) — the
composed credibility run for the 100-TB story: every op below is
individually oracle-green; this script chains them the way a training
data pipeline would and records wall-time per stage.

    synthesize → index build → boilerplate strip → exact-substring cut
    → keep-one near-dup → decontaminate → mixture + split → pack

Corpus: the sf0.1 ``documents`` table replicated R× (default 1280 →
6.4M docs) with DETERMINISTIC structure so each stage has real work:

* every replica carries a per-source subscribe/copyright line
  (boilerplate: spans ~R·250 docs per source — stripped by stage 2);
* the base body is line-broken and shared by all R replicas of a base
  doc (corpus-level exact repetition — cut by stage 3, which uses
  min_count=3 so the designed PAIRS below survive to stage 4);
* replicas with rep ≡ 1 (mod 16) duplicate the unique token block of
  rep-1 (doc-level near-dup pairs, cluster size 2 — the shape stage 3
  leaves alone and stage 4's keep-one removes);
* the eval set leaks 100 cleaned training docs (stage 5 must flag
  them) plus 100 novel texts (must NOT flag).

Stages materialize to /tmp parquet between steps (production
checkpoint discipline; also what makes per-stage wall time honest).

Usage: python scripts/corpus_pipeline.py [out.json]
Env:   SPARK_GRAFT_PIPE_R (replicas, default 1280)
       SPARK_GRAFT_CPUS   (cores, default 32)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/BENCH_pipeline.json"
R = int(os.environ.get("SPARK_GRAFT_PIPE_R", "1280"))
SF_DIR = bench.SF_DIR
WORK = "/tmp/pipe"

STAGES: list[dict] = []


def stage(name: str):
    def deco(fn):
        def run(*a, **kw):
            t0 = time.time()
            out = fn(*a, **kw)
            dt = round(time.time() - t0, 1)
            STAGES.append({"stage": name, "sec": dt, **(out or {})})
            bench.log(f"[{name}] {dt}s {out or ''}")
            return out
        return run
    return deco


def _p(name: str) -> str:
    return os.path.join(WORK, name)


@stage("synthesize")
def synthesize(spark) -> dict:
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    reps = spark.range(R).select(F.col("id").cast("int").alias("rep"))
    # rep%16==1 shares its unique block with rep-1 → designed pair
    pair_rep = (F.col("rep")
                - F.when(F.col("rep") % 16 == 1, 1).otherwise(0))
    uniq = F.regexp_replace(
        F.md5(F.concat_ws(":", "doc_id", pair_rep.cast("string"))),
        "(....)", "u$1 ")  # 8 pseudo-tokens per replica
    body = F.regexp_replace("text", r"((?:\S+ ){12})", "$1\n")
    out = (docs.crossJoin(F.broadcast(reps))
           .select(
               (F.col("doc_id") * R + F.col("rep")).alias("doc_id"),
               "lang", "source",
               F.concat(
                   F.format_string(
                       "subscribe to the %s mailing list today\n",
                       "source"),
                   uniq, F.lit("\n"), body,
                   F.format_string(
                       "\ncopyright %s all rights reserved", "source"),
               ).alias("text")))
    out.write.mode("overwrite").parquet(_p("corpus"))
    n = spark.read.parquet(_p("corpus")).count()
    return {"docs": n}


@stage("index_build")
def index_build(spark) -> dict:
    from openaleph_search_spark.index.build import build_index
    corpus = spark.read.parquet(_p("corpus"))
    docs = corpus.select(
        F.col("source").alias("repo"),
        F.format_string("d/%d.txt", "doc_id").alias("path"),
        F.lit("c0").alias("commit"), "lang",
        F.col("text").alias("content"))
    idx = _p("index")
    shutil.rmtree(idx, ignore_errors=True)
    st = build_index(spark, docs, idx,
                     num_partitions=8 * bench.CPUS,
                     num_shards=max(4, bench.CPUS // 2), bigrams=True)
    return {"docs": int(st.read_meta()["n_docs"])}


@stage("boilerplate_strip")
def boilerplate_strip(spark) -> dict:
    from openaleph_search_spark.ops.dedup import (boilerplate_lines,
                                                  strip_boilerplate_lines)
    corpus = spark.read.parquet(_p("corpus"))
    # boilerplate = lines spanning MANY UNRELATED docs (≫ the R
    # replicas of one base doc — shared bodies are stage 3's job)
    boiler = boilerplate_lines(corpus, min_docs=8 * R)
    stripped = strip_boilerplate_lines(corpus, boiler)
    stripped.write.mode("overwrite").parquet(_p("stripped"))
    agg = (spark.read.parquet(_p("stripped"))
           .agg(F.sum("n_lines_removed").alias("rm"),
                F.sum("n_lines").alias("n")).collect()[0])
    return {"lines_removed": int(agg["rm"]), "lines": int(agg["n"])}


@stage("span_cut")
def span_cut(spark) -> dict:
    from openaleph_search_spark.ops.dedup import cut_spans, duplicate_spans
    stripped = (spark.read.parquet(_p("stripped"))
                .select("doc_id",
                        F.col("text_clean").alias("text")))
    # min_count=3: corpus-level repetition (R-fold bodies) is cut;
    # the designed 2-doc near-dup pairs survive for the next stage
    spans = duplicate_spans(stripped, window=5, min_count=3)
    cut = cut_spans(stripped, spans)
    cut.write.mode("overwrite").parquet(_p("cut"))
    agg = (spark.read.parquet(_p("cut"))
           .agg(F.sum("n_tokens_removed").alias("rm"),
                F.sum("n_tokens").alias("n")).collect()[0])
    return {"tokens_removed": int(agg["rm"]), "tokens": int(agg["n"])}


@stage("near_dup_keep_one")
def near_dup(spark) -> dict:
    from openaleph_search_spark.ops.dedup import (keep_one_per_cluster,
                                                  minhash_lsh_pairs)
    cut = (spark.read.parquet(_p("cut"))
           .select("doc_id", F.col("text_deduped").alias("text")))
    pairs = minhash_lsh_pairs(cut, threshold=0.8)
    kept = keep_one_per_cluster(cut, pairs)
    kept.write.mode("overwrite").parquet(_p("kept"))
    n0, n1 = cut.count(), spark.read.parquet(_p("kept")).count()
    return {"docs_in": n0, "docs_dropped": n0 - n1}


@stage("decontaminate")
def decontaminate(spark) -> dict:
    from openaleph_search_spark.ops.dedup import contamination_flags
    kept = spark.read.parquet(_p("kept"))
    # 100 leaked training docs + 100 novel benchmark items
    leaked = (kept.filter(F.pmod("doc_id", F.lit(40201)) == 7)
              .limit(100).select("text"))
    novel = spark.range(100).select(F.format_string(
        "novel benchmark item %d with fresh unseen wording number %d",
        "id", "id").alias("text"))
    ev = leaked.unionByName(novel)
    flagged = contamination_flags(kept, ev, n=6)
    clean = flagged.filter(~F.col("contaminated")).drop(
        "contaminated", "eval_hits")
    clean.write.mode("overwrite").parquet(_p("clean"))
    n0 = kept.count()
    n1 = spark.read.parquet(_p("clean")).count()
    return {"docs_in": n0, "docs_dropped": n0 - n1}


@stage("mix_split_pack")
def mix_split_pack(spark) -> dict:
    from openaleph_search_spark.ops.mixing import mixture_sample, with_split
    from openaleph_search_spark.ops.textstats import (with_pack_ids,
                                                      with_token_counts)
    clean = spark.read.parquet(_p("clean"))
    src = (spark.read.parquet(_p("corpus"))
           .select("doc_id", "source"))
    clean = clean.join(src, "doc_id")
    fr = {f"src{i}": (1.0 if i < 10 else 0.3) for i in range(18)}
    mixed = mixture_sample(clean, fr, group_col="source")
    split = with_split(mixed, {"train": 0.98, "val": 0.01, "test": 0.01})
    packed = with_pack_ids(with_token_counts(split), budget=2048,
                           group_col="source")
    (packed.write.mode("overwrite").partitionBy("split")
     .parquet(_p("packed")))
    out = spark.read.parquet(_p("packed"))
    n = out.count()
    packs = out.select("pack_id").distinct().count()
    return {"docs_out": n, "packs": packs}


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    spark = bench.session(bench.CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    synthesize(spark)
    index_build(spark)
    boilerplate_strip(spark)
    span_cut(spark)
    near_dup(spark)
    decontaminate(spark)
    mix_split_pack(spark)
    total = round(time.time() - t0, 1)
    # ambient probe so the reader can judge host health for this run
    import numpy as np
    a = np.random.RandomState(0).randint(0, 1 << 40, 2_000_000)
    t1, k = time.time(), 0
    while time.time() - t1 < 1.5:
        np.sort(a)
        k += 1
    art = {"replicate": R, "cpus": bench.CPUS, "total_sec": total,
           "ambient_sorts_per_sec": round(k / (time.time() - t1), 1),
           "stages": STAGES}
    with open(OUT, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art))
    spark.stop()


if __name__ == "__main__":
    main()
