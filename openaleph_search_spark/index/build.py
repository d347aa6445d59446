"""SPIMI inverted-index build over a source-code document table.

Spark-first re-expression of what the reference delegates to
Elasticsearch at bulk-index time (analysis + inverted index + postings
compression; /root/reference/openaleph_search/index/indexer.py:54-178
drives it, Lucene executes it).  Pipeline:

  docs(repo, path, commit, lang, content)
    │  F.sha2(content) / deterministic src_part (JVM-side)
    ├─ groupBy(src_part).applyInPandas(SPIMI)         ── scatter
    │     tokenize (vectorized analyzer) → (term, doc_id, tf, dl, pos[])
    │     write tf_runs/part=K.parquet + doc_meta/part=K.parquet
    │     commit manifest/part=K.json  ← per-partition checkpoint
    ├─ global_stats (N, avgdl) from doc_meta           ── tiny agg
    ├─ shard = docid-range bucket; groupBy(term, shard)
    │     .applyInPandas(encode_blocks)                ── the ONE shuffle
    │     delta+varint blocks w/ block_max_tfnorm
    └─ postings/ partitioned by shard; term_stats/ ; meta.json

Scale properties (designed for 1000-executor / 100 TB):

* Doc ids are ``(src_part << 33) | row_in_partition`` with rows sorted by
  (repo, path, commit) — deterministic, monotone, no global count pass,
  no driver materialization (SURVEY.md §7.0.2).
* The term shuffle is keyed on (term, shard): a hot term (``the``,
  ``def``, ``license``) fans out across all ``num_shards`` reducers —
  doc-range sharding IS the salt, and salts are docid-contiguous so
  blocks concatenate globally sorted (SURVEY.md §7.0.6).
* Resumability: each source partition commits its run atomically
  (parquet first, manifest JSON last); a re-run prunes completed
  partitions driver-side and step B overwrites idempotently
  (north_rule checkpoint + lineage + per-task metrics).
* Map-side partial aggregation: tf aggregation happens before the
  shuffle (inside SPIMI), so shuffle volume is O(distinct (term, doc)),
  not O(token occurrences).
"""
from __future__ import annotations

import os
import json
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analysis.analyzer import tokenize_flat
from .codec import (BLOCK_SIZE, K1, B, encode_blocks,
                    encode_positions_grouped)
from .storage import IndexStorage

DOC_ID_PART_SHIFT = 33  # doc_id = (src_part << 33) | local_row

TF_RUN_SCHEMA = ("term string, doc_id long, tf int, dl int, "
                 "positions binary")
DOC_META_SCHEMA = ("doc_id long, repo string, path string, commit string, "
                   "lang string, content_sha256 string, doc_len int, "
                   "src_part int")
MANIFEST_SCHEMA = ("src_part int, status string, docs long, postings long, "
                   "tokens long, seconds double, attempt int")
POSTINGS_SCHEMA = ("term string, shard int, block_ord int, first_doc long, "
                   "last_doc long, doc_count int, sum_tf long, max_tf int, "
                   "block_max_tfnorm double, docs_payload binary, "
                   "tfs_payload binary, dls_payload binary, "
                   "pos_payload binary")


def shard_of_part(src_part: int | np.ndarray, num_parts: int, num_shards: int):
    """Docid-range shard for a source partition (contiguous ranges)."""
    return (np.asarray(src_part, dtype=np.int64) * num_shards) // num_parts


def _spimi_writer(storage: IndexStorage, with_positions: bool, attempt: int):
    """Grouped-map fn: one source partition → SPIMI run + checkpoint."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        t0 = time.time()
        src_part = int(pdf["src_part"].iloc[0])
        pdf = pdf.sort_values(["repo", "path", "commit"], kind="mergesort")
        pdf = pdf.reset_index(drop=True)
        n = len(pdf)
        doc_ids = (np.int64(src_part) << DOC_ID_PART_SHIFT) + np.arange(
            n, dtype=np.int64)

        row_idx, terms, positions = tokenize_flat(pdf["content"])
        # aggregate (doc, term) → tf + position list, vectorized:
        # sort by (row, term, pos); run-length detect (row, term) groups.
        if row_idx.size:
            order = np.lexsort((positions, terms.to_numpy(), row_idx))
            r = row_idx[order]
            t = terms.to_numpy()[order]
            p = positions[order]
            new_grp = np.empty(r.size, dtype=bool)
            new_grp[0] = True
            new_grp[1:] = (r[1:] != r[:-1]) | (t[1:] != t[:-1])
            starts = np.flatnonzero(new_grp)
            tfs = np.diff(np.append(starts, r.size)).astype(np.int32)
            g_row = r[starts]
            g_term = t[starts]
            pos_payloads = (encode_positions_grouped(p, starts)
                            if with_positions else [b""] * starts.size)
            # doc length = #positions (same-position ZWJ annotation terms
            # count once — Lucene norm discountOverlaps semantics)
            dl_per_doc = np.zeros(n, dtype=np.int32)
            np.maximum.at(dl_per_doc, row_idx,
                          (positions + 1).astype(np.int32))
            run = pd.DataFrame({
                "term": g_term,
                "doc_id": doc_ids[g_row],
                "tf": tfs,
                "dl": dl_per_doc[g_row],
                "positions": pos_payloads,
            })
        else:
            dl_per_doc = np.zeros(n, dtype=np.int32)
            run = pd.DataFrame({
                "term": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype=np.int64),
                "tf": pd.Series([], dtype=np.int32),
                "dl": pd.Series([], dtype=np.int32),
                "positions": pd.Series([], dtype=object),
            })

        meta = pd.DataFrame({
            "doc_id": doc_ids,
            "repo": pdf["repo"],
            "path": pdf["path"],
            "commit": pdf["commit"],
            "lang": pdf["lang"],
            "content_sha256": pdf["content_sha256"],
            "doc_len": dl_per_doc,
            "src_part": np.full(n, src_part, dtype=np.int32),
        })

        os.makedirs(storage.tf_runs_dir, exist_ok=True)
        os.makedirs(storage.doc_meta_dir, exist_ok=True)
        os.makedirs(storage.manifest_dir, exist_ok=True)
        run_schema = pa.schema([
            ("term", pa.string()), ("doc_id", pa.int64()),
            ("tf", pa.int32()), ("dl", pa.int32()),
            ("positions", pa.binary()),
        ])
        pq.write_table(
            pa.Table.from_pandas(run, schema=run_schema, preserve_index=False),
            os.path.join(storage.tf_runs_dir, f"part={src_part}.parquet"))
        pq.write_table(
            pa.Table.from_pandas(meta, preserve_index=False),
            os.path.join(storage.doc_meta_dir, f"part={src_part}.parquet"))

        row = {
            "src_part": src_part, "status": "done", "docs": n,
            "postings": len(run), "tokens": int(dl_per_doc.sum()),
            "seconds": time.time() - t0, "attempt": attempt,
        }
        # JSON manifest written LAST = the atomic per-partition commit.
        tmp = storage.manifest_path(src_part) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(row, f)
        os.replace(tmp, storage.manifest_path(src_part))
        return pd.DataFrame([row])

    return fn


def _encode_group(avgdl: float, num_parts: int, num_shards: int,
                  with_positions: bool):
    """Grouped-map fn: (term, shard) posting rows → compressed block rows."""

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        term, shard = key
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64).astype(np.uint64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64).astype(np.uint64)
        dls = pdf["dl"].to_numpy(dtype=np.int64).astype(np.uint64)
        pos_payloads = (list(pdf["positions"]) if with_positions
                        else None)
        blocks = encode_blocks(doc_ids, tfs, dls, avgdl,
                               pos_payloads=pos_payloads,
                               block_size=BLOCK_SIZE)
        out = pd.DataFrame(blocks)
        out.insert(0, "term", term)
        out.insert(1, "shard", int(shard))
        return out

    return fn


def build_index(spark: SparkSession, docs: DataFrame, index_dir: str,
                num_partitions: int | None = None, num_shards: int = 8,
                with_positions: bool = True, resume: bool = True,
                attempt: int = 1) -> IndexStorage:
    """Build (or resume) the inverted index for a docs table.

    ``docs`` must have columns (repo, path, commit, lang, content) —
    the BASELINE.json ``input_hint`` shape.
    """
    storage = IndexStorage(index_dir)
    sc_parallelism = spark.sparkContext.defaultParallelism
    P = num_partitions or max(sc_parallelism, 4)

    prepared = docs.select(
        "repo", "path", "commit", "lang", "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        F.pmod(F.xxhash64("repo", "path", "commit"), F.lit(P))
         .cast("int").alias("src_part"),
    )

    done = storage.completed_partitions() if resume else {}
    if done:
        done_ids = list(done.keys())
        prepared = prepared.filter(~F.col("src_part").isin(done_ids))

    # ---- step A: SPIMI runs, checkpointed per source partition ----------
    manifests = prepared.groupBy("src_part").applyInPandas(
        _spimi_writer(storage, with_positions, attempt), MANIFEST_SCHEMA)
    new_rows = manifests.collect()  # tiny: one row per partition

    # ---- global stats (over ALL partitions incl. previously done) -------
    doc_meta = storage.doc_meta(spark)
    stats = doc_meta.agg(
        F.count("*").alias("n_docs"),
        F.avg("doc_len").alias("avgdl")).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"] or 0.0)

    # ---- step B: term-partitioned merge + block encode (the shuffle) ----
    runs = storage.tf_runs(spark)
    runs = runs.withColumn(
        "shard",
        ((F.shiftright("doc_id", DOC_ID_PART_SHIFT) * num_shards)
         / F.lit(P)).cast("int"))
    postings = runs.groupBy("term", "shard").applyInPandas(
        _encode_group(avgdl, P, num_shards, with_positions),
        POSTINGS_SCHEMA)
    (postings
        .sortWithinPartitions("shard", "term", "first_doc")
        .write.mode("overwrite").partitionBy("shard")
        .parquet(storage.postings_dir))

    # ---- term stats (global df/cf — unlike ES's per-shard idf) ----------
    (spark.read.parquet(storage.postings_dir)
        .groupBy("term")
        .agg(F.sum("doc_count").alias("df"), F.sum("sum_tf").alias("cf"))
        .write.mode("overwrite").parquet(storage.term_stats_dir))

    storage.write_meta({
        "num_partitions": P, "num_shards": num_shards,
        "block_size": BLOCK_SIZE, "k1": K1, "b": B,
        "with_positions": with_positions, "n_docs": n_docs, "avgdl": avgdl,
        "encode_avgdl_min": avgdl,
        "analyzer": "icu-default-v1",
        "built_partitions": len(done) + len(new_rows),
        "resumed_from": len(done),
    })
    return storage
