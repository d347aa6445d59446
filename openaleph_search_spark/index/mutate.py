"""Index mutations: append (S3 upsert path), delete (S4/S5), and the
safety rules that keep query-time pruning correct afterwards.

The reference's mutations are ES row-level ops
(/root/reference/openaleph_search/index/indexer.py:36-51,181-189,
index/entities.py:361-369). Columnar Spark-first equivalents:

* **delete** = tombstones: a small doc_id table subtracted at query
  time (Lucene's own soft-delete design). ``compact()`` folds them in.
* **append** = an incremental build of new source partitions into the
  same layout. Appends change collection stats (N, avgdl); encoded
  ``block_max_tfnorm`` used avgdl-at-encode-time, so if avgdl GROWS the
  stored bounds may understate true scores → the executor disables
  block-max pruning when ``meta.avgdl > meta.encode_avgdl_min`` (exact
  results always; speed recovers after ``compact()``).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .storage import IndexStorage


def tombstones_dir(storage: IndexStorage) -> str:
    return os.path.join(storage.root, "tombstones")


def read_tombstones(spark: SparkSession,
                    storage: IndexStorage) -> DataFrame | None:
    d = tombstones_dir(storage)
    if not os.path.isdir(d) or not any(
            f.endswith(".parquet") for f in os.listdir(d)):
        return None
    return spark.read.parquet(d).select("doc_id").distinct()


def delete_docs(spark: SparkSession, storage: IndexStorage,
                predicate) -> int:
    """S4 delete-by-query: append matching doc_ids to the tombstone
    table. Returns the number of newly tombstoned docs."""
    victims = storage.doc_meta(spark).filter(predicate).select("doc_id")
    existing = read_tombstones(spark, storage)
    if existing is not None:
        victims = victims.join(existing, "doc_id", "left_anti")
    n = victims.count()
    if n:
        victims.write.mode("append").parquet(tombstones_dir(storage))
    return n


def delete_by_ids(spark: SparkSession, storage: IndexStorage,
                  doc_ids: list[int]) -> int:
    """S5 delete-by-id."""
    return delete_docs(spark, storage, F.col("doc_id").isin(doc_ids))


def _drop_docs_from_blocks(dead_ids, avgdl: float, with_positions: bool):
    """mapInPandas fn: decode each packed block, drop tombstoned docs,
    re-encode, refresh the impact bound with the post-delete avgdl."""
    import numpy as np
    import pandas as pd
    from .codec import (bm25_tfnorm, decode_block, decode_positions,
                        encode_positions, varint_encode)

    dead = np.sort(np.asarray(dead_ids, dtype=np.int64))

    def fn(it):
        for pdf in it:
            rows = []
            for _, row in pdf.iterrows():
                d, t, l = decode_block(row)
                keep = ~np.isin(d.astype(np.int64), dead,
                                assume_unique=True)
                if keep.all():
                    rows.append(row)
                    continue
                if not keep.any():
                    continue
                pos = (decode_positions(row["pos_payload"], t)
                       if with_positions else None)
                d, t, l = d[keep], t[keep], l[keep]
                deltas = np.empty_like(d)
                deltas[0] = d[0]
                np.subtract(d[1:], d[:-1], out=deltas[1:])
                new = row.copy()
                new["first_doc"] = int(d[0])
                new["last_doc"] = int(d[-1])
                new["doc_count"] = int(d.size)
                new["sum_tf"] = int(t.sum())
                new["max_tf"] = int(t.max())
                new["block_max_tfnorm"] = float(
                    bm25_tfnorm(t, l, avgdl).max())
                new["docs_payload"] = varint_encode(deltas)
                new["tfs_payload"] = varint_encode(t - np.uint64(1))
                new["dls_payload"] = varint_encode(l)
                new["pos_payload"] = (encode_positions(
                    [p for p, k in zip(pos, keep) if k])
                    if with_positions else b"")
                rows.append(new)
            yield (pd.DataFrame(rows) if rows
                   else pdf.iloc[0:0])
    return fn


def upsert_docs(spark: SparkSession, storage: IndexStorage,
                docs: DataFrame) -> None:
    """S3 upsert: tombstone any existing rows with the same
    (repo, path, commit) identity, then append the new versions as an
    incremental batch (delete + append ≈ ES index_safe)."""
    from ..streaming.incremental import append_batch
    keys = docs.select("repo", "path", "commit")
    existing = (storage.doc_meta(spark)
                .join(keys, ["repo", "path", "commit"], "left_semi")
                .select("doc_id"))
    n = existing.count()
    if n:
        existing.write.mode("append").parquet(tombstones_dir(storage))
    append_batch(spark, docs, storage.root, epoch_id=-1)


def export_index(spark: SparkSession, storage: IndexStorage,
                 include_stats: bool = True) -> DataFrame:
    """S6 full export: every live doc's metadata (the reference's
    scroll-based action export, /root/reference/openaleph_search/index/
    export.py:15-96 — Spark is already batch, no scroll machinery)."""
    dm = storage.doc_meta(spark)
    tombs = read_tombstones(spark, storage)
    if tombs is not None:
        dm = dm.join(tombs, "doc_id", "left_anti")
    return dm


def compact(spark: SparkSession, storage: IndexStorage) -> None:
    """Fold tombstones in and refresh stats/bounds: packed blocks are
    decoded, tombstoned docs dropped, re-encoded in place (doc-range
    layout unchanged — no shuffle at all)."""
    from .build import POSTINGS_SCHEMA, fill_block_max
    meta = storage.read_meta()
    tombs = read_tombstones(spark, storage)
    if tombs is None:
        return

    doc_meta = storage.doc_meta(spark).join(tombs, "doc_id", "left_anti")
    stats = doc_meta.agg(F.count("*").alias("n"),
                         F.avg("doc_len").alias("a")).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["a"] or 0.0)

    # deletes are a small fraction by assumption; ids broadcast via the
    # task closure (a cogrouped variant drops this limit if ever needed)
    dead_ids = [r["doc_id"] for r in tombs.collect()]
    postings = storage.postings(spark).mapInPandas(
        _drop_docs_from_blocks(dead_ids, avgdl, meta["with_positions"]),
        POSTINGS_SCHEMA)
    runs_clean_src = storage.tf_runs(spark).mapInPandas(
        _drop_docs_from_blocks(dead_ids, avgdl, meta["with_positions"]),
        POSTINGS_SCHEMA)
    import shutil

    def swap(df_writer, target):
        tmp = target + ".compact"
        df_writer(tmp)
        shutil.rmtree(target)
        os.replace(tmp, target)

    swap(lambda d: (postings
                    .sortWithinPartitions("shard", "term", "first_doc")
                    .write.mode("overwrite").partitionBy("shard")
                    .parquet(d)),
         storage.postings_dir)
    # fold tombstones out of doc_meta and tf_runs too (so later resumes
    # / re-encodes can't resurrect deleted docs)
    swap(lambda d: doc_meta.write.mode("overwrite").parquet(d),
         storage.doc_meta_dir)
    swap(lambda d: runs_clean_src.write.mode("overwrite").parquet(d),
         storage.tf_runs_dir)
    (spark.read.parquet(storage.postings_dir)
     .groupBy("term")
     .agg(F.sum("doc_count").alias("df"), F.sum("sum_tf").alias("cf"))
     .write.mode("overwrite").parquet(storage.term_stats_dir))
    # refresh the per-partition partials too (future appends re-agg them)
    swap(lambda d: spark.read.parquet(storage.term_stats_dir)
         .write.mode("overwrite").parquet(d),
         storage.term_stats_parts_dir)
    meta.update({"n_docs": n_docs, "avgdl": avgdl,
                 "encode_avgdl_min": avgdl})
    storage.write_meta(meta)
    shutil.rmtree(tombstones_dir(storage), ignore_errors=True)
