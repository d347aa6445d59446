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


def compact(spark: SparkSession, storage: IndexStorage,
            num_shards: int | None = None) -> None:
    """Fold tombstones in and refresh stats/bounds: rebuild from the
    surviving doc_meta + the original source rows are NOT needed —
    postings are rewritten by filtering tombstoned doc_ids out of
    tf_runs and re-encoding (same one-shuffle pipeline as the build)."""
    from .build import DOC_ID_PART_SHIFT, POSTINGS_SCHEMA, _encode_group
    meta = storage.read_meta()
    tombs = read_tombstones(spark, storage)
    if tombs is None:
        return
    P = meta["num_partitions"]
    S = num_shards or meta["num_shards"]

    runs = storage.tf_runs(spark).join(tombs, "doc_id", "left_anti")
    doc_meta = storage.doc_meta(spark).join(tombs, "doc_id", "left_anti")
    stats = doc_meta.agg(F.count("*").alias("n"),
                         F.avg("doc_len").alias("a")).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["a"] or 0.0)

    runs = runs.withColumn(
        "shard", ((F.shiftright("doc_id", DOC_ID_PART_SHIFT) * S)
                  / F.lit(P)).cast("int"))
    postings = runs.groupBy("term", "shard").applyInPandas(
        _encode_group(avgdl, P, S, meta["with_positions"]),
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
    runs_clean = storage.tf_runs(spark).join(tombs, "doc_id", "left_anti")
    swap(lambda d: runs_clean.write.mode("overwrite").parquet(d),
         storage.tf_runs_dir)
    (spark.read.parquet(storage.postings_dir)
     .groupBy("term")
     .agg(F.sum("doc_count").alias("df"), F.sum("sum_tf").alias("cf"))
     .write.mode("overwrite").parquet(storage.term_stats_dir))
    meta.update({"n_docs": n_docs, "avgdl": avgdl,
                 "encode_avgdl_min": avgdl})
    storage.write_meta(meta)
    shutil.rmtree(tombstones_dir(storage), ignore_errors=True)
