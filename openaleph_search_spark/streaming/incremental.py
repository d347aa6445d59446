"""Incremental index maintenance via Structured Streaming.

The reference's near-real-time story is ES's 1 s refresh
(/root/reference/openaleph_search/settings.py:57) — out of scope for
the batch north_rule, but the natural Spark-first extension: a
``foreachBatch`` sink that appends each micro-batch of new documents to
the index as fresh source partitions (SURVEY.md §2.5 streaming note).

Safety: appends change collection stats; ``meta.encode_avgdl_min``
records the smallest avgdl any block was encoded under — the executor
keeps block-max pruning only while current avgdl ≤ that bound (bounds
stay true upper bounds), else it degrades to exact full evaluation
until ``mutate.compact()`` re-encodes.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index.build import (MANIFEST_SCHEMA, POSTINGS_SCHEMA,
                           _spimi_writer, fill_block_max)
from ..index.storage import IndexStorage


def append_batch(spark: SparkSession, docs: DataFrame, index_dir: str,
                 epoch_id: int) -> None:
    """Index one micro-batch: new src_part namespace per epoch, same
    SPIMI packed-block pipeline, postings appended, stats refreshed."""
    storage = IndexStorage(index_dir)
    meta = storage.read_meta()
    P = meta["num_partitions"]
    S = meta["num_shards"]
    # epoch partitions live above the base namespace → doc ids unique
    base_part = (max(storage.completed_partitions(), default=P - 1) + 1)

    prepared = docs.select(
        "repo", "path", "commit", "lang", "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        (F.lit(base_part) + F.pmod(
            F.xxhash64("repo", "path", "commit"), F.lit(P)))
        .cast("int").alias("src_part"))
    (prepared.groupBy("src_part")
     .applyInPandas(_spimi_writer(storage, meta["with_positions"], 1,
                                  lambda sp: sp % S),
                    MANIFEST_SCHEMA)).collect()

    doc_meta = storage.doc_meta(spark)
    stats = doc_meta.agg(F.count("*").alias("n"),
                         F.avg("doc_len").alias("a")).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["a"] or 0.0)

    # append ONLY the new partitions' blocks (their doc ids sit above
    # the base namespace, so within-(term,shard) sortedness holds)
    runs = (storage.tf_runs(spark)
            .filter(F.shiftright("first_doc", 33) >= base_part))
    postings = runs.mapInPandas(fill_block_max(avgdl), POSTINGS_SCHEMA)
    (postings.sortWithinPartitions("shard", "term", "first_doc")
     .write.mode("append").partitionBy("shard")
     .parquet(storage.postings_dir))

    (spark.read.parquet(
        os.path.join(storage.term_stats_parts_dir, "*.parquet"))
     .groupBy("term")
     .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
     .write.mode("overwrite").parquet(storage.term_stats_dir))

    meta.update({
        "n_docs": n_docs, "avgdl": avgdl,
        "encode_avgdl_min": min(meta.get("encode_avgdl_min",
                                         meta["avgdl"]), avgdl),
        "built_partitions": meta.get("built_partitions", 0) + 1,
    })
    storage.write_meta(meta)


def stream_index(spark: SparkSession, docs_stream: DataFrame,
                 index_dir: str, checkpoint_dir: str | None = None,
                 trigger_seconds: int = 5):
    """Attach the append sink to a streaming docs source.
    → StreamingQuery (caller drives/stops it)."""
    checkpoint = checkpoint_dir or os.path.join(index_dir, "_checkpoint")
    return (docs_stream.writeStream
            .foreachBatch(lambda df, eid: append_batch(
                df.sparkSession, df, index_dir, eid))
            .option("checkpointLocation", checkpoint)
            .trigger(processingTime=f"{trigger_seconds} seconds")
            .start())
