"""Index mutations: append (S3 upsert path), delete (S4/S5), and the
safety rules that keep query-time pruning correct afterwards.

The reference's mutations are ES row-level ops
(/root/reference/openaleph_search/index/indexer.py:36-51,181-189,
index/entities.py:361-369). Columnar Spark-first equivalents:

* **delete** = tombstones: a small doc_id table subtracted at query
  time (Lucene's own soft-delete design). ``compact()`` folds them in.
* **append** = an incremental build of new source partitions into the
  same layout. Appends change collection stats (N, avgdl) — harmless:
  impact bounds are derived at query time from each block's stored
  (max_tf, min_dl) against the live stats, so pruning stays provably
  sound through any mutation.
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
    if not any(f.endswith(".parquet") for f in storage.io.listdir(d)):
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


def _drop_docs_cogrouped(with_positions: bool):
    """Cogrouped fn (per shard): decode only blocks whose doc range can
    contain a tombstoned id, drop those docs, re-encode (incl. the
    block's min_dl — impact bounds are derived from it live at query
    time, so no bound-refill pass exists).

    Tombstones arrive as the cogroup's right side, so the dead-id set
    stays distributed (sharded), never collected to the driver."""
    import numpy as np
    import pandas as pd
    from .codec import (decode_block, decode_positions,
                        encode_positions, varint_encode)

    def fn(blocks_pdf: pd.DataFrame, dead_pdf: pd.DataFrame
           ) -> pd.DataFrame:
        if blocks_pdf.empty:
            return blocks_pdf
        dead = np.sort(dead_pdf["doc_id"].to_numpy(np.int64))
        if dead.size == 0:
            return blocks_pdf
        lo = np.searchsorted(dead, blocks_pdf["first_doc"].to_numpy())
        hi = np.searchsorted(dead, blocks_pdf["last_doc"].to_numpy(),
                             side="right")
        touched = hi > lo  # block doc range contains ≥1 dead id
        rows = []
        for _, row in blocks_pdf[touched].iterrows():
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
            new["min_dl"] = int(l.min())
            new["docs_payload"] = varint_encode(deltas)
            new["tfs_payload"] = varint_encode(t - np.uint64(1))
            new["dls_payload"] = varint_encode(l)
            new["pos_payload"] = (encode_positions(
                [p for p, k in zip(pos, keep) if k])
                if with_positions else b"")
            rows.append(new)
        parts = [blocks_pdf[~touched]]
        if rows:
            parts.append(pd.DataFrame(rows))
        return pd.concat(parts, ignore_index=True)
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
    """Fold tombstones in and refresh stats/bounds.

    Tombstoned docs are dropped from the packed blocks via a per-shard
    cogroup (the dead-id set stays distributed — no driver collect, no
    closure broadcast); fresh per-field avgdl is recomputed from the
    cleaned field_lens table. Impact bounds need no refill — they are
    derived live at query time from each block's (max_tf, min_dl)."""
    import json as _json

    from .build import DOC_ID_PART_SHIFT, POSTINGS_SCHEMA
    meta = storage.read_meta()
    tombs = read_tombstones(spark, storage)
    if tombs is None:
        return
    S = int(meta["num_shards"])

    doc_meta = storage.doc_meta(spark).join(tombs, "doc_id", "left_anti")
    n_docs = doc_meta.count()
    field_lens = (storage.field_lens(spark)
                  .join(tombs, "doc_id", "left_anti"))

    shard_of = F.pmod(F.shiftright("doc_id", DOC_ID_PART_SHIFT),
                      F.lit(S)).cast("int")
    tombs_sharded = tombs.withColumn("shard", shard_of)
    runs_clean = (storage.tf_runs(spark).groupBy("shard")
                  .cogroup(tombs_sharded.groupBy("shard"))
                  .applyInPandas(
                      lambda key, l, r: _drop_docs_cogrouped(
                          meta["with_positions"])(l, r),
                      POSTINGS_SCHEMA))

    def swap(df_writer, target):
        tmp = target + ".compact"
        df_writer(tmp)
        storage.io.delete_dir(target)
        storage.io.move(tmp, target)

    # order matters: materialize everything reading OLD paths first.
    # LAYOUT v6: runs ARE the postings — one cleaned shard-partitioned
    # write replaces the old tf_runs spool + re-layout pair
    swap(lambda d: (runs_clean
                    .sortWithinPartitions("shard", "term", "first_doc")
                    .write.mode("overwrite").partitionBy("shard")
                    .parquet(d)),
         storage.postings_dir)
    swap(lambda d: doc_meta.write.mode("overwrite").parquet(d),
         storage.doc_meta_dir)
    swap(lambda d: field_lens.write.mode("overwrite").parquet(d),
         storage.field_lens_dir)

    # fresh per-field stats from the cleaned per-doc lengths
    fl_rows = (storage.field_lens(spark).groupBy("field")
               .agg(F.sum("dl").alias("tokens")).collect())
    field_totals = {r["field"]: int(r["tokens"]) for r in fl_rows}
    avgdl_by_field = {f: (t / n_docs if n_docs else 0.0)
                      for f, t in field_totals.items()}
    avgdl = avgdl_by_field.get("content", 0.0)
    swap(lambda d: (spark.read.parquet(storage.postings_dir)
                    .groupBy("term")
                    .agg(F.sum("doc_count").alias("df"),
                         F.sum("sum_tf").alias("cf"))
                    .write.mode("overwrite").parquet(d)),
         storage.term_stats_dir)
    # refresh the per-partition partials too (future appends re-agg them)
    swap(lambda d: spark.read.parquet(storage.term_stats_dir)
         .write.mode("overwrite").parquet(d),
         storage.term_stats_parts_dir)
    # consolidate the per-partition field-stat partials to the
    # post-delete truth (appends re-read these via _read_field_stats)
    for name in storage.io.listdir(storage.manifest_dir):
        if name.startswith("fields_part=") and name.endswith(".json"):
            storage.io.delete_file(
                os.path.join(storage.manifest_dir, name))
    storage.io.write_bytes_atomic(
        os.path.join(storage.manifest_dir, "fields_part=compacted.json"),
        _json.dumps({fn: (n_docs, t)
                     for fn, t in field_totals.items()}).encode())

    meta.update({
        "n_docs": n_docs, "avgdl": avgdl,
        "avgdl_by_field": avgdl_by_field,
    })
    storage.write_meta(meta)
    storage.io.delete_dir(tombstones_dir(storage), missing_ok=True)
