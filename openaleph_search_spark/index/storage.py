"""Index storage layout + readers.

The index is a set of columnar tables under one directory — the Spark
re-expression of an ES index (shards ≈ doc-id-range partitions; segment
files ≈ parquet block rows; cluster state ≈ ``meta.json``).  Written as
plain parquet here; on a cluster the same layout maps 1:1 onto Iceberg
tables (partitioned-by shard) — the container has no Iceberg runtime
jar, so the format is pluggable via ``table_format``.

Layout::

    <index_dir>/
      meta.json            build config: P, num_shards, block_size, k1/b,
                           with_positions, analyzer version, n_docs, avgdl
      manifest/part=K.json per-source-partition checkpoint + lineage
                           (north_rule resumability)
      doc_meta/part=K.parquet
      postings/shard=S/part=K.parquet  SPIMI runs written straight
                           into the final shard layout (LAYOUT v6)
      term_stats/*.parquet
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from .fsio import FsIO


class IndexStorage:
    def __init__(self, index_dir: str):
        self.root = index_dir.rstrip("/")
        # side-channel (non-Spark) I/O goes through pyarrow.fs — the
        # index root may be file:// / hdfs:// / s3://; Spark reads the
        # same URIs through Hadoop FS
        self.io = FsIO(self.root)
        index_dir = self.root
        self.meta_path = os.path.join(index_dir, "meta.json")
        self.manifest_dir = os.path.join(index_dir, "manifest")
        self.doc_meta_dir = os.path.join(index_dir, "doc_meta")
        self.tf_runs_dir = os.path.join(index_dir, "tf_runs")
        self.postings_dir = os.path.join(index_dir, "postings")
        self.term_stats_dir = os.path.join(index_dir, "term_stats")
        self.term_stats_parts_dir = os.path.join(index_dir,
                                                 "term_stats_parts")
        self.field_lens_dir = os.path.join(index_dir, "field_lens")

    # -- meta ---------------------------------------------------------------
    def write_meta(self, meta: dict) -> None:
        self.io.mkdirs(self.root)
        self.io.write_bytes_atomic(
            self.meta_path,
            json.dumps(meta, indent=2, sort_keys=True).encode())

    def read_meta(self) -> dict:
        return json.loads(self.io.read_bytes(self.meta_path))

    def exists(self) -> bool:
        return self.io.exists(self.meta_path)

    # -- manifest (per-partition checkpoints) --------------------------------
    def manifest_path(self, src_part: int) -> str:
        return os.path.join(self.manifest_dir, f"part={src_part}.json")

    def read_json_files(self, dirname: str, prefix: str) -> list[dict]:
        """Read every ``<prefix>*.json`` in a directory — parallel
        driver-side reads (a 100k-partition build on an object store
        would take minutes sequentially); unreadable files skipped."""
        from concurrent.futures import ThreadPoolExecutor
        names = [n for n in self.io.listdir(dirname)
                 if n.startswith(prefix) and n.endswith(".json")]

        def read_one(name):
            try:
                return json.loads(self.io.read_bytes(
                    os.path.join(dirname, name)))
            except (ValueError, OSError, json.JSONDecodeError):
                return None
        if len(names) <= 8:
            rows = [read_one(n) for n in names]
        else:
            with ThreadPoolExecutor(max_workers=32) as pool:
                rows = list(pool.map(read_one, names))
        return [r for r in rows if r is not None]

    def completed_partitions(self) -> dict[int, dict]:
        """Map src_part → manifest row for partitions already built."""
        return {int(row["src_part"]): row
                for row in self.read_json_files(self.manifest_dir,
                                                "part=")
                if row.get("status") == "done" and "src_part" in row}

    # -- table readers --------------------------------------------------------
    def doc_meta(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(os.path.join(self.doc_meta_dir, "*.parquet"))

    def tf_runs(self, spark: SparkSession) -> DataFrame:
        """LAYOUT v6: SPIMI tasks write the final shard layout
        directly — the runs ARE the postings (shard from the hive
        dir). Kept as an alias for the mutation/append paths."""
        return self.postings(spark)

    def postings(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.postings_dir)

    def term_stats(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.term_stats_dir)

    def field_lens(self, spark: SparkSession) -> DataFrame:
        """Per-doc per-field lengths (doc_id, field, dl) — lets
        ``compact()`` recompute exact per-field avgdl after deletes."""
        return spark.read.parquet(
            os.path.join(self.field_lens_dir, "*.parquet"))
