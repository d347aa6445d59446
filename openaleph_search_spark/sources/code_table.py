"""Deterministic source-code document table (the ``input_hint`` shape).

``BASELINE.json`` mandates the index be built over a table
``(repo, path, commit, lang, content)``.  The sandbox's testdata ships a
``documents.parquet`` (doc_id, text, lang, source, n_chars); this module
derives the mandated shape from it **deterministically with Spark
built-ins only** (no RNG, no driver loop), so tests/bench at every
scale factor use the same driver-provided rows as content.

``load_docs`` also supports a ``replicate`` factor for bench runs: each
copy gets a distinct commit (content unchanged), scaling row count
without synthesizing new text.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_EXT = {"en": "py", "fr": "js", "es": "go", "de": "java", "zh": "rs"}


def docs_from_documents(documents: DataFrame, replicate: int = 1) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) → docs table."""
    ext = F.coalesce(
        F.create_map(*[F.lit(x) for kv in _EXT.items() for x in kv])
        [F.col("lang")], F.lit("txt"))
    base = documents.select(
        F.concat(F.lit("org"), F.pmod(F.col("doc_id"), F.lit(7)),
                 F.lit("/project"), F.pmod(F.col("doc_id"), F.lit(23)))
         .alias("repo"),
        F.concat(F.lit("src/"), F.col("source"), F.lit("/mod_"),
                 F.col("doc_id").cast("string"), F.lit("."), ext).alias("path"),
        F.col("doc_id"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    if replicate > 1:
        # spread the (single-file) base across the cluster BEFORE
        # replication so downstream map-side work parallelizes — a real
        # multi-file table arrives pre-partitioned
        spark = documents.sparkSession
        base = base.repartition(spark.sparkContext.defaultParallelism * 2)
        base = base.crossJoin(
            F.broadcast(spark.range(replicate)
                        .select(F.col("id").alias("rep"))))
    else:
        base = base.withColumn("rep", F.lit(0))
    return base.select(
        "repo", "path",
        F.substring(F.sha2(F.concat_ws(
            "|", F.col("doc_id").cast("string"),
            F.col("rep").cast("string")), 256), 1, 40).alias("commit"),
        "lang", "content")


def load_docs(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs_from_documents(documents, replicate=replicate)


def load_table(spark: SparkSession, table: str,
               content_col: str = "content") -> DataFrame:
    """Load the mandated (repo, path, commit, lang, content) shape
    from a CATALOG table — the deployment path for Iceberg inputs
    (``spark.table`` resolves through whatever catalog is configured:
    ``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``
    gives snapshot-isolated scans, partition pruning, and metadata
    column pushdown with zero engine changes here). Column presence
    is validated eagerly so a misconfigured table fails at load, not
    three stages into a build."""
    df = spark.table(table)
    want = ["repo", "path", "commit", "lang", content_col]
    missing = [c for c in want if c not in df.columns]
    if missing:
        raise ValueError(
            f"table {table!r} is missing required columns {missing}; "
            f"have {df.columns}")
    out = df.select(*want)
    return (out.withColumnRenamed(content_col, "content")
            if content_col != "content" else out)
