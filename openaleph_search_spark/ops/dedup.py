"""Deduplication operators for training-data pipelines.

Four tiers, each a first-class distributed operator:

* exact         — sha256 hash-groupBy (one shuffle on the hash)
* MinHash + LSH — shingle → seeded-hash signature (higher-order array
                  exprs, JVM-side) → band buckets → bucket join →
                  exact-Jaccard verification of candidates
* SimHash       — 64-bit weighted-bit fingerprint (vectorized numpy in
                  mapInPandas), Hamming-banded pair generation
* n-gram Jaccard — exact shingle-inverted-index similarity join

Scale notes: every join here is an equi-join on a hash/bucket key, so
Catalyst shuffles on that key and AQE handles skew; stop-shingles (df
above a cap) can be dropped before the pair join to bound fan-out.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from .textstats import tokens_col


def exact_duplicates(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup: groups of byte-identical (post-trim) content.
    → (content_hash, n_docs, doc_ids sorted) for groups with n>1."""
    return (df
            .select(F.col(id_col).alias("doc_id"),
                    F.sha2(F.trim(F.col(text_col)), 256).alias("content_hash"))
            .groupBy("content_hash")
            .agg(F.count("*").alias("n_docs"),
                 F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
            .filter(F.col("n_docs") > 1))


def _token_set(text_col: str):
    return F.array_distinct(tokens_col(F.col(text_col)))


def minhash_signature(tokens_col_name: str, num_hashes: int):
    """MinHash signature as an array<long> column: h_i = min over tokens
    of xxhash64(token, seed_i). Pure higher-order functions — JVM-side."""
    return F.expr(
        f"transform(sequence(0, {num_hashes - 1}), "
        f"i -> array_min(transform({tokens_col_name}, "
        f"t -> xxhash64(t, i))))")


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      bands: int = 16, threshold: float = 0.9) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified by exact
    Jaccard on token sets.

    LSH recall at j ≥ 0.9 with 16 bands × 4 rows: miss probability
    (1 − 0.9⁴)¹⁶ ≈ 3e-4 per pair; identical sets are always caught.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    rows = num_hashes // bands
    base = (df.select(F.col(id_col).alias("doc_id"),
                      _token_set(text_col).alias("_toks"))
            .filter(F.size("_toks") > 0)
            .withColumn("sig", minhash_signature("_toks", num_hashes)))
    banded = base.select(
        "doc_id",
        F.explode(F.expr(
            f"transform(sequence(0, {bands - 1}), "
            f"b -> struct(b as band, "
            f"xxhash64(array_join(transform(sequence(b*{rows}, "
            f"b*{rows}+{rows - 1}), i -> cast(sig[i] as string)), ',')) "
            f"as bh))")).alias("bb"))
    # candidate pairs: docs sharing any (band, band-hash) bucket
    left = banded.select("doc_id", "bb")
    right = banded.select(F.col("doc_id").alias("doc_id_b"),
                          F.col("bb").alias("bb_b"))
    cand = (left.join(right, (left["bb"] == right["bb_b"])
                      & (left["doc_id"] < right["doc_id_b"]))
            .select(F.col("doc_id").alias("id_a"),
                    F.col("doc_id_b").alias("id_b"))
            .distinct())
    # exact verification: jaccard over token sets
    toks = base.select("doc_id", "_toks")
    verified = (cand
                .join(toks.withColumnRenamed("doc_id", "id_a")
                          .withColumnRenamed("_toks", "toks_a"), "id_a")
                .join(toks.withColumnRenamed("doc_id", "id_b")
                          .withColumnRenamed("_toks", "toks_b"), "id_b")
                .withColumn("inter",
                            F.size(F.array_intersect("toks_a", "toks_b")))
                .withColumn("jaccard", F.round(
                    F.col("inter") / (F.size("toks_a") + F.size("toks_b")
                                      - F.col("inter")), 6)))
    return (verified.filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def _simhash_batch(it):
    """mapInPandas: 64-bit SimHash over token sets, fully vectorized —
    one flat hash pass + np.add.at bit voting per batch."""
    shifts = np.arange(64, dtype=np.uint64)
    for pdf in it:
        n = len(pdf)
        counts = pdf["_toks"].str.len().fillna(0).astype(np.int64).to_numpy()
        sims = np.zeros(n, dtype=np.uint64)
        nz = counts > 0
        if nz.any():
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in pdf["_toks"][nz]])
            doc_idx = np.repeat(np.flatnonzero(nz), counts[nz])
            h = pd.util.hash_array(flat, hash_key="simhash000000000")
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            votes = np.zeros((n, 64), dtype=np.int64)
            np.add.at(votes, doc_idx, 2 * bits - 1)
            sims = ((votes > 0).astype(np.uint64) << shifts).sum(
                axis=1, dtype=np.uint64)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].to_numpy(),
            "simhash": sims.astype(np.int64)})


def simhash(df: DataFrame, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """→ (doc_id, simhash long)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     _token_set(text_col).alias("_toks"))
    return base.mapInPandas(_simhash_batch, "doc_id long, simhash long")


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs: Hamming(simhash) ≤ max_hamming, found by banding
    the 64 bits into 4 × 16-bit chunks (pigeonhole: any pair within
    Hamming 3 shares ≥1 exact chunk) and verifying with bit_count."""
    sh = simhash(df, id_col, text_col)
    chunks = sh.select(
        "doc_id", "simhash",
        F.explode(F.expr(
            "transform(sequence(0, 3), "
            "c -> struct(c as chunk, "
            "shiftright(simhash, c * 16) & 65535 as v))"
        )).alias("ch"))
    right = chunks.select(F.col("doc_id").alias("id_b"),
                          F.col("simhash").alias("sim_b"),
                          F.col("ch").alias("ch_b"))
    cand = (chunks.join(right, (chunks["ch"] == right["ch_b"])
                        & (chunks["doc_id"] < right["id_b"]))
            .select(F.col("doc_id").alias("id_a"), "id_b",
                    F.col("simhash").alias("sim_a"), "sim_b")
            .distinct())
    return (cand.withColumn(
                "hamming",
                F.expr("bit_count(sim_a ^ sim_b)").cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8,
                        stop_shingle_df: int | None = None) -> DataFrame:
    """Exact n-token-shingle Jaccard similarity join via a shingle
    inverted index: explode shingles → self-join on shingle → count
    common → |A∩B| / (|A|+|B|−|A∩B|).

    ``stop_shingle_df`` drops shingles appearing in more than that many
    docs before the pair join (bounds the quadratic fan-out on hot
    shingles — the same role as hot-term salting in the index build).
    """
    toks = tokens_col(F.col(text_col))
    base = (df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
            .filter(F.size("_t") >= n)
            .withColumn("shingles", F.array_distinct(F.expr(
                f"transform(sequence(0, size(_t) - {n}), "
                f"i -> array_join(slice(_t, i + 1, {n}), ' '))"))))
    sizes = base.select("doc_id", F.size("shingles").alias("n_sh"))
    inv = base.select("doc_id", F.explode("shingles").alias("sh"))
    if stop_shingle_df is not None:
        hot = (inv.groupBy("sh").count()
               .filter(F.col("count") > stop_shingle_df).select("sh"))
        inv = inv.join(F.broadcast(hot), "sh", "left_anti")
    right = inv.select(F.col("doc_id").alias("id_b"), F.col("sh"))
    common = (inv.alias("l")
              .join(right.alias("r"),
                    (F.col("l.sh") == F.col("r.sh"))
                    & (F.col("l.doc_id") < F.col("r.id_b")))
              .groupBy(F.col("l.doc_id").alias("id_a"), F.col("r.id_b"))
              .agg(F.count("*").alias("inter")))
    return (common
            .join(sizes.withColumnRenamed("doc_id", "id_a")
                       .withColumnRenamed("n_sh", "n_a"), "id_a")
            .join(sizes.withColumnRenamed("doc_id", "id_b")
                       .withColumnRenamed("n_sh", "n_b"), "id_b")
            .withColumn("jaccard", F.round(
                F.col("inter") / (F.col("n_a") + F.col("n_b")
                                  - F.col("inter")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
