"""Shared helpers for the ops package."""
from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_small(df: DataFrame) -> DataFrame:
    """Spread an under-partitioned batch input across all cores.

    A small input (fewer partitions than cores — e.g. one parquet
    file) would run a heavy mapInPandas/pandas-UDF kernel on a single
    task while every other core idles. Repartition to
    defaultParallelism in exactly that case; at corpus scale
    partitions >> cores, so this never fires and the data never takes
    an extra shuffle. Guarded off for streaming plans (``.rdd`` is
    illegal there)."""
    if df.isStreaming:
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
