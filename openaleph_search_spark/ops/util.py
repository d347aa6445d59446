"""Shared helpers for the ops package."""
from __future__ import annotations

from pyspark.sql import DataFrame


def rebalance_small(df: DataFrame, cheap_kernel_bytes: int = 0
                    ) -> DataFrame:
    """Spread an under-partitioned batch input across all cores.

    A small input (fewer partitions than cores — e.g. one parquet
    file) would run a heavy mapInPandas/pandas-UDF kernel on a single
    task while every other core idles. Repartition to
    defaultParallelism in exactly that case; at corpus scale
    partitions >> cores, so this never fires and the data never takes
    an extra shuffle. Guarded off for streaming plans (``.rdd`` is
    illegal there).

    ``cheap_kernel_bytes``: for kernels whose per-byte cost is tiny
    (a dense matmul, not tokenization), a repartition shuffle of a
    small input costs more wall-clock than just running the few tasks
    as-is — when the optimizer's size estimate is below this bound,
    skip the shuffle. 0 (default) keeps the old behavior."""
    if df.isStreaming:
        return df
    if cheap_kernel_bytes > 0:
        try:
            est = int(df._jdf.queryExecution().optimizedPlan()
                      .stats().sizeInBytes())
        except Exception:
            est = None
        if est is not None and 0 <= est <= cheap_kernel_bytes:
            return df
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
