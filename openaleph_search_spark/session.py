"""Recommended SparkSession configuration for this engine.

Local mode for tests/bench; on a cluster, drop the ``master`` override
and submit with ``--py-files dist/openaleph_search_spark.zip``.
"""
from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(app_name: str = "openaleph-search-spark",
              local_cores: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    b = SparkSession.builder.appName(app_name)
    if local_cores:
        b = b.master(f"local[{local_cores}]")
        b = b.config("spark.sql.shuffle.partitions",
                     str(shuffle_partitions or max(local_cores, 8)))
    elif shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions",
                     str(shuffle_partitions))
    return (b
            .config("spark.sql.session.timeZone", "UTC")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled",
                    "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .getOrCreate())
