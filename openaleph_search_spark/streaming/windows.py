"""Streaming analytics operators (SURVEY §2.5 extension).

The reference's near-real-time story is ES's refresh interval; the
Spark-first equivalents are Structured Streaming primitives:

* ``windowed_event_counts`` — watermarked tumbling/sliding windows with
  late-data tolerance (the date_histogram of a stream).
* ``sessionize`` — a CUSTOM stateful operator via
  ``applyInPandasWithState``: gap-based sessions per key (update mode;
  running sessions re-emit as they grow, gaps finalize them). This is
  the pattern slot for any stateful per-entity streaming logic the
  built-in operators can't express.

Both run identically on a bounded DataFrame (tests exercise the
streaming path through a file source + ``processAllAvailable``).
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import (GroupState,
                                         GroupStateTimeout)

SESSION_SCHEMA = ("key string, session_start timestamp, "
                  "session_end timestamp, n_events long, closed boolean")


def windowed_event_counts(events: DataFrame, ts_col: str = "ts",
                          key_col: str | None = "event_type",
                          window: str = "1 hour",
                          slide: str | None = None,
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked windowed counts: late rows beyond ``watermark`` are
    dropped, windows finalize incrementally (append-capable sink).
    Works on both streaming and batch inputs."""
    # watermarks require TIMESTAMP (parquet often stores NTZ)
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    win = (F.window(F.col(ts_col), window, slide) if slide
           else F.window(F.col(ts_col), window))
    keys = [win] + ([F.col(key_col)] if key_col else [])
    return (src.groupBy(*keys)
            .agg(F.count("*").alias("count"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *([key_col] if key_col else []),
                    "count"))


def _session_fn(gap_ms: int, timeout_ms: int):
    """applyInPandasWithState fn: per-key gap sessionization."""
    def fn(key, pdfs, state: GroupState):
        (k,) = key
        ts = []
        for pdf in pdfs:
            ts.extend(int(x.value // 10**6)
                      for x in pd.to_datetime(pdf["ts"]))
        ts.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start, end, n = ts[0], ts[0], 0
        out = []
        for t in ts:
            if t - end > gap_ms:
                out.append((start, end, n, True))  # close old session
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        state.update((start, end, n))
        rows = out + [(start, end, n, False)]  # open session snapshot
        yield pd.DataFrame({
            "key": k,
            "session_start": [pd.Timestamp(s, unit="ms") for s, _, _, _
                              in rows],
            "session_end": [pd.Timestamp(e, unit="ms") for _, e, _, _
                            in rows],
            "n_events": [x for _, _, x, _ in rows],
            "closed": [c for _, _, _, c in rows]})
    return fn


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", gap: str = "30 minutes",
               idle_timeout: str = "1 hour") -> DataFrame:
    """Gap-based sessionization — the custom stateful operator shape
    (``applyInPandasWithState``, update mode): events more than ``gap``
    apart start a new session. Emits the running session snapshot
    (closed=False, re-emitted as it grows — update-mode semantics) and
    finalized sessions (closed=True) when a gap splits them."""
    def to_ms(spec: str) -> int:
        n, unit = spec.split()
        mult = {"second": 1000, "seconds": 1000,
                "minute": 60_000, "minutes": 60_000,
                "hour": 3_600_000, "hours": 3_600_000}[unit]
        return int(n) * mult

    src = events.select(F.col(key_col).cast("string").alias("key"),
                        F.col(ts_col).alias("ts"))
    return (src.groupBy("key")
            .applyInPandasWithState(
                _session_fn(to_ms(gap), to_ms(idle_timeout)),
                outputStructType=SESSION_SCHEMA,
                stateStructType="start long, end long, n long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
