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


DEDUP_SCHEMA = "doc_id long, content_hash string, is_duplicate boolean"


def _dedup_fn():
    """applyInPandasWithState fn: per-bucket seen-hash set. Only
    (doc_id, hash) rows reach the operator — document text never
    shuffles."""
    def fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        start = len(seen)
        for pdf in pdfs:
            hs = pdf["content_hash"]
            dup = hs.map(seen.__contains__)
            # mark THEN add, batch-order: the first copy of each new
            # hash in this bucket is the non-duplicate
            for h in hs[~dup.to_numpy(bool)].drop_duplicates():
                seen.add(h)
            dup = dup | hs.duplicated(keep="first")
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "content_hash": hs,
                                "is_duplicate": dup.to_numpy(bool)})
        if len(seen) != start:
            state.update((sorted(seen),))
    return fn


def dedup_stream(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 n_buckets: int = 256) -> DataFrame:
    """Streaming exact dedup: flag every doc whose (trimmed) content
    sha256 was already seen — earlier in the stream or earlier in the
    same micro-batch. Exactly one copy of each distinct hash is ever
    emitted with ``is_duplicate=False``.

    Shape: the hash is computed JVM-side (``sha2``) before the
    stateful operator, rows shuffle on a ``n_buckets``-way hash-prefix
    key (so state is spread across executors and per-group state
    stays small), and only (doc_id, hash) ever reaches Python. State
    per bucket is the sorted seen-hash list — it grows with distinct
    content forever (that is the operator's contract: register once,
    dedup forever); at cluster scale back it with the RocksDB state
    store (`spark.sql.streaming.stateStore.providerClass`) so seen
    sets page to disk instead of executor heap.

    Works identically on a bounded DataFrame (batch parity =
    ``row_number() over (partition by hash order by doc_id) > 1`` up
    to which copy is flagged first; the flagged COUNT per hash is
    always identical)."""
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(F.trim(F.col(text_col)), 256).alias("content_hash"),
        (F.abs(F.xxhash64(F.sha2(F.trim(F.col(text_col)), 256)))
         % n_buckets).alias("bucket"))
    return (hashed.groupBy("bucket")
            .applyInPandasWithState(
                _dedup_fn(),
                outputStructType=DEDUP_SCHEMA,
                stateStructType="hashes array<string>",
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
