"""Aggregations (facets) — reference §2.4 A1-A8, Spark-first.

Every function takes and returns DataFrames and composes with any
filter predicate; Catalyst handles partial→final aggregation (the
ES shard→coordinator reduce) and columnar scans (the ES doc_values)
for free (SURVEY.md §4.2).

Shapes mirror /root/reference/openaleph_search/query/base.py:146-323
and the assertions in /root/reference/tests/test_search.py:26-154,620-676.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def terms_facet(df: DataFrame, field: str, size: int = 20) -> DataFrame:
    """A1: top-N value counts, count desc then key asc
    (base.py:151-159). Multi-valued (array) fields are exploded first."""
    col = df.schema[field].dataType.typeName()
    src = df.withColumn(field, F.explode(field)) if col == "array" else df
    return (src.filter(F.col(field).isNotNull())
            .groupBy(F.col(field).alias("value"))
            .agg(F.count("*").alias("count"))
            .orderBy(F.desc("count"), F.asc("value"))
            .limit(size))


def cardinality(df: DataFrame, field: str, exact: bool = True) -> DataFrame:
    """A2: distinct count (ES HLL++ cardinality; exact variant for
    deterministic tests, ``approx_count_distinct`` for scale)."""
    agg = (F.countDistinct(field) if exact
           else F.approx_count_distinct(field))
    return df.agg(agg.alias("cardinality"))


_INTERVALS = {"year": "year", "quarter": "quarter", "month": "month",
              "week": "week", "day": "day", "hour": "hour"}


def date_histogram(df: DataFrame, field: str, interval: str = "year",
                   gte=None, lte=None, min_doc_count: int = 0) -> DataFrame:
    """A3: calendar buckets with ``min_doc_count: 0`` empty-bucket
    generation over extended bounds (base.py:167-211).

    Empty buckets come from a ``sequence()`` frame joined against the
    counts — no driver loop, and the sequence side is tiny (broadcast).
    """
    unit = _INTERVALS[interval]
    src = df
    if gte is not None:
        src = src.filter(F.col(field) >= F.lit(gte))
    if lte is not None:
        src = src.filter(F.col(field) <= F.lit(lte))
    counts = (src.filter(F.col(field).isNotNull())
              .groupBy(F.date_trunc(unit, F.col(field)).alias("bucket"))
              .agg(F.count("*").alias("count")))
    if min_doc_count == 0:
        bounds = src.agg(
            F.date_trunc(unit, F.min(field)).alias("lo"),
            F.date_trunc(unit, F.max(field)).alias("hi"))
        if gte is not None:
            bounds = bounds.select(
                F.date_trunc(unit, F.lit(gte).cast("timestamp")).alias("lo"),
                "hi")
        if lte is not None:
            bounds = bounds.select(
                "lo",
                F.date_trunc(unit, F.lit(lte).cast("timestamp")).alias("hi"))
        frame = bounds.select(F.explode(F.sequence(
            "lo", "hi", F.expr(f"interval 1 {unit}"))).alias("bucket"))
        counts = (frame.join(counts, "bucket", "left")
                  .select("bucket",
                          F.coalesce("count", F.lit(0)).alias("count")))
    return counts.orderBy("bucket")


def histogram_facet(df: DataFrame, field: str, interval: str) -> DataFrame:
    """A3 through the search surface: calendar intervals for
    date/timestamp columns (ES date_histogram), numeric interval width
    otherwise (ES histogram). → (bucket, count) ordered by bucket."""
    if interval in _INTERVALS:
        return date_histogram(df, field, interval)
    width = float(interval)
    bucket = (F.floor(F.col(field) / F.lit(width)) * F.lit(width))
    return (df.filter(F.col(field).isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count("*").alias("count"))
            .orderBy("bucket"))


_METRIC_FNS = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max,
               "count": F.count}


def metric_aggs(df: DataFrame, metrics: dict[str, list[str]],
                group_by: list[str] | None = None) -> DataFrame:
    """A4: sum/avg/min/max over numeric columns, optionally nested in
    buckets (base.py:212-224,314-322)."""
    aggs = [
        _METRIC_FNS[op](c).alias(f"{op}_{c}")
        for op, cols in metrics.items() for c in cols]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)


def significant_terms(fg: DataFrame, bg: DataFrame, field: str,
                      size: int = 20, min_doc_count: int = 1) -> DataFrame:
    """A5: terms over-represented in the foreground vs the background,
    JLH-style score = (fg%-bg%) * (fg%/bg%) (base.py:240-293).

    The two groupBys run map-side-partial; the per-term join is on the
    (small) top candidate set.
    """
    fg_total = fg.count()
    bg_total = bg.count()
    if fg_total == 0 or bg_total == 0:
        return fg.sparkSession.createDataFrame(
            [], "value string, fg_count long, bg_count long, score double")
    fgc = (fg.groupBy(F.col(field).alias("value"))
           .agg(F.count("*").alias("fg_count"))
           .filter(F.col("fg_count") >= min_doc_count))
    bgc = (bg.groupBy(F.col(field).alias("value"))
           .agg(F.count("*").alias("bg_count")))
    joined = fgc.join(bgc, "value", "left").fillna(0, ["bg_count"])
    fg_pct = F.col("fg_count") / F.lit(float(fg_total))
    bg_pct = (F.col("bg_count") + F.lit(1.0)) / F.lit(float(bg_total) + 1.0)
    score = (fg_pct - bg_pct) * (fg_pct / bg_pct)
    return (joined.withColumn("score", score)
            .filter(F.col("score") > 0)
            .orderBy(F.desc("score"), F.asc("value"))
            .limit(size))


def significant_text(fg_docs: DataFrame, bg_docs: DataFrame,
                     text_col: str = "content", size: int = 20,
                     sample_fraction: float | None = 0.1,
                     sample_key: str | None = None,
                     min_doc_count: int = 1) -> DataFrame:
    """A6: significant_text — re-analyze the (sampled) foreground docs'
    text and score tokens against the background corpus
    (base.py:295-312; ``filter_duplicate_text`` ≈ per-doc distinct
    tokens). Built on the same JLH scoring as A5."""
    from ..analysis.analyzer import tokenize_flat
    import pandas as pd

    def explode_tokens(it):
        for pdf in it:
            ridx, terms, _ = tokenize_flat(pdf[text_col])
            if len(terms) == 0:
                yield pd.DataFrame({"doc": [], "token": []})
                continue
            out = pd.DataFrame({"doc": ridx, "token": terms.to_numpy()})
            yield out.drop_duplicates()  # filter_duplicate_text per doc

    def tokens_of(df, key):
        if sample_fraction and sample_key:
            df = deterministic_sample(df, sample_key, sample_fraction)
        return df.select(text_col).mapInPandas(
            explode_tokens, "doc long, token string")

    fg_tok = tokens_of(fg_docs, sample_key)
    bg_tok = tokens_of(bg_docs, sample_key)
    return significant_terms(fg_tok, bg_tok, "token", size=size,
                             min_doc_count=min_doc_count)


def deterministic_sample(df: DataFrame, key: str, fraction: float) -> DataFrame:
    """A7 sampler, made reproducible: hash-mod sampling on a key column
    instead of RNG (ES random_sampler's role, base.py:359-369)."""
    buckets = max(1, int(round(1.0 / fraction)))
    return df.filter(F.pmod(F.xxhash64(F.col(key)), F.lit(buckets)) == 0)


def diversified_sample(df: DataFrame, diversity_field: str,
                       order_field: str, cap: int) -> DataFrame:
    """A7 diversified_sampler: at most ``cap`` rows per diversity value
    (base.py:339-358) via a per-group row_number window."""
    from pyspark.sql import Window
    w = (Window.partitionBy(diversity_field)
         .orderBy(F.desc(order_field)))
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap).drop("_rn"))
