"""Facet/aggregation tests (A1-A8) incl. the post_filter interplay the
reference pins in tests/test_search_query.py:98-121 and
tests/test_search.py:26-154,620-676."""
import datetime as dt

from pyspark.sql import functions as F

from openaleph_search_spark.query.facets import (
    cardinality, date_histogram, deterministic_sample, diversified_sample,
    metric_aggs, significant_terms, terms_facet)


def test_terms_facet_order_and_counts(spark, fixture_engine):
    res = fixture_engine.search({"facet": "lang", "limit": 0})
    buckets = [(r["value"], r["count"]) for r in res.facets["lang"].collect()]
    # count desc then key asc
    assert buckets[0][0] == "txt" and buckets[0][1] == 5
    counts = [c for _, c in buckets]
    assert counts == sorted(counts, reverse=True)


def test_facet_post_filter_interplay(fixture_engine):
    """filter:lang + facet=lang → facet ignores its own filter; hits
    honor it (reference Q10/A8)."""
    res = fixture_engine.search(
        {"q": "banana", "filter:lang": "go", "facet": "lang", "limit": 10},
        with_total=True)
    assert res.total == 1
    facet_langs = {r["value"]: r["count"] for r in res.facets["lang"].collect()}
    assert facet_langs == {"go": 1, "txt": 1}  # both banana docs


def test_facet_total_cardinality(fixture_engine):
    res = fixture_engine.search(
        {"facet": "repo", "facet_total:repo": "true", "limit": 0})
    assert res.facet_totals["repo"].collect()[0]["cardinality"] == 3


def test_metric_aggs(fixture_engine):
    res = fixture_engine.search(
        {"q": "banana", "metric:sum": "doc_len", "metric:max": "doc_len",
         "limit": 0})
    row = res.metrics.collect()[0]
    lens = [r["doc_len"] for r in
            fixture_engine.search({"q": "banana", "limit": 10}).hit_rows(0, 10)]
    assert row["sum_doc_len"] == sum(lens)
    assert row["max_doc_len"] == max(lens)


def test_date_histogram_empty_buckets(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2020, 1, 5),), (dt.datetime(2020, 1, 7),),
         (dt.datetime(2020, 4, 2),)], "ts timestamp")
    out = date_histogram(df, "ts", "month")
    rows = [(r["bucket"].strftime("%Y-%m"), r["count"]) for r in out.collect()]
    assert rows == [("2020-01", 2), ("2020-02", 0), ("2020-03", 0),
                    ("2020-04", 1)]


def test_date_histogram_extended_bounds(spark):
    df = spark.createDataFrame([(dt.datetime(2020, 3, 5),)], "ts timestamp")
    out = date_histogram(df, "ts", "year", gte="2020-01-01",
                         lte="2020-12-31")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["count"] == 1


def test_significant_terms(spark):
    fg = spark.createDataFrame(
        [("py",)] * 8 + [("go",)] * 2, "lang string")
    bg = spark.createDataFrame(
        [("py",)] * 10 + [("go",)] * 40 + [("js",)] * 50, "lang string")
    out = significant_terms(fg, bg, "lang").collect()
    assert out[0]["value"] == "py"  # massively over-represented


def test_deterministic_sample(spark):
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = deterministic_sample(df, "k", 0.1)
    b = deterministic_sample(df, "k", 0.1)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert 40 < a.count() < 250


def test_diversified_sample(spark):
    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in range(10)], "g string, v int")
    out = diversified_sample(df, "g", "v", cap=3)
    assert out.count() == 6
    assert out.groupBy("g").count().agg(F.max("count")).collect()[0][0] == 3
