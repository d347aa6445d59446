"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` key maps to a SURVEY.md §2 operator id. Spark side
runs the real engine (inverted index + block-max BM25 executor, or the
ops modules); the oracle side re-states the semantics in ANSI SQL for
DuckDB — including BM25 itself (tokenize → tf/df/avgdl → Lucene
formula) so rank- and score-identity is machine-checked.

Scores are rounded to 4 decimals on BOTH sides: the engines agree to
~1e-15 (float64, same formula), rounding absorbs summation-order noise.
"""
from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

K1, B = 1.2, 0.75


# ---------------------------------------------------------------------------
# engine cache: build the index once per sf_dir per process
# ---------------------------------------------------------------------------

_ENGINES: dict[str, object] = {}

# The /tmp index caches are keyed on the FULL entry-pinned build
# config (CLAUDE.md: the staleness check must cover any build config
# added here) — layout version plus every knob and derived-column
# formula the entry passes to build_index.  The exact dict is written
# to entry_config.json next to meta.json after a successful build and
# compared verbatim on reuse, so editing any of it (e.g. the title
# derivation) rebuilds instead of silently desyncing the oracles.
_CREATED_FORMULA = ("timestamp'2020-01-01 00:00:00' + make_interval("
                    "0, 0, 0, cast(regexp_extract(path, "
                    "'mod_(\\\\d+)\\\\.', 1) as int) % 360, 0, 0, 0)")


def _cache_stale(idx_dir: str, cfg: dict) -> bool:
    import json
    p = os.path.join(idx_dir, "entry_config.json")
    if not (os.path.exists(p)
            and os.path.exists(os.path.join(idx_dir, "meta.json"))):
        return True
    with open(p) as f:
        return json.load(f) != cfg


def _mark_built(idx_dir: str, cfg: dict) -> None:
    import json
    with open(os.path.join(idx_dir, "entry_config.json"), "w") as f:
        json.dump(cfg, f)


def _engine(spark: SparkSession, sf_dir: str):
    from openaleph_search_spark.index.build import build_index
    from openaleph_search_spark.query.engine import Engine
    import shutil
    from openaleph_search_spark.index.build import LAYOUT_VERSION
    key = os.path.abspath(sf_dir)
    if key not in _ENGINES:
        idx_dir = os.path.join(
            "/tmp", "oa_idx_" + os.path.basename(key.rstrip("/")))
        cfg = {"layout_version": LAYOUT_VERSION, "bigrams": True,
               "meta_cols": ["created"],
               "created_formula": _CREATED_FORMULA,
               "num_partitions": 8, "num_shards": 4}
        if _cache_stale(idx_dir, cfg):
            shutil.rmtree(idx_dir, ignore_errors=True)
            from openaleph_search_spark.sources.code_table import load_docs
            docs = load_docs(spark, sf_dir)
            # deterministic typed timestamp (doc_values role): day
            # offset = source doc id mod 360 from 2020-01-01
            docs = docs.withColumn("created", F.expr(_CREATED_FORMULA))
            build_index(spark, docs, idx_dir, num_partitions=8,
                        num_shards=4, bigrams=True,
                        meta_cols=["created"])
            _mark_built(idx_dir, cfg)
        _ENGINES[key] = Engine(spark, idx_dir)
    return _ENGINES[key]


_B_ENGINES: dict[str, object] = {}


def _engine_weak_b(spark: SparkSession, sf_dir: str):
    """Aux index exercising the per-field BM25 ``b`` override (the
    reference's weak_length_norm b=0.25 on the name field,
    openaleph_search/index/util.py:83-90): a derived variable-length
    ``title`` field (first 1+doc_id%7 content tokens) indexed with
    b=0.25 while content keeps the global b."""
    import shutil
    from openaleph_search_spark.index.build import LAYOUT_VERSION, build_index
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.sources.code_table import load_docs
    key = os.path.abspath(sf_dir)
    if key not in _B_ENGINES:
        idx_dir = os.path.join(
            "/tmp", "oa_idxb_" + os.path.basename(key.rstrip("/")))
        cfg = {"layout_version": LAYOUT_VERSION,
               "fields": {"title": "title"},
               "b_by_field": {"title": 0.25},
               "title_formula":
                   "first 1+(doc_id%7) space-split content tokens",
               "num_partitions": 8, "num_shards": 4}
        if _cache_stale(idx_dir, cfg):
            shutil.rmtree(idx_dir, ignore_errors=True)
            docs = load_docs(spark, sf_dir)
            did = F.regexp_extract("path", r"mod_(\d+)\.", 1).cast("long")
            docs = docs.withColumn(
                "title",
                F.array_join(F.slice(F.split("content", " "), F.lit(1),
                                     (F.lit(1) + F.pmod(did, F.lit(7)))
                                     .cast("int")), " "))
            build_index(spark, docs, idx_dir, num_partitions=8,
                        num_shards=4, fields={"title": "title"},
                        b_by_field={"title": 0.25})
            _mark_built(idx_dir, cfg)
        _B_ENGINES[key] = Engine(spark, idx_dir)
    return _B_ENGINES[key]


_MUT_ENGINES: dict[tuple, object] = {}


def _mut_engine(spark: SparkSession, sf_dir: str, tag: str, apply_fn):
    """Mutation-lifecycle entries (S3/S4/S5): copy the cached base
    index, apply ``apply_fn(spark, storage)`` once per process, return
    an Engine over the mutated copy (the shared base stays pristine)."""
    import shutil
    from openaleph_search_spark.index.storage import IndexStorage
    from openaleph_search_spark.query.engine import Engine
    key = (os.path.abspath(sf_dir), tag)
    if key not in _MUT_ENGINES:
        base = _engine(spark, sf_dir)
        dst = (f"/tmp/oa_idx_mut_{tag}_"
               + os.path.basename(os.path.abspath(sf_dir).rstrip("/")))
        shutil.rmtree(dst, ignore_errors=True)
        shutil.copytree(base.storage.root, dst)
        st = IndexStorage(dst)
        apply_fn(spark, st)
        _MUT_ENGINES[key] = Engine(spark, dst)
    return _MUT_ENGINES[key]


def _orig_id(df: DataFrame) -> DataFrame:
    """Engine doc ids → the source documents.doc_id (encoded in path)."""
    return df.withColumn(
        "doc_id",
        F.regexp_extract("path", r"mod_(\d+)\.", 1).cast("long"))


def _hits(engine, args: dict, k: int) -> DataFrame:
    """Top-k by (rounded score desc, SOURCE doc_id asc) — the oracle's
    exact ordering. Fetch the full match set (sf-scale only; bench uses
    the engine's native top-k path) so boundary ties cut identically."""
    res = engine.search({**args, "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect, over the pre-registered views)
# ---------------------------------------------------------------------------

_TOK_CTE = """
tok AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM documents{where}
),
tf AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
stats AS (
  SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents{where}
),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
)"""


def _sqllist(terms: list[str]) -> str:
    return ", ".join("'%s'" % t for t in terms)


def _bm25_sql(terms: list[str], k: int, mode: str = "and",
              not_terms: list[str] | None = None,
              doc_filter: str = "") -> str:
    """Flat AND/OR(/NOT) BM25 top-k in SQL — mirrors the engine's
    additive Lucene BM25 with GLOBAL collection stats (filters restrict
    the candidate docs, never idf/avgdl — same as the engine)."""
    nt = ""
    if not_terms:
        nt = (" AND s.doc_id NOT IN (SELECT doc_id FROM tf "
              f"WHERE term IN ({_sqllist(not_terms)}))")
    if doc_filter:
        nt += (" AND s.doc_id IN "
               f"(SELECT doc_id FROM documents WHERE {doc_filter})")
    gate = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    return f"""
WITH {_TOK_CTE.format(where='')},
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term IN ({_sqllist(sorted(set(terms)))})
  GROUP BY tf.doc_id
  {gate}
)
SELECT s.doc_id, round(s.score, 4) AS score
FROM scores s
WHERE 1=1{nt}
ORDER BY round(s.score, 4) DESC, s.doc_id
LIMIT {k}
"""


def _phrase_sql(t0: str, t1: str, k: int) -> str:
    """Two-term exact phrase (slop 0): positional adjacency via a
    lateral position join; idf = Σ term idfs, tf = #alignments."""
    return f"""
WITH pos AS (
  SELECT d.doc_id, d.dl, d.toks[i.i + 1] AS term, i.i AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS dl FROM documents) d,
       LATERAL (SELECT unnest(range(len(d.toks))) AS i) i
),
stats AS (
  SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM pos
  WHERE term IN ('{t0}', '{t1}') GROUP BY term
),
idf AS (
  SELECT sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))) AS v
  FROM dfreq CROSS JOIN stats
),
matches AS (
  SELECT a.doc_id, any_value(a.dl) AS dl, count(*) AS tf
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{t0}' AND b.term = '{t1}'
  GROUP BY a.doc_id
)
SELECT m.doc_id,
       round(idf.v * m.tf
             / (m.tf + {K1} * (1 - {B} + {B} * m.dl / stats.avgdl)),
             4) AS score
FROM matches m CROSS JOIN idf CROSS JOIN stats
ORDER BY score DESC, m.doc_id
LIMIT {k}
"""  # noqa: score is already the rounded value here


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q28_bm25_match_topk(spark, sf_dir):
    """Q28/Q29: scored multi-term match (default AND), block-max top-k."""
    return _hits(_engine(spark, sf_dir), {"q": "spark query join",
                                          "limit": 20}, 20)


def q9_bool_or(spark, sf_dir):
    return _hits(_engine(spark, sf_dir),
                 {"q": "merge OR window OR vector", "limit": 20}, 20)


def q9_bool_not(spark, sf_dir):
    return _hits(_engine(spark, sf_dir),
                 {"q": "vector NOT window", "limit": 20}, 20)


def q9_boosted_should_topk(spark, sf_dir):
    """Q9/Q29: uneven should-boosts + must_not at SMALL k — the exact
    shape that exposed the round-2 pruning unsoundness (boost-blind
    max_impact / θ inflated by docs must_not later removes).  Runs the
    NATIVE top-k path (limit=3 → per-shard θ-pruning active)."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "merge^2 OR window OR vector NOT stream",
                      "limit": 3})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(3)


def q14_phrase(spark, sf_dir):
    return _hits(_engine(spark, sf_dir), {"q": '"table scan"', "limit": 15},
                 15)


def q14b_phrase_slop(spark, sf_dir):
    """Q14 sloppy variant: "vector stream"~2 through the positional
    evaluator (anchors of slot 0 with every slot within slop)."""
    return _hits(_engine(spark, sf_dir),
                 {"q": '"vector stream"~2', "limit": 15}, 15)


def q23_synonyms_multitoken(spark, sf_dir):
    """Q22/Q23: search-time synonym_graph expansion with a MULTI-token
    rule — ``vector`` expands to the group {vector, "table scan"}, so
    score = bm25(vector) + Lucene-phrase("table scan") additively."""
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.query.synonyms import SynonymTable
    base = _engine(spark, sf_dir)  # ensures the index is built/cached
    eng = Engine(spark, base.storage.root,
                 synonyms=SynonymTable([["table scan", "vector"]]))
    res = eng.search({"q": "vector", "synonyms": "true", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(15)


def s4_delete_by_query_search(spark, sf_dir):
    """S4 lifecycle: delete-by-query (lang='de' → tombstones) then a
    scored search — tombstoned docs must be invisible; global BM25
    stats stay the BUILD stats until compact() (Lucene soft deletes)."""
    from openaleph_search_spark.index.mutate import delete_docs

    def apply(sp, st):
        delete_docs(sp, st, F.col("lang") == "de")

    eng = _mut_engine(spark, sf_dir, "s4", apply)
    res = eng.search({"q": "vector merge", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def s5_delete_by_ids_search(spark, sf_dir):
    """S5 lifecycle: delete-by-id (source ids < 50) then search."""
    from openaleph_search_spark.index.mutate import delete_by_ids

    def apply(sp, st):
        ids = [r["doc_id"] for r in st.doc_meta(sp).filter(
            F.regexp_extract("path", r"mod_(\d+)\.", 1)
            .cast("long") < 50).select("doc_id").collect()]
        delete_by_ids(sp, st, ids)

    eng = _mut_engine(spark, sf_dir, "s5", apply)
    res = eng.search({"q": "stream OR table", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


UPSERT_TEXT = "vector vector vector merge table scan"


def s3_upsert_compact_search(spark, sf_dir):
    """S3 lifecycle: upsert (same (repo,path,commit) identity, new
    content) + compact() → the new version is visible, the old one
    gone, and collection stats are recomputed exactly over live docs
    (so the DuckDB oracle recomputes from the modified text)."""
    from openaleph_search_spark.index.mutate import compact, upsert_docs
    from openaleph_search_spark.sources.code_table import load_docs

    def apply(sp, st):
        one = (load_docs(sp, sf_dir)
               .filter(F.regexp_extract("path", r"mod_(\d+)\.", 1)
                       .cast("long") == 7)
               .withColumn("content", F.lit(UPSERT_TEXT))
               .withColumn("created",
                           F.expr("timestamp'2020-01-01 00:00:00' + "
                                  "make_interval(0,0,0,7,0,0,0)")))
        upsert_docs(sp, st, one)
        compact(sp, st)

    eng = _mut_engine(spark, sf_dir, "s3", apply)
    res = eng.search({"q": "vector merge", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


_OWNERS = ["vladimir", "wladimir", "sergei", "sergej", "ivan", "anna",
           "maria", "peter", "olga", "dmitri", "nina", "boris"]


def t8_symbol_legs(spark, sf_dir):
    """T8 end-to-end with the BUNDLED symbol dictionary
    (analysis/data/test_name_symbols.tsv): every doc gets a synthetic
    owner name (doc_id % 12), owners resolve to shared symbol ids at
    index time (name_symbols field), and a ``vladimir`` query with
    synonyms=true matches BOTH vladimir- and wladimir-owned docs via
    the 0.5-boosted symbol leg (no content token matches)."""
    import shutil
    from openaleph_search_spark.index.build import (DEFAULT_FIELDS,
                                                    build_index)
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.query.synonyms import SynonymTable
    from openaleph_search_spark.sources.code_table import load_docs
    key = (os.path.abspath(sf_dir), "t8")
    if key not in _MUT_ENGINES:
        symbols = SynonymTable.symbols_from_file()
        idx = ("/tmp/oa_idx_t8_"
               + os.path.basename(os.path.abspath(sf_dir).rstrip("/")))
        shutil.rmtree(idx, ignore_errors=True)
        owner = F.element_at(
            F.array(*[F.lit(o) for o in _OWNERS]),
            (F.regexp_extract("path", r"mod_(\d+)\.", 1).cast("int")
             % 12 + 1))
        sym_map = F.create_map(
            *[F.lit(x) for kv in symbols.items() for x in kv])
        docs = (load_docs(spark, sf_dir)
                .withColumn("owner", owner)
                .withColumn("sym", F.coalesce(sym_map[F.col("owner")],
                                              F.lit(""))))
        build_index(spark, docs, idx, num_partitions=8, num_shards=4,
                    fields={**DEFAULT_FIELDS, "name_symbols": "sym"})
        _MUT_ENGINES[key] = Engine(
            spark, idx, synonyms=SynonymTable([], symbols=symbols))
    eng = _MUT_ENGINES[key]
    res = eng.search({"q": "vladimir", "synonyms": "true",
                      "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.asc("doc_id"))


ANALYZE_PROBE = "Hello, Félix! big_data WORLD-42"


def q30_analyze(spark, sf_dir):
    """Q30 analyze API: tokenizer chain (html_strip → UAX#29 →
    lowercase → ICU fold) exposed as (term, position) rows."""
    eng = _engine(spark, sf_dir)
    rows = eng.analyze(ANALYZE_PROBE)
    return spark.createDataFrame(
        [(t, int(p)) for t, p in rows], "term string, position long")


def q13_terms_set(spark, sf_dir):
    """Q13 terms_set / minimum_should_match: ≥2 of {merge, window,
    vector} must match; additive BM25 over the matching legs (the
    executor's track_counts path — pruning disabled there by design)."""
    from openaleph_search_spark.query.ir import Bool, TermLeaf
    eng = _engine(spark, sf_dir)
    tree = Bool(should=[TermLeaf("merge"), TermLeaf("window"),
                        TermLeaf("vector")], min_should=2)
    hits = eng.executor.run(tree, k=None).join(
        eng.doc_meta.select("doc_id", "path"), "doc_id")
    out = _orig_id(hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q21_function_score(spark, sf_dir):
    """Q21 function_score: additive length-prior boost (boost_mode
    sum) — score = BM25 + sqrt(0.5·doc_len)."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector merge", "function_score": "true",
                      "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q5_range_filter(spark, sf_dir):
    """Q5 range filter on the typed ``created`` timestamp with ES
    partial-date period semantics: gte:2020-03 + lt:2020-06 →
    [2020-03-01, 2020-06-01)."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector", "filter:gte:created": "2020-03",
                      "filter:lt:created": "2020-06", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q1_wildcard_infix(spark, sf_dir):
    """Q1: infix/`?` wildcard — ``s?a*`` expands against the term
    dictionary (pushed range on the literal prefix + regex, capped)
    to {scan, small, spark} and scores as their OR-disjunction."""
    return _hits(_engine(spark, sf_dir), {"q": "s?a*", "limit": 15}, 15)


def q8_prefix(spark, sf_dir):
    return _hits(_engine(spark, sf_dir), {"q": "sca*", "limit": 10}, 10)


def q4_term_filter_scored(spark, sf_dir):
    """Q4+Q28: term filter (lang) pushed into the scored search."""
    return _hits(_engine(spark, sf_dir),
                 {"q": "vector stream", "filter:lang": "de", "limit": 20}, 20)


def q12_auth_filter(spark, sf_dir):
    """Q12: session-injected SearchAuth ACL (admin bypass / match_none
    / mandatory terms filter) — scored search restricted to two repos."""
    from openaleph_search_spark.query.auth import SearchAuth
    eng = _engine(spark, sf_dir)
    auth = SearchAuth(datasets={"org1/project1", "org2/project2",
                                "org3/project3"}, logged_in=True)
    res = eng.search({"q": "vector", "limit": 9999}, auth=auth)
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def q11_exclude_filter(spark, sf_dir):
    """Q11: negative (exclude:) filter — scored search minus a lang."""
    return _hits(_engine(spark, sf_dir),
                 {"q": "vector", "exclude:lang": "en", "limit": 20}, 20)


def s10_msearch(spark, sf_dir):
    """S10 proper: multi-query batch — every query tree evaluates in
    ONE per-shard pass (Engine.msearch / executor.run_multi)."""
    from pyspark.sql import Window
    eng = _engine(spark, sf_dir)
    out = eng.msearch({"qa": {"q": "merge join"},
                       "qb": {"q": "vector OR stream"},
                       "qc": {"q": '"table scan"'}}, k=9999)
    scored = _orig_id(out).select(
        "query_id", "doc_id", F.round("score", 4).alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 10).drop("_rn"))


def q31_count(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    n = eng.count({"q": "vector merge"})
    return spark.createDataFrame([(n,)], "matches long")


def q26_sort_q27_paging(spark, sf_dir):
    """Q26+Q27: field sort + offset/limit over a filtered match."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector", "sort": "doc_len:desc",
                      "limit": 9999, "offset": 0})
    out = _orig_id(res.hits).select(
        "doc_id", F.col("doc_len").cast("long").alias("doc_len"))
    return out.orderBy(F.desc("doc_len"), F.asc("doc_id")).limit(25)


def q27_search_after(spark, sf_dir):
    """Q27 search_after: keyset continuation of a sorted match (path
    asc + doc_id tiebreak) — ES-style deep paging as an indexable
    range predicate instead of an offset scan (reference
    index/entities.py:112-140 PIT+search_after export)."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector", "sort": "path", "limit": 15,
                      "search_after": ["src/src5", "0"]})
    return _orig_id(res.hits).select("doc_id", "path")


def q10_post_filter_facet(spark, sf_dir):
    """Q10/A8: facet on lang with filter:lang applied post-facet."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector merge", "filter:lang": "en",
                      "facet": "lang", "limit": 0})
    return res.facets["lang"].select(
        F.col("value").alias("lang"), F.col("count").alias("n"))


def a1_terms_facet(spark, sf_dir):
    from openaleph_search_spark.query.facets import terms_facet
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return terms_facet(df, "lang", size=20).select(
        F.col("value").alias("lang"), F.col("count").alias("n"))


def a2_cardinality(spark, sf_dir):
    from openaleph_search_spark.query.facets import cardinality
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return cardinality(df, "source")


def a3_date_histogram(spark, sf_dir):
    from openaleph_search_spark.query.facets import date_histogram
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (date_histogram(df, "ts", "month")
            .select(F.date_format("bucket", "yyyy-MM").alias("month"),
                    F.col("count").alias("n")))


def a4_metrics_nested(spark, sf_dir):
    from openaleph_search_spark.query.facets import metric_aggs
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = metric_aggs(df, {"sum": ["value"], "avg": ["value"],
                           "min": ["value"], "max": ["value"]},
                      group_by=["event_type"])
    return out.select(
        "event_type",
        F.round("sum_value", 4).alias("sum_value"),
        F.round("avg_value", 4).alias("avg_value"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"))


def a5_significant_terms(spark, sf_dir):
    """A5: user_ids over-represented among error events (JLH score)."""
    from openaleph_search_spark.query.facets import significant_terms
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    fg = df.filter(F.col("event_type") == "error")
    out = significant_terms(fg, df, "user_id", size=10)
    return out.select(F.col("value").alias("user_id"), "fg_count",
                      "bg_count", F.round("score", 6).alias("score"))


def a7_systematic_sample(spark, sf_dir):
    """A7 sampler (deterministic systematic variant: id mod 10)."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (df.filter(F.pmod("event_id", F.lit(10)) == 0)
            .groupBy("event_type").agg(F.count("*").alias("n")))


def a3_engine_histogram(spark, sf_dir):
    """A3 THROUGH Engine.search (facet_interval arg dialect) plus a
    partial-date range filter (filter:gte:created=yyyy-MM names the
    whole month, reference mapping.py:35,47)."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector", "facet": "created",
                      "facet_interval:created": "month",
                      "filter:gte:created": "2020-03", "limit": 0})
    return res.facets["created"].select(
        F.date_format("bucket", "yyyy-MM").alias("month"),
        F.col("count").alias("n"))


def a5_engine_significant(spark, sf_dir):
    """A5 THROUGH Engine.search: significant facet of lang over the
    match set vs the collection background."""
    eng = _engine(spark, sf_dir)
    res = eng.search({"q": "vector stream",
                      "facet_significant:lang": "true", "limit": 0})
    return res.significant["lang"].select(
        F.col("value").alias("lang"), "fg_count", "bg_count",
        F.round("score", 6).alias("score"))


def s7_filtered_scan(spark, sf_dir):
    """S7: filtered scan + projection (pushdown path)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (df.filter((F.col("lang") == "en") & (F.col("n_chars") > 300))
            .select("doc_id", "source", "n_chars"))


def s6_export_query(spark, sf_dir):
    """S6: query-filtered projected export through the engine (the
    reference's export_specific_query + excluded-fields shapes)."""
    eng = _engine(spark, sf_dir)
    out = eng.export({"q": "vector stream", "filter:lang": "en"},
                     include_fields=["path", "lang", "doc_len"])
    return _orig_id(out).select(
        "doc_id", "lang", F.col("doc_len").cast("long").alias("doc_len"))


def s9_ids_lookup(spark, sf_dir):
    """S9: multi-get by ids (broadcast semi-join against an id list)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ids = spark.createDataFrame([(i,) for i in (1, 7, 42, 99, 123, 333)],
                                "doc_id long")
    return (df.join(F.broadcast(ids), "doc_id", "left_semi")
            .select("doc_id", "lang", "n_chars"))


def s10_checksum_counts(spark, sf_dir):
    """S10: batch count per checksum (sha256 of content)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (df.groupBy(F.sha2("text", 256).alias("checksum"))
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") > 0)
            .orderBy("checksum").limit(50))


def dedup_exact(spark, sf_dir):
    """Exact dedup with deterministic injected duplicates (the raw
    table has none — doc_ids 0..19 are re-added under id+1000000 on
    BOTH sides so the groups are non-trivial)."""
    from openaleph_search_spark.ops.dedup import exact_duplicates
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dup = (df.filter(F.col("doc_id") < 20)
           .withColumn("doc_id", F.col("doc_id") + 1000000))
    return exact_duplicates(df.unionByName(dup)).select(
        "content_hash", "n_docs",
        F.array_join(F.transform("doc_ids",
                                 lambda x: x.cast("string")), ",")
        .alias("ids"))


def dedup_minhash_lsh(spark, sf_dir):
    from openaleph_search_spark.ops.dedup import minhash_lsh_pairs
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(df, threshold=0.95)


def dedup_ngram_jaccard(spark, sf_dir):
    from openaleph_search_spark.ops.dedup import ngram_jaccard_pairs
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(df, n=3, threshold=0.5)


def dedup_clusters(spark, sf_dir):
    """Near-dup pairs → connected components → canonical min-id
    cluster label per doc (the 'keep one per cluster' step of a
    training-data dedup pipeline; ops/dedup.duplicate_clusters
    pointer-jumping label propagation). Oracle: the same jaccard
    edges + a recursive-CTE transitive closure."""
    from openaleph_search_spark.ops.dedup import (duplicate_clusters,
                                                  ngram_jaccard_pairs)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.5)
    return duplicate_clusters(pairs)


def dedup_simhash(spark, sf_dir):
    """SimHash fingerprints with the portable md5-low64 token hash
    (== DuckDB md5_number_lower), so the full 64-bit fingerprint is
    oracle-exact. Emitted as an unsigned decimal string (no uint64 on
    either side)."""
    from openaleph_search_spark.ops.dedup import simhash
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = simhash(df, hash_fn="md5")
    unsigned = (F.col("simhash").cast("decimal(21,0)")
                + F.when(F.col("simhash") < 0,
                         F.lit("18446744073709551616").cast("decimal(21,0)"))
                   .otherwise(F.lit(0).cast("decimal(21,0)")))
    return out.select("doc_id", unsigned.cast("string").alias("simhash"))


def sim_cosine_topk(spark, sf_dir):
    from openaleph_search_spark.ops.similarity import cosine_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probe = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return cosine_topk(emb, probe, k=10)


def sim_lsh_ann(spark, sf_dir):
    """ANN over a STORED bucket column (materialized once at ingest via
    with_ann_buckets — the 100 TB path: the Hamming ball becomes an
    isin over the stored int, pushed into the parquet scan). Seeded
    hyperplanes are embedded as literals in the oracle SQL."""
    from openaleph_search_spark.ops.similarity import (lsh_cosine_topk,
                                                       with_ann_buckets)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bdir = os.path.join(
        "/tmp", "oa_ann_" + os.path.basename(
            os.path.abspath(sf_dir).rstrip("/")))
    if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
        (with_ann_buckets(emb, n_planes=8, seed=42)
         .write.mode("overwrite").parquet(bdir))
    emb_b = spark.read.parquet(bdir)
    probe = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return lsh_cosine_topk(emb_b, probe, k=10, n_planes=8, probe_radius=3,
                           bucket_name="ann_bucket")


def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs: hyperplane-bucket candidates
    (Hamming ≤ 2) verified by exact cosine ≥ 0.4 — seeded planes make
    the candidate set SQL-replicable."""
    from openaleph_search_spark.ops.similarity import (
        embedding_near_dup_pairs)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_near_dup_pairs(emb, threshold=0.4, n_planes=8,
                                    radius=2)


def sim_ivf_ann(spark, sf_dir):
    """IVF ANN: deterministic md5-sampled centroids, stored cell column
    (materialized once at ingest), top-k over the n_probe nearest
    cells."""
    from openaleph_search_spark.ops.similarity import (
        ivf_centroids, ivf_cosine_topk, with_ivf_cells)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = ivf_centroids(emb, n_centroids=16)
    bdir = os.path.join(
        "/tmp", "oa_ivf_" + os.path.basename(
            os.path.abspath(sf_dir).rstrip("/")))
    if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
        (with_ivf_cells(emb, cents)
         .write.mode("overwrite").parquet(bdir))
    emb_c = spark.read.parquet(bdir)
    probe = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    return ivf_cosine_topk(emb_c, probe, cents, k=10, n_probe=4)


def sim_knn_join(spark, sf_dir):
    """Exact k-NN join for a broadcast probe set (ops/similarity.py
    knn_join): 3 probe vectors, each partition does ONE matmul for all
    probes, per-partition top-k, global window cut. The 100 TB shape
    for 'tag a small query set against a huge corpus'."""
    from openaleph_search_spark.ops.similarity import knn_join
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    probes = (emb.filter(F.col("vec_id").isin([0, 1, 2]))
              .select(F.col("vec_id").alias("probe_id"), "embedding"))
    return knn_join(emb, probes, k=5)


def text_language_id(spark, sf_dir):
    from openaleph_search_spark.ops.textstats import with_language_id
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_language_id(df)
            .groupBy("lang_pred").agg(F.count("*").alias("n")))


def text_token_quality(spark, sf_dir):
    from openaleph_search_spark.ops.textstats import (
        with_quality_score, with_token_counts)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_quality_score(with_token_counts(df))
    return out.select(
        "doc_id",
        F.col("ws_tokens").cast("long").alias("ws_tokens"),
        F.col("word_tokens").cast("long").alias("word_tokens"),
        F.col("bpe_tokens_est").cast("long").alias("bpe_tokens_est"),
        F.round("punct_ratio", 6).alias("punct_ratio"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("mean_word_len", 6).alias("mean_word_len"))


def dedup_decontaminate(spark, sf_dir):
    """Eval-set decontamination: flag training docs sharing any
    3-token shingle with a held-out 'benchmark' slice (doc_id < 5),
    ops/dedup.contamination_flags — eval shingles broadcast into a
    semi-join, training text never shuffles."""
    from openaleph_search_spark.ops.dedup import contamination_flags
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = df.filter(F.col("doc_id") < 5)
    out = contamination_flags(df, ev, n=3)
    return out.select("doc_id", "contaminated", "eval_hits")


def text_pack_sequences(spark, sf_dir):
    """LLM sequence packing: docs fill 512-token packs in doc_id order
    within each source group (ops/textstats.with_pack_ids — the window
    shuffles per group, never a global order)."""
    from openaleph_search_spark.ops.textstats import (with_pack_ids,
                                                      with_token_counts)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = with_pack_ids(with_token_counts(df), budget=512)
    return out.select("doc_id", "pack_id",
                      F.col("pack_offset").cast("long").alias(
                          "pack_offset"),
                      F.col("ws_tokens").cast("long").alias("ws_tokens"))


def text_fingerprint(spark, sf_dir):
    from openaleph_search_spark.ops.textstats import with_fingerprint
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_fingerprint(df).select(
        "doc_id", "fingerprint_md5", "fingerprint_min8")


def text_repetition(spark, sf_dir):
    """Gopher-style repetition signals (dup-word fraction, top-2/3-gram
    coverage, duplicated-5-gram fraction) — single Arrow-batched pass,
    zero shuffles (ops/textstats.with_repetition_stats)."""
    from openaleph_search_spark.ops.textstats import with_repetition_stats
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return with_repetition_stats(df).select(
        "doc_id", "dup_word_fraction", "top2gram_fraction",
        "top3gram_fraction", "dup_ngram_fraction")


def pipe_mixture_sample(spark, sf_dir):
    """Data-mixing sampler: per-lang keep fractions gated on a
    deterministic md5 hash of doc_id — identical row selection in any
    engine (ops/mixing.mixture_sample)."""
    from openaleph_search_spark.ops.mixing import mixture_sample
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frac = {"en": 1.0, "de": 0.5, "fr": 0.25, "es": 0.1, "zh": 0.75}
    return (mixture_sample(df, frac, group_col="lang")
            .select("doc_id", "lang"))


def text_pii_scrub(spark, sf_dir):
    """PII scrubbing: deterministic synthetic PII (email/IP/phone from
    doc_id) appended to each doc, then redacted + counted
    (ops/textstats.with_pii_scrubbed — pure Column regexes)."""
    from openaleph_search_spark.ops.textstats import with_pii_scrubbed
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = df.withColumn("text", F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"), F.lit("@example.com at 10."),
        F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
        F.lit(".0.1 or +1-555-"),
        F.lpad(F.col("doc_id").cast("string"), 4, "0")))
    return with_pii_scrubbed(df).select(
        "doc_id", "pii_email_count", "pii_ip_count", "pii_phone_count",
        "text_scrubbed")


def sim_quantize_int8(spark, sf_dir):
    """Int8 embedding quantization (4x storage/shuffle for ANN at
    100 TB): per-vector symmetric scale + explicit floor(x+0.5)
    rounding so the codes are engine-exact. Compared via scalar
    digests (sum/min/max of codes + scale)."""
    from openaleph_search_spark.ops.similarity import quantize_embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = quantize_embeddings(emb)
    return q.select(
        "vec_id", F.round("q_scale", 6).alias("q_scale"),
        F.aggregate("q8", F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("q_sum"),
        F.array_min("q8").cast("long").alias("q_min"),
        F.array_max("q8").cast("long").alias("q_max"))


def dedup_duplicate_spans(spark, sf_dir):
    """Exact-substring duplicate spans (Lee et al. 2022 family):
    maximal token ranges covered by 5-token windows occurring ≥2
    times corpus-wide — the ranges a pipeline cuts out of training
    text. Rolling polynomial window hashes (vectorized mapInPandas)
    + hash-count join + gaps-and-islands merge; the oracle groups
    the raw window strings, so a Spark/DuckDB match also certifies
    the hash is collision-free on this corpus."""
    from openaleph_search_spark.ops.dedup import duplicate_spans
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return duplicate_spans(df, window=5, min_count=2)


def dedup_cut_spans(spark, sf_dir):
    """The 'cut' step completing exact-substring dedup: remove every
    duplicated token range found by duplicate_spans from each doc's
    normalized token stream (vectorized delta-array mask in one
    mapInPandas pass). Oracle re-derives the spans from raw window
    strings and anti-joins token positions against them."""
    from openaleph_search_spark.ops.dedup import (cut_spans,
                                                  duplicate_spans)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    spans = duplicate_spans(df, window=5, min_count=2)
    return cut_spans(df, spans)


def text_vocab(spark, sf_dir):
    """Corpus vocabulary (token df/tf/rank — the tokenizer-training /
    stopword / idf input): double partial-aggregated groupBy, then a
    single vocabulary-sized rank window. Top 200 by collection
    frequency."""
    from openaleph_search_spark.ops.textstats import vocab_table
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return vocab_table(df, top_n=200)


def text_unigram_logprob(spark, sf_dir):
    """CCNet-style LM quality proxy: mean add-one-smoothed unigram
    log-prob per doc (self-scored corpus model). The (T, V) scalars
    ride in on a broadcast 1-row crossJoin — no driver collect."""
    from openaleph_search_spark.ops.textstats import with_unigram_logprob
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_unigram_logprob(df)
            .select("doc_id", "n_tokens",
                    F.round("unigram_logprob", 6)
                    .alias("unigram_logprob")))


def pipe_split(spark, sf_dir):
    """Deterministic train/val/test split: contiguous hash-line bands
    sized 80/10/10, salted so the gate is independent of any
    mixture_sample on the same key (ops/mixing.with_split). Oracle
    inlines the SAME exact integer band edges (split_edges)."""
    from openaleph_search_spark.ops.mixing import with_split
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (with_split(df, {"train": 0.8, "val": 0.1, "test": 0.1})
            .select("doc_id", "split"))


def dedup_boilerplate_lines(spark, sf_dir):
    """Corpus-frequency line statistics (RefinedWeb/CCNet line-dedup
    signal). The single-line synthetic docs are wrapped into lines at
    the word 'table' (plain substring replace — identical consumption
    semantics in Spark and DuckDB), then boilerplate = trimmed lines
    of >= 10 chars appearing in >= 2 distinct docs."""
    from openaleph_search_spark.ops.dedup import boilerplate_lines
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = df.withColumn("text", F.regexp_replace(
        F.col("text"), " table ", "\ntable "))
    return boilerplate_lines(df, min_docs=2, min_chars=10)


def text_bpe_roundtrip(spark, sf_dir):
    """BPE tokenizer train + encode (ops/bpe.py): merges learned
    driver-side from the distributed vocab_table (the scale-correct
    split — the merge loop touches vocabulary entries, never the
    corpus), then every doc encoded. The oracle checks the lossless
    round-trip invariant — BPE pieces concatenate back to exactly
    token+EOW per word — which holds for ANY learned merge list; the
    segmentation itself is pinned by goldens in tests."""
    from openaleph_search_spark.ops.bpe import bpe_encode, learn_bpe
    from openaleph_search_spark.ops.textstats import vocab_table
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = learn_bpe(vocab_table(df, top_n=300), num_merges=100)
    enc = bpe_encode(df, merges)
    return enc.select(
        "doc_id",
        F.md5(F.concat_ws("", F.col("bpe_tokens"))).alias("reassembled_md5"))


def dedup_strip_boilerplate(spark, sf_dir):
    """The strip step paired with dedup_boilerplate_lines: remove
    every >= 2-doc line from the line-wrapped corpus, preserving the
    original text and order of what remains. Oracle re-derives the
    boilerplate set and anti-joins token positions via NOT EXISTS."""
    from openaleph_search_spark.ops.dedup import (boilerplate_lines,
                                                  strip_boilerplate_lines)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = df.withColumn("text", F.regexp_replace(
        F.col("text"), " table ", "\ntable "))
    bp = boilerplate_lines(df, min_docs=2, min_chars=10)
    return strip_boilerplate_lines(df, bp)


def dedup_keep_one(spark, sf_dir):
    """End-to-end near-dup removal: 3-gram Jaccard pairs -> connected
    components -> keep the min-id representative of each cluster,
    drop the rest (ops/dedup.keep_one_per_cluster). Returns the
    surviving doc ids; the oracle replays the recursive-CTE closure
    and anti-joins non-canonical members."""
    from openaleph_search_spark.ops.dedup import (keep_one_per_cluster,
                                                  ngram_jaccard_pairs)
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(df, n=3, threshold=0.5)
    return keep_one_per_cluster(df, pairs).select("doc_id")


def q1_fielded_search(spark, sf_dir):
    """Q1: Lucene field:value syntax — lang:de is a scored term on the
    indexed lang field, ANDed with a content term."""
    return _hits(_engine(spark, sf_dir), {"q": "lang:de vector",
                                          "limit": 20}, 20)


def q2_multifield_dismax(spark, sf_dir):
    """Q2: multi-field best-fields (dis_max) with per-field boosts —
    'go' only exists in the path field (file extension)."""
    return _hits(_engine(spark, sf_dir),
                 {"q": "go", "qfields": "content,path^2", "limit": 20}, 20)


def q2b_weak_length_norm(spark, sf_dir):
    """Q2b: per-field BM25 b override — title field scored with
    weak_length_norm b=0.25 (reference index/util.py:83-90) while the
    ANDed content term keeps the global b=0.75. Discriminating because
    title length varies per doc (1..7 tokens)."""
    return _hits(_engine_weak_b(spark, sf_dir),
                 {"q": "title:data vector", "limit": 20}, 20)


def q20_geo_distance(spark, sf_dir):
    """Q20: geo-distance filter+sort over deterministic synthetic
    coordinates derived from the events table."""
    from openaleph_search_spark.query.geo import geo_distance_query
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pts = ev.select(
        "event_id",
        (F.pmod(F.col("user_id") * 7, F.lit(180)) - 90 + 0.5)
        .cast("double").alias("lat"),
        (F.pmod(F.col("event_id") * 13, F.lit(360)) - 180 + 0.5)
        .cast("double").alias("lon"))
    return geo_distance_query(pts, lat=0.0, lon=0.0, k=20).select(
        "event_id", "distance_km")


def q15_percolate(spark, sf_dir):
    """Q15: batch percolation of a 3-entry watchlist over documents."""
    from openaleph_search_spark.query.percolate import (
        compile_watchlist, percolate_docs)
    stored = compile_watchlist([
        {"entity_id": "e1", "names": ["table scan"]},
        {"entity_id": "e2", "names": ["merge join"]},
        {"entity_id": "e3", "names": ["vector stream"]},
    ])
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = percolate_docs(docs, stored, id_cols=["doc_id"],
                         text_col="text", slop=2)
    return out.select("doc_id", "entity_id", "score")


def a6_significant_text(spark, sf_dir):
    """A6: tokens over-represented in German-labeled docs vs all."""
    from openaleph_search_spark.query.facets import significant_text
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fg = docs.filter(F.col("lang") == "de")
    out = significant_text(fg, docs, "text", size=10,
                           sample_fraction=None)
    return out.select(F.col("value").alias("token"), "fg_count",
                      "bg_count", F.round("score", 6).alias("score"))


def q16_more_like_this(spark, sf_dir):
    """Q16: docs similar to source doc 0 (tf·idf term selection, df
    bounds, 10% minimum_should_match — oracle re-states it in SQL)."""
    from openaleph_search_spark.query.more_like_this import more_like_this
    eng = _engine(spark, sf_dir)
    src = (eng.doc_meta.filter(F.col("path").rlike("mod_0\\."))
           .select("doc_id").collect())
    out = more_like_this(eng, src[0]["doc_id"], k=9999)
    hydrated = out.join(eng.doc_meta.select("doc_id", "path"), "doc_id")
    return (_orig_id(hydrated)
            .select("doc_id", F.round("score", 4).alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id")).limit(10))


def q19_mentions(spark, sf_dir):
    """Q19: top-10 docs phrase-mentioning each entity (slop 2),
    per-entity attribution — oracle re-states the sloppy-phrase BM25
    in SQL."""
    from pyspark.sql import Window
    from openaleph_search_spark.query.percolate import multi_mentions
    eng = _engine(spark, sf_dir)
    out = multi_mentions(eng, {"e1": ["table scan"],
                               "e2": ["vector stream"]}, k=9999)
    hydrated = out.join(eng.doc_meta.select("doc_id", "path"), "doc_id")
    scored = _orig_id(hydrated).select(
        "doc_id", "entity_id", F.round("score", 4).alias("score"))
    w = Window.partitionBy("entity_id").orderBy(
        F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= 10).drop("_rn"))


def q24_highlight(spark, sf_dir):
    """Q24: fragment extraction on top-k hits. highlight_length is set
    above the doc length so the greedy windows merge into ONE fragment
    = the full text with every query-term hit <em>-wrapped — exactly
    re-statable in SQL (regexp_replace) for a hash-exact oracle."""
    from openaleph_search_spark.query.engine import Engine
    from openaleph_search_spark.sources.code_table import load_docs
    eng = _engine(spark, sf_dir)
    eng2 = Engine(spark, eng.storage.root,
                  source_docs=load_docs(spark, sf_dir))
    res = eng2.search({"q": "vector stream", "highlight": "true",
                       "highlight_length": "100000", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"),
        F.element_at("highlights", 1).alias("fragment"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(5)


def q17_match_query(spark, sf_dir):
    """Q17: blocking + tiered-signal match scoring (portable md5
    MinHash family → the full blocking+scoring pipeline is restated in
    SQL)."""
    from openaleph_search_spark.ops.matching import match_query
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.filter(F.col("doc_id") == 0).collect()[0]
    return match_query(docs, probe["text"], probe["lang"], k=10,
                       text_col="text", num_hashes=16, bands=16,
                       hash_fn="md5")


def q18_blocking(spark, sf_dir):
    """Q18: filter-context blocking candidates (md5 MinHash bands,
    oracle-exact candidate set)."""
    from openaleph_search_spark.ops.matching import blocking_candidates
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    probe = docs.filter(F.col("doc_id") == 0).collect()[0]
    return blocking_candidates(docs, probe["text"], text_col="text",
                               num_hashes=16, bands=16, hash_fn="md5")


def _minhash_band_cte(num_hashes: int = 32, bands: int = 8,
                      seed: int = 7, shingle: int = 3) -> str:
    """CTE chain ending in ``bandtab(doc_id, band, bh)`` — replicates
    ops.dedup._band_hash_batches with the portable md5-low64 base hash
    (DuckDB md5_number_lower) using HUGEINT mod-2^64 arithmetic."""
    import numpy as np
    rows = num_hashes // bands
    rs = np.random.RandomState(seed)
    A = ((rs.randint(1, 2**62, size=num_hashes).astype(np.uint64) << 1)
         | np.uint64(1))
    Bv = rs.randint(0, 2**62, size=num_hashes).astype(np.uint64)
    a_list = ", ".join(str(int(x)) for x in A)
    b_list = ", ".join(str(int(x)) for x in Bv)
    fnv = "14695981039346656037::UBIGINT"
    for r in range(rows):
        fnv = (f"(((xor({fnv}, v{r})::HUGEINT * 1099511628211) "
               f"% 18446744073709551616)::UBIGINT)")
    vcols = ",\n         ".join(
        f"max(CASE WHEN hi % {rows} = {r} THEN hv END) AS v{r}"
        for r in range(rows))
    return f"""
toks3 AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= {shingle}
),
sh3 AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
             i -> array_to_string(t[i:i+{shingle - 1}], ' '))) AS shingles
  FROM toks3
),
inv3 AS (SELECT doc_id, unnest(shingles) AS s FROM sh3),
hh AS (
  SELECT i.doc_id, g.h AS hi,
         (((md5_number_lower(i.s)::HUGEINT
            * ([{a_list}]::HUGEINT[])[g.h + 1]
            + ([{b_list}]::HUGEINT[])[g.h + 1])
           % 18446744073709551616)::UBIGINT) AS hv
  FROM inv3 i, LATERAL (SELECT unnest(range({num_hashes})) AS h) g
),
sig AS (SELECT doc_id, hi, min(hv) AS hv FROM hh GROUP BY doc_id, hi),
sigp AS (
  SELECT doc_id, hi // {rows} AS band,
         {vcols}
  FROM sig GROUP BY doc_id, hi // {rows}
),
bandtab AS (SELECT doc_id, band, {fnv} AS bh FROM sigp)"""


def _lsh_ann_sql(n_planes: int = 8, radius: int = 3, k: int = 10,
                 seed: int = 42, dim: int = 64) -> str:
    """Random-hyperplane ANN restated in SQL: the seeded planes are
    embedded as DOUBLE literals (bit-exact float64 round-trip via
    repr)."""
    from openaleph_search_spark.ops.similarity import hyperplanes
    planes = hyperplanes(dim, n_planes, seed)
    vals = ",\n       ".join(
        "(%d, [%s]::DOUBLE[])" % (
            i, ", ".join(repr(float(x)) for x in planes[i]))
        for i in range(n_planes))
    return f"""
WITH planes(pid, vec) AS (VALUES {vals}),
probe AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS p
          FROM embeddings WHERE vec_id = 0),
pb AS (
  SELECT sum(CASE WHEN list_dot_product(pl.vec, pr.p) > 0
             THEN (1 << pl.pid) ELSE 0 END)::UBIGINT AS b
  FROM planes pl CROSS JOIN probe pr
),
bk AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(
                 list_transform(e.embedding, x -> x::DOUBLE), pl.vec) > 0
             THEN (1 << pl.pid) ELSE 0 END)::UBIGINT AS b
  FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id
),
cand AS (SELECT bk.vec_id FROM bk CROSS JOIN pb
         WHERE bit_count(xor(bk.b, pb.b)) <= {radius}),
scored AS (
  SELECT e.vec_id,
         list_dot_product(list_transform(e.embedding, x -> x::DOUBLE), pr.p)
         / (sqrt(list_dot_product(
                list_transform(e.embedding, x -> x::DOUBLE),
                list_transform(e.embedding, x -> x::DOUBLE)))
            * sqrt(list_dot_product(pr.p, pr.p))) AS c
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN probe pr
)
SELECT vec_id, round(c, 6) AS cosine FROM scored
ORDER BY round(c, 6) DESC, vec_id LIMIT {k}
"""


def _planes_values(n_planes: int, seed: int, dim: int) -> str:
    from openaleph_search_spark.ops.similarity import hyperplanes
    planes = hyperplanes(dim, n_planes, seed)
    return ",\n       ".join(
        "(%d, [%s]::DOUBLE[])" % (
            i, ", ".join(repr(float(x)) for x in planes[i]))
        for i in range(n_planes))


def _embedding_dedup_sql(threshold: float = 0.9, n_planes: int = 8,
                         radius: int = 2, seed: int = 42,
                         dim: int = 64) -> str:
    return f"""
WITH planes(pid, vec) AS (VALUES {_planes_values(n_planes, seed, dim)}),
bk AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(
                 list_transform(e.embedding, x -> x::DOUBLE), pl.vec) > 0
             THEN (1 << pl.pid) ELSE 0 END)::UBIGINT AS b
  FROM embeddings e CROSS JOIN planes pl GROUP BY e.vec_id
),
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.vec_id < b.vec_id
  WHERE bit_count(xor(a.b, b.b)) <= {radius}
),
sc AS (
  SELECT c.id_a, c.id_b,
         round(list_dot_product(
                 list_transform(ea.embedding, x -> x::DOUBLE),
                 list_transform(eb.embedding, x -> x::DOUBLE))
           / (sqrt(list_dot_product(
                 list_transform(ea.embedding, x -> x::DOUBLE),
                 list_transform(ea.embedding, x -> x::DOUBLE)))
              * sqrt(list_dot_product(
                 list_transform(eb.embedding, x -> x::DOUBLE),
                 list_transform(eb.embedding, x -> x::DOUBLE)))), 6)
         AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, cosine FROM sc WHERE cosine >= {threshold}
"""


def _ivf_ann_sql(n_centroids: int = 16, n_probe: int = 4,
                 k: int = 10) -> str:
    return f"""
WITH cents AS (
  SELECT vec_id AS cid,
         list_transform(embedding, x -> x::DOUBLE) AS cv
  FROM embeddings
  ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR)), vec_id
  LIMIT {n_centroids}
),
asg AS (
  SELECT e.vec_id, c.cid,
         round(list_dot_product(
                 list_transform(e.embedding, x -> x::DOUBLE), c.cv)
           / (sqrt(list_dot_product(
                 list_transform(e.embedding, x -> x::DOUBLE),
                 list_transform(e.embedding, x -> x::DOUBLE)))
              * sqrt(list_dot_product(c.cv, c.cv))), 9) AS s
  FROM embeddings e CROSS JOIN cents c
),
cell AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid) AS rn
    FROM asg) WHERE rn = 1
),
probe AS (SELECT list_transform(embedding, x -> x::DOUBLE) AS p
          FROM embeddings WHERE vec_id = 0),
pcells AS (
  SELECT cid FROM (
    SELECT c.cid,
           round(list_dot_product(c.cv, pr.p)
             / (sqrt(list_dot_product(c.cv, c.cv))
                * sqrt(list_dot_product(pr.p, pr.p))), 9) AS s
    FROM cents c CROSS JOIN probe pr)
  ORDER BY s DESC, cid LIMIT {n_probe}
),
scored AS (
  SELECT e.vec_id,
         list_dot_product(list_transform(e.embedding, x -> x::DOUBLE),
                          pr.p)
         / (sqrt(list_dot_product(
                list_transform(e.embedding, x -> x::DOUBLE),
                list_transform(e.embedding, x -> x::DOUBLE)))
            * sqrt(list_dot_product(pr.p, pr.p))) AS c
  FROM embeddings e
  JOIN cell ON cell.vec_id = e.vec_id
  CROSS JOIN probe pr
  WHERE cell.cid IN (SELECT cid FROM pcells)
)
SELECT vec_id, round(c, 6) AS cosine FROM scored
ORDER BY round(c, 6) DESC, vec_id LIMIT {k}
"""


_V_CATS: dict[str, object] = {}


def _versions_cat(spark: SparkSession, sf_dir: str):
    """Two-version index catalog for S12 (the reference's read-over-
    versions alias, index/indexes.py:76-97): v1 = the full corpus;
    v2 = a mid-reindex snapshot where docs with did%3==0 are not yet
    reindexed (dropped) and docs with did%5==0 changed (' versiontwo'
    appended) — did = the source documents.doc_id from the path."""
    import shutil
    from openaleph_search_spark.index.build import (LAYOUT_VERSION,
                                                    build_index)
    from openaleph_search_spark.index.versions import IndexVersions
    from openaleph_search_spark.sources.code_table import load_docs
    key = os.path.abspath(sf_dir)
    if key not in _V_CATS:
        root = os.path.join(
            "/tmp", "oa_idxv_" + os.path.basename(key.rstrip("/")))
        cfg = {"layout_version": LAYOUT_VERSION,
               "v2_rule": "drop did%3==0; append ' versiontwo' "
                          "for did%5==0",
               "num_partitions": 4, "num_shards": 2}
        cat = IndexVersions(spark, root)
        if (_cache_stale(cat.path("v1"), cfg)
                or _cache_stale(cat.path("v2"), cfg)):
            shutil.rmtree(root, ignore_errors=True)
            docs = load_docs(spark, sf_dir)
            did = F.regexp_extract("path", r"mod_(\d+)\.", 1) \
                .cast("long")
            build_index(spark, docs, cat.path("v1"),
                        num_partitions=4, num_shards=2)
            docs2 = (docs.filter(did % 3 != 0)
                     .withColumn(
                         "content",
                         F.when(did % 5 == 0,
                                F.concat("content",
                                         F.lit(" versiontwo")))
                         .otherwise(F.col("content"))))
            build_index(spark, docs2, cat.path("v2"),
                        num_partitions=4, num_shards=2)
            _mark_built(cat.path("v1"), cfg)
            _mark_built(cat.path("v2"), cfg)
        cat.set_alias(read=["v1", "v2"], write="v2")
        _V_CATS[key] = cat
    return _V_CATS[key]


def s12_versions_union(spark, sf_dir):
    """S12: query the union of two index versions mid-cutover —
    per-version BM25 statistics (ES scores each physical index with
    its own idf/avgdl), newest-wins on the logical doc key for docs
    matching in both versions, v1-only matches still served."""
    cat = _versions_cat(spark, sf_dir)
    res = cat.search({"q": "merge join", "limit": 9999})
    out = _orig_id(res.hits).select(
        "doc_id", F.round("score", 4).alias("score"))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


def _s12_sql(k: int = 20) -> str:
    """Two-corpus BM25 with newest-wins merge, mirroring
    _versions_cat's v2 derivation on the documents view."""
    def ver(tag: str, rel: str) -> str:
        return f"""
tok{tag} AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         unnest(string_split(text, ' ')) AS term
  FROM {rel}
),
tf{tag} AS (
  SELECT doc_id, term, any_value(dl) AS dl, count(*) AS tf
  FROM tok{tag} GROUP BY doc_id, term
),
st{tag} AS (
  SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl
  FROM {rel}
),
df{tag} AS (
  SELECT term, count(*) AS df FROM tf{tag} GROUP BY term
),
s{tag} AS (
  SELECT tf{tag}.doc_id,
         sum( ln(1 + (st{tag}.n - df{tag}.df + 0.5)
                 / (df{tag}.df + 0.5))
              * tf{tag}.tf
              / (tf{tag}.tf + {K1} * (1 - {B} + {B} * tf{tag}.dl
                                      / st{tag}.avgdl))
         ) AS score
  FROM tf{tag} JOIN df{tag} USING (term) CROSS JOIN st{tag}
  WHERE tf{tag}.term IN ('join', 'merge')
  GROUP BY tf{tag}.doc_id
  HAVING count(*) = 2
)"""
    return f"""
WITH v2docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' versiontwo'
              ELSE text END AS text
  FROM documents WHERE doc_id % 3 <> 0
),
{ver('1', 'documents')},
{ver('2', 'v2docs')},
merged AS (
  SELECT doc_id, score FROM s2
  UNION ALL
  SELECT doc_id, score FROM s1
  WHERE doc_id NOT IN (SELECT doc_id FROM s2)
)
SELECT doc_id, round(score, 4) AS score FROM merged
ORDER BY round(score, 4) DESC, doc_id
LIMIT {k}
"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 match top-k over the sf0.001 code table."""
    return q28_bm25_match_topk(spark, "/root/testdata/sf0.001")



def pipe_temperature(spark, sf_dir):
    """Temperature / alpha-sampling rebalance (the mT5/XLM-R
    multilingual-mixing rule) over the documents table's sources:
    target share q proportional to p^alpha (alpha=0.5), downsampling
    keep-fractions against the natural-size budget
    (ops/mixing.temperature_fractions — one tiny partial-aggregated
    groupBy, then window math on the #groups-sized relation)."""
    from openaleph_search_spark.ops.mixing import temperature_fractions
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = temperature_fractions(df, group_col="source", alpha=0.5)
    return out.select("group", "n",
                      F.round("p", 6).alias("p"),
                      F.round("q", 6).alias("q"),
                      F.round("weight", 6).alias("weight"),
                      F.round("fraction", 6).alias("fraction"))



def pipe_replicate(spark, sf_dir):
    """Deterministic weighted replication (the up-sampling half of
    alpha-sampling): floor(w) copies per row + one more gated on the
    salted hash fraction (ops/mixing.replicate_by_weight — pure
    Column gate + explode(sequence()) inside the scan, no shuffle)."""
    from openaleph_search_spark.ops.mixing import replicate_by_weight
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wts = {"en": 2.0, "de": 1.5, "fr": 0.25, "zh": 3.25}
    return (replicate_by_weight(df, wts, group_col="lang")
            .select("doc_id", "lang", F.col("rep").cast("long")
                    .alias("rep")))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering note: the driver's correctness gate records only the
    # FIRST 50 entries, so entries that have never (or least recently)
    # appeared in a driver CORRECTNESS artifact are listed first and the
    # block is rotated each round.  Round 5 rotation: the 26 entries
    # that sat past position 50 in round 4 (a1..a7 facets, s6/s7/s9/s10
    # sources, the dedup/sim/textstat ops — all driver-green in
    # CORRECTNESS_r02/r03.json) lead; the 50 that just recorded r4
    # rows follow in their r4 order. Rotate again next round.
    return {
        "s12_versions_union": s12_versions_union,
        "a1_terms_facet": a1_terms_facet,
        "a2_cardinality": a2_cardinality,
        "a3_date_histogram": a3_date_histogram,
        "a4_metrics_nested": a4_metrics_nested,
        "a5_significant_terms": a5_significant_terms,
        "a3_engine_histogram": a3_engine_histogram,
        "a5_engine_significant": a5_engine_significant,
        "a7_systematic_sample": a7_systematic_sample,
        "s6_export_query": s6_export_query,
        "s7_filtered_scan": s7_filtered_scan,
        "s9_ids_lookup": s9_ids_lookup,
        "s10_checksum_counts": s10_checksum_counts,
        "s10_msearch": s10_msearch,
        "dedup_exact": dedup_exact,
        "dedup_minhash_lsh": dedup_minhash_lsh,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_clusters": dedup_clusters,
        "dedup_decontaminate": dedup_decontaminate,
        "dedup_simhash": dedup_simhash,
        "dedup_embedding": dedup_embedding,
        "sim_cosine_topk": sim_cosine_topk,
        "sim_lsh_ann": sim_lsh_ann,
        "sim_ivf_ann": sim_ivf_ann,
        "sim_knn_join": sim_knn_join,
        "text_language_id": text_language_id,
        "text_token_quality": text_token_quality,
        # reshaped this round (broadcast-set strip): pull into the
        # driver window so the new shape records a driver-green row
        "dedup_strip_boilerplate": dedup_strip_boilerplate,
        "q15_percolate": q15_percolate,
        "q16_more_like_this": q16_more_like_this,
        "q17_match_query": q17_match_query,
        "q18_blocking": q18_blocking,
        "q19_mentions": q19_mentions,
        "q24_highlight": q24_highlight,
        "q1_fielded_search": q1_fielded_search,
        "q2_multifield_dismax": q2_multifield_dismax,
        "q20_geo_distance": q20_geo_distance,
        "a6_significant_text": a6_significant_text,
        "text_fingerprint": text_fingerprint,
        "text_pack_sequences": text_pack_sequences,
        "q2b_weak_length_norm": q2b_weak_length_norm,
        "text_repetition": text_repetition,
        "pipe_mixture_sample": pipe_mixture_sample,
        "text_pii_scrub": text_pii_scrub,
        "sim_quantize_int8": sim_quantize_int8,
        "dedup_duplicate_spans": dedup_duplicate_spans,
        "dedup_cut_spans": dedup_cut_spans,
        "text_vocab": text_vocab,
        "text_unigram_logprob": text_unigram_logprob,
        "pipe_split": pipe_split,
        "dedup_boilerplate_lines": dedup_boilerplate_lines,
        "text_bpe_roundtrip": text_bpe_roundtrip,
        "dedup_keep_one": dedup_keep_one,
        "q28_bm25_match_topk": q28_bm25_match_topk,
        "q9_bool_or": q9_bool_or,
        "q9_bool_not": q9_bool_not,
        "q9_boosted_should_topk": q9_boosted_should_topk,
        "q23_synonyms_multitoken": q23_synonyms_multitoken,
        "q14_phrase": q14_phrase,
        "q14b_phrase_slop": q14b_phrase_slop,
        "q8_prefix": q8_prefix,
        "q1_wildcard_infix": q1_wildcard_infix,
        "s4_delete_by_query_search": s4_delete_by_query_search,
        "s5_delete_by_ids_search": s5_delete_by_ids_search,
        "s3_upsert_compact_search": s3_upsert_compact_search,
        "q21_function_score": q21_function_score,
        "q5_range_filter": q5_range_filter,
        "t8_symbol_legs": t8_symbol_legs,
        "q13_terms_set": q13_terms_set,
        "q30_analyze": q30_analyze,
        "q4_term_filter_scored": q4_term_filter_scored,
        "q12_auth_filter": q12_auth_filter,
        "q11_exclude_filter": q11_exclude_filter,
        "q31_count": q31_count,
        "q26_sort_q27_paging": q26_sort_q27_paging,
        "q27_search_after": q27_search_after,
        "q10_post_filter_facet": q10_post_filter_facet,
        "pipe_temperature": pipe_temperature,
        "pipe_replicate": pipe_replicate,
    }


def oracle_sql() -> dict[str, str]:
    jacc = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tt FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(tt) - 1),
             i -> array_to_string(tt[i:i+2], ' '))) AS toks
  FROM t
),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.toks, b.toks))::DOUBLE
         / (len(a.toks) + len(b.toks)
            - len(list_intersect(a.toks, b.toks))) AS j
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(j, 6) AS jaccard FROM pairs WHERE j >= 0.95
"""
    ngram = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, len(t) - 1),
             i -> array_to_string(t[i:i+2], ' '))) AS shingles
  FROM d
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.id_a, c.id_b,
       round(c.inter::DOUBLE / (sa.n_sh + sb.n_sh - c.inter), 6) AS jaccard
FROM common c
JOIN sizes sa ON sa.doc_id = c.id_a
JOIN sizes sb ON sb.doc_id = c.id_b
WHERE c.inter::DOUBLE / (sa.n_sh + sb.n_sh - c.inter) >= 0.5
"""
    cosine = """
WITH probe AS (
  SELECT list_transform(embedding, x -> x::DOUBLE) AS p
  FROM embeddings WHERE vec_id = 0
),
scored AS (
  SELECT e.vec_id,
         list_dot_product(list_transform(e.embedding, x -> x::DOUBLE), probe.p)
         / (sqrt(list_dot_product(list_transform(e.embedding, x -> x::DOUBLE),
                                  list_transform(e.embedding, x -> x::DOUBLE)))
            * sqrt(list_dot_product(probe.p, probe.p))) AS c
  FROM embeddings e CROSS JOIN probe
)
SELECT vec_id, round(c, 6) AS cosine FROM scored
ORDER BY round(c, 6) DESC, vec_id LIMIT 10
"""
    stop = {
        "de": "['der','die','das','und','ist','von','mit','für','nicht']",
        "en": "['the','and','of','to','in','is','that','for','with']",
        "es": "['el','la','los','de','que','y','en','es','por']",
        "fr": "['le','la','les','et','de','un','une','est','pour']",
    }
    lang_hits = ", ".join(
        f"len(list_intersect(toks, {lst})) AS h_{lang}"
        for lang, lst in stop.items())
    langid = f"""
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(
             string_split_regex(lower(text), '[^a-z0-9_]+'),
             x -> x != '')) AS toks
  FROM documents
),
h AS (SELECT doc_id, {lang_hits} FROM t),
pred AS (
  SELECT doc_id, CASE
    WHEN h_de = 0 AND h_en = 0 AND h_es = 0 AND h_fr = 0 THEN 'und'
    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
    WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
    WHEN h_es >= h_fr THEN 'es'
    ELSE 'fr' END AS lang_pred
  FROM h
)
SELECT lang_pred, count(*) AS n FROM pred GROUP BY 1
"""
    tokq = """
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                     x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS ws_tokens,
       len(toks) AS word_tokens,
       CAST(ceil(length(regexp_replace(text, '\\s+', '', 'g')) / 4.0)
            AS BIGINT) AS bpe_tokens_est,
       round(length(regexp_replace(text,
             '[^!-/:-@\\[-`{-~]', '', 'g'))::DOUBLE
             / greatest(length(text), 1), 6) AS punct_ratio,
       round(len(list_intersect(list_distinct(toks),
             ['the','and','of','to','in','is','that','for','with']))::DOUBLE
             / greatest(len(list_distinct(toks)), 1), 6) AS stopword_ratio,
       round(list_sum(list_transform(toks, x -> length(x)))::DOUBLE
             / greatest(len(toks), 1), 6) AS mean_word_len
FROM t
"""
    fingerprint = """
WITH t AS (
  SELECT doc_id,
         array_to_string(list_filter(
             string_split_regex(lower(text), '[^a-z0-9_]+'),
             x -> x != ''), ' ') AS norm
  FROM documents
)
SELECT doc_id, md5(norm) AS fingerprint_md5,
       list_min(list_transform(
           range(1, greatest(length(norm) - 7, 1) + 1),
           i -> md5(norm[i:i+7]))) AS fingerprint_min8
FROM t
"""
    return {
        "s12_versions_union": _s12_sql(20),
        "q28_bm25_match_topk": _bm25_sql(
            ["spark", "query", "join"], 20, "and"),
        "q9_bool_or": _bm25_sql(["merge", "window", "vector"], 20, "or"),
        "q9_bool_not": _bm25_sql(["vector"], 20, "or",
                                 not_terms=["window"]),
        # merge^2 OR window OR (vector NOT stream), k=3: per-child
        # boosted contributions; the vector leg is void on stream-docs
        "q9_boosted_should_topk": f"""
WITH {_TOK_CTE.format(where='')},
bm AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
         * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         AS sc
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term IN ('merge', 'window', 'vector', 'stream')
),
contrib AS (
  SELECT doc_id,
         sum(CASE WHEN term = 'merge' THEN 2 * sc
                  WHEN term = 'window' THEN sc
                  WHEN term = 'vector' AND doc_id NOT IN
                       (SELECT doc_id FROM bm WHERE term = 'stream')
                       THEN sc END) AS score,
         count(CASE WHEN term IN ('merge', 'window')
                    OR (term = 'vector' AND doc_id NOT IN
                        (SELECT doc_id FROM bm WHERE term = 'stream'))
                    THEN 1 END) AS nmatch
  FROM bm GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM contrib WHERE nmatch >= 1
ORDER BY round(score, 4) DESC, doc_id
LIMIT 3
""",
        "q14_phrase": _phrase_sql("table", "scan", 15),
        # synonyms=true with rule {vector, "table scan"}: additive
        # bm25(vector) + Lucene-phrase(table scan), match on either leg
        "q23_synonyms_multitoken": f"""
WITH {_TOK_CTE.format(where='')},
tscore AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         ) AS s
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term = 'vector'
  GROUP BY tf.doc_id
),
pos AS (
  SELECT d.doc_id, d.dl, d.toks[i.i + 1] AS term, i.i AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS dl FROM documents) d,
       LATERAL (SELECT unnest(range(len(d.toks))) AS i) i
),
pidf AS (
  SELECT sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))) AS v
  FROM dfreq CROSS JOIN stats WHERE dfreq.term IN ('table', 'scan')
),
pmatch AS (
  SELECT a.doc_id, any_value(a.dl) AS dl, count(*) AS ptf
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'table' AND b.term = 'scan'
  GROUP BY a.doc_id
),
pscore AS (
  SELECT m.doc_id,
         pidf.v * m.ptf
         / (m.ptf + {K1} * (1 - {B} + {B} * m.dl / stats.avgdl)) AS s
  FROM pmatch m CROSS JOIN pidf CROSS JOIN stats
),
hits AS (
  SELECT doc_id FROM tscore UNION SELECT doc_id FROM pscore
)
SELECT h.doc_id,
       round(coalesce(t.s, 0) + coalesce(p.s, 0), 4) AS score
FROM hits h LEFT JOIN tscore t USING (doc_id)
            LEFT JOIN pscore p USING (doc_id)
ORDER BY round(coalesce(t.s, 0) + coalesce(p.s, 0), 4) DESC, h.doc_id
LIMIT 15
""",
        "q14b_phrase_slop": f"""
WITH pos AS (
  SELECT d.doc_id, d.dl, d.toks[i.i + 1] AS term, i.i AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS dl FROM documents) d,
       LATERAL (SELECT unnest(range(len(d.toks))) AS i) i
),
stats AS (
  SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM pos
  WHERE term IN ('vector', 'stream') GROUP BY term
),
idf AS (
  SELECT sum(ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))) AS v
  FROM dfreq CROSS JOIN stats
),
matches AS (
  SELECT a.doc_id, any_value(a.dl) AS dl,
         count(DISTINCT a.pos) AS tf
  FROM pos a
  WHERE a.term = 'vector' AND EXISTS (
    SELECT 1 FROM pos b WHERE b.doc_id = a.doc_id
      AND b.term = 'stream' AND abs((b.pos - 1) - a.pos) <= 2)
  GROUP BY a.doc_id
)
SELECT m.doc_id,
       round(idf.v * m.tf
             / (m.tf + {K1} * (1 - {B} + {B} * m.dl / stats.avgdl)),
             4) AS score
FROM matches m CROSS JOIN idf CROSS JOIN stats
ORDER BY score DESC, m.doc_id
LIMIT 15
""",
        "q8_prefix": _bm25_sql(["scan"], 10, "or"),
        "q1_wildcard_infix": _bm25_sql(["scan", "small", "spark"], 15,
                                       "or"),
        # S4: tombstoned (lang='de') docs invisible; stats = build stats
        "s4_delete_by_query_search": _bm25_sql(
            ["vector", "merge"], 20, "and", doc_filter="lang != 'de'"),
        # S5: source ids < 50 tombstoned
        "s5_delete_by_ids_search": _bm25_sql(
            ["stream", "table"], 20, "or", doc_filter="doc_id >= 50"),
        # Q30: same chain in DuckDB — strip_accents/lower/token regex
        "q30_analyze": f"""
WITH t AS (SELECT regexp_extract_all(
    strip_accents(lower('{ANALYZE_PROBE}')), '[a-z0-9_]+') AS toks)
SELECT t.toks[i.i + 1] AS term, i.i AS position
FROM t, LATERAL (SELECT unnest(range(len(t.toks))) AS i) i
ORDER BY position
""",
        # Q13: ≥2 of the 3 legs must match
        "q13_terms_set": _bm25_sql(
            ["merge", "window", "vector"], 20, "and")
        .replace("HAVING count(*) = 3", "HAVING count(*) >= 2"),
        # Q21: BM25 + sqrt(0.5·dl), boost_mode sum
        "q21_function_score": f"""
WITH {_TOK_CTE.format(where='')},
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         ) + sqrt(0.5 * any_value(tf.dl)) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term IN ('merge', 'vector')
  GROUP BY tf.doc_id
  HAVING count(*) = 2
)
SELECT doc_id, round(score, 4) AS score
FROM scores
ORDER BY round(score, 4) DESC, doc_id
LIMIT 20
""",
        # T8: symbol leg only (vladimir isn't a content token) —
        # owners doc_id%12 ∈ {0,1} share symbol sym_vladimir; docs with
        # ANY symbol: %12 ∈ {0,1,2,3,9}. Engine's pinned per-field
        # avgdl convention divides by ALL docs: avgdl = d/n, dl = 1 →
        # score = 0.5·idf · 1/(1 + K1·(1-B+B·n/d))
        "t8_symbol_legs": f"""
WITH stats AS (SELECT count(*) AS n FROM documents),
symall AS (SELECT count(*) AS d FROM documents
           WHERE doc_id % 12 IN (0, 1, 2, 3, 9)),
sym AS (SELECT doc_id FROM documents WHERE doc_id % 12 IN (0, 1)),
sdf AS (SELECT count(*) AS df FROM sym)
SELECT s.doc_id,
       round(0.5 * ln(1 + (stats.n - sdf.df + 0.5) / (sdf.df + 0.5))
             / (1.0 + {K1} * (1 - {B} + {B} * stats.n / symall.d)),
             4) AS score
FROM sym s CROSS JOIN stats CROSS JOIN sdf CROSS JOIN symall
ORDER BY s.doc_id
""",
        # Q5: created = 2020-01-01 + (doc_id % 360) days; period
        # [2020-03, 2020-06) → day offsets [60, 152)
        "q5_range_filter": _bm25_sql(
            ["vector"], 20, "or",
            doc_filter="(doc_id % 360) >= 60 AND (doc_id % 360) < 152"),
        # S3: doc 7's text replaced; compact() re-derives stats from
        # live docs, so the oracle recomputes everything over docs2
        "s3_upsert_compact_search": _bm25_sql(
            ["vector", "merge"], 20, "and")
        .replace("FROM documents", "FROM docs2")
        .replace("WITH ", f"""WITH docs2 AS (
  SELECT doc_id,
         CASE WHEN doc_id = 7 THEN '{UPSERT_TEXT}' ELSE text END AS text
  FROM documents
), """, 1),
        "q4_term_filter_scored": _bm25_sql(
            ["vector", "stream"], 20, "and", doc_filter="lang = 'de'"),
        # auth: repo = 'org' || doc_id%7 || '/project' || doc_id%23
        "s10_msearch": (
            "SELECT 'qa' AS query_id, * FROM ("
            + _bm25_sql(["merge", "join"], 10, "and")
            + ") UNION ALL SELECT 'qb', * FROM ("
            + _bm25_sql(["vector", "stream"], 10, "or")
            + ") UNION ALL SELECT 'qc', * FROM ("
            + _phrase_sql("table", "scan", 10) + ")"),
        "q12_auth_filter": _bm25_sql(
            ["vector"], 20, "or",
            doc_filter="('org' || (doc_id % 7) || '/project' || "
                       "(doc_id % 23)) IN ('org1/project1', "
                       "'org2/project2', 'org3/project3')"),
        "q11_exclude_filter": _bm25_sql(
            ["vector"], 20, "or", doc_filter="lang != 'en'"),
        "q31_count": f"""
WITH {_TOK_CTE.format(where='')}
SELECT count(*) AS matches FROM (
  SELECT doc_id FROM tf WHERE term IN ('vector', 'merge')
  GROUP BY doc_id HAVING count(*) = 2)
""",
        "q26_sort_q27_paging": """
SELECT doc_id, len(string_split(text, ' ')) AS doc_len
FROM documents
WHERE text LIKE '%vector%'
ORDER BY doc_len DESC, doc_id LIMIT 25
""",
        "q27_search_after": """
WITH d AS (
  SELECT doc_id,
         'src/' || source || '/mod_' || doc_id || '.' ||
         CASE lang WHEN 'en' THEN 'py' WHEN 'fr' THEN 'js'
                   WHEN 'es' THEN 'go' WHEN 'de' THEN 'java'
                   WHEN 'zh' THEN 'rs' ELSE 'txt' END AS path,
         text
  FROM documents
)
SELECT doc_id, path FROM d
WHERE text LIKE '%vector%'
  AND (path > 'src/src5' OR (path = 'src/src5' AND doc_id > 0))
ORDER BY path, doc_id LIMIT 15
""",
        "pipe_replicate": """
WITH g AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':rep'),
                         17, 16))::UBIGINT AS u,
         CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 1
                   WHEN 'fr' THEN 0 WHEN 'zh' THEN 3 END AS n_full,
         CASE lang WHEN 'en' THEN 0
                   WHEN 'de' THEN 9223372036854775808
                   WHEN 'fr' THEN 4611686018427387904
                   WHEN 'zh' THEN 4611686018427387904 END::UBIGINT AS thr
  FROM documents WHERE lang IN ('en', 'de', 'fr', 'zh')
),
n AS (
  SELECT doc_id, lang,
         n_full + CASE WHEN thr > 0 AND u < thr THEN 1 ELSE 0 END AS n
  FROM g
)
SELECT doc_id, lang, unnest(range(n)) AS rep FROM n WHERE n > 0
""",
        "pipe_temperature": """
WITH c AS (
  SELECT source AS "group", count(*) AS n FROM documents GROUP BY 1
),
t AS (
  SELECT "group", n,
         n::DOUBLE / (SUM(n) OVER ())::DOUBLE AS p,
         pow(n::DOUBLE / (SUM(n) OVER ())::DOUBLE, 0.5) AS q0,
         (SUM(n) OVER ())::DOUBLE AS tot
  FROM c
)
SELECT "group", n,
       round(p, 6) AS p,
       round(q0 / SUM(q0) OVER (), 6) AS q,
       round(q0 / SUM(q0) OVER () * tot / n, 6) AS weight,
       round(least(1.0, q0 / SUM(q0) OVER () * tot / n), 6) AS fraction
FROM t ORDER BY "group"
""",
        "q10_post_filter_facet": """
WITH m AS (
  SELECT doc_id, lang FROM (
    SELECT d.doc_id, d.lang, count(DISTINCT t.term) AS hit
    FROM documents d,
         LATERAL (SELECT unnest(string_split(d.text, ' ')) AS term) t
    WHERE t.term IN ('vector', 'merge')
    GROUP BY d.doc_id, d.lang) WHERE hit = 2
)
SELECT lang, count(*) AS n FROM m GROUP BY lang
ORDER BY n DESC, lang LIMIT 20
""",
        "a1_terms_facet": """
SELECT lang, count(*) AS n FROM documents GROUP BY lang
ORDER BY n DESC, lang LIMIT 20
""",
        "a2_cardinality": """
SELECT count(DISTINCT source) AS cardinality FROM documents
""",
        "a3_date_histogram": """
WITH bounds AS (
  SELECT date_trunc('month', min(ts)) AS lo,
         date_trunc('month', max(ts)) AS hi FROM events
),
frame AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS bucket
  FROM bounds
),
c AS (
  SELECT date_trunc('month', ts) AS bucket, count(*) AS n
  FROM events GROUP BY 1
)
SELECT strftime(f.bucket, '%Y-%m') AS month, coalesce(c.n, 0) AS n
FROM frame f LEFT JOIN c USING (bucket) ORDER BY f.bucket
""",
        "a4_metrics_nested": """
SELECT event_type, round(sum(value), 4) AS sum_value,
       round(avg(value), 4) AS avg_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events GROUP BY event_type
""",
        "a3_engine_histogram": """
WITH m AS (
  SELECT doc_id,
         TIMESTAMP '2020-01-01' + INTERVAL ((doc_id % 360)) DAY AS created
  FROM documents
  WHERE doc_id IN (
    SELECT DISTINCT doc_id FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents) WHERE term = 'vector')
    AND TIMESTAMP '2020-01-01' + INTERVAL ((doc_id % 360)) DAY
        >= TIMESTAMP '2020-03-01'
),
c AS (
  SELECT date_trunc('month', created) AS bucket, count(*) AS n
  FROM m GROUP BY 1
),
bounds AS (
  SELECT date_trunc('month', min(created)) AS lo,
         date_trunc('month', max(created)) AS hi FROM m
),
frame AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS bucket
  FROM bounds
)
SELECT strftime(f.bucket, '%Y-%m') AS month, coalesce(c.n, 0) AS n
FROM frame f LEFT JOIN c USING (bucket) ORDER BY f.bucket
""",
        "a5_engine_significant": """
WITH m AS (
  SELECT doc_id FROM (
    SELECT doc_id, count(DISTINCT term) AS hit FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents) WHERE term IN ('vector', 'stream')
    GROUP BY doc_id) WHERE hit = 2
),
fg AS (
  SELECT d.lang AS v, count(*) AS fg_count
  FROM documents d JOIN m USING (doc_id) GROUP BY 1
),
bg AS (SELECT lang AS v, count(*) AS bg_count FROM documents GROUP BY 1),
tot AS (
  SELECT (SELECT count(*) FROM m) AS ft,
         (SELECT count(*) FROM documents) AS bt
),
j AS (
  SELECT fg.v, fg.fg_count, coalesce(bg.bg_count, 0) AS bg_count,
         (fg.fg_count / ft::DOUBLE
          - (coalesce(bg.bg_count, 0) + 1.0) / (bt + 1.0))
         * (fg.fg_count / ft::DOUBLE)
         / ((coalesce(bg.bg_count, 0) + 1.0) / (bt + 1.0)) AS score
  FROM fg LEFT JOIN bg USING (v) CROSS JOIN tot
)
SELECT v AS lang, fg_count, bg_count, round(score, 6) AS score
FROM j WHERE score > 0 ORDER BY score DESC, v LIMIT 20
""",
        "a5_significant_terms": """
WITH fg AS (
  SELECT user_id AS v, count(*) AS fg_count FROM events
  WHERE event_type = 'error' GROUP BY 1
),
bg AS (SELECT user_id AS v, count(*) AS bg_count FROM events GROUP BY 1),
tot AS (
  SELECT (SELECT count(*) FROM events WHERE event_type = 'error') AS ft,
         (SELECT count(*) FROM events) AS bt
),
j AS (
  SELECT fg.v, fg.fg_count, coalesce(bg.bg_count, 0) AS bg_count,
         (fg.fg_count / ft::DOUBLE
          - (coalesce(bg.bg_count, 0) + 1.0) / (bt + 1.0))
         * (fg.fg_count / ft::DOUBLE)
         / ((coalesce(bg.bg_count, 0) + 1.0) / (bt + 1.0)) AS score
  FROM fg LEFT JOIN bg USING (v) CROSS JOIN tot
)
SELECT v AS user_id, fg_count, bg_count, round(score, 6) AS score
FROM j WHERE score > 0 ORDER BY score DESC, v LIMIT 10
""",
        "a7_systematic_sample": """
SELECT event_type, count(*) AS n FROM events
WHERE event_id % 10 = 0 GROUP BY event_type
""",
        "s6_export_query": """
WITH m AS (
  SELECT doc_id FROM (
    SELECT doc_id, count(DISTINCT term) AS hit FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents) WHERE term IN ('vector', 'stream')
    GROUP BY doc_id) WHERE hit = 2
)
SELECT d.doc_id, d.lang,
       len(string_split(d.text, ' '))::BIGINT AS doc_len
FROM documents d JOIN m USING (doc_id)
WHERE d.lang = 'en'
""",
        "s7_filtered_scan": """
SELECT doc_id, source, n_chars FROM documents
WHERE lang = 'en' AND n_chars > 300
""",
        "s9_ids_lookup": """
SELECT doc_id, lang, n_chars FROM documents
WHERE doc_id IN (1, 7, 42, 99, 123, 333)
""",
        "s10_checksum_counts": """
SELECT sha256(text) AS checksum, count(*) AS n FROM documents
GROUP BY 1 HAVING count(*) > 0 ORDER BY checksum LIMIT 50
""",
        "dedup_exact": """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 20
)
SELECT sha256(trim(text)) AS content_hash, count(*) AS n_docs,
       array_to_string(list_sort(list(doc_id)), ',') AS ids
FROM all_docs GROUP BY 1 HAVING count(*) > 1
""",
        "dedup_minhash_lsh": jacc,
        "dedup_ngram_jaccard": ngram,
        "dedup_clusters": """
WITH RECURSIVE
d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, len(t) - 1),
             i -> array_to_string(t[i:i+2], ' '))) AS shingles
  FROM d
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e0 AS (
  SELECT c.id_a AS a, c.id_b AS b FROM common c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE c.inter::DOUBLE / (sa.n_sh + sb.n_sh - c.inter) >= 0.5
),
edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
walk(id, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
)
SELECT id AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY id
""",
        "sim_cosine_topk": cosine,
        "text_language_id": langid,
        "text_token_quality": tokq,
        "text_fingerprint": fingerprint,
        "dedup_decontaminate": """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, len(t) - 1),
             i -> array_to_string(t[i:i+2], ' '))) AS shingles
  FROM (SELECT doc_id,
               list_filter(string_split_regex(lower(text),
                           '[^a-z0-9_]+'), x -> x != '') AS t
        FROM documents)
  WHERE len(t) >= 3
),
ev AS (
  SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id < 5
),
hits AS (
  SELECT i.doc_id, count(*) AS eval_hits
  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh) i
  JOIN ev USING (s)
  GROUP BY i.doc_id
)
SELECT d.doc_id,
       coalesce(h.eval_hits, 0) > 0 AS contaminated,
       coalesce(h.eval_hits, 0)::BIGINT AS eval_hits
FROM documents d LEFT JOIN hits h USING (doc_id)
""",
        "text_pack_sequences": """
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\\s+')) AS ws_tokens
  FROM documents
),
w AS (
  SELECT doc_id, source, ws_tokens,
         (sum(ws_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - ws_tokens)::BIGINT AS pack_offset
  FROM t
)
SELECT doc_id,
       source || '-' || (pack_offset // 512)::VARCHAR AS pack_id,
       pack_offset, ws_tokens::BIGINT AS ws_tokens
FROM w
""",
        "q1_fielded_search": f"""
WITH {_TOK_CTE.format(where='')},
lstat AS (
  SELECT count(*) AS n,
         sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS dfl
  FROM documents
),
lang_score AS (
  SELECT ln(1 + (n - dfl + 0.5) / (dfl + 0.5)) * (1.0 / (1.0 + {K1}))
         AS s FROM lstat
),
cscore AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term = 'vector'
  GROUP BY tf.doc_id
)
SELECT c.doc_id, round(c.score + l.s, 4) AS score
FROM cscore c CROSS JOIN lang_score l
JOIN documents d ON d.doc_id = c.doc_id
WHERE d.lang = 'de'
ORDER BY round(c.score + l.s, 4) DESC, c.doc_id
LIMIT 20
""",
        "q2_multifield_dismax": f"""
WITH s AS (
  SELECT count(*) AS n,
         sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS df
  FROM documents
)
SELECT d.doc_id,
       round(2 * ln(1 + (s.n - s.df + 0.5) / (s.df + 0.5))
             * (1.0 / (1.0 + {K1})), 4) AS score
FROM documents d CROSS JOIN s
WHERE d.lang = 'es'
ORDER BY score DESC, d.doc_id
LIMIT 20
""",
        "q2b_weak_length_norm": f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS tt,
         len(string_split(text, ' ')) AS dl,
         least(1 + doc_id % 7, len(string_split(text, ' '))) AS tdl
  FROM documents
),
stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl, avg(tdl) AS avgdl_t FROM base
),
tsc AS (
  SELECT doc_id, tdl,
         len(list_filter(tt[1:tdl], x -> x = 'data')) AS tf
  FROM base
),
tdf AS (SELECT count(*) AS df FROM tsc WHERE tf > 0),
csc AS (
  SELECT doc_id, dl, len(list_filter(tt, x -> x = 'vector')) AS tf
  FROM base
),
cdf AS (SELECT count(*) AS df FROM csc WHERE tf > 0)
SELECT t.doc_id,
       round(
         ln(1 + (s.n - tdf.df + 0.5) / (tdf.df + 0.5))
           * t.tf / (t.tf + {K1} * (1 - 0.25 + 0.25 * t.tdl / s.avgdl_t))
       + ln(1 + (s.n - cdf.df + 0.5) / (cdf.df + 0.5))
           * c.tf / (c.tf + {K1} * (1 - {B} + {B} * c.dl / s.avgdl)),
       4) AS score
FROM tsc t JOIN csc c USING (doc_id)
CROSS JOIN stats s CROSS JOIN tdf CROSS JOIN cdf
WHERE t.tf > 0 AND c.tf > 0
ORDER BY score DESC, t.doc_id
LIMIT 20
""",
        "dedup_duplicate_spans": """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                     x -> x != '') AS toks
  FROM documents
),
w AS (
  SELECT doc_id,
         UNNEST(list_transform(
             range(1, greatest(len(toks) - 4, 0) + 1),
             i -> {'pos': i - 1,
                   'win': array_to_string(toks[i:i+4], ' ')}),
             recursive := true)
  FROM t
),
dup AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
g AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS NULL
              OR pos > lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) + 5
              THEN 1 ELSE 0 END AS brk
  FROM w JOIN dup USING (win)
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM g
)
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + 5 AS INT) AS span_end,
       CAST(max(pos) + 5 - min(pos) AS INT) AS span_tokens
FROM isl GROUP BY doc_id, island
""",
        "dedup_cut_spans": """
WITH t AS (
  SELECT doc_id,
         coalesce(list_filter(
             string_split_regex(lower(text), '[^a-z0-9_]+'),
             x -> x != ''), []) AS toks
  FROM documents
),
w AS (
  SELECT doc_id,
         UNNEST(list_transform(
             range(1, greatest(len(toks) - 4, 0) + 1),
             i -> {'pos': i - 1,
                   'win': array_to_string(toks[i:i+4], ' ')}),
             recursive := true)
  FROM t
),
dup AS (SELECT win FROM w GROUP BY win HAVING count(*) >= 2),
g AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   IS NULL
              OR pos > lag(pos) OVER (PARTITION BY doc_id
                                      ORDER BY pos) + 5
              THEN 1 ELSE 0 END AS brk
  FROM w JOIN dup USING (win)
),
isl AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM g
),
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + 5 AS e
  FROM isl GROUP BY doc_id, island
),
tok AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, len(toks) + 1),
                i -> {'pos': i - 1, 'tok': toks[i]}),
             recursive := true)
  FROM t
),
kept AS (
  SELECT tok.doc_id, tok.pos, tok.tok
  FROM tok LEFT JOIN spans
    ON tok.doc_id = spans.doc_id
   AND tok.pos >= spans.s AND tok.pos < spans.e
  WHERE spans.s IS NULL
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
         count(*) AS n
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, coalesce(agg.txt, '') AS text_deduped,
       len(t.toks)::BIGINT AS n_tokens,
       (len(t.toks) - coalesce(agg.n, 0))::BIGINT AS n_tokens_removed
FROM t LEFT JOIN agg USING (doc_id)
""",
        "text_vocab": """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                     x -> x != '') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
pd AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
agg AS (SELECT token, count(*)::BIGINT AS df, sum(c)::BIGINT AS tf
        FROM pd GROUP BY token)
SELECT token, df, tf,
       row_number() OVER (ORDER BY tf DESC, token)::INT AS rank
FROM agg QUALIFY rank <= 200
""",
        "text_unigram_logprob": """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                     x -> x != '') AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS token FROM t),
pd AS (SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2),
vb AS (SELECT token, sum(c)::BIGINT AS tf FROM pd GROUP BY token),
tot AS (SELECT sum(tf) AS T, count(*) AS V FROM vb),
sc AS (
  SELECT tok.doc_id,
         ln((coalesce(vb.tf, 0) + 1)::DOUBLE / (tot.T + tot.V)) AS lp
  FROM tok LEFT JOIN vb USING (token) CROSS JOIN tot
),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens,
               round(avg(lp), 6) AS unigram_logprob
        FROM sc GROUP BY doc_id)
SELECT d.doc_id, coalesce(agg.n_tokens, 0) AS n_tokens,
       agg.unigram_logprob
FROM documents d LEFT JOIN agg USING (doc_id)
""",
        "pipe_split": """
WITH u AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                         17, 16))::UBIGINT AS h
  FROM documents
)
SELECT doc_id,
       CASE WHEN h < 14757395258967642112 THEN 'train'
            WHEN h < 16602069666338596864 THEN 'val'
            ELSE 'test' END AS split
FROM u
""",
        "dedup_boilerplate_lines": """
WITH t AS (
  SELECT doc_id,
         replace(text, ' table ', chr(10) || 'table ') AS text2
  FROM documents
),
l AS (
  SELECT doc_id, trim(u) AS line
  FROM t, UNNEST(string_split(text2, chr(10))) AS s(u)
  WHERE length(trim(u)) >= 10
)
SELECT md5(line) AS line_hash,
       count(DISTINCT doc_id)::BIGINT AS n_docs,
       count(*)::BIGINT AS n_occurrences,
       min(line) AS sample
FROM l GROUP BY md5(line)
HAVING count(DISTINCT doc_id) >= 2
""",
        "text_bpe_roundtrip": """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                     x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       md5(array_to_string(
           list_transform(toks, x -> x || '\u2581'), '')) AS reassembled_md5
FROM t
""",
        "dedup_strip_boilerplate": """
WITH t AS (
  SELECT doc_id,
         replace(text, ' table ', chr(10) || 'table ') AS text2
  FROM documents
),
pl AS (
  SELECT doc_id, CAST(s.i - 1 AS INT) AS pos, s.raw,
         trim(s.raw) AS line
  FROM t, UNNEST(list_transform(
      string_split(text2, chr(10)),
      (x, i) -> {'i': i, 'raw': x})) AS u(s)
),
bp AS (
  SELECT line FROM pl
  WHERE length(line) >= 10
  GROUP BY line HAVING count(DISTINCT doc_id) >= 2
),
kept AS (
  SELECT pl.doc_id, pl.pos, pl.raw
  FROM pl LEFT JOIN bp ON pl.line = bp.line
  WHERE bp.line IS NULL
),
agg AS (
  SELECT doc_id, string_agg(raw, chr(10) ORDER BY pos) AS text_clean,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
),
tot AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines FROM pl GROUP BY doc_id
)
SELECT tot.doc_id, coalesce(agg.text_clean, '') AS text_clean,
       tot.n_lines,
       (tot.n_lines - coalesce(agg.n_kept, 0))::BIGINT
         AS n_lines_removed
FROM tot LEFT JOIN agg USING (doc_id)
""",
        "dedup_keep_one": """
WITH RECURSIVE
d AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 3
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(
             range(1, len(t) - 1),
             i -> array_to_string(t[i:i+2], ' '))) AS shingles
  FROM d
),
sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
e0 AS (
  SELECT c.id_a AS a, c.id_b AS b FROM common c
  JOIN sizes sa ON sa.doc_id = c.id_a
  JOIN sizes sb ON sb.doc_id = c.id_b
  WHERE c.inter::DOUBLE / (sa.n_sh + sb.n_sh - c.inter) >= 0.5
),
edges AS (SELECT a, b FROM e0 UNION SELECT b, a FROM e0),
walk(id, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, w.lbl FROM walk w JOIN edges e ON e.a = w.id
),
comps AS (
  SELECT id, min(lbl) AS lbl FROM walk GROUP BY id
)
SELECT d0.doc_id FROM documents d0
LEFT JOIN (SELECT id FROM comps WHERE id != lbl) l
  ON d0.doc_id = l.id
WHERE l.id IS NULL
""",
        "sim_quantize_int8": """
WITH s AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding,
                                 x -> abs(CAST(x AS DOUBLE)))) AS m
  FROM embeddings
),
sc AS (
  SELECT vec_id, embedding,
         CASE WHEN m > 0 THEN 127.0 / m ELSE 0.0 END AS scale
  FROM s
),
codes AS (
  SELECT vec_id, scale,
         list_transform(embedding,
           x -> greatest(least(floor(CAST(x AS DOUBLE) * scale + 0.5),
                               127), -127)) AS c
  FROM sc
)
SELECT vec_id, round(scale, 6) AS q_scale,
       CAST(list_sum(c) AS BIGINT) AS q_sum,
       CAST(list_min(c) AS BIGINT) AS q_min,
       CAST(list_max(c) AS BIGINT) AS q_max
FROM codes
""",
        "pipe_mixture_sample": """
SELECT doc_id, lang FROM documents
WHERE CASE lang
  WHEN 'de' THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 16))::UBIGINT < 9223372036854775808
  WHEN 'en' THEN TRUE
  WHEN 'es' THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 16))::UBIGINT < 1844674407370955264
  WHEN 'fr' THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 16))::UBIGINT < 4611686018427387904
  WHEN 'zh' THEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 17, 16))::UBIGINT < 13835058055282163712
  ELSE FALSE END
""",
        "text_pii_scrub": r"""
WITH t AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@example.com at 10.' || CAST(doc_id % 256 AS VARCHAR)
           || '.0.1 or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
           AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}')) AS pii_email_count,
  len(regexp_extract_all(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS pii_ip_count,
  len(regexp_extract_all(text, '\+\d[\d\-]{7,}\d')) AS pii_phone_count,
  regexp_replace(regexp_replace(regexp_replace(text,
      '[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
      '\+\d[\d\-]{7,}\d', '[PHONE]', 'g') AS text_scrubbed
FROM t
""",
        "text_repetition": """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS tt,
         len(string_split(text, ' ')) AS n FROM documents
),
dw AS (
  SELECT doc_id,
         round(1.0 - len(list_distinct(tt)) * 1.0 / greatest(n, 1), 6)
           AS dup_word_fraction
  FROM base
),
gr AS (
  SELECT b.doc_id, g.n AS gn, b.n,
         array_to_string(b.tt[i.i:i.i+g.n-1], ' ') AS gram
  FROM base b, (VALUES (2),(3),(5)) g(n),
       LATERAL (SELECT unnest(range(1, b.n - g.n + 2)) AS i) i
),
cnt AS (SELECT doc_id, gn, n, gram, count(*) AS c FROM gr GROUP BY ALL),
agg AS (
  SELECT doc_id, gn,
         least(max(c) * gn * 1.0 / any_value(n), 1.0) AS topf,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) * 1.0 / sum(c) AS dupf
  FROM cnt GROUP BY doc_id, gn
)
SELECT d.doc_id, d.dup_word_fraction,
       round(coalesce(max(CASE WHEN gn=2 THEN topf END), 0), 6)
         AS top2gram_fraction,
       round(coalesce(max(CASE WHEN gn=3 THEN topf END), 0), 6)
         AS top3gram_fraction,
       round(coalesce(max(CASE WHEN gn=5 THEN dupf END), 0), 6)
         AS dup_ngram_fraction
FROM dw d LEFT JOIN agg USING (doc_id)
GROUP BY d.doc_id, d.dup_word_fraction
""",
        "q16_more_like_this": f"""
WITH {_TOK_CTE.format(where='')},
src AS (SELECT term, tf FROM tf WHERE doc_id = 0),
cand AS (
  SELECT s.term,
         s.tf * ln(1 + (stats.n - d.df + 0.5) / (d.df + 0.5)) AS w
  FROM src s JOIN dfreq d USING (term) CROSS JOIN stats
  WHERE d.df BETWEEN 1 AND CAST(floor(stats.n * 0.9) AS BIGINT)
    AND length(s.term) >= 3
),
sel AS (SELECT term FROM cand ORDER BY w DESC, term LIMIT 25),
nsel AS (SELECT count(*) AS n_terms FROM sel),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         ) AS score,
         count(*) AS hits
  FROM tf JOIN sel USING (term) JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT s.doc_id, round(s.score, 4) AS score
FROM scores s CROSS JOIN nsel
WHERE s.hits >= CAST(ceil(0.1 * nsel.n_terms) AS BIGINT)
  AND s.doc_id != 0
ORDER BY round(s.score, 4) DESC, s.doc_id
LIMIT 10
""",
        "q20_geo_distance": """
WITH pts AS (
  SELECT event_id,
         ((user_id * 7) % 180) - 90 + 0.5 AS lat,
         ((event_id * 13) % 360) - 180 + 0.5 AS lon
  FROM events
),
d AS (
  SELECT event_id,
         round(2 * 6371.0088 * asin(sqrt(
             pow(sin(radians(0 - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(0.0))
               * pow(sin(radians(0 - lon) / 2), 2))), 6) AS distance_km
  FROM pts
)
SELECT event_id, distance_km FROM d
ORDER BY distance_km, event_id LIMIT 20
""",
        "q15_percolate": """
WITH pos AS (
  SELECT d.doc_id, d.toks[i.i + 1] AS term, i.i AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS toks
        FROM documents) d,
       LATERAL (SELECT unnest(range(len(d.toks))) AS i) i
),
names(entity_id, t0, t1) AS (
  VALUES ('e1', 'table', 'scan'), ('e2', 'merge', 'join'),
         ('e3', 'vector', 'stream')
),
hits AS (
  SELECT DISTINCT a.doc_id, n.entity_id
  FROM names n
  JOIN pos a ON a.term = n.t0
  JOIN pos b ON b.doc_id = a.doc_id AND b.term = n.t1
            AND abs(b.pos - 1 - a.pos) <= 2
)
SELECT doc_id, entity_id, 2.0 AS score FROM hits
""",
        "q19_mentions": """
WITH pos AS (
  SELECT d.doc_id, d.dl, d.toks[i.i + 1] AS term, i.i AS pos
  FROM (SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS dl FROM documents) d,
       LATERAL (SELECT unnest(range(len(d.toks))) AS i) i
),
stats AS (
  SELECT count(*) AS n, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
),
dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM pos GROUP BY term
),
names(entity_id, t0, t1) AS (
  VALUES ('e1', 'table', 'scan'), ('e2', 'vector', 'stream')
),
idfs AS (
  SELECT n.entity_id,
         sum(ln(1 + (stats.n - d.df + 0.5) / (d.df + 0.5))) AS idf_sum
  FROM names n
  JOIN dfreq d ON d.term IN (n.t0, n.t1)
  CROSS JOIN stats
  GROUP BY n.entity_id
),
m AS (
  SELECT n.entity_id, a.doc_id, any_value(a.dl) AS dl,
         count(DISTINCT a.pos) AS tf
  FROM names n
  JOIN pos a ON a.term = n.t0
  WHERE EXISTS (SELECT 1 FROM pos b WHERE b.doc_id = a.doc_id
                AND b.term = n.t1 AND abs(b.pos - 1 - a.pos) <= 2)
  GROUP BY n.entity_id, a.doc_id
),
scored AS (
  SELECT m.entity_id, m.doc_id,
         round(i.idf_sum * m.tf
               / (m.tf + 1.2 * (1 - 0.75 + 0.75 * m.dl / stats.avgdl)),
               4) AS score
  FROM m JOIN idfs i USING (entity_id) CROSS JOIN stats
)
SELECT doc_id, entity_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY entity_id
            ORDER BY score DESC, doc_id) AS rn
  FROM scored) WHERE rn <= 10
""",
        "a6_significant_text": """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
fg AS (SELECT t.token FROM tok t JOIN documents d USING (doc_id)
       WHERE d.lang = 'de'),
fgc AS (SELECT token, count(*) AS fg_count FROM fg GROUP BY token),
bgc AS (SELECT token, count(*) AS bg_count FROM tok GROUP BY token),
tot AS (SELECT (SELECT count(*) FROM fg) AS ft,
               (SELECT count(*) FROM tok) AS bt),
j AS (
  SELECT fgc.token, fgc.fg_count, coalesce(bgc.bg_count, 0) AS bg_count,
         (fgc.fg_count / ft::DOUBLE
          - (coalesce(bgc.bg_count, 0) + 1.0) / (bt + 1.0))
         * (fgc.fg_count / ft::DOUBLE)
         / ((coalesce(bgc.bg_count, 0) + 1.0) / (bt + 1.0)) AS score
  FROM fgc LEFT JOIN bgc USING (token) CROSS JOIN tot
)
SELECT token, fg_count, bg_count, round(score, 6) AS score
FROM j WHERE score > 0 ORDER BY score DESC, token LIMIT 10
""",
        "dedup_simhash": """
WITH t AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split(text, ' '),
                                   x -> x != '')) AS toks
  FROM documents
),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
h AS (SELECT doc_id, md5_number_lower(term) AS hv FROM tok),
bits AS (
  SELECT doc_id, g.b AS bit,
         CASE WHEN (hv >> g.b) & 1 = 1 THEN 1 ELSE -1 END AS vote
  FROM h, LATERAL (SELECT unnest(range(64)) AS b) g
),
votes AS (SELECT doc_id, bit, sum(vote) AS v FROM bits GROUP BY 1, 2),
sim AS (
  SELECT doc_id,
         bit_or(CASE WHEN v > 0 THEN (1::UBIGINT << bit)
                ELSE 0::UBIGINT END) AS s
  FROM votes GROUP BY doc_id
)
SELECT d.doc_id, coalesce(sim.s, 0)::VARCHAR AS simhash
FROM documents d LEFT JOIN sim USING (doc_id)
""",
        "sim_lsh_ann": _lsh_ann_sql(n_planes=8, radius=3, k=10, seed=42,
                                    dim=64),
        "sim_ivf_ann": _ivf_ann_sql(n_centroids=16, n_probe=4, k=10),
        "sim_knn_join": """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
),
p AS (
  SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT p.probe_id, e.vec_id,
         list_dot_product(e.v, p.pv)
         / (sqrt(list_dot_product(e.v, e.v))
            * sqrt(list_dot_product(p.pv, p.pv))) AS c
  FROM e CROSS JOIN p
),
ranked AS (
  SELECT probe_id, vec_id, c,
         row_number() OVER (PARTITION BY probe_id
                            ORDER BY c DESC, vec_id) AS rn
  FROM scored
)
SELECT probe_id, vec_id, round(c, 6) AS cosine
FROM ranked WHERE rn <= 5
""",
        "dedup_embedding": _embedding_dedup_sql(threshold=0.4,
                                                n_planes=8, radius=2),
        "q24_highlight": f"""
WITH {_TOK_CTE.format(where='')},
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5))
              * tf.tf / (tf.tf + {K1} * (1 - {B} + {B} * tf.dl / stats.avgdl))
         ) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  WHERE tf.term IN ('stream', 'vector')
  GROUP BY tf.doc_id
  HAVING count(*) = 2
),
top AS (
  SELECT doc_id, round(score, 4) AS score FROM scores
  ORDER BY round(score, 4) DESC, doc_id LIMIT 5
)
SELECT t.doc_id, t.score,
       regexp_replace(d.text, '\\b(stream|vector)\\b', '<em>\\0</em>', 'g')
       AS fragment
FROM top t JOIN documents d USING (doc_id)
""",
        "q18_blocking": f"""
WITH {_minhash_band_cte(16, 16)}
SELECT DISTINCT b.doc_id
FROM bandtab b JOIN bandtab p
  ON p.doc_id = 0 AND b.band = p.band AND b.bh = p.bh
""",
        "q17_match_query": f"""
WITH {_minhash_band_cte(16, 16)},
cand AS (
  SELECT DISTINCT b.doc_id FROM bandtab b
  JOIN bandtab p ON p.doc_id = 0 AND b.band = p.band AND b.bh = p.bh
),
feats AS (
  SELECT d.doc_id, d.lang, trim(d.text) AS body,
         list_distinct(list_filter(string_split(d.text, ' '),
                                   x -> x != '')) AS toks,
         CASE WHEN len(string_split(d.text, ' ')) >= 3 THEN
           list_distinct(list_transform(
             range(1, len(string_split(d.text, ' ')) - 1),
             i -> array_to_string(string_split(d.text, ' ')[i:i+2], ' ')))
         ELSE []::VARCHAR[] END AS sh
  FROM documents d
),
pr AS (SELECT * FROM feats WHERE doc_id = 0),
j AS (
  SELECT f.doc_id,
         len(list_intersect(f.toks, pr.toks))::DOUBLE
           / greatest(len(f.toks) + len(pr.toks)
                      - len(list_intersect(f.toks, pr.toks)), 1) AS tj,
         len(list_intersect(f.sh, pr.sh))::DOUBLE
           / greatest(len(f.sh) + len(pr.sh)
                      - len(list_intersect(f.sh, pr.sh)), 1) AS sj,
         CASE WHEN sha256(f.body) = sha256(pr.body) THEN 5.0 ELSE 0.0 END
         + CASE WHEN f.lang = pr.lang THEN 0.8 ELSE 0.0 END AS base
  FROM feats f JOIN cand USING (doc_id) CROSS JOIN pr
)
SELECT doc_id,
       round(base + CASE WHEN sj >= 0.5 THEN 3.0 ELSE 0.0 END + tj, 6)
         AS match_score,
       round(tj, 6) AS tok_jaccard, round(sj, 6) AS shingle_jaccard
FROM j
ORDER BY match_score DESC, doc_id LIMIT 10
""",
    }
