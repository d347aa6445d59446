"""Multi-version index reads — the reference's alias semantics
(/root/reference/openaleph_search/index/indexes.py:76-97: queries run
over the ``index_read`` version LIST while writes pin ``index_write``).

Scenario mirrors a zero-downtime reindex mid-cutover: v1 is the old
full index; v2 is the new build where one doc changed content, one doc
was dropped, and one doc is new. Reads over [v1, v2] must serve the
changed doc from v2 (newest wins), still serve the dropped doc from v1
(ES parity: not-yet-deleted old copy), and surface the new doc.
"""
from __future__ import annotations

import pytest

from tests.conftest import FIXTURE_DOCS

SCHEMA = ("repo string, path string, commit string, "
          "lang string, content string")


@pytest.fixture(scope="module")
def vroot(spark, fixture_docs_df, tmp_path_factory):
    from openaleph_search_spark.index.build import build_index
    from openaleph_search_spark.index.versions import IndexVersions
    root = str(tmp_path_factory.mktemp("idx_versions"))
    cat = IndexVersions(spark, root)
    # v1: the stock fixture corpus
    build_index(spark, fixture_docs_df, cat.path("v1"),
                num_partitions=4, num_shards=2)
    # v2: banana.txt rewritten (same logical key), crime.go dropped,
    # one brand-new doc added
    docs2 = [d for d in FIXTURE_DOCS if d[1] != "b/crime.go"]
    docs2 = [("r1", "a/banana.txt", "c1", "txt",
              "Banana split dessert only")
             if d[1] == "a/banana.txt" else d for d in docs2]
    docs2.append(("r4", "d/new.txt", "c9", "txt",
                  "a brand new banana document"))
    build_index(spark, spark.createDataFrame(docs2, SCHEMA),
                cat.path("v2"), num_partitions=4, num_shards=2)
    return root


def test_catalog_and_default_alias(spark, vroot):
    from openaleph_search_spark.index.versions import IndexVersions
    cat = IndexVersions(spark, vroot)
    assert cat.versions() == ["v1", "v2"]
    # no alias file yet → newest version serves both roles
    assert cat.alias() == {"read": ["v2"], "write": "v2"}
    cat.set_alias(read=["v1", "v2"], write="v2")
    assert cat.alias() == {"read": ["v1", "v2"], "write": "v2"}
    assert cat.write_storage().root.endswith("/v2")
    with pytest.raises(ValueError):
        cat.set_alias(read=["../evil"], write="v2")


def test_single_version_read_passthrough(spark, vroot):
    from openaleph_search_spark.index.versions import IndexVersions
    from openaleph_search_spark.query.engine import Engine
    cat = IndexVersions(spark, vroot)
    cat.set_alias(read=["v1"], write="v2")
    direct = Engine(spark, cat.path("v1")).search({"q": "banana"})
    via = cat.search({"q": "banana"})
    d = [(r["path"], round(r["score"], 9)) for r in direct.hit_rows()]
    v = [(r["path"], round(r["score"], 9)) for r in via.hit_rows()]
    assert d == v


def test_union_read_newest_wins(spark, vroot):
    from openaleph_search_spark.index.versions import IndexVersions
    cat = IndexVersions(spark, vroot)
    cat.set_alias(read=["v1", "v2"], write="v2")
    rows = cat.search({"q": "banana", "limit": 20}).hit_rows()
    by_path = {}
    for r in rows:
        assert r["path"] not in by_path, "logical doc surfaced twice"
        by_path[r["path"]] = r
    # dropped-in-v2 doc still served from v1
    assert "b/crime.go" in by_path
    # brand-new v2 doc surfaces
    assert "d/new.txt" in by_path
    # changed doc served from v2: its new text is 4 tokens long
    assert by_path["a/banana.txt"]["doc_len"] == 4
    # scores sorted desc
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_union_read_old_only_match(spark, vroot):
    """'fruit stand' only exists in v1's banana.txt; newest-wins must
    NOT hide the v1 copy behind a non-matching v2 copy — per-version
    evaluation serves it (ES parity), but the doc surfaces from the
    newest version IT MATCHED in."""
    from openaleph_search_spark.index.versions import IndexVersions
    cat = IndexVersions(spark, vroot)
    cat.set_alias(read=["v1", "v2"], write="v2")
    rows = cat.search({"q": '"fruit stand"'}).hit_rows()
    assert [r["path"] for r in rows] == ["a/banana.txt"]
    assert rows[0]["doc_len"] != 4  # the v1 (old, matching) payload


def test_union_count_and_facets(spark, vroot):
    from openaleph_search_spark.index.versions import IndexVersions
    cat = IndexVersions(spark, vroot)
    cat.set_alias(read=["v1", "v2"], write="v2")
    rows = cat.search({"q": "banana", "limit": 50}).hit_rows(limit=50)
    assert cat.count({"q": "banana"}) == len(rows)
    res = cat.search({"q": "banana", "facet": "repo", "limit": 50})
    fac = {r["value"]: r["count"]
           for r in res.facets["repo"].collect()}
    # facet buckets sum across versions; a doc present in both
    # versions counts once per version (transitional double count —
    # documented ES-faithful behavior): banana.txt matches in v1 AND
    # v2 → r1:2; crime.go only in v1 → r2:1; new.txt only in v2 → r4:1
    assert fac == {"r1": 2, "r2": 1, "r4": 1}
