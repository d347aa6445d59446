"""Index mutation tests: tombstone deletes (S4/S5), compaction,
streaming append (incremental maintenance), spark-submit packaging."""
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from openaleph_search_spark.index.build import build_index
from openaleph_search_spark.index.mutate import (
    compact, delete_by_ids, delete_docs, read_tombstones)
from openaleph_search_spark.index.storage import IndexStorage
from openaleph_search_spark.query.engine import Engine


@pytest.fixture()
def mutable_index(spark, fixture_docs_df, tmp_path):
    out = str(tmp_path / "idx_mut")
    build_index(spark, fixture_docs_df, out, num_partitions=4, num_shards=2)
    return out


def test_delete_by_query_tombstones(spark, mutable_index):
    eng = Engine(spark, mutable_index)
    assert eng.count({"q": "banana"}) == 2
    st = IndexStorage(mutable_index)
    n = delete_docs(spark, st, F.col("lang") == "go")
    assert n == 1  # crime.go is the only go doc
    eng2 = Engine(spark, mutable_index)  # fresh engine sees tombstones
    assert eng2.count({"q": "banana"}) == 1
    res = eng2.search({"q": "banana", "limit": 10})
    assert all(r["lang"] != "go" for r in res.hit_rows(0, 10))
    # match_all excludes them too
    assert eng2.search({"limit": 100}, with_total=True).total == 9


def test_delete_idempotent(spark, mutable_index):
    st = IndexStorage(mutable_index)
    n1 = delete_by_ids(spark, st, [0])
    n2 = delete_by_ids(spark, st, [0])
    assert n1 == 1 and n2 == 0


def test_compact_folds_tombstones(spark, mutable_index, fixture_docs_df):
    st = IndexStorage(mutable_index)
    delete_docs(spark, st, F.col("lang") == "txt")
    compact(spark, st)
    assert read_tombstones(spark, st) is None
    eng = Engine(spark, mutable_index)
    assert eng.search({"limit": 100}, with_total=True).total == \
        fixture_docs_df.filter("lang != 'txt'").count()
    # postings physically gone + stats refreshed
    meta = st.read_meta()
    assert meta["n_docs"] == 5
    # scores against a fresh oracle over the surviving docs
    assert eng.count({"q": "banana"}) == 1  # only crime.go survives


def test_streaming_append(spark, fixture_docs_df, tmp_path):
    from openaleph_search_spark.streaming.incremental import append_batch
    out = str(tmp_path / "idx_stream")
    first = fixture_docs_df.filter(F.col("repo") != "r3")
    build_index(spark, first, out, num_partitions=4, num_shards=2)
    eng = Engine(spark, out)
    n0 = eng.search({"limit": 100}, with_total=True).total
    # append the remaining docs as a micro-batch
    batch = fixture_docs_df.filter(F.col("repo") == "r3")
    append_batch(spark, batch, out, epoch_id=0)
    eng2 = Engine(spark, out)
    assert eng2.search({"limit": 100}, with_total=True).total == \
        n0 + batch.count()
    # newly appended content is searchable with correct global stats
    res = eng2.search({"q": "kwazulu", "limit": 10})
    paths = {r["path"] for r in res.hit_rows(0, 10)}
    assert "c/long.rs" in paths and "a/kwazulu.txt" in paths
    meta = IndexStorage(out).read_meta()
    assert meta["n_docs"] == n0 + batch.count()


def test_streaming_query_e2e(spark, fixture_docs_df, tmp_path):
    """readStream → foreachBatch append sink → searchable index."""
    from openaleph_search_spark.streaming.incremental import stream_index
    src_dir = str(tmp_path / "stream_src")
    out = str(tmp_path / "idx_stream2")
    build_index(spark, fixture_docs_df.limit(2), out,
                num_partitions=2, num_shards=2)
    batch = fixture_docs_df.filter(F.col("path") == "b/manafort.js")
    batch.write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema(batch.schema).parquet(src_dir))
    q = stream_index(spark, stream, out,
                     checkpoint_dir=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    eng = Engine(spark, out)
    res = eng.search({"q": "manafort", "limit": 10})
    assert [r["path"] for r in res.hit_rows(0, 10)] == ["b/manafort.js"]


def test_spark_submit_packaging(tmp_path):
    """north_rule: runs via spark-submit --py-files <zip>."""
    sys.path.insert(0, "/root/repo/scripts")
    from package import build_zip
    z = build_zip(str(tmp_path / "pkg.zip"))
    assert os.path.exists(z)
    env = {**os.environ, "PYTHONPATH": z}
    out = subprocess.run(
        [sys.executable, "/root/repo/openaleph_search_spark/cli.py",
         "analyze", "Félix café"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path))
    assert out.returncode == 0, out.stderr
    assert '["felix", 0]' in out.stdout
