"""Multi-version index reads — the reference's alias semantics.

The reference reads over a LIST of index versions while writing one:
``entities_index_list`` unions ``settings.index_read`` versions into
the query target while ``entities_write_index`` pins
``settings.index_write`` (/root/reference/openaleph_search/index/
indexes.py:76-97; physical name = prefix-name-version, index/
util.py:12-13). That is ES's zero-downtime reindex idiom: build vNEW
while queries keep hitting vOLD (or both), then flip the alias.

Spark re-expression — a version catalog directory::

    <root>/
      alias.json    {"read": ["v1", "v2"], "write": "v2"}
      v1/           full IndexStorage layout
      v2/           full IndexStorage layout

Read semantics over several versions = ES msearch over the comma-
joined index list, made deterministic:

* each version scores with ITS OWN statistics (df/cf/avgdl), exactly
  like ES scores each physical index with per-index idf — scores are
  NOT recomputed over the union;
* per-version top-k hit lists merge coordinator-style (each version
  returns its k best, the union is re-ranked by score), and a doc
  HIT in several read versions surfaces only from the version LATEST
  in the read list (newest wins — the reference would transiently
  return both copies from the unioned ES indexes; this makes that
  precise). Identity across versions is the logical document key
  (repo, path, commit) — the key ``upsert_docs`` dedups on — because
  ``doc_id`` is assigned per build and is not stable across rebuilds.
  A doc that matches only in an older version is still served from
  it (exact ES parity: each physical index evaluates the query on
  its own copy);
* tombstones shadow only within their version (ES parity: a doc not
  yet reindexed into vNEW is still served from vOLD, and a doc
  deleted only in vNEW is likewise still served from vOLD — the
  reference deletes from old versions after cutover, same as here);
* facet counts merge by summing per-version buckets (ES-faithful:
  during a transitional double-listing a doc in both versions counts
  twice, exactly as the reference's unioned ES indexes would).

At 100 TB on a lakehouse the same idiom maps onto Iceberg: a version
== a snapshot of the postings/doc_meta tables, the alias flip == the
table's current-snapshot pointer, and time-travel (``VERSION AS OF``)
subsumes the read list (SURVEY §1.1). This module is the engine-level
equivalent for the plain-parquet layout shipped here.
"""
from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..query.engine import Engine, SearchResult
from ..query.parser import SearchArgs, parse_args
from .fsio import FsIO
from .storage import IndexStorage

ALIAS_FILE = "alias.json"


class IndexVersions:
    """Catalog of index versions under one root with an alias file."""

    def __init__(self, spark: SparkSession, root: str, **engine_kwargs):
        self.spark = spark
        self.root = root.rstrip("/")
        self.io = FsIO(self.root)
        self.engine_kwargs = engine_kwargs
        self._engines: dict[str, Engine] = {}

    # -- catalog ------------------------------------------------------------
    def path(self, version: str) -> str:
        return os.path.join(self.root, version)

    def storage(self, version: str) -> IndexStorage:
        return IndexStorage(self.path(version))

    def versions(self) -> list[str]:
        """Built versions (dirs holding a meta.json), name-sorted."""
        try:
            names = self.io.listdir(self.root)
        except FileNotFoundError:
            return []
        return sorted(n for n in names
                      if self.storage(n).exists())

    # -- alias --------------------------------------------------------------
    def alias(self) -> dict:
        """{"read": [...oldest→newest...], "write": v}. Defaults to
        the newest built version for both when no alias file exists."""
        p = os.path.join(self.root, ALIAS_FILE)
        if self.io.exists(p):
            return json.loads(self.io.read_bytes(p))
        built = self.versions()
        if not built:
            raise FileNotFoundError(
                f"no alias.json and no built versions under {self.root}")
        return {"read": [built[-1]], "write": built[-1]}

    def set_alias(self, read: list[str], write: str) -> None:
        for v in [*read, write]:
            if "/" in v or v.startswith("."):
                raise ValueError(f"bad version name: {v!r}")
        self.io.mkdirs(self.root)
        self.io.write_bytes_atomic(
            os.path.join(self.root, ALIAS_FILE),
            json.dumps({"read": list(read), "write": write},
                       indent=2).encode())
        self._engines.clear()

    def write_storage(self) -> IndexStorage:
        """IndexStorage for the alias's write version (build target)."""
        return self.storage(self.alias()["write"])

    # -- read ----------------------------------------------------------------
    def engine(self, version: str) -> Engine:
        if version not in self._engines:
            self._engines[version] = Engine(
                self.spark, self.path(version), **self.engine_kwargs)
        return self._engines[version]

    DOC_KEY = ("repo", "path", "commit")

    def _doc_key(self, hits: DataFrame) -> list[str]:
        """Cross-version identity columns present in the hit payload
        (falls back to doc_id for dehydrated projections that strip
        the key — then dedup is per-version-exact only, documented)."""
        key = [c for c in self.DOC_KEY if c in hits.columns]
        return key or ["doc_id"]

    def search(self, args, auth=None) -> SearchResult:
        """Query the union of the alias's read versions (newest wins
        per logical doc; per-version scoring — see module docstring)."""
        sa = args if isinstance(args, SearchArgs) else parse_args(args)
        read = self.alias()["read"]
        if len(read) == 1:
            return self.engine(read[0]).search(sa, auth=auth)
        parts, facet_parts = [], {}
        for prio, v in enumerate(read):
            res = self.engine(v).search(sa, auth=auth)
            parts.append(res.hits.withColumn("_v", F.lit(prio)))
            for fname, fdf in res.facets.items():
                facet_parts.setdefault(fname, []).append(fdf)
        allhits = reduce(DataFrame.unionByName, parts)
        w = Window.partitionBy(*self._doc_key(allhits)).orderBy(
            F.desc("_v"))
        hits = (allhits
                .withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") == 1).drop("_rk", "_v")
                .orderBy(F.desc("score"), F.asc("doc_id")))
        facets = {
            f: (reduce(DataFrame.unionByName, dfs)
                .groupBy("value").agg(F.sum("count").alias("count"))
                .orderBy(F.desc("count"), F.asc("value")))
            for f, dfs in facet_parts.items()}
        return SearchResult(hits=hits.limit(sa.k), facets=facets)

    def count(self, args, auth=None) -> int:
        """Union count with newest-wins logical-doc dedup."""
        sa = args if isinstance(args, SearchArgs) else parse_args(args)
        read = self.alias()["read"]
        if len(read) == 1:
            return self.engine(read[0]).count(args, auth=auth)
        # UNCAPPED matched set per version via export() — search() would
        # clamp k to MAX_PAGE (9999) and silently undercount any
        # version with more matches than one page
        parts = [self.engine(v).export(sa, auth=auth) for v in read]
        key = self._doc_key(parts[0])
        ids = [p.select(*key) for p in parts]
        return reduce(DataFrame.unionByName, ids).distinct().count()
