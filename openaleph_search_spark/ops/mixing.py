"""Training-data mixing: deterministic per-group sampling.

A 100-TB pre-training corpus is assembled as a MIXTURE — "keep 100% of
code, 50% of web, 80% of books". This operator applies per-group keep
fractions deterministically (hash-gated, no RNG), so reruns, resumed
jobs, and different partitionings all select the SAME rows, and the
decision is a pure Column expression evaluated inside the scan (no
shuffle, predicate runs pre-projection).

Determinism contract: a row is kept iff

    md5_low64_bigendian(key) < floor(fraction · 2^64)

where the hash is the BIG-endIAN value of hex chars 17..32 of
``md5(cast(key as string))`` — expressible identically in Spark
(``conv(substring(md5(x), 17, 16), 16, 10)``) and DuckDB
(``('0x' || substr(md5(x), 17, 16))::UBIGINT``), so an exact SQL
oracle exists. Thresholds are computed as exact Python ints and
inlined, avoiding float-rounding drift between engines.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sample_hash64(key_col) -> Column:
    """Uniform-in-[0, 2^64) deterministic hash of a key column (the
    big-endian md5-low-half; see module docstring)."""
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 17, 16),
        16, 10).cast("decimal(20,0)")


def mixture_thresholds(fractions: dict[str, float]) -> dict[str, int]:
    """fraction → exact integer threshold (inline the SAME ints in any
    SQL oracle; fractions ≥ 1 keep everything, ≤ 0 drop everything)."""
    out = {}
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0,1]: {f}")
        out[g] = int(f * (1 << 64))
    return out


def mixture_sample(df: DataFrame, fractions: dict[str, float],
                   group_col: str = "source",
                   key_col: str = "doc_id") -> DataFrame:
    """Keep each ``group_col`` value's rows at its ``fractions`` rate,
    gated on a deterministic hash of ``key_col``. Groups not listed
    are DROPPED (explicit mixture spec — silence is not 100%).
    ``key_col`` should be a stable unique id; sampling is then stable
    under reruns, appends, and repartitioning."""
    th = mixture_thresholds(fractions)
    u = sample_hash64(key_col)
    full = [g for g, t in th.items() if t >= (1 << 64)]
    partial = {g: t for g, t in th.items() if t < (1 << 64)}
    cond = F.col(group_col).isin(full) if full else F.lit(False)
    for g, t in sorted(partial.items()):
        cond = cond | ((F.col(group_col) == g)
                       & (u < F.lit(str(t)).cast("decimal(20,0)")))
    return df.filter(cond)



def temperature_fractions(df: DataFrame, group_col: str = "source",
                          alpha: float = 0.3,
                          budget: int | None = None) -> DataFrame:
    """Temperature / α-sampling rebalance (the mT5 / XLM-R /
    CCNet-style multilingual-mixing rule): target share per group
    q_g ∝ p_g^α where p_g is the group's corpus share. α=1 keeps the
    natural distribution, α→0 flattens toward uniform — low-resource
    groups are up-weighted. → one row per group:
    (group, n, p, q, fraction) where fraction = min(1, q·B/n) is the
    DOWNSAMPLING keep-rate against a ``budget`` B of output docs
    (default: the corpus size, so high-resource groups shrink and
    low-resource groups keep fraction 1.0; true up-sampling is a
    replication decision left to the caller — ``q·B/n`` is exposed
    unclamped as ``weight`` for it).

    Scale shape: one partial-aggregated groupBy over the corpus (the
    counts relation is #groups-sized), then pure window/Column math on
    that tiny relation. Feed the result straight into
    :func:`mixture_sample`::

        fr = {r["group"]: r["fraction"]
              for r in temperature_fractions(df, alpha=0.3).collect()}
        sampled = mixture_sample(df, fr)
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0: {alpha}")
    from pyspark.sql import Window
    w = Window.partitionBy()
    counts = (df.groupBy(F.col(group_col).cast("string").alias("group"))
              .agg(F.count("*").alias("n")))
    p = F.col("n") / F.sum("n").over(w)
    q = F.pow(p, F.lit(float(alpha)))
    q = q / F.sum(q).over(w)
    b = (F.lit(int(budget)) if budget is not None
         else F.sum("n").over(w))
    weight = q * b / F.col("n")
    return (counts.select(
        "group", "n",
        p.alias("p"),
        q.alias("q"),
        weight.alias("weight"),
        F.least(F.lit(1.0), weight).alias("fraction"))
        .orderBy("group"))


def replicate_by_weight(df: DataFrame, weights: dict[str, float],
                        group_col: str = "source",
                        key_col: str = "doc_id",
                        salt: str = "rep") -> DataFrame:
    """Deterministic weighted replication — the UP-sampling half of
    α-sampling (feed :func:`temperature_fractions`'s ``weight`` in):
    each row of group g is emitted ``floor(w_g)`` times plus one more
    iff its salted hash clears ``frac(w_g)`` (same exact-integer gate
    as :func:`mixture_sample`, so w<1 degrades to plain downsampling
    and the realized copy count is reproducible under reruns, appends,
    and any partitioning). → df + ``rep`` copy-index column; groups
    not listed are dropped (explicit spec).

    Scale shape: a pure Column gate plus a per-row
    ``explode(sequence())`` — row expansion happens inside the scan
    stage, no shuffle, no RNG."""
    full, thr = {}, {}
    for g, wt in weights.items():
        if wt < 0:
            raise ValueError(f"weight for {g!r} must be >= 0: {wt}")
        full[g] = int(wt)
        thr[g] = int((wt - int(wt)) * (1 << 64))
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                                      F.lit(salt))), 17, 16),
        16, 10).cast("decimal(20,0)")
    n = F.lit(None).cast("int")
    for g in sorted(weights):
        extra = (u < F.lit(str(thr[g])).cast("decimal(20,0)")
                 ).cast("int") if thr[g] else F.lit(0)
        n = F.when(F.col(group_col) == g,
                   F.lit(full[g]) + extra).otherwise(n)
    return (df.withColumn("_n", n)
            .filter(F.col("_n") > 0)
            .withColumn("rep", F.explode(
                F.sequence(F.lit(0), F.col("_n") - 1)))
            .drop("_n"))


def split_edges(weights: dict[str, float]) -> list[int]:
    """Exact integer band edges for :func:`with_split` (len-1 edges
    for len(weights) bands) — inline the SAME ints in any SQL
    oracle."""
    total = sum(weights.values())
    edges, acc = [], 0.0
    for name in list(weights)[:-1]:
        acc += weights[name] / total
        edges.append(min(int(acc * (1 << 64)), (1 << 64) - 1))
    return edges


def with_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id",
               salt: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: partition the hash
    line [0, 2^64) into contiguous bands, one per split, sized by
    ``weights`` (normalized; order = insertion order). → df +
    ``split`` column. The same contract as :func:`mixture_sample`:
    hash-gated, no RNG, stable under reruns / appends /
    repartitioning, and a pure Column expression in the scan.

    ``salt`` decouples this hash from any mixture_sample gate on the
    same key (salted key = ``key || ':' || salt``), so sampling and
    splitting stay independent events."""
    if not weights:
        raise ValueError("weights must be non-empty")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError(f"weights must be >= 0 with a > 0 sum: {weights}")
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.col(key_col).cast("string"),
                                      F.lit(salt))), 17, 16),
        16, 10).cast("decimal(20,0)")
    names = list(weights)
    edges = split_edges(weights)
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(u < F.lit(str(edge)).cast("decimal(20,0)"),
                      F.lit(name)).otherwise(expr)
    # nested whens evaluate smallest edge first → bands are
    # [0,e0) [e0,e1) ... [e_last, 2^64)
    return df.withColumn("split", expr)
