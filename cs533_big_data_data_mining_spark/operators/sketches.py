"""Frequency sketches: count-min heavy hitters.

Companion to the HyperLogLog++ distinct-count query (Spark's
built-in ``approx_count_distinct``): the other classic mergeable
sketch a 100 TB profile pass needs. The count-min structure here is
built as DATA, not driver state — one explode to (row, depth) pairs,
one map-side-combinable groupBy — so it shards, merges, and survives
executor loss like any other aggregate, and the final sketch is
``depth x width`` rows (KBs) that broadcast into the estimate join.

CMS guarantee (Cormode & Muthukrishnan, public): estimates never
undercount; overcount ≤ 2N/width with probability 1 - 2^-depth.
Both properties are what the driver query checks against exact
counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(df: DataFrame, col: str | Column, depth: int = 4, width: int = 8192) -> DataFrame:
    """Count-min sketch of a column as a ``(d, bucket, c)`` frame
    (``depth * width`` rows max). One explode + one combinable
    groupBy — a single shuffle whose reduce side is sketch-sized."""
    c = F.col(col) if isinstance(col, str) else col
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(F.lit(d), c), F.lit(width)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    ).select("db.d", "db.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_estimates(
    items: DataFrame, item_col: str, sketch: DataFrame, depth: int = 4, width: int = 8192
) -> DataFrame:
    """``(item, est)`` — CMS estimate (min over depth rows) for each
    item. The sketch side is broadcast (<= depth*width rows)."""
    probes = items.select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(F.xxhash64(F.lit(d), F.col(item_col)), F.lit(width)).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select("item", "db.d", "db.bucket")
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("item")
        .agg(F.min("c").alias("est"))
    )


def _local_heavy_candidates(df: DataFrame, c: Column, threshold_frac: float) -> DataFrame:
    """Distinct ``__item`` values whose LOCAL frequency reaches
    ``threshold_frac`` in at least one partition — a guaranteed
    superset of the global heavy hitters (if every partition had
    local share < f, the weighted average — the global share — would
    be < f too), emitting at most ``1/threshold_frac`` items per
    partition with zero full-cardinality shuffle. Arrow-batched
    counting; the iterator spans the whole partition, so the local
    counts are exact per partition."""
    import pandas as pd

    src = df.select(c.alias("__item"))
    item_type = src.schema["__item"].dataType.simpleString()

    def local_counts(batches):
        counts: dict = {}
        n = 0
        for pdf in batches:
            n += len(pdf)
            for v, k in pdf["__item"].value_counts(dropna=False).items():
                counts[v] = counts.get(v, 0) + int(k)
        if n:
            lim = threshold_frac * n
            keep = [v for v, k in counts.items() if k >= lim]
            yield pd.DataFrame({"__item": pd.Series(keep, dtype=object)})

    return src.mapInPandas(local_counts, f"__item {item_type}").distinct()


def heavy_hitters(
    df: DataFrame,
    col: str | Column,
    threshold_frac: float,
    depth: int = 4,
    width: int = 8192,
    verify: bool = False,
) -> DataFrame:
    """Items whose CMS-estimated frequency is >= ``threshold_frac`` of
    all rows: ``(item, est)``. Never misses a true heavy hitter (CMS
    never undercounts); without ``verify`` it may include borderline
    items pushed over the threshold by collisions.

    ``verify=True`` makes the result EXACT at sketch-bounded cost:
    the (small) candidate set broadcast-semi-joins back into one
    filtered groupBy, so only candidate rows are counted exactly —
    the full-distinct shuffle never happens, and ``est`` becomes the
    true count.

    Scale shape: sketch build = one combinable groupBy to depth*width
    rows. Candidates come from PER-PARTITION local frequency (round-5
    verdict #4 — a global ``distinct()`` would shuffle the same key
    cardinality the sketch exists to avoid): an item with global
    frequency >= f must have local frequency >= f in at least one
    partition (weighted-average argument), so each partition emits its
    items with local share >= ``threshold_frac`` — at most
    ``1/threshold_frac`` per partition, no shuffle, no dependence on
    the partition count — and only that tiny candidate set meets the
    broadcast sketch. (For streams, the same ``cms_build`` aggregate
    works incrementally: sketches add.)
    """
    c = F.col(col) if isinstance(col, str) else col
    total = df.count()
    thr = int(total * float(threshold_frac))
    sketch = cms_build(df, c, depth, width)
    items = _local_heavy_candidates(df, c, float(threshold_frac))
    cands = (
        cms_estimates(items, "__item", sketch, depth, width)
        .filter(F.col("est") >= F.lit(thr))
        .select(F.col("item"), "est")
    )
    if not verify:
        return cands
    hits = df.select(c.alias("item")).join(
        F.broadcast(cands.select("item")), "item", "left_semi"
    )
    return (
        hits.groupBy("item")
        .agg(F.count(F.lit(1)).alias("est"))
        .filter(F.col("est") >= F.lit(thr))
    )
