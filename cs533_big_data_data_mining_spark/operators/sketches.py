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
    rows; candidates come from the distinct items joined against the
    BROADCAST sketch. (For streams, the same ``cms_build`` aggregate
    works incrementally: sketches add.)
    """
    c = F.col(col) if isinstance(col, str) else col
    total = df.count()
    thr = int(total * float(threshold_frac))
    sketch = cms_build(df, c, depth, width)
    items = df.select(c.alias("__item")).distinct()
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
