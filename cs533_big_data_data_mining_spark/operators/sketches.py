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

import numpy as np
import pandas as pd
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


def cms_save(spark, sketch: DataFrame, path: str, depth: int, width: int) -> None:
    """Persist a CMS frame + its probe parameters to Parquet — the
    cross-run/mergeable artifact (load two days' sketches and SUM the
    ``c`` columns on (d, bucket): CMS merge is cellwise addition).
    Meta travels as a ``d = -1`` row (``bucket`` = depth,
    ``c`` = width) so the load can't probe with mismatched params."""
    meta = spark.createDataFrame([(-1, int(depth), int(width))], "d int, bucket long, c long")
    sketch.select(
        F.col("d").cast("int"), F.col("bucket").cast("long"), F.col("c").cast("long")
    ).unionByName(meta).write.mode("overwrite").parquet(path)


def cms_load(spark, path: str) -> tuple[DataFrame, int, int]:
    """Inverse of :meth:`cms_save` — returns ``(sketch, depth,
    width)`` ready for :func:`cms_estimates` with bit-compatible
    probes."""
    raw = spark.read.parquet(path)
    meta = raw.filter(F.col("d") == -1).head()
    return (
        raw.filter(F.col("d") >= 0),
        int(meta["bucket"]),
        int(meta["c"]),
    )


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


class BloomFilter:
    """Driver-held Bloom filter built DISTRIBUTEDLY (the bit array is
    a word-indexed ``bit_or`` aggregate — never a driver-side loop
    over items) with JVM-side hashing (``xxhash64(seed_i, value)``),
    so probe positions computed as Columns are bit-compatible with
    the build. No false negatives; false-positive rate ~``fpp``.

    Scale sweet spot: a membership set too big to broadcast as a hash
    set but small as bits (10^9 items: ~100 GB hash set vs ~1.5 GB
    Bloom at 1% fpp). The words array ships to executors inside the
    probe UDF's closure (one copy per worker, Arrow-batched checks).
    """

    def __init__(self, words, m: int, k: int):
        self.words, self.m, self.k = words, int(m), int(k)

    def positions(self, c: str | Column) -> Column:
        """``array<long>`` of the k bit positions for a value —
        evaluated JVM-side, identical to the build's hashing."""
        col = F.col(c) if isinstance(c, str) else c
        return F.array(*[F.pmod(F.xxhash64(F.lit(i), col), F.lit(self.m)) for i in range(self.k)])

    def might_contain(self, c: str | Column) -> Column:
        """Boolean probe Column: True for every member (guaranteed),
        True for ~fpp of non-members."""
        words = self.words.view(np.uint64)

        @F.pandas_udf("boolean")
        def _probe(pos: pd.Series) -> pd.Series:
            if len(pos) == 0:
                return pd.Series([], dtype=bool)
            p = np.array(list(pos), dtype=np.int64)  # (n, k)
            hit = (words[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)
            return pd.Series(hit.all(axis=1))

        return _probe(self.positions(c))

    def might_contain_any(self, arr: str | Column) -> Column:
        """Boolean probe over an ``array<string>`` column: True when
        ANY element might be a member (guaranteed True if one is; True
        for ~fpp·|arr| of all-non-member rows). Stateless — usable in
        a streaming filter where explode+join+re-aggregate would need
        state. Positions for every element are computed JVM-side
        (same hashing as the build); one Arrow batch checks a doc's
        whole shingle set at once."""
        col = F.col(arr) if isinstance(arr, str) else arr
        pos2 = F.transform(col, lambda s: self.positions(s))
        words = self.words.view(np.uint64)

        @F.pandas_udf("boolean")
        def _probe_any(pos: pd.Series) -> pd.Series:
            out = []
            for row in pos:
                if row is None or len(row) == 0:
                    out.append(False)
                    continue
                p = np.array([list(x) for x in row], dtype=np.int64)  # (s, k)
                hit = (words[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)
                out.append(bool(hit.all(axis=1).any()))
            return pd.Series(out)

        return _probe_any(pos2)

    def save(self, spark, path: str) -> None:
        """Persist to Parquet — the 'build the benchmark filter once,
        probe it from every ingest run' artifact. Layout: one row per
        64-bit word (``w`` index, ``bits``) plus meta rows ``w=-1 ->
        m`` and ``w=-2 -> k`` (kept as separate rows — a packed
        ``m*2^32+k`` encoding would overflow int64 exactly at the
        multi-gigabit filter sizes this API exists for); m/64 rows
        total, so a daily pipeline reloads it in milliseconds instead
        of re-scanning 10^9 benchmark n-grams."""
        rows = [(-1, int(self.m)), (-2, int(self.k))] + [
            (i, int(w)) for i, w in enumerate(np.asarray(self.words, dtype=np.int64))
        ]
        spark.createDataFrame(rows, "w long, bits long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "BloomFilter":
        """Inverse of :meth:`save` — hashing parameters restored, so
        probes are bit-compatible with the original build."""
        rows = spark.read.parquet(path).collect()
        m = next(int(r["bits"]) for r in rows if r["w"] == -1)
        k = next(int(r["bits"]) for r in rows if r["w"] == -2)
        arr = np.zeros(m // 64, dtype=np.int64)
        for r in rows:
            if r["w"] >= 0:
                arr[int(r["w"])] = int(r["bits"])
        return cls(arr, m, k)


def _bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    import math

    m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / max(n_items, 1) * math.log(2)))
    return m, k


def bloom_build(
    df: DataFrame, col: str | Column, n_items: int | None = None, fpp: float = 0.01
) -> BloomFilter:
    """Build a :class:`BloomFilter` over a column. One explode to the
    k bit positions, one map-side-combinable ``bit_or`` aggregate
    keyed by 64-bit word index (at most m/64 reduce rows), collected
    into a numpy word array — the build never funnels item VALUES to
    the driver, only set bits."""
    import numpy as np

    c = F.col(col) if isinstance(col, str) else col
    n = n_items if n_items is not None else df.count()
    m, k = _bloom_params(max(int(n), 1), float(fpp))
    proto = BloomFilter(np.zeros(m // 64, dtype=np.int64), m, k)
    words = (
        df.select(F.explode(proto.positions(c)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            # pyspark's shiftleft() only takes a literal shift count;
            # the SQL form accepts a column
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    arr = np.zeros(m // 64, dtype=np.int64)
    for r in words:
        arr[int(r["w"])] = r["bits"]
    return BloomFilter(arr, m, k)


def _local_heavy_candidates(df: DataFrame, c: Column, thr: int, total: int) -> DataFrame:
    """Distinct ``__item`` values whose LOCAL count ``k`` in some
    partition of ``n`` rows satisfies ``k * total >= thr * n`` — a
    guaranteed superset of every item with global count >= ``thr``
    (weighted-average argument: ``sum k_p = c >= thr`` over
    ``sum n_p = total`` forces ``k_p/n_p >= thr/total`` somewhere),
    emitting at most ``total/thr`` items per partition with zero
    full-cardinality shuffle. The comparison cross-multiplies in
    Python ints — exact at any magnitude, so the truncated global
    threshold (``int(total*frac)``) can't slip through a float
    boundary. Arrow-batched counting; the iterator spans the whole
    partition, so the local counts are exact per partition."""
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
            keep = [v for v, k in counts.items() if k * total >= thr * n]
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
    cardinality the sketch exists to avoid): an item with global count
    >= thr must have local count ``k`` with ``k*total >= thr*n`` in at
    least one partition (weighted-average argument, cross-multiplied
    in exact integers so the truncated ``thr = int(total*frac)``
    boundary can't slip through float rounding) — at most
    ``total/thr`` candidates per partition, no shuffle, no dependence
    on the partition count — and only that tiny candidate set meets
    the broadcast sketch. (For streams, the same ``cms_build``
    aggregate works incrementally: sketches add.)
    """
    c = F.col(col) if isinstance(col, str) else col
    total = df.count()
    thr = int(total * float(threshold_frac))
    sketch = cms_build(df, c, depth, width)
    items = _local_heavy_candidates(df, c, thr, total)
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
