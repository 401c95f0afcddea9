"""Epsilon-neighborhood kernels (SURVEY §2 ops 7-9).

The reference builds per-rank kd-trees (``kdtree2.cpp:72-297``) and
runs fixed-radius queries (``r_nearest_around_point``,
``kdtree2.cpp:344-401``) in a per-point hot loop
(``dbscan.cpp:718-792``). In Spark the spatial index is an execution
detail of one ``applyInPandas`` stage: each grid cell arrives as a
pandas DataFrame (home + ghost rows), and a vectorized NumPy kernel
does the neighbor math. No scipy in this container, so the kernel is
blockwise exact distance accumulation — O(n_home * n) per cell with
bounded memory, fully vectorized, float64.

Exactness contract: squared distance is accumulated per dimension in
ascending order, in float64 — bit-identical to the DuckDB oracle's
``(a.x0-b.x0)^2 + (a.x1-b.x1)^2 + ...`` left-to-right sum, so the
``<= eps^2`` boundary predicate agrees exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Memory budget per distance block: rows_per_block * n * 8 bytes <= ~128 MB
_BLOCK_BYTES = 128 * 1024 * 1024


def _block_rows(n: int) -> int:
    return max(16, min(4096, _BLOCK_BYTES // max(1, 8 * n)))


def _dist2_block(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact squared distances, per-dim accumulation (dim-ascending,
    float64) — matches SQL left-to-right sum bit-for-bit. The
    (a^2 + b^2 - 2ab) BLAS trick is deliberately NOT used: its
    rounding can flip points sitting exactly on the eps boundary."""
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for j in range(a.shape[1]):
        d = a[:, j : j + 1] - b[None, :, j]
        out += d * d
    return out


def _cell_matrix(pdf: pd.DataFrame) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["xs"]], dtype=np.float64)


def neighbor_counts(celled: DataFrame, eps: float) -> DataFrame:
    """Per-point eps-neighborhood size, self inclusive (ops 7+8 and the
    count half of op 9). Input: ghost-expanded frame
    ``(cell, id, xs, is_home)``; output ``(id, n_neighbors)``.

    Each home point's full neighborhood is present in its home cell
    (ghost closure), so counts are complete with zero cross-cell
    communication — the same "embarrassingly parallel local phase"
    profile as the reference (SURVEY §4).
    """
    eps2 = float(eps) * float(eps)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("n_neighbors", T.LongType())]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = _cell_matrix(pdf)
        home = pdf["is_home"].to_numpy(dtype=bool)
        hx = x[home]
        counts = np.empty(hx.shape[0], dtype=np.int64)
        step = _block_rows(x.shape[0])
        for lo in range(0, hx.shape[0], step):
            d2 = _dist2_block(hx[lo : lo + step], x)
            counts[lo : lo + step] = (d2 <= eps2).sum(axis=1)
        return pd.DataFrame({"id": pdf["id"].to_numpy()[home], "n_neighbors": counts})

    return celled.groupBy("cell").applyInPandas(kernel, schema=schema)


def epsilon_self_join(celled: DataFrame, eps: float) -> DataFrame:
    """Distance self-join (the reference's one non-trivial relational
    op, SURVEY §2 ops 6+8): all pairs ``(a, b)`` with
    ``dist(a,b) <= eps``, both directions, self included.

    Pair de-dup is positional, not a distinct: a pair is emitted only
    from the left point's home cell, and ghost closure is symmetric,
    so each ordered pair appears exactly once globally.
    """
    eps2 = float(eps) * float(eps)
    schema = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.LongType())])

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = _cell_matrix(pdf)
        ids = pdf["id"].to_numpy()
        home = pdf["is_home"].to_numpy(dtype=bool)
        hx, hid = x[home], ids[home]
        out_a, out_b = [], []
        step = _block_rows(x.shape[0])
        for lo in range(0, hx.shape[0], step):
            d2 = _dist2_block(hx[lo : lo + step], x)
            ai, bi = np.nonzero(d2 <= eps2)
            out_a.append(hid[lo : lo + step][ai])
            out_b.append(ids[bi])
        return pd.DataFrame(
            {"a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
             "b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)}
        )

    return celled.groupBy("cell").applyInPandas(kernel, schema=schema)


def brute_force_neighbor_counts(points: DataFrame, eps: float, dims: int) -> DataFrame:
    """Oracle-shaped O(N^2) fallback: declarative crossJoin + filter.

    Only for tiny-N verification (FIXTURES.md §2) — the cell kernel is
    the scale path. Kept declarative so Catalyst's plan is visible.
    """
    eps2 = float(eps) * float(eps)
    a, b = points.alias("a"), points.alias("b")
    d2 = sum(
        (F.col("a.xs")[j] - F.col("b.xs")[j]) * (F.col("a.xs")[j] - F.col("b.xs")[j])
        for j in range(dims)
    )
    return (
        a.crossJoin(b)
        .filter(d2 <= F.lit(eps2))
        .groupBy(F.col("a.id").alias("id"))
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )


def _pack_blocks(points: DataFrame, n: int, block_rows: int, extra: list[str] | None = None):
    """Hash-pack a point frame into ~``n/block_rows`` single-row
    blocks and join the unordered block pairs (i <= j). Each output
    row carries two whole blocks — task memory is bounded by
    2*block_rows regardless of N, and the m(m+1)/2 pairs are the unit
    of parallelism."""
    import math

    m = max(1, math.ceil(n / block_rows))
    cols = ["id", "xs"] + (extra or [])
    aggs = [F.collect_list(c).alias(f"{c}s_") for c in cols]
    packed = (
        points.withColumn("blk", F.pmod(F.xxhash64("id"), F.lit(m)).cast("int"))
        .groupBy("blk")
        .agg(*aggs)
    )
    right = packed.select(
        F.col("blk").alias("yblk"), *[F.col(f"{c}s_").alias(f"y{c}s_") for c in cols]
    )
    pairs = packed.join(right, F.col("blk") <= F.col("yblk"))
    return pairs.repartition(max(m * (m + 1) // 2, 1)), m


def block_neighbor_counts(points: DataFrame, eps: float, block_rows: int = 2048) -> DataFrame:
    """``(id, n_neighbors)`` via block nested-loop — the fallback for
    data the grid cannot partition (high-dimensional or ultra-dense:
    SURVEY §7 Phase D(i)/(ii)). The O(N^2) distance work is exact and
    unavoidable; this spreads it over m(m+1)/2 block-pair tasks
    instead of one degenerate cell, then sums per-point partials with
    one map-side-combinable groupBy."""
    eps2 = float(eps) * float(eps)
    n = points.count()
    pairs, _m = _pack_blocks(points.select("id", "xs"), n, block_rows)

    def kernel(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                xi = np.asarray(list(row.ids_), dtype=np.int64)
                X = np.asarray([np.asarray(v) for v in row.xss_], dtype=np.float64)
                yi = np.asarray(list(row.yids_), dtype=np.int64)
                Y = np.asarray([np.asarray(v) for v in row.yxss_], dtype=np.float64)
                same = row.blk == row.yblk
                out_id, out_c = [], []
                step = _block_rows(Y.shape[0])
                cx = np.zeros(X.shape[0], dtype=np.int64)
                cy = np.zeros(Y.shape[0], dtype=np.int64)
                for lo in range(0, X.shape[0], step):
                    hit = _dist2_block(X[lo : lo + step], Y) <= eps2
                    cx[lo : lo + step] = hit.sum(axis=1)
                    if not same:
                        cy += hit.sum(axis=0)
                out_id.append(xi)
                out_c.append(cx)
                if not same:
                    out_id.append(yi)
                    out_c.append(cy)
                yield pd.DataFrame(
                    {"id": np.concatenate(out_id), "pc": np.concatenate(out_c)}
                )

    partials = pairs.mapInPandas(kernel, "id long, pc long")
    return partials.groupBy("id").agg(F.sum("pc").alias("n_neighbors"))


def block_components_and_borders(
    points_flagged: DataFrame, eps: float, block_rows: int = 2048
) -> DataFrame:
    """Block-mode twin of ``local_components_and_borders``. Input
    ``(id, xs, is_core)``; output rows ``(kind, a, b)``:

    * kind=0: raw core-core eps-edges (u < v) — fed straight to the
      global connected-components pass (no per-cell contraction is
      possible without a cell-complete neighborhood view).
    * kind=1: (non-core id, adjacent core id) border candidates.
    """
    eps2 = float(eps) * float(eps)
    n = points_flagged.count()
    pairs, _m = _pack_blocks(
        points_flagged.select("id", "xs", "is_core"), n, block_rows, extra=["is_core"]
    )
    schema = T.StructType(
        [
            T.StructField("kind", T.IntegerType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                xi = np.asarray(list(row.ids_), dtype=np.int64)
                X = np.asarray([np.asarray(v) for v in row.xss_], dtype=np.float64)
                xc = np.asarray(list(row.is_cores_), dtype=bool)
                yi = np.asarray(list(row.yids_), dtype=np.int64)
                Y = np.asarray([np.asarray(v) for v in row.yxss_], dtype=np.float64)
                yc = np.asarray(list(row.yis_cores_), dtype=bool)
                same = row.blk == row.yblk
                ka, kb, kk = [], [], []
                step = _block_rows(Y.shape[0])
                for lo in range(0, X.shape[0], step):
                    hit = _dist2_block(X[lo : lo + step], Y) <= eps2
                    ai, bi = np.nonzero(hit)
                    ga, gb = xi[lo + ai], yi[bi]
                    ca, cb = xc[lo + ai], yc[bi]
                    # core-core edges, each unordered pair once
                    cc = ca & cb & (ga < gb if same else ga != gb)
                    u, v = ga[cc], gb[cc]
                    kk.append(np.zeros(u.size, dtype=np.int32))
                    ka.append(np.minimum(u, v))
                    kb.append(np.maximum(u, v))
                    # border candidates in both directions
                    xb = ~ca & cb
                    kk.append(np.ones(xb.sum(), dtype=np.int32))
                    ka.append(ga[xb])
                    kb.append(gb[xb])
                    if not same:
                        yb = ca & ~cb
                        kk.append(np.ones(yb.sum(), dtype=np.int32))
                        ka.append(gb[yb])
                        kb.append(ga[yb])
                yield pd.DataFrame(
                    {
                        "kind": np.concatenate(kk) if kk else np.array([], dtype=np.int32),
                        "a": np.concatenate(ka) if ka else np.array([], dtype=np.int64),
                        "b": np.concatenate(kb) if kb else np.array([], dtype=np.int64),
                    }
                )

    # no dedup needed: a given point pair lives in exactly one block
    # pair, and same-block emission is orientation-filtered
    return pairs.mapInPandas(kernel, schema)


def local_components_and_borders(celled_flagged: DataFrame, eps: float) -> DataFrame:
    """Per-cell DBSCAN phase 2 (op 9's union half + edge emission for
    op 10). Input: ghost-expanded frame with ``is_core`` —
    ``(cell, id, xs, is_home, is_core)``. Output rows, two kinds:

    * ``kind=0`` (star edge): ``(a=core id, b=its local component
      min-core-id)`` for every core in the cell — the contracted
      union-find result. Cross-cell connectivity survives because a
      core appearing in several cells emits one star edge per cell;
      the global connected-components pass stitches them.
    * ``kind=1`` (border candidate): ``(a=non-core home id, b=local
      root of an adjacent core)``, distinct per (a, b).

    This replaces the reference's REMS union-find with splicing
    (``dbscan.cpp:753-791``) and its cross-rank merge buffers
    (``:745-751``): the in-cell union is a vectorized min-label
    pointer-doubling loop (O(E) per round, O(log n) rounds), and the
    merge buffers become ordinary shuffle rows.
    """
    eps2 = float(eps) * float(eps)
    schema = T.StructType(
        [
            T.StructField("kind", T.IntegerType()),
            T.StructField("a", T.LongType()),
            T.StructField("b", T.LongType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        ids = pdf["id"].to_numpy()
        core = pdf["is_core"].to_numpy(dtype=bool)
        home = pdf["is_home"].to_numpy(dtype=bool)
        x = _cell_matrix(pdf)

        cx, cid = x[core], ids[core]
        nc = cx.shape[0]
        frames = []

        if nc:
            # core-core adjacency -> local min-label union (ids sorted, so
            # min label index == min id)
            labels = np.arange(nc, dtype=np.int64)
            step = _block_rows(nc)
            pairs_u, pairs_v = [], []
            for lo in range(0, nc, step):
                d2 = _dist2_block(cx[lo : lo + step], cx)
                ui, vi = np.nonzero(d2 <= eps2)
                ui = ui + lo
                keep = ui < vi
                pairs_u.append(ui[keep])
                pairs_v.append(vi[keep])
            if pairs_u:
                u = np.concatenate(pairs_u)
                v = np.concatenate(pairs_v)
                while True:
                    before = labels.copy()
                    np.minimum.at(labels, u, labels[v])
                    np.minimum.at(labels, v, labels[u])
                    labels = labels[labels]  # pointer jump
                    if np.array_equal(labels, before):
                        break
            frames.append(pd.DataFrame({"kind": 0, "a": cid, "b": cid[labels]}))

            # border candidates: non-core HOME points adjacent to a core
            bmask = home & ~core
            bx, bid = x[bmask], ids[bmask]
            if bx.shape[0]:
                root_ids = cid[labels]
                step_b = _block_rows(nc)
                rows_a, rows_b = [], []
                for lo in range(0, bx.shape[0], step_b):
                    d2 = _dist2_block(bx[lo : lo + step_b], cx)
                    ai, ci = np.nonzero(d2 <= eps2)
                    rows_a.append(bid[lo : lo + step_b][ai])
                    rows_b.append(root_ids[ci])
                if rows_a:
                    ba = np.concatenate(rows_a)
                    bb = np.concatenate(rows_b)
                    uniq = pd.DataFrame({"kind": 1, "a": ba, "b": bb}).drop_duplicates()
                    frames.append(uniq)

        if not frames:
            return pd.DataFrame({"kind": pd.Series(dtype="int32"),
                                 "a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64")})
        return pd.concat(frames, ignore_index=True)

    return celled_flagged.groupBy("cell").applyInPandas(kernel, schema=schema)
