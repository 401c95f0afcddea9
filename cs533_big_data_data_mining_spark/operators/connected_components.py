"""Distributed connected components (SURVEY §2 ops 10-11).

Replaces the reference's interleaved asynchronous merge protocol
(``dbscan.cpp:796-1012``) and its pointer-jumping global root
resolution (``dbscan.cpp:125-336``) with the alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): each round is two
shuffles, convergence in O(log^2 n) rounds, and the result is
deterministic — component label = min node id — which is exactly the
"union by global order" orientation the reference enforces manually
(``dbscan.cpp:950-977``).

The reference's termination vote (``MPI_Allreduce`` of outstanding
message counts, ``dbscan.cpp:1007-1010``) becomes a driver-side
fixpoint check on the edge set; ``localCheckpoint`` truncates lineage
each round (SURVEY §4 "custom work" item 2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Below this many edges the fixpoint finishes on the driver: the
# star-edge graph is already cell-contracted (a few rows per core
# point), so for moderate inputs the distributed rounds are pure
# scheduling latency. Same size-gated hybrid GraphFrames applies.
DRIVER_FASTPATH_EDGES = 5_000_000


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every neighbor larger than u to min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    w = Window.partitionBy("src")
    m = F.least(F.col("src"), F.min("dst").over(w)).alias("m")
    return (
        sym.select("src", "dst", m)
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges downward, then connect u and all smaller neighbors
    to the minimum of the down-neighborhood."""
    down = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src")
    m = F.min("dst").over(w).alias("m")
    withm = down.select("src", "dst", m)
    out = withm.select(F.col("dst").alias("src"), F.col("m").alias("dst")).union(
        withm.select("src", "m")
    )
    return out.filter(F.col("src") != F.col("dst")).distinct()


def _driver_union(e: DataFrame) -> DataFrame:
    """Finish a small edge set locally: min-label pointer doubling on
    NumPy arrays — same labels as the distributed path (component =
    min node id), just without per-round job latency."""
    pdf = e.toPandas()
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    u, v = inv[: len(src)], inv[len(src) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        before = lab.copy()
        np.minimum.at(lab, u, lab[v])
        np.minimum.at(lab, v, lab[u])
        lab = lab[lab]
        if np.array_equal(lab, before):
            break
    out = pd.DataFrame({"node": nodes, "component": nodes[lab]})
    # explicit schema: with zero edges the frame is empty and schema
    # inference would fail
    df = e.sparkSession.createDataFrame(out, "node long, component long")
    if len(out) > 100_000:
        # a driver-created DataFrame is re-serialized from the driver
        # into EVERY job that scans it; one eager localCheckpoint
        # ships the rows to executor block storage once, and the
        # downstream core-root join reads local blocks instead
        # (measured at 3M nodes: join 22.3s -> ~2s). Skipped for
        # small results where the extra job is pure latency.
        df = df.localCheckpoint(eager=True)
    return df


def connected_components(
    edges: DataFrame,
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    driver_fastpath_edges: int = DRIVER_FASTPATH_EDGES,
    edge_count_hint: int | None = None,
) -> DataFrame:
    """Edge list ``(src, dst)`` -> ``(node, component)`` with
    ``component`` = min node id in the component. Nodes appearing only
    as isolated (no edges) must be handled by the caller (self-label).

    ``edge_count_hint``: an UPPER BOUND on the edge count the caller
    already knows (e.g. from materializing the frame the edges came
    from). Supplying it skips the counting job; the bound is
    conservative for the fastpath gate (pre-distinct count >= distinct
    count).
    """
    e_raw = edges.filter(F.col("src") != F.col("dst"))
    cnt = edge_count_hint if edge_count_hint is not None else None
    if driver_fastpath_edges:
        if cnt is None:
            cnt = e_raw.count()
        if cnt <= driver_fastpath_edges:
            # no distinct and no checkpoint: duplicate edges are
            # harmless to the local union (np.unique dedups node ids;
            # repeated (u, v) rows are idempotent min-updates), so the
            # fastpath skips the whole dedup shuffle and toPandas pulls
            # the raw filtered edges
            return _driver_union(e_raw)
    e = e_raw.distinct().localCheckpoint(eager=True)
    prev_sig = None
    for it in range(max_iterations):
        e = _small_star(_large_star(e))
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            e = e.localCheckpoint(eager=True)
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
        ).head()
        cur_sig = (sig["n"], sig["h"])
        if cur_sig == prev_sig:
            break
        prev_sig = cur_sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")

    # After convergence every edge is (node -> component root).
    comp = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    roots = comp.select(F.col("component").alias("node"), F.col("component"))
    return comp.union(roots).distinct()
