"""Distributed DBSCAN — the reference engine's flagship capability,
as one composable DataFrame pipeline (SURVEY §3.1 lifecycle):

    points -> [sample] -> grid cells -> ghost expand
           -> applyInPandas neighbor counts  (core predicate)
           -> applyInPandas local union      (star edges + borders)
           -> connected components fixpoint  (cross-cell merge)
           -> dense cluster ids              (noise = 0)

Semantics are **standard sequential DBSCAN** (the oracle of
FIXTURES.md §1), not the reference's order-dependent variant: the
reference's cluster count degrades with parallelism
(``Progress-5-Nov-19.txt:15-52``, suspected id-assignment bug); this
pipeline is deterministic and partition-count invariant by
construction (all merges are min-reductions).

Conventions:
* core point: |N_eps(p)| >= min_pts, self inclusive, dist <= eps.
* cluster = connected component of core points under the eps
  relation; every core belongs to exactly one cluster (singleton core
  components are clusters, per standard DBSCAN).
* border point (non-core with >= 1 core eps-neighbor) joins the
  cluster of its minimum core root — a deterministic tie-break where
  the reference inherits arrival order (``dbscan.cpp:760``).
* noise: cluster_id = 0 (reference convention ``dbscan.cpp:399``);
  cluster ids are dense 1..K ordered by each cluster's min core id
  (reference op 12's prefix-sum dense numbering, made deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

import time

from cs533_big_data_data_mining_spark.operators.cells import GridSpec, choose_grid, ghost_expand
from cs533_big_data_data_mining_spark.operators.connected_components import connected_components
from cs533_big_data_data_mining_spark.operators.neighbors import (
    cell_block_components_and_borders,
    cell_block_neighbor_counts,
    local_components_and_borders,
    neighbor_counts,
)
from cs533_big_data_data_mining_spark.operators.stats import cluster_stats, sample_points


def _infer_dims(points: DataFrame) -> int:
    head = points.select(F.size("xs").alias("d")).head()
    if head is None:
        raise ValueError("empty point frame")
    return int(head["d"])


def core_flags(points: DataFrame, eps: float, min_pts: int, spec: GridSpec) -> DataFrame:
    """(id, n_neighbors, is_core) — op 9's core predicate as a
    HAVING-count-style aggregate over the cell kernel."""
    celled = ghost_expand(points, spec)
    counts = neighbor_counts(celled, eps)
    return counts.withColumn("is_core", F.col("n_neighbors") >= F.lit(int(min_pts)))


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    dims: int | None = None,
    sample: float | None = None,
    seed: int | None = None,
    spec: GridSpec | None = None,
    max_grid_dims: int = 3,
    width_factor: float = 4.0,
    cc_driver_fastpath_edges: int | None = None,
    block_fallback_rows: int = 8192,
    stage_times: dict | None = None,
) -> DataFrame:
    """Cluster a canonical point frame ``(id, xs)``.

    Returns ``(id, xs, cluster_id)`` with noise = 0, **materialized**
    (cached + counted) so every intermediate cache is released before
    returning — repeated calls in one session do not stack caches.
    One call covers the reference's whole ``mpi_main.cpp:47-197``
    pipeline, including the declared-but-unwired ``-p`` sampling
    option (op 15).

    Skew handling: ONE probe aggregation over the ghost-expanded frame
    finds cells larger than ``block_fallback_rows``. Those cells — and
    only those — are re-spread over same-cell block-pair tasks
    (``cell_block_*``); every other cell runs the sort-sweep grid
    kernel. A dataset the grid cannot partition at all (no usable
    axes, or everything in one cell) is just the degenerate case of
    "every populated cell is oversized" — there is no whole-job mode
    flip (round-1 verdict finding #1).

    Pass ``stage_times={}`` to collect per-stage wall seconds, the
    Spark analog of the reference's per-stage instrumentation
    (``mpi_main.cpp:138-193``).
    """
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    t = stage_times if stage_times is not None else {}
    t0 = time.time()
    dims = dims or _infer_dims(points)
    if sample is not None:
        points = sample_points(points, sample, seed)
    points = points.select("id", "xs").cache()

    spec = spec or choose_grid(points, dims, eps, max_grid_dims=max_grid_dims, width_factor=width_factor)
    t["grid"] = round(time.time() - t0, 3)

    # Fused skew/degeneracy probe (replaces round 1's separate
    # points.count() + max-cell probe + whole-job block flip): one
    # aggregation yields every oversized cell and its size.
    t0 = time.time()
    celled = ghost_expand(points, spec).cache()
    big_sizes = {
        int(r["cell"]): int(r["cnt"])
        for r in (
            celled.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > F.lit(int(block_fallback_rows)))
            .collect()
        )
    }
    t["partition_probe"] = round(time.time() - t0, 3)

    t0 = time.time()
    is_big = F.col("cell").isin(list(big_sizes)) if big_sizes else F.lit(False)
    if big_sizes:
        counts = neighbor_counts(celled.filter(~is_big), eps).unionByName(
            cell_block_neighbor_counts(celled.filter(is_big), big_sizes, eps)
        )
    else:
        counts = neighbor_counts(celled, eps)
    # cached: used by the flags join AND core_roots below — without
    # this the per-cell neighbor kernel runs twice
    flags = counts.select(
        "id", (F.col("n_neighbors") >= F.lit(int(min_pts))).alias("is_core")
    ).cache()

    # carry core flags back onto the ghost-expanded frame (AQE picks
    # broadcast vs shuffle; flags is one boolean per point)
    celled_flagged = celled.join(flags, "id")

    if big_sizes:
        lb = local_components_and_borders(celled_flagged.filter(~is_big), spec.eps).unionByName(
            cell_block_components_and_borders(celled_flagged.filter(is_big), big_sizes, spec.eps)
        )
    else:
        lb = local_components_and_borders(celled_flagged, spec.eps)
    lb = lb.cache()
    # materialize the (small) edge frame eagerly — counting BY KIND so
    # the star-edge total doubles as the CC fastpath gate (no separate
    # counting job) — then release the ghost-expanded cache: it is
    # ~3.4x the input and every downstream op needs only lb/flags.
    kind_counts = {
        int(r["kind"]): int(r["n"])
        for r in lb.groupBy("kind").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    celled.unpersist()
    t["local"] = round(time.time() - t0, 3)

    t0 = time.time()
    star_edges = lb.filter(F.col("kind") == 0).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    border_pairs = lb.filter(F.col("kind") == 1).select("a", "b")

    cc_kwargs = {"edge_count_hint": kind_counts.get(0, 0)}
    if cc_driver_fastpath_edges is not None:
        cc_kwargs["driver_fastpath_edges"] = cc_driver_fastpath_edges
    cc = connected_components(star_edges, **cc_kwargs)
    t["merge"] = round(time.time() - t0, 3)

    t0 = time.time()
    cores = flags.filter("is_core").select("id")
    # cached: consumed by border_roots, dense AND labels — without it
    # the CC-result join (whose lineage may be the whole star fixpoint)
    # re-executes per consumer
    core_roots = (
        cores.join(cc, cores["id"] == cc["node"], "left")
        .select(cores["id"].alias("id"), F.coalesce("component", cores["id"]).alias("root"))
        .cache()
    )

    border_roots = (
        border_pairs.join(core_roots.select(F.col("id").alias("b_id"), "root"), F.col("b") == F.col("b_id"))
        .groupBy(F.col("a").alias("id"))
        .agg(F.min("root").alias("root"))
    )

    # dense ids 1..K ordered by cluster min core id (K is small: one
    # row per cluster, so the window sort is negligible)
    from pyspark.sql import Window

    # the window runs over K distinct roots (small by construction);
    # the constant-valued but non-foldable partition key (root % 1 = 0)
    # makes the single-partition execution explicit instead of
    # warned-about (a plain literal is constant-folded to an empty
    # partition spec, which re-triggers the warning)
    dense = (
        core_roots.select("root")
        .distinct()
        .withColumn(
            "cluster_id",
            F.row_number().over(Window.partitionBy(F.pmod(F.col("root"), F.lit(1))).orderBy("root")),
        )
    )

    labels = core_roots.union(border_roots).join(dense, "root").select("id", "cluster_id")
    labeled = (
        points.join(labels, "id", "left")
        .select("id", "xs", F.coalesce("cluster_id", F.lit(0)).alias("cluster_id"))
        .persist()
    )
    # materialize, then drop every intermediate cache (labeled is the
    # only cache that survives the call — caller-owned)
    labeled.count()
    for frame in (lb, flags, core_roots, points):
        frame.unpersist()
    t["label"] = round(time.time() - t0, 3)
    return labeled


def dbscan_stats(labeled: DataFrame) -> DataFrame:
    """(total_points, points_in_clusters, noise_count, n_clusters) — op 13."""
    return cluster_stats(labeled)
