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

from cs533_big_data_data_mining_spark.operators.cells import GridSpec, choose_grid, ghost_expand
from cs533_big_data_data_mining_spark.operators.connected_components import connected_components
from cs533_big_data_data_mining_spark.operators.neighbors import (
    block_components_and_borders,
    block_neighbor_counts,
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
) -> DataFrame:
    """Cluster a canonical point frame ``(id, xs)``.

    Returns ``(id, xs, cluster_id)`` with noise = 0. One call covers
    the reference's whole ``mpi_main.cpp:47-197`` pipeline, including
    the declared-but-unwired ``-p`` sampling option (op 15).
    """
    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    dims = dims or _infer_dims(points)
    if sample is not None:
        points = sample_points(points, sample, seed)
    points = points.select("id", "xs").cache()

    spec = spec or choose_grid(points, dims, eps, max_grid_dims=max_grid_dims, width_factor=width_factor)

    # Grid degeneracy check (SURVEY §7 Phase D): high-dimensional or
    # ultra-concentrated data can leave no usable grid axes, or a grid
    # whose largest cell holds ~everything — either way the cell
    # kernel would serialize one O(n^2) task. Fall back to the block
    # nested-loop path, which spreads the same exact work over
    # m(m+1)/2 block-pair tasks.
    use_blocks = not spec.dims
    celled = None
    if not use_blocks:
        celled = ghost_expand(points, spec).cache()
        # max-cell probe only when a degenerate cell is even possible:
        # with n <= block_fallback_rows no cell can exceed the gate
        # (points is cached, so the count is one cheap pass)
        if points.count() > block_fallback_rows:
            biggest = celled.groupBy("cell").count().agg(F.max("count")).head()[0]
            if biggest is not None and biggest > block_fallback_rows:
                use_blocks = True
                celled.unpersist()

    if use_blocks:
        counts = block_neighbor_counts(points, eps)
        flags = counts.select(
            "id", (F.col("n_neighbors") >= F.lit(int(min_pts))).alias("is_core")
        ).cache()
        pf = points.join(flags, "id").select("id", "xs", "is_core")
        lb = block_components_and_borders(pf, eps).cache()
        lb.count()
    else:
        counts = neighbor_counts(celled, eps)
        # cached: used by the flags join AND core_roots below — without
        # this the O(n^2)-per-cell neighbor kernel runs twice
        flags = counts.select(
            "id", (F.col("n_neighbors") >= F.lit(int(min_pts))).alias("is_core")
        ).cache()

        # carry core flags back onto the ghost-expanded frame (AQE picks
        # broadcast vs shuffle; flags is one boolean per point)
        celled_flagged = celled.join(flags, "id")

        lb = local_components_and_borders(celled_flagged, spec.eps).cache()
        # materialize the (small) edge frame eagerly, then release the
        # ghost-expanded cache — it is ~3.4x the input and every
        # downstream op needs only lb/flags. Without this, repeated
        # dbscan() calls in one session stack up evicting caches.
        lb.count()
        celled.unpersist()
    star_edges = lb.filter(F.col("kind") == 0).select(F.col("a").alias("src"), F.col("b").alias("dst"))
    border_pairs = lb.filter(F.col("kind") == 1).select("a", "b")

    cc_kwargs = {}
    if cc_driver_fastpath_edges is not None:
        cc_kwargs["driver_fastpath_edges"] = cc_driver_fastpath_edges
    cc = connected_components(star_edges, **cc_kwargs)

    cores = flags.filter("is_core").select("id")
    core_roots = cores.join(cc, cores["id"] == cc["node"], "left").select(
        cores["id"].alias("id"), F.coalesce("component", cores["id"]).alias("root")
    )

    border_roots = (
        border_pairs.join(core_roots.select(F.col("id").alias("b_id"), "root"), F.col("b") == F.col("b_id"))
        .groupBy(F.col("a").alias("id"))
        .agg(F.min("root").alias("root"))
    )

    # dense ids 1..K ordered by cluster min core id (K is small: one
    # row per cluster, so the window sort is negligible)
    from pyspark.sql import Window

    dense = (
        core_roots.select("root")
        .distinct()
        .withColumn("cluster_id", F.row_number().over(Window.orderBy("root")))
    )

    labels = core_roots.union(border_roots).join(dense, "root").select("id", "cluster_id")
    labeled = (
        points.join(labels, "id", "left")
        .select("id", "xs", F.coalesce("cluster_id", F.lit(0)).alias("cluster_id"))
    )
    return labeled


def dbscan_stats(labeled: DataFrame) -> DataFrame:
    """(total_points, points_in_clusters, noise_count, n_clusters) — op 13."""
    return cluster_stats(labeled)
