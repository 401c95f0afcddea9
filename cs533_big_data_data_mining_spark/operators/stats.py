"""Statistical aggregates over point frames (SURVEY §2 ops 2-4, 13, 15).

Everything here is a single declarative ``df.agg`` — Catalyst plans
the partial (map-side) + final aggregation that the reference
hand-rolls with ``MPI_Allgather``/``MPI_Allreduce``
(``geometric_partitioning.cpp:637-690``, ``dbscan.cpp:344-367``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bounding_box(points: DataFrame, dims: int) -> DataFrame:
    """Global per-dimension min/max (ops 2+3).

    One row, columns ``min_x{j}, max_x{j}``. The reference computes a
    local box per rank then Allgathers and folds
    (``geometric_partitioning.cpp:637-690``); Spark's partial+final
    hash aggregate is the same dataflow without the custom protocol.
    """
    aggs = []
    for j in range(dims):
        aggs.append(F.min(F.col("xs")[j]).alias(f"min_x{j}"))
        aggs.append(F.max(F.col("xs")[j]).alias(f"max_x{j}"))
    return points.agg(*aggs)


def dim_quantiles(points: DataFrame, dim: int, probs=(0.5,), exact: bool = True) -> DataFrame:
    """Quantiles of one coordinate (op 4).

    The reference approximates the distributed median with
    median-of-local-medians (``geometric_partitioning.cpp:601-631``,
    local quickselect ``utils.cpp:28-58``). Here: exact
    ``percentile`` for oracle checks, or ``percentile_approx``
    (Greenwald-Khanna — better error bounds than median-of-medians)
    for the scale path.
    """
    col = F.col("xs")[dim]
    fn = F.percentile if exact else F.percentile_approx
    aggs = [fn(col, F.lit(p)).alias(f"p{int(p * 100):02d}_x{dim}") for p in probs]
    return points.agg(*aggs)


def widest_dims(points: DataFrame, dims: int, k: int) -> list[int]:
    """Indexes of the k widest dimensions (by min/max range).

    The reference splits on the widest dimension of the current box
    (``geometric_partitioning.cpp:430-437``); the grid partitioner
    uses the same heuristic to pick which dims form the spatial grid.
    """
    row = bounding_box(points, dims).head()
    widths = [(row[f"max_x{j}"] - row[f"min_x{j}"], j) for j in range(dims)]
    widths.sort(key=lambda t: (-t[0], t[1]))
    return [j for _, j in widths[:k]]


def sample_points(points: DataFrame, fraction: float, seed: int | None = None) -> DataFrame:
    """Seeded Bernoulli sample (op 15).

    The reference parses ``-p seed_percentage`` but never uses it
    (``mpi_main.cpp:88-90``, ``dbscan.cpp:34-39``); this engine wires
    it for real via ``df.sample``.
    """
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    if fraction == 1.0:
        return points
    return points.sample(fraction=fraction, seed=seed)


def cluster_stats(labeled: DataFrame) -> DataFrame:
    """Clustering summary (op 13): one row
    ``(total_points, points_in_clusters, noise_count, n_clusters)``.

    The reference computes these with three ``MPI_Allreduce(SUM)``
    calls (``dbscan.cpp:344-367``); noise is ``cluster_id = 0``
    (``dbscan.cpp:399``).
    """
    is_noise = (F.col("cluster_id") == 0).cast("long")
    return labeled.agg(
        F.count(F.lit(1)).alias("total_points"),
        F.sum(1 - is_noise).alias("points_in_clusters"),
        F.sum(is_noise).alias("noise_count"),
        F.count_distinct(F.when(F.col("cluster_id") != 0, F.col("cluster_id"))).alias("n_clusters"),
    )
