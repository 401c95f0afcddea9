"""Golden DBSCAN tests vs the sequential oracle (FIXTURES.md §1).

Checks: exact membership under canonical labeling, cluster counts,
stats row, and partition-count invariance — the exact property the
reference violates (``Progress-5-Nov-19.txt:15-29``).
"""

import numpy as np
import pytest

from cs533_big_data_data_mining_spark.operators.dbscan import dbscan, dbscan_stats
from tests.oracle import grid_centers, make_blobs, seq_dbscan


def to_points_df(spark, x: np.ndarray):
    rows = [(int(i), [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "id long, xs array<double>")


def run_and_compare(spark, x, eps, min_pts, partitions=None, **kw):
    df = to_points_df(spark, x)
    if partitions:
        df = df.repartition(partitions)
    got = {r["id"]: r["cluster_id"] for r in dbscan(df, eps, min_pts, **kw).collect()}
    want = seq_dbscan(x, eps, min_pts)
    got_arr = np.array([got[i] for i in range(len(x))], dtype=np.int64)
    assert np.array_equal(got_arr, want), (
        f"mismatch: {int((got_arr != want).sum())}/{len(x)} points differ; "
        f"got clusters={got_arr.max()}, want={want.max()}"
    )
    return got_arr


CASES = [
    # (name, n, d, k, spacing, std, eps, min_pts, noise_frac)
    ("tiny_2d", 60, 2, 3, 30.0, 1.0, 1.0, 4, 0.1),
    ("blobs_2d", 2000, 2, 6, 50.0, 0.5, 0.3, 10, 0.05),
    ("blobs_3d", 3000, 3, 12, 1.0, 0.004, 0.01, 5, 0.02),
    ("blobs_10d", 4000, 10, 17, 400.0, 8.0, 25.0, 5, 0.05),
]


@pytest.mark.parametrize("name,n,d,k,spacing,std,eps,min_pts,noise", CASES, ids=[c[0] for c in CASES])
def test_dbscan_matches_oracle(spark, name, n, d, k, spacing, std, eps, min_pts, noise):
    x = make_blobs(n, d, grid_centers(k, d, spacing), std, seed=42, noise_frac=noise)
    run_and_compare(spark, x, eps, min_pts)


def test_distributed_cc_path(spark):
    """Force the star-algorithm CC path: BOTH driver fast paths
    disabled (driver_label_rows=0 keeps the label fastpath from
    returning before CC runs — without it the cc_driver_fastpath_edges
    knob is never reached) — must produce identical labels."""
    x = make_blobs(1200, 2, grid_centers(5, 2, 40.0), 0.6, seed=17, noise_frac=0.08)
    a = run_and_compare(spark, x, 0.4, 8, cc_driver_fastpath_edges=0, driver_label_rows=0)
    b = run_and_compare(spark, x, 0.4, 8)
    assert np.array_equal(a, b)


def test_distributed_label_path_no_serial_stage(spark):
    """The distributed labeling path must contain no single-partition
    exchange and no global window (round-3 verdict #4: dense ids were
    a row_number over one partition; now a range-partitioned
    zipWithIndex)."""
    from cs533_big_data_data_mining_spark.plans.audit import _plan_text

    x = make_blobs(1000, 2, grid_centers(4, 2, 40.0), 0.6, seed=23, noise_frac=0.05)
    labeled = dbscan(to_points_df(spark, x), 0.4, 8, driver_label_rows=0)
    txt = _plan_text(labeled, "formatted")
    # dense numbering may use a WINDOW, but only keyed on the
    # value-derived bucket — never a single-partition exchange
    assert "SinglePartition" not in txt
    labeled.unpersist()


def test_partition_invariance(spark):
    """Identical labels at 1/2/4/8 input partitions — fixes the
    reference's parallelism-dependent cluster counts."""
    x = make_blobs(1500, 2, grid_centers(5, 2, 40.0), 0.6, seed=7, noise_frac=0.08)
    ref = None
    for p in (1, 2, 4, 8):
        got = run_and_compare(spark, x, 0.4, 8, partitions=p)
        if ref is None:
            ref = got
        assert np.array_equal(got, ref), f"labels differ at {p} partitions"


def test_grid_width_invariance(spark):
    """Result must not depend on the physical grid choice."""
    x = make_blobs(800, 2, grid_centers(4, 2, 25.0), 0.5, seed=3, noise_frac=0.1)
    for wf in (1.0, 2.0, 4.0, 16.0):
        run_and_compare(spark, x, 0.35, 6, width_factor=wf)
    # degenerate single-cell grid (eps wider than the data)
    run_and_compare(spark, x, 0.35, 6, max_grid_dims=0)


def test_stats_row(spark):
    x = make_blobs(1000, 2, grid_centers(4, 2, 30.0), 0.5, seed=5, noise_frac=0.1)
    df = to_points_df(spark, x)
    labeled = dbscan(df, 0.4, 8)
    row = dbscan_stats(labeled).head()
    want = seq_dbscan(x, 0.4, 8)
    assert row["total_points"] == 1000
    assert row["noise_count"] == int((want == 0).sum())
    assert row["points_in_clusters"] == int((want != 0).sum())
    assert row["n_clusters"] == int(want.max())


def test_sampling_wired(spark):
    x = make_blobs(1000, 2, grid_centers(3, 2, 30.0), 0.5, seed=11)
    df = to_points_df(spark, x)
    labeled = dbscan(df, 0.4, 5, sample=0.5, seed=42)
    n = labeled.count()
    assert 300 < n < 700  # Bernoulli sample around 500
    labeled2 = dbscan(df, 0.4, 5, sample=0.5, seed=42)
    assert labeled2.count() == n  # seeded => reproducible


def test_skewed_dense_cell_keeps_grid(spark):
    """One dense blob over a uniform background (round-1 verdict
    finding #1): the blob's cells exceed the gate and get block-pair
    treatment, the background keeps the grid kernel — never a
    whole-job flip — and labels still match the oracle."""
    rng = np.random.default_rng(23)
    bg = rng.uniform(0.0, 100.0, size=(1200, 2))
    # blob centered INSIDE one cell of the row-budget 2x2 grid (cells
    # of side ~50), so exactly one cell is oversized
    blob = rng.normal(25.0, 0.4, size=(1500, 2))
    x = np.concatenate([bg, blob])
    got = run_and_compare(spark, x, 1.2, 5, block_fallback_rows=800)
    # same labels as the pure-grid path (gate high enough that no cell
    # is oversized)
    ref = run_and_compare(spark, x, 1.2, 5, block_fallback_rows=10**9)
    assert np.array_equal(got, ref)

    # structural: the probe must see a MIXED cell population — the
    # blob's cell oversized, the background's not (grid retained)
    from cs533_big_data_data_mining_spark.operators.cells import choose_grid, ghost_expand

    pts = to_points_df(spark, x).select("id", "xs")
    spec = choose_grid(pts, 2, 1.2)
    sizes = ghost_expand(pts, spec).groupBy("cell").count().collect()
    big = [r for r in sizes if r["count"] > 800]
    assert 0 < len(big) < len(sizes)


def test_min_pts_one_all_core(spark):
    x = make_blobs(100, 2, grid_centers(2, 2, 20.0), 0.3, seed=13)
    run_and_compare(spark, x, 0.5, 1)


def test_degenerate_inputs(spark):
    """Single point and all-identical points: the grid degenerates to
    one cell (no usable axes) and the pipeline must still produce
    standard-DBSCAN answers, not crash."""
    one = spark.createDataFrame([(0, [1.0, 2.0])], "id long, xs array<double>")
    st = dbscan_stats(dbscan(one, eps=0.5, min_pts=2)).head()
    assert (st["total_points"], st["n_clusters"], st["noise_count"]) == (1, 0, 1)
    st = dbscan_stats(dbscan(one, eps=0.5, min_pts=1)).head()
    assert (st["total_points"], st["n_clusters"], st["noise_count"]) == (1, 1, 0)

    same = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(50)], "id long, xs array<double>"
    )
    st = dbscan_stats(dbscan(same, eps=0.5, min_pts=5)).head()
    assert (st["total_points"], st["n_clusters"], st["noise_count"]) == (50, 1, 0)


def test_fused_override_paths_identical(spark):
    """dbscan(fused=True/False/None) must produce identical labels on
    a k=3 grid (where the auto rule picks two-pass) and fused=True
    must reject a thin-celled spec."""
    x = make_blobs(2500, 3, grid_centers(8, 3, 1.0), 0.004, seed=9, noise_frac=0.05)
    a = run_and_compare(spark, x, 0.01, 5, fused=True)
    b = run_and_compare(spark, x, 0.01, 5, fused=False)
    c = run_and_compare(spark, x, 0.01, 5)
    assert np.array_equal(a, b) and np.array_equal(b, c)

    from cs533_big_data_data_mining_spark.operators.cells import GridSpec

    thin = GridSpec(eps=0.01, dims=(0,), origin=(0.0,), width=(0.015,), ncells=(100,))
    df = to_points_df(spark, x)
    with pytest.raises(ValueError, match="fused=True"):
        from cs533_big_data_data_mining_spark.operators.dbscan import dbscan as _d

        _d(df, 0.01, 5, spec=thin, fused=True)
