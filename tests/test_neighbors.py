"""Cell-kernel neighbor ops vs brute force (SURVEY §2 ops 6-9)."""

import numpy as np

from cs533_big_data_data_mining_spark.operators.cells import assign_cells, choose_grid, ghost_expand
from cs533_big_data_data_mining_spark.operators.neighbors import (
    brute_force_neighbor_counts,
    epsilon_self_join,
    neighbor_counts,
)
from tests.oracle import grid_centers, make_blobs, pairwise_d2
from tests.test_dbscan import to_points_df

EPS = 0.4


def _setup(spark, n=600, d=2, seed=21):
    x = make_blobs(n, d, grid_centers(4, d, 10.0), 0.6, seed=seed, noise_frac=0.1)
    df = to_points_df(spark, x)
    spec = choose_grid(df, d, EPS)
    return x, df, spec


def test_neighbor_counts_exact(spark):
    x, df, spec = _setup(spark)
    got = {r["id"]: r["n_neighbors"] for r in neighbor_counts(ghost_expand(df, spec), EPS).collect()}
    want = (pairwise_d2(x, x) <= EPS * EPS).sum(axis=1)
    assert len(got) == len(x)
    for i in range(len(x)):
        assert got[i] == want[i], f"point {i}: got {got[i]}, want {want[i]}"


def test_neighbor_counts_match_brute_force_plan(spark):
    x, df, spec = _setup(spark, n=300)
    kernel = {r["id"]: r["n_neighbors"] for r in neighbor_counts(ghost_expand(df, spec), EPS).collect()}
    brute = {r["id"]: r["n_neighbors"] for r in brute_force_neighbor_counts(df, EPS, 2).collect()}
    assert kernel == brute


def test_epsilon_self_join_exact_pairs(spark):
    x, df, spec = _setup(spark, n=250)
    got = {(r["a"], r["b"]) for r in epsilon_self_join(ghost_expand(df, spec), EPS).collect()}
    d2 = pairwise_d2(x, x)
    want = {(int(a), int(b)) for a, b in zip(*np.nonzero(d2 <= EPS * EPS))}
    assert got == want


def test_epsilon_join_bipartite_exact_pairs(spark):
    """Two-table eps-join == brute-force cross filter, each pair
    exactly once (ghost closure across two frames)."""
    from cs533_big_data_data_mining_spark.operators.neighbors import epsilon_join

    x, df, _spec = _setup(spark, n=300)
    left = df.filter("id < 120")
    right = df.filter("id >= 120")
    rows = epsilon_join(left, right, EPS).collect()
    got = [(r["a"], r["b"]) for r in rows]
    d2 = pairwise_d2(x[:120], x[120:])
    want = {(int(a), int(b) + 120) for a, b in zip(*np.nonzero(d2 <= EPS * EPS))}
    assert set(got) == want
    assert len(got) == len(want), "a pair was emitted more than once"


def test_epsilon_join_skew_block_routing(spark):
    """A dense region must trigger the (left-block x right-block)
    fallback for its cells only, with results identical to the
    unrouted kernel and to brute force."""
    from cs533_big_data_data_mining_spark.operators.neighbors import epsilon_join

    rng = np.random.default_rng(31)
    dense = rng.normal(5.0, 0.2, size=(900, 2))
    sparse = rng.uniform(0.0, 100.0, size=(300, 2))
    x = np.concatenate([dense, sparse])
    df = to_points_df(spark, x)
    left = df.filter("id % 2 = 0")
    right = df.filter("id % 2 = 1")

    routed = {(r["a"], r["b"]) for r in epsilon_join(left, right, EPS, block_fallback_rows=400).collect()}
    plain = {(r["a"], r["b"]) for r in epsilon_join(left, right, EPS, block_fallback_rows=10**9).collect()}
    lmask = np.arange(len(x)) % 2 == 0
    d2 = pairwise_d2(x[lmask], x[~lmask])
    li = np.flatnonzero(lmask)
    ri = np.flatnonzero(~lmask)
    want = {(int(li[a]), int(ri[b])) for a, b in zip(*np.nonzero(d2 <= EPS * EPS))}
    assert routed == plain == want


def test_epsilon_join_degenerate_inputs(spark):
    """Empty either side (or both) -> empty result, no crash; dims
    inference must not assume the left frame has rows."""
    from cs533_big_data_data_mining_spark.operators.neighbors import epsilon_join

    one = spark.createDataFrame([(0, [0.0, 0.0])], "id long, xs array<double>")
    empty = spark.createDataFrame([], "id long, xs array<double>")
    assert epsilon_join(one, empty, 0.5).count() == 0
    assert epsilon_join(empty, one, 0.5).count() == 0
    assert epsilon_join(empty, empty, 0.5).count() == 0
    # within-eps singleton pair still found
    two = spark.createDataFrame([(7, [0.1, 0.0])], "id long, xs array<double>")
    assert [(r["a"], r["b"]) for r in epsilon_join(one, two, 0.5).collect()] == [(0, 7)]


def test_every_point_has_exactly_one_home_cell(spark):
    x, df, spec = _setup(spark)
    ghosted = ghost_expand(df, spec)
    homes = ghosted.filter("is_home").groupBy("id").count().collect()
    assert len(homes) == len(x)
    assert all(r["count"] == 1 for r in homes)
    # home cell agrees with assign_cells
    ac = dict(assign_cells(df, spec).select("id", "cell").collect())
    gh = dict(ghosted.filter("is_home").select("id", "cell").collect())
    assert ac == gh


def test_ghost_closure(spark):
    """Every eps-neighbor of a cell's home points is present in that
    cell (the halo-exchange completeness property,
    ``geometric_partitioning.cpp:46-51``)."""
    x, df, spec = _setup(spark, n=400)
    rows = ghost_expand(df, spec).collect()
    by_cell: dict[int, set[int]] = {}
    home_of: dict[int, int] = {}
    for r in rows:
        by_cell.setdefault(r["cell"], set()).add(r["id"])
        if r["is_home"]:
            home_of[r["id"]] = r["cell"]
    d2 = pairwise_d2(x, x)
    ai, bi = np.nonzero(d2 <= EPS * EPS)
    for a, b in zip(ai, bi):
        assert int(b) in by_cell[home_of[int(a)]], f"neighbor {b} of {a} missing from home cell"
