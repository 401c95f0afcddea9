"""Single-node NumPy oracles for golden tests (FIXTURES.md §1).

``seq_dbscan`` implements standard sequential DBSCAN with the
engine's deterministic conventions (min-root border assignment, dense
ids by min core id, noise=0). It is the correctness oracle the
reference repo lacks — its own ≥4-node runs are known-buggy
(``Progress-5-Nov-19.txt:15-52``), so golden values come from here.
"""

from __future__ import annotations

import numpy as np


def pairwise_d2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for j in range(a.shape[1]):
        d = a[:, j : j + 1] - b[None, :, j]
        out += d * d
    return out


def seq_dbscan(x: np.ndarray, eps: float, min_pts: int, block: int = 2048) -> np.ndarray:
    """Return int64 labels: 0 = noise, clusters dense 1..K ordered by
    each cluster's minimum core index."""
    n = x.shape[0]
    x = np.asarray(x, dtype=np.float64)
    eps2 = float(eps) * float(eps)

    counts = np.zeros(n, dtype=np.int64)
    for lo in range(0, n, block):
        counts[lo : lo + block] = (pairwise_d2(x[lo : lo + block], x) <= eps2).sum(axis=1)
    core = counts >= min_pts
    core_idx = np.nonzero(core)[0]
    nc = core_idx.size

    labels_out = np.zeros(n, dtype=np.int64)
    if nc == 0:
        return labels_out

    # union core-core pairs via min-label pointer doubling
    cx = x[core_idx]
    lab = np.arange(nc, dtype=np.int64)
    us, vs = [], []
    for lo in range(0, nc, block):
        d2 = pairwise_d2(cx[lo : lo + block], cx)
        ui, vi = np.nonzero(d2 <= eps2)
        ui = ui + lo
        keep = ui < vi
        us.append(ui[keep])
        vs.append(vi[keep])
    u = np.concatenate(us) if us else np.array([], dtype=np.int64)
    v = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
    while True:
        before = lab.copy()
        np.minimum.at(lab, u, lab[v])
        np.minimum.at(lab, v, lab[u])
        lab = lab[lab]
        if np.array_equal(lab, before):
            break

    # dense ids by min core id (core_idx is ascending, so root index
    # order == min-core-id order)
    roots = np.unique(lab)
    dense = {r: i + 1 for i, r in enumerate(roots)}
    core_cluster = np.array([dense[r] for r in lab], dtype=np.int64)
    labels_out[core_idx] = core_cluster

    # borders: non-core with a core eps-neighbor -> min root
    root_id_of_core = core_idx[lab]  # min core id of each core's component
    non_core = np.nonzero(~core)[0]
    if non_core.size and nc:
        bx = x[non_core]
        for lo in range(0, bx.shape[0], block):
            d2 = pairwise_d2(bx[lo : lo + block], cx)
            adj = d2 <= eps2
            for r in range(adj.shape[0]):
                js = np.nonzero(adj[r])[0]
                if js.size:
                    min_root = root_id_of_core[js].min()
                    # dense id of that root
                    labels_out[non_core[lo + r]] = dense[lab[np.nonzero(core_idx == min_root)[0][0]]]
    return labels_out


def make_blobs(
    n: int,
    d: int,
    centers: np.ndarray,
    std: float,
    seed: int = 42,
    noise_frac: float = 0.0,
    noise_range: tuple[float, float] | None = None,
) -> np.ndarray:
    """Deterministic Gaussian blobs + optional uniform noise."""
    rng = np.random.default_rng(seed)
    k = centers.shape[0]
    n_noise = int(n * noise_frac)
    n_pts = n - n_noise
    assign = rng.integers(0, k, size=n_pts)
    pts = centers[assign] + rng.normal(0.0, std, size=(n_pts, d))
    if n_noise:
        lo, hi = noise_range or (centers.min() - 10 * std, centers.max() + 10 * std)
        noise = rng.uniform(lo, hi, size=(n_noise, d))
        pts = np.vstack([pts, noise])
    return pts.astype(np.float64)


def grid_centers(k: int, d: int, spacing: float) -> np.ndarray:
    """k well-separated centers on an axis-aligned grid."""
    side = int(np.ceil(k ** (1.0 / min(d, 3))))
    coords = []
    for i in range(k):
        c = np.zeros(d)
        rem = i
        for ax in range(min(d, 3)):
            c[ax] = (rem % side) * spacing
            rem //= side
        coords.append(c)
    return np.asarray(coords)
