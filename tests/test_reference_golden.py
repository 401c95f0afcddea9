"""Golden runs on the reference repo's own benchmark datasets.

Expected values come from ``tests.oracle.seq_dbscan`` (sequential
DBSCAN — the correctness oracle; the reference's own ≥4-core runs are
documented-buggy). Where the reference recorded a validated number,
ours agrees: clus50k ε=25/minPts=5 → 51 clusters, 46914 in clusters /
3086 noise (``manyTests.py:258-266``, 2-core run); the part64-derived
3-D set at ε=0.02/minPts=5 → 6 clusters (``Progress-5-Nov-19.txt:31-52``,
2-core run).

texture17695 (20-D) and edge17695 (18-D) exercise the block-mode
fallback: their geometry leaves no usable grid (one cell holds ~all
points), so the engine switches to block nested-loop automatically.
"""

from __future__ import annotations

import pytest

from cs533_big_data_data_mining_spark.operators.dbscan import dbscan, dbscan_stats
from cs533_big_data_data_mining_spark.sources.points import read_points_bin

REF = "/root/reference"

# (file, eps, min_pts, n_clusters, noise) — all verified against
# seq_dbscan on the full dataset
GOLDEN = [
    ("t4.8k.bin", 10.0, 20, 6, 653),
    ("t5.8k.bin", 8.0, 21, 6, 850),
    ("t7.10k.bin", 10.0, 12, 10, 740),
    ("t8.8k.bin", 10.0, 10, 23, 459),
    ("texture17695.bin", 3.0, 2, 47, 1443),   # block-mode fallback
    ("edge17695.bin", 3.0, 2, 9, 97),         # block-mode fallback
    ("part64.bin", 0.02, 5, 6, 28585),        # reference-validated 6
    ("part64.bin", 0.01, 5, 113, 60143),
    ("clus50k.bin", 25.0, 5, 51, 3086),       # reference-validated 51
]


@pytest.mark.parametrize("fname,eps,min_pts,k,noise", GOLDEN)
def test_reference_dataset_golden(spark, fname, eps, min_pts, k, noise):
    pts = read_points_bin(spark, f"{REF}/{fname}")
    st = dbscan_stats(dbscan(pts, eps=eps, min_pts=min_pts)).head().asDict()
    assert st["n_clusters"] == k
    assert st["noise_count"] == noise
