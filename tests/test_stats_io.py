"""Stats aggregates (ops 2-4, 13, 15) and sources/sinks (ops 1, 14, 17)."""

import os
import struct

import numpy as np
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.operators.stats import (
    bounding_box,
    dim_quantiles,
    sample_points,
    widest_dims,
)
from cs533_big_data_data_mining_spark.sources.points import (
    as_points,
    read_points_bin,
    text_to_parquet,
    write_clusters,
)
from tests.oracle import grid_centers, make_blobs
from tests.test_dbscan import to_points_df


def test_bounding_box(spark):
    x = make_blobs(500, 3, grid_centers(3, 3, 10.0), 1.0, seed=1)
    row = bounding_box(to_points_df(spark, x), 3).head()
    for j in range(3):
        assert row[f"min_x{j}"] == x[:, j].min()
        assert row[f"max_x{j}"] == x[:, j].max()


def test_median(spark):
    x = make_blobs(501, 2, grid_centers(2, 2, 10.0), 1.0, seed=2)
    row = dim_quantiles(to_points_df(spark, x), 0, probs=(0.5,)).head()
    assert abs(row["p50_x0"] - np.median(x[:, 0])) < 1e-9


def test_widest_dims(spark):
    x = np.zeros((100, 3))
    x[:, 0] = np.linspace(0, 1, 100)
    x[:, 1] = np.linspace(0, 100, 100)
    x[:, 2] = np.linspace(0, 10, 100)
    assert widest_dims(to_points_df(spark, x), 3, 2) == [1, 2]


def test_sample(spark):
    df = to_points_df(spark, np.random.default_rng(0).normal(size=(2000, 2)))
    n = sample_points(df, 0.25, seed=42).count()
    assert 350 < n < 650


def test_bin_reader_roundtrip(spark, tmp_path):
    """FIXTURES.md §3: reference .bin format -> DataFrame, byte-identical
    after float32->float64 widening."""
    rng = np.random.default_rng(42)
    mat = rng.normal(size=(1000, 3)).astype(np.float32)
    p = tmp_path / "ref_format_roundtrip.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<ii", 1000, 3))
        f.write(mat.tobytes())
    df = read_points_bin(spark, str(p))
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert len(rows) == 1000
    got = np.array([r["xs"] for r in rows])
    assert np.array_equal(got, mat.astype(np.float64))


def test_bin_reader_multifile_unique_ids(spark, tmp_path):
    """Loading a directory of .bin files must not mint duplicate ids
    (per-file path-ordinal salt) — duplicate ids silently corrupt
    every downstream id join."""
    rng = np.random.default_rng(7)
    for i, n in enumerate((300, 500)):
        mat = rng.normal(size=(n, 2)).astype(np.float32)
        with open(tmp_path / f"part{i}.bin", "wb") as f:
            f.write(struct.pack("<ii", n, 2))
            f.write(mat.tobytes())
    df = read_points_bin(spark, str(tmp_path))
    ids = [r["id"] for r in df.select("id").collect()]
    assert len(ids) == 800
    assert len(set(ids)) == 800


def test_reference_dataset_reads(spark):
    """The engine reads the reference's own shipped datasets."""
    path = "/root/reference/t4.8k.bin"
    if not os.path.exists(path):
        return
    df = read_points_bin(spark, path)
    assert df.count() == 8000
    assert len(df.head()["xs"]) == 2


def test_write_clusters_sink(spark, tmp_path):
    x = make_blobs(100, 2, grid_centers(2, 2, 10.0), 1.0, seed=3)
    df = to_points_df(spark, x).withColumn("cluster_id", F.lit(1))
    out = str(tmp_path / "clusters_out")
    write_clusters(df, out)
    back = spark.read.parquet(out)
    assert set(back.columns) == {"position_col_X0", "position_col_X1", "cluster_id"}
    assert back.count() == 100


def test_text_to_parquet(spark, tmp_path):
    txt = tmp_path / "pts.txt"
    txt.write_text("3 2\n1.0 2.0\n3.0 4.0\n5.0 6.0\n")
    out = str(tmp_path / "pts_parquet")
    text_to_parquet(spark, str(txt), out)
    rows = spark.read.parquet(out).collect()
    assert sorted(tuple(r["xs"]) for r in rows) == [(1.0, 2.0), (3.0, 4.0), (5.0, 6.0)]


def test_as_points_flat_and_array(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "pk long, a double, b double")
    p1 = as_points(df, id_col="pk", feature_cols=["a", "b"]).head()
    assert p1["id"] == 1 and p1["xs"] == [2.0, 3.0]
    df2 = spark.createDataFrame([(7, [1.0, 2.0])], "pk long, emb array<float>")
    p2 = as_points(df2, id_col="pk", array_col="emb").head()
    assert p2["id"] == 7 and p2["xs"] == [1.0, 2.0]


def test_cli_main(spark, tmp_path):
    """The reference-compatible CLI driver end to end (uses the
    session fixture's already-running Spark via getOrCreate)."""
    from cs533_big_data_data_mining_spark.__main__ import main

    out = str(tmp_path / "cli_out")
    rc = main(
        ["-i", "/root/reference/t8.8k.bin", "-b", "-e", "10", "-m", "10", "-o", out]
    )
    assert rc == 0
    got = spark.read.parquet(out)
    assert got.count() == 8000
    assert set(got.columns) == {"position_col_X0", "position_col_X1", "cluster_id"}
