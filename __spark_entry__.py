"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship DBSCAN query at sf0.001;
``queries()``/``oracle_sql()`` pair every SURVEY.md §2 operator with
a DuckDB-checkable ANSI SQL twin (including full DBSCAN labeling,
expressed as a recursive-CTE connected-components closure).

Float-determinism conventions used throughout so value-hashes match:
* distance predicates accumulate per-dim squared diffs left-to-right
  in float64 on both sides (bit-exact);
* monetary aggregates are summed as DECIMAL (exact) and cast to
  DOUBLE at the end on both sides;
* all computed columns are aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SHIPPED = False


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the package zip to executors (the driver may have built
    its own session without our factory)."""
    global _SHIPPED
    if _SHIPPED:
        return
    try:
        from cs533_big_data_data_mining_spark.session import _package_zip

        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added or local import works
    _SHIPPED = True


# ---------------------------------------------------------------- points

EPS3 = 0.06  # eps for the 3-D embedding projection: ~57% cores, real border/noise mix
MINPTS3 = 5
EPS3_SQL = "(0.06*0.06)"  # eps^2 spelled as the same product the engine computes

_D2_SQL = (
    "(a.x0-b.x0)*(a.x0-b.x0) + (a.x1-b.x1)*(a.x1-b.x1) + (a.x2-b.x2)*(a.x2-b.x2)"
)

_PTS_SQL = """
pts AS (
  SELECT vec_id AS id,
         CAST(embedding[1] AS DOUBLE) AS x0,
         CAST(embedding[2] AS DOUBLE) AS x1,
         CAST(embedding[3] AS DOUBLE) AS x2
  FROM embeddings
)"""

# full DBSCAN as SQL: neighbor counts -> cores -> transitive closure of
# core-core eps-edges -> min-root labels -> dense ids -> border attach
_LABELS_SQL = f"""
WITH RECURSIVE {_PTS_SQL},
nbr AS (
  SELECT a.id AS ia, b.id AS ib FROM pts a JOIN pts b ON {_D2_SQL} <= {EPS3_SQL}
),
cnt AS (SELECT ia AS id, count(*) AS n FROM nbr GROUP BY ia),
core AS (SELECT id FROM cnt WHERE n >= {MINPTS3}),
core_edges AS (
  SELECT n.ia AS u, n.ib AS v FROM nbr n
  JOIN core c1 ON n.ia = c1.id JOIN core c2 ON n.ib = c2.id
),
reach(u, v) AS (
  SELECT u, v FROM core_edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN core_edges e ON r.v = e.u
),
roots AS (SELECT u AS id, min(v) AS root FROM reach GROUP BY u),
dense AS (
  SELECT root, CAST(row_number() OVER (ORDER BY root) AS BIGINT) AS cluster_id
  FROM (SELECT DISTINCT root FROM roots)
),
core_labels AS (SELECT r.id, d.cluster_id FROM roots r JOIN dense d USING (root)),
border AS (
  SELECT n.ia AS id, min(r.root) AS broot
  FROM nbr n JOIN roots r ON n.ib = r.id
  WHERE n.ia NOT IN (SELECT id FROM core)
  GROUP BY n.ia
),
border_labels AS (SELECT b.id, d.cluster_id FROM border b JOIN dense d ON b.broot = d.root),
labels AS (
  SELECT p.id AS id, CAST(COALESCE(cl.cluster_id, bl.cluster_id, 0) AS BIGINT) AS cluster_id
  FROM pts p
  LEFT JOIN core_labels cl ON p.id = cl.id
  LEFT JOIN border_labels bl ON p.id = bl.id
)"""


def _points3(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.array(*[F.col("embedding")[j].cast("double") for j in range(3)]).alias("xs"),
    )


def _dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.dbscan import dbscan

    labeled = dbscan(_points3(spark, sf_dir), EPS3, MINPTS3)
    return labeled.select("id", F.col("cluster_id").cast("long").alias("cluster_id"))


# ---------------------------------------------------------------- queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full distributed DBSCAN over the sf0.001 embeddings
    (3-D projection), returning (id, cluster_id)."""
    return _dbscan_labels(spark, "/root/testdata/sf0.001")


def _q_scan_project_filter(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.filter(F.col("l_quantity") < 5).select("l_orderkey", "l_linenumber", "l_quantity")


def _q_bbox(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.stats import bounding_box

    return bounding_box(_points3(spark, sf_dir), 3)


def _q_median_dim(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.stats import dim_quantiles

    return dim_quantiles(_points3(spark, sf_dir), 0, probs=(0.5,))


def _q_grid_cells(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.cells import GridSpec, assign_cells

    spec = GridSpec(eps=0.05, dims=(0, 1), origin=(-0.6, -0.6), width=(0.3, 0.3), ncells=(4, 4))
    return assign_cells(_points3(spark, sf_dir), spec).select("id", "cell")


def _q_ghost_rows(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.cells import GridSpec, ghost_expand

    spec = GridSpec(eps=0.05, dims=(0,), origin=(-0.6,), width=(0.3,), ncells=(4,))
    g = ghost_expand(_points3(spark, sf_dir), spec)
    return g.select("cell", "id", "is_home")


def _q_neighbor_count(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.cells import choose_grid, ghost_expand
    from cs533_big_data_data_mining_spark.operators.neighbors import neighbor_counts

    pts = _points3(spark, sf_dir)
    spec = choose_grid(pts, 3, EPS3)
    return neighbor_counts(ghost_expand(pts, spec), EPS3)


def _q_core_points(spark, sf_dir):
    return (
        _q_neighbor_count(spark, sf_dir)
        .filter(F.col("n_neighbors") >= MINPTS3)
        .select("id")
    )


def _q_cluster_labels(spark, sf_dir):
    return _dbscan_labels(spark, sf_dir)


def _q_cluster_stats(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.stats import cluster_stats

    return cluster_stats(_dbscan_labels(spark, sf_dir))


def _q_dense_ids(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.createOrReplaceTempView("_li_dense")
    return spark.sql(
        "SELECT DISTINCT l_suppkey, CAST(dense_rank() OVER (ORDER BY l_suppkey) AS BIGINT) AS dense_id FROM _li_dense"
    )


def _q_sample_count(spark, sf_dir):
    _ensure_shipped(spark)
    from cs533_big_data_data_mining_spark.operators.stats import sample_points

    pts = _points3(spark, sf_dir)
    return sample_points(pts, 0.25, seed=42).select("id")


def _q_agg_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q_join_revenue_by_nation(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


def _q_window_topk(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    o.createOrReplaceTempView("_orders_w")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, rn FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(row_number() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
          FROM _orders_w)
        WHERE rn <= 2
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_project_filter": _q_scan_project_filter,
        "bbox": _q_bbox,
        "median_dim": _q_median_dim,
        "grid_cells": _q_grid_cells,
        "ghost_rows": _q_ghost_rows,
        "neighbor_count": _q_neighbor_count,
        "core_points": _q_core_points,
        "cluster_labels": _q_cluster_labels,
        "cluster_stats": _q_cluster_stats,
        "dense_ids": _q_dense_ids,
        "sample_count": _q_sample_count,
        "agg_q1": _q_agg_q1,
        "join_revenue_by_nation": _q_join_revenue_by_nation,
        "window_topk": _q_window_topk,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "scan_project_filter": (
            "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity < 5"
        ),
        "bbox": f"""
            WITH {_PTS_SQL.strip()}
            SELECT min(x0) AS min_x0, max(x0) AS max_x0,
                   min(x1) AS min_x1, max(x1) AS max_x1,
                   min(x2) AS min_x2, max(x2) AS max_x2
            FROM pts
        """,
        "median_dim": f"""
            WITH {_PTS_SQL.strip()}
            SELECT quantile_cont(x0, 0.5) AS p50_x0 FROM pts
        """,
        "grid_cells": f"""
            WITH {_PTS_SQL.strip()}
            SELECT id,
                   CAST(least(greatest(floor((x0 - (-0.6)) / 0.3), 0), 3) * 4
                      + least(greatest(floor((x1 - (-0.6)) / 0.3), 0), 3) AS BIGINT) AS cell
            FROM pts
        """,
        "ghost_rows": f"""
            WITH {_PTS_SQL.strip()},
            celled AS (
              SELECT id, x0,
                     CAST(least(greatest(floor((x0 - (-0.6)) / 0.3), 0), 3) AS BIGINT) AS c
              FROM pts)
            SELECT c AS cell, id, TRUE AS is_home FROM celled
            UNION ALL
            SELECT c - 1 AS cell, id, FALSE AS is_home FROM celled
              WHERE c > 0 AND (x0 - (-0.6 + c * 0.3)) <= 0.05
            UNION ALL
            SELECT c + 1 AS cell, id, FALSE AS is_home FROM celled
              WHERE c < 3 AND ((-0.6 + (c + 1) * 0.3) - x0) <= 0.05
        """,
        "neighbor_count": f"""
            WITH {_PTS_SQL.strip()}
            SELECT a.id AS id, count(*) AS n_neighbors
            FROM pts a JOIN pts b ON {_D2_SQL} <= {EPS3_SQL}
            GROUP BY a.id
        """,
        "core_points": f"""
            WITH {_PTS_SQL.strip()}
            SELECT a.id AS id
            FROM pts a JOIN pts b ON {_D2_SQL} <= {EPS3_SQL}
            GROUP BY a.id HAVING count(*) >= {MINPTS3}
        """,
        "cluster_labels": _LABELS_SQL + "\nSELECT id, cluster_id FROM labels",
        "cluster_stats": _LABELS_SQL
        + """
            SELECT CAST(count(*) AS BIGINT) AS total_points,
                   CAST(sum(CASE WHEN cluster_id != 0 THEN 1 ELSE 0 END) AS BIGINT) AS points_in_clusters,
                   CAST(sum(CASE WHEN cluster_id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS noise_count,
                   CAST(count(DISTINCT CASE WHEN cluster_id != 0 THEN cluster_id END) AS BIGINT) AS n_clusters
            FROM labels
        """,
        "dense_ids": (
            "SELECT DISTINCT l_suppkey, CAST(dense_rank() OVER (ORDER BY l_suppkey) AS BIGINT) AS dense_id FROM lineitem"
        ),
        "agg_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
                   CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_revenue_by_nation": """
            SELECT n_name,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name
        """,
        "window_topk": """
            SELECT o_custkey, o_orderkey, rn FROM (
              SELECT o_custkey, o_orderkey,
                     CAST(row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
              FROM orders)
            WHERE rn <= 2
        """,
    }
