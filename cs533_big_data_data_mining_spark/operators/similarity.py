"""Similarity search over embedding columns.

* ``cosine_topk_bruteforce`` — the exact baseline: a broadcast
  theta-join + window top-k. Right for query batches small enough to
  broadcast (the common "find neighbors of these K probes" shape);
  cost is |corpus| x |queries| JVM-side folds, no Python.
* ``ivf_index`` / ``ivf_topk`` — the scale path: IVF (inverted-file)
  partitioning. Corpus vectors are assigned to their nearest
  centroid once (linear scan over C centroids, broadcast); queries
  probe only the ``nprobe`` nearest centroid buckets, cutting the
  scanned fraction to ~nprobe/C with the usual recall trade-off.
  Centroids come from a deterministic seeded sample re-labeled by a
  k-means-style refinement pass (kept to ``iters`` rounds — each is
  one broadcast join + one groupBy).

All similarity math is the order-deterministic fold from
``functions/vector.py``; ties in top-k break by neighbor id, so
results are fully reproducible (the property every oracle check here
relies on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.vector import as_double_array, dot, norm2


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = as_double_array(vec_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(v, lambda x: x / norm2(v)).alias("vec"),
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_vec_col: str | None = None,
) -> DataFrame:
    """Exact top-k: ``(query_id, neighbor_id, cosine, rank)``.

    Queries are broadcast (small side); the corpus streams through
    one codegen'd projection — no shuffle until the final per-query
    top-k, which aggregates only k rows per query and partition.
    Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(query_id_col or id_col).alias("qid"),
        as_double_array(query_vec_col or vec_col).alias("qvec"),
    )
    c = corpus.select(F.col(id_col).alias("nid"), as_double_array(vec_col).alias("nvec"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("nid"))
        .withColumn(
            "cosine",
            F.round(dot("qvec", "nvec") / (norm2("qvec") * norm2("nvec")), 6),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("nid").alias("neighbor_id"), "cosine", "rank")
    )


def embedding_neardup_pairs(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — embedding-space
    near-dup detection. Exact form (self-join); for corpora too big
    to self-join, route through ``ivf_index`` buckets first."""
    v = df.select(F.col(id_col).alias("id"), as_double_array(vec_col).alias("vec"))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            F.round(
                dot(F.col("a.vec"), F.col("b.vec"))
                / (norm2(F.col("a.vec")) * norm2(F.col("b.vec"))),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"), "cosine")
    )


def ivf_index(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: returns ``(centroids, assignments)``.

    centroids: (cid, cvec) — seeded sample refined by ``iters``
    Lloyd rounds (each round: broadcast-join argmin assign + groupBy
    mean). assignments: (id, vec, cid).
    """
    c = _normalized(corpus, id_col, vec_col)
    cent = (
        c.orderBy(F.xxhash64(F.lit(seed), "id"))
        .limit(n_centroids)
        .select(F.monotonically_increasing_id().alias("cid"), F.col("vec").alias("cvec"))
    )

    def assign(points: DataFrame, cents: DataFrame) -> DataFrame:
        scored = points.join(F.broadcast(cents)).withColumn("sim", dot("vec", "cvec"))
        w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("cid"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("id", "vec", "cid")
        )

    for _ in range(iters):
        assigned = assign(c, cent)
        dims = len(cent.select("cvec").head()["cvec"])
        cent = assigned.groupBy("cid").agg(
            F.array(*[F.avg(F.col("vec")[j]) for j in range(dims)]).alias("cvec")
        )
    assignments = assign(c, cent)
    return cent, assignments


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the ``nprobe`` nearest IVF buckets per
    query. Scanned work ~= nprobe/n_centroids of brute force."""
    cent, assigned = ivf_index(corpus, n_centroids, id_col, vec_col, seed=seed)
    q = _normalized(queries, id_col, vec_col).withColumnRenamed("vec", "qvec").withColumnRenamed("id", "qid")

    qc = q.join(F.broadcast(cent)).withColumn("csim", dot("qvec", "cvec"))
    wq = Window.partitionBy("qid").orderBy(F.col("csim").desc(), F.col("cid"))
    probes = qc.withColumn("rn", F.row_number().over(wq)).filter(F.col("rn") <= nprobe).select("qid", "qvec", "cid")

    scored = probes.join(assigned, "cid").filter(F.col("qid") != F.col("id")).withColumn(
        "cosine", F.round(dot("qvec", "vec"), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias("query_id"), F.col("id").alias("neighbor_id"), "cosine", "rank")
    )
