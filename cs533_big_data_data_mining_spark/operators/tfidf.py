"""TF-IDF weighting over the documents table (SURVEY §7 Phase E).

Pure DataFrame composition: explode tokens -> per-(doc, term) counts
-> per-term document frequency -> smooth idf join. Two shuffles
total (both map-side-combinable groupBys); the tf<->df join is an
equi-join on term, so AQE's skew handling covers hot terms. Exactly
SQL-expressible, so the DuckDB oracle verifies it end to end.

The idf is the sklearn-style smooth variant
``ln((1 + N) / (1 + df)) + 1`` — strictly positive, no
division-by-zero corner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import tokenize
from cs533_big_data_data_mining_spark.operators.dedup import _spread


def term_frequencies(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — raw in-document term counts."""
    toks = _spread(docs).select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("term")
    )
    return toks.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))


def document_frequencies(tf: DataFrame) -> DataFrame:
    """(term, df) — number of documents containing each term."""
    return tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))


def tf_idf(
    docs: DataFrame, id_col: str, text_col: str, min_df: int = 1
) -> DataFrame:
    """Sparse TF-IDF matrix: ``(id, term, tf, df, tfidf)``.

    ``min_df`` drops ultra-rare terms (vocabulary pruning — at corpus
    scale the df frame IS the vocabulary, and hapaxes dominate it).
    """
    n_docs = docs.select(F.col(id_col)).distinct().count()
    tf = term_frequencies(docs, id_col, text_col)
    df_ = document_frequencies(tf)
    if min_df > 1:
        df_ = df_.filter(F.col("df") >= F.lit(int(min_df)))
    idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df").cast("double"))) + F.lit(1.0)
    return tf.join(df_, "term").select(
        "id",
        "term",
        "tf",
        "df",
        F.round(F.col("tf").cast("double") * idf, 6).alias("tfidf"),
    )
