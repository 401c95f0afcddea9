"""Document corpus sources/sinks: JSONL and Parquet.

JSON-Lines is the de-facto interchange format for LLM text corpora
(one JSON object per line; gzip-splittable per file). The reader
pins an explicit schema — schema inference over 100 TB means a full
extra pass and nondeterministic column ordering — and tolerates
missing fields (null columns), mirroring how heterogeneous crawl
dumps actually arrive. Parquet remains the engine-native format
(columnar pruning, predicate pushdown); ``jsonl_to_parquet`` is the
one-pass converter, the documents twin of the reference's binary
converter (``createBinaryFile.py:1-27`` — SURVEY §2 op 17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: T.StructType = DOCUMENTS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Documents from JSONL.

    Default: DROPMALFORMED — corrupt lines are dropped at the scan
    (a 100 TB crawl always contains some) and the result is a clean,
    freely-queryable frame. ``keep_corrupt=True`` switches to
    PERMISSIVE with a ``_corrupt`` audit column holding the raw bad
    line; note Spark disallows queries that reference ONLY that
    column on the raw scan — ``cache()`` the frame before
    corrupt-only aggregations (Spark's documented workaround)."""
    if not keep_corrupt:
        return (
            spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
        )
    # fresh StructType: StructType.add MUTATES the receiver, which
    # would grow the shared module-level schema on every call
    full = T.StructType(list(schema.fields) + [T.StructField("_corrupt", T.StringType())])
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    """Partitioned parallel JSONL write (one file per partition)."""
    df.write.mode("overwrite").json(path)


def jsonl_to_parquet(
    spark: SparkSession, src: str, dst: str, schema: T.StructType = DOCUMENTS_SCHEMA
) -> int:
    """One-pass JSONL -> Parquet conversion; corrupt lines are
    dropped at the scan (DROPMALFORMED). Returns rows written."""
    docs = read_documents_jsonl(spark, src, schema)
    docs.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()
