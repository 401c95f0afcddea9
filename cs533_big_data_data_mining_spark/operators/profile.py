"""Data profiling — the quality gate a corpus passes before training.

``profile_numeric`` computes per-column statistics for a set of
numeric columns in ONE aggregate pass over the table (no per-column
jobs, no collect loops): row count, null count, exact distinct
count, min/max, and a DECIMAL-exact mean. Output is long-format
``(column, n, n_null, n_distinct, vmin, vmax, vmean)`` — one row per
column — so downstream expectation checks are plain filters.

Scale shape: a single wide aggregate (every statistic is
map-side-combinable except count(DISTINCT), which Spark expands to
one extra shuffle per distinct-column; pass ``approx_distinct=True``
to use HLL++ and keep the pass fully combinable at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Data-quality expectations in ONE pass: ``rules`` maps a rule
    name to a boolean Column that should hold for every row; returns
    ``(rule, n_violations, ok)`` per rule, counting rows where the
    predicate is false OR null (a null check result is a violation —
    unknown is not acceptable).

    All conditional-count aggregates — one map-side-combinable job
    regardless of rule count; gate a 100 TB ingest on
    ``filter("NOT ok").count() == 0`` without rescanning per rule.
    """
    aggs = [
        F.sum(F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)).alias(f"__v_{i}")
        for i, (name, pred) in enumerate(sorted(rules.items()))
    ]
    row = df.agg(*aggs) if aggs else df.sparkSession.range(1).agg(F.lit(0).alias("__z"))
    per_rule = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col(f"__v_{i}").cast("long").alias("n_violations"),
            (F.col(f"__v_{i}") == 0).alias("ok"),
        )
        for i, (name, pred) in enumerate(sorted(rules.items()))
    ]
    if not per_rule:
        return df.sparkSession.createDataFrame([], "rule string, n_violations long, ok boolean")
    return row.select(F.explode(F.array(*per_rule)).alias("s")).select("s.*")


def profile_numeric(
    df: DataFrame, cols: list[str], approx_distinct: bool = False
) -> DataFrame:
    """One row per column: ``(column, n, n_null, n_distinct, vmin,
    vmax, vmean)``. ``vmean`` sums as DECIMAL(27,6) then divides in
    float64 (order-independent, oracle-reproducible, rounded 6dp).
    ``approx_distinct`` swaps exact count(DISTINCT) for HLL++."""
    if not cols:
        return df.sparkSession.createDataFrame(
            [],
            "column string, n long, n_null long, n_distinct long, "
            "vmin double, vmax double, vmean double",
        )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        nd = (
            F.approx_count_distinct(c).alias(f"__nd_{c}")
            if approx_distinct
            else F.countDistinct(col).alias(f"__nd_{c}")
        )
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd,
            F.min(col).cast("double").alias(f"__mn_{c}"),
            F.max(col).cast("double").alias(f"__mx_{c}"),
            F.sum(col.cast("decimal(27,6)")).alias(f"__sm_{c}"),
        ]
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n"),
            F.col(f"__nn_{c}").cast("long").alias("n_null"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("vmin"),
            F.col(f"__mx_{c}").alias("vmax"),
            F.when(
                F.col("__n") - F.col(f"__nn_{c}") > 0,
                F.round(
                    F.col(f"__sm_{c}").cast("double")
                    / (F.col("__n") - F.col(f"__nn_{c}")).cast("double"),
                    6,
                ),
            ).alias("vmean"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")
