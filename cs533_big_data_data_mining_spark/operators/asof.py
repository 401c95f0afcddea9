"""As-of (point-in-time) join.

For each left row, attach the most recent right row with the same key
whose timestamp is at-or-before the left row's — the standard
time-series enrichment join (market data, feature stores, "state as
of event time"). Spark has no built-in ASOF JOIN; the idiomatic
distributed shape is the **union + running last_value** trick:

    union(tag right rows 0, left rows 1)
      -> window PARTITION BY key
                ORDER BY (ts, tag, order_col)
                ROWS UNBOUNDED PRECEDING..CURRENT
      -> last(right payload, ignorenulls) carries the newest
         at-or-before right row onto every left row
      -> filter tag = 1

One shuffle on the key, no range-join blowup, no per-key driver work:
the cost is a single sort within each key partition — exactly what a
merge-join-based ASOF does, but expressed with operators Catalyst
already knows how to distribute. Equal timestamps: right rows sort
BEFORE left rows (tag order), so a same-instant right row is visible
("at or before" is inclusive); ties among right rows resolve to the
largest ``order_col`` (deterministic).

No counterpart in the reference (no relational surface, SURVEY.md
§2); Phase-E extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    payload_cols: list[str],
    prefix: str = "r_",
    tolerance: str | None = None,
) -> DataFrame:
    """Left rows + columns ``{prefix}{payload_col}`` from the matched
    right row (null when no right row precedes). ``order_col`` breaks
    ties among right rows at the same timestamp (largest wins).

    ``tolerance`` (e.g. ``"1 hour"``): maximum age of the match — a
    right row older than ``left.ts - tolerance`` yields null payloads
    instead (standard ASOF tolerance semantics). Applied AFTER the
    running last_value, as a pure Column guard on the carried match
    timestamp — no change to the shuffle shape.
    """
    lcols = left.columns
    # payloads ride in ONE struct (non-null exactly for right rows):
    # a single last(ignorenulls) then guarantees every carried field
    # comes from the SAME matched right row, even when some payload
    # fields are themselves null
    # the matched row's own ts rides along for the tolerance guard
    pay_struct = F.struct(
        *[F.col(c).alias(c) for c in payload_cols], F.col(ts_col).alias("__mts")
    )
    r = right.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(order_col).alias("__ord"),
        pay_struct.alias("__pay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
    )
    null_struct = F.lit(None).cast(
        "struct<"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload_cols)
        + f",__mts:{right.schema[ts_col].dataType.simpleString()}>"
    )
    l = left.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.col(order_col).alias("__ord"),
        null_struct.alias("__pay"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
    )
    u = r.unionByName(l)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__tag",
        "__ts",
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        F.last(F.col("__pay"), ignorenulls=True).over(w).alias("__m"),
    )
    if tolerance is not None:
        fresh = F.col("__m.__mts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        carried = carried.withColumn("__m", F.when(fresh, F.col("__m")))
    return carried.filter(F.col("__tag") == 1).select(
        *lcols, *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in payload_cols]
    )
