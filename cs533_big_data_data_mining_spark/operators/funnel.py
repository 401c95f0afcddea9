"""Funnel analysis — ordered event-sequence matching per user.

"How far did each user get through view -> click -> purchase?" is
the classic product-analytics query and a genuinely ordered
computation: step k counts only if it happens AFTER the event that
satisfied step k-1. Expressed here as ONE groupBy + a codegen'd
sequential fold over each user's time-sorted events — no self-joins
per step (the naive k-way join explodes combinatorially), no Python.

Scale shape: one shuffle on the user key; per-user event arrays are
session-scale (bounded); the fold is O(events) per user. For users
with unbounded histories, pre-filter to a time window first — the
fold composes with any upstream WHERE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """``(user_id, stage)``: the number of funnel ``steps`` each user
    completed IN ORDER (0 = never did step one, len(steps) = full
    conversion). Ties at the same timestamp resolve by ``order_col``
    (deterministic). Users appear once each.
    """
    n = len(steps)
    if n == 0:
        raise ValueError("steps must be non-empty")
    seq = events.groupBy(F.col(user_col).alias("user_id")).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"), F.col(order_col).alias("o"), F.col(type_col).alias("t")))
        ).alias("seq")
    )
    steps_arr = F.array(*[F.lit(s) for s in steps])
    stage = F.aggregate(
        "seq",
        F.lit(0),
        lambda acc, e: F.when(
            (acc < F.lit(n)) & (e["t"] == F.element_at(steps_arr, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return seq.select("user_id", stage.cast("long").alias("stage"))


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix — the other classic product-analytics
    query: users grouped by the period of their FIRST event, counted
    in every later period they remained active.
    ``(cohort_start, period_offset, n_active, cohort_size,
    retention)`` — ``cohort_start`` = the first DAY of the cohort's
    first period (anchored per cohort, not calendar-aligned),
    ``period_offset`` = whole ``period_days`` elapsed since that
    user's first event, ``retention`` = n_active / cohort_size
    rounded to 6 dp (offset 0 is 1.0 by construction).

    Scale shape: one map-side-combinable ``min`` groupBy per user
    (first event), one equi-join of events back to their user's
    cohort anchor (user-keyed shuffle; AQE handles hot users), one
    combinable count-distinct groupBy over (cohort, offset) — no
    windows, no self-joins, no per-period passes. Day arithmetic is
    integer (``datediff`` of dates), so period boundaries are
    engine-exact.
    """
    pd_ = int(period_days)
    if pd_ < 1:
        raise ValueError("period_days must be >= 1")
    ev = events.select(
        F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d")
    )
    first = ev.groupBy("u").agg(F.min("d").alias("d0"))
    joined = ev.join(first, "u")
    per_user_period = joined.select(
        "u",
        F.col("d0"),
        (F.datediff(F.col("d"), F.col("d0")) / F.lit(pd_)).cast("long").alias("off"),
    )
    active = (
        per_user_period.groupBy("d0", "off")
        .agg(F.count_distinct("u").alias("n_active"))
    )
    # cohort_size == n_active at offset 0 (every user's first event IS
    # an offset-0 event), so sizes come from the same aggregate — no
    # second scan/agg over the events
    sizes = active.filter(F.col("off") == 0).select(
        "d0", F.col("n_active").alias("cohort_size")
    )
    return (
        active.join(sizes, "d0")
        .select(
            F.col("d0").alias("cohort_start"),
            F.col("off").cast("long").alias("period_offset"),
            F.col("n_active").cast("long").alias("n_active"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
        )
    )
