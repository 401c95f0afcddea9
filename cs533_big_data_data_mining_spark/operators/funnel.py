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
