"""Sessionization — gap-based user sessions over the events stream.

Two implementations of one semantic (sessions split when consecutive
events of a user are more than ``gap`` apart):

* ``sessionize`` — batch gaps-and-islands: lag + running sum of
  session-break flags + groupBy. All JVM window functions (one
  shuffle on user_id, whole-stage codegen), and directly
  SQL-expressible, so the DuckDB oracle checks it row-for-row.
* ``sessionize_stream`` — the custom stateful streaming operator
  (``applyInPandasWithState``): per-user state holds the open
  session; closed sessions emit as the watermark passes their gap
  horizon. This is the operator shape Structured Streaming cannot
  express with windowed aggs (session windows keyed by data-driven
  gaps, arbitrary per-session accumulators).

Determinism: events sort by (ts, event_id) within a user; the gap
test compares integer microseconds on both engines, so the session
boundaries are bit-exact against the oracle.

Scale: state per key is O(1) (one open session), keys shard across
executors by the groupBy hash, and the watermark bounds total state;
the batch form shuffles each user's events once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gap_us(gap: str) -> int:
    qty, unit = gap.split()
    mult = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }[unit]
    return int(qty) * mult


def sessionize(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Batch sessionization: one row per (user_id, session).

    Output: ``(user_id, session_start, session_end, n_events,
    value_sum)``. A session breaks when the microsecond delta to the
    previous event exceeds ``gap`` (strictly greater).
    """
    gus = _gap_us(gap)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.select(
        "user_id", "ts", "value", "event_id",
        F.when(
            (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))) > F.lit(gus), 1
        ).otherwise(0).alias("brk"),
    )
    sess = flagged.withColumn(
        "sid", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_sum"),
    ).drop("sid")


def sessionize_oracle_sql(gap: str = "30 minutes") -> str:
    """The DuckDB twin of ``sessionize`` (same integer-microsecond gap
    test, same (ts, event_id) ordering)."""
    gus = _gap_us(gap)
    return f"""
        WITH flagged AS (
          SELECT user_id, ts, value, event_id,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gus}
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts, value, event_id,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) AS session_end,
               count(*) AS n_events,
               CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
        FROM sess GROUP BY user_id, sid
    """


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization via ``applyInPandasWithState``.

    Per-user ``GroupState`` = the open session ``(start_us, last_us,
    n_events, value_sum)``. Each micro-batch folds its (sorted)
    events into the state, emitting every session closed by an
    in-batch gap; the event-time timeout (open session's last event
    + gap) fires once the watermark passes it and emits the
    remaining session. Late events beyond the watermark are dropped
    by the engine before reaching the function.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gus = _gap_us(gap)
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events long, value_sum double"
    )
    # per-user state = DISJOINT session fragments (parallel arrays,
    # ascending, fragments > gap apart). Out-of-order events within
    # the allowed lateness may open a fragment between two existing
    # ones or merge them — a single "open session" scalar cannot
    # express that. A fragment is final (emitted) once the watermark
    # passes fragment_end + gap: any still-admissible event has
    # ts >= watermark > end + gap, so it can never extend or merge
    # that fragment. State size is bounded by the watermark horizon.
    state_schema = "starts array<long>, ends array<long>, ns array<long>, sums array<double>"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        frags: list[list] = []
        if state.exists:
            s0, e0, n0, v0 = state.get
            frags = [[int(s), int(e), int(n), float(v)] for s, e, n, v in zip(s0, e0, n0, v0)]

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs), ignore_index=True)
            if len(rows):
                rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
                ts_us = (
                    pd.to_datetime(rows["ts"]).astype("datetime64[ns]").astype("int64") // 1000
                ).to_numpy()
                vals = rows["value"].to_numpy()
                frags.extend([int(t), int(t), 1, float(v)] for t, v in zip(ts_us, vals))
                frags.sort(key=lambda f: (f[0], f[1]))
                merged: list[list] = []
                for f in frags:
                    if merged and f[0] - merged[-1][1] <= gus:
                        merged[-1][1] = max(merged[-1][1], f[1])
                        merged[-1][2] += f[2]
                        merged[-1][3] += f[3]
                    else:
                        merged.append(f)
                frags = merged

        wm_us = state.getCurrentWatermarkMs() * 1000
        closed = [f for f in frags if f[1] + gus < wm_us]
        frags = [f for f in frags if f[1] + gus >= wm_us]

        if frags:
            state.update(
                (
                    [f[0] for f in frags],
                    [f[1] for f in frags],
                    [f[2] for f in frags],
                    [f[3] for f in frags],
                )
            )
            next_fire = min(f[1] for f in frags) + gus
            state.setTimeoutTimestamp(
                max(next_fire // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                [
                    (
                        user_id,
                        pd.Timestamp(f[0], unit="us"),
                        pd.Timestamp(f[1], unit="us"),
                        f[2],
                        f[3],
                    )
                    for f in closed
                ],
                columns=["user_id", "session_start", "session_end", "n_events", "value_sum"],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )
