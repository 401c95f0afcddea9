"""Scale-join toolkit: skew salting and bucketed (shuffle-free) joins.

Two standard 100 TB join techniques as reusable helpers (public
Spark patterns; SURVEY §7 Phase C "salting for dense cells" /
"co-located joins via bucketing"):

* **Salted join** — when one join key carries a disproportionate
  share of the large side's rows, the task holding that key becomes
  the straggler. AQE's skew-join splitting fixes *partition-level*
  skew but cannot split a single key's hash bucket across the
  matching build side. Salting does: the large side scatters each
  row into ``salt`` sub-keys; the small side replicates each row
  ``salt`` times (one per sub-key). Join output is row-identical to
  the unsalted join; the hot key's work is now spread over ``salt``
  tasks at the cost of a ``salt``-times-larger small side.

* **Bucketed tables** — pre-shuffling both sides of a recurring join
  into the same bucket layout (``bucketBy`` on the join key) lets
  every future join plan as bucket-to-bucket with NO exchange on
  either side — the shuffle is paid once at write time. This is the
  "co-located join" that makes daily-joined 100 TB fact tables
  affordable; the plan-shape test pins exchange-free execution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    salt: int = 8,
    how: str = "inner",
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Join ``large`` with ``small`` on ``on`` with key salting.

    The large side's salt is a deterministic hash of ``salt_cols``
    (default: the whole row) — spread, not semantics, so collisions
    are harmless for correctness. CAVEAT: rows that are identical on
    the salt columns land in the SAME salt bucket, so a large side
    dominated by duplicate rows silently degrades back to single-task
    skew; pass a high-cardinality column list (a unique row id is
    ideal) via ``salt_cols`` when duplicates are possible. The small
    side explodes to every salt value. Result rows and columns equal
    the plain ``large.join(small, on, how)``. Supported ``how``:
    inner and left (the shapes where the large side drives the
    output).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    sc = salt_cols if salt_cols is not None else large.columns
    l = large.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in sc]), F.lit(int(salt))).cast("int"),
    )
    s = small.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(int(salt) - 1))))
    return l.join(s, [*keys, "__salt"], how).drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int, sort: bool = True
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table:
    the one-time shuffle that makes every later equi-join on ``key``
    exchange-free (and sort-free when sorted)."""
    w = df.write.mode("overwrite").bucketBy(int(buckets), key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    matching bucket counts Spark plans a bucket-to-bucket sort-merge
    join with no Exchange on either side (pinned by
    ``tests/test_pipeline_ops.py``)."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, key, how)
