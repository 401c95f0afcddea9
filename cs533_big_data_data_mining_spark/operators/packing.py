"""Sequence-packing planner for LLM pretraining shards.

Training consumes fixed-length token sequences; the standard recipe
concatenates documents in a canonical order and chunks the stream
every ``seq_len`` tokens (document boundaries may fall mid-sequence).
This operator computes, per document, its **global token offset** and
the first/last sequence bin it lands in — the shard-planning metadata
a 100 TB tokenize-and-pack job needs before writing a single shard.

The core is a distributed prefix sum, the same shape as
``dbscan.dense_index`` (SURVEY §2 op 12's Allgather+prefix-sum,
re-expressed): range-repartition by id (ascending partition ranges =
global order), per-partition running totals via a window keyed on the
partition id (parallel across partitions — NO single-partition
window), one tiny per-partition-totals collect, driver prefix-sum,
broadcast the offsets back. No stage funnels all rows through one
task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import subword_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    seq_len: int,
    count_expr: Column | None = None,
) -> DataFrame:
    """``(id, n_tokens, start_offset, bin_start, bin_end)`` per doc:
    ``start_offset`` = total tokens of all ids before it (id order),
    ``bin_*`` = first/last ``seq_len``-sized sequence the doc touches
    (empty docs occupy zero bins; both fields point at the bin their
    offset falls in).

    ``count_expr`` defaults to the BPE-ish ``subword_count`` over a
    ``text`` column; pass an expression for pre-tokenized inputs.
    """
    cnt = count_expr if count_expr is not None else subword_count("text")
    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(cnt.cast("long"), F.lit(0)).alias("n_tokens"),
    )
    # ascending partition ranges + in-partition window order = global
    # order; the totals job and the stamping job read ONE range
    # exchange (deterministic sampler — same invariant dense_index
    # relies on, see operators/dbscan.py:144)
    parts = base.repartitionByRange("id").withColumn("_pid", F.spark_partition_id())
    totals = {
        int(r["_pid"]): int(r["s"])
        for r in parts.groupBy("_pid").agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("s")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off = F.broadcast(
        parts.sparkSession.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    start = (local_before + F.col("_off")).alias("start_offset")
    out = parts.join(off, "_pid").select("id", "n_tokens", start)
    # integer division: exact at any offset magnitude (a double-based
    # floor(x/len) loses ulps past 2^53 total tokens)
    sl = int(seq_len)
    return out.select(
        "id",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset div {sl}").alias("bin_start"),
        F.expr(f"(start_offset + greatest(n_tokens - 1, 0L)) div {sl}").alias("bin_end"),
    )
