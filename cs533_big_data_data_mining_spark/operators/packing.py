"""Sequence-packing planner for LLM pretraining shards.

Training consumes fixed-length token sequences; the standard recipe
concatenates documents in a canonical order and chunks the stream
every ``seq_len`` tokens (document boundaries may fall mid-sequence).
This operator computes, per document, its **global token offset** and
the first/last sequence bin it lands in — the shard-planning metadata
a 100 TB tokenize-and-pack job needs before writing a single shard.

The core is a distributed prefix sum (the reference's
Allgather+prefix-sum shape, SURVEY §2 op 12) with a determinism
constraint Spark's own range partitioner cannot give: the
per-bucket totals job and the per-row numbering job must see THE SAME
row->bucket assignment. ``repartitionByRange`` re-samples per query
execution, so two jobs over it can disagree (measured at 3M rows:
identical totals, different per-partition splits — silently wrong
offsets). Instead the bucket id is **computed from the data**:
equi-depth range bounds from one Greenwald-Khanna pass are embedded
as literals, every job derives ``_pid`` by comparing the id against
those constants, and no job depends on physical partition identity.
Per-bucket running sums use a window keyed on ``_pid`` (parallel
across buckets — NO single-partition window); bucket totals
prefix-sum on the driver (#buckets rows) and broadcast back.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import subword_count


def _range_bucket_expr(col: str, bounds: list) -> Column:
    """0-based equi-depth bucket of ``col`` given sorted distinct
    bound literals: ``sum(col > bound_j)`` — O(#buckets) codegen'd
    comparisons, a pure function of the VALUE (deterministic across
    jobs, unlike physical partition ids)."""
    pid = F.lit(0)
    for b in bounds:
        pid = pid + (F.col(col) > F.lit(b)).cast("int")
    return pid


def pack_sequences(
    df: DataFrame,
    id_col: str,
    seq_len: int,
    count_expr: Column | None = None,
    n_buckets: int | None = None,
) -> DataFrame:
    """``(id, n_tokens, start_offset, bin_start, bin_end)`` per doc:
    ``start_offset`` = total tokens of all ids before it (id order),
    ``bin_*`` = first/last ``seq_len``-sized sequence the doc touches
    (empty docs occupy zero bins; both fields point at the bin their
    offset falls in). ``id_col`` must be numeric (bucket bounds come
    from a quantile sketch).

    ``count_expr`` defaults to the BPE-ish ``subword_count`` over a
    ``text`` column; pass an expression for pre-tokenized inputs.
    """
    cnt = count_expr if count_expr is not None else subword_count("text")
    base = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(cnt.cast("long"), F.lit(0)).alias("n_tokens"),
    )
    nb = n_buckets or df.sparkSession.sparkContext.defaultParallelism
    # ONE quantile pass -> bounds as literals. Both downstream jobs
    # (totals, numbering) recompute the bucket from the value against
    # these constants — structurally immune to re-sampled exchanges.
    qs = [i / nb for i in range(1, nb)]
    bounds = sorted(set(base.stat.approxQuantile("id", qs, 0.001))) if nb > 1 else []
    withpid = base.withColumn("_pid", _range_bucket_expr("id", bounds))

    totals = {
        int(r["_pid"]): int(r["s"])
        for r in withpid.groupBy("_pid")
        .agg(F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("s"))
        .collect()
    }
    offsets, acc = [], 0
    for pid in sorted(totals):
        offsets.append((pid, acc))
        acc += totals[pid]
    off = F.broadcast(
        withpid.sparkSession.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    start = (local_before + F.col("_off")).alias("start_offset")
    out = withpid.join(off, "_pid").select("id", "n_tokens", start)
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
