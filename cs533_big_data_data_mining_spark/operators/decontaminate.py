"""Benchmark decontamination for training-data pipelines.

Before pretraining, any document that shares verbatim word n-grams
with a held-out evaluation/benchmark set must be dropped — otherwise
the benchmark leaks into the training corpus (the standard "n-gram
overlap decontamination" from the GPT-3/PaLM appendices, public
methodology).

Scale shape (the part that matters at 100 TB): the benchmark side is
tiny relative to the corpus (millions of n-grams vs ~10^11 documents),
so its distinct shingle set is **broadcast** and the contamination
test is a broadcast semi-join inside the corpus scan — the corpus is
read exactly once, never shuffled on content. The per-doc hit count
is a map-side-combinable groupBy on the already-filtered (rare)
matches only.

No counterpart exists in the reference (it has no text surface,
SURVEY.md §2 checklist) — this is a Phase-E extension operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import word_shingles


def benchmark_shingles(bench: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct word n-grams of the benchmark set — the (small)
    broadcast side of the contamination join."""
    return (
        bench.select(F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def contamination_hits(
    docs: DataFrame, bench: DataFrame, id_col: str, text_col: str, n: int = 5
) -> DataFrame:
    """``(id, n_hits)``: per corpus document, how many of its DISTINCT
    word n-grams also occur in the benchmark set. Docs with zero hits
    are absent (join semantics); callers left-join + coalesce."""
    doc_sh = docs.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    hits = doc_sh.join(F.broadcast(benchmark_shingles(bench, text_col, n)), "shingle")
    return hits.groupBy("id").agg(F.count(F.lit(1)).alias("n_hits"))


def decontaminate_bloom(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 1,
    fpp: float = 0.01,
) -> DataFrame:
    """``decontaminate`` with a Bloom prefilter — EXACT same output
    (``(id, n_hits, keep)``), different scale envelope: when the
    benchmark's n-gram set is too large to broadcast as a hash set
    (10^9 n-grams ~ 100 GB) but fits as bits (~1.5 GB at 1 % fpp),
    the Bloom probe prunes ~all non-matching corpus shingles map-side
    and only the surviving ~fpp sliver takes the exact membership
    join (shuffle-sized by the CANDIDATES, not the corpus). No false
    negatives by Bloom construction, no false positives in the output
    because every Bloom hit is exactly verified.
    """
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    bsh = benchmark_shingles(bench, text_col, n).cache()
    n_bench = bsh.count()
    base = docs.select(F.col(id_col).alias("id"))
    if n_bench == 0:
        bsh.unpersist()
        return base.select(
            "id", F.lit(0).cast("long").alias("n_hits"), F.lit(True).alias("keep")
        )
    bloom = bloom_build(bsh, "shingle", n_items=n_bench, fpp=fpp)
    doc_sh = docs.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("shingle")
    )
    cand = doc_sh.filter(bloom.might_contain("shingle"))
    # exact verify on the bloom-surviving sliver only (plain equi-join:
    # AQE broadcasts it locally; at 10^9-n-gram scale it shuffles the
    # candidates — which the bloom already shrank — never the corpus)
    hits = (
        cand.join(bsh, "shingle").groupBy("id").agg(F.count(F.lit(1)).alias("n_hits")).cache()
    )
    # materialize only the per-CONTAMINATED-doc aggregate (small by
    # assumption) so the shingle cache can be released; the returned
    # corpus-sized frame stays LAZY and pipelines into the caller's
    # filter — never forced into executor storage here
    hits.count()
    bsh.unpersist()
    return base.join(hits, "id", "left").select(
        "id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (F.coalesce(F.col("n_hits"), F.lit(0)) < F.lit(int(min_overlap))).alias("keep"),
    )


def contamination_spans(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    bloom_fpp: float | None = None,
) -> DataFrame:
    """``(id, span_start, span_end, span_tokens)`` — the exact token
    regions of each corpus document that overlap the benchmark
    (maximal merged runs of benchmark-shared word ``n``-grams;
    0-based token indices, ``span_end`` exclusive). The span-level
    audit behind :func:`decontaminate`'s doc-level flag: WHERE the
    leak is, so near-miss documents can be reviewed (or surgically
    cropped) instead of dropped wholesale.

    Same scale shape as both parents: the benchmark shingle set
    broadcasts into a semi-join that only FLAGS positional grams
    (never self-joined — no pair blowup), and the span merge is the
    per-document gaps-and-islands window from
    ``dedup.duplicated_spans`` (state bounded by document length).

    ``bloom_fpp`` switches to the ``decontaminate_bloom`` envelope
    for benchmark gram sets too large to broadcast as a hash set: a
    Bloom probe prunes ~all non-matching positional grams map-side,
    and only the surviving sliver takes the exact membership join —
    output IDENTICAL to the broadcast path (every Bloom hit is
    exactly verified; no false negatives by construction).
    """
    from cs533_big_data_data_mining_spark.functions.text import word_ngrams
    from cs533_big_data_data_mining_spark.operators.dedup import _merge_flagged_spans

    nn = int(n)
    if nn < 1:
        raise ValueError("n must be >= 1")
    from cs533_big_data_data_mining_spark.operators.dedup import _spread

    grams = _spread(docs).select(
        F.col(id_col).alias("id"),
        F.posexplode(word_ngrams(text_col, nn)).alias("pos", "gram"),
    )
    bsh = benchmark_shingles(bench, text_col, nn).select(F.col("shingle").alias("gram"))
    if bloom_fpp is not None:
        from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

        bsh = bsh.cache()
        n_bench = bsh.count()
        if n_bench == 0:
            bsh.unpersist()
            return docs.sparkSession.createDataFrame(
                [], "id long, span_start long, span_end long, span_tokens long"
            )
        bloom = bloom_build(bsh, "gram", n_items=n_bench, fpp=float(bloom_fpp))
        cand = grams.filter(bloom.might_contain("gram"))
        flagged = cand.join(bsh, "gram", "left_semi").select("id", "pos")
        out = _merge_flagged_spans(flagged, nn)
        # materialize before releasing the exact-verify side's cache
        out = out.persist()
        out.count()
        bsh.unpersist()
        return out
    flagged = grams.join(F.broadcast(bsh), "gram", "left_semi").select("id", "pos")
    return _merge_flagged_spans(flagged, nn)


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_overlap: int = 1,
) -> DataFrame:
    """``(id, n_hits, keep)`` for EVERY corpus document: ``n_hits`` =
    shared distinct n-grams with the benchmark (0 when none, including
    null/short texts), ``keep`` = n_hits < min_overlap.

    The corpus survivors are ``filter(keep)``; the full frame is
    returned so audits can rank near-miss documents by ``n_hits``.
    """
    hits = contamination_hits(docs, bench, id_col, text_col, n)
    base = docs.select(F.col(id_col).alias("id"))
    return (
        base.join(hits, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) < F.lit(int(min_overlap))).alias("keep"),
        )
    )
