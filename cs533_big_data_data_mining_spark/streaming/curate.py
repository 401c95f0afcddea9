"""Streaming document curation — the ingest-time half of the corpus
pipeline, unified batch/stream (Structured Streaming's one-API
property, like ``events.windowed_event_counts``).

At 100 TB, curation isn't a one-shot batch job: new crawl shards
arrive continuously, and the cheap per-document stages — quality
scoring, PII redaction, exact dedup — belong at ingest, so the
expensive batch stages (near-dup graph, closure) only ever see
already-thinned data. This module is that ingest stage:

    score (Column exprs) -> rule filter -> redact ->
    exact dedup on the redacted text (streaming:
    ``dropDuplicatesWithinWatermark`` — state O(keys/horizon))

Everything before the dedup is stateless (full pipelining, no
shuffle); the dedup is the only stateful operator and its state is
watermark-evicted. The SAME function runs on a batch frame (watermark
no-op, ``dropDuplicates``), which is what makes the stream checkable
against a batch twin (see ``__spark_entry__._q_curate_stream_eq``).

Batch/stream semantic note: batch ``exact_dedup`` keeps the MIN id
per text; streaming keeps the first-arrived row (state insertion
order). The invariant shared by both — and the one downstream
consumers may rely on — is the surviving TEXT SET, not the chosen
representative ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import (
    quality_score,
    redact_pii,
    word_shingles,
)


def curate_ingest(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    watermark: str = "1 hour",
    benchmark: DataFrame | None = None,
    bench_text_col: str | None = None,
    n_shingle: int = 5,
    bloom_fpp: float = 1e-4,
    url_col: str | None = None,
    blocked_domains: list[str] | None = None,
    keyword_weights: dict[str, float] | None = None,
    max_keyword_score: float = 1.0,
    repetition: bool = False,
    history: DataFrame | None = None,
    history_text_col: str | None = None,
    history_fpp: float = 1e-4,
    history_bloom=None,
    langid_model: DataFrame | None = None,
    langid_impl: str = "arrow",
) -> DataFrame:
    """``(id, ts, clean, quality)``: scored, filtered, redacted,
    exact-deduped documents. Works on a stream (watermark-bounded
    dedup state) and a batch frame (plain dropDuplicates) — one
    definition, two execution modes.

    ``url_col`` (+ ``blocked_domains`` / ``keyword_weights``) adds
    RefinedWeb stage ZERO at ingest time: the domain-blocklist
    suffix-intersection and weighted keyword score are pure Column
    expressions (``functions.url``, the LIST route only — zero joins,
    zero stream state), applied before anything else so blocked
    provenance never even reaches scoring. Semantics match the batch
    ``operators.quality.url_filter`` exactly (hostless rows pass both
    gates; ``kw_score >= max_keyword_score`` drops).

    ``langs`` (a tuple of lang_id codes) adds the language
    allowlist between the URL gate and the repetition gate — the
    batch ``curate_documents`` gate at ingest time, stateless.

    ``repetition=True`` adds the Gopher A1.2 repetition gate
    (:func:`~..operators.quality.gopher_repetition`) after the URL
    gate: since the round-9 rewrite every repetition signal is
    computed INSIDE the row (sorted unit streams, zero shuffle), so
    the whole bundle runs on a stream with ZERO state — the operator
    carries the non-text columns through and the failing docs are
    filtered before scoring, the published pipeline position.

    ``benchmark`` (a BATCH frame of held-out eval documents) adds
    ingest-time decontamination: a Bloom filter over the benchmark's
    word ``n_shingle``-grams is built once on the driver and probed
    as a STATELESS Column (``BloomFilter.might_contain_any``) — no
    explode/join/re-aggregate, so it streams with zero state. The
    filter is CONSERVATIVE: every document sharing a benchmark n-gram
    is dropped (no false negatives by Bloom construction), plus
    ~``bloom_fpp``-per-shingle innocents — the right trade at ingest,
    where the exact audit (``operators.decontaminate``) runs in the
    batch stage anyway and over-dropped docs cost nothing vs a leaked
    benchmark.

    ``history`` (a BATCH frame of already-admitted documents — or a
    prebuilt/loaded filter via ``history_bloom``) adds the Dolma
    admission gate at ingest: a Bloom over the history's exact
    content hashes, probed as a STATELESS Column, drops re-crawled
    documents the moment they arrive — zero stream state, the
    streaming twin of ``exact_dedup_bipartite_bloom(exact=False)``.
    Same conservative one-sided trade as the benchmark gate
    (~``history_fpp`` innocents dropped, duplicates never admitted);
    run the exact bipartite dedup in the batch stage where
    verification matters."""
    if (blocked_domains or keyword_weights) and url_col is None:
        raise ValueError("blocked_domains / keyword_weights need url_col")
    if url_col is not None:
        from cs533_big_data_data_mining_spark.functions.url import (
            host_blocked,
            url_host,
            url_keyword_score,
        )

        host = url_host(url_col)
        hostless = host.isNull() | (host == "")
        keep = hostless | (
            ~host_blocked(host, blocked_domains)
            & (url_keyword_score(url_col, keyword_weights) < F.lit(float(max_keyword_score)))
        )
        docs = docs.filter(keep)
    if langs:
        # language allowlist (the batch curate_documents gate).
        # Marker route by default; pass ``langid_model`` (a
        # ``langid_train`` / ``nb_train(grams="char")`` fit) to gate
        # with the TRAINED NB classifier instead — ``lang_id_nb`` is
        # stateless scoring under both impls (the bucket-bounded model
        # collects once at plan-build; zero shuffle, zero joins), so
        # it streams with zero state exactly like the marker route.
        if langid_model is not None:
            from cs533_big_data_data_mining_spark.operators.classify import lang_id_nb

            docs = docs.filter(
                lang_id_nb(langid_model, text_col, impl=langid_impl).isin(*langs)
            )
        else:
            from cs533_big_data_data_mining_spark.functions.text import lang_id

            docs = docs.filter(lang_id(text_col).isin(*langs))
    if repetition:
        from cs533_big_data_data_mining_spark.operators.quality import (
            gopher_repetition,
        )

        rest = [c for c in docs.columns if c != id_col]
        rep = gopher_repetition(docs, id_col, text_col, carry=tuple(rest))
        docs = rep.filter("keep").select(F.col("id").alias(id_col), *rest)
    if history is not None or history_bloom is not None:
        if history_bloom is None:
            from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

            hcol = history_text_col if history_text_col is not None else text_col
            seen = history.select(
                F.xxhash64(hcol).cast("string").alias("__h")
            ).distinct()
            history_bloom = bloom_build(seen, "__h", fpp=history_fpp)
        docs = docs.filter(
            ~history_bloom.might_contain(F.xxhash64(text_col).cast("string"))
        )
    scored = docs.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("ts"),
        redact_pii(text_col).alias("clean"),
        quality_score(text_col).alias("quality"),
        word_shingles(text_col, n_shingle).alias("__sh"),
    )
    if benchmark is not None:
        from cs533_big_data_data_mining_spark.operators.decontaminate import (
            benchmark_shingles,
        )
        from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

        bsh = benchmark_shingles(
            benchmark, bench_text_col if bench_text_col is not None else text_col, n_shingle
        )
        bloom = bloom_build(bsh, "shingle", fpp=bloom_fpp)
        scored = scored.filter(~bloom.might_contain_any("__sh"))
    scored = scored.drop("__sh")
    kept = scored.filter(F.col("quality") >= F.lit(float(min_quality)))
    if kept.isStreaming:
        return kept.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["clean"])
    return kept.dropDuplicates(["clean"])
