"""End-to-end corpus curation — the canonical pretraining-data
pipeline, composed from this engine's own operators:

    quality score + language id        (functions/text, Column exprs)
    -> rule filter                     (pushdown-friendly WHERE)
    -> exact dedup                     (min-id keeper per content)
    -> near-dup dedup                  (shingle-Jaccard pairs
                                        -> connected components
                                        -> min-id survivor per group)

The reference has nothing like this (it is a clustering engine); this
is the Phase-E north-star composition (SURVEY §7) that makes the
ε-join / CC machinery useful for 100 TB document corpora. Every stage
reuses an already-oracle-checked operator, and the whole pipeline has
an exact DuckDB twin (recursive-CTE closure over the near-dup pair
graph, mirroring the DBSCAN labels oracle).

Scale shape: two text scans (score+filter fused into one, shingling
one), the shingle-index self-join from ``ngram_jaccard_pairs``
(inverted-index bucketed, never all-pairs), and a CC fixpoint whose
edge count is the number of near-dup pairs — tiny relative to the
corpus. Survivor selection is a min-aggregate + anti-join, both
map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import lang_id, quality_score
from cs533_big_data_data_mining_spark.operators.connected_components import (
    connected_components,
)
from cs533_big_data_data_mining_spark.operators.dedup import (
    exact_dedup,
    ngram_jaccard_pairs,
)
from cs533_big_data_data_mining_spark.operators.similarity import (
    embedding_neardup_pairs,
)


def curate_plan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
) -> tuple[DataFrame, list[DataFrame]]:
    """The UNmaterialized curation pipeline: ``(survivors, cached)``.

    ``survivors`` is the lazy result frame — audit it with
    ``plans.audit`` or compose it further; ``cached`` lists the
    internally cache-registered frames the caller must unpersist once
    done. ``curate_documents`` is the materializing wrapper."""
    uniq = _score_filter_dedup(docs, id_col, text_col, min_quality, langs)

    # the shingle join inherits ngram_jaccard_pairs' PPJoin prefix
    # filter, so hot boilerplate shingles cannot blow up candidate
    # counts; its internal index cache lands in `caches` for release
    caches: list = []
    pairs = ngram_jaccard_pairs(
        uniq, "id", "text", n=ngram, threshold=jaccard_threshold, caches=caches
    )
    # materialize the (expensive) pair join ONCE: the CC fastpath gate
    # counts the edges and the driver/distributed union reads them
    # again — without the cache the whole shingle self-join re-executes
    # per consumer (measured 2x ~4 s at sf0.1)
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).cache()
    caches.append(edges)
    comp = connected_components(edges, edge_count_hint=edges.count())
    # one survivor (min id == the component label, by the min-label
    # convention) per near-dup group; every non-survivor is dropped
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("id")
    )
    survivors = uniq.join(losers, "id", "left_anti").select("id", "lang_guess", "quality")
    return survivors, [uniq, *caches]


def _score_filter_dedup(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float,
    langs: tuple[str, ...] | None,
) -> DataFrame:
    """Shared curation front half: fused score scan -> rule filter ->
    exact dedup. Returns the CACHED deduped frame (id, text,
    lang_guess, quality) — uniq feeds both the near-dup join(s) and
    the final survivor anti-join; without the cache the text scan +
    scoring + dedup join execute twice. MEMORY_AND_DISK (the default)
    spills the text column rather than evicting it, so at corpus
    scale this is one local-disk write, not an OOM. Callers own the
    unpersist."""
    scored = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        lang_id(text_col).alias("lang_guess"),
        quality_score(text_col).alias("quality"),
    )
    kept = scored.filter(F.col("quality") >= F.lit(float(min_quality)))
    if langs is not None:
        kept = kept.filter(F.col("lang_guess").isin(list(langs)))
    return exact_dedup(kept, "id", "text").cache()


def curate_corpus(
    docs: DataFrame,
    embs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
    cosine_threshold: float = 0.35,
    max_block_pairs: int | None = 10_000,
) -> DataFrame:
    """Cross-modal corpus curation — the full pretraining-data shape:
    documents carry text AND an embedding row (joined on id). Quality/
    language filter -> exact dedup -> near-dup graph = UNION of
    lexical (shingle-Jaccard) and semantic (embedding-cosine) pair
    sets over the surviving docs -> one transitive closure -> min-id
    survivor per component. A pair connected through EITHER modality
    (or a chain alternating between them) collapses to one survivor.

    Scale shape: every stage is an already-oracle-checked operator;
    the two pair generators are both bucketed (PPJoin prefix index;
    block-gram / banded LSH), the CC edge count is the near-dup pair
    count, and the embedding side is semi-join-restricted to docs
    that survived the O(N) stages first. Materialized on return
    (caller-owned cache), intermediates released.
    """
    uniq = _score_filter_dedup(docs, id_col, text_col, min_quality, langs)
    caches: list = [uniq]
    jpairs = ngram_jaccard_pairs(
        uniq, "id", "text", n=ngram, threshold=jaccard_threshold, caches=caches
    )
    embk = embs.select(F.col(vec_id_col).alias("id"), F.col(vec_col).alias("vec")).join(
        uniq.select("id"), "id", "left_semi"
    )
    cpairs = embedding_neardup_pairs(
        embk, cosine_threshold, id_col="id", vec_col="vec", max_block_pairs=max_block_pairs
    )
    # one materialization of the union of both pair joins: CC's gate
    # count and the union pass both read the cache instead of
    # re-running the shingle and block-gram joins
    edges = (
        jpairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(cpairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
        .cache()
    )
    caches.append(edges)
    comp = connected_components(edges, edge_count_hint=edges.count())
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("id")
    )
    survivors = (
        uniq.join(losers, "id", "left_anti")
        .select("id", "lang_guess", "quality")
        .persist()
    )
    survivors.count()
    for frame in caches:
        frame.unpersist()
    return survivors


def curate_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    max_block_pairs: int | None = 10_000,
) -> DataFrame:
    """Embedding-space near-dup curation: surviving ``(id)`` rows after
    dropping all but the minimum id of every cosine-similarity
    connected component — the semantic-dedup twin of
    ``curate_documents`` (same transitive-closure semantics: if A~B
    and B~C, one survivor of {A,B,C} even when A!~C).

    Composition: ``embedding_neardup_pairs`` (exact block-gram, or
    banded hyperplane LSH past the ``max_block_pairs`` gate) →
    connected components → min-id anti-join. The pair join is
    materialized once for CC (cache released before returning — CC's
    output doesn't reference it: the fastpath result is driver-built,
    the distributed path reads its own checkpoint); the final
    anti-join stays lazy.
    """
    pairs = embedding_neardup_pairs(
        emb, threshold, id_col=id_col, vec_col=vec_col, max_block_pairs=max_block_pairs
    )
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")).cache()
    comp = connected_components(edges, edge_count_hint=edges.count())
    edges.unpersist()
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("id")
    )
    return emb.select(F.col(id_col).alias("id")).join(losers, "id", "left_anti")


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    langs: tuple[str, ...] | None = None,
    ngram: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Surviving documents ``(id, lang_guess, quality)`` after the full
    curation pipeline. Deterministic: the survivor of every duplicate
    group (exact or near) is the minimum id, so output is independent
    of partitioning and arrival order.

    Near-dup groups are the connected components of the Jaccard-pair
    graph (threshold ``jaccard_threshold``): if A~B and B~C, only one
    of {A,B,C} survives even when A~C itself is below threshold —
    the same transitive-closure semantics cluster labeling uses.

    The result is **materialized** (cached + counted; caller-owned
    cache, same contract as ``dbscan``): every intermediate cache —
    the deduped text frame and the shingle index — is released before
    returning, so repeated calls don't stack executor storage. Use
    ``curate_plan`` for the lazy, auditable form.
    """
    survivors, cached = curate_plan(
        docs,
        id_col=id_col,
        text_col=text_col,
        min_quality=min_quality,
        langs=langs,
        ngram=ngram,
        jaccard_threshold=jaccard_threshold,
    )
    survivors = survivors.persist()
    survivors.count()
    for frame in cached:
        frame.unpersist()
    return survivors
