"""Deduplication operators for training-data pipelines.

Five strategies, all pure DataFrame compositions (one shuffle per
groupBy/join, no Python in the hot path):

* **exact**: hash-groupBy on content — the O(N) baseline.
* **n-gram Jaccard**: exact set-similarity self-join via shingle
  inverted index — the ground truth the approximate methods are
  tested against.
* **MinHash + LSH**: signature = min of seeded xxhash64 over
  shingles; banding turns near-dup search into an equi-join on
  (band, band-hash) — the 100 TB scale path.
* **SimHash**: 64-bit weighted bit-vote fingerprint; candidates via
  band equality (Hamming-adjacent pairs share a band whp).
* **embedding cosine**: semantic near-dups over the embedding column
  (see ``operators/similarity.py`` for the join machinery).

Scale notes: the shingle inverted index is the classic skew hazard —
ultra-frequent shingles create quadratic bucket blowup. ``max_doc_freq``
drops them (a standard trick: a shingle shared by thousands of docs
carries no near-dup signal). LSH band joins shuffle only
(band_id, hash) keys, so AQE's skew-join splitting handles hot
buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import (
    token_count,
    tokenize,
    word_ngrams,
    word_shingles,
)


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """One row per distinct content: ``(keep_id = min id, n_dups)``."""
    return df.groupBy(content_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    ).select("keep_id", "n_dups")


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Deduplicated rows (keeper = min id per content). Expressed as a
    min-id semi-join rather than a window sort: the groupBy gets
    map-side partial aggregation, a window over content would not.

    PRECONDITION: ``id_col`` must be unique across rows. The
    semi-join key is the **id alone** — valid because each keeper id
    identifies exactly one row, so joining back on the narrow id
    column selects one row per distinct content without shuffling the
    wide content column a second time. With duplicate ids, any row
    sharing a keeper's id would survive regardless of its content;
    keep the null-safe ``(content, id)`` join conjunct for inputs
    where uniqueness is not guaranteed. NULL content forms its own
    group (groupBy semantics), so null-content rows keep their min-id
    representative too."""
    keepers = df.groupBy(content_col).agg(F.min(id_col).alias(id_col)).select(id_col)
    return df.join(keepers, id_col, "left_semi")


def exact_dedup_bipartite(
    new: DataFrame,
    history: DataFrame,
    id_col: str,
    content_col: str,
    history_content_col: str | None = None,
) -> DataFrame:
    """Incremental :func:`exact_dedup`: FULL rows of the NEW shard
    (all original columns — source, url, metadata survive, same
    contract as :func:`exact_dedup`) whose content hash is neither
    already admitted in HISTORY nor claimed by a smaller id within
    the shard — the daily-ingest twin completing the family
    (minhash/spans/url all have one). History contributes only its
    DISTINCT xxhash64 set: the anti-join build side is
    #distinct-contents of 8-byte keys, the historical TEXT is never
    shuffled, and at petabyte history the hash set can be persisted
    once per ingest instead of recomputed. 64-bit hash semantics: a
    cross-shard collision (expected ~1 pair per 5e9 distinct docs)
    drops a non-duplicate — the standard trade every production
    content-hash dedup makes; use the full ``(content, id)`` join of
    :func:`exact_dedup` where exactness beats the shuffle width.
    """
    hcol = history_content_col if history_content_col is not None else content_col
    base = new.select(F.col(id_col).alias("__id"), F.xxhash64(content_col).alias("__h"))
    seen = history.select(F.xxhash64(hcol).alias("__h")).distinct()
    fresh = base.join(seen, "__h", "left_anti")
    # keeper ids are unique (id_col precondition, as in exact_dedup),
    # so the narrow-id semi-join returns each surviving row once with
    # every original column intact
    keepers = fresh.groupBy("__h").agg(F.min("__id").alias(id_col)).select(id_col)
    return new.join(keepers, id_col, "left_semi")


def bipartite_survivors(
    new_ids: DataFrame,
    new_new_pairs: DataFrame,
    new_hist_pairs: DataFrame,
) -> DataFrame:
    """Shared survivor rule for every incremental NEAR-dup flow
    (MinHash, SemDeDup, ...): given the new shard's ids and the two
    pair classes a finder produced — ``new_new_pairs`` ``(a, b)``
    with both ends new, ``new_hist_pairs`` ``(a, b)`` with ``a`` new
    and ``b`` history — return the ``(id)`` rows of the new shard
    that survive under *history always wins*: a new doc is dropped
    iff its transitive component (over the union pair graph) touches
    ANY history doc, or it is not the minimum-id new member of a
    history-free component. Matches :func:`exact_dedup_bipartite`
    semantics at the near-dup level; ``semdedup_bipartite`` is this
    rule over its pair generator. Ids must be integral and disjoint
    across the two corpora (the bipartite convention). Returns a lazy
    frame — pair inputs are small (near-dup-sized); persist them
    yourself if the finder was expensive.
    """
    from cs533_big_data_data_mining_spark.operators.connected_components import (
        connected_components,
    )

    nn = new_new_pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    nh = new_hist_pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    edges = nn.union(nh)
    comp = connected_components(edges)
    hist_comps = (
        comp.join(new_hist_pairs.select(F.col("b").alias("node")).distinct(), "node")
        .select("component")
        .distinct()
    )
    ids = new_ids.select(F.col(new_ids.columns[0]).alias("id"))
    in_graph = comp.select(F.col("node").alias("id"), "component").join(ids, "id")
    dropped = (
        in_graph.join(hist_comps, "component", "left_semi")
        .select("id")
        .union(
            # history-free component: every member is new, so the
            # min-label IS the min new id — survivor = label node
            in_graph.join(hist_comps, "component", "left_anti")
            .filter(F.col("id") != F.col("component"))
            .select("id")
        )
    )
    return ids.join(dropped, "id", "left_anti")


def _url_keeper_window() -> Window:
    """THE min-id keeper window of the URL-dedup family: partitioned
    by the normalized key plus a NULL-salt — ``id`` when ``url_norm``
    is NULL, a constant otherwise. Real URLs group exactly as a plain
    ``partitionBy(url_norm)`` (the salt is constant there); NULL-url
    rows each form their OWN single-row group instead of all hashing
    into one partition. They were always kept (the exemption filter's
    ``isNull`` disjunct), but a corpus with a large no-provenance
    fraction previously shuffled every such row to ONE task — a
    guaranteed straggler at scale (guide §2.5 "hot keys: handle nulls
    separately"). Values are identical: the NULL group's min is never
    consulted. Still one Exchange (hash on two exprs)."""
    return Window.partitionBy(
        "url_norm",
        F.when(F.col("url_norm").isNull(), F.col("id")).otherwise(F.lit(0)),
    )


def url_dedup(
    df: DataFrame,
    id_col: str,
    url_col: str,
    normalize: bool = True,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """URL-level exact dedup — stage ONE of the RefinedWeb/CommonCrawl
    curation recipe (Penedo et al. 2023 §3.1: re-crawls of the same
    page are removed by URL before any content-based dedup runs,
    because the groupBy key here is a short string, not shingle
    sets). Returns ``(id, url_norm)`` for survivors (keeper = min id
    per normalized URL). ``carry`` names payload columns to pass
    through unchanged (``(id, url_norm, *carry)``): the window keeper
    carries them for free, so a pipeline can gate on the result
    directly instead of semi-joining survivor ids back to its input —
    one evaluation of the upstream stage instead of two (the
    ``gopher_rules(carry=...)`` pattern; guide §2.4).

    ``normalize=True`` canonicalizes via
    :func:`~cs533_big_data_data_mining_spark.functions.url.normalize_url`
    (case, ``www.``, tracking params, fragments, trailing slash) so
    crawl-variant URLs collapse; the normalizer is a pure Column that
    fuses into the scan, so the whole operator is ONE exchange on the
    normalized key with a partition-window min picking the keeper —
    the key is bytes instead of documents, and no second pass or
    join re-reads the input. NULL urls are EXEMPT (all kept): a document without
    provenance cannot be a re-crawl of anything — collapsing the
    null group to one survivor would delete distinct documents
    (the ``url_filter`` hostless stance; dedup them on content).
    """
    from cs533_big_data_data_mining_spark.functions.url import normalize_url

    norm = normalize_url(url_col) if normalize else F.col(url_col)
    base = df.select(
        F.col(id_col).alias("id"), norm.alias("url_norm"), *[F.col(c) for c in carry]
    )
    # min-id keeper as a window over the normalized key (round 12):
    # the old groupBy(min) + id semi-join evaluated the normalizer
    # subtree twice and paid a second exchange for the join (the
    # keeper set is #distinct-URLs-sized — not broadcastable at
    # corpus scale); one partition-window min is one exchange and one
    # pass. NULL urls stay exempt via the filter disjunct; the window
    # key NULL-salts them so they don't all shuffle to one task
    # (round 13 — see _url_keeper_window).
    w = _url_keeper_window()
    return (
        base.withColumn("__mn", F.min("id").over(w))
        .filter(F.col("url_norm").isNull() | (F.col("id") == F.col("__mn")))
        .select("id", "url_norm", *carry)
    )


def url_dedup_bipartite(
    new: DataFrame,
    history: DataFrame,
    id_col: str,
    url_col: str,
    history_url_col: str | None = None,
    normalize: bool = True,
) -> DataFrame:
    """Incremental :func:`url_dedup`: survivors of the NEW shard whose
    normalized URL is neither already in the HISTORICAL corpus nor
    claimed by a smaller id within the shard — the daily-ingest twin
    (same shape as ``minhash_dedup_pairs_bipartite`` /
    ``duplicated_spans_bipartite``). History contributes only its
    distinct normalized-URL set (one combinable groupBy — or persist
    it once per ingest); the anti-join build side is URL-count-sized,
    never document-sized. Returns ``(id, url_norm)``. NULL urls are
    EXEMPT (all kept) — the :func:`url_dedup` contract.
    """
    from cs533_big_data_data_mining_spark.functions.url import normalize_url

    hcol = history_url_col if history_url_col is not None else url_col
    n_norm = normalize_url(url_col) if normalize else F.col(url_col)
    h_norm = normalize_url(hcol) if normalize else F.col(hcol)
    base = new.select(F.col(id_col).alias("id"), n_norm.alias("url_norm"))
    seen = history.select(h_norm.alias("url_norm")).distinct()
    # one anti-join over ALL rows (NULL urls can never equi-match, so
    # they pass the anti-join — the exemption needs no separate
    # branch), then the window-min keeper of :func:`url_dedup` — the
    # old nonnull-split + groupBy + semi-join spelled the normalizer
    # subtree four times in one plan and paid an extra exchange
    fresh = base.join(seen, "url_norm", "left_anti")
    w = _url_keeper_window()
    return (
        fresh.withColumn("__mn", F.min("id").over(w))
        .filter(F.col("url_norm").isNull() | (F.col("id") == F.col("__mn")))
        .select("id", "url_norm")  # the join moved the key column first
    )


def url_dedup_bipartite_bloom(
    new: DataFrame,
    history: DataFrame,
    id_col: str,
    url_col: str,
    history_url_col: str | None = None,
    normalize: bool = True,
    fpp: float = 0.01,
    exact: bool = True,
    bloom=None,
) -> DataFrame:
    """:func:`url_dedup_bipartite` through a Bloom filter —
    completing the Dolma Bloom family (URL / document / paragraph;
    Soldaini 2024 §2.2 dedups URLs against the ever-growing corpus
    too). Same ``(id, url_norm)`` contract, same two envelopes as
    :func:`exact_dedup_bipartite_bloom`: ``exact=True`` verifies the
    Bloom-positive sliver against the history's distinct normalized
    URLs (output equals the hash-join twin row-for-row);
    ``exact=False`` drops positives unverified (~fpp of genuinely-new
    URLs lost, never a missed re-crawl, no history join at all).
    NULL urls are EXEMPT (all kept). Pass a prebuilt/loaded ``bloom``
    to amortize the history scan across shard cycles.
    """
    from cs533_big_data_data_mining_spark.functions.url import normalize_url
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    hcol = history_url_col if history_url_col is not None else url_col
    n_norm = normalize_url(url_col) if normalize else F.col(url_col)
    base = new.select(F.col(id_col).alias("id"), n_norm.alias("url_norm"))
    seen = _url_history_keys(history, hcol, normalize)
    if bloom is None:
        bloom = bloom_build(seen, "url_norm", fpp=fpp)
    mc = bloom.might_contain("url_norm")
    if exact:
        # Bloom-gated anti-join in ONE branch (round 12): rows whose
        # probe is negative (or whose url is NULL) make the join
        # condition false and pass straight through — the Bloom still
        # shields the verify join from every definitely-new row, but
        # the probe and the normalizer evaluate once instead of the
        # old two-filter union's twice (the probe is an Arrow-UDF
        # boundary crossing — guide §4).
        flagged = base.withColumn("__mc", F.coalesce(mc, F.lit(False)))
        s = seen.select(F.col("url_norm").alias("__seen_url"))
        fresh = flagged.join(
            s,
            flagged["__mc"] & (flagged["url_norm"] == s["__seen_url"]),
            "left_anti",
        ).drop("__mc")
    else:
        fresh = base.filter(F.col("url_norm").isNull() | ~mc)
    # window-min keeper (the url_dedup spelling): one exchange, no
    # duplicate evaluation of the fresh subtree; NULL urls exempt
    # (NULL-salted window — see _url_keeper_window)
    w = _url_keeper_window()
    return (
        fresh.withColumn("__mn", F.min("id").over(w))
        .filter(F.col("url_norm").isNull() | (F.col("id") == F.col("__mn")))
        .select("id", "url_norm")
    )



def _url_history_keys(history: DataFrame, url_col: str, normalize: bool) -> DataFrame:
    """Distinct non-null (normalized) history URLs — THE key frame of
    the URL Bloom route; both the filter build and the exact-verify
    join read this one spelling."""
    from cs533_big_data_data_mining_spark.functions.url import normalize_url

    h_norm = normalize_url(url_col) if normalize else F.col(url_col)
    return (
        history.select(h_norm.alias("url_norm"))
        .filter(F.col("url_norm").isNotNull())
        .distinct()
    )


def _exact_history_keys(history: DataFrame, content_col: str) -> DataFrame:
    """Distinct 64-bit content hashes (string-typed for the Bloom) of
    the history — the document-level Bloom key frame."""
    return history.select(F.xxhash64(content_col).cast("string").alias("__h")).distinct()


def _para_history_keys(history: DataFrame, text_col: str) -> DataFrame:
    """Distinct normalized-paragraph keys of the history — the
    paragraph-level Bloom key frame."""
    return (
        history.select(F.explode(_paras_arr(F.col(text_col))).alias("para"))
        .select(_para_key(F.col("para")).alias("__k"))
        .distinct()
    )


def url_history_bloom(history: DataFrame, url_col: str, normalize: bool = True, fpp: float = 0.01):
    """Build the URL-stage history Bloom once (persist with
    ``BloomFilter.save``; reload across shard cycles and pass as
    ``bloom=`` to :func:`url_dedup_bipartite_bloom`)."""
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    return bloom_build(_url_history_keys(history, url_col, normalize), "url_norm", fpp=fpp)


def exact_history_bloom(history: DataFrame, content_col: str, fpp: float = 0.01):
    """Build the document-stage history Bloom once (see
    :func:`url_history_bloom` for the persist/reload cycle)."""
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    return bloom_build(_exact_history_keys(history, content_col), "__h", fpp=fpp)


def paragraph_history_bloom(history: DataFrame, text_col: str, fpp: float = 0.01):
    """Build the paragraph-stage history Bloom once (see
    :func:`url_history_bloom` for the persist/reload cycle)."""
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    return bloom_build(_para_history_keys(history, text_col), "__k", fpp=fpp)


def _spread(df: DataFrame) -> DataFrame:
    """Small single-file inputs arrive as one partition; CPU-bound
    per-row work (shingling, hashing) must fan out first. No-op when
    the scan already has enough splits (the 100 TB case)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def _shingle_index(
    df: DataFrame, id_col: str, text_col: str, n: int, max_doc_freq: int | None
) -> DataFrame:
    """(id, shingle) inverted index, optionally dropping shingles with
    document frequency above ``max_doc_freq`` (skew guard)."""
    df = _spread(df)
    sh = df.select(F.col(id_col).alias("id"), F.explode(word_shingles(text_col, n)).alias("shingle"))
    if max_doc_freq:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_doc_freq).select("shingle")
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def _ordered_docs(sh: DataFrame) -> DataFrame:
    """One-row-per-doc ``(id, sz, ord)`` frame from a ``(id, shingle)``
    index: ``ord`` is the doc's distinct shingles under the PPJoin
    global total order — ascending document frequency, ties by shingle
    (rare-first, the order that minimizes candidates) — and
    ``sz = |A|`` (shingles are distinct). ONE aggregate serves both the
    prefix generation (ordered slice) and the exact verify (the full
    array — order is irrelevant to ``array_intersect``), so the
    ngram-Jaccard route shuffles the index by id once, not twice
    (round 12, guide §2.3/§2.4 — the same fusion as ``_packed_index``).
    The sort key (dfq) is dropped INSIDE the aggregate (round 13,
    ADVICE): consumers only read the shingles after ordering, so
    caching the struct kept dead df values in executor memory —
    ``transform(..., x -> x.shingle)`` halves the cached bytes while
    preserving the (dfq, shingle) order."""
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("dfq"))
    return (
        sh.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dfq", "shingle"))),
                lambda x: x["shingle"],
            ).alias("ord")
        )
        .select("id", F.size("ord").alias("sz"), "ord")
    )


def _prefix_candidates_from_docs(docs: DataFrame, threshold: float) -> DataFrame:
    """PPJoin prefix-filtered candidate pairs ``(a, b)`` from an
    ``_ordered_docs`` frame (Bayardo/Xiao prefix filtering, public
    all-pairs-similarity literature).

    Only each doc's first ``|A| - ceil(t*|A|) + 1`` shingles are
    indexed for candidate generation. Correctness: J(A,B) >= t forces
    |A ∩ B| >= ceil(t*(|A|+|B|)/(1+t)) >= max(ceil(t|A|), ceil(t|B|)),
    and two sets whose overlap is >= alpha must intersect within their
    (|X| - alpha + 1)-prefixes under ANY shared total order — so the
    prefix join loses no qualifying pair (it is a pure candidate
    reduction, verified exactly downstream).

    This is the structural hot-shingle guard: a boilerplate shingle
    shared by 10^5 docs has maximal df, sorts LAST, and lands in a
    prefix only for docs so small that nearly all their shingles are
    prefix — so its df^2 pair blowup never reaches the join. (The
    opt-in ``max_doc_freq`` drop remains available on top.)
    """
    t = float(threshold)
    # clamp at 0: an unreachable threshold (> 1) makes every prefix
    # empty — the correct "no pair can qualify" degenerate, not an
    # error from slice() seeing a negative length
    plen = F.greatest(
        F.lit(0), (F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1)).cast("int")
    )
    prefix = docs.select(
        "id", "sz", F.explode(F.slice("ord", F.lit(1), plen)).alias("shingle")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id"))
            # PPJoin length filter: t*|A| <= |B| <= |A|/t, pruned
            # inside the join before the distinct
            & (F.col("b.sz") * F.lit(t) <= F.col("a.sz"))
            & (F.col("a.sz") * F.lit(t) <= F.col("b.sz")),
        )
        .select(F.col("a.id").alias("a"), F.col("b.id").alias("b"))
        .distinct()
    )


def _prefix_candidates(sh: DataFrame, threshold: float) -> DataFrame:
    """PPJoin candidates straight from an ``(id, shingle)`` index —
    thin composition kept for callers (and tests) that hold the
    exploded index rather than the ordered-docs frame."""
    return _prefix_candidates_from_docs(_ordered_docs(sh), threshold)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
    caches: list | None = None,
) -> DataFrame:
    """Exact Jaccard near-dup pairs ``(a, b, jaccard)`` with a < b.

    Candidates come from the PPJoin prefix-filtered self-join
    (``_prefix_candidates_from_docs`` — only docs sharing a PREFIX
    shingle are ever paired, so hot boilerplate shingles cannot produce
    a df^2 blowup); |A ∩ B| is then counted exactly over the full index
    for candidate pairs only (linear in candidates), |A ∪ B| from the
    per-doc distinct-shingle counts. Results are identical to the
    unfiltered join — prefix filtering is lossless for J >= t.

    Round 12: the prefix generator and the exact verify share ONE
    ``_ordered_docs`` aggregate — the verify's packed shingle array is
    ``transform(ord, x -> x.shingle)`` (array order is irrelevant to
    ``array_intersect``), so the cached frame is one array row per doc
    and the id-keyed shuffle of the index happens once, not twice.

    ``caches`` (optional): the internally cached ordered-docs frame is
    appended so callers that materialize the result can unpersist it;
    with ``caches=None`` the (small) pair result is materialized
    internally and the index unpersisted before returning (same cache
    contract as ``minhash_dedup_pairs``).
    """
    sh = _shingle_index(df, id_col, text_col, n, max_doc_freq)
    docs = _ordered_docs(sh).cache()
    if caches is not None:
        caches.append(docs)
    t = float(threshold)
    cands = _prefix_candidates_from_docs(docs, t)
    # exact verification only for candidate pairs — array-packed,
    # see _jaccard_verify; the packed arrays ARE the ordered arrays
    # of the SAME cached ordered-docs frame the prefixes sliced
    packed = docs.select("id", F.col("ord").alias("__sarr"))
    jac = _jaccard_verify(cands, packed, packed, threshold)
    return _release_index_caches(jac, [docs]) if caches is None else jac


def _signatures_from_index(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(id, sig) from a prebuilt (id, shingle) index — lets callers
    that also need the index for verification reuse ONE cached scan."""
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)]
    sigs = sh.groupBy("id").agg(*aggs)
    return sigs.select("id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"))


def _packed_index(
    df: DataFrame, id_col: str, text_col: str, n: int, num_hashes: int
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes], __sarr ARRAY<STRING>) in
    ONE groupBy (round 12): the signature minima and the verify's
    packed shingle array are aggregates over the SAME (id, shingle)
    explode keyed the same way, so computing them in separate
    groupBys paid two shuffles of the index and cached the wide
    exploded form; one combined aggregate pays one shuffle and the
    cache holds each shingle once (guide §2.3/§2.4). Values are
    unchanged: min-hash per seed and the per-doc distinct shingle
    set do not depend on aggregation or array order."""
    sh = _shingle_index(df, id_col, text_col, n, max_doc_freq=None)
    aggs = [F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}") for i in range(num_hashes)]
    return (
        sh.groupBy("id")
        .agg(*aggs, F.collect_list("shingle").alias("__sarr"))
        .select(
            "id",
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
            "__sarr",
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes]): sig[i] = min over shingles
    of xxhash64(i, shingle). One explode + one groupBy — the min per
    seed is a map-side-combinable aggregate."""
    return _signatures_from_index(
        _shingle_index(df, id_col, text_col, n, max_doc_freq=None), num_hashes
    )


def _drop_hot_buckets(
    bucketed: DataFrame, max_bucket_size: int, census: DataFrame | None = None
) -> DataFrame:
    """Drop (band, bhash) buckets with more than ``max_bucket_size``
    members before the band self-/cross-join.

    A bucket of m members emits O(m^2) candidate pairs, each paying
    an exact-Jaccard verification — shared BOILERPLATE is the
    classic trigger (when a template's shingles supply the minimum
    for a whole band, every document lands in one universal bucket;
    measured: a 200k-doc corpus with a ~30-shingle shared template
    put ~p^r = 0.8% of docs in ONE bucket PER BAND — tens of
    millions of verifications for zero true pairs). Recall note: a
    pair is lost only if EVERY band it collides on is oversubscribed;
    a genuinely near-duplicate pair (J >= t) also collides on bands
    whose minima include document-specific shingles, and those
    buckets stay tiny — so at dedup thresholds the planted-pair
    recall stays 1 (pinned by tests + the lsh_bucket_cap_eq row).
    The hot-bucket list is tiny by construction (at most
    N*bands/cap entries), hence the broadcast anti-join. Cost of the
    guard: the census is one extra aggregated pass over the banded
    signatures (which read the cached shingle index) — linear, paid
    only when the guard is requested. ``census`` (optional) counts
    membership over a different frame than the one being filtered —
    the bipartite route passes the UNION of both sides. A cap below
    2 would drop EVERY bucket that can produce a pair, silently
    disabling dedup — rejected loudly instead (``None`` is the
    documented off switch; 0 is not)."""
    if max_bucket_size < 2:
        raise ValueError(
            f"max_bucket_size must be >= 2 (got {max_bucket_size}); a bucket "
            "needs two members to produce a candidate pair — pass None to "
            "disable the guard"
        )
    hot = (
        (census if census is not None else bucketed).groupBy("band", "bhash")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > max_bucket_size)
        .select("band", "bhash")
    )
    return bucketed.join(F.broadcast(hot), ["band", "bhash"], "left_anti")


def _lsh_candidates_from_sigs(
    sigs: DataFrame, num_hashes: int, bands: int, max_bucket_size: int | None = None
) -> DataFrame:
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")
    r = num_hashes // bands
    bucketed = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[F.col("sig")[bi * r + j] for j in range(r)]).alias("bhash"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bhash")
    if max_bucket_size is not None:
        bucketed = _drop_hot_buckets(bucketed, max_bucket_size)
    l, rt = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(
            rt,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs ``(a, b)``: docs agreeing on at least
    one LSH band (rows-per-band = num_hashes/bands). For threshold t,
    P[candidate] ≈ 1-(1-t^r)^b — with 64/16x4, t=0.5 catches ~66%,
    t=0.7 ~99%. Distinct equi-join keys only; no quadratic work.
    ``max_bucket_size`` drops oversubscribed band buckets before the
    join (boilerplate-template guard — see
    :func:`_drop_hot_buckets`)."""
    return _lsh_candidates_from_sigs(
        minhash_signatures(df, id_col, text_col, n, num_hashes),
        num_hashes,
        bands,
        max_bucket_size,
    )


def _jaccard_verify(
    cands: DataFrame, sha: DataFrame, shb: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs ``(a, b)``
    against (id, shingle) indexes WITHOUT the per-shingle explode
    join: each doc's distinct shingles are packed into ONE array row,
    the candidate table joins that row per side, and the intersection
    is a per-row ``array_intersect`` — the verify shuffle moves one
    row per (candidate, side) instead of one row per (candidate,
    shingle) (guide §2.3 "shuffle fewer bytes": ~|shingles|x fewer
    rows; measured 4.8 s -> 0.9 s on the fineweb flagship's
    template-skewed candidate set). The ``inter >= 1`` gate keeps the
    old join-reachability semantics (a pair sharing no shingle never
    surfaced) for any threshold. Values are identical: shingle sets
    are distinct per doc, so ``size(array_intersect())`` equals the
    equi-join's per-pair match count."""
    def _packed(s):
        # accept a prepacked (id, __sarr) frame (the _packed_index
        # route) or a raw (id, shingle) index
        if "__sarr" in s.columns:
            return s.select("id", "__sarr")
        return s.groupBy("id").agg(F.collect_list("shingle").alias("__sarr"))

    arra = _packed(sha)
    arrb = arra if shb is sha else _packed(shb)
    j = cands.join(
        arra.select(F.col("id").alias("a"), F.col("__sarr").alias("__aa")), "a"
    ).join(arrb.select(F.col("id").alias("b"), F.col("__sarr").alias("__ab")), "b")
    inter = F.size(F.array_intersect("__aa", "__ab"))
    union = F.size("__aa") + F.size("__ab") - inter
    return (
        j.select("a", "b", inter.alias("__i"), union.alias("__u"))
        .filter(F.col("__i") >= 1)
        .withColumn(
            "jaccard",
            F.round(F.col("__i").cast("double") / F.col("__u").cast("double"), 6),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("a", "b", "jaccard")
    )


def _release_index_caches(out: DataFrame, idx_caches: list[DataFrame]) -> DataFrame:
    """Materialize the (small) pair result, then unpersist the large
    shingle-index caches — for callers that pass no ``caches`` list,
    so index storage can't accumulate in executor memory for the rest
    of the session (round-5 advice). The returned frame stays cached
    and is caller-owned."""
    out = out.cache()
    out.count()
    for frame in idx_caches:
        frame.unpersist()
    return out


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    caches: list | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidates verified with exact Jaccard (candidate set only,
    so verification cost is linear in candidates, not N^2).
    ``max_bucket_size`` (optional) drops oversubscribed band buckets
    before the candidate join — the boilerplate-template guard; see
    :func:`_drop_hot_buckets` for the recall contract.

    The per-doc packed index (signature minima + distinct shingle
    array, ONE combined groupBy — :func:`_packed_index`) is built
    once and cached: candidate generation and exact verification
    read the same materialized frame instead of re-tokenizing/
    re-shingling the corpus per consumer (three scans of the text
    column collapsed to one, and the two index shuffles to one).
    ``caches`` (optional) receives the cached index so callers that
    materialize the result can unpersist it; with ``caches=None`` the
    (small) pair result is materialized internally and the index is
    unpersisted before returning — the cache cannot outlive the call
    (the returned cached frame is caller-owned, same contract as
    ``dbscan``/``curate_documents``)."""
    pk = _packed_index(df, id_col, text_col, n, num_hashes).cache()
    if caches is not None:
        caches.append(pk)
    cands = _lsh_candidates_from_sigs(
        pk.select("id", "sig"), num_hashes, bands, max_bucket_size
    )
    # exact verification only for candidate pairs (linear in
    # candidates, not N^2) — array-packed, see _jaccard_verify
    arr = pk.select("id", "__sarr")
    out = _jaccard_verify(cands, arr, arr, threshold)
    return _release_index_caches(out, [pk]) if caches is None else out


def minhash_dedup_pairs_bipartite(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    caches: list | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs ``(a, b, jaccard)`` BETWEEN two corpora (a from
    ``left``, b from ``right``) — incremental dedup: check a new crawl
    shard against the historical corpus without re-pairing the
    history against itself. ``max_bucket_size`` caps a band bucket's
    COMBINED membership across the two sides (the cross-join output
    of a bucket is |L|x|R|, so the guard keys on the union count —
    :func:`_drop_hot_buckets` contract).

    Same candidates-then-verify shape as ``minhash_dedup_pairs``: both
    sides get signatures from the same seeded hash family (so equal
    shingle sets collide deterministically), the band join pairs only
    (band, bhash) matches ACROSS the two tables, and candidates are
    verified with exact Jaccard over the two shingle indexes. At
    100 TB the right side's signatures/index are computed once per
    shard cycle and reused; per-shard cost is the left side (small)
    plus one equi-join against the banded history.

    Pairs where both ids are equal are dropped (the same document
    present in both corpora is not a "near duplicate" finding).

    Cache contract: same as ``minhash_dedup_pairs`` — pass ``caches``
    to own the index caches yourself, or leave it ``None`` and get a
    materialized result with the indexes already unpersisted.
    """
    pkl = _packed_index(left, id_col, text_col, n, num_hashes).cache()
    pkr = _packed_index(right, id_col, text_col, n, num_hashes).cache()
    if caches is not None:
        caches.extend([pkl, pkr])
    r = num_hashes // bands
    if num_hashes % bands:
        raise ValueError("bands must divide num_hashes")

    def banded(sigs):
        return sigs.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(bi).alias("band"),
                            F.xxhash64(*[F.col("sig")[bi * r + j] for j in range(r)]).alias("bhash"),
                        )
                        for bi in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select("id", "bk.band", "bk.bhash")

    bl = banded(pkl.select("id", "sig"))
    br = banded(pkr.select("id", "sig"))
    if max_bucket_size is not None:
        # combined membership: a bucket hot on EITHER side (or jointly)
        # explodes the cross join, so the census spans both tables
        combined = bl.unionByName(br)
        bl = _drop_hot_buckets(bl, max_bucket_size, census=combined)
        br = _drop_hot_buckets(br, max_bucket_size, census=combined)
    bl, br = bl.alias("l"), br.alias("r")
    cands = (
        bl.join(
            br,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bhash") == F.col("r.bhash"))
            & (F.col("l.id") != F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )
    out = _jaccard_verify(cands, pkl.select("id", "__sarr"), pkr.select("id", "__sarr"), threshold)
    return _release_index_caches(out, [pkl, pkr]) if caches is None else out


def _term_freqs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok, w): per-document term frequencies — the weighted-vote
    input shared by every simhash variant."""
    from cs533_big_data_data_mining_spark.functions.text import tokenize

    toks = _spread(df).select(F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("tok"))
    return toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("w"))


def _simhash_from_token_hash(tf_hashed: DataFrame, nbits: int) -> DataFrame:
    """(id, simhash) from a (id, w, th) frame: per-bit weighted vote
    sums (map-side-combinable conditional aggregates, all JVM-side),
    sign of each vote becomes the signature bit. At most 63 bits are
    packed so the sign bit stays clear (ANSI-safe BIGINT)."""
    used = min(nbits, 63)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(-F.col("w"))
        ).alias(f"v{b}")
        for b in range(used)
    ]
    agg = tf_hashed.groupBy("id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(used):
        sig = sig + F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long") * F.lit(2 ** b)).otherwise(F.lit(0))
    return agg.select("id", sig.alias("simhash"))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash BIGINT): 64-bit weighted bit-vote over token
    hashes (Charikar). Tokens vote +1/-1 per bit weighted by their
    term frequency; bit b of the result is the vote sign.

    Vectorized as conditional-sum aggregates over one exploded
    token frame — all JVM-side."""
    tf = _term_freqs(df, id_col, text_col)
    return _simhash_from_token_hash(tf.withColumn("th", F.xxhash64("tok")), 64)


def simhash_poly31(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """31-bit simhash whose token hash is the cross-engine polynomial
    rolling hash (the ``functions/text.fingerprint`` recurrence,
    ``acc*31 + codepoint mod 2^31-1``) instead of xxhash64 — every step
    is reproducible in ANSI SQL, so the full signature has an exact
    DuckDB oracle twin. Same vote machinery and scale shape as
    ``simhash64``; fewer bits, so use that one when 64-bit Hamming
    resolution matters and this one when verifiability does."""
    from cs533_big_data_data_mining_spark.functions.text import fingerprint

    tf = _term_freqs(df, id_col, text_col)
    return _simhash_from_token_hash(tf.withColumn("th", fingerprint("tok")), 31)


def _simhash_banded(sigs: DataFrame, nbits: int, bands: int) -> DataFrame:
    """``(id, simhash, band, bkey)``: the signature split into
    ``bands`` near-equal bit slices (width base or base+1 when bands
    doesn't divide nbits). An equi-join on (band, bkey) yields
    candidate pairs without ever going all-pairs; pigeonhole: any
    pair with Hamming distance < bands shares at least one slice."""
    base, rem = divmod(nbits, bands)
    widths = [base + (1 if i < rem else 0) for i in range(bands)]
    starts = [sum(widths[:i]) for i in range(bands)]
    return sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("simhash"), starts[bi])
                        .bitwiseAND(F.lit((1 << widths[bi]) - 1))
                        .alias("bkey"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.bkey")


def hamming_neardup_pairs_from_sigs(
    sigs: DataFrame,
    nbits: int,
    max_hamming: int,
    bands: int | None = None,
    id_col: str = "id",
    sig_col: str = "simhash",
) -> DataFrame:
    """Verified Hamming near-dup pairs ``(a, b, hamming)`` (a < b)
    over ANY precomputed bit-signature frame — the banded
    candidates-then-exact-verify engine shared by text simhash and
    perceptual image hashes (``multimodal.dhash64``). Pigeonhole with
    the default ``bands = max_hamming + 1`` keeps recall exactly 1;
    the exact ``bit_count(xor)`` verify rides INSIDE the band join so
    non-matching collisions die before the distinct. Pass a frame you
    have cached/persisted yourself — at scale the signature is the
    artifact worth keeping, not the payload."""
    if bands is None:
        bands = int(max_hamming) + 1
    if bands > nbits:
        raise ValueError(f"bands={bands} exceeds signature width {nbits}")
    std = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("simhash"))
    bucketed = _simhash_banded(std, nbits, bands)
    l, r = bucketed.alias("l"), bucketed.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).cast("long")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id"))
            & (ham <= F.lit(int(max_hamming))),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), ham.alias("hamming"))
        .distinct()
    )


def hamming_neardup_pairs_bipartite_from_sigs(
    new_sigs: DataFrame,
    history_sigs: DataFrame,
    nbits: int,
    max_hamming: int,
    bands: int | None = None,
    id_col: str = "id",
    sig_col: str = "simhash",
) -> DataFrame:
    """Incremental twin of :func:`hamming_neardup_pairs_from_sigs`:
    ``(a, b, hamming)`` with ``a`` from the NEW shard and ``b`` from
    the immutable history — only cross-corpus pairs, never
    history x history (the bipartite convention shared by the MinHash/
    span/SemDeDup families). History's banded signature frame is a
    pure function of its signatures, so persist the ``(id, sig)``
    table once and history payloads are never touched again."""
    if bands is None:
        bands = int(max_hamming) + 1
    if bands > nbits:
        raise ValueError(f"bands={bands} exceeds signature width {nbits}")

    def _std(df):
        return df.select(F.col(id_col).alias("id"), F.col(sig_col).alias("simhash"))

    l = _simhash_banded(_std(new_sigs), nbits, bands).alias("l")
    r = _simhash_banded(_std(history_sigs), nbits, bands).alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))).cast("long")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (ham <= F.lit(int(max_hamming))),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"), ham.alias("hamming"))
        .distinct()
    )


def _simhash_band_candidates(sigs: DataFrame, nbits: int, bands: int) -> DataFrame:
    """Band-collision candidate pairs ``(a, b)`` (recall 1 for
    Hamming distance <= bands - 1 by pigeonhole)."""
    bucketed = _simhash_banded(sigs, nbits, bands)
    l, r = bucketed.alias("l"), bucketed.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bkey") == F.col("r.bkey"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def simhash_candidates(df: DataFrame, id_col: str, text_col: str, bands: int = 4) -> DataFrame:
    """Near-dup candidates: pairs agreeing on >= 1 of ``bands`` 16-bit
    slices of the simhash (catches all pairs with Hamming distance
    < bands by pigeonhole)."""
    return _simhash_band_candidates(simhash64(df, id_col, text_col), 64, bands)


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int | None = None,
    token_hash: str = "xxhash64",
    caches: list | None = None,
) -> DataFrame:
    """Verified simhash near-dup pairs ``(a, b, hamming)`` with a < b
    and ``hamming <= max_hamming`` — band candidates followed by an
    exact Hamming check (``bit_count(sig_a XOR sig_b)``, pure Column),
    the same candidates-then-verify shape as MinHash (exact Jaccard)
    and hyperplane LSH (exact cosine).

    With the default ``bands = max_hamming + 1`` the pigeonhole bound
    makes recall EXACTLY 1: a pair within distance d cannot differ in
    every one of d+1 slices. Fewer bands than that would be lossy;
    more bands raise candidate counts for no recall gain.

    ``token_hash``: "xxhash64" (64-bit signature, best Hamming
    resolution) or "poly31" (31-bit, every step ANSI-SQL reproducible,
    so the full pipeline has an exact DuckDB oracle twin).
    """
    if token_hash == "xxhash64":
        sigs, nbits = simhash64(df, id_col, text_col), 64
    elif token_hash == "poly31":
        sigs, nbits = simhash_poly31(df, id_col, text_col), 31
    else:
        raise ValueError(f"unknown token_hash {token_hash!r}")
    # one signature aggregation feeds both sides of the band self-join;
    # the verify rides INSIDE the band join (see the sigs-level engine)
    sigs = sigs.cache()
    if caches is not None:
        caches.append(sigs)
    return hamming_neardup_pairs_from_sigs(sigs, nbits, max_hamming, bands)


def duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    hash_grams: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans — the exact-substring dedup
    shape of Lee et al., "Deduplicating Training Data Makes Language
    Models Better" (ACL 2022), re-expressed relationally: a token
    position is *duplicated* when the ``k``-gram starting there occurs
    >= 2 times in the corpus (another document OR another position of
    the same document); overlapping/adjacent duplicated k-gram windows
    merge into maximal spans. Returns
    ``(id, span_start, span_end, span_tokens)`` with token-index
    bounds (0-based, ``span_end`` exclusive,
    ``span_tokens = span_end - span_start >= k``).

    Their suffix array finds duplicated substrings in O(total tokens)
    on one machine; at cluster scale the equivalent signal is a
    positional k-gram inverted index — Spark-shaped: one combinable
    ``groupBy(gram)`` occurrence count, a semi-join of positions
    against the duplicated grams, and a per-document gaps-and-islands
    window (state bounded by document length) to merge windows into
    spans. No Python, no skew hazard beyond the gram groupBy (hot
    grams are exactly what AQE skew splitting handles; unlike the
    Jaccard index there is no pair blowup — duplicated grams only
    FLAG positions, they are never self-joined).

    ``hash_grams=True`` replaces the gram string with its xxhash64 in
    the groupBy/semi-join — ~6x less shuffle volume at corpus scale
    (8-byte keys vs ~10x``k``-char strings) at the cost of exactness:
    a 64-bit collision falsely flags one k-gram window (expected a
    handful of positions per 10^10 grams — immaterial for a quality
    signal, wrong for an exact-match oracle). Default is exact.
    """
    kk = int(k)
    if kk < 1:
        raise ValueError("k must be >= 1")
    grams = (
        _spread(df).select(
            F.col(id_col).alias("id"),
            F.posexplode(word_ngrams(text_col, kk)).alias("pos", "gram"),
        )
    )
    if hash_grams:
        grams = grams.select("id", "pos", F.xxhash64("gram").alias("gram"))
    dup_grams = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gram")
    )
    flagged = grams.join(dup_grams, "gram", "left_semi")
    return _merge_flagged_spans(flagged, kk)


def duplicated_spans_bipartite(
    new: DataFrame,
    history: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    hash_grams: bool = False,
) -> DataFrame:
    """Incremental :func:`duplicated_spans`: maximal spans in NEW
    documents whose k-grams already exist in the HISTORICAL corpus or
    occur >= 2 times within the new shard itself — the shape a daily
    ingest pipeline runs (dedup today's shard against everything
    already admitted without re-scanning history pairwise; the twin
    of ``minhash_dedup_pairs_bipartite``).

    History contributes only its DISTINCT gram set (one combinable
    groupBy per ingest — or persist it once and union the admitted
    shard's grams in, so history is never re-tokenized); new-shard
    positions are flagged by one semi-join against
    ``history-grams ∪ {new grams with count >= 2}``. Same span-merge
    window, same ``hash_grams`` shuffle-width trade as the
    self-join variant.
    """
    kk = int(k)
    if kk < 1:
        raise ValueError("k must be >= 1")
    gram_of = (lambda c: F.xxhash64(c)) if hash_grams else (lambda c: c)
    ngrams = _spread(new).select(
        F.col(id_col).alias("id"),
        F.posexplode(word_ngrams(text_col, kk)).alias("pos", "__g"),
    ).select("id", "pos", gram_of(F.col("__g")).alias("gram"))
    hgrams = (
        _spread(history).select(F.explode(word_ngrams(text_col, kk)).alias("__g"))
        .select(gram_of(F.col("__g")).alias("gram"))
        .distinct()
    )
    new_dups = (
        ngrams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("gram")
    )
    # no distinct after the union: a semi-join's output is identical
    # for a non-distinct build side, and both inputs are already
    # distinct per source — the re-shuffle bought nothing
    flagged = ngrams.join(hgrams.union(new_dups), "gram", "left_semi")
    return _merge_flagged_spans(flagged.select("id", "pos"), kk)


def _merge_flagged_spans(flagged: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of flagged k-gram start positions
    ``(id, pos)`` into maximal spans: windows [pos, pos+k) merge while
    the gap between consecutive flagged starts is <= k. Per-doc window
    — state bounded by document length."""
    w = Window.partitionBy("id").orderBy("pos")
    brk = (
        F.when(F.col("pos") - F.lag("pos").over(w) > F.lit(k), 1).otherwise(0)
    )
    islands = flagged.select(
        "id", "pos", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("isl")
    )
    return (
        islands.groupBy("id", "isl")
        .agg(F.min("pos").alias("span_start"), (F.max("pos") + F.lit(k)).alias("span_end"))
        .select(
            "id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start")).cast("long").alias("span_tokens"),
        )
    )


def span_dup_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Per-document duplicated-token fraction from
    :func:`duplicated_spans` — the corpus-level repetition quality
    signal (docs that are mostly duplicated text get filtered or
    down-weighted before training): ``(id, dup_tokens, total_tokens,
    dup_frac)``. Every document appears (zero-span docs included),
    ``dup_frac`` rounded to 6 dp. One extra combinable groupBy over
    the span rows + a broadcast-sized join back to the doc list."""
    spans = duplicated_spans(df, id_col=id_col, text_col=text_col, k=k)
    per_doc = spans.groupBy("id").agg(F.sum("span_tokens").alias("dup_tokens"))
    # greatest(.., 0): size(NULL) is -1 in Spark — null text counts 0
    totals = df.select(
        F.col(id_col).alias("id"),
        F.greatest(token_count(text_col), F.lit(0)).cast("long").alias("total_tokens"),
    )
    return totals.join(per_doc, "id", "left").select(
        "id",
        F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        "total_tokens",
        F.round(
            F.coalesce("dup_tokens", F.lit(0))
            / F.greatest("total_tokens", F.lit(1)).cast("double"),
            6,
        ).alias("dup_frac"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    hash_grams: bool = False,
    min_span_tokens: int | None = None,
    out_col: str = "clean",
) -> DataFrame:
    """Exact-substring dedup as a TRANSFORM — Lee et al. 2022's
    ExactSubstr removal step: every token inside a duplicated span
    (from :func:`duplicated_spans`, all occurrences) is excised and
    the survivors rejoin with single spaces. Returns
    ``(id, out_col)`` for every input document; span-free docs pass
    through (whitespace-normalized — the tokens are the unit here),
    null text stays null, a fully-duplicated doc becomes the empty
    string (filter those downstream).

    ``min_span_tokens`` ignores spans shorter than the threshold
    (Lee et al. remove only substrings >= 50 tokens; the detector's
    floor is ``k``). ``hash_grams`` as in :func:`duplicated_spans`.

    Scale shape: the detector's cost dominates (positional-gram
    index); the removal itself adds one #span-docs groupBy
    (collect_list of per-doc span bounds — bounded by doc length)
    and a pure-Column indexed ``filter``/``exists`` over the token
    array. No Python anywhere.
    """
    spans = duplicated_spans(df, id_col=id_col, text_col=text_col, k=k, hash_grams=hash_grams)
    if min_span_tokens is not None:
        spans = spans.filter(F.col("span_tokens") >= int(min_span_tokens))
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    joined = base.join(per_doc, "id", "left")
    toks = tokenize("__text")
    # span positions and filter's index arg are both 0-based in Spark
    # (DuckDB's lambda index is 1-based — the oracle shifts by one)
    kept = F.filter(
        toks,
        lambda x, i: ~F.exists(
            F.col("__spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    clean = F.when(F.col("__spans").isNull(), F.concat_ws(" ", toks)).otherwise(
        F.concat_ws(" ", kept)
    )
    return joined.select(
        "id", F.when(F.col("__text").isNull(), F.lit(None)).otherwise(clean).alias(out_col)
    )


def _paras_arr(col):
    """``\\n``-split, trimmed, empties dropped — the shared paragraph
    unit of :func:`paragraph_dedup` and its bipartite twin (the
    :func:`~..quality.gopher_repetition` line spelling)."""
    return F.filter(F.transform(F.split(col, r"\n"), lambda x: F.trim(x)), lambda x: x != "")


def _para_key(col):
    """Normalized-paragraph match key: lowercase, inner whitespace
    collapsed, MD5 — ONE definition so batch and incremental dedup
    can never key differently."""
    return F.md5(F.regexp_replace(F.lower(col), r"\s+", " "))


def _paragraphs_keyed(df: DataFrame, id_col: str, text_col: str):
    """(base, keyed): base = (id, __text); keyed = one row per
    paragraph occurrence (id, pos, para, __k)."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    ex = base.select("id", F.posexplode(_paras_arr(F.col("__text"))).alias("pos", "para"))
    return base, ex.select("id", "pos", "para", _para_key(F.col("para")).alias("__k"))


def _keep_first(keyed: DataFrame) -> DataFrame:
    """Corpus-wide first occurrence per key, ordered by (id, pos)."""
    firsts = keyed.groupBy("__k").agg(F.min(F.struct("id", "pos")).alias("__f"))
    return (
        keyed.join(firsts, "__k")
        .filter((F.col("id") == F.col("__f.id")) & (F.col("pos") == F.col("__f.pos")))
        .drop("__f")
    )


def _reassemble_paragraphs(base: DataFrame, kept: DataFrame, out_col: str) -> DataFrame:
    """Surviving (id, pos, para) rows -> the (id, out_col, n_paras,
    n_kept) output contract: survivors rejoin in original order; null
    text -> null clean/counts; all-removed -> empty string."""
    agg = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))), lambda s: s["para"]
            ),
            "\n",
        ).alias("__clean"),
        F.count(F.lit(1)).alias("__n_kept"),
    )
    isnull = F.col("__text").isNull()
    return (
        base.select(
            "id", isnull.alias("__null"), F.size(_paras_arr(F.col("__text"))).alias("__n_paras")
        )
        .join(agg, "id", "left")
        .select(
            "id",
            F.when(F.col("__null"), F.lit(None).cast("string"))
            .otherwise(F.coalesce("__clean", F.lit("")))
            .alias(out_col),
            F.when(F.col("__null"), F.lit(None))
            .otherwise(F.col("__n_paras"))
            .cast("long")
            .alias("n_paras"),
            F.when(F.col("__null"), F.lit(None))
            .otherwise(F.coalesce("__n_kept", F.lit(0)))
            .cast("long")
            .alias("n_kept"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "keep_first",
    min_count: int = 2,
    out_col: str = "clean",
) -> DataFrame:
    """Paragraph-level deduplication as a TRANSFORM — the CCNet
    paragraph-hash dedup (Wenzek et al. 2020 §3 "deduplicating")
    also used per-shard by Dolma: paragraphs repeated ACROSS the
    corpus are excised in place and each document's survivors rejoin
    with ``\\n``. Two published policies:

    * ``mode="keep_first"`` (CCNet): every occurrence beyond the
      corpus-wide FIRST — ordered by ``(id, position)`` — is
      removed; exactly one copy of each distinct paragraph survives
      somewhere.
    * ``mode="drop_repeated"``: any paragraph occurring
      ``>= min_count`` times in the corpus is removed EVERYWHERE
      (the boilerplate-flavored policy; unlike
      :func:`~..quality.remove_boilerplate_lines` the count is
      occurrence-level, not document-frequency-level, and the unit
      is the paragraph).

    Paragraphs are ``\\n``-split, trimmed, empties dropped (the
    :func:`~..quality.gopher_repetition` line spelling — CCNet's
    unit is likewise the newline-delimited paragraph). The match key
    is the NORMALIZED paragraph: lowercased, inner whitespace
    collapsed to one space (a documented simplification of CCNet's
    lowercase+digit-strip+punct-strip normalization — the repo's
    corpus is synthetic ASCII, and the key spelling is pinned by the
    oracle either way).

    Returns ``(id, clean, n_paras, n_kept)`` for EVERY input row:
    ``clean`` is the surviving paragraphs rejoined in original order
    (null text -> null clean / null counts; a doc whose every
    paragraph is removed -> empty string, filter downstream).

    Scale shape: one explode (#paragraphs ~ lines of the corpus),
    ONE combinable groupBy on the paragraph's 128-bit MD5 — the
    shuffle carries the 32-hex-char key, never the paragraph text —
    one equi-join back on that key, and one per-doc groupBy to
    reassemble (collect_list bounded by the document's own paragraph
    count). Exactness rides on MD5(normalized-paragraph) equality —
    at 10^12 paragraphs the 128-bit birthday collision odds are
    ~10^-14, the standard content-hash envelope (same contract as
    the MinHash band hashes). Hot paragraphs (the whole point of the
    operator) make the min/count aggregation skew-heavy — both
    aggregates are partial+final combinable, so the hot key reduces
    map-side instead of flooding one reducer; the join side fans the
    verdict back out row-by-row (no bucket blowup: one row per
    original occurrence).
    """
    if mode not in ("keep_first", "drop_repeated"):
        raise ValueError(f"mode must be keep_first or drop_repeated, got {mode!r}")
    base, keyed = _paragraphs_keyed(df, id_col, text_col)
    if mode == "keep_first":
        kept = _keep_first(keyed)
    else:
        singles = (
            keyed.groupBy("__k")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") < int(min_count))
            .select("__k")
        )
        kept = keyed.join(singles, "__k", "left_semi")
    return _reassemble_paragraphs(base, kept, out_col)


def paragraph_dedup_bipartite(
    history: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dedup_within_new: bool = True,
    out_col: str = "clean",
) -> DataFrame:
    """Incremental :func:`paragraph_dedup`: paragraphs of NEW-shard
    documents that already occur anywhere in the immutable HISTORY
    corpus are excised (the history is never rewritten — its copies
    are the survivors, matching ``exact_dedup_bipartite`` semantics);
    with ``dedup_within_new`` the remaining new paragraphs then
    dedup keep-first among THEMSELVES (the daily-ingest spelling of
    CCNet's corpus-wide keep_first: history first, then (id, pos)
    order within the shard). Returns ``(id, clean, n_paras,
    n_kept)`` for every NEW row, the :func:`paragraph_dedup` output
    contract.

    Scale shape: the history contributes ONE distinct-key aggregate
    (its 16-byte normalized-paragraph MD5s — never the text), built
    once and reusable across shard cycles (persist the distinct-hash
    frame like the Bloom/minhash history artifacts); the new shard
    pays one anti-join against it plus (optionally) the
    :func:`paragraph_dedup` aggregation over its own — shard-sized —
    paragraph stream. Nothing history-sized is ever re-shuffled per
    cycle beyond the distinct-hash build.
    """
    hist_keys = (
        history.select(F.explode(_paras_arr(F.col(text_col))).alias("para"))
        .select(_para_key(F.col("para")).alias("__k"))
        .distinct()
    )
    base, keyed = _paragraphs_keyed(new, id_col, text_col)
    fresh = keyed.join(hist_keys, "__k", "left_anti")
    kept = _keep_first(fresh) if dedup_within_new else fresh
    return _reassemble_paragraphs(base, kept, out_col)


def exact_dedup_bipartite_bloom(
    new: DataFrame,
    history: DataFrame,
    id_col: str,
    content_col: str,
    history_content_col: str | None = None,
    fpp: float = 0.01,
    exact: bool = True,
    bloom=None,
):
    """:func:`exact_dedup_bipartite` through a Bloom filter — the
    Dolma spelling of incremental document dedup (Soldaini et al.
    2024 §2.2: the ever-growing corpus is represented as a Bloom
    filter, new documents probe it map-side). Returns the same FULL-
    row contract.

    Two envelopes, picked by ``exact``:

    * ``exact=True`` (default): the Bloom is a PREFILTER. Negatives
      are *definitely new* (no false negatives by construction) and
      skip the history join entirely; only the Bloom-positive sliver
      (true duplicates + ~fpp of the shard) takes the exact anti-join
      against the history hash set — output matches the hash-join
      twin row-for-row while the join's probe side shrinks from the
      whole shard to the candidates. Worth it when the shard is huge
      relative to its duplicate rate.
    * ``exact=False``: pure Dolma semantics — Bloom positives drop
      UNVERIFIED, so ~fpp of genuinely-new documents are lost (their
      documented trade for eliminating the history join and keeping
      the per-cycle state at ~1.2 GB/10^9 docs of bits instead of an
      8 GB+ hash frame). Survivors are always a SUBSET of the exact
      route's (one-sided error).

    Pass a prebuilt/loaded ``bloom`` (:class:`~..sketches
    .BloomFilter` — ``save``/``load`` persist it) to amortize the
    one-time history scan across daily shard cycles; otherwise one is
    built here from the history's distinct content hashes.
    """
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    hcol = history_content_col if history_content_col is not None else content_col
    # string-typed key: the Bloom hashes whatever value it is given,
    # and the VERIFY join below uses the same 64-bit content hash as
    # the hash-join twin, so both routes key identically
    seen = _exact_history_keys(history, hcol)
    if bloom is None:
        bloom = bloom_build(seen, "__h", fpp=fpp)
    base = new.select(F.col(id_col).alias("__id"), F.xxhash64(content_col).cast("string").alias("__h"))
    mc = bloom.might_contain("__h")
    if exact:
        fresh = base.filter(~mc).unionByName(base.filter(mc).join(seen, "__h", "left_anti"))
    else:
        fresh = base.filter(~mc)
    keepers = fresh.groupBy("__h").agg(F.min("__id").alias(id_col)).select(id_col)
    return new.join(keepers, id_col, "left_semi")


def paragraph_dedup_bipartite_bloom(
    history: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dedup_within_new: bool = True,
    out_col: str = "clean",
    fpp: float = 0.01,
    exact: bool = True,
    bloom=None,
) -> DataFrame:
    """:func:`paragraph_dedup_bipartite` through a Bloom filter — the
    Dolma paragraph route (Soldaini et al. 2024 §2.2 dedupes both
    documents AND paragraphs against the same kind of Bloom state).
    Output contract is unchanged: ``(id, clean, n_paras, n_kept)``
    for every NEW row.

    ``exact=True``: Bloom-negative paragraphs (definitely unseen)
    bypass the history anti-join; only the positive sliver is
    verified exactly, so the result matches the hash-join twin
    row-for-row and false positives cost a candidate-row join, never
    a lost paragraph. ``exact=False``: Dolma's one-sided trade —
    positives excise unverified, ~fpp of genuinely-new paragraphs
    vanish, and the history is never joined at all (its only
    per-cycle footprint is the broadcast bit array). Prebuild the
    filter once per corpus with :func:`~..sketches.bloom_build` over
    the normalized-paragraph keys and pass it as ``bloom`` to skip
    the history scan entirely.

    Scale shape vs the hash-join twin: the twin anti-joins EVERY new
    paragraph occurrence against #distinct-history-paragraph hashes;
    here the shard stream is probed map-side (Arrow-batched bit
    tests, zero shuffle) and only candidates — duplicate rate + fpp
    — reach a shuffle. The within-shard keep-first aggregation is
    shard-sized either way. The probe column evaluates once per
    branch (negatives / candidates): two passes over the shard-sized
    paragraph explode, both shuffle-free.
    """
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build

    hist_keys = _para_history_keys(history, text_col)
    if bloom is None:
        bloom = bloom_build(hist_keys, "__k", fpp=fpp)
    base, keyed = _paragraphs_keyed(new, id_col, text_col)
    mc = bloom.might_contain("__k")
    if exact:
        fresh = keyed.filter(~mc).unionByName(
            keyed.filter(mc).join(hist_keys, "__k", "left_anti")
        )
    else:
        fresh = keyed.filter(~mc)
    kept = _keep_first(fresh) if dedup_within_new else fresh
    return _reassemble_paragraphs(base, kept, out_col)
