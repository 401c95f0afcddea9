"""Supervised hashed-n-gram Naive Bayes text classification.

The model-based document filter of the published LLM-data pipelines:
CCNet / GPT-3 / PaLM score every crawl page with a linear
bag-of-hashed-n-grams classifier trained on labeled examples
(fastText-style — Joulin et al. 2016, "Bag of Tricks for Efficient
Text Classification", public; Wenzek et al. 2020 §4.3; Brown et al.
2020 Appendix A).  Multinomial Naive Bayes over the same hashed
feature space is the closed-form member of that family: training is
pure counting (one distributed aggregation, no gradient steps), and
its binary special case is exactly the DSIR importance log-ratio
(:func:`..quality.dsir_logratio`) — this module generalises it to
k >= 1 labeled classes with priors and argmax prediction, sharing the
gram/bucket definitions so the two can't de-sync.

``nb_train`` fits the model as a SMALL DataFrame (<= k * (B + 2) + 1
rows) that persists like any other table (write/read parquet — the
``ivf_save`` pattern); ``nb_classify`` broadcasts it and scores an
unbounded corpus.

Scale shape (the 100 TB story): the labeled training set is small by
nature (labels are the expensive resource), and its fit is two
explode -> map-side-combinable groupBys ending at <= k*B rows.
Scoring the big corpus is explode -> BROADCAST hash join (the model
frame is bucket-bounded) -> ONE per-doc aggregate — a single shuffle
keyed by doc id, no token-key joins, no skew surface beyond partial
aggregation (the ``dsir_logratio`` shape).  ``hash_buckets="xxhash64"``
is the scale route (one JVM hash per gram); ``"poly31"`` is the
cross-engine route a DuckDB oracle replays exactly.

Determinism: every log-probability rounds to 9 dp in-engine and
per-document sums run as DECIMAL(24,9) (order-independent,
partition-invariant — the ``lm_perplexity`` discipline); final scores
round to 6 dp; prediction ties break to the lexicographically
smallest label.

No counterpart in the reference (no text surface, SURVEY.md §2);
Phase-E extension operator.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.operators.quality import (
    _gram_bucket,
    _ngrams_concat,
)


def _feature_grams(col, max_n: int, grams: str) -> F.Column:
    """ALL {1..max_n}-gram occurrences under the chosen unit:
    ``"word"`` — whitespace tokens (:func:`_ngrams_concat`, the
    DSIR-shared definition); ``"char"`` — raw characters
    (:func:`..functions.text.char_ngrams`), the language-ID feature
    space (character statistics separate languages even on words the
    training seed never saw)."""
    if grams == "word":
        return _ngrams_concat(col, max_n)
    if grams != "char":
        raise ValueError("grams must be 'word' or 'char'")
    from cs533_big_data_data_mining_spark.functions.text import char_ngrams

    gs = char_ngrams(col, 1)
    for k in range(2, int(max_n) + 1):
        gs = F.concat(gs, char_ngrams(col, k))
    return gs


def _char_bucket_rolling(col, max_n: int, n_buckets: int) -> F.Column:
    """poly31 feature BUCKETS of all char {1..max_n}-grams as ONE
    ``array<bigint>`` — bit-identical values to mapping
    :func:`..operators.quality._gram_bucket` over
    ``char_ngrams(col, n)`` (same ``ascii(substring(...))`` per-char
    codes, same fold, same pmod), computed by the ROLLING recurrence
    ``h_n[i] = (h_{n-1}[i] * 31 + cp[i+n-1]) % MOD`` instead of
    re-folding every gram from scratch (guide §4.1: the per-gram
    ``aggregate(sequence(...))`` built one sequence array and one
    fold PER GRAM — ~3x the interpreted-expression work, plus a
    materialized gram string per position that existed only to be
    hashed). Order: all 1-gram buckets, then 2-grams, ... — the same
    concat order as :func:`_feature_grams`; every consumer is an
    order-independent count or DECIMAL sum. NULL/empty text yields
    the same empty/NULL array the gram route produced."""
    from cs533_big_data_data_mining_spark.functions.text import FINGERPRINT_MOD

    c = F.col(col) if isinstance(col, str) else col
    ln = F.length(c)
    mod = F.lit(FINGERPRINT_MOD)
    cps = F.transform(
        F.sequence(F.lit(1), ln),
        lambda i: F.ascii(F.substring(c, i, F.lit(1))).cast("long"),
    )
    hs = [F.transform(cps, lambda x: F.pmod(x, mod))]
    for n in range(2, int(max_n) + 1):
        m = F.greatest(ln - F.lit(n - 1), F.lit(0))
        hs.append(
            F.zip_with(
                F.slice(hs[-1], 1, m),
                F.slice(cps, n, m),
                lambda a, x: F.pmod(a * F.lit(31) + x, mod),
            )
        )
    out = None
    for h in hs:
        b = F.transform(h, lambda x: F.pmod(x, F.lit(int(n_buckets))))
        out = b if out is None else F.concat(out, b)
    return F.when(ln >= 1, out).otherwise(F.array().cast("array<bigint>"))


# sentinel bucket ids inside the model frame (real buckets are >= 0)
NB_PRIOR_BUCKET = -1  # row holds the class log-prior
NB_MISSING_BUCKET = -2  # row holds the unseen-bucket log-likelihood
NB_META_BUCKET = -3  # label carries "nb:B=...;max_n=...;hash=..." (llh unused)


def nb_train(
    train: DataFrame,
    text_col: str,
    label_col: str,
    *,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    max_n: int = 1,
    hash_buckets: str = "poly31",
    grams: str = "word",
    caches: list | None = None,
) -> DataFrame:
    """Fit a multinomial Naive Bayes model over hashed word
    {1..max_n}-gram occurrences (``grams="char"`` switches the
    feature unit to character n-grams — the language-ID space).

    Returns a small model DataFrame ``(label string, b long,
    llh double)``:

    * ``b >= 0`` — add-``alpha``-smoothed ``log P(bucket | label)``
      for each bucket observed under that label,
    * ``b == -1`` (:data:`NB_PRIOR_BUCKET`) — the class log-prior
      ``log((n_docs_label + alpha) / (n_docs + alpha * k))``,
    * ``b == -2`` (:data:`NB_MISSING_BUCKET`) — the label's
      unseen-bucket log-likelihood ``log(alpha / (tot_label +
      alpha * B))``,
    * ``b == -3`` (:data:`NB_META_BUCKET`) — ONE self-description row
      whose ``label`` is ``"nb:B=<n_buckets>;max_n=<max_n>;
      hash=<hash_buckets>;grams=<grams>"``: :func:`nb_classify`
      verifies its own feature-space parameters against it, so
      scoring a reloaded model with mismatched ``n_buckets`` /
      ``max_n`` / ``hash_buckets`` / ``grams`` raises instead of
      silently producing near-prior-only garbage.

    All values round to 9 dp IN-ENGINE (Spark ``round``, HALF_UP —
    the same rounding a DuckDB oracle applies; never Python's
    banker's rounding).  Rows with a NULL label are dropped (labels
    are the supervised signal; a null is an unlabeled example, not a
    class).  NULL/empty text contributes to the prior only.

    The frame is fully lazy and at most ``k * (n_buckets + 2) + 1`` rows
    — persist it with ``model.write.parquet(...)`` and reload for
    later :func:`nb_classify` runs (train once on the labeled sample,
    score every future 100 TB crawl).
    """
    a = float(alpha)
    if a <= 0:
        raise ValueError("alpha must be > 0")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be > 0")
    if max_n < 1:
        raise ValueError("max_n must be >= 1")
    if hash_buckets not in ("poly31", "xxhash64"):
        raise ValueError("hash_buckets must be 'poly31' or 'xxhash64'")
    if grams not in ("word", "char"):
        raise ValueError("grams must be 'word' or 'char'")
    B = int(n_buckets)

    from cs533_big_data_data_mining_spark.operators.dedup import _spread

    # NO pre-aggregate Filter on the label: ``isnotnull(<label expr>)``
    # would be pushed below this select by PushDownPredicates, textually
    # SUBSTITUTING the caller's full label expression into the scan
    # predicate (for langid_train's heuristic seed label that inlining
    # multiplied the plan to ~100 KB per union branch — every task
    # deserialized it, codegen compiled it, AQE stringified it; measured
    # 194 s -> ~5 s on the langid_route_eq fit). Unlabeled rows are
    # dropped instead by (a) a CASE-guarded explode that emits zero
    # gram rows for null labels (no bucket work either — CaseWhen is
    # lazy) and (b) an attribute filter ABOVE the cached doc-count
    # aggregate, which an InMemoryRelation seals against pushdown.
    sel = _spread(
        train.select(
            F.col(label_col).cast("string").alias("label"),
            F.col(text_col).alias("__t"),
        )
    )
    labeled = F.col("label").isNotNull()

    # per-(label, bucket) gram-occurrence counts — explode ->
    # map-side-combinable groupBy ending at <= k*B rows. The char/
    # poly31 feature space explodes ROLLING bucket ids directly
    # (``_char_bucket_rolling`` — bit-identical values, ~3x less
    # expression work, and the exchange carries longs, not gram
    # strings); other spaces keep the gram-string route.
    if grams == "char" and hash_buckets == "poly31":
        buckets = _char_bucket_rolling("__t", max_n, n_buckets)
        gram_buckets = F.explode(
            F.when(labeled, buckets).otherwise(F.array().cast("array<bigint>"))
        ).alias("b")
        cnt = sel.select("label", gram_buckets)
    else:
        gram_arr = F.when(labeled, _feature_grams("__t", max_n, grams)).otherwise(
            F.array().cast("array<string>")
        )
        cnt = sel.select("label", F.explode(gram_arr).alias("g")).select(
            "label", _gram_bucket("g", hash_buckets, n_buckets).alias("b")
        )
    cnt = cnt.groupBy("label", "b").agg(F.count(F.lit(1)).alias("c"))

    # per-label doc counts define the label universe: a label whose
    # docs are all empty still gets prior + missing rows (tot = 0);
    # the null-label group is aggregated (cheap, one group) and
    # filtered out above the cache
    docs_all = sel.groupBy("label").agg(F.count(F.lit(1)).alias("nd"))

    # cache the two SMALL aggregates (<= k*B and k+1 rows): the model
    # union below consumes cnt twice (obs, tot) and docs three times
    # (tot, pri, sizes), and without the cache Catalyst re-expands —
    # and whole-stage-codegen RE-COMPILES — the full input subtree
    # per branch (guide §2.4 shared-exchange rationale; measured 16 s
    # -> ~5 s on the langid_route_eq fit, whose base carries a large
    # constructed-text expression). The caches double as PUSHDOWN
    # BARRIERS: the label-nonnull filter sits above the
    # InMemoryRelation, so it can never be substituted into the scan.
    # The frame itself stays lazy: the caches fill at the caller's
    # first action. Pass ``caches`` to collect the handles and
    # release them after materializing; left alone they hold
    # <= k*(B+1) tiny rows.
    cnt = cnt.cache()
    docs_all = docs_all.cache()
    if caches is not None:
        caches.extend([cnt, docs_all])
    docs = docs_all.filter(labeled)
    tot = (
        docs.join(cnt.groupBy("label").agg(F.sum("c").alias("tot")), "label", "left")
        .select("label", F.coalesce("tot", F.lit(0)).alias("tot"))
    )

    obs = cnt.join(tot, "label").select(
        "label",
        "b",
        F.round(F.log((F.col("c") + F.lit(a)) / (F.col("tot") + F.lit(a * B))), 9).alias("llh"),
    )
    miss = tot.select(
        "label",
        F.lit(NB_MISSING_BUCKET).cast("long").alias("b"),
        F.round(F.log(F.lit(a) / (F.col("tot") + F.lit(a * B))), 9).alias("llh"),
    )
    # k and N are one tiny aggregate; the cross join is 1-row x k-row
    sizes = docs.agg(F.count(F.lit(1)).alias("k"), F.sum("nd").alias("n"))
    pri = docs.crossJoin(F.broadcast(sizes)).select(
        "label",
        F.lit(NB_PRIOR_BUCKET).cast("long").alias("b"),
        F.round(
            F.log((F.col("nd") + F.lit(a)) / (F.col("n") + F.lit(a) * F.col("k"))), 9
        ).alias("llh"),
    )
    from cs533_big_data_data_mining_spark.session import local_df

    meta = local_df(
        train.sparkSession,
        [(
            f"nb:B={B};max_n={int(max_n)};hash={hash_buckets};grams={grams}",
            NB_META_BUCKET,
            0.0,
        )],
        "label string, b long, llh double",
    )
    return obs.unionByName(miss).unionByName(pri).unionByName(meta)


def nb_classify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: DataFrame,
    *,
    n_buckets: int = 4096,
    max_n: int = 1,
    hash_buckets: str = "poly31",
    grams: str = "word",
) -> DataFrame:
    """Score every document against a :func:`nb_train` model and
    predict its class.

    ``n_buckets`` / ``max_n`` / ``hash_buckets`` must match the
    values the model was trained with (they define the feature
    space): a :func:`nb_train` model carries them in its
    :data:`NB_META_BUCKET` row and any mismatch raises; a frame
    without a meta row is trusted except for the detectable
    bucket-id-out-of-range case.

    Returns ``(id, n_grams, pred, score, margin)`` — ``pred`` the
    argmax label (ties break to the lexicographically smallest),
    ``score`` its posterior log-score ``round(prior + sum llh, 6)``,
    ``margin`` the 6-dp gap to the runner-up label (0.0 when k == 1;
    the confidence signal CCNet thresholds on).  NULL/empty documents
    get ``n_grams = 0`` and prior-only scores.

    The model collects to the driver ONCE (bounded by k*(B+2)+1 rows by
    construction) and goes back out as one Arrow-backed broadcast
    side: scoring is explode -> broadcast join -> one per-doc
    aggregate with k DECIMAL sums — a single shuffle on the doc id.
    Per-doc sums are order-independent (DECIMAL(24,9) over
    9-dp-rounded values), so results are partition-invariant.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be > 0")
    if max_n < 1:
        raise ValueError("max_n must be >= 1")
    if hash_buckets not in ("poly31", "xxhash64"):
        raise ValueError("hash_buckets must be 'poly31' or 'xxhash64'")
    if grams not in ("word", "char"):
        raise ValueError("grams must be 'word' or 'char'")

    rows = model.collect()
    pri: dict[str, float] = {}
    missing: dict[str, float] = {}
    obs: dict[tuple[str, int], float] = {}
    metas: list[str] = []
    for r in rows:
        b = int(r["b"])
        if b == NB_PRIOR_BUCKET:
            pri[r["label"]] = float(r["llh"])
        elif b == NB_MISSING_BUCKET:
            missing[r["label"]] = float(r["llh"])
        elif b == NB_META_BUCKET:
            metas.append(r["label"])
        elif b >= 0:
            obs[(r["label"], b)] = float(r["llh"])
        else:
            raise ValueError(f"model frame holds unknown sentinel bucket {b}")
    want = f"nb:B={int(n_buckets)};max_n={int(max_n)};hash={hash_buckets};grams={grams}"
    # pre-round-10 models carry a meta row without the grams field;
    # they were all trained on word grams
    metas = [m + ";grams=word" if ";grams=" not in m else m for m in metas]
    if metas:
        # the nb_train self-description row: a reloaded model scored
        # with different feature-space params must fail loudly, not
        # silently hash grams into buckets the model never saw
        if len(metas) > 1:
            raise ValueError(f"model frame holds {len(metas)} meta rows (corrupt union?)")
        if metas[0] != want:
            raise ValueError(
                f"model/classify feature-space mismatch: model is '{metas[0]}', "
                f"classify called with '{want}'"
            )
    elif any(b >= int(n_buckets) for (_, b) in obs):
        # externally-assembled frame without a meta row: the one
        # mismatch still detectable is a shrunken bucket space
        raise ValueError(
            f"model holds bucket ids >= n_buckets={n_buckets} (trained at a wider B?)"
        )
    labels = sorted(pri)
    if not labels:
        raise ValueError("model has no classes (empty or unlabeled training set?)")
    if sorted(missing) != labels:
        raise ValueError("model is missing unseen-bucket rows for some labels")
    bad = [lb for (lb, _) in obs if lb not in pri]
    if bad:
        raise ValueError(f"model holds bucket rows for unknown labels {sorted(set(bad))[:3]}")

    # one row per bucket observed under ANY label; a label's unseen
    # slots fill with its missing value at the driver (k*B-bounded)
    buckets = sorted({b for (_, b) in obs})
    merged = [
        (b, *[obs.get((lb, b), missing[lb]) for lb in labels]) for b in buckets
    ]
    if not merged:
        # degenerate all-empty training text: no bucket ever joins
        # (real buckets are >= 0), every gram scores as missing
        merged = [(-1, *[missing[lb] for lb in labels])]
    k = len(labels)
    scols = [f"s{i}" for i in range(k)]
    schema = "b long, " + ", ".join(f"{c} double" for c in scols)

    from cs533_big_data_data_mining_spark.operators.dedup import _spread
    from cs533_big_data_data_mining_spark.session import local_df

    ratio = F.broadcast(local_df(df.sparkSession, merged, schema))

    spread = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t")))
    if grams == "char" and hash_buckets == "poly31":
        # rolling bucket ids (bit-identical; see nb_train) — no gram
        # strings are ever materialized on the scoring path
        ex = spread.select(
            "id", F.explode(_char_bucket_rolling("__t", max_n, n_buckets)).alias("b")
        )
    else:
        ex = spread.select(
            "id", F.explode(_feature_grams("__t", max_n, grams)).alias("g")
        ).select("id", _gram_bucket("g", hash_buckets, n_buckets).alias("b"))
    joined = ex.join(ratio, "b", "left")
    per = joined.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        *[
            F.sum(
                F.coalesce(F.col(c), F.lit(missing[lb])).cast("decimal(24,9)")
            ).alias(c)
            for c, lb in zip(scols, labels)
        ],
    )
    all_docs = df.select(F.col(id_col).alias("id")).join(per, "id", "left")
    scores = [
        F.round(
            F.coalesce(F.col(c).cast("double"), F.lit(0.0)) + F.lit(pri[lb]), 6
        )
        for c, lb in zip(scols, labels)
    ]
    best = F.greatest(*scores) if k > 1 else scores[0]
    pred = F.lit(labels[0])
    if k > 1:
        # first match in sorted label order = lexicographic tie-break
        pred = F.when(scores[0] == best, F.lit(labels[0]))
        for s, lb in zip(scores[1:], labels[1:]):
            pred = pred.when(s == best, F.lit(lb))
    if k > 1:
        ordered = F.array_sort(F.array(*scores))
        margin = F.round(best - ordered[k - 2], 6)
    else:
        margin = F.lit(0.0)
    return all_docs.select(
        "id",
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        pred.alias("pred"),
        best.alias("score"),
        margin.alias("margin"),
    )


# ---------------------------------------------------------------------------
# Trained language identification (the fastText-style langid route of
# Dolma / FineWeb / CCNet — Joulin 2016; Soldaini 2024 §2; Penedo 2024
# §3.2 — realized as char-n-gram multinomial NB over this module's own
# machinery). The marker-argmax heuristic
# (functions.text.lang_id) stays the zero-training default and the
# label source for the seed corpus; this route generalizes past the
# marker vocabulary through character statistics.
# ---------------------------------------------------------------------------

#: characters of text that feed the char-gram langid features — both
#: train and score truncate here, so per-document work is O(1) at any
#: corpus scale (language is decidable from a prefix)
LANGID_MAX_CHARS = 512


def langid_seed_label(col, min_hits: int = 2, min_lead: int = 1):
    """High-confidence marker-heuristic label, NULL otherwise — the
    self-labeling gate that turns an unlabeled pool into an NB
    training seed. A document qualifies when its best marker-overlap
    score is >= ``min_hits`` AND leads the runner-up language by >=
    ``min_lead`` (ambiguous or weakly-marked docs stay unlabeled; a
    NULL label is dropped by :func:`nb_train` by contract)."""
    from cs533_big_data_data_mining_spark.functions.text import lang_id, lang_scores

    scores = lang_scores(col)
    langs = sorted(scores)
    svals = [scores[lang] for lang in langs]
    best = F.greatest(*svals)
    runner = F.array_sort(F.array(*svals))[len(langs) - 2]
    return F.when(
        (best >= F.lit(int(min_hits))) & ((best - runner) >= F.lit(int(min_lead))),
        lang_id(col),
    ).otherwise(F.lit(None).cast("string"))


def langid_train(
    df: DataFrame,
    text_col: str,
    *,
    n_buckets: int = 256,
    alpha: float = 0.5,
    max_n: int = 3,
    hash_buckets: str = "poly31",
    max_chars: int = LANGID_MAX_CHARS,
    min_hits: int = 2,
    min_lead: int = 1,
    caches: list | None = None,
) -> DataFrame:
    """Fit the trained langid model from an UNLABELED pool: label the
    high-confidence slice with the marker heuristic
    (:func:`langid_seed_label`), truncate to ``max_chars``, and train
    char-{1..max_n}-gram NB (:func:`nb_train` with ``grams="char"``).

    The result is an ordinary NB model frame — persist/reload with
    parquet (train once on a seed sample, score every future crawl).
    ``max_chars`` is a feature-space parameter: score with the same
    value (:func:`lang_id_nb` shares the default).

    Scale shape: self-labeling is a pure Column gate fused into the
    scan; the fit is nb_train's two map-side-combinable groupBys
    ending at <= k*(B+2)+1 rows. At 100 TB the pool should be sampled
    first (any slice with enough per-language mass works — the CLIs
    pass a fraction) since a seed past ~10^6 docs stops improving a
    256-bucket model."""
    from cs533_big_data_data_mining_spark.operators.dedup import _spread

    # fan the POOL out before the seed-label projection: the heuristic
    # label is a large interpreted-HOF expression, and building it
    # above the repartition lets every core work on it (below, it
    # would run on the handful of scan tasks a small input produces;
    # at 100 TB _spread no-ops and the scan's own parallelism serves)
    seed = _spread(df).select(
        F.substring(F.col(text_col), 1, int(max_chars)).alias("__t"),
        langid_seed_label(F.col(text_col), min_hits, min_lead).alias("__lab"),
    )
    model = nb_train(
        seed,
        "__t",
        "__lab",
        n_buckets=n_buckets,
        alpha=alpha,
        max_n=max_n,
        hash_buckets=hash_buckets,
        grams="char",
        caches=caches,
    )
    # stamp the truncation into the meta row: max_chars IS a
    # feature-space parameter (training saw only the prefix), so a
    # reloaded model scored at a different value must raise, not
    # silently skew — the same contract the B/max_n/hash/grams
    # fields enforce. nb_classify rejects chars-stamped models
    # outright (its scorer does not truncate; langid scoring goes
    # through lang_id_nb).
    return model.withColumn(
        "label",
        F.when(
            F.col("b") == NB_META_BUCKET,
            F.concat(F.col("label"), F.lit(f";chars={int(max_chars)}")),
        ).otherwise(F.col("label")),
    )


def lang_id_nb(
    model: DataFrame, col, *, max_chars: int | None = None, impl: str = "arrow"
):
    """Predicted language of ``col`` — the trained twin of
    :func:`..functions.text.lang_id`, usable anywhere a Column is
    (batch filters, the streaming admission gate: stateless, zero
    shuffle, zero joins — Structured-Streaming-safe under both
    implementations).

    ``impl="arrow"`` (default, the 100 TB route): one vectorized
    Arrow-batched pandas UDF — codepoint arrays, rolling poly31 over
    sliding windows, dense ``(B, k)`` int64 table lookup, EXACT
    integer arithmetic end-to-end (log-likelihoods scale to 1e9-fixed
    point, the argmax compares HALF_UP-rounded integers), so its
    predictions match the column route bit-for-bit; ~100x faster than
    interpreted HOFs (poly31 models only). ``impl="column"`` is the
    pure-Column expression a DuckDB oracle replays exactly — the
    correctness twin; the langid_route_eq driver row pins the two
    routes against each other continuously.

    The model frame (from :func:`langid_train`, or any
    ``grams="char"`` :func:`nb_train` fit) collects ONCE at
    plan-build time — it is bucket-bounded by construction — and its
    per-label log-likelihoods embed as dense constant-folded literal
    ARRAYS indexed by bucket (O(1) per gram per label; a literal map
    would linear-scan). Scoring is one ``transform`` computing each
    gram's bucket, then ONE ``aggregate`` pass accumulating all k
    label sums in a struct accumulator with a finish lambda doing the
    argmax — the whole prediction is a single expression tree with no
    repeated gram traversals.

    Determinism: per-step sums run as DECIMAL(24,9) over the model's
    9-dp-rounded values (order-independent — the nb_classify
    discipline), final scores round to 6 dp, ties break to the
    lexicographically smallest label. NULL/empty text predicts
    ``'und'``; any other text predicts a trained label (a trained
    classifier always answers — unlike the marker heuristic, which
    falls back to 'und' on zero overlap).

    ``max_chars`` defaults to the value stamped in the model's meta
    row (:func:`langid_train` records its truncation there); passing
    one explicitly must MATCH the stamp — a mismatched feature space
    raises instead of silently feeding the scorer more grams than
    training saw. Models without a stamp (a plain ``grams='char'``
    :func:`nb_train` fit) fall back to ``LANGID_MAX_CHARS``."""
    from cs533_big_data_data_mining_spark.functions.text import char_ngrams

    rows = model.collect()
    pri: dict[str, float] = {}
    missing: dict[str, float] = {}
    obs: dict[tuple[str, int], float] = {}
    meta = None
    for r in rows:
        b = int(r["b"])
        if b == NB_PRIOR_BUCKET:
            pri[r["label"]] = float(r["llh"])
        elif b == NB_MISSING_BUCKET:
            missing[r["label"]] = float(r["llh"])
        elif b == NB_META_BUCKET:
            if meta is not None:
                raise ValueError("model frame holds multiple meta rows (corrupt union?)")
            meta = r["label"]
        elif b >= 0:
            obs[(r["label"], b)] = float(r["llh"])
        else:
            raise ValueError(f"model frame holds unknown sentinel bucket {b}")
    if meta is None:
        raise ValueError("lang_id_nb needs an nb_train model (no meta row found)")
    fields = dict(kv.split("=", 1) for kv in meta.removeprefix("nb:").split(";"))
    if fields.get("grams", "word") != "char":
        raise ValueError(f"lang_id_nb wants a grams=char model, got '{meta}'")
    B = int(fields["B"])
    max_n = int(fields["max_n"])
    hash_buckets = fields["hash"]
    stamped = fields.get("chars")
    if stamped is not None:
        if max_chars is not None and int(max_chars) != int(stamped):
            raise ValueError(
                f"model was trained at max_chars={stamped}, "
                f"scored at max_chars={max_chars} — feature-space mismatch"
            )
        max_chars = int(stamped)
    elif max_chars is None:
        max_chars = LANGID_MAX_CHARS
    labels = sorted(pri)
    if not labels:
        raise ValueError("model has no classes (empty or unlabeled training seed?)")
    if sorted(missing) != labels:
        raise ValueError("model is missing unseen-bucket rows for some labels")
    k = len(labels)

    if impl == "arrow":
        if hash_buckets != "poly31":
            raise ValueError("impl='arrow' supports poly31 models only")
        return _lang_id_nb_arrow(
            col, labels, pri, missing, obs, B, max_n, int(max_chars)
        )
    if impl != "column":
        raise ValueError("impl must be 'arrow' or 'column'")

    c = F.col(col) if isinstance(col, str) else col
    t = F.substring(c, 1, int(max_chars))

    if hash_buckets == "xxhash64":
        grams = char_ngrams(t, 1)
        for n in range(2, max_n + 1):
            grams = F.concat(grams, char_ngrams(t, n))
        buckets = F.transform(
            grams, lambda g: F.pmod(F.xxhash64(g), F.lit(B)).cast("int")
        )
    else:
        # rolling poly31 buckets (bit-identical to folding each gram;
        # see _char_bucket_rolling) — the old per-gram
        # aggregate(sequence(...)) fold re-scanned every gram and was
        # the scorer's hottest interpreted expression
        buckets = F.transform(
            _char_bucket_rolling(t, max_n, B), lambda b: b.cast("int")
        )

    # dense per-label llh vectors as TRUE array literals (F.lit of a
    # list — a CreateArray of literal children inside a lambda is NOT
    # constant-folded and re-evaluates per step, measured 8x slower),
    # unseen slots filled with the label's missing value
    dense = [
        F.lit([obs.get((lb, b), missing[lb]) for b in range(B)]) for lb in labels
    ]
    zero = F.struct(
        *[F.lit("0").cast("decimal(24,9)").alias(f"s{i}") for i in range(k)]
    )

    def merge(acc, b):
        return F.struct(
            *[
                (acc[f"s{i}"] + F.element_at(dense[i], b + 1).cast("decimal(24,9)"))
                .cast("decimal(24,9)")
                .alias(f"s{i}")
                for i in range(k)
            ]
        )

    def finish(acc):
        scores = [
            F.round(acc[f"s{i}"].cast("double") + F.lit(pri[lb]), 6)
            for i, lb in enumerate(labels)
        ]
        best = F.greatest(*scores) if k > 1 else scores[0]
        pred = F.lit(labels[-1])
        for s, lb in zip(reversed(scores[:-1]), reversed(labels[:-1])):
            pred = F.when(s == best, F.lit(lb)).otherwise(pred)
        return pred

    return F.when(
        c.isNull() | (F.length(c) == 0), F.lit("und")
    ).otherwise(F.aggregate(buckets, zero, merge, finish))


def _lang_id_nb_arrow(col, labels, pri, missing, obs, B, max_n, max_chars):
    """The vectorized scale implementation behind :func:`lang_id_nb`.

    All arithmetic is exact int64 fixed-point at 1e9 scale: summing
    9-dp log-likelihoods is integer addition (order-independent, no
    float accumulation), and the final 6-dp HALF_UP rounding the
    column route applies becomes ``sign * ((|v| + 500) // 1000)`` —
    the argmax therefore compares the same rounded quantities both
    routes produce. Worst case per doc is O(max_chars * max_n) numpy
    work on the batch's arrays."""
    import numpy as np

    from cs533_big_data_data_mining_spark.functions.text import FINGERPRINT_MOD

    k = len(labels)
    dense = np.empty((B, k), dtype=np.int64)
    for i, lb in enumerate(labels):
        m = round(missing[lb] * 1e9)
        dense[:, i] = m
        for (l2, b), v in obs.items():
            if l2 == lb:
                dense[b, i] = round(v * 1e9)
    pri_i = np.array([round(pri[lb] * 1e9) for lb in labels], dtype=np.int64)
    lab_arr = list(labels)

    def _one(txt):
        if txt is None or len(txt) == 0:
            return "und"
        cps = np.frombuffer(
            txt[:max_chars].encode("utf-32-le"), dtype=np.uint32
        ).astype(np.int64)
        h = cps % FINGERPRINT_MOD
        parts = [h % B]
        for n in range(2, max_n + 1):
            h = (h[:-1] * 31 + cps[n - 1 :]) % FINGERPRINT_MOD
            parts.append(h % B)
        b = np.concatenate(parts)
        tot = dense[b].sum(axis=0) + pri_i
        r6 = np.sign(tot) * ((np.abs(tot) + 500) // 1000)
        # argmax with lexicographically-smallest tie-break: labels are
        # sorted, np.argmax returns the first (= smallest) maximum
        return lab_arr[int(np.argmax(r6))]

    @F.pandas_udf("string")
    def _udf(s: pd.Series) -> pd.Series:  # noqa: F821 (module-level pd)
        return s.map(_one)

    c = F.col(col) if isinstance(col, str) else col
    return _udf(c)
