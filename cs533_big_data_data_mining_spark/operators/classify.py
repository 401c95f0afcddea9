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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.operators.quality import (
    _gram_bucket,
    _ngrams_concat,
)

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
) -> DataFrame:
    """Fit a multinomial Naive Bayes model over hashed word
    {1..max_n}-gram occurrences.

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
      hash=<hash_buckets>"``: :func:`nb_classify` verifies its own
      feature-space parameters against it, so scoring a reloaded
      model with mismatched ``n_buckets``/``max_n``/``hash_buckets``
      raises instead of silently producing near-prior-only garbage.

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
    B = int(n_buckets)

    from cs533_big_data_data_mining_spark.operators.dedup import _spread

    base = _spread(
        train.filter(F.col(label_col).isNotNull()).select(
            F.col(label_col).cast("string").alias("label"),
            F.col(text_col).alias("__t"),
        )
    )

    # per-(label, bucket) gram-occurrence counts — explode ->
    # map-side-combinable groupBy ending at <= k*B rows
    cnt = (
        base.select("label", F.explode(_ngrams_concat("__t", max_n)).alias("g"))
        .select("label", _gram_bucket("g", hash_buckets, n_buckets).alias("b"))
        .groupBy("label", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    # per-label doc counts define the label universe: a label whose
    # docs are all empty still gets prior + missing rows (tot = 0)
    docs = base.groupBy("label").agg(F.count(F.lit(1)).alias("nd"))
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
        [(f"nb:B={B};max_n={int(max_n)};hash={hash_buckets}", NB_META_BUCKET, 0.0)],
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
    want = f"nb:B={int(n_buckets)};max_n={int(max_n)};hash={hash_buckets}"
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

    ex = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__t"))).select(
        "id", F.explode(_ngrams_concat("__t", max_n)).alias("g")
    )
    joined = ex.select("id", _gram_bucket("g", hash_buckets, n_buckets).alias("b")).join(
        ratio, "b", "left"
    )
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
