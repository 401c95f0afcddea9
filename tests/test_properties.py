"""Hypothesis property tests: randomized inputs against exact
single-node oracles. Few examples per property (each example runs
Spark jobs), but unconstrained shapes — these catch the corner
geometry/timing cases the fixed fixtures don't.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.oracle import seq_dbscan

_slow = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _canonical(labels: np.ndarray) -> np.ndarray:
    """Relabel clusters by first appearance so comparisons are
    id-scheme independent (noise 0 stays 0)."""
    out = np.zeros_like(labels)
    mapping: dict[int, int] = {}
    for i, v in enumerate(labels):
        if v == 0:
            continue
        if v not in mapping:
            mapping[v] = len(mapping) + 1
        out[i] = mapping[v]
    return out


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(10, 120),
    d=st.integers(1, 4),
    eps=st.floats(0.05, 0.5),
    min_pts=st.integers(1, 6),
    parts=st.sampled_from([1, 3, 7]),
)
def test_dbscan_matches_sequential_oracle(spark, seed, n, d, eps, min_pts, parts):
    from cs533_big_data_data_mining_spark.operators.dbscan import dbscan

    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, size=(n, d))
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "xs": list(x)})
    df = spark.createDataFrame(pdf).repartition(parts)
    got = (
        dbscan(df, eps=float(eps), min_pts=int(min_pts), dims=d)
        .orderBy("id")
        .select("cluster_id")
        .toPandas()["cluster_id"]
        .to_numpy()
    )
    want = seq_dbscan(x, float(eps), int(min_pts))
    assert np.array_equal(_canonical(got), _canonical(want))


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_users=st.integers(1, 5),
    n_events=st.integers(1, 60),
    gap_minutes=st.sampled_from([5, 30]),
)
def test_sessionize_invariants(spark, seed, n_users, n_events, gap_minutes):
    from cs533_big_data_data_mining_spark.streaming.sessions import sessionize

    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": [
                base + pd.Timedelta(seconds=int(t))
                for t in rng.integers(0, 86_400, size=n_events)
            ],
            "user_id": rng.integers(0, n_users, size=n_events).astype(np.int64),
            "value": np.round(rng.uniform(0, 10, size=n_events), 2),
        }
    )
    out = sessionize(
        spark.createDataFrame(ev), gap=f"{gap_minutes} minutes"
    ).toPandas()

    gap = pd.Timedelta(minutes=gap_minutes)
    # sessions partition the events exactly
    assert out["n_events"].sum() == n_events
    for uid, gpd in out.groupby("user_id"):
        gpd = gpd.sort_values("session_start")
        # within a session: start <= end; events fit inside
        assert (gpd["session_start"] <= gpd["session_end"]).all()
        # between consecutive sessions of one user: gap strictly exceeded
        starts = gpd["session_start"].to_numpy()
        ends = gpd["session_end"].to_numpy()
        assert ((starts[1:] - ends[:-1]) > gap.to_timedelta64()).all()
    # value conservation (decimal-exact)
    assert abs(out["value_sum"].sum() - ev["value"].sum()) < 1e-6


@_slow
@given(seed=st.integers(0, 2**31 - 1), n_docs=st.integers(4, 30))
def test_minhash_pairs_subset_of_exact_jaccard(spark, seed, n_docs):
    from cs533_big_data_data_mining_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(n_docs):
        k = rng.integers(5, 15)
        docs.append((i, " ".join(rng.choice(vocab, size=k))))
    # plant a near-duplicate pair
    docs.append((n_docs, docs[0][1] + " extra"))
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))

    exact = {
        (r["a"], r["b"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    mh = {
        (r["a"], r["b"])
        for r in minhash_dedup_pairs(df, "doc_id", "text", n=2, threshold=0.5).collect()
    }
    # verification makes MinHash precise: candidates are filtered by
    # exact jaccard, so the result is always a subset of exact pairs
    assert mh <= exact


def test_empty_inputs_yield_empty_results(spark):
    """Every batch operator must return an empty frame (not raise) on
    an empty input — the shape a filter-everything upstream stage
    produces at the head of a real pipeline."""
    from cs533_big_data_data_mining_spark.operators.curate import curate_documents
    from cs533_big_data_data_mining_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
        simhash_neardup_pairs,
    )
    from cs533_big_data_data_mining_spark.operators.dbscan import dense_index
    from cs533_big_data_data_mining_spark.operators.similarity import (
        cosine_topk_bruteforce,
        embedding_neardup_pairs,
    )
    from cs533_big_data_data_mining_spark.operators.tfidf import tf_idf
    from cs533_big_data_data_mining_spark.streaming.sessions import sessionize

    ed = spark.createDataFrame([], "doc_id long, text string")
    ee = spark.createDataFrame([], "vec_id long, embedding array<double>")
    vv = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1])], "vec_id long, embedding array<double>"
    )
    eev = spark.createDataFrame([], "user_id long, ts timestamp, value double, event_id long")

    assert exact_dedup(ed, "doc_id", "text").count() == 0
    assert ngram_jaccard_pairs(ed, "doc_id", "text").count() == 0
    assert minhash_dedup_pairs(ed, "doc_id", "text").count() == 0
    assert simhash_neardup_pairs(ed, "doc_id", "text").count() == 0
    assert curate_documents(ed).count() == 0
    assert tf_idf(ed, "doc_id", "text").count() == 0
    assert dense_index(spark.createDataFrame([], "v long"), "v").count() == 0
    assert cosine_topk_bruteforce(vv, ee, 5).count() == 0
    assert cosine_topk_bruteforce(ee, vv, 5).count() == 0
    assert embedding_neardup_pairs(ee, 0.5).count() == 0
    assert sessionize(eev).count() == 0


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_left=st.integers(1, 30),
    n_right=st.integers(0, 30),
    n_keys=st.integers(1, 4),
    parts=st.sampled_from([1, 3, 7]),
)
def test_asof_join_matches_bruteforce(spark, seed, n_left, n_right, n_keys, parts):
    """asof_join == per-row brute force: the right row with the max
    (ts, order) among same-key rows with ts <= left.ts."""
    import datetime

    from cs533_big_data_data_mining_spark.operators.asof import asof_join

    rng = np.random.default_rng(seed)
    base = datetime.datetime(2024, 1, 1)
    # coarse second grid so ts collisions actually happen
    lrows = [
        (i, int(rng.integers(0, n_keys)), base + datetime.timedelta(seconds=int(rng.integers(0, 15))))
        for i in range(n_left)
    ]
    rrows = [
        (100 + j, int(rng.integers(0, n_keys)),
         base + datetime.timedelta(seconds=int(rng.integers(0, 15))), float(j))
        for j in range(n_right)
    ]
    left = spark.createDataFrame(lrows, "event_id long, user_id long, ts timestamp").repartition(parts)
    right = spark.createDataFrame(
        rrows or [], "event_id long, user_id long, ts timestamp, value double"
    ).repartition(parts)
    got = {
        r["event_id"]: r["r_event_id"]
        for r in asof_join(left, right, "user_id", "ts", "event_id", ["event_id", "value"]).collect()
    }
    for lid, lkey, lts in lrows:
        cands = [(rts, rid) for rid, rkey, rts, _ in rrows if rkey == lkey and rts <= lts]
        want = max(cands)[1] if cands else None
        assert got[lid] == want, (lid, got[lid], want)


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 60),
    seq_len=st.integers(1, 20),
    parts=st.sampled_from([1, 3, 7]),
)
def test_pack_sequences_matches_cumsum(spark, seed, n, seq_len, parts):
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.packing import pack_sequences

    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 12, size=n)
    rows = [(int(i), int(c)) for i, c in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, n long").repartition(parts)
    out = {
        r["id"]: (r["start_offset"], r["bin_start"], r["bin_end"])
        for r in pack_sequences(df, "doc_id", seq_len, count_expr=F.col("n")).collect()
    }
    start = 0
    for i, c in enumerate(counts):
        bs = start // seq_len
        be = (start + max(int(c) - 1, 0)) // seq_len
        assert out[i] == (start, bs, be), (i, out[i], (start, bs, be))
        start += int(c)


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 60),
    boundset=st.lists(st.integers(-5, 70), max_size=12),
)
def test_pack_sequences_invariant_to_adversarial_bounds(spark, seed, n, boundset):
    """The result is a pure function of the data — ANY bucket-bound
    list (empty, duplicated, outside the id range, off-by-one at id
    edges) yields the identical offsets, and validate=True agrees
    (round-5 verdict #1c)."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.packing import pack_sequences

    rng = np.random.default_rng(seed)
    counts = rng.integers(0, 12, size=n)
    df = spark.createDataFrame(
        [(int(i), int(c)) for i, c in enumerate(counts)], "doc_id long, n long"
    )
    got = {
        r["id"]: r["start_offset"]
        for r in pack_sequences(
            df, "doc_id", 7, count_expr=F.col("n"), bounds=boundset, validate=True
        ).collect()
    }
    start = 0
    for i, c in enumerate(counts):
        assert got[i] == start, (i, got[i], start)
        start += int(c)


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 300),
    n_keys=st.integers(1, 40),
    frac=st.sampled_from([0.05, 0.1, 0.25]),
    parts=st.sampled_from([1, 3, 8]),
)
def test_local_heavy_candidates_always_superset(spark, seed, n, n_keys, frac, parts):
    """Per-partition local-frequency candidates contain EVERY true
    heavy hitter for any data, threshold, and partitioning (the
    weighted-average guarantee heavy_hitters now relies on instead of
    a full-cardinality distinct)."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.sketches import _local_heavy_candidates

    rng = np.random.default_rng(seed)
    # zipf-ish skew so true hitters exist often
    vals = [f"k{int(v)}" for v in rng.zipf(1.5, size=n) % n_keys]
    df = spark.createDataFrame([(v,) for v in vals], "v string").repartition(parts)
    thr = int(n * frac)  # heavy_hitters' truncated threshold
    from collections import Counter

    true_hh = {k for k, c in Counter(vals).items() if c >= thr}
    cands = {
        r["__item"] for r in _local_heavy_candidates(df, F.col("v"), thr, n).collect()
    }
    assert true_hh <= cands, (true_hh - cands, frac, parts)


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(1, 40),
    vocab=st.integers(1, 8),
    max_df=st.integers(1, 10),
)
def test_remove_boilerplate_matches_bruteforce(spark, seed, n_docs, vocab, max_df):
    """Operator output equals the per-doc brute-force recomputation
    (count distinct docs per line, drop over-threshold lines, join in
    order) for random corpora with heavy line overlap."""
    from cs533_big_data_data_mining_spark.operators.quality import (
        remove_boilerplate_lines,
    )

    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n_docs):
        n_lines = int(rng.integers(1, 6))
        docs.append((i, "\n".join(f"line{int(rng.integers(0, vocab))}" for _ in range(n_lines))))
    from collections import defaultdict

    doc_freq: dict[str, set] = defaultdict(set)
    for i, text in docs:
        for ln in text.split("\n"):
            doc_freq[ln].add(i)
    expect = {
        i: "\n".join(ln for ln in text.split("\n") if len(doc_freq[ln]) <= max_df)
        for i, text in docs
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["id"]: r["clean"]
        for r in remove_boilerplate_lines(df, "doc_id", "text", max_df).collect()
    }
    assert got == expect


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_tokens=st.integers(0, 60),
    chunk=st.integers(1, 12),
    stride=st.integers(1, 12),
)
def test_chunk_documents_matches_bruteforce(spark, seed, n_tokens, chunk, stride):
    """Chunk windows equal the brute-force token slicing for any
    (chunk, stride) — full coverage, correct overlap, short tail."""
    from cs533_big_data_data_mining_spark.operators.packing import chunk_documents

    rng = np.random.default_rng(seed)
    toks = [f"w{int(v)}" for v in rng.integers(0, 50, size=n_tokens)]
    df = spark.createDataFrame([(0, " ".join(toks)), (1, None), (2, "")],
                               "doc_id long, text string")
    got = {
        (r["id"], r["chunk_idx"]): (r["n_tokens"], r["chunk"])
        for r in chunk_documents(df, "doc_id", "text", chunk, stride).collect()
    }
    assert not any(i in (1, 2) for i, _ in got)      # null/empty -> no chunks
    if n_tokens == 0:
        assert got == {}
        return
    n_chunks = (
        min(
            (max(n_tokens - chunk, 0) + stride - 1) // stride,
            (n_tokens - 1) // stride,
        )
        + 1
    )
    expect = {}
    for i in range(n_chunks):
        window = toks[i * stride : i * stride + chunk]
        expect[(0, i)] = (len(window), " ".join(window))
    assert got == expect
    assert all(n > 0 for n, _ in got.values())      # never an empty chunk
    # every token position covered by at least one window when
    # stride <= chunk (the overlap regime)
    if stride <= chunk:
        covered = set()
        for i in range(n_chunks):
            covered.update(range(i * stride, min(i * stride + chunk, n_tokens)))
        assert covered == set(range(n_tokens))


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(1, 120),
    n_groups=st.integers(1, 5),
    keep=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
)
def test_quantile_filter_by_matches_bruteforce(spark, seed, n, n_groups, keep):
    """Per-group survivors equal the brute-force per-group
    interpolated-percentile threshold for random data (ties at the
    threshold all survive)."""
    from cs533_big_data_data_mining_spark.operators.quality import quantile_filter_by

    rng = np.random.default_rng(seed)
    rows = [
        (i, f"g{int(rng.integers(0, n_groups))}", float(rng.integers(0, 20)))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, s double")
    got = {(r["grp"], r["id"]) for r in quantile_filter_by(df, "s", keep, "grp").collect()}
    expect = set()
    from collections import defaultdict

    by_grp = defaultdict(list)
    for i, g, s in rows:
        by_grp[g].append((i, s))
    for g, members in by_grp.items():
        vals = sorted(s for _, s in members)
        # numpy 'linear' interpolation == Spark percentile == DuckDB quantile_cont
        thr = float(np.percentile(vals, (1 - keep) * 100, method="linear"))
        expect |= {(g, i) for i, s in members if s >= thr}
    assert got == expect


def test_pack_validate_fires_on_divergence(spark):
    """The assert-don't-trust validator must RAISE when the offsets
    diverge from the totals job — proven by feeding it corrupted
    expectations (a silent pass here would mean the invariant is
    decorative)."""
    import pytest
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.packing import (
        PackingInvariantError,
        _validate_offsets,
        pack_sequences,
    )

    df = spark.createDataFrame([(i, 5) for i in range(20)], "doc_id long, n long")
    out = pack_sequences(df, "doc_id", 7, count_expr=F.col("n"), bounds=[9])
    # good expectations pass silently
    _validate_offsets(out, [9], {0: 0, 1: 50}, {0: 50, 1: 50})
    # shifted offset: the per-bucket chaining check must fire
    with pytest.raises(PackingInvariantError, match="min offset"):
        _validate_offsets(out, [9], {0: 0, 1: 49}, {0: 50, 1: 50})
    # wrong bucket total: the token-sum check must fire
    with pytest.raises(PackingInvariantError, match="token sum"):
        _validate_offsets(out, [9], {0: 0, 1: 50}, {0: 50, 1: 51})
    # duplicate ids (ambiguous ordering) must be rejected
    dup = out.union(out.limit(1))
    with pytest.raises(PackingInvariantError, match="duplicate ids"):
        _validate_offsets(dup, [9], {0: 0, 1: 50}, {0: 50, 1: 50})


def test_dense_index_validate_fires_and_null_contract(spark):
    import pytest

    from cs533_big_data_data_mining_spark.operators.dbscan import (
        DenseIndexInvariantError,
        _validate_dense,
        dense_index,
    )

    df = spark.createDataFrame([(v,) for v in (3, 1, 7, 5)], "v long")
    out = dense_index(df, "v", validate=True)
    assert {r["v"]: r["dense_id"] for r in out.collect()} == {1: 1, 3: 2, 5: 3, 7: 4}
    # corrupted expectations: each invariant class must fire
    with pytest.raises(DenseIndexInvariantError, match="rows"):
        _validate_dense(out, "v", "dense_id", [], {0: 0}, {0: 3})
    with pytest.raises(DenseIndexInvariantError, match="id range"):
        _validate_dense(out, "v", "dense_id", [], {0: 1}, {0: 4})
    # null values: explicit contract error, not a downstream TypeError
    withnull = spark.createDataFrame([(1,), (None,)], "v long")
    with pytest.raises(ValueError, match="null values"):
        dense_index(withnull, "v")


def test_empty_inputs_round5_ops(spark):
    """Round-5 operators on empty / degenerate inputs: empty frames
    out, no exceptions (filter-everything upstream shape)."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.asof import asof_join
    from cs533_big_data_data_mining_spark.operators.decontaminate import decontaminate
    from cs533_big_data_data_mining_spark.operators.packing import pack_sequences
    from cs533_big_data_data_mining_spark.operators.quality import (
        balance_sources,
        quantile_filter,
        repetition_stats,
    )
    from cs533_big_data_data_mining_spark.operators.similarity import (
        knn_classify,
        label_centroids,
    )

    ed = spark.createDataFrame([], "doc_id long, text string")
    es = spark.createDataFrame([], "doc_id long, source string")
    ee = spark.createDataFrame([], "vec_id long, embedding array<double>, label int")
    ve = spark.createDataFrame(
        [(0, [1.0, 0.0], 1)], "vec_id long, embedding array<double>, label int"
    )
    eev = spark.createDataFrame([], "event_id long, user_id long, ts timestamp, value double")

    assert decontaminate(ed, ed, "doc_id", "text").count() == 0
    assert repetition_stats(ed, "doc_id", "text").count() == 0
    assert balance_sources(es, "doc_id", "source", 5).count() == 0
    assert quantile_filter(spark.createDataFrame([], "id long, s double"), "s", 0.5).count() == 0
    assert pack_sequences(ed, "doc_id", 128).count() == 0
    assert label_centroids(ee).count() == 0
    assert knn_classify(ve, ee, 3).count() == 0      # no queries
    assert knn_classify(ee, ve, 3).count() == 0      # empty corpus
    assert asof_join(
        eev.select("event_id", "user_id", "ts"), eev, "user_id", "ts", "event_id", ["value"]
    ).count() == 0


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n=st.integers(0, 400),
    spread=st.integers(1, 10**9),
    parts=st.sampled_from([1, 3, 7]),
)
def test_dense_index_matches_rank(spark, seed, n, spread, parts):
    """dense_index == 1-based rank of the distinct values in ascending
    order, for any input partitioning (value-derived buckets: no
    dependence on physical partition identity)."""
    from cs533_big_data_data_mining_spark.operators.dbscan import dense_index

    rng = np.random.default_rng(seed)
    vals = rng.integers(-spread, spread, size=n).tolist()
    df = spark.createDataFrame([(int(v),) for v in vals] or [], "v long").repartition(parts)
    got = {r["v"]: r["dense_id"] for r in dense_index(df, "v").collect()}
    want = {v: i + 1 for i, v in enumerate(sorted(set(vals)))}
    assert got == want


def test_lm_perplexity_brute_force(spark):
    """lm_perplexity matches a pure-Python reimplementation of the
    smoothed bigram model on a random corpus (decimal-summed terms,
    identical rounding discipline)."""
    import decimal
    import math
    import random

    from cs533_big_data_data_mining_spark.operators.quality import lm_perplexity

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15))))
        for i in range(30)
    ]

    # brute force
    from collections import Counter

    uni = Counter()
    big = Counter()
    for _, text in docs:
        toks = text.split()
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    n_total = sum(uni.values())
    v = len(uni) + 1
    a = 0.5

    expect = {}
    for i, text in docs:
        toks = text.split()
        if not toks:
            expect[i] = (0, None, None)
            continue
        terms = [round(math.log((uni[toks[0]] + a) / (n_total + a * v)), 9)]
        for prev, w in zip(toks, toks[1:]):
            terms.append(round(math.log((big[(prev, w)] + a) / (uni[prev] + a * v)), 9))
        s = sum(decimal.Decimal(f"{t:.9f}") for t in terms)
        avg = round(float(s) / len(toks), 6)
        expect[i] = (len(toks), avg, round(math.exp(-avg), 6))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.id: (r.n_tokens, r.avg_logp, r.ppl) for r in lm_perplexity(df).collect()}
    assert got == expect


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(1, 24),
    vocab=st.integers(2, 8),
    doc_len=st.integers(0, 30),
)
def test_gopher_rules_random_oracle(spark, seed, n_docs, vocab, doc_len):
    """gopher_rules vs its plain-Python twin on random small-vocab
    text (small vocab => frequent stopword/symbol/bullet collisions)."""
    from tests.test_curation_ops import _gopher_expected
    from cs533_big_data_data_mining_spark.operators.quality import gopher_rules

    rng = np.random.default_rng(seed)
    words = ["the", "of", "and", "#", "...", "word", "-", "…"][:vocab]
    rows = []
    for i in range(n_docs):
        toks = rng.choice(words, size=int(rng.integers(0, doc_len + 1)))
        # random newlines make multi-line docs
        sep = np.where(rng.random(len(toks)) < 0.15, "\n", " ")
        rows.append((i, "".join(t + s for t, s in zip(toks, sep)).rstrip()))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in gopher_rules(df, "id", "text").collect()}
    for i, text in rows:
        exp = _gopher_expected(text)
        n, mean_len, hashr, ellr, bullet, ell, alpha, hits = exp
        r = got[i]
        assert r["n_words"] == n, (i, text)
        for col, want in [
            ("mean_word_len", mean_len), ("hash_ratio", hashr), ("ellipsis_ratio", ellr),
            ("bullet_frac", bullet), ("ellipsis_frac", ell), ("alpha_frac", alpha),
        ]:
            if want is None:
                assert r[col] is None, (i, col, text)
            else:
                assert abs(r[col] - want) < 1e-6, (i, col, text)
        assert r["stopword_hits"] == hits, (i, text)


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(2, 12),
    vocab=st.integers(3, 10),
    k=st.integers(2, 4),
)
def test_remove_duplicated_spans_random_oracle(spark, seed, n_docs, vocab, k):
    """Span removal vs the brute-force twin on random tiny-vocab docs
    (tiny vocab => dense accidental k-gram repeats, multi-span docs)."""
    from tests.test_curation_ops import _remove_spans_expected
    from cs533_big_data_data_mining_spark.operators.dedup import remove_duplicated_spans

    rng = np.random.default_rng(seed)
    words = [f"w{j}" for j in range(vocab)]
    rows = [
        (i, " ".join(rng.choice(words, size=int(rng.integers(0, 25)))))
        for i in range(n_docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r["clean"] for r in remove_duplicated_spans(df, k=k).collect()}
    exp = _remove_spans_expected(rows, k)
    assert got == exp


def _rep_expected(text: str):
    """Plain-Python twin of gopher_repetition's eleven signals —
    pins the round-9 sorted-array rewrite against the definition."""
    import re
    from collections import Counter

    PACK = 1_000_000_000
    toks = text.split()
    tok_chars = sum(len(t) for t in toks)

    def stats(units, off):
        if not units:
            return None
        c = Counter(units)
        n = len(units)
        du = sum(v - 1 for v in c.values() if v > 1)
        dc = sum((v - 1) * (len(u) - off) for u, v in c.items() if v > 1)
        tp = max(v * PACK + (len(u) - off) for u, v in c.items())
        return n, du, dc, tp

    def tot_chars(units, off):
        return sum(len(u) - off for u in units)

    lines = [x.strip(" ") for x in text.split("\n")]
    lines = [x for x in lines if x]
    paras = [x.strip(" ") for x in re.split(r"\n{2,}", text)]
    paras = [x for x in paras if x]
    out = {}
    for kind, units in (("line", lines), ("para", paras)):
        s = stats(units, 0)
        if s is None:
            out[f"dup_{kind}_frac"] = out[f"dup_{kind}_char_frac"] = None
        else:
            n, du, dc, _ = s
            out[f"dup_{kind}_frac"] = du / n
            out[f"dup_{kind}_char_frac"] = dc / tot_chars(units, 0)
    for n_ in (2, 3, 4):
        grams = [" ".join(toks[i : i + n_]) for i in range(len(toks) - n_ + 1)]
        s = stats(grams, n_ - 1)
        if s is None:
            out[f"top_{n_}gram_char_frac"] = None
        else:
            _, _, _, tp = s
            mc, ml = divmod(tp, 1_000_000_000)
            out[f"top_{n_}gram_char_frac"] = mc * ml / tok_chars if mc > 1 else 0.0
    for n_ in range(5, 11):
        grams = [" ".join(toks[i : i + n_]) for i in range(len(toks) - n_ + 1)]
        s = stats(grams, n_ - 1)
        if s is None:
            out[f"dup_{n_}gram_char_frac"] = None
        else:
            _, _, dc, _ = s
            out[f"dup_{n_}gram_char_frac"] = min(1.0, dc / tok_chars)
    thr = {
        "dup_line_frac": 0.30, "dup_para_frac": 0.30,
        "dup_line_char_frac": 0.20, "dup_para_char_frac": 0.20,
        "top_2gram_char_frac": 0.20, "top_3gram_char_frac": 0.18,
        "top_4gram_char_frac": 0.16,
    }
    thr.update({f"dup_{n_}gram_char_frac": t for n_, t in zip(range(5, 11), (0.15, 0.14, 0.13, 0.12, 0.11, 0.10))})
    # round to 6 dp before gating, like the operator (a raw ratio a
    # hair over a threshold can round back onto it)
    out["keep"] = all(
        not (round(v, 6) > t) for (k, t) in thr.items() if (v := out[k]) is not None
    )
    return out


@_slow
@given(
    seed=st.integers(0, 2**31 - 1),
    n_docs=st.integers(2, 10),
    vocab=st.integers(2, 6),
    doc_len=st.integers(0, 50),
)
def test_gopher_repetition_random_oracle(spark, seed, n_docs, vocab, doc_len):
    """gopher_repetition (round-9 sorted-array rewrite) vs a plain
    Counter-based Python twin on tiny-vocab random text — tiny vocab
    forces heavy line/gram collisions, the operator's whole subject."""
    from cs533_big_data_data_mining_spark.operators.quality import gopher_repetition

    rng = np.random.default_rng(seed)
    words = ["aa", "bb", "c", "dddd", "ee", "f"][:vocab]
    rows = []
    for i in range(n_docs):
        toks = rng.choice(words, size=int(rng.integers(0, doc_len + 1)))
        seps = rng.choice([" ", "\n", "\n\n"], p=[0.8, 0.12, 0.08], size=len(toks))
        rows.append((i, "".join(t + s for t, s in zip(toks, seps)).rstrip()))
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r["id"]: r for r in gopher_repetition(df, "id", "text").collect()}
    for i, text in rows:
        exp = _rep_expected(text)
        r = got[i]
        for k, want in exp.items():
            if k == "keep":
                assert r["keep"] == want, (i, k, text, dict(r.asDict()), exp)
            elif want is None:
                assert r[k] is None, (i, k, text)
            else:
                assert r[k] is not None and abs(r[k] - want) < 1.1e-6, (i, k, text, r[k], want)


@given(
    seed=st.integers(0, 2**31 - 1),
    mcs=st.integers(2, 8),
    n=st.integers(0, 12000),
    runs=st.booleans(),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_gif_lzw_roundtrip_hypothesis(seed, mcs, n, runs):
    """Generative LZW coverage beyond the fixed-RNG pytest: random
    alphabets, run-heavy streams (long dictionary chains + the wKwK
    special case), and lengths that force 4096-entry table resets.
    Decode(encode(x)) must be x for every input — the serializer's
    width schedule and the decoder's are the same state machine."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(seed)
    if runs:
        # run-length-heavy: few symbols, long repeats
        pieces = []
        total = 0
        while total < n:
            k = int(rng.integers(1, 200))
            pieces.append(bytes([int(rng.integers(0, 1 << mcs))]) * k)
            total += k
        data = b"".join(pieces)[:n]
    else:
        data = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data, mcs), mcs, n) == data


def test_bloom_dedup_routes_partition_invariance(spark):
    """The Bloom dedup family must be partition-count invariant like
    every other dedup operator: identical survivor sets at 1 vs 7
    partitions on both the exact and the no-verify route (the Bloom
    bits are deterministic, so even the fp-dropped set is stable)."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.dedup import (
        exact_dedup_bipartite_bloom,
        paragraph_dedup_bipartite_bloom,
    )

    hist = spark.createDataFrame(
        [(100 + i, f"hist text {i % 6}\nshared para {i % 4}") for i in range(24)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (i, f"hist text {i}" if i < 6 else f"new text {i}\nshared para {i % 9}")
            for i in range(18)
        ],
        "doc_id long, text string",
    )
    for exact in (True, False):
        one = sorted(
            map(
                tuple,
                exact_dedup_bipartite_bloom(
                    new.coalesce(1), hist.coalesce(1), "doc_id", "text",
                    fpp=0.3, exact=exact,
                ).collect(),
            )
        )
        many = sorted(
            map(
                tuple,
                exact_dedup_bipartite_bloom(
                    new.repartition(7), hist.repartition(5), "doc_id", "text",
                    fpp=0.3, exact=exact,
                ).collect(),
            )
        )
        assert one == many, exact
        p_one = sorted(
            map(
                tuple,
                paragraph_dedup_bipartite_bloom(
                    hist.coalesce(1), new.coalesce(1), "doc_id", "text",
                    fpp=0.3, exact=exact,
                ).collect(),
            )
        )
        p_many = sorted(
            map(
                tuple,
                paragraph_dedup_bipartite_bloom(
                    hist.repartition(5), new.repartition(7), "doc_id", "text",
                    fpp=0.3, exact=exact,
                ).collect(),
            )
        )
        assert p_one == p_many, exact
