"""Dedup operators vs brute-force Python oracles."""

import itertools

from cs533_big_data_data_mining_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash64,
    simhash_candidates,
)

BASE = "the quick brown fox jumps over the lazy dog while rain falls on the green hills far away"


def _corpus():
    """Synthetic near-dup corpus: clones with small perturbations +
    unrelated docs."""
    words = BASE.split()
    docs = [(0, BASE)]
    docs.append((1, BASE))                                   # exact dup of 0
    docs.append((2, " ".join(words[:-2])))                   # truncated
    docs.append((3, " ".join(["XX"] + words[1:])))           # 1 word changed
    docs.append((4, "completely different content about spark query engines and shuffles here now"))
    docs.append((5, "another unrelated tiny doc"))
    docs.append((6, BASE.replace("rain", "snow").replace("dog", "cat")))
    return docs


def _jaccard(a: str, b: str, n: int) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def _exact_pairs(docs, n, threshold):
    out = set()
    for (i, a), (j, b) in itertools.combinations(docs, 2):
        if _jaccard(a, b, n) >= threshold:
            out.add((min(i, j), max(i, j)))
    return out


def test_exact_dedup(spark):
    df = spark.createDataFrame(_corpus(), "doc_id long, text string")
    groups = {r["keep_id"]: r["n_dups"] for r in exact_dedup_groups(df, "doc_id", "text").collect()}
    assert groups[0] == 2  # ids 0 and 1 identical
    assert sum(groups.values()) == 7
    kept = {r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect()}
    assert kept == {0, 2, 3, 4, 5, 6}  # 1 dropped (dup of 0, higher id)


def test_ngram_jaccard_matches_bruteforce(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.3).collect()}
    want = _exact_pairs(docs, 3, 0.3)
    assert set(got) == want
    for (a, b), j in got.items():
        assert abs(j - _jaccard(docs[a][1], docs[b][1], 3)) < 1e-6


def test_minhash_lsh_recall(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cands = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df, "doc_id", "text", n=3).collect()}
    # exact dups MUST be candidates (identical signatures)
    assert (0, 1) in cands
    # high-jaccard pairs should be caught at 64/16-band settings
    want = _exact_pairs(docs, 3, 0.7)
    assert want <= cands, f"missed {want - cands}"


def test_minhash_verified_pairs(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["a"], r["b"]): r["jaccard"] for r in minhash_dedup_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()}
    # verification must report exact jaccard for surviving pairs
    for (a, b), j in got.items():
        truth = _jaccard(docs[a][1], docs[b][1], 3)
        assert truth >= 0.5 and abs(j - truth) < 1e-6


def test_simhash_properties(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = {r["id"]: r["simhash"] for r in simhash64(df, "doc_id", "text").collect()}
    assert sigs[0] == sigs[1]  # identical docs -> identical sig
    assert sigs[0] >= 0  # sign bit clear

    def hamming(x, y):
        return bin(x ^ y).count("1")

    # near-dup should be much closer than unrelated
    assert hamming(sigs[0], sigs[3]) < hamming(sigs[0], sigs[4])
    cands = {(r["a"], r["b"]) for r in simhash_candidates(df, "doc_id", "text").collect()}
    assert (0, 1) in cands


def test_simhash_neardup_pairs_exact_recall(spark):
    """simhash_neardup_pairs (bands = d+1) must equal the brute-force
    all-pairs Hamming-<= d set — the pigeonhole recall-1 guarantee —
    with the verified distance exact, for both token hashes."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        simhash64,
        simhash_neardup_pairs,
        simhash_poly31,
    )

    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for token_hash, sig_fn, d in (("xxhash64", simhash64, 6), ("poly31", simhash_poly31, 4)):
        sigs = {r["id"]: r["simhash"] for r in sig_fn(df, "doc_id", "text").collect()}
        want = {
            (a, b): bin(sigs[a] ^ sigs[b]).count("1")
            for a in sigs
            for b in sigs
            if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= d
        }
        got = {
            (r["a"], r["b"]): r["hamming"]
            for r in simhash_neardup_pairs(
                df, "doc_id", "text", max_hamming=d, token_hash=token_hash
            ).collect()
        }
        assert got == want, f"{token_hash}: {set(got) ^ set(want)}"
        assert (0, 1) in got and got[(0, 1)] == 0  # exact dups at distance 0


def test_simhash_poly31_matches_python_reference(spark):
    """simhash_poly31 pinned against a from-scratch Python
    implementation of its spec: token hash = acc*31+codepoint mod
    2^31-1, per-bit tf-weighted votes, sign pack over 31 bits."""
    from cs533_big_data_data_mining_spark.operators.dedup import simhash_poly31

    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["id"]: r["simhash"] for r in simhash_poly31(df, "doc_id", "text").collect()}

    def polyhash(tok):
        acc = 0
        for ch in tok:
            acc = (acc * 31 + ord(ch)) % 2147483647
        return acc

    for doc_id, text in docs:
        toks = [t for t in text.split() if t]
        if not toks:
            continue
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        votes = [0] * 31
        for t, w in tf.items():
            h = polyhash(t)
            for b in range(31):
                votes[b] += w if (h >> b) & 1 else -w
        want = sum(2**b for b in range(31) if votes[b] > 0)
        assert got[doc_id] == want, f"doc {doc_id}: {got[doc_id]} != {want}"


def test_null_text_rows_not_silently_dropped(spark):
    """NULL content must behave like its own dedup group (ANSI GROUP
    BY semantics), not vanish through a never-matching null equality;
    quality_score(NULL) must be 0.0, not the 0.25 that least()'s
    null-ignoring gave it."""
    from cs533_big_data_data_mining_spark.functions.text import quality_score
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "hello world"), (1, None), (2, None), (3, "")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in exact_dedup(df, "doc_id", "text").collect())
    assert kept == [0, 1, 3]  # null group keeps min id 1; 2 is its dup
    q = {r["doc_id"]: r["q"] for r in df.select("doc_id", quality_score("text").alias("q")).collect()}
    assert q[1] == 0.0 and q[2] == 0.0
    assert q[0] > 0.0


def test_prefix_filter_bounds_hot_shingle_candidates(spark):
    """One boilerplate shingle shared by EVERY doc must not produce the
    df^2 candidate blowup: with rare-first prefix ordering the hot
    shingle sorts last and stays out of every (1-t)-prefix, so the
    candidate count stays near the true near-dup count instead of
    N*(N-1)/2. Results must still match brute force exactly (prefix
    filtering is lossless)."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        _prefix_candidates,
        _shingle_index,
    )

    n_docs = 40
    boiler = "click here to subscribe"  # two shared 3-gram shingles
    docs = [
        (i, f"{boiler} unique{i}a unique{i}b unique{i}c unique{i}d unique{i}e unique{i}f")
        for i in range(n_docs)
    ]
    # one genuine near-dup pair on top of the boilerplate corpus
    docs.append((100, docs[0][1]))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sh = _shingle_index(df, "doc_id", "text", 3, None)
    n_cands = _prefix_candidates(sh, 0.8).count()
    # every doc pairs with every other through the hot shingles if the
    # guard is broken: 41*40/2 = 820 candidates. The prefix filter must
    # keep it at the handful of same-size boilerplate collisions.
    assert n_cands <= n_docs, f"hot-shingle blowup: {n_cands} candidates"

    got = {
        (r["a"], r["b"]) for r in ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.8).collect()
    }
    assert got == _exact_pairs(docs, 3, 0.8) == {(0, 100)}


def test_prefix_filter_exactness_random(spark):
    """Prefix-filtered pairs == brute-force pairs on a randomized
    overlapping corpus, across thresholds (the lossless-ness claim)."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(24)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        got = {
            (r["a"], r["b"]): r["jaccard"]
            for r in ngram_jaccard_pairs(df, "doc_id", "text", n=2, threshold=t).collect()
        }
        want = _exact_pairs(docs, 2, t)
        assert set(got) == want, f"t={t}: {set(got) ^ want}"


def test_dedup_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    assert exact_dedup(docs, "doc_id", "text").count() <= n
    # jaccard self-join returns (a<b) pairs only
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2, max_doc_freq=200).collect()
    assert all(r["a"] < r["b"] for r in pairs)


def test_curate_corpus_cross_modal_closure(spark):
    """A chain that ALTERNATES modalities — doc0 ~lexical~ doc1,
    doc1 ~semantic~ doc2 — must collapse to one survivor even though
    no single modality connects 0 and 2."""
    from cs533_big_data_data_mining_spark.operators.curate import curate_corpus

    base = [a + b for a in "abcdef" for b in "abcdef"][:30]
    d1 = base[:-1] + ["zz"]  # near-dup of base lexically (J ~ 0.93)
    docs = [
        (0, " ".join(base)),
        (1, " ".join(d1)),
        (2, " ".join(w + w for w in reversed(base))),  # lexically unrelated
        (3, " ".join(a + b for a in "uvwxyz" for b in "uvwxyz")),  # unrelated
    ]
    embs = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),   # semantically unrelated to everything
        (2, [0.05, 1.0]),  # semantic near-dup of... nothing yet
        (3, [-1.0, 0.1]),
    ]
    # link 1~2 semantically: cos([0,1],[0.05,1]) ~ 0.9988
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    edf = spark.createDataFrame(embs, "vec_id long, embedding array<double>")
    out = sorted(
        r["id"]
        for r in curate_corpus(
            ddf, edf, min_quality=0.0, jaccard_threshold=0.8, cosine_threshold=0.95
        ).collect()
    )
    # component {0,1,2}: 0-1 lexical, 1-2 semantic -> survivor 0; 3 alone
    assert out == [0, 3]


def test_curate_embeddings_transitive(spark):
    """Embedding-space curation drops all but the min id of each
    cosine connected component, TRANSITIVELY: v0~v1~v2 (chain, v0!~v2)
    keeps only v0; the orthogonal vector survives."""
    import math

    from cs533_big_data_data_mining_spark.operators.curate import curate_embeddings

    def rot(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(0, rot(0)), (1, rot(20)), (2, rot(40)), (3, rot(90))]
    # cos(0,1)=cos20~.94, cos(1,2)=.94 >= .9; cos(0,2)=cos40~.77 < .9
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = sorted(r["id"] for r in curate_embeddings(df, threshold=0.9).collect())
    assert got == [0, 3]


def test_curate_documents_pipeline(spark):
    """curate_documents: quality filter, exact-dup removal, and
    TRANSITIVE near-dup removal (0~2, 2~3 but 0!~3 -> one survivor of
    {0,1,2,3}); the unrelated doc and nothing else survives with it."""
    from cs533_big_data_data_mining_spark.operators.curate import curate_documents

    base = [a + b for a in "abcdef" for b in "abcdef"][:30]
    other = [a + b for a in "uvwxyz" for b in "uvwxyz"][:30]
    d2 = base[:-1] + ["zz"]            # 1 shingle off base  -> J(0,2)=27/29~0.93
    d3 = ["zx", "zy", "zw"] + d2[3:]   # 3 shingles off d2   -> J(2,3)=25/31~0.81
    #                                    4 shingles off base -> J(0,3)=24/32=0.75
    docs = [
        (0, " ".join(base)),
        (1, " ".join(base)),       # exact dup of 0
        (2, " ".join(d2)),         # near-dup of 0
        (3, " ".join(d3)),         # near-dup of 2, NOT of 0
        (4, " ".join(other)),      # unrelated
        (5, "1 2 3"),              # low quality (no alpha, no stopwords)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = curate_documents(df, min_quality=0.3, jaccard_threshold=0.8)
    assert sorted(r["id"] for r in out.collect()) == [0, 4]

    # unreachable threshold -> empty near-dup graph (empty-edge CC
    # path): only the exact dup and the low-quality doc drop
    out2 = curate_documents(df, min_quality=0.3, jaccard_threshold=1.01)
    assert sorted(r["id"] for r in out2.collect()) == [0, 2, 3, 4]


def test_minhash_bipartite_matches_bruteforce(spark):
    """Bipartite (incremental) dedup: even-id docs vs odd-id docs ==
    the cross-table subset of the exact all-pairs result."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        minhash_dedup_pairs_bipartite,
    )

    docs = _corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    left, right = df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1")
    got = {
        (r["a"], r["b"])
        for r in minhash_dedup_pairs_bipartite(left, right, "doc_id", "text", n=3, threshold=0.7).collect()
    }
    want = set()
    for (i, a) in docs:
        for (j, b) in docs:
            if i % 2 == 0 and j % 2 == 1 and i != j and _jaccard(a, b, 3) >= 0.7:
                want.add((i, j))
    assert got == want
    # self-id overlap: the same doc id on both sides is not a finding
    both = spark.createDataFrame([(1, "same text here ok"), ], "doc_id long, text string")
    assert minhash_dedup_pairs_bipartite(both, both, "doc_id", "text", threshold=0.1).count() == 0


def test_cms_heavy_hitters_guarantees(spark):
    """CMS: never undercounts; exact hitters always reported; narrow
    sketch still satisfies both (only precision degrades)."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.sketches import (
        cms_build,
        cms_estimates,
        heavy_hitters,
    )

    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [(f"x{i}",) for i in range(5)]
    df = spark.createDataFrame(rows, "v string")
    exact = {r["v"]: r["n"] for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()}

    sketch = cms_build(df, "v", depth=4, width=64)
    ests = {
        r["item"]: r["est"]
        for r in cms_estimates(df.select("v").distinct(), "v", sketch, depth=4, width=64).collect()
    }
    assert set(ests) == set(exact)
    for k, n in exact.items():
        assert ests[k] >= n                      # never undercounts

    hh = {r["item"] for r in heavy_hitters(df, "v", 0.2, depth=4, width=64).collect()}
    assert {"a", "b"} <= hh                      # 50%, 30% both >= 20%
    assert not any(k.startswith("x") and exact[k] == 1 and False for k in hh)

    # tiny width forces collisions: superset property must still hold
    hh_narrow = {r["item"] for r in heavy_hitters(df, "v", 0.2, depth=2, width=4).collect()}
    assert {"a", "b"} <= hh_narrow


def test_cms_sketches_merge(spark):
    """Mergeability — the property that makes CMS worth carrying at
    100 TB (per-shard / per-micro-batch sketches ADD): building on two
    disjoint shards and summing per (d, bucket) equals building on
    the union, exactly."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.sketches import cms_build

    rows = [(f"k{i % 17}",) for i in range(500)]
    df = spark.createDataFrame(rows, "v string").withColumn(
        "half", F.xxhash64("v") % 2 == 0
    )
    full = cms_build(df, "v", depth=3, width=32)
    merged = (
        cms_build(df.filter("half"), "v", depth=3, width=32)
        .unionByName(cms_build(df.filter("NOT half"), "v", depth=3, width=32))
        .groupBy("d", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    got = {(r["d"], r["bucket"]): r["c"] for r in merged.collect()}
    want = {(r["d"], r["bucket"]): r["c"] for r in full.collect()}
    assert got == want


def test_cms_heavy_hitters_verified_exact(spark):
    """verify=True: collision-induced false positives are removed and
    est equals the true count — even with a sketch narrow enough to
    collide everything."""
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.sketches import heavy_hitters

    rows = [("a",)] * 50 + [("b",)] * 30 + [(f"x{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "v string")
    hh = {r["item"]: r["est"] for r in heavy_hitters(df, "v", 0.25, depth=2, width=2, verify=True).collect()}
    assert hh == {"a": 50, "b": 30}


def test_duplicated_spans_known(spark):
    """Hand-checked span merging: exact-dup docs flag everything,
    cross-doc common phrases flag their window, isolated repeats of
    fewer than k tokens flag nothing."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        duplicated_spans,
        span_dup_stats,
    )

    docs = [
        (1, "a b c d e f g h i j"),
        (2, "x x x q w e r t y u COMMON ONE TWO THREE extra tail here"),
        (3, "prefix junk COMMON ONE TWO THREE more unique stuff here now"),
        (4, "a b c d e f g h i j"),
        (5, "self self self self self self self self"),
        (6, "short"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=3).collect()
    }
    assert got == {
        (1, 0, 10, 10),
        (2, 10, 14, 4),   # COMMON ONE TWO THREE
        (3, 2, 6, 4),
        (4, 0, 10, 10),
        (5, 0, 8, 8),     # self-repetition is duplication too
    }
    stats = {r.id: (r.dup_tokens, r.total_tokens, r.dup_frac) for r in span_dup_stats(df, k=3).collect()}
    assert stats[1] == (10, 10, 1.0)
    assert stats[6] == (0, 1, 0.0)
    assert stats[2] == (4, 17, round(4 / 17, 6))

    # hash_grams route: identical on collision-free input
    got_h = {
        (r.id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=3, hash_grams=True).collect()
    }
    assert got_h == got


def test_duplicated_spans_brute_force(spark):
    """Property: matches a pure-Python reimplementation on random
    corpora with planted shared phrases."""
    import random

    from cs533_big_data_data_mining_spark.operators.dedup import duplicated_spans

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(30)]
    phrase = ["P1", "P2", "P3", "P4", "P5", "P6"]
    docs = []
    for i in range(25):
        toks = [rng.choice(vocab) for _ in range(rng.randint(0, 18))]
        if i % 3 == 0:  # plant the shared phrase at a random position
            p = rng.randint(0, len(toks))
            toks = toks[:p] + phrase + toks[p:]
        docs.append((i, " ".join(toks)))
    k = 4

    # brute force
    from collections import Counter

    grams = Counter()
    pos_grams = {}
    for i, text in docs:
        toks = text.split()
        pg = [(p, " ".join(toks[p : p + k])) for p in range(len(toks) - k + 1)]
        pos_grams[i] = pg
        grams.update(g for _, g in pg)
    expect = set()
    for i, _ in docs:
        flagged = sorted(p for p, g in pos_grams[i] if grams[g] >= 2)
        run = []
        for p in flagged:
            if run and p - run[-1] > k:
                expect.add((i, run[0], run[-1] + k, run[-1] + k - run[0]))
                run = []
            run.append(p)
        if run:
            expect.add((i, run[0], run[-1] + k, run[-1] + k - run[0]))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_spans(df, k=k).collect()
    }
    assert got == expect


def test_duplicated_spans_k_validation(spark):
    import pytest

    from cs533_big_data_data_mining_spark.operators.dedup import duplicated_spans

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicated_spans(df, k=0)


def test_duplicated_spans_bipartite(spark):
    """New-shard spans flag history overlap AND intra-shard repeats;
    text unique to the new shard stays clean. Self-consistency: with
    empty history the result equals the self-join variant."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        duplicated_spans,
        duplicated_spans_bipartite,
    )

    hist = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "prefix words quick brown fox jumps over suffix tail here"),  # hist overlap
            (2, "fresh unique content one two three four five six seven"),    # clean
            (3, "repeat me now ok fine repeat me now ok fine"),               # intra-shard x2? (same doc)
            (4, "fresh unique content one two three four five six seven"),    # dup of 2
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id, r.span_start, r.span_end)
        for r in duplicated_spans_bipartite(new, hist, k=5).collect()
    }
    # doc1 tokens: prefix(0) words(1) quick(2) brown(3) fox(4) jumps(5) over(6)...
    # hist 5-grams cover "quick brown fox jumps over" -> start 2, span [2,7)
    # docs 2/4 are an exact intra-shard pair (full 10-token spans);
    # doc 3 self-repeats its 5-word phrase (full span)
    assert got == {(1, 2, 7), (2, 0, 10), (4, 0, 10), (3, 0, 10)}

    # empty history degenerates to the self-join variant
    empty = spark.createDataFrame([], "doc_id long, text string")
    self_res = {
        tuple(r) for r in duplicated_spans(new, k=5).collect()
    }
    bi_res = {
        tuple(r) for r in duplicated_spans_bipartite(new, empty, k=5).collect()
    }
    assert bi_res == self_res

    # hash route identical on collision-free input
    bi_hash = {
        (r.id, r.span_start, r.span_end)
        for r in duplicated_spans_bipartite(new, hist, k=5, hash_grams=True).collect()
    }
    assert bi_hash == got


# ---------------------------------------------------------------- paragraph


def _pd_corpus(spark):
    from pyspark.sql import types as T

    rows = [
        (1, "alpha one\nSHARED BLOCK here\nbeta one"),
        (2, "alpha two\nshared   block HERE\ngamma two"),   # normalized dup of SHARED
        (3, "shared block here\nalpha three"),               # dup again, later id
        (4, "delta four\ndelta four\nepsilon four"),         # within-doc repeat
        (5, None),                                           # null text
        (6, "   \n\n"),                                      # only empty paragraphs
        (7, "unique seven"),
    ]
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    return spark.createDataFrame(rows, schema)


def _pd_brute(rows, mode, min_count=2):
    import re

    norm = lambda p: re.sub(r"\s+", " ", p.lower())
    occ = []  # (id, pos, para) over trimmed non-empty paragraphs
    metas = {}
    for i, text in rows:
        if text is None:
            metas[i] = (None, None, None)
            continue
        ps = [p.strip() for p in text.split("\n")]
        ps = [p for p in ps if p]
        metas[i] = (len(ps), None, None)
        for pos, p in enumerate(ps):
            occ.append((i, pos, p))
    counts = {}
    for i, pos, p in occ:
        counts[norm(p)] = counts.get(norm(p), 0) + 1
    firsts = {}
    for i, pos, p in sorted(occ):
        firsts.setdefault(norm(p), (i, pos))
    out = {}
    for i, text in rows:
        if text is None:
            out[i] = (None, None, None)
            continue
        ps = [p.strip() for p in text.split("\n")]
        ps = [p for p in ps if p]
        if mode == "keep_first":
            kept = [p for pos, p in enumerate(ps) if firsts[norm(p)] == (i, pos)]
        else:
            kept = [p for p in ps if counts[norm(p)] < min_count]
        out[i] = ("\n".join(kept), len(ps), len(kept))
    return out


def test_paragraph_dedup_keep_first(spark):
    from cs533_big_data_data_mining_spark.operators.dedup import paragraph_dedup

    df = _pd_corpus(spark)
    rows = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        r["id"]: (r["clean"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df, "doc_id", "text", mode="keep_first").collect()
    }
    assert got == _pd_brute(rows, "keep_first")
    # spot contracts: doc 1 keeps the shared block (first occurrence),
    # docs 2/3 lose it; doc 4 keeps one of its two identical paragraphs;
    # null text -> all-null; empty-paragraph doc -> ('', 0, 0)
    assert "SHARED BLOCK here" in got[1][0]
    assert "block" not in got[2][0].lower() or "shared" not in got[2][0].lower()
    assert got[3][0] == "alpha three"
    assert got[4][0] == "delta four\nepsilon four"
    assert got[5] == (None, None, None)
    assert got[6] == ("", 0, 0)


def test_paragraph_dedup_drop_repeated(spark):
    from cs533_big_data_data_mining_spark.operators.dedup import paragraph_dedup

    df = _pd_corpus(spark)
    rows = [(r["doc_id"], r["text"]) for r in df.collect()]
    got = {
        r["id"]: (r["clean"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(df, "doc_id", "text", mode="drop_repeated").collect()
    }
    assert got == _pd_brute(rows, "drop_repeated")
    # the shared block disappears EVERYWHERE, incl. its first occurrence
    assert got[1][0] == "alpha one\nbeta one"
    # doc 4's within-doc repeat (2 occurrences) is also dropped everywhere
    assert got[4][0] == "epsilon four"


def test_paragraph_dedup_partition_invariance(spark):
    from cs533_big_data_data_mining_spark.operators.dedup import paragraph_dedup

    df = _pd_corpus(spark)
    one = paragraph_dedup(df.coalesce(1), "doc_id", "text").collect()
    many = paragraph_dedup(df.repartition(7), "doc_id", "text").collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_paragraph_dedup_bad_mode(spark):
    import pytest as _pytest

    from cs533_big_data_data_mining_spark.operators.dedup import paragraph_dedup

    with _pytest.raises(ValueError):
        paragraph_dedup(_pd_corpus(spark), "doc_id", "text", mode="nope")


def test_paragraph_dedup_bipartite(spark):
    from cs533_big_data_data_mining_spark.operators.dedup import (
        paragraph_dedup_bipartite,
    )

    hist = spark.createDataFrame(
        [(100, "old news\nshared block"), (101, "other old\nSHARED   BLOCK")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "fresh one\nshared block\nnew dup"),   # loses hist-shared, keeps new dup (first)
            (2, "new dup\nfresh two"),                 # loses new dup to doc 1 pos 2? no: (1,2) < (2,0)
            (3, None),
            (4, "shared block"),                       # everything removed
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["clean"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup_bipartite(hist, new, "doc_id", "text").collect()
    }
    assert got[1] == ("fresh one\nnew dup", 3, 2)
    assert got[2] == ("fresh two", 2, 1)
    assert got[3] == (None, None, None)
    assert got[4] == ("", 1, 0)

    # history untouched by construction; without within-new dedup the
    # 'new dup' copy in doc 2 survives
    got2 = {
        r["id"]: r["clean"]
        for r in paragraph_dedup_bipartite(
            hist, new, "doc_id", "text", dedup_within_new=False
        ).collect()
    }
    assert got2[2] == "new dup\nfresh two"


def _boilerplate_corpus(n=240, tpl_words=24, uniq_words=8):
    """Every doc shares a long boilerplate template (universal band
    minima -> mega buckets) plus a few doc-specific words; every 10th
    doc is an exact copy of its predecessor (the planted pair)."""
    tpl = " ".join(f"tplword{k} common{k}" for k in range(tpl_words // 2))
    docs = []
    for i in range(n):
        base = i - 1 if (i % 10 == 0 and i > 0) else i
        uniq = " ".join(f"u{base}x{k}" for k in range(uniq_words))
        docs.append((i, f"{tpl} {uniq}"))
    return docs


def test_lsh_bucket_cap_preserves_planted_pairs(spark):
    from cs533_big_data_data_mining_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_lsh_candidates,
    )

    docs = _boilerplate_corpus()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    planted = {(i - 1, i) for i in range(1, len(docs)) if i % 10 == 0}

    free = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df, "doc_id", "text").collect()}
    capped = {
        (r["a"], r["b"])
        for r in minhash_lsh_candidates(df, "doc_id", "text", max_bucket_size=8).collect()
    }
    # the guard must actually bite (mega buckets produced excess
    # candidates) AND keep every planted pair (identical docs collide
    # on bands whose minima are their own unique words -> tiny bucket)
    assert len(capped) < len(free), (len(capped), len(free))
    assert planted <= capped, planted - capped

    got = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_dedup_pairs(
            df, "doc_id", "text", threshold=0.9, max_bucket_size=8
        ).collect()
    }
    assert set(got) == planted
    assert all(abs(j - 1.0) < 1e-9 for j in got.values())


def test_lsh_bucket_cap_bipartite(spark):
    from cs533_big_data_data_mining_spark.operators.dedup import (
        minhash_dedup_pairs_bipartite,
    )

    docs = _boilerplate_corpus()
    # history = even ids, new shard = odd ids; the planted pair
    # (i-1, i) with i % 10 == 0 spans the two corpora (i even)
    hist = spark.createDataFrame([d for d in docs if d[0] % 2 == 0], "doc_id long, text string")
    new = spark.createDataFrame([d for d in docs if d[0] % 2 == 1], "doc_id long, text string")
    planted = {(i - 1, i) for i in range(1, len(docs)) if i % 10 == 0}

    got = {
        (r["a"], r["b"])  # a = i-1 from new (odd), b = i from hist (even)
        for r in minhash_dedup_pairs_bipartite(
            new, hist, "doc_id", "text", threshold=0.9, max_bucket_size=8
        ).collect()
    }
    assert got == planted, (got, planted)


def test_lsh_bucket_cap_validation(spark):
    import pytest as _pytest

    from cs533_big_data_data_mining_spark.operators.dedup import (
        minhash_dedup_pairs,
        minhash_dedup_pairs_bipartite,
    )

    df = spark.createDataFrame([(0, "a b c d"), (1, "a b c d")], "doc_id long, text string")
    # a cap below 2 would drop every pair-capable bucket: loud error,
    # not a silent no-dedup corpus (None is the off switch, 0 is not)
    for bad in (0, 1, -5):
        with _pytest.raises(ValueError):
            minhash_dedup_pairs(df, "doc_id", "text", max_bucket_size=bad)
        with _pytest.raises(ValueError):
            minhash_dedup_pairs_bipartite(df, df, "doc_id", "text", max_bucket_size=bad)


def test_exact_dedup_bipartite_bloom_routes(spark):
    """exact=True must equal the hash-join twin row-for-row even when
    the Bloom is deliberately tiny (fpp=0.5 -> real false positives
    for the verify path to recover); exact=False is one-sided — every
    true duplicate still drops (no false negatives), survivors are a
    subset of the exact route's."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        exact_dedup_bipartite,
        exact_dedup_bipartite_bloom,
    )

    hist = spark.createDataFrame(
        [(100 + i, f"hist text {i % 5}") for i in range(20)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(i, f"hist text {i}" if i < 5 else f"new text {i % 8}") for i in range(16)],
        "doc_id long, text string",
    )
    want = sorted(map(tuple, exact_dedup_bipartite(new, hist, "doc_id", "text").collect()))
    for fpp in (0.01, 0.5):
        got = sorted(
            map(tuple, exact_dedup_bipartite_bloom(new, hist, "doc_id", "text", fpp=fpp).collect())
        )
        assert got == want, fpp

    loose = sorted(
        map(
            tuple,
            exact_dedup_bipartite_bloom(new, hist, "doc_id", "text", fpp=0.5, exact=False).collect(),
        )
    )
    assert set(loose) <= set(want)  # one-sided: may lose, never re-admit
    # every true duplicate is gone regardless (no false negatives)
    assert all(not r[1].startswith("hist text") or int(r[1].split()[-1]) >= 5 for r in loose)


def test_paragraph_dedup_bipartite_bloom_routes(spark):
    """Paragraph-level Dolma route: exact=True matches the hash-join
    twin on the same fixture (incl. a tiny high-fpp Bloom), a prebuilt
    filter short-circuits the history scan, and exact=False only ever
    removes MORE paragraphs."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        _para_key,
        _paras_arr,
        paragraph_dedup_bipartite,
        paragraph_dedup_bipartite_bloom,
    )
    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build
    from pyspark.sql import functions as F

    hist = spark.createDataFrame(
        [(100, "old news\nshared block"), (101, "other old\nSHARED   BLOCK")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, "fresh one\nshared block\nnew dup"),
            (2, "new dup\nfresh two"),
            (3, None),
            (4, "shared block"),
        ],
        "doc_id long, text string",
    )
    want = sorted(map(tuple, paragraph_dedup_bipartite(hist, new, "doc_id", "text").collect()))
    for fpp in (0.01, 0.5):
        got = sorted(
            map(
                tuple,
                paragraph_dedup_bipartite_bloom(hist, new, "doc_id", "text", fpp=fpp).collect(),
            )
        )
        assert got == want, fpp

    # prebuilt filter (the amortized daily-ingest artifact)
    keys = (
        hist.select(F.explode(_paras_arr(F.col("text"))).alias("p"))
        .select(_para_key(F.col("p")).alias("__k"))
        .distinct()
    )
    bf = bloom_build(keys, "__k", fpp=0.01)
    got = sorted(
        map(
            tuple,
            paragraph_dedup_bipartite_bloom(hist, new, "doc_id", "text", bloom=bf).collect(),
        )
    )
    assert got == want

    # exact=False: per-doc kept count can only shrink
    exact_kept = {r[0]: r[3] for r in want}
    loose = paragraph_dedup_bipartite_bloom(
        hist, new, "doc_id", "text", fpp=0.5, exact=False
    ).collect()
    for r in loose:
        if r["n_kept"] is not None:
            assert r["n_kept"] <= exact_kept[r["id"]]


def test_url_dedup_bipartite_bloom_routes(spark):
    """URL-level Bloom route completes the family: exact=True equals
    the hash-join twin (incl. a tiny high-fpp filter), exact=False is
    one-sided, null URLs stay exempt on every route."""
    from cs533_big_data_data_mining_spark.operators.dedup import (
        url_dedup_bipartite,
        url_dedup_bipartite_bloom,
    )

    hist = spark.createDataFrame(
        [(100 + i, f"https://ex.com/p/{i % 4}") for i in range(8)],
        "doc_id long, url string",
    )
    new = spark.createDataFrame(
        [(0, "https://WWW.ex.com/p/0?utm_source=z"),   # hist re-crawl (normalized)
         (1, "https://ex.com/new/1"),
         (2, "https://ex.com/new/1#frag"),             # within-shard dup of 1
         (3, None),
         (4, "https://ex.com/new/4")],
        "doc_id long, url string",
    )
    want = sorted(map(tuple, url_dedup_bipartite(new, hist, "doc_id", "url").collect()))
    for fpp in (0.01, 0.5):
        got = sorted(
            map(tuple, url_dedup_bipartite_bloom(new, hist, "doc_id", "url", fpp=fpp).collect())
        )
        assert got == want, fpp
    ids = {r[0] for r in want}
    assert 0 not in ids and 2 not in ids and {1, 3, 4} <= ids
    loose = sorted(
        map(
            tuple,
            url_dedup_bipartite_bloom(new, hist, "doc_id", "url", fpp=0.5, exact=False).collect(),
        )
    )
    loose_ids = {r[0] for r in loose}
    assert loose_ids <= ids and 3 in loose_ids  # null stays exempt
    assert 0 not in loose_ids  # true re-crawl never survives
