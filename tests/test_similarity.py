"""Similarity search vs NumPy brute-force oracle."""

import numpy as np

from cs533_big_data_data_mining_spark.operators.similarity import (
    cosine_topk_bruteforce,
    embedding_neardup_pairs,
    ivf_topk,
)


def _emb_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _emb_np(spark, sf_dir):
    rows = sorted(_emb_df(spark, sf_dir).collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([[float(v) for v in r["embedding"]] for r in rows])
    return ids, x


def _brute_topk_np(ids, x, k):
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    s = xn @ xn.T
    out = {}
    for qi in range(len(ids)):
        best = sorted(
            ((round(s[qi, j], 6), ids[j]) for j in range(len(ids)) if j != qi),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        out[ids[qi]] = [int(b) for _, b in best]
    return out


def test_topk_bruteforce_matches_numpy(spark, sf_dir):
    df = _emb_df(spark, sf_dir)
    queries = df.filter("vec_id < 20")
    got = cosine_topk_bruteforce(df, queries, k=5).collect()
    ids, x = _emb_np(spark, sf_dir)
    want = _brute_topk_np(ids, x, 5)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    assert set(by_q) == {i for i in ids if i < 20}
    for q, neigh in by_q.items():
        assert neigh == want[q], f"query {q}: {neigh} != {want[q]}"


def test_neardup_pairs_threshold(spark, sf_dir):
    df = _emb_df(spark, sf_dir)
    got = {(r["a"], r["b"]): r["cosine"] for r in embedding_neardup_pairs(df, 0.35).collect()}
    ids, x = _emb_np(spark, sf_dir)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    s = np.round(xn @ xn.T, 6)
    want = {(int(ids[i]), int(ids[j])) for i in range(len(ids)) for j in range(i + 1, len(ids)) if s[i, j] >= 0.35}
    assert set(got) == want


def test_ivf_recall(spark, sf_dir):
    df = _emb_df(spark, sf_dir)
    queries = df.filter("vec_id < 30")
    exact = cosine_topk_bruteforce(df, queries, k=10).collect()
    approx = ivf_topk(df, queries, k=10, n_centroids=8, nprobe=3).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    mean_recall = sum(recalls) / len(recalls)
    # nprobe 3/8 of a random-vector corpus: recall must beat the
    # scanned fraction and be meaningfully high
    assert mean_recall > 0.5, f"mean recall {mean_recall}"


def test_neardup_auto_route_gate(spark):
    """Above the block-pair gate, embedding_neardup_pairs must route to
    lsh_neardup_pairs (round-3 verdict next-step #7): routed output ==
    direct LSH output exactly, and every routed pair reports the SAME
    cosine as the exact path (both verify with the identical
    left-to-right fold)."""
    import pytest

    from cs533_big_data_data_mining_spark.operators.similarity import lsh_neardup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    with pytest.warns(UserWarning, match="auto-routing to banded LSH"):
        routed_df = embedding_neardup_pairs(emb, 0.4, max_block_pairs=0)
    routed = {(r["a"], r["b"]): r["cosine"] for r in routed_df.collect()}
    direct = {
        (r["a"], r["b"]): r["cosine"] for r in lsh_neardup_pairs(emb, 0.4).collect()
    }
    assert routed == direct
    exact = {
        (r["a"], r["b"]): r["cosine"]
        for r in embedding_neardup_pairs(emb, 0.4, max_block_pairs=None).collect()
    }
    assert set(routed) <= set(exact)
    for pair, cos in routed.items():
        assert exact[pair] == cos


def test_lsh_neardup_matches_exact(spark):
    from cs533_big_data_data_mining_spark.operators.similarity import (
        embedding_neardup_pairs,
        lsh_neardup_pairs,
    )

    # sf0.01: the planted near-dups sit around cosine 0.4-0.5, so the
    # band width is tuned down (r=4) per the docstring's recall math:
    # recall at cos=0.4 with r=4, b=32 is 1-(1-0.159)^32 ~ 0.996
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {(r["a"], r["b"]) for r in embedding_neardup_pairs(emb, 0.4).collect()}
    got = {(r["a"], r["b"]) for r in lsh_neardup_pairs(emb, 0.4, num_bits=128, bands=32).collect()}
    assert got <= exact            # exact verification => precision 1.0
    assert len(exact) > 0
    assert len(got) >= 0.9 * len(exact)
