"""Trained byte-BPE tokenizer: train/encode vs an independent naive
reference, byte-level coverage, determinism, and packing integration."""

import random
import re

import pytest
from pyspark.sql import functions as F

from cs533_big_data_data_mining_spark.functions.text import SUBWORD_RE
from cs533_big_data_data_mining_spark.operators.bpe import (
    bpe_token_count,
    bpe_tokens,
    bpe_train,
    bpe_train_from_histogram,
    merges_table,
    word_histogram,
)


def ref_encode(text, merges):
    """Independent slow reference: pretokenize, byte-decompose, then
    apply merges strictly in rank order (each fully, left-to-right)."""
    out = []
    for w in re.findall(SUBWORD_RE, text or ""):
        syms = [chr(b) for b in w.encode("utf-8")]
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        out.extend(syms)
    return out


def test_forced_merges_and_counts(spark):
    rows = [(i, "ab" * (1 + i % 8)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", 3)
    assert merges == [("a", "b"), ("ab", "ab"), ("abab", "abab")]
    got = df.select("doc_id", bpe_token_count(merges, "text").alias("n")).collect()
    for r in got:
        m = 1 + r["doc_id"] % 8
        k1, r1 = divmod(m, 2)
        k2, r2 = divmod(k1, 2)
        assert r["n"] == k2 + r2 + r1


def test_encode_matches_reference_on_random_text(spark):
    rng = random.Random(7)
    words = ["the", "then", "there", "that", "this", "therefore", "ab", "abab", "héllo", "123", "!?"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", 24)
    got = {
        r["doc_id"]: (r["t"], r["n"])
        for r in df.select(
            "doc_id", bpe_tokens(merges, "text").alias("t"), bpe_token_count(merges, "text").alias("n")
        ).collect()
    }
    for i, text in rows:
        want = ref_encode(text, merges)
        assert got[i][0] == want, f"doc {i}: {got[i][0]} != {want}"
        assert got[i][1] == len(want)


def test_rank_order_vs_lowest_rank_equivalence():
    """The encoder picks the lowest-rank adjacent pair repeatedly; the
    reference applies merges in rank order. These are equivalent for
    BPE (a later merge can only involve symbols produced by earlier
    ones) — pinned on adversarial overlapping merges."""
    hist = [("aaab", 10), ("aab", 8), ("ab", 6), ("aaa", 5)]
    merges = bpe_train_from_histogram(hist, 4)
    from cs533_big_data_data_mining_spark.operators.bpe import _encode_word

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in ["aaab", "aab", "ab", "aaa", "aaaa", "aaaab", "baaa"]:
        syms = [chr(b) for b in w.encode("utf-8")]
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        assert _encode_word(w, ranks) == syms, w


def test_byte_level_full_coverage(spark):
    df = spark.createDataFrame([(0, "héllo wörld 漢字 🎉")], "doc_id long, text string")
    merges = [("a", "b")]  # nothing applicable — pure byte decomposition
    toks = df.select(bpe_tokens(merges, "text").alias("t")).head()["t"]
    # round-trip: latin-1 re-encode of the concatenated symbols minus
    # pretokenizer-dropped whitespace equals the original bytes
    joined = "".join(toks).encode("latin-1")
    want = b"".join(w.encode("utf-8") for w in re.findall(SUBWORD_RE, "héllo wörld 漢字 🎉"))
    assert joined == want
    assert all(len(t) == 1 for t in toks)  # no merges applied


def test_train_deterministic_tie_break():
    # equal counts: (a,b) and (c,d) both appear 5x -> lexicographic
    merges = bpe_train_from_histogram([("ab", 5), ("cd", 5)], 1)
    assert merges == [("a", "b")]


def test_histogram_cap_deterministic(spark):
    rows = [(i, f"w{i % 50} common") for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    h1 = word_histogram(df, "text", max_words=10)
    h2 = word_histogram(df, "text", max_words=10)
    assert h1 == h2 and len(h1) == 10
    assert h1[0][0] == " common"  # highest count first (space-prefixed pretoken)


def test_packing_integration(spark):
    from cs533_big_data_data_mining_spark.operators.packing import pack_sequences

    rows = [(i, "ab" * (1 + i % 8)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", 3)
    packed = pack_sequences(
        df, "doc_id", 16, count_expr=bpe_token_count(merges, "text"), validate=True
    ).collect()
    by_id = {r["id"]: r for r in packed}
    off = 0
    for i in range(100):
        m = 1 + i % 8
        k1, r1 = divmod(m, 2)
        k2, r2 = divmod(k1, 2)
        n = k2 + r2 + r1
        assert by_id[i]["n_tokens"] == n and by_id[i]["start_offset"] == off
        off += n


def test_merges_table_roundtrip(spark):
    merges = [("a", "b"), ("ab", "c")]
    t = merges_table(spark, merges)
    back = [(r["left"], r["right"]) for r in t.orderBy("rank").collect()]
    assert back == merges


def test_cli_bpe_train_then_pack(spark, tmp_path):
    """bpe-train -> pack --bpe-merges round trip: the plan's offsets
    must replay the closed-form counts of the forced-merge corpus."""
    from cs533_big_data_data_mining_spark.__main__ import main

    src = str(tmp_path / "bpe_docs.parquet")
    model = str(tmp_path / "merges.parquet")
    plan_out = str(tmp_path / "plan.parquet")
    rows = [(i, "ab" * (1 + i % 8)) for i in range(120)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)

    assert main(["bpe-train", "-i", src, "-o", model, "-n", "3"]) == 0
    got_merges = [
        (r["left"], r["right"])
        for r in spark.read.parquet(model).orderBy("rank").collect()
    ]
    assert got_merges == [("a", "b"), ("ab", "ab"), ("abab", "abab")]

    assert main(["pack", "-i", src, "-o", plan_out, "-l", "16", "--bpe-merges", model]) == 0
    plan = {r["id"]: r for r in spark.read.parquet(plan_out).collect()}
    off = 0
    for i in range(120):
        m = 1 + i % 8
        k1, r1 = divmod(m, 2)
        k2, r2 = divmod(k1, 2)
        n = k2 + r2 + r1
        assert plan[i]["n_tokens"] == n and plan[i]["start_offset"] == off
        off += n


def test_bpe_ids_and_vocab(spark):
    from cs533_big_data_data_mining_spark.operators.bpe import bpe_ids, bpe_vocab

    merges = [("a", "b"), ("ab", "ab")]
    vocab = bpe_vocab(merges)
    assert len(vocab) == 258 and vocab[97] == "a" and vocab[256] == "ab" and vocab[257] == "abab"
    df = spark.createDataFrame([(0, "ababa")], "doc_id long, text string")
    ids = df.select(bpe_ids(merges, "text").alias("i")).head()["i"]
    # "ababa" -> abab + a -> ids [257, 97]
    assert ids == [257, 97]


def test_incremental_trainer_matches_naive():
    """The heap/incremental trainer must reproduce the full-rescan
    reference bit-for-bit (argmax, tie-break, splice order) on random
    histograms including adversarial overlap/tie shapes."""
    from cs533_big_data_data_mining_spark.operators.bpe import _bpe_train_naive

    rng = random.Random(31)
    alphabet = "abcde"
    for trial in range(8):
        hist = []
        for w in range(40):
            word = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
            hist.append((word, rng.randint(1, 9)))
        # deliberate ties and runs
        hist += [("aaaa", 7), ("aaab", 7), ("abab", 7), ("baba", 7), ("ééé", 3)]
        for n_merges in (1, 5, 20, 60):
            fast = bpe_train_from_histogram([*hist], n_merges)
            ref = _bpe_train_naive([*hist], n_merges)
            assert fast == ref, (trial, n_merges, fast, ref)


def test_cli_bpe_encode(spark, tmp_path):
    from cs533_big_data_data_mining_spark.__main__ import main

    src = str(tmp_path / "enc_docs.parquet")
    model = str(tmp_path / "enc_merges.parquet")
    out = str(tmp_path / "enc_out.parquet")
    spark.createDataFrame(
        [(i, "ab" * (1 + i % 4)) for i in range(40)], "doc_id long, text string"
    ).write.parquet(src)
    assert main(["bpe-train", "-i", src, "-o", model, "-n", "2"]) == 0
    assert main(["bpe-encode", "-i", src, "-o", out, "--model", model, "--ids"]) == 0
    got = {r["id"]: r for r in spark.read.parquet(out).collect()}
    # merges: (a,b)->256, (ab,ab)->257; "ab"->[256], "abab"->[257],
    # "ababab"->[257,256], "abababab"->[257,257]
    assert got[0]["tokens"] == [256] and got[1]["tokens"] == [257]
    assert got[2]["tokens"] == [257, 256] and got[3]["tokens"] == [257, 257]
    assert all(got[i]["n_tokens"] == len(got[i]["tokens"]) for i in got)


def test_pretokenizer_partitions_text():
    """BPE_PRETOKEN_RE must PARTITION any text (every char in exactly
    one pretoken, in order) — the losslessness precondition."""
    from cs533_big_data_data_mining_spark.operators.bpe import _PRETOKEN

    gnarly = [
        "a  b\n\nc\td ",
        " leading and trailing ",
        "héllo wörld 漢字 🎉",
        "nb sp and thin　ideographic",
        "tabs\t\tand\r\nnewlines",
        "", "   ", "no-spaces-at-all", "1 2  3   4",
    ]
    for t in gnarly:
        assert "".join(_PRETOKEN.findall(t)) == t, repr(t)


def test_train_encode_same_pretokenizer_nbsp(spark):
    """Trainer histogram and encoder share ONE Python regex: with
    U+00A0 in the corpus the histogram's words must be exactly the
    encoder-side pretokens (the r11 Java-vs-Python \\s divergence)."""
    from collections import Counter

    from cs533_big_data_data_mining_spark.operators.bpe import _PRETOKEN, word_histogram

    texts = [f"a b word{i % 3} end  tail " for i in range(60)]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    hist = dict(word_histogram(df, "text"))
    want = Counter()
    for t in texts:
        want.update(_PRETOKEN.findall(t))
    assert hist == dict(want)


def test_decode_roundtrip_exact(spark):
    from cs533_big_data_data_mining_spark.operators.bpe import bpe_decode, bpe_ids, bpe_train

    texts = [
        "a  b\n\nc\td ",
        " leading and trailing ",
        "héllo wörld 漢字 🎉",
        "nb sp runs   of spaces",
        "the theory of therefore, 123!?",
        "",
    ]
    rows = [(i, t) for i, t in enumerate(texts)] + [(len(texts), None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", 30)
    got = {
        r["doc_id"]: r["back"]
        for r in df.select(
            "doc_id", bpe_decode(merges, bpe_ids(merges, "text")).alias("back")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == t, (i, repr(got[i]), repr(t))
    # null text encodes to [] (same as ""), so decode gives "" — a
    # null ID ARRAY decodes to null
    assert got[len(texts)] == ""
    null_back = df.limit(1).select(
        bpe_decode(merges, F.lit(None).cast("array<int>")).alias("t")
    ).head()["t"]
    assert null_back is None


def test_specials_layout_and_decode(spark):
    from cs533_big_data_data_mining_spark.operators.bpe import (
        DEFAULT_SPECIALS,
        bpe_decode,
        bpe_ids,
        bpe_special_ids,
        bpe_vocab,
    )

    merges = [("a", "b"), ("ab", "ab")]
    sp = bpe_special_ids(merges)
    assert sp == {"<|bos|>": 258, "<|eos|>": 259, "<|pad|>": 260, "<|doc|>": 261}
    vocab = bpe_vocab(merges, DEFAULT_SPECIALS)
    assert len(vocab) == 262 and vocab[259] == "<|eos|>"
    # encoder never emits specials: the literal text encodes as bytes
    df = spark.createDataFrame([(0, "abab<|eos|>")], "doc_id long, text string")
    ids = df.select(bpe_ids(merges, "text").alias("i")).head()["i"]
    assert sp["<|eos|>"] not in ids
    # separator-framed stream decodes with the literal marker
    framed = df.select(
        bpe_decode(
            merges,
            F.concat(bpe_ids(merges, "text"), F.array(F.lit(sp["<|doc|>"]))),
            DEFAULT_SPECIALS,
        ).alias("t")
    ).head()["t"]
    assert framed == "abab<|eos|><|doc|>"


def test_vocab_string_collision_earliest_id_wins(spark):
    from cs533_big_data_data_mining_spark.operators.bpe import bpe_decode, bpe_ids, bpe_vocab

    merges = [("b", "c"), ("a", "bc"), ("ab", "c")]  # 257 and 258 both "abc"
    vocab = bpe_vocab(merges)
    assert vocab[257] == "abc" and vocab[258] == "abc"  # ids distinct, strings collide
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    ids = df.select(bpe_ids(merges, "text").alias("i")).head()["i"]
    assert ids == [257]  # earliest id for the collided string
    back = df.select(
        bpe_decode(merges, F.array(F.lit(257), F.lit(258))).alias("t")
    ).head()["t"]
    assert back == "abcabc"  # decode is index-based; both ids render


def test_pack_sep_tokens(spark):
    from cs533_big_data_data_mining_spark.operators.packing import pack_sequences

    rows = [(i, "ab" * (1 + i % 8)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", 3)
    packed = pack_sequences(
        df, "doc_id", 16, count_expr=bpe_token_count(merges, "text"),
        validate=True, sep_tokens=1,
    ).collect()
    by_id = {r["id"]: r for r in packed}
    off = 0
    for i in range(100):
        m = 1 + i % 8
        k1, r1 = divmod(m, 2)
        k2, r2 = divmod(k1, 2)
        n = k2 + r2 + r1 + 1  # + the separator
        assert by_id[i]["n_tokens"] == n and by_id[i]["start_offset"] == off
        off += n


def test_min_count_prefilter(spark):
    """min_count=2 must not change merges when no word is hapax; a
    meaningful hapax shows the documented web-scale approximation."""
    rows = [(i, "abcd " * 2) for i in range(50)] + [(50, "xy" * 200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dup_only = df.filter("doc_id < 50")
    assert bpe_train(dup_only, "text", 4, min_count=2) == bpe_train(dup_only, "text", 4)
    # the hapax xy-run dominates pair mass; min_count=2 drops it
    m1 = bpe_train(df, "text", 1, min_count=1)
    m2 = bpe_train(df, "text", 1, min_count=2)
    assert m1 == [("x", "y")] and m2 != m1


def test_doc_token_counts_route_equivalence(spark):
    from cs533_big_data_data_mining_spark.operators.bpe import (
        BPE_PRETOKEN_RE,
        bpe_doc_token_counts,
    )

    rng = random.Random(11)
    words = ["the", "then", "there", "ab", "abab", "héllo", "123", "!?", "  ", "\n"]
    rows = [
        (i, "".join(rng.choice(words) + rng.choice([" ", ""]) for _ in range(rng.randint(0, 25))))
        for i in range(150)
    ] + [(150, ""), (151, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, "text", 16)
    join_r = {r["id"]: r["n_tokens"] for r in bpe_doc_token_counts(df, merges).collect()}
    udf_r = {
        r["id"]: r["n_tokens"]
        for r in bpe_doc_token_counts(df, merges, route="udf").collect()
    }
    assert join_r == udf_r and len(join_r) == 152
    assert join_r[150] == 0 and join_r[151] == 0
    # spot-check against the slow reference on the new regex
    for i, text in rows[:20]:
        want = len(ref_encode_re(text, merges, BPE_PRETOKEN_RE))
        assert join_r[i] == want, i


def ref_encode_re(text, merges, pattern):
    out = []
    for w in re.findall(pattern, text or ""):
        syms = [chr(b) for b in w.encode("utf-8")]
        for a, b in merges:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [a + b]
                else:
                    i += 1
        out.extend(syms)
    return out


def test_cli_bpe_encode_audit(spark, tmp_path):
    """--audit decodes written ids back and diffs against the source:
    clean corpus exits 0 with full match."""
    from cs533_big_data_data_mining_spark.__main__ import main

    src = str(tmp_path / "aud_docs.parquet")
    model = str(tmp_path / "aud_merges.parquet")
    out = str(tmp_path / "aud_out.parquet")
    rows = [(i, f"doc {i} text  with\nmess {i % 5} ") for i in range(30)]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(src)
    assert main(["bpe-train", "-i", src, "-o", model, "-n", "8", "--min-count", "1"]) == 0
    assert main([
        "bpe-encode", "-i", src, "-o", out, "--model", model, "--ids", "--audit", "10",
    ]) == 0
