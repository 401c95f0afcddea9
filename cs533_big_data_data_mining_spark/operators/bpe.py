"""Trained byte-level BPE tokenizer: train + encode + count.

Every production-scale training-data pipeline tokenizes with a
TRAINED byte-pair-encoding vocabulary before packing; the engine's
``subword_count`` heuristic (functions/text.py) estimates sequence
lengths but cannot bound the real ones. This module supplies the real
thing with the classic two-phase shape (Sennrich et al. 2016; byte
level per GPT-2, Radford et al. 2019):

* **Train** = ONE combinable Spark aggregation + a driver loop over
  the word histogram. BPE training only ever reads the corpus through
  its pretoken frequency table, so the distributed part is exactly
  one ``explode -> groupBy(word).count()`` (map-side combinable, one
  shuffle); the merge loop then runs driver-side over the bounded
  histogram (``max_words`` cap, highest-frequency words kept — the
  tail it drops contributes negligible pair mass). At 100 TB the
  histogram of a web corpus is tens of millions of rows; capped at
  ``max_words`` it is MBs.
* **Encode** = stateless scoring with the broadcast merges table:
  one Arrow-vectorized pandas UDF, no shuffle, no joins — safe in
  batch and streaming alike. A per-batch word cache makes the cost
  proportional to DISTINCT words per batch (Zipf makes that small).

Byte-level: each pretoken (``BPE_PRETOKEN_RE`` — the heuristic's
``SUBWORD_RE`` plus a trailing ``\\s+`` whitespace-run branch, the
GPT-2 move that makes the pretokenizer a PARTITION of the text) is
decomposed into its UTF-8 BYTES, represented as latin-1 single-char
strings so merges stay plain strings. Full coverage + partition =
LOSSLESS: any input encodes with zero unknown tokens and
``bpe_decode(bpe_ids(text)) == text`` exactly (the shard-audit
round-trip). Trainer and encoder share ONE compiled Python regex —
the histogram pretokenizes inside the same Arrow kernel family as the
encoder, so no Java-vs-Python ``\\s`` class divergence can make
training learn words the encoder never emits (NBSP et al.). No
end-of-word marker (documented choice: counts are what packing
consumes; markers only shift vocabulary identity).

Special tokens: ids are laid out bytes (0-255), merges (256..), then
specials — ``DEFAULT_SPECIALS`` reserves bos/eos/pad/doc-separator.
The encoder never EMITS specials (text that spells one encodes as
ordinary bytes/merges); packing and shard writers append them by id
(``pack_sequences(sep_tokens=...)`` counts them).

Determinism: the merge loop tie-breaks (count desc, pair lexicographic
asc) — classic implementations inherit dict order; this one is
reproducible across runs and partitionings by construction.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from cs533_big_data_data_mining_spark.functions.text import SUBWORD_RE

#: The BPE pretokenizer: the heuristic's subword regex plus a
#: whitespace-run tail branch. The tail only fires where no other
#: branch can (orphan whitespace: runs of >= 2, leading/trailing
#: whitespace, \t/\n not followed by a word), so single-space-joined
#: prose pretokenizes identically to ``SUBWORD_RE`` — but every
#: character of ANY text now lands in exactly one pretoken, making
#: encode a partition of the input and decode an exact inverse.
BPE_PRETOKEN_RE = SUBWORD_RE + r"|\s+"

_PRETOKEN = re.compile(BPE_PRETOKEN_RE)

#: Reserved special-token strings, appended after the merges in id
#: order: begin/end-of-sequence, padding, and the document separator
#: a packed pretraining stream delimits documents with.
DEFAULT_SPECIALS = ("<|bos|>", "<|eos|>", "<|pad|>", "<|doc|>")


def _word_bytes(word: str) -> tuple[str, ...]:
    """UTF-8 bytes of a pretoken as latin-1 single-char symbols."""
    return tuple(chr(b) for b in word.encode("utf-8"))


def bpe_pretokens(col: str | Column) -> Column:
    """``array<string>`` of BPE pretokens — THE pretokenizer, one
    compiled Python regex shared verbatim by the trainer's histogram,
    both encoders, and the join-route counter (a Java-regex twin would
    disagree on Unicode whitespace classes; one engine = no drift)."""

    @pandas_udf("array<string>")
    def _pt(s: pd.Series) -> pd.Series:
        return s.map(lambda t: _PRETOKEN.findall(t) if t is not None else [])

    c = F.col(col) if isinstance(col, str) else col
    return _pt(c)


def word_histogram(
    docs: DataFrame, text_col: str, max_words: int = 1_000_000, min_count: int = 1
) -> list[tuple[str, int]]:
    """``(word, count)`` pretoken histogram — the ONE distributed pass
    of BPE training. Map-side combinable groupBy; the driver collect
    is bounded by ``max_words`` (highest count first, then word asc —
    a deterministic truncation).

    ``min_count`` prefilters the histogram BEFORE the top-k sort: at
    web scale roughly half of all distinct pretokens are hapax
    legomena whose pair mass is noise, and dropping them ahead of the
    TakeOrdered shrinks each partition's 1M-row heap (and the driver
    merge) by that factor. Default 1 = exact Sennrich training (small
    planted corpora legitimately carry signal in singletons); the CLI
    defaults to 2, the web-scale setting."""
    grouped = (
        docs.select(F.explode(bpe_pretokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if int(min_count) > 1:
        grouped = grouped.filter(F.col("n") >= int(min_count))
    hist = (
        grouped.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(int(max_words))
        .collect()
    )
    return [(r["w"], int(r["n"])) for r in hist]


def _bpe_train_naive(hist: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Reference implementation (full histogram rescan per merge) —
    O(n_merges x total symbols); kept as the equivalence oracle for
    the incremental trainer's tests."""
    words: list[tuple[list[str], int]] = [(list(_word_bytes(w)), n) for w, n in hist if w]
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pair_counts: Counter = Counter()
        for syms, n in words:
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] += n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for syms, _n in words:
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]  # left-to-right, non-overlapping
                else:
                    i += 1
    return merges


def bpe_train_from_histogram(hist: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table
    (Sennrich 2016 alg. 1), byte-level symbols, deterministic
    tie-break (count desc, pair lexicographic asc). Returns the
    rank-ordered merges list.

    Incremental (the standard production shape): pair counts live in
    a dict maintained per merge — only the words CONTAINING the
    applied pair are rescanned (their old adjacency contributions
    removed, the splice applied, new contributions added) — and the
    argmax comes from a lazy-invalidation max-heap keyed
    ``(-count, pair)`` (stale entries are re-pushed with their current
    count on pop; pairs whose count grows get a fresh push). Same
    output as the full-rescan reference bit-for-bit (tie-break
    included; pinned by tests): per-position counting and
    left-to-right non-overlapping splicing are identical — only the
    bookkeeping is incremental. At the advertised CLI defaults
    (n_merges=8000, max_words=1e6) the full-rescan loop is days of
    driver time; this is minutes."""
    import heapq

    words: list[tuple[list[str], int]] = [(list(_word_bytes(w)), n) for w, n in hist if w]
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, n) in enumerate(words):
        for i in range(len(syms) - 1):
            pr = (syms[i], syms[i + 1])
            pair_counts[pr] += n
            where.setdefault(pr, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    while len(merges) < int(n_merges) and heap:
        negc, best = heapq.heappop(heap)
        cur = pair_counts.get(best, 0)
        if cur <= 0:
            continue
        if -negc != cur:  # stale entry: re-enter at the current count
            heapq.heappush(heap, (-cur, best))
            continue
        merges.append(best)
        a, b = best
        ab = a + b
        grew: set[tuple[str, str]] = set()
        for wi in where.pop(best, ()):  # where may hold stale members;
            # the remove/re-add below is a no-op for those words
            syms, n = words[wi]
            for i in range(len(syms) - 1):
                pair_counts[(syms[i], syms[i + 1])] -= n
            i = 0
            while i < len(syms) - 1:
                if syms[i] == a and syms[i + 1] == b:
                    syms[i : i + 2] = [ab]
                else:
                    i += 1
            for i in range(len(syms) - 1):
                pr = (syms[i], syms[i + 1])
                pair_counts[pr] += n
                where.setdefault(pr, set()).add(wi)
                grew.add(pr)
        pair_counts.pop(best, None)  # exactly zero after the merge
        for pr in grew:
            c = pair_counts.get(pr, 0)
            if c > 0:
                heapq.heappush(heap, (-c, pr))
        # decreased pairs self-heal: their stale (higher) entries pop
        # early, mismatch the current count, and re-push corrected
    return merges


def bpe_train(
    docs: DataFrame, text_col: str, n_merges: int, max_words: int = 1_000_000, min_count: int = 1
) -> list[tuple[str, str]]:
    """One-call train: distributed histogram + driver merge loop."""
    return bpe_train_from_histogram(
        word_histogram(docs, text_col, max_words, min_count=min_count), n_merges
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Standard BPE apply: repeatedly merge every occurrence of the
    LOWEST-RANK adjacent pair (left-to-right, non-overlapping) until
    no learned pair remains."""
    syms = list(_word_bytes(word))
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        ab = a + b
        i = 0
        while i < len(syms) - 1:
            if syms[i] == a and syms[i + 1] == b:
                syms[i : i + 2] = [ab]
            else:
                i += 1
    return syms


def _encode_text(text, ranks, cache: dict) -> list[str]:
    if text is None:
        return []
    out: list[str] = []
    for w in _PRETOKEN.findall(text):
        toks = cache.get(w)
        if toks is None:
            toks = _encode_word(w, ranks)
            cache[w] = toks
        out.extend(toks)
    return out


def bpe_tokens(merges: list[tuple[str, str]], col: str | Column) -> Column:
    """``array<string>`` of BPE tokens (latin-1 byte symbols / merged
    strings) — Arrow-vectorized, broadcast merges, per-batch word
    cache. Stateless: streaming-safe."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def _tok(s: pd.Series) -> pd.Series:
        cache: dict = {}
        return s.map(lambda t: _encode_text(t, ranks, cache))

    c = F.col(col) if isinstance(col, str) else col
    return _tok(c)


def bpe_token_count(merges: list[tuple[str, str]], col: str | Column) -> Column:
    """``long`` token count under the trained merges — drop-in
    ``count_expr`` for ``packing.pack_sequences`` / ``shard_rows``
    (the real sequence-length bound the heuristic can't give)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def _cnt(s: pd.Series) -> pd.Series:
        cache: dict = {}
        return s.map(lambda t: len(_encode_text(t, ranks, cache)))

    c = F.col(col) if isinstance(col, str) else col
    return _cnt(c)


def bpe_vocab(merges: list[tuple[str, str]], specials: tuple[str, ...] = ()) -> list[str]:
    """Token string by id (index = id): the 256 base byte symbols
    first (id = byte value — stable across vocabularies), then one
    merged token per merge in rank order, then the reserved special
    tokens. Total id space = 256 + len(merges) + len(specials).

    That total is an UPPER bound on distinct token STRINGS: two merges
    can produce the same string (('a','bc') and ('ab','c') both yield
    'abc'). Ids stay distinct either way; the encoder resolves string
    collisions by emitting the EARLIEST id (:func:`bpe_ids`), and
    decode (an id -> index lookup) is unaffected."""
    return [chr(i) for i in range(256)] + [a + b for a, b in merges] + list(specials)


def bpe_special_ids(
    merges: list[tuple[str, str]], specials: tuple[str, ...] = DEFAULT_SPECIALS
) -> dict[str, int]:
    """Special-token string -> reserved id (ids follow the merges:
    256 + len(merges) + position). The encoder never emits these;
    shard writers append them by id and ``pack_sequences`` counts
    them via ``sep_tokens``."""
    base = 256 + len(merges)
    return {tok: base + j for j, tok in enumerate(specials)}


def _ids_by_token(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Encode-side token-string -> id map. On a string collision
    (duplicate merge products) the EARLIEST id wins — deterministic,
    and decode maps that id back to the identical string."""
    ids: dict[str, int] = {}
    for i, tok in enumerate(bpe_vocab(merges)):
        ids.setdefault(tok, i)
    return ids


def bpe_ids(merges: list[tuple[str, str]], col: str | Column) -> Column:
    """``array<int>`` of token IDS under the trained vocabulary — what
    a training shard actually stores. Same Arrow envelope as
    :func:`bpe_tokens`; ids come from :func:`bpe_vocab` (bytes 0-255,
    then merges by rank; string collisions resolve to the earliest
    id). Special tokens are never emitted here — append them by id
    (:func:`bpe_special_ids`) at the packing layer."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ids = _ids_by_token(merges)

    @pandas_udf("array<int>")
    def _ids_udf(s: pd.Series) -> pd.Series:
        cache: dict = {}
        return s.map(lambda t: [ids[tok] for tok in _encode_text(t, ranks, cache)])

    c = F.col(col) if isinstance(col, str) else col
    return _ids_udf(c)


def bpe_decode(
    merges: list[tuple[str, str]],
    col: str | Column,
    specials: tuple[str, ...] = (),
) -> Column:
    """``array<int>`` token ids -> the decoded ``string`` — the ids ->
    text inverse every packed-shard audit needs (decode a sample, diff
    against the source). Text-token ids concatenate their latin-1 byte
    symbols and UTF-8-decode the byte stream; special ids (past
    256 + len(merges)) render as their literal strings (``specials``
    must cover every special id present). Exact inverse:
    ``bpe_decode(bpe_ids(text)) == text`` for ANY input, because the
    pretokenizer partitions the text and symbols are raw UTF-8 bytes.
    Decoding an id slice that splits a multi-byte character (a
    mid-sequence shard window) yields U+FFFD replacement characters
    for the torn bytes rather than failing, matching standard
    tokenizer behavior."""
    vocab = bpe_vocab(merges, specials)
    n_text = 256 + len(merges)

    @pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        def dec(ids):
            if ids is None:
                return None
            parts: list[str] = []
            buf: list[str] = []
            for i in ids:
                i = int(i)
                if i < 0 or i >= len(vocab):
                    raise ValueError(
                        f"token id {i} outside vocabulary of {len(vocab)} "
                        "(wrong merges table or missing specials?)"
                    )
                if i < n_text:
                    buf.append(vocab[i])
                else:
                    if buf:
                        parts.append("".join(buf).encode("latin-1").decode("utf-8", "replace"))
                        buf = []
                    parts.append(vocab[i])
            if buf:
                parts.append("".join(buf).encode("latin-1").decode("utf-8", "replace"))
            return "".join(parts)

        return s.map(dec)

    c = F.col(col) if isinstance(col, str) else col
    return _dec(c)


def bpe_doc_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    route: str = "join",
    caches: list | None = None,
) -> DataFrame:
    """Per-document BPE token counts ``(id, n_tokens)`` — the frame a
    tokenize-and-pack job feeds ``pack_sequences`` at corpus scale.

    ``route='join'`` (the 100 TB default) makes the Python merge-loop
    work proportional to the corpus's GLOBAL distinct-pretoken count
    instead of rows x words: explode pretokens -> per-(doc, word)
    occurrence counts (one combinable shuffle) -> encode each DISTINCT
    word exactly once in a bounded Arrow pass -> join the per-word
    token length back (AQE broadcasts it when the vocabulary is small)
    -> one JVM sum per document. Zipf bounds the distinct-word frame
    the same way ``word_histogram`` already relies on; everything on
    the document axis stays whole-stage-codegen.

    ``route='udf'`` is the per-row Arrow encoder (:func:`bpe_token_count`)
    — zero shuffle, streaming-safe, but its per-batch word cache redoes
    Python work per batch; right for streams and small batches.

    The per-(doc, word) aggregate is CACHED (disk-spillable, and far
    smaller than the raw text: no payloads, words deduplicated within
    each doc) because both the distinct-word side and the final sum
    consume it — without the cache Catalyst re-expands the diamond and
    the pretokenize UDF runs over the corpus twice (verified in the
    physical plan). Pass ``caches`` to collect the handle and
    ``unpersist()`` after the terminal action, mirroring
    ``simhash_neardup_pairs``."""
    if route == "udf":
        return docs.select(
            F.col(id_col).alias("id"),
            bpe_token_count(merges, text_col).alias("n_tokens"),
        )
    if route != "join":
        raise ValueError(f"route must be 'join' or 'udf' (got {route!r})")
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("long")
    def _word_len(s: pd.Series) -> pd.Series:
        return s.map(lambda w: len(_encode_word(w, ranks)))

    per_doc_word = (
        docs.select(F.col(id_col).alias("id"), F.explode(bpe_pretokens(text_col)).alias("w"))
        .groupBy("id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()
    )
    if caches is not None:
        caches.append(per_doc_word)
    word_len = per_doc_word.select("w").distinct().withColumn("n_tok", _word_len(F.col("w")))
    counts = (
        per_doc_word.join(word_len, "w")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("n_tok")).alias("n_tokens"))
    )
    # left join keeps zero-word documents (empty/null text) at 0
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(counts, "id", "left")
        .select("id", F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"))
    )


def load_merges(spark, path: str) -> list[tuple[str, str]]:
    """Read a persisted ``merges_table`` parquet back into the
    rank-ordered merges list the encoders take."""
    return [
        (r["left"], r["right"])
        for r in spark.read.parquet(path).orderBy("rank").collect()
    ]


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """The merges as a ``(rank, left, right)`` frame — the persistable
    model artifact (write it as parquet next to the shards; training
    jobs read it back with ``[(r['left'], r['right']) for r in ...]``
    ordered by rank)."""
    from cs533_big_data_data_mining_spark.session import local_df

    return local_df(
        spark,
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, left string, right string",
    )
