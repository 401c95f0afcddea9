"""Structured Streaming: file-source stream == batch result (unified API)."""

import pytest

from cs533_big_data_data_mining_spark.streaming.events import (
    load_events,
    read_events_stream,
    run_stream_to_memory,
    user_activity,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-lay the events table as many small files so the stream sees
    multiple micro-batches."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_events(spark, f"{sf_dir}/events.parquet").repartition(6).write.mode("overwrite").parquet(out)
    return out


def _rows_set(rows):
    return {tuple(r) for r in rows}


def test_windowed_counts_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    run_stream_to_memory(windowed_event_counts(stream), "win_counts")
    got = spark.sql("SELECT * FROM win_counts").collect()

    batch = windowed_event_counts(spark.read.parquet(events_dir)).collect()
    assert _rows_set(got) == _rows_set(batch)
    assert len(got) > 0


def test_user_activity_stream_equals_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=3)
    run_stream_to_memory(user_activity(stream), "user_act")
    got = spark.sql("SELECT * FROM user_act").collect()
    batch = user_activity(spark.read.parquet(events_dir)).collect()
    assert _rows_set(got) == _rows_set(batch)


def test_watermark_present_in_plan(spark, events_dir):
    stream = windowed_event_counts(read_events_stream(spark, events_dir))
    assert stream.isStreaming
    # event-time watermark node must exist for bounded state
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()


def test_dedup_stream_drops_redeliveries(spark, sf_dir, tmp_path):
    """A doubled event stream dedups back to the original id set, in
    streaming mode (watermark-bounded state) and in batch mode, with
    identical results."""
    from cs533_big_data_data_mining_spark.streaming.events import dedup_events

    out = str(tmp_path / "dup_events")
    ev = load_events(spark, f"{sf_dir}/events.parquet").limit(500)
    ev.unionAll(ev).repartition(4).write.mode("overwrite").parquet(out)

    batch = dedup_events(spark.read.parquet(out))
    assert batch.count() == 500
    assert batch.select("event_id").distinct().count() == 500

    stream = dedup_events(read_events_stream(spark, out, max_files_per_trigger=2))
    assert "EventTimeWatermark" in stream._jdf.queryExecution().analyzed().toString()
    run_stream_to_memory(stream, "dedup_ev", output_mode="append")
    got = spark.sql("SELECT event_id FROM dedup_ev").collect()
    assert len(got) == 500
    assert len({r["event_id"] for r in got}) == 500


def test_curate_ingest_batch_semantics(spark):
    import datetime

    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "good text with the and of tokens here", base),
        (2, "good text with the and of tokens here", base),   # exact dup
        (3, "mail me: a@b.co now", base),
        (4, "mail me: x@y.org now", base),                    # dup AFTER redaction
        (5, None, base),                                      # null text: quality 0, kept at min 0
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    out = curate_ingest(docs)
    texts = sorted((r["clean"] or "") for r in out.collect())
    assert len(texts) == 3
    assert "mail me: <EMAIL> now" in texts          # 3 and 4 collapse post-redaction
    assert "" in texts                               # null survives as its own group
    # quality floor drops the null/scored-low docs
    assert curate_ingest(docs, min_quality=0.1).count() == 2


def test_curate_ingest_stream_matches_batch(spark, tmp_path):
    import datetime

    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, f"doc body {i % 7} with the and of words", base + datetime.timedelta(seconds=i))
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "stream_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_stream_to_memory(curate_ingest(stream, watermark="1 hour"), "curate_ingest_t", output_mode="append")
    got = spark.sql("SELECT clean FROM curate_ingest_t")
    batch = curate_ingest(docs).select("clean")
    assert got.count() == batch.count() == 7
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0



def test_curate_ingest_decontamination(spark, tmp_path):
    """Ingest-time Bloom decontamination: every document sharing a
    benchmark 5-gram is dropped (no false negatives), clean documents
    pass, and the stream twin produces the same surviving text set."""
    import datetime

    from pyspark.sql import types as T

    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory

    base = datetime.datetime(2024, 1, 1)
    bench_phrase = "the secret benchmark question about spark internals"
    rows = [
        (
            i,
            (
                f"contaminated doc {i} contains {bench_phrase} verbatim"
                if i % 5 == 0
                else f"clean doc body {i} with the and of plain words"
            ),
            base + datetime.timedelta(seconds=i),
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    bench = spark.createDataFrame(
        [(100, f"q: {bench_phrase} a:42")], "qid long, text string"
    )

    out = curate_ingest(docs, benchmark=bench, bench_text_col="text")
    ids_possible = {r.id for r in out.collect()}
    # all 6 contaminated docs gone; dedup may further collapse cleans
    assert not any(i % 5 == 0 for i in ids_possible)
    assert len(ids_possible) == 24  # distinct clean texts (all unique here)

    # without a benchmark nothing is decontaminated
    assert curate_ingest(docs).count() == 30

    # stream twin: same surviving text set
    src = str(tmp_path / "decontam_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_stream_to_memory(
        curate_ingest(stream, watermark="1 hour", benchmark=bench, bench_text_col="text"),
        "curate_decontam_t",
        output_mode="append",
    )
    got = spark.sql("SELECT clean FROM curate_decontam_t")
    batch = out.select("clean")
    assert got.exceptAll(batch).count() == 0 and batch.exceptAll(got).count() == 0


def test_curate_ingest_url_gates_stream_matches_batch(spark, tmp_path):
    """RefinedWeb stage ZERO at ingest: blocked-domain hosts (incl.
    subdomain and trailing-dot FQDN spellings) and keyword-scored URLs
    drop in BOTH execution modes with the same survivor set; hostless
    rows pass both gates; the filter is stateless Column-only."""
    import datetime

    from pyspark.sql import types as T

    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        if i % 6 == 0:
            url = f"https://bad.example/p/{i}"          # exact block
        elif i % 6 == 1:
            url = f"https://a.sub.bad.example/p/{i}"    # suffix block
        elif i % 6 == 2:
            url = f"https://bad.example./p/{i}"         # FQDN block
        elif i % 6 == 3:
            url = f"https://ok.example/casino/poker/{i}"  # kw 1.2 >= 1.0
        elif i % 6 == 4:
            url = None                                   # hostless: keep
        else:
            url = f"https://h{i}.example/casino/{i}"     # kw 0.6 < 1.0: keep
        rows.append((i, f"unique doc body {i} with the and of words", url,
                     base + datetime.timedelta(seconds=i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, url string, ts timestamp")
    kwargs = dict(
        url_col="url",
        blocked_domains=["bad.example"],
        keyword_weights={"casino": 0.6, "poker": 0.6},
    )
    batch = curate_ingest(docs, **kwargs)
    ids = {r["id"] for r in batch.collect()}
    assert ids == {i for i in range(30) if i % 6 in (4, 5)}

    src = str(tmp_path / "urlgate_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_stream_to_memory(
        curate_ingest(stream, watermark="1 hour", **kwargs),
        "curate_urlgate_t",
        output_mode="append",
    )
    got = spark.sql("SELECT clean FROM curate_urlgate_t")
    bclean = batch.select("clean")
    assert got.count() == bclean.count()
    assert got.exceptAll(bclean).count() == 0 and bclean.exceptAll(got).count() == 0

    # gates without a URL column refuse loudly
    import pytest

    with pytest.raises(ValueError):
        curate_ingest(docs, blocked_domains=["bad.example"])


def test_curate_ingest_repetition_stream_matches_batch(spark, tmp_path):
    """Gopher A1.2 repetition removal at ingest: the round-9 per-row
    rewrite makes every signal stateless, so the gate runs on a
    stream with zero state. Spam pages (5 identical lines) drop in
    BOTH execution modes with the same survivor set."""
    import datetime

    from pyspark.sql import types as T

    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory

    base = datetime.datetime(2024, 1, 1)
    spam = "\n".join(["repeat this exact spam line verbatim now"] * 5)
    rows = []
    for i in range(30):
        body = f"unique doc body {i} with the and of varied words today"
        text = f"{body}\n{spam}" if i % 5 == 0 else f"{body}\nsecond line for doc {i} here"
        rows.append((i, text, base + datetime.timedelta(seconds=i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")

    batch = curate_ingest(docs, repetition=True)
    ids = {r["id"] for r in batch.collect()}
    assert ids == {i for i in range(30) if i % 5 != 0}

    src = str(tmp_path / "rep_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_stream_to_memory(
        curate_ingest(stream, watermark="1 hour", repetition=True),
        "curate_ingest_rep_t",
        output_mode="append",
    )
    got = spark.sql("SELECT id FROM curate_ingest_rep_t")
    assert {r["id"] for r in got.collect()} == ids


def test_gopher_repetition_carry_collision(spark):
    import pytest as _pytest

    from cs533_big_data_data_mining_spark.operators.quality import gopher_repetition

    docs = spark.createDataFrame([(1, "a b", 2)], "doc_id long, text string, keep long")
    with _pytest.raises(ValueError):
        gopher_repetition(docs, "doc_id", "text", carry=("keep",))


def test_curate_ingest_langs_stream_matches_batch(spark, tmp_path):
    """Language allowlist at ingest (pure Column, zero state): French
    marker pages drop in both execution modes, same survivor set."""
    import datetime

    from pyspark.sql import types as T

    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory

    base = datetime.datetime(2024, 1, 1)
    fr = "le chat est sur la table et les autres mots une fois"
    rows = [
        (
            i,
            fr if i % 4 == 0 else f"unique doc body {i} with the and of varied words",
            base + datetime.timedelta(seconds=i),
        )
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    batch = curate_ingest(docs, langs=("en",))
    ids = {r["id"] for r in batch.collect()}
    assert ids == {i for i in range(24) if i % 4 != 0}

    src = str(tmp_path / "langs_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_stream_to_memory(
        curate_ingest(stream, watermark="1 hour", langs=("en",)),
        "curate_ingest_langs_t",
        output_mode="append",
    )
    got = spark.sql("SELECT id FROM curate_ingest_langs_t")
    assert {r["id"] for r in got.collect()} == ids


def test_curate_ingest_history_gate_stream_matches_batch(spark, tmp_path):
    """The Dolma admission gate at ingest: a Bloom over the admitted
    corpus's exact content hashes drops re-crawled documents
    STATELESSLY in both execution modes — every true duplicate gone
    (no false negatives), same survivor set stream vs batch, and a
    prebuilt filter behaves identically to the history frame."""
    import datetime

    from pyspark.sql import types as T

    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.sketches import bloom_build
    from cs533_big_data_data_mining_spark.streaming.curate import curate_ingest
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory

    base = datetime.datetime(2024, 1, 1)
    hist_rows = [(1000 + j, f"admitted document body {j} with the and of words") for j in range(10)]
    hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
    rows = []
    for i in range(24):
        if i % 4 == 0:  # re-crawl of an admitted doc
            text = f"admitted document body {i // 4} with the and of words"
        else:
            text = f"fresh document body {i} with the and of words"
        rows.append((i, text, base + datetime.timedelta(seconds=i)))
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")

    batch = curate_ingest(docs, history=hist, history_fpp=1e-6)
    ids = {r["id"] for r in batch.collect()}
    assert ids == {i for i in range(24) if i % 4 != 0}

    # prebuilt filter: identical survivors, no history scan at call time
    seen = hist.select(F.xxhash64("text").cast("string").alias("__h")).distinct()
    bf = bloom_build(seen, "__h", fpp=1e-6)
    ids_bf = {r["id"] for r in curate_ingest(docs, history_bloom=bf).collect()}
    assert ids_bf == ids

    src = str(tmp_path / "histgate_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    run_stream_to_memory(
        curate_ingest(stream, watermark="1 hour", history_bloom=bf),
        "curate_histgate_t",
        output_mode="append",
    )
    got = spark.sql("SELECT clean FROM curate_histgate_t")
    bclean = batch.select("clean")
    assert got.count() == bclean.count()
    assert got.exceptAll(bclean).count() == 0 and bclean.exceptAll(got).count() == 0


def test_lang_id_nb_stream_gate(spark, tmp_path):
    """The trained langid is a stateless per-row gate at the stream
    edge (both implementations: the pure-Column expression and the
    Arrow pandas UDF are Structured-Streaming-safe) — survivors match
    the batch run exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cs533_big_data_data_mining_spark.operators.classify import (
        lang_id_nb,
        langid_train,
    )
    from cs533_big_data_data_mining_spark.streaming.events import run_stream_to_memory

    fr = "le chat est sur la table et les autres mots une fois"
    rows = [
        (i, fr if i % 4 == 0 else f"unique doc body {i} with the and of varied words")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # the model fits batch-side (on history / a seed shard); the
    # STREAM only evaluates the resulting stateless expression
    model = langid_train(docs, "text").cache()
    want = {
        r["doc_id"]
        for r in docs.filter(lang_id_nb(model, "text") == "en").collect()
    }
    assert want == {i for i in range(24) if i % 4 != 0}

    src = str(tmp_path / "langid_stream_src")
    docs.repartitionByRange(3, "doc_id").write.mode("overwrite").parquet(src)
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    for impl, sink in (("arrow", "langid_nb_arrow_t"), ("column", "langid_nb_col_t")):
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        run_stream_to_memory(
            stream.filter(lang_id_nb(model, "text", impl=impl) == "en"),
            sink,
            output_mode="append",
        )
        got = {r["doc_id"] for r in spark.sql(f"SELECT doc_id FROM {sink}").collect()}
        assert got == want, impl
