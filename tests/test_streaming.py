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
