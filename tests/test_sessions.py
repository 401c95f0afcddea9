"""Sessionization: batch vs DuckDB oracle, stream vs batch."""

from __future__ import annotations

import pandas as pd

from cs533_big_data_data_mining_spark.streaming.events import (
    load_events,
    read_events_stream,
    run_stream_to_memory,
)
from cs533_big_data_data_mining_spark.streaming.sessions import (
    sessionize,
    sessionize_oracle_sql,
    sessionize_stream,
)

SF_DIR = "/root/testdata/sf0.001"


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["value_sum"] = pdf["value_sum"].round(6)
    for c in ("session_start", "session_end"):
        pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return (
        pdf[["user_id", "session_start", "session_end", "n_events", "value_sum"]]
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


def test_sessionize_matches_oracle(spark):
    import duckdb

    got = _canon(sessionize(load_events(spark, f"{SF_DIR}/events.parquet")).toPandas())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    want = _canon(con.execute(sessionize_oracle_sql()).df())
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0


def test_sessionize_stream_matches_batch(spark, tmp_path):
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    events = load_events(spark, f"{SF_DIR}/events.parquet")
    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    # deterministic ascending time slices (repartitionByRange re-samples
    # its bounds per run — the __spark_entry__ harness flaked on that):
    # quantile cut points collected once become filter literals, each
    # slice its own zero-padded file
    evm = events.withColumn("_us", F.unix_micros("ts"))
    cuts = evm.stat.approxQuantile("_us", [i / 6 for i in range(1, 6)], 0.001)
    bounds = [float("-inf"), *sorted(set(cuts)), float("inf")]
    for i in range(len(bounds) - 1):
        part = evm.filter(
            (F.col("_us") > F.lit(bounds[i])) & (F.col("_us") <= F.lit(bounds[i + 1]))
        ).drop("_us")
        stage = str(tmp_path / f"stage{i}")
        part.coalesce(1).sortWithinPartitions("ts").write.parquet(stage)
        pf = glob.glob(f"{stage}/part-*.parquet")
        if pf:
            shutil.copy(pf[0], f"{src}/{i:02d}.parquet")

    stream = sessionize_stream(read_events_stream(spark, src, max_files_per_trigger=2))
    run_stream_to_memory(stream, "sessions_test", output_mode="append")
    got = _canon(spark.sql("SELECT * FROM sessions_test").toPandas())

    batch = _canon(sessionize(events).toPandas())
    # the stream's final open sessions never emit (no closing event /
    # watermark advance after end-of-input), so emitted sessions must
    # be a nonempty exact subset of the batch sessions
    assert len(got) >= 0.5 * len(batch)  # only watermark-open tails may be missing
    merged = got.merge(batch, how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), merged[merged["_merge"] != "both"]
