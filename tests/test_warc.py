"""WARC/WET source vs hand-built archives (spec: ISO 28500)."""

import gzip


def _warc_record(rtype: str, uri: str, payload: bytes, date="2024-01-01T00:00:00Z") -> bytes:
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {rtype}\r\n".encode()
        + (f"WARC-Target-URI: {uri}\r\n".encode() if uri else b"")
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
        + b"\r\n"
    )
    return head + payload + b"\r\n\r\n"


def _build_wet(records) -> bytes:
    return b"".join(_warc_record(*r) for r in records)


def test_read_warc_plain_and_gzip(spark, tmp_path):
    from cs533_big_data_data_mining_spark.sources.warc import read_warc, warc_text

    recs = [
        ("warcinfo", None, b"software: test\r\n"),
        ("conversion", "https://a.example/page1", "hello extracted text one".encode()),
        ("conversion", "https://a.example/page2", "second page body here".encode()),
        ("response", "https://a.example/raw", b"\x00\x01HTTP binary body WARC/1.0 fake\x02"),
    ]
    blob = _build_wet(recs)
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "f1.wet").write_bytes(blob)
    (d / "f2.wet.gz").write_bytes(gzip.compress(blob))

    df = read_warc(spark, str(d))
    rows = df.collect()
    assert len(rows) == 8  # 4 records x 2 files
    by_type = {}
    for r in rows:
        by_type.setdefault(r.record_type, []).append(r)
    assert len(by_type["conversion"]) == 4 and len(by_type["response"]) == 2
    # payload bytes survive exactly, even with a fake WARC/1.0 inside
    resp = by_type["response"][0]
    assert bytes(resp.content) == recs[3][2]
    assert resp.content_length == len(recs[3][2])

    txt = warc_text(spark, str(d))
    texts = sorted(r.text for r in txt.collect())
    assert texts == sorted(["hello extracted text one", "second page body here"] * 2)
    assert all(r.target_uri.startswith("https://a.example/") for r in txt.collect())


def test_read_warc_resyncs_after_damage(spark, tmp_path):
    from cs533_big_data_data_mining_spark.sources.warc import read_warc

    good = _warc_record("conversion", "https://b.example/x", b"clean body")
    damaged = b"garbage bytes not a record\r\nmore junk\r\n"
    (tmp_path / "d.wet").write_bytes(damaged + good + damaged + good)
    rows = read_warc(spark, str(tmp_path / "d.wet")).collect()
    assert len(rows) == 2
    assert all(bytes(r.content) == b"clean body" for r in rows)


def test_read_warc_multi_batch_output_identical(spark, tmp_path):
    """Bounded-batch streaming (both the byte and the record bound)
    yields exactly the same records as one-shot parsing — the flush
    boundaries are invisible in the output."""
    from cs533_big_data_data_mining_spark.sources.warc import read_warc

    recs = [
        ("conversion", f"https://m.example/p{i}", f"body number {i} {'x' * (i % 7)}".encode())
        for i in range(25)
    ]
    d = tmp_path / "crawl3"
    d.mkdir()
    (d / "m.wet").write_bytes(_build_wet(recs))
    (d / "m2.wet.gz").write_bytes(gzip.compress(_build_wet(recs)))

    def canon(df):
        return sorted(
            (r.path.rsplit("/", 1)[-1], r.target_uri, bytes(r.content)) for r in df.collect()
        )

    one_shot = canon(read_warc(spark, str(d)))
    assert len(one_shot) == 50
    # record bound: 4 records/batch -> 7 batches per file
    assert canon(read_warc(spark, str(d), batch_records=4)) == one_shot
    # byte bound: ~15-byte payloads flush every couple of records
    assert canon(read_warc(spark, str(d), batch_bytes=30)) == one_shot


def test_read_warc_rejects_oversized_file(spark, tmp_path, monkeypatch):
    """Files past the binaryFile 2 GB single-cell cap fail when the
    frame EXECUTES, with a clear message (cap lowered for the test
    via monkeypatch — read_warc captures the value at call time, so
    the patched cap ships in the task closure). Construction itself
    stays lazy — no driver job."""
    import pytest

    from cs533_big_data_data_mining_spark.sources import warc as warc_mod

    (tmp_path / "big.wet").write_bytes(_build_wet([("conversion", "https://z/1", b"x" * 512)]))
    monkeypatch.setattr(warc_mod, "_MAX_FILE_BYTES", 100)
    frame = warc_mod.read_warc(spark, str(tmp_path / "big.wet"))  # lazy: no error yet
    with pytest.raises(Exception, match="2 GB"):
        frame.count()


def test_cli_curate_from_wet(spark, tmp_path):
    """End-to-end crawl -> curated parquet: WET ingest, exact dup
    across pages collapses, source column comes from the host."""
    from cs533_big_data_data_mining_spark.__main__ import main

    body_a = b"a genuinely unique page body with plenty of ordinary words"
    body_b = b"another unrelated body of text about different things entirely"
    recs = [
        ("conversion", "https://x.example/p1", body_a, "2024-01-01T00:00:00Z"),
        ("conversion", "https://x.example/p2", body_a, "2024-01-01T00:00:01Z"),  # exact dup
        ("conversion", "https://y.example/q", body_b, "2024-01-01T00:00:02Z"),
    ]
    d = tmp_path / "crawl2"
    d.mkdir()
    (d / "c.wet").write_bytes(_build_wet(recs))
    out = str(tmp_path / "curated_wet.parquet")

    assert main(["curate", "-i", str(d), "-o", out, "--wet"]) == 0
    got = spark.read.parquet(out).collect()
    texts = sorted(r["text"] for r in got)
    assert texts == sorted([body_a.decode(), body_b.decode()])
    assert sorted(r["source"] for r in got) == ["x.example", "y.example"]
