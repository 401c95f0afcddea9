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
