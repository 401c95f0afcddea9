"""Multimodal binary-column plumbing (stub decode, resize, frame sampling)."""

from cs533_big_data_data_mining_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    documents_as_media,
    frame_sample_stub,
    pack_stub_payload,
    resize_stub,
)

import pytest


def _media_df(spark):
    rows = [
        (0, "image", pack_stub_payload(640, 480, 3, b"\x00" * 100), "camA"),
        (1, "image", pack_stub_payload(1920, 1080, 3, b"\x01" * 5000), "camB"),
        (2, "audio", pack_stub_payload(0, 0, 1, b"\x02" * 2048), "mic"),
        (3, "video", pack_stub_payload(1280, 720, 3, b"\x03" * 10240), "camA"),
        (4, "image", b"NOTAHEADER", "corrupt"),
        (5, "image", None, "null-payload"),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_stub(spark):
    out = {r["media_id"]: r for r in decode_media(_media_df(spark)).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (640, 480, 3)
    assert out[1]["n_bytes"] == 9 + 5000
    assert out[4]["payload_ok"] is False and out[4]["width"] == 0
    assert out[5]["payload_ok"] is False and out[5]["n_bytes"] == 0


def test_real_decode_gated(spark):
    with pytest.raises(NotImplementedError):
        decode_media(_media_df(spark), decode="real")


def test_resize_roundtrip(spark):
    resized = resize_stub(_media_df(spark), 224, 224)
    out = {r["media_id"]: r for r in decode_media(resized).collect()}
    assert (out[0]["width"], out[0]["height"]) == (224, 224)
    assert out[0]["channels"] == 3  # preserved
    assert out[4]["payload_ok"] is False  # corrupt rows pass through


def test_frame_sampling(spark):
    frames = frame_sample_stub(_media_df(spark), every_n=5).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_index"])
    # video id=3 has 10240//1024+1 = 11 frames -> samples 0,5,10
    assert sorted(by_id[3]) == [0, 5, 10]


def test_documents_adapter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = documents_as_media(docs)
    decoded = decode_media(media)
    assert decoded.count() == docs.count()
    # payload bytes == utf-8 length of text
    joined = decoded.join(docs, decoded["media_id"] == docs["doc_id"]).collect()
    import pyspark.sql.functions as F  # noqa
    for r in joined[:20]:
        assert r["n_bytes"] == len(r["text"].encode("utf-8"))


def test_byte_histogram_features(spark):
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        byte_histogram_features,
        documents_as_media,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa", "t"), (2, "zzzz", "t"), (3, "", "t")], ["doc_id", "text", "source"]
    )
    out = byte_histogram_features(documents_as_media(docs), bins=64).collect()
    by_id = {r["media_id"]: np.asarray(r["features"]) for r in out}
    # 'a' = 97 -> bucket 97 >> 2 = 24; all mass in one bucket, L1-normalized
    assert by_id[1][24] == 1.0 and by_id[1].sum() == 1.0
    assert by_id[2][ord("z") >> 2] == 1.0
    assert by_id[3].sum() == 0.0
    assert all(len(r["features"]) == 64 for r in out)


def test_byte_histogram_feeds_similarity(spark):
    from pyspark.sql import functions as F

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        byte_histogram_features,
        documents_as_media,
    )
    from cs533_big_data_data_mining_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    docs = spark.createDataFrame(
        [(1, "hello world", "t"), (2, "hello worlds", "t"), (3, "qqqq xyz 123", "t")],
        ["doc_id", "text", "source"],
    )
    feats = byte_histogram_features(documents_as_media(docs)).filter(
        F.size("features") > 0
    )
    top = cosine_topk_bruteforce(
        feats, feats.filter("media_id = 1"), k=1, id_col="media_id", vec_col="features"
    ).collect()
    assert top[0]["neighbor_id"] == 2  # near-identical byte profile wins
