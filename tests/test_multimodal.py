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


# ------------------------------------------------- numpy decode route


def _bmp24(px):
    """(h, w, 3) uint8 RGB -> bottom-up 24-bit BMP bytes (row pad 4)."""
    import struct

    import numpy as np

    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        px[y, :, ::-1].tobytes() + b"\0" * pad for y in range(h - 1, -1, -1)
    )
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    return header + info + body


def test_numpy_decode_real_formats(spark):
    import struct

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        decode_media,
        pack_ppm,
        pack_wav_pcm16,
    )

    rng = np.random.default_rng(7)
    ppm_px = rng.integers(0, 256, (5, 9, 3), dtype=np.uint8)
    bmp_px = rng.integers(0, 256, (6, 7, 3), dtype=np.uint8)
    wav = rng.integers(-3000, 3000, (50, 2)).astype(np.int16)
    ppm_comment = b"P6\n# a comment\n 9  5 \n255\n" + ppm_px.tobytes()
    rows = [
        (1, "image", bytearray(pack_ppm(ppm_px)), "s"),
        (2, "image", bytearray(_bmp24(bmp_px)), "s"),
        (3, "audio", bytearray(pack_wav_pcm16(wav, 8000)), "s"),
        (4, "image", bytearray(ppm_comment), "s"),
        (5, "image", bytearray(b"P6\n9 5\n255\n" + b"\0" * 10), "s"),  # truncated
        (6, "image", bytearray(b"garbage"), "s"),
        (7, "image", None, "s"),
        # WAV with a junk chunk before fmt/data (chunk walking)
        (8, "audio", bytearray(
            b"RIFF" + struct.pack("<I", 4 + 8 + 2 + 8 + 16 + 8 + 4) + b"WAVE"
            + b"junk" + struct.pack("<I", 2) + b"zz"
            + b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
            + b"data" + struct.pack("<I", 4) + struct.pack("<hh", 100, -200)
        ), "s"),
    ]
    df = spark.createDataFrame(rows, "media_id long, modality string, payload binary, source string")
    got = {r["media_id"]: r for r in decode_media(df, decode="numpy").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"], got[1]["payload_ok"]) == (9, 5, 3, True)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"], got[2]["payload_ok"]) == (7, 6, 3, True)
    assert (got[3]["width"], got[3]["height"], got[3]["channels"], got[3]["payload_ok"]) == (50, 1, 2, True)
    assert (got[4]["width"], got[4]["height"], got[4]["payload_ok"]) == (9, 5, True)
    assert not got[5]["payload_ok"] and not got[6]["payload_ok"] and not got[7]["payload_ok"]
    assert (got[8]["width"], got[8]["channels"], got[8]["payload_ok"]) == (2, 1, True)


def test_image_stats_exact(spark):
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        image_stats,
        pack_ppm,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (4, 6, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image", bytearray(pack_ppm(px)), "s"), (2, "image", bytearray(b"nope"), "s")],
        "media_id long, modality string, payload binary, source string",
    )
    got = {r["media_id"]: r for r in image_stats(df).collect()}
    want = np.round(px.reshape(-1, 3).mean(axis=0), 6)
    assert got[1]["channel_means"] == pytest.approx(want.tolist(), abs=1e-9)
    assert (got[1]["width"], got[1]["height"]) == (6, 4)
    assert got[2]["channels"] == 0 and got[2]["channel_means"] == []


def test_resize_image_nearest_exact(spark):
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_ppm,
        pack_ppm,
        resize_image,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image", bytearray(pack_ppm(px)), "s"), (2, "image", bytearray(b"raw"), "s")],
        "media_id long, modality string, payload binary, source string",
    )
    out = {r["media_id"]: bytes(r["payload"]) for r in resize_image(df, 4, 5).collect()}
    w, h, _, got_px = _parse_ppm(out[1])
    assert (w, h) == (4, 5)
    yi = np.minimum(((np.arange(5) + 0.5) * 8 / 5), 7).astype(int)
    xi = np.minimum(((np.arange(4) + 0.5) * 10 / 4), 9).astype(int)
    assert np.array_equal(got_px, px[yi][:, xi])
    assert out[2] == b"raw"  # non-PPM passes through
    # upscale then stats: still a valid P6 the decoder accepts
    from cs533_big_data_data_mining_spark.operators.multimodal import image_stats

    up = image_stats(resize_image(df.filter("media_id = 1"), 20, 16)).collect()[0]
    assert (up["width"], up["height"]) == (20, 16)
    with pytest.raises(ValueError):
        resize_image(df, 0, 5)


def test_parse_ppm_low_maxval_rescales():
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import _parse_ppm

    # maxval=15 PPM: samples are 15ths of full scale; the decoder must
    # rescale to 8-bit (half-up) or channel means come out 17x low
    px4 = np.array([[[0, 7, 15], [15, 1, 0]]], dtype=np.uint8)  # (1, 2, 3)
    buf = b"P6\n2 1\n15\n" + px4.tobytes()
    w, h, c, got = _parse_ppm(buf)
    assert (w, h, c) == (2, 1, 3)
    expect = (px4.astype(np.float64) * (255.0 / 15) + 0.5).astype(np.uint8)
    assert np.array_equal(got, expect)
    assert got[0, 0, 2] == 255 and got[0, 1, 0] == 255  # full scale hits 255
    # maxval > 255 (2-byte samples) stays rejected
    assert _parse_ppm(b"P6\n2 1\n65535\n" + b"\0" * 12) is None


def test_png_decode_real(spark):
    import struct
    import zlib

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_png,
        decode_media,
        image_stats,
        pack_png,
        resize_image,
    )

    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (6, 9, 3), dtype=np.uint8)
    grey = rng.integers(0, 256, (4, 7, 1), dtype=np.uint8)
    rgba = rng.integers(0, 256, (5, 3, 4), dtype=np.uint8)
    ga = rng.integers(0, 256, (3, 8, 2), dtype=np.uint8)
    good = pack_png(rgb, filters="cycle")
    # corruption: flipped CRC byte, truncated IDAT, 16-bit depth
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF
    depth16 = bytearray(good)
    depth16[24] = 16  # IHDR bit-depth byte — CRC now wrong too
    # structurally valid chunks but IDAT inflates to the WRONG length
    sig = good[:8]
    ihdr = struct.pack(">IIBBBBB", 9, 6, 8, 2, 0, 0, 0)
    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
    short = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(b"\0" * 10)) + chunk(b"IEND", b"")
    rows = [
        (1, "image", bytearray(good), "s"),
        (2, "image", bytearray(pack_png(grey, filters="none")), "s"),
        (3, "image", bytearray(pack_png(rgba, filters="cycle")), "s"),
        (4, "image", bytearray(pack_png(ga, filters="cycle")), "s"),
        (5, "image", bytearray(bytes(bad_crc)), "s"),
        (6, "image", bytearray(bytes(depth16)), "s"),
        (7, "image", bytearray(short), "s"),
    ]
    df = spark.createDataFrame(rows, "media_id long, modality string, payload binary, source string")
    got = {r["media_id"]: r for r in decode_media(df, decode="numpy").collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"], got[1]["payload_ok"]) == (9, 6, 3, True)
    assert (got[2]["width"], got[2]["height"], got[2]["channels"], got[2]["payload_ok"]) == (7, 4, 1, True)
    assert (got[3]["width"], got[3]["height"], got[3]["channels"], got[3]["payload_ok"]) == (3, 5, 4, True)
    assert (got[4]["width"], got[4]["height"], got[4]["channels"], got[4]["payload_ok"]) == (8, 3, 2, True)
    assert not got[5]["payload_ok"] and not got[6]["payload_ok"] and not got[7]["payload_ok"]
    # pixel path: exact per-channel means through image_stats
    st_ = {r["media_id"]: r for r in image_stats(df.filter("media_id <= 4")).collect()}
    for mid, px in ((1, rgb), (2, grey), (3, rgba), (4, ga)):
        want = np.round(px.reshape(-1, px.shape[2]).mean(axis=0), 6)
        assert st_[mid]["channel_means"] == pytest.approx(want.tolist(), abs=1e-9)
    # resize: PNG in -> PNG out, same color type, exact nearest gather
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_image(df.filter("media_id IN (1, 3)"), 4, 3).collect()
    }
    for mid, px in ((1, rgb), (3, rgba)):
        r = _parse_png(out[mid])
        assert r is not None and (r[0], r[1], r[2]) == (4, 3, px.shape[2])
        h, w = px.shape[:2]
        yi = np.minimum(((np.arange(3) + 0.5) * h / 3), h - 1).astype(int)
        xi = np.minimum(((np.arange(4) + 0.5) * w / 4), w - 1).astype(int)
        assert np.array_equal(r[3], px[yi][:, xi])


def test_audio_stats_exact(spark):
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        audio_stats,
        pack_wav_pcm16,
    )

    s = np.array([[0, 16384], [-32768, 8192], [100, -100]], dtype=np.int16)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(pack_wav_pcm16(s, 22050)), "x"),
         (2, "audio", bytearray(b"not audio"), "x")],
        "media_id long, modality string, payload binary, source string",
    )
    got = {r["media_id"]: r for r in audio_stats(df).collect()}
    a = np.abs(s / 32768.0)
    assert got[1]["n_samples"] == 3 and got[1]["n_channels"] == 2
    assert got[1]["sample_rate"] == 22050
    assert got[1]["mean_abs"] == pytest.approx(round(float(a.mean()), 6))
    assert got[1]["peak_abs"] == pytest.approx(1.0)
    assert got[2]["n_samples"] == 0 and got[2]["mean_abs"] == 0.0


def test_numpy_decode_hardening(spark):
    # review findings: bad decode value raises; NULL payload survives
    # resize as NULL; a BMP whose data offset overlaps the headers is
    # rejected (would otherwise 'decode' header bytes as pixels)
    import struct

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_bmp,
        decode_media,
        pack_ppm,
        resize_image,
    )

    df = spark.createDataFrame(
        [(1, "image", None, "s"),
         (2, "image", bytearray(pack_ppm(np.zeros((2, 2, 3), np.uint8))), "s")],
        "media_id long, modality string, payload binary, source string",
    )
    with pytest.raises(ValueError):
        decode_media(df, decode="np")
    out = {r["media_id"]: r["payload"] for r in resize_image(df, 2, 2).collect()}
    assert out[1] is None and out[2] is not None
    # data_off pointing into the header region -> reject
    bad = bytearray(_bmp24(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<I", bad, 10, 0)
    assert _parse_bmp(bytes(bad)) is None
    # product packer agrees byte-for-byte with this test's independent twin
    from cs533_big_data_data_mining_spark.operators.multimodal import pack_bmp24

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    assert pack_bmp24(px) == _bmp24(px)
    assert np.array_equal(_parse_bmp(pack_bmp24(px))[3], px)


# ----------------------------------------------- parser fuzz (pure py)


def test_media_parsers_fuzz_roundtrip():
    # hypothesis-style fuzz without Spark: random valid media round-
    # trips bit-exactly; random byte noise never raises, only returns
    # None or a structurally consistent parse
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _numpy_decode_one,
        _parse_bmp,
        _parse_png,
        _parse_ppm,
        _parse_wav,
        pack_bmp24,
        pack_png,
        pack_ppm,
        pack_wav_pcm16,
    )

    @settings(max_examples=80, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
        kind=st.sampled_from(["ppm", "bmp", "wav", "png1", "png2", "png3", "png4"]),
    )
    def roundtrip(w, h, seed, kind):
        rng = np.random.default_rng(seed)
        if kind == "wav":
            s = rng.integers(-32768, 32768, (w * h, min(h, 4))).astype(np.int16)
            r = _parse_wav(pack_wav_pcm16(s, 8000 + w))
            assert r is not None and r[0] == w * h and r[1] == min(h, 4)
            assert np.array_equal((r[3] * 32768.0).astype(np.int16), s)
        elif kind.startswith("png"):
            ch = int(kind[3])
            px = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
            r = _parse_png(pack_png(px, filters="cycle" if seed % 2 else "none"))
            assert r is not None and (r[0], r[1], r[2]) == (w, h, ch)
            assert np.array_equal(r[3], px)
        else:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            buf = pack_ppm(px) if kind == "ppm" else pack_bmp24(px)
            r = (_parse_ppm if kind == "ppm" else _parse_bmp)(buf)
            assert r is not None and (r[0], r[1]) == (w, h)
            assert np.array_equal(r[3], px)

    @settings(max_examples=120, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200), magic=st.sampled_from(
        [b"", b"P6", b"BM", b"RIFF", b"RIFFxxxxWAVE", b"P6\n", b"\x89PNG\r\n\x1a\n"]
    ))
    def noise(data, magic):
        buf = magic + data
        r = _numpy_decode_one(buf)  # must never raise
        if r is not None:
            w, h, c = r
            # w == 0 is legal: a structurally valid WAV may carry an
            # empty data chunk; images guarantee positive dims
            assert w >= 0 and h > 0 and c > 0

    roundtrip()
    noise()


def test_png_decode_bomb_hardening():
    """Untrusted-payload guards: a DEFLATE stream inflating past the
    IHDR-declared size is rejected by the bounded inflate (never
    materialized), and forged giant IHDR dims are rejected before any
    allocation."""
    import struct
    import zlib

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        pack_png,
    )

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(
            ">I", zlib.crc32(t + d) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    bomb = (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\0" * 1_000_000))
        + chunk(b"IEND", b"")
    )
    assert _parse_png(bomb) is None
    ihdr_big = struct.pack(">IIBBBBB", 2**20, 2**20, 8, 2, 0, 0, 0)
    giant = (
        _PNG_SIG + chunk(b"IHDR", ihdr_big)
        + chunk(b"IDAT", zlib.compress(b"\0" * 100))
        + chunk(b"IEND", b"")
    )
    assert _parse_png(giant) is None
    # an exact-size stream still decodes
    px = np.full((3, 3, 3), 7, dtype=np.uint8)
    assert _parse_png(pack_png(px)) is not None


# ---------------------------------------------------------------- jpeg


def test_jpeg_solid_exact_roundtrip():
    """Solid grayscale with the flat quant=8 table round-trips
    EXACTLY: the DCT of a flat block is DC-only = 8*(v-128), and
    8*(v-128)/8 is integral — the huffman/dequant/IDCT/crop chain has
    zero quantization loss to hide behind."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg,
    )

    for v in (0, 1, 127, 128, 200, 255):
        for dims in ((8, 8), (16, 24), (10, 13)):  # incl. non-multiple-of-8
            img = np.full(dims, v, dtype=np.uint8)
            r = _parse_jpeg(pack_jpeg(img, quant=8))
            assert r is not None
            w, h, c, px = r
            assert (w, h, c) == (dims[1], dims[0], 1)
            assert (px == v).all(), (v, dims)


def test_jpeg_content_roundtrip_and_idct_reference():
    """Random content at quant=1 round-trips within DCT rounding (±2);
    the IDCT matrix equals T.81's naive 1/4*C(u)C(v) double-cosine sum
    to 1e-9 on an arbitrary coefficient block."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _JPEG_T,
        _parse_jpeg,
        pack_jpeg,
    )

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 40), dtype=np.uint8).astype(np.uint8)
    r = _parse_jpeg(pack_jpeg(img, quant=1))
    assert np.abs(r[3][:, :, 0].astype(int) - img.astype(int)).max() <= 2

    rgb = rng.randint(0, 256, (10, 13, 3), dtype=np.uint8).astype(np.uint8)
    r = _parse_jpeg(pack_jpeg(rgb, quant=1))
    assert (r[0], r[1], r[2]) == (13, 10, 3)
    assert np.abs(r[3].astype(int) - rgb.astype(int)).max() <= 4  # + YCbCr rounding

    coef = np.zeros((8, 8))
    coef[0, 0], coef[1, 2], coef[5, 7] = 16.0, -24.0, 9.0
    got = _JPEG_T.T @ coef @ _JPEG_T
    ref = np.zeros((8, 8))
    C = lambda u: 1 / np.sqrt(2) if u == 0 else 1.0
    for x in range(8):
        for y in range(8):
            ref[x, y] = sum(
                C(u) * C(v) * coef[u, v]
                * np.cos((2 * x + 1) * u * np.pi / 16)
                * np.cos((2 * y + 1) * v * np.pi / 16)
                for u in range(8)
                for v in range(8)
            ) / 4
    assert np.abs(got - ref).max() < 1e-9


def test_jpeg_restart_markers_and_dc_reset():
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 32), dtype=np.uint8).astype(np.uint8)
    plain = _parse_jpeg(pack_jpeg(img, quant=1))
    with_rst = _parse_jpeg(pack_jpeg(img, quant=1, restart_interval=3))
    assert with_rst is not None
    assert (plain[3] == with_rst[3]).all()


def test_jpeg_structural_rejection():
    """Anything non-baseline or damaged returns None (codec route):
    truncation, progressive SOF2, trailing garbage, missing huffman
    tables, and non-JPEG magic."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg,
    )

    buf = pack_jpeg(np.full((8, 8), 99, np.uint8), quant=8)
    assert _parse_jpeg(buf) is not None
    assert _parse_jpeg(buf[:-2]) is None          # missing EOI
    assert _parse_jpeg(buf[:20]) is None          # truncated header
    # garbage BETWEEN entropy data and EOI is structural damage;
    # bytes AFTER EOI are tolerated (the wild is full of them)
    assert _parse_jpeg(buf[:-2] + b"x" + buf[-2:]) is None
    assert _parse_jpeg(buf + b"x") is not None
    assert _parse_jpeg(b"NOTAJPEG") is None
    prog = bytearray(buf)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2                          # pretend progressive
    assert _parse_jpeg(bytes(prog)) is None
    nodht = bytearray()
    i = 0
    while i < len(buf):  # strip every DHT segment
        if buf[i] == 0xFF and buf[i + 1] == 0xC4:
            (ln,) = __import__("struct").unpack_from(">H", buf, i + 2)
            i += 2 + ln
        else:
            nodht.append(buf[i])
            i += 1
    assert _parse_jpeg(bytes(nodht)) is None


def test_jpeg_through_decode_media_and_image_stats(spark):
    """JPEG payloads flow through the numpy decode route and the
    pixel-stats kernel next to the other formats."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        decode_media,
        image_stats,
        pack_jpeg,
        pack_ppm,
    )

    rows = [
        (1, "image", bytearray(pack_jpeg(np.full((16, 8), 77, np.uint8), quant=8)), "s"),
        (2, "image", bytearray(pack_ppm(np.full((2, 3, 3), 9, np.uint8))), "s"),
        (3, "image", bytearray(b"junk"), "s"),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, source string"
    )
    meta = {r["media_id"]: r for r in decode_media(media, decode="numpy").collect()}
    assert (meta[1]["width"], meta[1]["height"], meta[1]["channels"]) == (8, 16, 1)
    assert meta[1]["payload_ok"] and meta[2]["payload_ok"] and not meta[3]["payload_ok"]
    st = {r["media_id"]: r for r in image_stats(media).collect()}
    assert st[1]["channel_means"] == [77.0]
    assert st[2]["channel_means"] == [9.0, 9.0, 9.0]
    assert st[3]["channel_means"] == []


def test_jpeg_fill_bytes_and_pixel_budget():
    """T.81 B.1.1.2 fill bytes (0xFF runs before a marker) must be
    skipped — real encoders emit them; and the JPEG-specific pixel
    budget (bit-serial entropy decode) rejects oversize dimensions."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg,
    )

    img = np.full((8, 16), 77, dtype=np.uint8)
    buf = pack_jpeg(img, quant=8)
    # insert a fill byte before the SOF0 marker (FF C0)
    sof = buf.index(b"\xff\xc0")
    padded = buf[:sof] + b"\xff" + buf[sof:]
    r = _parse_jpeg(padded)
    assert r is not None and (r[0], r[1]) == (16, 8)
    assert (r[3][:, :, 0] == 77).all()

    # patch SOF dims past _JPEG_MAX_PIXELS: reject before any decode
    h_off = sof + 5  # FF C0 len2 prec h2 w2
    huge = bytearray(buf)
    huge[h_off : h_off + 4] = (2000).to_bytes(2, "big") + (2000).to_bytes(2, "big")
    assert _parse_jpeg(bytes(huge)) is None


def test_gif_lzw_roundtrip_property():
    """GIF-flavor LZW: random alphabets and lengths, including streams
    long enough to fill the 4096-entry table and force a mid-stream
    CLEAR/reset — encode must replay the decoder's width schedule
    exactly or the bitstream desynchronizes."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(42)
    for mcs in (2, 4, 8):
        for n in (0, 1, 2, 100, 5000, 30000):
            data = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8).tobytes()
            assert _lzw_decode(_lzw_encode(data, mcs), mcs, n) == data
    # highly repetitive data exercises long dictionary chains (wKwKw)
    data = (b"\x00\x01" * 4000) + b"\x00" * 8000
    assert _lzw_decode(_lzw_encode(data, 2), 2, len(data)) == data


def test_gif_single_frame_exact_roundtrip():
    """pack_gif -> _parse_gif_frames recovers the exact pixels, both
    sequential and interlaced (distinct row values pin the 4-pass
    interlace permutation — a wrong row order cannot cancel out)."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_gif_frames,
        pack_gif,
    )

    rng = np.random.default_rng(3)
    px = (rng.integers(0, 6, size=(13, 9, 3)) * 40).astype(np.uint8)
    for interlace in (False, True):
        w, h, frames = _parse_gif_frames(pack_gif([px], interlace=interlace))
        assert (w, h, len(frames)) == (9, 13, 1)
        assert np.array_equal(frames[0], px)


def test_gif_animation_compositing():
    """Multi-frame semantics: sub-rectangle placement, transparent
    holes keeping the canvas, disposal 2 (restore background) and
    3 (restore previous) taking effect on the NEXT frame."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_gif_frames,
        pack_gif,
    )

    f0 = np.full((6, 8, 3), 10, dtype=np.uint8)
    f1 = np.full((2, 3, 3), 200, dtype=np.uint8)
    f1[0, 0] = (1, 2, 3)  # encoded transparent
    f2 = np.full((1, 2, 3), 77, dtype=np.uint8)

    buf = pack_gif([f0, f1], positions=[(0, 0), (2, 1)], transparent_color=(1, 2, 3))
    _, _, frames = _parse_gif_frames(buf)
    exp = f0.copy()
    exp[1:3, 2:5] = 200
    exp[1, 2] = 10  # the hole keeps the canvas color
    assert np.array_equal(frames[1], exp)

    for disp in (2, 3):  # both restore f1's region for frame 2 here
        buf = pack_gif(
            [f0, f1, f2],
            positions=[(0, 0), (2, 1), (0, 0)],
            disposals=[0, disp, 0],
            bg_color=(10, 10, 10),
        )
        _, _, frames = _parse_gif_frames(buf)
        exp2 = f0.copy()
        exp2[0, :2] = 77
        assert np.array_equal(frames[2], exp2), disp


def test_gif_structural_rejection():
    """Forged payloads must return None, never garbage: truncation,
    missing trailer, out-of-palette indices, oversize logical screen
    (BEFORE the canvas allocation), canvas-pixel budget across many
    frames, and nonzero bit padding after the LZW END code."""
    import struct

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _GIF_MAX_PIXELS,
        _lzw_encode,
        _parse_gif_frames,
        pack_gif,
    )

    f0 = np.zeros((4, 4, 3), np.uint8)
    good = pack_gif([f0])
    assert _parse_gif_frames(good) is not None
    assert _parse_gif_frames(good[:-1]) is None  # trailer gone
    assert _parse_gif_frames(good[:15]) is None  # truncated mid-header
    assert _parse_gif_frames(b"GIF89a" + b"\x00" * 7) is None

    # forged logical screen: guard fires before the canvas alloc
    huge = bytearray(good)
    struct.pack_into("<HH", huge, 6, 60000, 60000)
    assert _parse_gif_frames(bytes(huge)) is None

    # many-frame canvas budget: 301 copies of a 200x200 canvas
    side = 200
    n_frames = _GIF_MAX_PIXELS // (side * side) + 1
    tiny = np.zeros((1, 1, 3), np.uint8)
    buf = pack_gif(
        [np.zeros((side, side, 3), np.uint8)] + [tiny] * n_frames,
        positions=[(0, 0)] * (n_frames + 1),
    )
    assert _parse_gif_frames(buf) is None

    # out-of-palette index: hand-build a 2-color GCT image whose LZW
    # stream emits index 3
    hdr = b"GIF89a" + struct.pack("<HHBBB", 2, 1, 0x80, 0, 0) + b"\x00\x00\x00\xff\xff\xff"
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 1, 0)
    lzw = _lzw_encode(bytes([0, 3]), 2)
    body = bytes([2, len(lzw)]) + lzw + b"\x00\x3b"
    assert _parse_gif_frames(hdr + desc + body) is None

    # nonzero padding after the END code desyncs -> reject
    lzw_ok = _lzw_encode(bytes([0, 1]), 2)
    body_ok = bytes([2, len(lzw_ok)]) + lzw_ok + b"\x00\x3b"
    assert _parse_gif_frames(hdr + desc + body_ok) is not None
    junk = bytes([2, len(lzw_ok) + 1]) + lzw_ok + b"\xff" + b"\x00\x3b"
    assert _parse_gif_frames(hdr + desc + junk) is None


def test_gif_through_decode_media_and_image_stats(spark):
    """The numpy decode route and image_stats treat an animated GIF as
    its first composited frame; frame_sample_media decodes the full
    sequence with exact per-frame means."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        frame_sample_media,
        image_stats,
        pack_gif,
        pack_ppm,
        pack_wav_pcm16,
    )

    frames = [np.full((4, 5, 3), 30 * (k + 1), dtype=np.uint8) for k in range(5)]
    rows = [
        (0, "video", bytearray(pack_gif(frames)), "syn"),
        (1, "image", bytearray(pack_ppm(np.full((3, 4, 3), 9, dtype=np.uint8))), "syn"),
        (2, "audio", bytearray(pack_wav_pcm16(np.zeros((8, 1), dtype=np.int16))), "syn"),
        (3, "image", bytearray(b"garbage"), "syn"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)

    meta = {r["media_id"]: r for r in decode_media(df, decode="numpy").collect()}
    assert (meta[0]["width"], meta[0]["height"], meta[0]["channels"]) == (5, 4, 3)
    assert meta[0]["payload_ok"] and not meta[3]["payload_ok"]

    st = {r["media_id"]: r for r in image_stats(df).collect()}
    assert st[0]["channel_means"] == [30.0, 30.0, 30.0]  # first frame

    out = {}
    for r in frame_sample_media(df, every_n=2).collect():
        out.setdefault(r["media_id"], []).append(r)
    assert sorted(r["frame_index"] for r in out[0]) == [0, 2, 4]
    assert all(r["n_frames"] == 5 for r in out[0])
    by_idx = {r["frame_index"]: r for r in out[0]}
    for k in (0, 2, 4):
        assert by_idx[k]["mean_r"] == 30.0 * (k + 1)
    # a still image is a one-frame sequence; audio/garbage emit nothing
    assert [r["frame_index"] for r in out[1]] == [0]
    assert out[1][0]["mean_r"] == 9.0 and out[1][0]["n_frames"] == 1
    assert 2 not in out and 3 not in out


def test_resize_image_gif_animation(spark):
    """GIF resize re-encodes every composited frame: same frame
    count, exact nearest-neighbor pixels per frame, still a GIF."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _parse_gif_frames,
        pack_gif,
        resize_image,
    )

    rng = np.random.default_rng(5)
    frames = [(rng.integers(0, 4, size=(6, 8, 3)) * 50).astype(np.uint8) for _ in range(3)]
    df = spark.createDataFrame(
        [(0, "video", bytearray(pack_gif(frames)), "syn")], MEDIA_SCHEMA
    )
    out = resize_image(df, 4, 3).head()["payload"]
    w, h, got = _parse_gif_frames(bytes(out))
    assert (w, h, len(got)) == (4, 3, 3)
    yi = np.minimum(((np.arange(3) + 0.5) * 6 / 3), 5).astype(np.int64)
    xi = np.minimum(((np.arange(4) + 0.5) * 8 / 4), 7).astype(np.int64)
    for f, g in zip(frames, got):
        assert np.array_equal(g, f[yi][:, xi])


def test_png_indexed_color_roundtrip():
    """Indexed-color PNG (PLTE) at every legal palette bit depth:
    exact pixel recovery through bit unpacking + palette lookup +
    every byte-level unfilter path; tRNS promotes to RGBA with
    missing entries opaque."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_png,
        pack_png_indexed,
    )

    rng = np.random.default_rng(11)
    pal = [(10 * i, 5 * i, 255 - 10 * i) for i in range(16)]
    for depth, ncol in ((1, 2), (2, 4), (4, 16), (8, 16)):
        idx = rng.integers(0, ncol, size=(9, 13), dtype=np.uint8)
        for filt in ("none", "cycle"):
            r = _parse_png(pack_png_indexed(idx, pal[:ncol], bit_depth=depth, filters=filt))
            assert r is not None, (depth, filt)
            w, h, ch, px = r
            assert (w, h, ch) == (13, 9, 3)
            assert np.array_equal(px, np.array(pal[:ncol], dtype=np.uint8)[idx])

    idx = rng.integers(0, 4, size=(5, 7), dtype=np.uint8)
    w, h, ch, px = _parse_png(pack_png_indexed(idx, pal[:4], bit_depth=2, trans=[0, 128, 255]))
    assert ch == 4
    assert np.array_equal(px[:, :, 3], np.array([0, 128, 255, 255], dtype=np.uint8)[idx])


def test_png_indexed_structural_rejection():
    """Forged indexed payloads return None: index past the palette,
    PLTE after IDAT, truncated/oversized PLTE, tRNS longer than the
    palette — never garbage pixels."""
    import struct

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _PNG_SIG,
        _parse_png,
        _png_chunk,
        pack_png_indexed,
    )
    import zlib as _z

    pal3 = b"\x01\x02\x03\x04\x05\x06\x07\x08\x09"  # 3 entries
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0)
    raw = b"\x00" + bytes([0, 3])  # filter 0, indices 0 and 3 (>= 3!)
    idat = _z.compress(raw)
    forged = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal3)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )
    assert _parse_png(forged) is None

    # PLTE after IDAT violates chunk ordering
    late = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" + bytes([0, 1])))
        + _png_chunk(b"PLTE", pal3)
        + _png_chunk(b"IEND", b"")
    )
    assert _parse_png(late) is None

    # partial PLTE entry (length not divisible by 3)
    ragged = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal3 + b"\x01")
        + _png_chunk(b"IDAT", _z.compress(b"\x00" + bytes([0, 1])))
        + _png_chunk(b"IEND", b"")
    )
    assert _parse_png(ragged) is None

    # tRNS longer than the palette
    good = pack_png_indexed(np.zeros((1, 2), dtype=np.uint8), [(1, 2, 3)])
    overlong = (
        good[: good.index(b"IDAT") - 4]
        + _png_chunk(b"tRNS", b"\x00\x00")
        + good[good.index(b"IDAT") - 4 :]
    )
    assert _parse_png(overlong) is None


def test_png_indexed_through_image_stats(spark):
    """The Spark-side path sees palette PNGs as first-class images:
    dims/channels via decode_media, exact means via image_stats
    (indices -> palette colors, counts preserved)."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        image_stats,
        pack_png_indexed,
    )

    idx = np.zeros((4, 5), dtype=np.uint8)
    idx[0, 0] = 1
    pal = [(100, 40, 200), (120, 40, 200)]
    df = spark.createDataFrame(
        [(0, "image", bytearray(pack_png_indexed(idx, pal, bit_depth=1)), "syn")],
        MEDIA_SCHEMA,
    )
    meta = decode_media(df, decode="numpy").head()
    assert (meta["width"], meta["height"], meta["channels"], meta["payload_ok"]) == (5, 4, 3, True)
    st = image_stats(df).head()
    assert st["channel_means"] == [round((100 * 19 + 120) / 20, 6), 40.0, 200.0]


def test_gif_tiny_frame_flood_rejected():
    """A 1x1-canvas GIF charges ~2 pixels/frame of the pixel budget,
    so without a fixed per-frame cost millions of frames fit 'in
    budget' (~600 MB of frame arrays, ~40 s CPU). The flat per-frame
    charge must reject the flood while normal animations still parse."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_gif_frames,
        pack_gif,
    )

    tiny = np.zeros((1, 1, 3), np.uint8)
    # ~2k frames crosses the 8M budget at 4096+2 per frame; build via
    # pack_gif so the payload is structurally valid
    flood = pack_gif([tiny] * 2100, positions=[(0, 0)] * 2100)
    assert _parse_gif_frames(flood) is None
    ok = pack_gif([tiny] * 50, positions=[(0, 0)] * 50)
    r = _parse_gif_frames(ok)
    assert r is not None and len(r[2]) == 50


def test_pack_gif_absent_transparent_color_raises():
    """transparent_color not present in any frame (and not pinned via
    bg_color) must raise instead of silently emitting an opaque GIF —
    a planted-payload fixture would otherwise test the wrong path."""
    import numpy as np
    import pytest as _pytest

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_gif_frames,
        pack_gif,
    )

    f0 = np.full((2, 2, 3), 9, dtype=np.uint8)
    with _pytest.raises(ValueError, match="transparent_color"):
        pack_gif([f0], transparent_color=(1, 2, 3))
    # pinning the color into the palette via bg_color is the escape
    # hatch: the whole frame encodes transparent -> holes keep bg
    buf = pack_gif([f0, f0], transparent_color=(9, 9, 9), bg_color=(9, 9, 9))
    _, _, frames = _parse_gif_frames(buf)
    assert np.array_equal(frames[1], f0)


def test_progressive_jpeg_roundtrip_matches_baseline():
    """pack_jpeg_progressive -> _parse_jpeg decodes BIT-EQUAL to the
    baseline encoding of the same pixels (same quantized coefficients,
    same IDCT) across shapes, channel counts, and restart intervals —
    the full Annex-G surface: split spectral selection, EOB runs,
    successive approximation, DC/AC refinement."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg,
        pack_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    for shape in [(16, 24, 3), (13, 19), (8, 8, 3), (40, 56, 3), (9, 9)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = _parse_jpeg(pack_jpeg(px, quant=8))
        for dri in (0, 3):
            prog = _parse_jpeg(pack_jpeg_progressive(px, quant=8, restart_interval=dri))
            assert prog is not None, (shape, dri)
            assert base[:3] == prog[:3]
            assert np.array_equal(base[3], prog[3]), (shape, dri)
    # solid color is EXACT (flat quant, DC-only)
    solid = np.full((10, 12, 3), 77, dtype=np.uint8)
    r = _parse_jpeg(pack_jpeg_progressive(solid, quant=8))
    assert np.array_equal(r[3], solid)
    # gradient content stresses refinement placement (many newly-
    # significant AC coefficients across the Al ladder)
    grad = (np.arange(32)[:, None] * 8 + np.arange(48)[None, :] * 3) % 256
    grad = grad.astype(np.uint8)
    b2 = _parse_jpeg(pack_jpeg(grad, quant=8))
    p2 = _parse_jpeg(pack_jpeg_progressive(grad, quant=8))
    assert np.array_equal(b2[3], p2[3])


def test_progressive_jpeg_structural_rejection():
    """Forged progressive payloads return None: truncation, AC scan
    before any DC scan, refinement with Ah != Al+1, refining a band
    never first-passed, multi-component AC scans, and the scan-flood
    guard (>64 SOS segments)."""
    import struct

    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg_progressive,
    )

    px = np.full((8, 8), 99, dtype=np.uint8)
    good = pack_jpeg_progressive(px, quant=8)
    assert _parse_jpeg(good) is not None
    assert _parse_jpeg(good[:-1]) is None  # EOI gone
    assert _parse_jpeg(good[: len(good) // 2]) is None

    def scans(buf):
        # offsets of SOS markers (walking segments properly)
        i, out = 2, []
        while i + 4 <= len(buf):
            assert buf[i] == 0xFF
            m = buf[i + 1]
            if m == 0xD9:
                break
            (ln,) = struct.unpack_from(">H", buf, i + 2)
            if m == 0xDA:
                out.append((i, ln))
                # skip entropy to next marker byte that is a real marker
                j = i + 2 + ln
                while j + 1 < len(buf) and not (
                    buf[j] == 0xFF and buf[j + 1] not in (0x00,)
                    and not (0xD0 <= buf[j + 1] <= 0xD7)
                ):
                    j += 1
                i = j
            else:
                i += 2 + ln
        return out

    sos = scans(good)
    assert len(sos) == 6  # grayscale script
    # AC before DC: patch the FIRST scan's Ss from 0 to 1
    bad = bytearray(good)
    first_off, first_len = sos[0]
    bad[first_off + 2 + first_len - 3] = 1  # Ss byte
    assert _parse_jpeg(bytes(bad)) is None
    # refinement jumping two levels: DC refine scan Ah=1 -> Ah=2
    bad = bytearray(good)
    off, ln = sos[3]  # dc_refine in the script
    assert bad[off + 2 + ln - 1] == 0x10  # Ah=1, Al=0
    bad[off + 2 + ln - 1] = 0x20
    assert _parse_jpeg(bytes(bad)) is None
    # scan flood: repeat the dc-refine scan's bytes 70 times before EOI
    off, ln = sos[3]
    # grab scan header + its (tiny) entropy bytes up to the next SOS
    nxt = sos[4][0]
    chunk = good[off:nxt]
    flood = good[:nxt] + chunk * 70 + good[nxt:]
    assert _parse_jpeg(flood) is None


def test_png_16bit_subbyte_and_adam7_matrix():
    """The full round-trip matrix the round-10 PNG extension adds:
    8/16-bit truecolor(+alpha), sub-byte greyscale (exact
    level*(255/(2^d-1)) rescale), indexed at every depth — each both
    sequential and Adam7-interlaced, including degenerate 1x1/1xN/Nx1
    geometries where most passes are empty."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_png,
        pack_png,
        pack_png_indexed,
    )

    rng = np.random.default_rng(3)

    def check(buf, want):
        r = _parse_png(buf)
        assert r is not None
        assert r[:3] == (want.shape[1], want.shape[0], want.shape[2])
        assert np.array_equal(r[3], want)

    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 17, ch), dtype=np.uint8)
        check(pack_png(px), px)
        check(pack_png(px, interlace=True), px)
    for ch in (1, 3, 4):
        px16 = rng.integers(0, 65536, size=(9, 11, ch), dtype=np.uint16)
        want = (px16 >> 8).astype(np.uint8)  # libpng high-byte strip
        check(pack_png(px16, bit_depth=16), want)
        check(pack_png(px16, bit_depth=16, interlace=True), want)
    for d in (1, 2, 4):
        lv = rng.integers(0, 1 << d, size=(10, 23, 1), dtype=np.uint8)
        want = (lv * (255 // ((1 << d) - 1))).astype(np.uint8)
        check(pack_png(lv, bit_depth=d), want)
        check(pack_png(lv, bit_depth=d, interlace=True), want)
    pal = [(10, 20, 30), (200, 100, 50), (1, 2, 3), (9, 9, 9)]
    for d in (1, 2, 4, 8):
        k = min(1 << d, 4)
        idx = rng.integers(0, k, size=(12, 19), dtype=np.uint8)
        want = np.array(pal, dtype=np.uint8)[idx]
        check(pack_png_indexed(idx, pal[:k], bit_depth=d, interlace=True), want)
    one = np.array([[[7, 8, 9]]], dtype=np.uint8)
    check(pack_png(one, interlace=True), one)
    col = rng.integers(0, 256, size=(9, 1, 3), dtype=np.uint8)
    check(pack_png(col, interlace=True), col)
    row = rng.integers(0, 256, size=(1, 9, 3), dtype=np.uint8)
    check(pack_png(row, interlace=True), row)
    # tRNS survives interlace (RGBA out)
    tr = pack_png_indexed(
        rng.integers(0, 2, size=(7, 8), dtype=np.uint8),
        pal[:2], bit_depth=1, trans=[128], interlace=True,
    )
    assert _parse_png(tr)[2] == 4


def test_png_extension_rejections():
    """Structural guards around the new formats: truncated interlaced
    stream (per-pass expected length), depth/type combos outside the
    spec, and the encoder's input validation."""
    import struct

    import numpy as np
    import pytest as _pytest

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_png,
        pack_png,
    )

    px = np.full((8, 9, 3), 5, dtype=np.uint8)
    good = pack_png(px, interlace=True)
    assert _parse_png(good) is not None
    # forge IHDR depth 12 (no such PNG depth), re-CRC
    import zlib as _z

    bad = bytearray(good)
    bad[8 + 8 + 8] = 12  # depth byte of IHDR
    crc = _z.crc32(bytes(bad[8 + 4 : 8 + 8 + 13])) & 0xFFFFFFFF
    struct.pack_into(">I", bad, 8 + 8 + 13, crc)
    assert _parse_png(bytes(bad)) is None
    # encoder validation
    with _pytest.raises(ValueError, match="uint16"):
        pack_png(px, bit_depth=16)
    with _pytest.raises(ValueError, match="levels"):
        pack_png(np.full((4, 4, 1), 9, dtype=np.uint8), bit_depth=2)
    with _pytest.raises(ValueError, match="greyscale"):
        pack_png(px, bit_depth=4)


def test_jpeg_fill_bytes_before_eoi():
    """T.81 B.1.1.2: fill bytes may precede any marker, including EOI
    — both decoders must accept FF-padded EOIs (regression: the
    marker walk's 4-byte guard ran before the fill-run skip)."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        _parse_jpeg,
        pack_jpeg,
        pack_jpeg_progressive,
    )

    px = np.full((8, 8), 99, dtype=np.uint8)
    for enc in (pack_jpeg, pack_jpeg_progressive):
        buf = enc(px)
        for nfill in (1, 3):
            padded = buf[:-2] + b"\xff" * nfill + b"\xff\xd9"
            r = _parse_jpeg(padded)
            assert r is not None and np.array_equal(r[3][:, :, 0], px), (enc, nfill)
        assert _parse_jpeg(buf[:-1]) is None  # truncation still rejects


# ---------- perceptual hash (dHash) image dedup ----------

def _ladder_grid(bits64):
    """9x8 greyscale whose dHash is exactly ``bits64``: each row walks
    +-15 from 128 so bit r*8+c = (step down at c) — all 2^64 patterns
    realizable inside [8, 248]."""
    import numpy as np

    g = np.zeros((8, 9), dtype=np.uint8)
    for r in range(8):
        v = 128
        g[r, 0] = v
        for c in range(8):
            v = v - 15 if (bits64 >> (r * 8 + c)) & 1 else v + 15
            g[r, c + 1] = v
    return g


def _signed64(v):
    return v - (1 << 64) if v >= (1 << 63) else v


def test_dhash_bit_layout_and_format_invariance(spark):
    """Hash of a ladder grid == the planted bit pattern, identically
    across PPM/BMP/PNG re-encodes and integer upscales (incl. a
    pattern with bit 63 set — BIGINT sign handling)."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        dhash64,
        pack_bmp24,
        pack_png,
        pack_ppm,
    )
    from cs533_big_data_data_mining_spark.session import local_df

    patterns = [0, 1, (1 << 63) | 5, 0x0123456789ABCDEF, (1 << 64) - 1]
    rows = []
    for i, bits in enumerate(patterns):
        g = _ladder_grid(bits)
        rgb = np.repeat(g[..., None], 3, axis=2)
        rows.append((i * 10 + 0, bytearray(pack_ppm(np.repeat(np.repeat(rgb, 4, 0), 4, 1)))))
        rows.append((i * 10 + 1, bytearray(pack_png(np.repeat(np.repeat(g[..., None], 3, 0), 3, 1)))))
        rows.append((i * 10 + 2, bytearray(pack_bmp24(np.repeat(np.repeat(rgb, 2, 0), 2, 1)))))
    rows.append((999, bytearray(b"garbage")))
    df = local_df(spark, rows, "media_id long, payload binary")
    got = {r["id"]: (r["dhash"], r["decode_ok"]) for r in dhash64(df).collect()}
    for i, bits in enumerate(patterns):
        want = _signed64(bits)
        assert got[i * 10 + 0] == (want, True)
        assert got[i * 10 + 1] == (want, True)
        assert got[i * 10 + 2] == (want, True)
    assert got[999] == (0, False)


def test_phash_neardup_pairs_planted(spark):
    """Groups of 4 planted variants: re-encode+resize (ham 0), 2-bit
    mutation (ham 2), 8-bit mutation (excluded at max_hamming=3);
    cross-group distance >= 8 by the 16x-repetition pattern code."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        pack_png,
        pack_ppm,
        phash_neardup_pairs,
        phash_neardup_pairs_bipartite,
        dhash64,
    )
    from cs533_big_data_data_mining_spark.session import local_df

    def member_payload(g, k):
        bits = 0
        for j in range(64):
            bits |= ((g >> (j % 4)) & 1) << j  # 4-bit group id, 16x repetition
        flips = {2: (0, 1), 3: tuple(range(8))}.get(k, ())
        for f in flips:
            bits ^= 1 << f
        grid = _ladder_grid(bits)
        rgb = np.repeat(grid[..., None], 3, axis=2)
        if k % 2 == 0:
            return bytearray(pack_ppm(np.repeat(np.repeat(rgb, 4, 0), 4, 1)))
        return bytearray(pack_png(np.repeat(np.repeat(grid[..., None], 3, 0), 3, 1)))

    rows = [(g * 4 + k, member_payload(g, k)) for g in range(8) for k in range(4)]
    rows.append((900, bytearray(b"not an image")))
    df = local_df(spark, rows, "media_id long, payload binary")
    caches = []
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in phash_neardup_pairs(df, max_hamming=3, caches=caches).collect()
    }
    want = {}
    for g in range(8):
        want[(g * 4 + 0, g * 4 + 1)] = 0
        want[(g * 4 + 0, g * 4 + 2)] = 2
        want[(g * 4 + 1, g * 4 + 2)] = 2
    assert got == want
    for c in caches:
        c.unpersist()

    # bipartite: history = member 0s, new = members 1..3 — only
    # cross-corpus pairs (the within-new (1,2) ham-2 pair must NOT
    # appear), and a precomputed history_sigs frame is equivalent
    from pyspark.sql import functions as F

    hist = df.filter((F.col("media_id") % 4 == 0) & (F.col("media_id") < 100))
    new = df.filter(F.col("media_id") % 4 != 0)
    bi = {
        (r["a"], r["b"]): r["hamming"]
        for r in phash_neardup_pairs_bipartite(new, hist, max_hamming=3).collect()
    }
    want_bi = {}
    for g in range(8):
        want_bi[(g * 4 + 1, g * 4 + 0)] = 0
        want_bi[(g * 4 + 2, g * 4 + 0)] = 2
    assert bi == want_bi
    hs = dhash64(hist).filter("decode_ok")
    bi2 = {
        (r["a"], r["b"]): r["hamming"]
        for r in phash_neardup_pairs_bipartite(
            new, hist, history_sigs=hs, max_hamming=3
        ).collect()
    }
    assert bi2 == want_bi


def test_dhash_resize_image_consistency(spark):
    """dHash survives the engine's own resize_image on block images:
    nearest-neighbor downscale back to the grid is exact."""
    import numpy as np

    from cs533_big_data_data_mining_spark.operators.multimodal import (
        dhash64,
        pack_ppm,
        resize_image,
    )
    from cs533_big_data_data_mining_spark.session import local_df

    bits = 0xDEADBEEFCAFEF00D
    rgb = np.repeat(_ladder_grid(bits)[..., None], 3, axis=2)
    big = np.repeat(np.repeat(rgb, 8, 0), 8, 1)  # 72x64
    df = local_df(spark, [(1, bytearray(pack_ppm(big)))], "media_id long, payload binary")
    shrunk = resize_image(df, 36, 32)  # still an integer multiple of 9x8
    h0 = dhash64(df).head()["dhash"]
    h1 = dhash64(shrunk).head()["dhash"]
    assert h0 == h1 == _signed64(bits)
