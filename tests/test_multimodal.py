"""Multimodal plumbing tests: the Spark-side schema/partitioning/Arrow
batch shape is real; the decoders are deterministic fakes (media libs
absent by design — see operators/multimodal.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from topn_spark.operators.multimodal import (
    ASSET_SCHEMA,
    decode_image,
    decode_pixels,
    extract_features,
    parse_image_header,
    read_binary_dir,
    sample_frames,
)

# ---------------------------------------------------------------------------
# Real image fixtures: minimal but spec-valid headers for each container.
# ---------------------------------------------------------------------------
import struct


def _png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"  # CRC (unchecked by header parse)
    )


def _gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def _jpeg(w, h):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03"
        + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _bmp(w, h):
    # BITMAPFILEHEADER (14 bytes) + INFOHEADER width/height at 18/22
    return (
        b"BM"
        + b"\x00" * 12
        + struct.pack("<I", 40)
        + struct.pack("<ii", w, h)
        + b"\x00" * 8
    )


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        ("img1", "image", b"\x89PNG-fake-1", ("png", None, None, None, None)),
        ("img2", "image", b"\x89PNG-fake-22", ("png", None, None, None, None)),
        ("vid1", "video", b"RIFF-fake", ("avi", None, None, 3500, None)),
        ("empty", "image", None, ("png", None, None, None, None)),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_decode_image_fake(assets):
    out = {r.asset_id: r for r in decode_image(assets, fake=True).collect()}
    assert out["img1"].width != out["img2"].width or out["img1"].height != out["img2"].height
    assert out["img1"].n_bytes == 11
    assert out["empty"].n_bytes == 0
    # determinism
    again = {r.asset_id: r for r in decode_image(assets, fake=True).collect()}
    assert out["img1"].width == again["img1"].width


def test_parse_image_header_all_formats():
    assert parse_image_header(_png(320, 240)) == ("png", 320, 240)
    assert parse_image_header(_gif(640, 480)) == ("gif", 640, 480)
    assert parse_image_header(_jpeg(1024, 768)) == ("jpeg", 1024, 768)
    assert parse_image_header(_bmp(800, 600)) == ("bmp", 800, 600)
    # top-down BMP encodes negative height
    assert parse_image_header(_bmp(800, -600)) == ("bmp", 800, 600)
    # non-images and truncated payloads parse to nothing, never raise
    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(b"\x89PNG-fake-1") == (None, None, None)
    assert parse_image_header(_png(9, 9)[:12]) == (None, None, None)
    # JPEG with SOI but no SOF yields format only
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("jpeg", None, None)


def test_decode_image_real_headers(spark):
    rows = [
        ("p", "image", _png(320, 240), None),
        ("g", "image", _gif(640, 480), None),
        ("j", "image", _jpeg(1024, 768), None),
        ("b", "image", _bmp(800, 600), None),
        ("junk", "image", b"not-an-image", None),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r.asset_id: r for r in decode_image(assets).collect()}
    assert (out["p"].img_format, out["p"].width, out["p"].height) == (
        "png", 320, 240,
    )
    assert (out["g"].img_format, out["g"].width, out["g"].height) == (
        "gif", 640, 480,
    )
    assert (out["j"].img_format, out["j"].width, out["j"].height) == (
        "jpeg", 1024, 768,
    )
    assert (out["b"].img_format, out["b"].width, out["b"].height) == (
        "bmp", 800, 600,
    )
    # unknown signature: honest nulls without fake mode
    assert out["junk"].img_format is None
    assert out["junk"].width is None and out["junk"].height is None
    assert out["junk"].n_bytes == len(b"not-an-image")


def test_decode_image_fake_defers_to_real_header(spark):
    # fake mode only fills payloads with NO parseable header; a real
    # header always wins over the digest-derived dims.
    rows = [
        ("real", "image", _png(111, 222), None),
        ("fakeit", "image", b"\x89PNG-fake-1", None),
    ]
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r.asset_id: r for r in decode_image(assets, fake=True).collect()}
    assert (out["real"].width, out["real"].height) == (111, 222)
    assert out["fakeit"].img_format is None
    assert out["fakeit"].width is not None  # deterministic fake dims


def test_decode_pixels_fail_fast_for_compressed(spark):
    # a real PNG header reaches the codec gate: fail fast, never fake
    df = spark.createDataFrame([("a", _png(4, 3))], "asset_id string, payload binary")
    with pytest.raises(Exception) as ei:
        decode_pixels(df).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_decode_pixels_unknown_format_nulls(assets):
    # unrecognizable payloads (no container signature) null out
    out = {r.asset_id: r for r in decode_pixels(assets).collect()}
    assert all(r.pixels is None and r.shape is None for r in out.values())


def test_decode_pixels_bmp_ppm_roundtrip(spark):
    from topn_spark.operators.multimodal import encode_bmp_rgb, encode_ppm_rgb

    w, h = 5, 3  # stride 15 -> padded to 16: exercises row padding
    pix = bytes((x * 7 + y * 11 + c * 3) % 256 for y in range(h) for x in range(w) for c in range(3))
    df = spark.createDataFrame(
        [("bmp", encode_bmp_rgb(w, h, pix)), ("ppm", encode_ppm_rgb(w, h, pix))],
        "asset_id string, payload binary",
    )
    out = {r.asset_id: r for r in decode_pixels(df).collect()}
    for r in out.values():
        assert r.shape == [h, w, 3]
        assert r.pixels == list(pix)


def test_decode_bmp_top_down_and_ppm_comment():
    from topn_spark.operators.multimodal import (
        decode_bmp_pixels,
        decode_ppm_pixels,
        encode_bmp_rgb,
    )

    # top-down BMP (negative height) decodes to the same image
    w, h = 3, 2
    pix = bytes(range(18))
    up = bytearray(encode_bmp_rgb(w, h, pix))
    stride = (w * 3 + 3) // 4 * 4
    rows = [up[54 + i * stride : 54 + (i + 1) * stride] for i in range(h)]
    td = bytes(up[:22]) + struct.pack("<i", -h) + bytes(up[26:54]) + rows[1] + rows[0]
    assert decode_bmp_pixels(td) == (list(pix), [h, w, 3])
    # PPM header comments are skipped per spec
    p = b"P6\n# comment\n3 2\n255\n" + pix
    assert decode_ppm_pixels(p) == (list(pix), [2, 3, 3])
    # truncated body -> None, not garbage
    assert decode_ppm_pixels(p[:-1]) is None


def test_extract_features_unit_norm(assets):
    out = extract_features(assets, fake=True).collect()
    for r in out:
        assert len(r.features) == 16
        norm = sum(x * x for x in r.features) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_sample_frames_fanout(assets):
    frames = sample_frames(
        assets.where(F.col("modality") == "video"), every_ms=1000, fake=True
    ).collect()
    assert len(frames) == 3  # 3500ms // 1000
    assert [f.frame_idx for f in frames] == [0, 1, 2]
    assert len({f.frame_digest for f in frames}) == 3


def test_multimodal_pipeline_end_to_end(spark, tmp_path):
    """Integration: binary dir → ingest → decode → featurize → ANN
    self-join — the full distributed multimodal pipeline shape, on
    deterministic fake decoders."""
    from topn_spark.operators.similarity import knn_join

    for i in range(6):
        (tmp_path / f"img{i}.png").write_bytes(
            f"fake-image-payload-{i % 3}".encode()  # 3 duplicate pairs
        )
    assets = read_binary_dir(spark, str(tmp_path), glob="*.png")
    decoded = decode_image(assets, fake=True)
    feats = extract_features(decoded, fake=True)
    out = feats.select("asset_id", "width", "height", "features")
    rows = out.collect()
    assert len(rows) == 6 and all(len(r.features) == 16 for r in rows)

    nn = knn_join(
        out.withColumnRenamed("features", "embedding"),
        out.withColumnRenamed("features", "embedding"),
        k=1,
        left_id="asset_id",
        right_id="asset_id",
    ).collect()
    # identical payloads → identical fake features → nearest neighbor
    # of each dup is its pair with cosine ≈ 1
    by_left = {r.left_id: r for r in nn}
    for i in range(6):
        partner = [
            j for j in range(6) if j != i and j % 3 == i % 3
        ][0]
        r = by_left[[k for k in by_left if f"img{i}.png" in k][0]]
        assert f"img{partner}.png" in r.right_id
        assert abs(r.score - 1.0) < 1e-9


def test_read_binary_dir(spark, tmp_path):
    (tmp_path / "a.png").write_bytes(b"fake-png-bytes")
    (tmp_path / "b.jpg").write_bytes(b"fake-jpg")
    df = read_binary_dir(spark, str(tmp_path), glob="*.png")
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].meta.format == "png"
    assert rows[0].payload == b"fake-png-bytes"
    assert df.schema["payload"].dataType.typeName() == "binary"


def test_parse_bmp_core_header_and_unknown_dib():
    # BITMAPCOREHEADER (OS/2): DIB size 12, u16 dims at 18..22
    core = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
        + struct.pack("<HH", 100, 50) + b"\x01\x00\x18\x00" + b"\x00" * 4
    )
    assert parse_image_header(core) == ("bmp", 100, 50)
    # unknown DIB header size: format only, no confident dims
    weird = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 16) + b"\x00" * 12
    )
    assert parse_image_header(weird) == ("bmp", None, None)


# ---------------------------------------------------------------------------
# Audio: RIFF/WAVE PCM16 — real stdlib decode path (x90)
# ---------------------------------------------------------------------------

from topn_spark.operators.multimodal import (  # noqa: E402
    decode_audio,
    decode_video,
    encode_mp4_stub,
    encode_wav_pcm16,
    parse_mp4_header,
    parse_wav,
)


def test_wav_roundtrip_and_chunk_walk():
    frames = [(f * 3 + c * 11) % 200 - 100 for f in range(25) for c in range(2)]
    w = encode_wav_pcm16(8100, 2, frames)
    assert parse_wav(w) == (1, 2, 8100, frames)
    # an extra LIST chunk (odd size -> word-aligned) before fmt/data
    # must be skipped, not break the walk
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    w2 = b"RIFF" + struct.pack("<I", len(w) - 8 + len(extra)) + b"WAVE"
    w2 += extra + w[12:]
    assert parse_wav(w2)[3] == frames
    # non-PCM format tag: recognized container, undecodable samples
    w3 = bytearray(w)
    w3[20] = 3  # WAVE_FORMAT_IEEE_FLOAT
    tag, ch, sr, samples = parse_wav(bytes(w3))
    assert (tag, ch, sr, samples) == (3, 2, 8100, None)
    # truncated data chunk / non-WAV: unparseable
    assert parse_wav(w[:30]) is None
    assert parse_wav(b"not audio") is None


def test_g711_expansion_and_container():
    """G.711 µ-law/A-law expansion hits the ITU spec landmark values,
    is sign-symmetric over all 256 codewords, and decodes through the
    WAV container (tags 7/6, 8-bit) inside parse_wav/decode_audio —
    a real decode path, not a gate (round-5 ask)."""
    from topn_spark.operators.multimodal import (
        alaw_to_linear,
        encode_wav_g711,
        ulaw_to_linear,
    )

    assert ulaw_to_linear(0xFF) == 0  # +0
    assert ulaw_to_linear(0x7F) == 0  # -0
    assert ulaw_to_linear(0x80) == 32124  # max magnitude
    assert ulaw_to_linear(0x00) == -32124
    assert alaw_to_linear(0xD5) == 8  # smallest magnitude
    assert alaw_to_linear(0x55) == -8
    assert alaw_to_linear(0xAA) == 32256  # max magnitude
    assert alaw_to_linear(0x2A) == -32256
    for b in range(128):
        assert ulaw_to_linear(b) == -ulaw_to_linear(b | 0x80)
        assert alaw_to_linear(b) == -alaw_to_linear(b | 0x80)
    enc = bytes(range(256))
    tag, ch, sr, samples = parse_wav(encode_wav_g711(8000, 1, enc))
    assert (tag, ch, sr) == (7, 1, 8000)
    assert samples == [ulaw_to_linear(x) for x in enc]
    tag, _, _, samples = parse_wav(
        encode_wav_g711(16000, 2, enc, "alaw")
    )
    assert tag == 6
    assert samples == [alaw_to_linear(x) for x in enc]
    # odd-length data chunk: padded container still yields all frames
    assert len(parse_wav(encode_wav_g711(8000, 1, enc[:7]))[3]) == 7


def test_decode_audio_g711_and_unsupported_gate(spark):
    import pytest

    from topn_spark.operators.multimodal import (
        encode_wav_g711,
        ulaw_to_linear,
    )

    enc = bytes((i * 13) % 256 for i in range(40))
    df = spark.createDataFrame(
        [("u1", encode_wav_g711(8000, 1, enc))],
        "asset_id string, payload binary",
    )
    row = decode_audio(df).collect()[0]
    assert row["samples"] == [ulaw_to_linear(x) for x in enc]
    assert (row["channels"], row["n_frames"]) == (1, 40)
    # ADPCM (tag 2) remains a fail-fast gate
    adpcm = bytearray(encode_wav_g711(8000, 1, enc))
    adpcm[20] = 2
    df_bad = spark.createDataFrame(
        [("x", bytes(adpcm))], "asset_id string, payload binary"
    )
    with pytest.raises(Exception, match="format tag 2"):
        decode_audio(df_bad).collect()


def test_decode_audio_stats_and_nulls(spark):
    frames = [100, -100, 50, -50, 0, 7]  # 3 stereo frames
    rows = [
        ("a1", bytearray(encode_wav_pcm16(16000, 2, frames))),
        ("a2", bytearray(encode_wav_pcm16(8000, 1, [5] * 8000))),
        ("bad", b"\x00\x01\x02"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    out = {
        r["asset_id"]: r
        for r in decode_audio(df).orderBy("asset_id").collect()
    }
    a1 = out["a1"]
    assert a1["aud_format"] == "wav"
    assert (a1["channels"], a1["sample_rate"]) == (2, 16000)
    assert (a1["n_frames"], a1["duration_ms"]) == (3, 0)
    assert a1["samples"] == frames
    a2 = out["a2"]
    assert (a2["n_frames"], a2["duration_ms"]) == (8000, 1000)
    for k in ("bad", "nul"):
        r = out[k]
        assert r["aud_format"] is None and r["samples"] is None


def test_decode_audio_fail_fast_non_pcm(spark):
    w = bytearray(encode_wav_pcm16(8000, 1, [1, 2, 3]))
    w[20] = 85  # MP3-in-WAV format tag
    df = spark.createDataFrame(
        [("c1", bytes(w))], "asset_id string, payload binary"
    )
    with pytest.raises(Exception, match="codec library"):
        decode_audio(df).collect()


# ---------------------------------------------------------------------------
# Video: ISO-BMFF (MP4) mvhd walk — real stdlib metadata path (x93)
# ---------------------------------------------------------------------------

def test_parse_mp4_header_versions_and_corrupt():
    for v in (0, 1):
        b = encode_mp4_stub(90000, 123456, version=v)
        assert parse_mp4_header(b) == ("mp4", 90000, 1371)
    # no ftyp leader -> not an ISO-BMFF stream
    assert parse_mp4_header(b"\x00\x00\x00\x08free") == (None, None, None)
    # ftyp but no moov/mvhd -> recognized, no duration
    ftyp_only = encode_mp4_stub(600, 600)[:24]
    assert parse_mp4_header(ftyp_only) == ("mp4", None, None)
    # largesize (size==1 + u64) encoding of moov must still walk
    b = encode_mp4_stub(600, 1200)
    moov_at = b.index(b"moov") - 4
    sz = struct.unpack(">I", b[moov_at : moov_at + 4])[0]
    big = (
        b[:moov_at]
        + struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", sz + 8)
        + b[moov_at + 8 :]
    )
    assert parse_mp4_header(big) == ("mp4", 600, 2000)


def test_decode_video_dataframe(spark):
    rows = [
        ("v1", bytearray(encode_mp4_stub(600, 3000, version=0))),
        ("v2", bytearray(encode_mp4_stub(90000, 450000, version=1))),
        ("junk", b"RIFF not a video"),
        ("nul", None),
    ]
    df = spark.createDataFrame(rows, "asset_id string, payload binary")
    out = {
        r["asset_id"]: r
        for r in decode_video(df).orderBy("asset_id").collect()
    }
    assert (out["v1"]["timescale"], out["v1"]["duration_ms"]) == (600, 5000)
    assert (out["v2"]["timescale"], out["v2"]["duration_ms"]) == (90000, 5000)
    assert out["junk"]["vid_format"] is None
    assert out["nul"]["timescale"] is None


class TestFrameTimes:
    def test_run_length_decode_and_versions(self):
        from topn_spark.operators.multimodal import (
            encode_mp4_with_track,
            parse_frame_times,
        )

        for ver in (0, 1):
            b = encode_mp4_with_track(600, 600, [(5, 60), (4, 90)], version=ver)
            want = [i * 60 * 1000 // 600 for i in range(5)] + [
                (300 + i * 90) * 1000 // 600 for i in range(4)
            ]
            assert parse_frame_times(b) == want, ver

    def test_media_timescale_differs_from_movie(self):
        from topn_spark.operators.multimodal import (
            encode_mp4_with_track,
            parse_frame_times,
        )

        # movie ts 600, media ts 90000 (typical video): t_ms uses the
        # MEDIA timescale from mdhd, not mvhd's
        b = encode_mp4_with_track(600, 90000, [(3, 3000)])
        assert parse_frame_times(b) == [0, 33, 66]

    def test_corrupt_and_absent_inputs(self):
        from topn_spark.operators.multimodal import (
            encode_mp4_stub,
            encode_mp4_with_track,
            parse_frame_times,
        )

        assert parse_frame_times(b"") is None
        assert parse_frame_times(b"junkjunkjunk") is None
        # mvhd-only stub has no track -> None, not a crash
        assert parse_frame_times(encode_mp4_stub(600, 1000)) is None
        # zero media timescale -> None
        assert parse_frame_times(
            encode_mp4_with_track(600, 0, [(1, 1)])
        ) is None

    def test_distributed_fanout(self, spark):
        from topn_spark.operators.multimodal import (
            encode_mp4_with_track,
            video_frame_times,
        )

        rows = [
            (1, encode_mp4_with_track(600, 1000, [(2, 500)])),
            (2, encode_mp4_with_track(600, 1000, [(1, 250), (2, 125)])),
            (3, b"not a video"),  # skipped, no row emitted
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = sorted(
            (r.doc_id, r.frame_idx, r.t_ms)
            for r in video_frame_times(df).collect()
        )
        assert got == [
            (1, 0, 0), (1, 1, 500),
            (2, 0, 0), (2, 1, 250), (2, 2, 375),
        ]


class TestPngDecode:
    def test_round_trip_every_filter_and_color_type(self):
        from topn_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        w, h = 7, 5
        rgb = bytes(
            (x + y + 40 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        # each single filter type, plus the cycling default (all five)
        for filt in ([0], [1], [2], [3], [4], None):
            got = decode_png_pixels(encode_png(w, h, rgb, 2, filt))
            assert got is not None, filt
            assert got[1] == [h, w, 3] and bytes(got[0]) == rgb, filt
        for ctype, ch in ((0, 1), (4, 2), (6, 4)):
            pix = bytes(
                (3 * x + 2 * y + 7 * c) % 256
                for y in range(h)
                for x in range(w)
                for c in range(ch)
            )
            got = decode_png_pixels(encode_png(w, h, pix, ctype))
            assert got[1] == [h, w, ch] and bytes(got[0]) == pix, ctype

    def test_palette_expands_through_plte(self):
        import struct
        import zlib

        from topn_spark.operators.multimodal import (
            _PNG_SIG,
            _png_chunk,
            decode_png_pixels,
        )

        w, h = 4, 3
        idx = bytes((x + y) % 3 for y in range(h) for x in range(w))
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        raw = b"".join(
            b"\x00" + idx[y * w : (y + 1) * w] for y in range(h)
        )
        b = (
            _PNG_SIG
            + _png_chunk(
                b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
            )
            + _png_chunk(b"PLTE", plte)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )
        pix, shape = decode_png_pixels(b)
        assert shape == [h, w, 3]
        assert pix[:9] == [255, 0, 0, 0, 255, 0, 0, 0, 255]

    def test_corrupt_and_unsupported_return_none(self):
        import struct

        from topn_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        good = encode_png(3, 2, bytes(range(18)))
        # flipped CRC byte, truncation, garbage: all None, no crash
        bad = bytearray(good)
        bad[-5] ^= 0xFF
        assert decode_png_pixels(bytes(bad)) is None
        assert decode_png_pixels(good[:30]) is None
        assert decode_png_pixels(b"not a png") is None
        # genuinely unsupported sub-formats -> None: sub-byte depth,
        # 16-bit palette (spec-invalid), unknown interlace method.
        # A VALID-header hack with mismatched data also returns None
        # (the raw length no longer fits the declared layout).
        import zlib as _z

        for depth, ctype, inter in ((4, 0, 0), (16, 3, 0), (8, 0, 2)):
            hacked = bytearray(good)
            hacked[24] = depth
            hacked[25] = ctype
            hacked[28] = inter
            crc = _z.crc32(bytes(hacked[12:29]))
            hacked[29:33] = struct.pack(">I", crc)
            assert decode_png_pixels(bytes(hacked)) is None

    def test_16bit_and_adam7_round_trip(self):
        """16-bit samples reduce to their high byte; Adam7 scatters
        all seven passes back bit-exactly — both now REAL decode
        paths, not gates (round-5 ask)."""
        import random

        from topn_spark.operators.multimodal import (
            decode_png_pixels,
            encode_png,
        )

        rng = random.Random(3)
        # 16-bit gray, non-interlaced: high byte survives
        w, h = 5, 4
        pix16 = bytes(rng.randrange(256) for _ in range(w * h * 2))
        got, shape = decode_png_pixels(
            encode_png(w, h, pix16, color_type=0, bit_depth=16)
        )
        assert shape == [h, w, 1]
        assert got == list(pix16[0::2])
        # Adam7 RGB at a size exercising every pass incl. empty edges
        for (w, h) in ((13, 9), (1, 1), (2, 3), (8, 8)):
            pix = bytes(
                rng.randrange(256) for _ in range(w * h * 3)
            )
            got, shape = decode_png_pixels(
                encode_png(w, h, pix, interlace=True)
            )
            assert shape == [h, w, 3]
            assert got == list(pix)
        # both together: 16-bit RGBA interlaced
        w, h = 7, 3
        pix = bytes(rng.randrange(256) for _ in range(w * h * 4 * 2))
        got, shape = decode_png_pixels(
            encode_png(
                w, h, pix, color_type=6, bit_depth=16, interlace=True
            )
        )
        assert shape == [h, w, 4]
        assert got == list(pix[0::2])

    def test_decode_pixels_dataframe_png_and_gates(self, spark):
        import pytest

        from topn_spark.operators.multimodal import (
            decode_pixels,
            encode_png,
        )

        w, h = 4, 5
        pix = bytes(
            (x + y + 40 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        df = spark.createDataFrame(
            [(1, encode_png(w, h, pix)), (2, None)],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r for r in decode_pixels(df).collect()}
        assert got[1].shape == [h, w, 3]
        assert bytes(got[1].pixels) == pix
        assert got[2].pixels is None
        # a corrupt PNG raises loudly instead of fabricating pixels
        bad = bytearray(encode_png(w, h, pix))
        bad[-5] ^= 0xFF
        df_bad = spark.createDataFrame(
            [(3, bytes(bad))], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="(?i)png"):
            decode_pixels(df_bad).collect()


class TestGifDecode:
    def test_round_trip_plain_and_interlaced(self):
        from topn_spark.operators.multimodal import (
            decode_gif_pixels,
            encode_gif_rgb,
        )

        w, h = 7, 9  # odd height exercises all four interlace passes
        pix = bytes(
            (x + y + 40 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        for inter in (False, True):
            got = decode_gif_pixels(encode_gif_rgb(w, h, pix, inter))
            assert got is not None, inter
            assert got[1] == [h, w, 3] and bytes(got[0]) == pix, inter

    def test_lzw_kwkwk_case_decodes(self):
        """The code==next_code special case (KwKwK) must reproduce
        prev + prev[0] — exercised with a real compressing stream,
        not the clear-heavy fixture encoder."""
        from topn_spark.operators.multimodal import _gif_lzw_decode

        # build a compressing LZW stream by hand for indices
        # [1,1,1,1,1] with min_code_size=2: clear(4), 1, then code 6
        # (the just-created '1 1' entry — KwKwK on its first use),
        # then code 7 ('1 1 1'... actually 6 again), end(5).
        # Sequence: CLEAR, 1, 6, 6, EOI decodes to 1, 11, 111 = 6 ones
        bits = []

        def emit(code, width):
            for i in range(width):
                bits.append((code >> i) & 1)

        emit(4, 3)  # clear
        emit(1, 3)  # literal 1          -> out [1]
        emit(6, 3)  # KwKwK: prev+prev[0] -> out [1,1]
        emit(7, 3)  # KwKwK again         -> out [1,1,1]
        emit(5, 3)  # EOI
        by = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for j, b in enumerate(bits[i : i + 8]):
                v |= b << j
            by.append(v)
        assert _gif_lzw_decode(2, bytes(by)) == [1, 1, 1, 1, 1, 1]

    def test_corrupt_inputs_return_none(self):
        from topn_spark.operators.multimodal import (
            decode_gif_pixels,
            encode_gif_rgb,
        )

        good = encode_gif_rgb(5, 4, bytes(60))
        assert decode_gif_pixels(good[:15]) is None
        assert decode_gif_pixels(b"GIF89a\x00\x00") is None
        assert decode_gif_pixels(b"not a gif at all") is None
        # trailer before any frame
        assert decode_gif_pixels(good[:13] + good[13:-1][:0] + b"\x3B") is None

    def test_decode_pixels_dataframe_gif(self, spark):
        import pytest

        from topn_spark.operators.multimodal import (
            decode_pixels,
            encode_gif_rgb,
        )

        w, h = 6, 4
        pix = bytes(
            (x * 2 + y + 30 * c) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        df = spark.createDataFrame(
            [(1, encode_gif_rgb(w, h, pix, interlace=True))],
            "doc_id long, payload binary",
        )
        row = decode_pixels(df).collect()[0]
        assert row.shape == [h, w, 3]
        assert bytes(row.pixels) == pix
        # truncated GIF raises loudly
        df_bad = spark.createDataFrame(
            [(2, encode_gif_rgb(w, h, pix)[:-8])],
            "doc_id long, payload binary",
        )
        with pytest.raises(Exception, match="(?i)gif"):
            decode_pixels(df_bad).collect()


class TestJpegDecode:
    def test_dc_exact_gray_and_color(self):
        """Constant 8x8 blocks FDCT to exactly DC-only coefficients
        (all-1s quant), so the decode is bit-exact — the planted-
        oracle property; color MCUs convert through BT.601 with
        round+clamp."""
        import numpy as np

        from topn_spark.operators.multimodal import (
            decode_jpeg_pixels,
            encode_jpeg_gray,
            encode_jpeg_ycbcr420,
        )

        w, h = 24, 16
        P = np.zeros((h, w), dtype=np.uint8)
        for by in range(2):
            for bx in range(3):
                P[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    30 + 40 * bx + 25 * by
                )
        pix, shape = decode_jpeg_pixels(
            encode_jpeg_gray(w, h, P.tobytes())
        )
        assert shape == [h, w, 1]
        assert (np.array(pix).reshape(h, w) == P).all()

        w4, h4 = 32, 16
        Y = np.full((h4, w4), 120, dtype=np.uint8)
        Cb = np.full((h4 // 2, w4 // 2), 90, dtype=np.uint8)
        Cr = np.full((h4 // 2, w4 // 2), 160, dtype=np.uint8)
        pix4, shape4 = decode_jpeg_pixels(
            encode_jpeg_ycbcr420(
                w4, h4, Y.tobytes(), Cb.tobytes(), Cr.tobytes()
            )
        )
        assert shape4 == [h4, w4, 3]
        want = (
            max(0, min(255, round(120 + 1.402 * 32))),
            max(
                0,
                min(
                    255,
                    round(120 - 0.344136 * -38 - 0.714136 * 32),
                ),
            ),
            max(0, min(255, round(120 + 1.772 * -38))),
        )
        assert tuple(pix4[:3]) == want

    def test_gradient_roundtrip_and_odd_size(self):
        """Non-constant blocks exercise the full AC run-length path
        (ZRL, EOB, magnitude categories); all-1s quant keeps the
        round trip within coefficient-rounding error."""
        import numpy as np

        from topn_spark.operators.multimodal import (
            decode_jpeg_pixels,
            encode_jpeg_gray,
        )

        P = np.array(
            [[(x * 7 + y * 3) % 256 for x in range(24)] for y in range(16)],
            dtype=np.uint8,
        )
        pix, _ = decode_jpeg_pixels(
            encode_jpeg_gray(24, 16, P.tobytes())
        )
        assert (
            np.abs(np.array(pix).reshape(16, 24).astype(int) - P).max()
            <= 2
        )
        # odd dims: edge-replication padding + crop on decode
        Q = P[:13, :19].copy()
        pix3, shape3 = decode_jpeg_pixels(
            encode_jpeg_gray(19, 13, Q.tobytes())
        )
        assert shape3 == [13, 19, 1]
        assert (
            np.abs(np.array(pix3).reshape(13, 19).astype(int) - Q).max()
            <= 2
        )

    def test_progressive_and_corrupt_rejected(self):
        import numpy as np

        from topn_spark.operators.multimodal import (
            decode_jpeg_pixels,
            encode_jpeg_gray,
        )

        good = bytearray(
            encode_jpeg_gray(8, 8, bytes(np.full(64, 55, np.uint8)))
        )
        # flip SOF0 (0xC0) to SOF2 (progressive): must reject, not
        # mis-decode
        i = bytes(good).find(b"\xff\xc0")
        prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
        assert decode_jpeg_pixels(prog) is None
        assert decode_jpeg_pixels(bytes(good[:30])) is None
        assert decode_jpeg_pixels(b"\xff\xd8junk") is None

    def test_decode_pixels_dataframe_jpeg(self, spark):
        import numpy as np

        from topn_spark.operators.multimodal import (
            decode_pixels,
            encode_jpeg_gray,
        )

        P = np.full((8, 16), 99, dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, encode_jpeg_gray(16, 8, P.tobytes()))],
            "doc_id long, payload binary",
        )
        row = decode_pixels(df).collect()[0]
        assert row.shape == [8, 16, 1]
        assert set(row.pixels) == {99}


class TestImageFeatures:
    def test_closed_forms_on_ramp_and_nulls(self, spark):
        """x+y+40c ramp: luminance mean/std and the constant-|G| Sobel
        interior match closed forms; undecodable payloads yield null
        features; 1-channel (gray JPEG) uses the channel directly."""
        import math

        from topn_spark.operators.multimodal import (
            encode_gif_rgb,
            encode_jpeg_gray,
            image_features,
        )

        w, h = 5, 4
        ramp = bytes(
            x + y + 40 * c
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        gray = bytes(200 for _ in range(64))
        df = spark.createDataFrame(
            [
                (1, encode_gif_rgb(w, h, ramp)),
                (2, encode_jpeg_gray(8, 8, gray)),
                (3, b"not an image"),
                (4, None),
            ],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r for r in image_features(df).collect()}
        r1 = got[1]
        assert (r1.width, r1.height, r1.channels) == (w, h, 3)
        assert r1.lum_mean == round((w - 1) / 2 + (h - 1) / 2 + 32.6, 4)
        assert r1.lum_std == round(
            math.sqrt((w * w - 1) / 12 + (h * h - 1) / 12), 4
        )
        assert r1.edge_mean == round(math.sqrt(128), 4)
        assert r1.edge_frac == 1.0
        r2 = got[2]
        assert (r2.channels, r2.lum_mean, r2.lum_std) == (1, 200.0, 0.0)
        assert (r2.edge_mean, r2.edge_frac) == (0.0, 0.0)
        assert got[3].lum_mean is None and got[4].lum_mean is None

    def test_tiny_image_has_null_edges(self, spark):
        from topn_spark.operators.multimodal import (
            encode_png,
            image_features,
        )

        df = spark.createDataFrame(
            [(1, encode_png(2, 2, bytes(12)))],
            "doc_id long, payload binary",
        )
        r = image_features(df).collect()[0]
        assert r.lum_mean == 0.0
        assert r.edge_mean is None and r.edge_frac is None


class TestResizeImage:
    def test_box_mean_exact_and_guards(self, spark):
        import pytest

        from topn_spark.operators.multimodal import (
            encode_png,
            resize_image,
        )

        w, h = 6, 4
        ramp = bytes(
            x + y + 40 * c
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        df = spark.createDataFrame(
            [
                (1, encode_png(w, h, ramp)),
                (2, encode_png(5, 4, bytes(60))),  # 5 % 2 != 0 -> null
                (3, None),
            ],
            "doc_id long, payload binary",
        )
        got = {r.doc_id: r for r in resize_image(df, 2).collect()}
        assert got[1].r_shape == [2, 3, 3]
        want = [
            float(2 * bx + 2 * by + 1 + 40 * c)
            for by in range(2)
            for bx in range(3)
            for c in range(3)
        ]
        assert got[1].r_pixels == want
        assert got[2].r_pixels is None and got[3].r_pixels is None
        with pytest.raises(ValueError, match="factor"):
            resize_image(df, 0)


def test_audio_features_hand_signal_and_gates(spark):
    """Hand-computable stereo signal: RMS/peak/ZCR match by-hand
    values; non-PCM and junk payloads yield nulls; a single frame
    has null zcr."""
    from topn_spark.operators.multimodal import (
        audio_features,
        encode_wav_pcm16,
    )

    # stereo, 3 frames: L = [3, -4, 5], R = [0, 2, -2]
    frames = [3, 0, -4, 2, 5, -2]
    df = spark.createDataFrame(
        [
            (1, encode_wav_pcm16(8000, 2, frames)),
            (2, encode_wav_pcm16(44100, 1, [7])),
            (3, b"junk"),
            (4, None),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in audio_features(df).collect()}
    r1 = got[1]
    assert (r1.channels, r1.sample_rate, r1.n_frames) == (2, 8000, 3)
    # sum sq = 9+0+16+4+25+4 = 58; rms = sqrt(58/6)
    assert r1.rms == round((58 / 6) ** 0.5, 6)
    assert r1.peak == 5
    # L crossings: 3->-4, -4->5 = 2; R: 0->2 no (strict), 2->-2 yes
    assert r1.zcr == round(3 / (2 * 2), 6)
    r2 = got[2]
    assert (r2.n_frames, r2.rms, r2.peak, r2.zcr) == (1, 7.0, 7, None)
    assert got[3].rms is None and got[4].rms is None


def test_jpeg_short_segments_return_none():
    """Structurally malformed segment bodies (1-byte DRI, truncated
    SOF component list) must be None, not an unpack crash."""
    import struct

    from topn_spark.operators.multimodal import decode_jpeg_pixels

    def seg(marker, body):
        return bytes((0xFF, marker)) + struct.pack(
            ">H", len(body) + 2
        ) + body

    # DRI with a 1-byte body
    bad_dri = b"\xff\xd8" + seg(0xDD, b"\x01") + b"\xff\xd9"
    assert decode_jpeg_pixels(bad_dri) is None
    # SOF0 declaring 3 components but carrying bytes for 1
    bad_sof = (
        b"\xff\xd8"
        + seg(0xC0, bytes((8,)) + struct.pack(">HH", 8, 8)
              + bytes((3, 1, 0x11, 0)))
        + b"\xff\xd9"
    )
    assert decode_jpeg_pixels(bad_sof) is None


def test_extract_features_histogram_real_and_modes(spark):
    """Default mode computes the real L2-normalized luminance
    histogram (checked against a NumPy mirror to float32 precision);
    mode='model' fails fast; fake=True keeps the hash featurizer."""
    import numpy as np
    import pytest

    from topn_spark.operators.multimodal import (
        encode_gif_rgb,
        encode_png,
        extract_features,
    )

    w, h = 6, 4
    ramp = bytes(
        x + y + 40 * c
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    gray = bytes((17 * i) % 256 for i in range(w * h))
    df = spark.createDataFrame(
        [
            (1, encode_gif_rgb(w, h, ramp)),
            (2, encode_png(w, h, gray, color_type=0)),
            (3, b"junk"),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r.features for r in extract_features(df).collect()}

    def mirror(lum):
        hist = np.bincount(
            np.clip((lum * (16 / 256.0)).astype(int), 0, 15).reshape(-1),
            minlength=16,
        ).astype(np.float64)
        return (hist / np.sqrt((hist * hist).sum())).astype(np.float32)

    arr = np.frombuffer(ramp, np.uint8).reshape(h, w, 3).astype(float)
    lum1 = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    assert np.allclose(got[1], mirror(lum1), atol=1e-7)
    lum2 = np.frombuffer(gray, np.uint8).reshape(h, w).astype(float)
    assert np.allclose(got[2], mirror(lum2), atol=1e-7)
    assert got[3] is None
    assert abs(sum(v * v for v in got[1]) - 1.0) < 1e-5

    with pytest.raises(Exception, match="vision model"):
        extract_features(df, mode="model").collect()
    fake = {r.doc_id: r.features for r in extract_features(df, fake=True).collect()}
    assert fake[3] is not None  # hash featurizer ignores decodability
    with pytest.raises(ValueError, match="mode"):
        extract_features(df, mode="nope")


class TestAviMjpeg:
    def test_round_trip_sampling_and_guards(self, spark):
        import numpy as np
        import pytest

        from topn_spark.operators.multimodal import (
            encode_avi_mjpeg,
            encode_jpeg_gray,
            parse_avi_mjpeg,
            sample_video_frames,
        )

        frames = [
            encode_jpeg_gray(
                16, 8, np.full((8, 16), 40 + 10 * f, np.uint8).tobytes()
            )
            for f in range(5)
        ]
        avi = encode_avi_mjpeg(16, 8, frames, us_per_frame=40_000)
        us, got = parse_avi_mjpeg(avi)
        assert us == 40_000 and len(got) == 5
        # truncation / wrong RIFF form / junk: None, not a crash
        assert parse_avi_mjpeg(avi[:30]) is None
        assert parse_avi_mjpeg(avi[:200]) is None
        assert parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE") is None

        df = spark.createDataFrame(
            [(1, avi), (2, b"not a video"), (3, None)],
            "doc_id long, payload binary",
        )
        rows = sample_video_frames(df, every=2).collect()
        # every=2 over 5 frames -> indices 0, 2, 4; junk contributes 0
        assert [(r.frame_idx, r.t_ms) for r in rows] == [
            (0, 0), (2, 80), (4, 160),
        ]
        assert all(r.doc_id == 1 for r in rows)
        assert [set(r.pixels) for r in rows] == [{40}, {60}, {80}]
        assert all((r.h, r.w, r.ch) == (8, 16, 1) for r in rows)
        with pytest.raises(ValueError, match="every"):
            sample_video_frames(df, every=0)
        # a non-JPEG frame inside a valid AVI raises loudly
        bad = encode_avi_mjpeg(16, 8, [b"not a jpeg frame"])
        df_bad = spark.createDataFrame(
            [(9, bad)], "doc_id long, payload binary"
        )
        with pytest.raises(Exception, match="(?i)jpeg|codec"):
            sample_video_frames(df_bad).collect()
