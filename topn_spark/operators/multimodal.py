"""Multimodal columns: images/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schemas, binaryFile source, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample operators, batch
shapes, partition sizing) is real and tested. The METADATA decode path
is real: :func:`parse_image_header` reads PNG/GIF/JPEG/BMP dimensions
straight from the container headers in pure stdlib, and
:func:`decode_image` applies it per Arrow batch. The PIXEL path is
real for 24-bit BMP, P6 PPM, 8-bit non-interlaced PNG (IDAT is zlib —
stdlib — inflated and unfiltered scanline by scanline), and GIF
(spec-appendix-F LZW decoded in pure Python, four-pass interlace
re-ordered, palette-expanded); only JPEG's DCT still needs a codec
library absent from this container, so it — and the model-backed
featurizers — fail fast with ``NotImplementedError`` unless the
deterministic ``fake=True`` test decoder is requested.

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so tasks get
a handful of assets each; never collect payloads; project metadata
columns early so Catalyst prunes the binary column out of plans that
don't touch it.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal asset schema: payload is opaque binary; all
#: query-able attributes live in typed metadata columns.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_DECODED_FIELDS = [
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), True),
]


def read_binary_dir(
    spark: SparkSession, path: str, glob: str = "*", modality: str = "image"
) -> DataFrame:
    """Ingest a directory of media files via the binaryFile source →
    ASSET_SCHEMA. Distributed read; payload stays columnar binary."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.col("content").alias("payload"),
        F.struct(
            F.regexp_extract("path", r"\.(\w+)$", 1).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    # Deterministic fake decode: dimensions derived from a content
    # digest, so tests get stable values without a media library.
    h = hashlib.sha256(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def parse_image_header(
    payload: bytes | None,
) -> tuple[str | None, int | None, int | None]:
    """``(format, width, height)`` parsed from the container header,
    or ``(None, None, None)`` when no known signature matches.

    Pure stdlib — image dimensions live in fixed, documented header
    fields, no codec library required:

    - PNG: 8-byte signature then the IHDR chunk; width/height are
      big-endian u32 at bytes 16..24.
    - GIF (87a/89a): logical-screen width/height, little-endian u16
      at bytes 6..10.
    - BMP: BITMAPINFOHEADER width/height, little-endian i32 at bytes
      18..26 (height may be negative = top-down rows).
    - JPEG: walk the FF-marker segment chain to the first start-of-
      frame (SOF0-SOF15 minus DHT/JPG/DAC); height/width are
      big-endian u16 in its payload.
    """
    b = payload or b""
    if (
        len(b) >= 24
        and b[:8] == b"\x89PNG\r\n\x1a\n"
        and b[12:16] == b"IHDR"
    ):
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if len(b) >= 26 and b[:2] == b"BM":
        # the DIB header size at bytes 14..18 picks the dim layout:
        # BITMAPCOREHEADER (12) stores u16 dims, BITMAPINFOHEADER and
        # its extensions (>=40) store i32 dims (negative height =
        # top-down rows). Unknown header sizes parse to nothing
        # rather than confidently-wrong dims.
        hsz = struct.unpack("<I", b[14:18])[0]
        if hsz == 12:
            w, h = struct.unpack("<HH", b[18:22])
        elif hsz >= 40:
            w, h = struct.unpack("<ii", b[18:26])
            # negative height = top-down row order, same dimensions
            h = abs(h)
        else:
            return "bmp", None, None
        # a non-positive width (or zero height) is a corrupt header,
        # not a real geometry — null out rather than report it
        if w <= 0 or h <= 0:
            return "bmp", None, None
        return "bmp", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        return _parse_jpeg_sof(b)
    return None, None, None


def _parse_jpeg_sof(b: bytes) -> tuple[str, int | None, int | None]:
    i, n = 2, len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            # not positioned on a marker (corrupt stream); resync.
            i += 1
            continue
        marker = b[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        # standalone markers carry no length field
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS — dims must precede SOS
            break
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if seg_len < 2:
            break
        is_sof = 0xC0 <= marker <= 0xCF and marker not in (
            0xC4,  # DHT
            0xC8,  # JPG
            0xCC,  # DAC
        )
        if is_sof:
            if i + 9 <= n:
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            break
        i += 2 + seg_len
    return "jpeg", None, None


def decode_image(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Image METADATA decode via Arrow-batched ``mapInPandas`` — real.

    PNG/GIF/JPEG/BMP dimensions and the container format are parsed
    from the payload's header bytes (:func:`parse_image_header`, pure
    stdlib). Output adds ``img_format``/``width``/``height``/
    ``n_bytes``; payloads with no recognizable signature get null
    format and — when ``fake=True`` — deterministic sha256-derived
    dims (the test decoder), else null dims. Full pixel decoding is a
    different operation: see :func:`decode_pixels` (fail-fast, needs a
    codec library).
    """
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("img_format", T.StringType(), True)]
        + _DECODED_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, widths, heights = [], [], []
            for p in pdf[payload_col]:
                fmt, w, h = parse_image_header(p)
                if fmt is None and fake:
                    w, h = _fake_dims(p if p is not None else b"")
                fmts.append(fmt)
                widths.append(w)
                heights.append(h)
            pdf = pdf.copy()
            pdf["img_format"] = fmts
            pdf["width"] = pd.array(widths, dtype="Int32")
            pdf["height"] = pd.array(heights, dtype="Int32")
            pdf["n_bytes"] = [
                len(p) if p is not None else 0 for p in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def encode_bmp_rgb(width: int, height: int, pix: bytes) -> bytes:
    """Spec-valid uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB)
    from row-major top-down RGB bytes (test-fixture encoder, also the
    documentation of exactly what :func:`decode_bmp_pixels` reverses:
    BGR byte order, 4-byte row padding, bottom-up row storage)."""
    if len(pix) != width * height * 3:
        raise ValueError("pix must be width*height*3 RGB bytes")
    stride = (width * 3 + 3) // 4 * 4
    body = bytearray()
    for y in range(height - 1, -1, -1):  # file rows are bottom-up
        row = bytearray()
        for x in range(width):
            i = (y * width + x) * 3
            r, g, b = pix[i], pix[i + 1], pix[i + 2]
            row += bytes((b, g, r))  # stored as BGR
        row += b"\x00" * (stride - len(row))
        body += row
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
            2835, 2835, 0, 0,
        )
    )
    return bytes(header + body)


def encode_ppm_rgb(width: int, height: int, pix: bytes) -> bytes:
    """Binary PPM (P6, maxval 255) from row-major top-down RGB bytes."""
    if len(pix) != width * height * 3:
        raise ValueError("pix must be width*height*3 RGB bytes")
    return b"P6\n%d %d\n255\n" % (width, height) + pix


def decode_bmp_pixels(b: bytes) -> tuple[list[int], list[int]] | None:
    """Uncompressed 24-bit BMP → (row-major top-down RGB ints,
    [h, w, 3]); ``None`` for BMPs this pure-stdlib path does not cover
    (compressed, paletted, or non-24-bit)."""
    if len(b) < 54 or b[:2] != b"BM":
        return None
    data_off = struct.unpack("<I", b[10:14])[0]
    hsz = struct.unpack("<I", b[14:18])[0]
    if hsz < 40:
        return None
    w, h = struct.unpack("<ii", b[18:26])
    bpp = struct.unpack("<H", b[28:30])[0]
    compression = struct.unpack("<I", b[30:34])[0]
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or bpp != 24 or compression != 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    if data_off + stride * h > len(b):
        return None
    out: list[int] = []
    for y in range(h):
        # bottom-up files store image row y at file row h-1-y
        fy = y if top_down else h - 1 - y
        base = data_off + fy * stride
        for x in range(w):
            i = base + x * 3
            out += [b[i + 2], b[i + 1], b[i]]  # BGR -> RGB
    return out, [h, w, 3]


def decode_ppm_pixels(b: bytes) -> tuple[list[int], list[int]] | None:
    """Binary PPM (P6, maxval <= 255) → (row-major RGB ints,
    [h, w, 3]); ``None`` on anything else."""
    if b[:2] != b"P6":
        return None
    fields: list[int] = []
    i = 2
    while len(fields) < 3 and i < len(b):
        c = b[i : i + 1]
        if c == b"#":  # comment to end of line
            i = b.find(b"\n", i)
            if i < 0:
                return None
            continue
        if c.isspace():
            i += 1
            continue
        j = i
        while j < len(b) and b[j : j + 1].isdigit():
            j += 1
        if j == i:
            return None
        fields.append(int(b[i:j]))
        i = j
    if len(fields) < 3 or not b[i : i + 1].isspace():
        return None
    w, h, maxval = fields
    i += 1  # the single whitespace after maxval
    if w <= 0 or h <= 0 or maxval > 255 or i + w * h * 3 > len(b):
        return None
    return list(b[i : i + w * h * 3]), [h, w, 3]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> samples per pixel (8-bit depth)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (spec 9.4): nearest of left/up/up-left to
    the linear estimate a + b - c, ties left > up > up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body))
    )


def encode_png(
    width: int,
    height: int,
    pix: bytes,
    color_type: int = 2,
    row_filters: list[int] | None = None,
) -> bytes:
    """Spec-valid 8-bit non-interlaced PNG from row-major top-down
    sample bytes, applying the FORWARD scanline filter chosen per row
    (0=None 1=Sub 2=Up 3=Average 4=Paeth, default cycling 0..4) — the
    test-fixture encoder documenting exactly what
    :func:`decode_png_pixels` must reverse, filter by filter.
    ``color_type``: 0 gray (1 byte/px), 2 RGB (3), 4 gray+alpha (2),
    6 RGBA (4)."""
    ch = _PNG_CHANNELS[color_type]
    if color_type == 3:
        raise ValueError("palette encoding not supported by this fixture")
    if len(pix) != width * height * ch:
        raise ValueError(f"pix must be width*height*{ch} bytes")
    bpp, stride = ch, width * ch
    raw = bytearray()
    prior = bytes(stride)
    for y in range(height):
        row = pix[y * stride : (y + 1) * stride]
        f = (
            row_filters[y % len(row_filters)]
            if row_filters
            else y % 5
        )
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:
            raw += bytes(
                (row[i] - (row[i - bpp] if i >= bpp else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:
            raw += bytes(
                (row[i] - prior[i]) & 0xFF for i in range(stride)
            )
        elif f == 3:
            raw += bytes(
                (
                    row[i]
                    - ((row[i - bpp] if i >= bpp else 0) + prior[i]) // 2
                )
                & 0xFF
                for i in range(stride)
            )
        elif f == 4:
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - bpp] if i >= bpp else 0,
                        prior[i],
                        prior[i - bpp] if i >= bpp else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        else:
            raise ValueError(f"filter {f} not in 0..4")
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(b: bytes) -> tuple[list[int], list[int]] | None:
    """8-bit non-interlaced PNG → (row-major top-down sample ints,
    [h, w, channels]); palette images expand through PLTE to RGB.
    Pure stdlib: IDAT is zlib (RFC 1950) and ``zlib`` ships with
    Python — inflate, then reverse the per-scanline filter (None/Sub/
    Up/Average/Paeth) against the reconstructed prior row.

    ``None`` for the sub-formats this path does not cover (16-bit or
    sub-byte depths, Adam7 interlace) and for corrupt files (bad CRC,
    truncated/oversized inflate) — the caller fails fast rather than
    fabricating pixels. Cost is O(pixels) per asset, the same shape as
    any codec; each asset decodes independently inside its Arrow
    batch, so parallelism is row-level as usual."""
    if len(b) < len(_PNG_SIG) + 12 or b[: len(_PNG_SIG)] != _PNG_SIG:
        return None
    pos, ihdr, plte, idat = len(_PNG_SIG), None, None, []
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        if pos + 12 + ln > len(b):
            return None  # truncated chunk
        typ = b[pos + 4 : pos + 8]
        body = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(
            ">I", b[pos + 8 + ln : pos + 12 + ln]
        )
        if zlib.crc32(typ + body) != crc:
            return None  # corrupt chunk
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or len(ihdr) != 13 or not idat:
        return None
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    ch = _PNG_CHANNELS.get(ctype)
    if (
        ch is None
        or depth != 8
        or comp != 0
        or filt != 0
        or interlace != 0
        or w == 0
        or h == 0
        or (ctype == 3 and plte is None)
    ):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    bpp, stride = ch, w * ch
    if len(raw) != h * (1 + stride):
        return None
    recon = bytearray(h * stride)
    for y in range(h):
        f = raw[y * (1 + stride)]
        line = raw[y * (1 + stride) + 1 : (y + 1) * (1 + stride)]
        o = y * stride
        po = o - stride
        if f == 0:
            recon[o : o + stride] = line
        elif f == 1:
            for i in range(stride):
                left = recon[o + i - bpp] if i >= bpp else 0
                recon[o + i] = (line[i] + left) & 0xFF
        elif f == 2:
            for i in range(stride):
                up = recon[po + i] if y else 0
                recon[o + i] = (line[i] + up) & 0xFF
        elif f == 3:
            for i in range(stride):
                left = recon[o + i - bpp] if i >= bpp else 0
                up = recon[po + i] if y else 0
                recon[o + i] = (line[i] + (left + up) // 2) & 0xFF
        elif f == 4:
            for i in range(stride):
                left = recon[o + i - bpp] if i >= bpp else 0
                up = recon[po + i] if y else 0
                ul = recon[po + i - bpp] if (y and i >= bpp) else 0
                recon[o + i] = (line[i] + _paeth(left, up, ul)) & 0xFF
        else:
            return None
    if ctype == 3:
        out: list[int] = []
        pmax = len(plte) // 3
        for idx in recon:
            if idx >= pmax:
                return None  # index past palette: corrupt
            out += [
                plte[3 * idx],
                plte[3 * idx + 1],
                plte[3 * idx + 2],
            ]
        return out, [h, w, 3]
    return list(recon), [h, w, ch]


def decode_pixels(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Full pixel decode (payload → flat uint8 tensor + shape).

    Real, pure-stdlib paths: 24-bit BI_RGB BMP (BGR order, padded
    bottom-up rows, all reversed to row-major top-down RGB), binary
    PPM/P6 (both oracled by x89 against arithmetically planted
    pixels), 8-bit non-interlaced PNG — gray/RGB/palette/alpha, all
    five scanline filters reversed over inflated IDAT (oracled by
    z01) — and GIF 87a/89a (pure-Python LZW, interlace re-order,
    palette expansion; oracled by z04). JPEG (the one format whose
    decompression — DCT entropy coding — genuinely needs a codec
    library) and unsupported PNG sub-formats (16-bit, Adam7, bad CRC)
    fail fast per batch with ``NotImplementedError`` rather than
    fabricating pixels, keeping the Spark-side contract (schema,
    Arrow batching, partition parallelism) identical for a
    codec-backed drop-in.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pixels", T.ArrayType(T.IntegerType()), True),
            T.StructField("shape", T.ArrayType(T.IntegerType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pixels, shapes = [], []
            for p in pdf[payload_col]:
                decoded = None
                if p is not None:
                    decoded = (
                        decode_bmp_pixels(p)
                        or decode_ppm_pixels(p)
                        or decode_png_pixels(p)
                        or decode_gif_pixels(p)
                    )
                if decoded is None and p is not None:
                    fmt = parse_image_header(p)[0]
                    if fmt == "png":
                        raise NotImplementedError(
                            "unsupported or corrupt PNG: the stdlib "
                            "path covers 8-bit non-interlaced "
                            "gray/RGB/palette/alpha with valid CRCs; "
                            "16-bit and Adam7 need a codec library"
                        )
                    if fmt == "gif":
                        raise NotImplementedError(
                            "corrupt or truncated GIF: the stdlib "
                            "path decodes well-formed 87a/89a frames "
                            "(LZW + interlace) in full"
                        )
                    if fmt == "jpeg":
                        raise NotImplementedError(
                            "pixel-decoding jpeg requires a codec "
                            "library (not in this container); stdlib "
                            "paths cover BMP, PPM, PNG, and GIF"
                        )
                pixels.append(decoded[0] if decoded else None)
                shapes.append(decoded[1] if decoded else None)
            pdf = pdf.copy()
            pdf["pixels"] = pixels
            pdf["shape"] = shapes
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def encode_wav_pcm16(
    sample_rate: int, channels: int, frames: list[int]
) -> bytes:
    """Spec-valid RIFF/WAVE container holding uncompressed 16-bit PCM
    from interleaved int16 samples (test-fixture encoder, and the
    documentation of exactly what :func:`parse_wav` reverses: a
    ``fmt `` chunk with format tag 1 / bits 16, then a ``data`` chunk
    of little-endian interleaved frames)."""
    if len(frames) % channels != 0:
        raise ValueError("frames must be a whole number of frames")
    data = struct.pack("<%dh" % len(frames), *frames)
    fmt = struct.pack(
        "<HHIIHH",
        1,  # WAVE_FORMAT_PCM
        channels,
        sample_rate,
        sample_rate * channels * 2,  # byte rate
        channels * 2,  # block align
        16,  # bits per sample
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def parse_wav(
    b: bytes,
) -> tuple[int, int, int, list[int] | None] | None:
    """RIFF/WAVE → ``(format_tag, channels, sample_rate, samples)``
    where ``samples`` is the interleaved int16 list for uncompressed
    PCM16 payloads and ``None`` for any other format tag / bit depth
    (the caller decides whether that is a fail-fast). ``None`` overall
    when the container is not a parseable WAV.

    Walks the chunk chain properly — chunk ids + little-endian u32
    sizes, word-aligned — so extra chunks (LIST, fact, cue) before or
    between ``fmt ``/``data`` are fine.
    """
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, fmt_body, data_body = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        sz = struct.unpack("<I", b[i + 4 : i + 8])[0]
        body = b[i + 8 : i + 8 + sz]
        if len(body) < sz:
            return None  # truncated chunk
        if cid == b"fmt " and fmt_body is None:
            fmt_body = body
        elif cid == b"data" and data_body is None:
            data_body = body
        i += 8 + sz + (sz & 1)  # chunks are 2-byte aligned
    if fmt_body is None or data_body is None or len(fmt_body) < 16:
        return None
    tag, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", fmt_body[:16])
    if ch <= 0 or sr <= 0:
        return None
    if tag != 1 or bits != 16:
        return tag, ch, sr, None  # recognized but not stdlib-decodable
    n = len(data_body) // (2 * ch) * ch  # whole frames only
    samples = list(struct.unpack("<%dh" % n, data_body[: 2 * n]))
    return tag, ch, sr, samples


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Audio decode (payload → interleaved int16 samples + typed
    metadata) via Arrow-batched ``mapInPandas`` — real for RIFF/WAVE
    uncompressed PCM16, the audio analog of :func:`decode_pixels`'s
    BMP/PPM path, oracled end-to-end by the x90 catalog entry against
    arithmetically planted samples.

    Output adds ``aud_format``/``channels``/``sample_rate``/
    ``n_frames``/``duration_ms``/``samples``. A WAV whose format tag
    is not PCM16 (compressed / float / 24-bit) fails fast with
    ``NotImplementedError`` — a codec library would be required —
    while unrecognized payloads null out, mirroring the image path's
    contract.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("aud_format", T.StringType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("samples", T.ArrayType(T.IntegerType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, chans, rates, frames, durs, samps = [], [], [], [], [], []
            for p in pdf[payload_col]:
                parsed = parse_wav(p) if p is not None else None
                if parsed is None:
                    fmts.append(None)
                    chans.append(None)
                    rates.append(None)
                    frames.append(None)
                    durs.append(None)
                    samps.append(None)
                    continue
                tag, ch, sr, samples = parsed
                if samples is None:
                    raise NotImplementedError(
                        f"decoding WAV format tag {tag} requires a "
                        "codec library (not in this container); the "
                        "stdlib path covers uncompressed PCM16"
                    )
                nf = len(samples) // ch
                fmts.append("wav")
                chans.append(ch)
                rates.append(sr)
                frames.append(nf)
                durs.append(nf * 1000 // sr)
                samps.append(samples)
            pdf = pdf.copy()
            pdf["aud_format"] = fmts
            pdf["channels"] = pd.array(chans, dtype="Int32")
            pdf["sample_rate"] = pd.array(rates, dtype="Int32")
            pdf["n_frames"] = pd.array(frames, dtype="Int64")
            pdf["duration_ms"] = pd.array(durs, dtype="Int64")
            pdf["samples"] = samps
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def _walk_box(b: bytes, lo: int, hi: int, path: tuple[bytes, ...]):
    """Descend an ISO-BMFF box tree along ``path`` (first match per
    level) and return the body bytes of the final box, else None.
    Boxes are ``u32 size + 4cc type``; size 1 → u64 largesize follows,
    size 0 → box extends to the end of the enclosing scope
    (ISO/IEC 14496-12 §4.2)."""
    i = lo
    while i + 8 <= hi:
        size = struct.unpack(">I", b[i : i + 4])[0]
        typ = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > hi:
                return None
            size = struct.unpack(">Q", b[i + 8 : i + 16])[0]
            body = i + 16
        elif size == 0:  # box extends to end of enclosing scope
            size = hi - i
        if size < 8 or i + size > hi:
            return None
        if typ == path[0]:
            if len(path) == 1:
                return b[body : i + size]
            return _walk_box(b, body, i + size, path[1:])
        i += size
    return None


def parse_mp4_header(
    b: bytes,
) -> tuple[str | None, int | None, int | None]:
    """ISO-BMFF (MP4/MOV) → ``(format, timescale, duration_ms)`` by
    walking the box tree to ``moov``/``mvhd`` — the video analog of
    :func:`parse_image_header`, pure stdlib.

    Boxes are ``u32 size + 4cc type``; a size of 1 means a u64
    largesize follows; version-1 ``mvhd`` stores u64 times, version-0
    u32 (ISO/IEC 14496-12 §8.2.2). ``(None, None, None)`` when no
    ``ftyp`` leads the stream or ``mvhd`` is absent/corrupt.
    """
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None, None, None

    mvhd = _walk_box(b, 0, len(b), (b"moov", b"mvhd"))
    if mvhd is None or len(mvhd) < 4:
        return "mp4", None, None
    version = mvhd[0]
    try:
        if version == 1:
            timescale = struct.unpack(">I", mvhd[20:24])[0]
            duration = struct.unpack(">Q", mvhd[24:32])[0]
        else:
            timescale = struct.unpack(">I", mvhd[12:16])[0]
            duration = struct.unpack(">I", mvhd[16:20])[0]
    except struct.error:
        return "mp4", None, None
    if timescale <= 0:
        return "mp4", None, None
    return "mp4", timescale, duration * 1000 // timescale


def encode_mp4_stub(
    timescale: int, duration: int, version: int = 0
) -> bytes:
    """Minimal spec-valid ISO-BMFF stream (``ftyp`` + ``moov``/``mvhd``,
    no media data) carrying the given movie timescale/duration —
    test-fixture encoder for :func:`parse_mp4_header`."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    if version == 1:
        mvhd_body = (
            struct.pack(">I", 1 << 24)  # version=1, flags=0
            + struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * (8 + 36 + 24)  # reserved, matrix, pre_defined
            + struct.pack(">I", 2)  # next_track_ID
        )
    else:
        mvhd_body = (
            struct.pack(">I", 0)
            + struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">IHH", 0x00010000, 0x0100, 0)
            + b"\x00" * (8 + 36 + 24)
            + struct.pack(">I", 2)
        )
    return ftyp + box(b"moov", box(b"mvhd", mvhd_body))


def decode_video(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Video METADATA decode via Arrow-batched ``mapInPandas`` — real
    for ISO-BMFF (MP4/MOV) containers: :func:`parse_mp4_header` walks
    the box tree to ``mvhd`` and reads the movie timescale/duration in
    pure stdlib, completing the image/audio/video metadata triple
    (x81 image headers, x90 audio decode, x93 this). Frame/pixel
    access still requires a real demuxer+codec — that remains
    :func:`sample_frames`'s fail-fast contract.

    Output adds ``vid_format``/``timescale``/``duration_ms``;
    unrecognized payloads null out all three.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("vid_format", T.StringType(), True),
            T.StructField("timescale", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, scales, durs = [], [], []
            for p in pdf[payload_col]:
                fmt, ts, dur = (
                    parse_mp4_header(p)
                    if p is not None
                    else (None, None, None)
                )
                fmts.append(fmt)
                scales.append(ts)
                durs.append(dur)
            pdf = pdf.copy()
            pdf["vid_format"] = fmts
            pdf["timescale"] = pd.array(scales, dtype="Int32")
            pdf["duration_ms"] = pd.array(durs, dtype="Int64")
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    dim: int = FEATURE_DIM,
    fake: bool = False,
) -> DataFrame:
    """Per-asset feature vector (array<float>) via ``mapInPandas``.

    Stub: deterministic hash-derived unit vector when ``fake=True``;
    NotImplementedError otherwise (no vision model in container).
    """
    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires a vision model; pass "
                    "fake=True for the deterministic test featurizer"
                )
            feats = []
            for p in pdf[payload_col]:
                digest = hashlib.sha256(p or b"").digest()
                vec = [
                    (digest[i % 32] - 127.5) / 127.5 for i in range(dim)
                ]
                norm = sum(x * x for x in vec) ** 0.5 or 1.0
                feats.append([float(x / norm) for x in vec])
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    every_ms: int = 1000,
    fake: bool = False,
) -> DataFrame:
    """Video → frame rows (one output row per sampled frame) via
    ``mapInPandas`` fan-out. Stubbed: fake mode emits
    ``duration_ms // every_ms`` synthetic frame digests."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_digest", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg; pass fake=True"
                )
            rows = []
            for aid, p, meta in zip(
                pdf["asset_id"], pdf[payload_col], pdf["meta"]
            ):
                dur = (meta or {}).get("duration_ms") or 0
                n = max(int(dur // every_ms), 1)
                base = hashlib.sha256(p or b"").hexdigest()
                for i in range(n):
                    rows.append(
                        (aid, i, hashlib.sha256(f"{base}:{i}".encode()).hexdigest()[:16])
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_digest"]
            )

    return df.mapInPandas(run, schema=out_schema)


def encode_mp4_with_track(
    movie_timescale: int,
    media_timescale: int,
    stts_entries: list[tuple[int, int]],
    version: int = 0,
) -> bytes:
    """Spec-valid ISO-BMFF stream with a real sample-timing table:
    ``ftyp + moov[mvhd + trak[mdia[mdhd + minf[stbl[stts]]]]]`` —
    fixture encoder for :func:`video_frame_times`. ``stts_entries``
    is the ISO/IEC 14496-12 §8.6.1.2 run-length form:
    ``(sample_count, sample_delta)`` in media-timescale ticks."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    total = sum(c * d for c, d in stts_entries)
    movie_dur = total * movie_timescale // max(media_timescale, 1)
    mvhd = encode_mp4_stub(movie_timescale, movie_dur, version=version)
    # reuse the stub's ftyp+mvhd bytes, rebuild moov with the track
    ftyp_len = struct.unpack(">I", mvhd[:4])[0]
    ftyp = mvhd[:ftyp_len]
    mvhd_box = mvhd[ftyp_len + 8 :]  # strip the old moov header
    mdhd_body = (
        struct.pack(">I", 0)  # version 0, flags 0
        + struct.pack(">IIII", 0, 0, media_timescale, total)
        + struct.pack(">HH", 0x55C4, 0)  # language 'und', pre_defined
    )
    stts_body = struct.pack(">II", 0, len(stts_entries)) + b"".join(
        struct.pack(">II", c, d) for c, d in stts_entries
    )
    stbl = box(b"stbl", box(b"stts", stts_body))
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", box(b"mdhd", mdhd_body) + minf)
    trak = box(b"trak", mdia)
    return ftyp + box(b"moov", mvhd_box + trak)


def parse_frame_times(b: bytes) -> list[int] | None:
    """Frame start times in integer milliseconds from the first
    track's ``stts`` sample-timing table (run-length decoded against
    the ``mdhd`` media timescale) — REAL metadata-level frame timing,
    pure stdlib, no demuxer: ``t_ms[i] = (sum of deltas before i) *
    1000 // media_timescale``. None when the container has no
    parseable ``trak/mdia/mdhd + minf/stbl/stts`` chain."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    mdia = _walk_box(b, 0, len(b), (b"moov", b"trak", b"mdia"))
    if mdia is None:
        return None
    mdhd = _walk_box(mdia, 0, len(mdia), (b"mdhd",))
    stts = _walk_box(mdia, 0, len(mdia), (b"minf", b"stbl", b"stts"))
    if mdhd is None or stts is None or len(mdhd) < 16 or len(stts) < 8:
        return None
    version = mdhd[0]
    try:
        ts = struct.unpack(
            ">I", mdhd[20:24] if version == 1 else mdhd[12:16]
        )[0]
        n_entries = struct.unpack(">I", stts[4:8])[0]
        if ts <= 0 or len(stts) < 8 + 8 * n_entries:
            return None
        times, cum = [], 0
        for e in range(n_entries):
            cnt, delta = struct.unpack(
                ">II", stts[8 + 8 * e : 16 + 8 * e]
            )
            for _ in range(cnt):
                times.append(cum * 1000 // ts)
                cum += delta
        return times
    except struct.error:
        return None


def video_frame_times(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video → one row per frame ``(id, frame_idx, t_ms)`` from the
    container's OWN sample-timing metadata (:func:`parse_frame_times`)
    — the real part of frame sampling that needs no codec: which
    timestamps exist. Feeding ``t_ms`` into an actual pixel extractor
    remains :func:`sample_frames`'s fail-fast contract.

    Arrow-batched ``mapInPandas`` fan-out: output rows ~ total frame
    count, partition-local (no shuffle); at 100 TB the stts walk reads
    container headers only — pair with a format that stores moov
    up-front (faststart) so the scan never touches media data."""
    out_schema = T.StructType(
        [
            df.schema[id_col],
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("t_ms", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, p in zip(pdf[id_col], pdf[payload_col]):
                times = parse_frame_times(bytes(p) if p is not None else b"")
                if times is None:
                    continue
                rows.extend((rid, i, t) for i, t in enumerate(times))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "t_ms"]
            )

    return df.mapInPandas(run, schema=out_schema)


def _gif_lzw_decode(min_code_size: int, data: bytes) -> list[int] | None:
    """GIF-variant LZW (spec appendix F): variable-width codes packed
    little-endian-bit-first; CLEAR resets the dictionary, EOI ends.
    Returns the index stream, or ``None`` on a malformed stream."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out: list[int] = []
    bitpos = 0
    nbits = len(data) * 8

    def _reset():
        return (
            {i: [i] for i in range(clear)},
            clear + 2,
            min_code_size + 1,
        )

    table, next_code, width = _reset()
    prev: list[int] | None = None
    while bitpos + width <= nbits:
        code = 0
        for i in range(width):
            b = bitpos + i
            if data[b >> 3] & (1 << (b & 7)):
                code |= 1 << i
        bitpos += width
        if code == clear:
            table, next_code, width = _reset()
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= next_code:
                return None  # first code must be literal
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]  # the KwKwK special case
        else:
            return None
        out += entry
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    return None  # ran out of bits before EOI


def _gif_lzw_encode(min_code_size: int, indices: list[int]) -> bytes:
    """Minimal valid GIF LZW stream: every index emitted as a literal
    code with CLEAR codes interleaved so the code width never grows —
    the classic 'uncompressed GIF' writer, a correct stream any
    decoder must accept (test-fixture encoder)."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    width = min_code_size + 1
    # after a CLEAR the table holds 2^min+2 codes; each literal adds
    # one, so this many literals fit before width would bump
    budget = (1 << width) - clear - 2
    bits: list[int] = []

    def emit(code):
        for i in range(width):
            bits.append((code >> i) & 1)

    emit(clear)
    n = 0
    for ix in indices:
        if n == budget - 1:
            emit(clear)
            n = 0
        emit(ix)
        n += 1
    emit(eoi)
    by = bytearray()
    for i in range(0, len(bits), 8):
        v = 0
        for j, b in enumerate(bits[i : i + 8]):
            v |= b << j
        by.append(v)
    return bytes(by)


#: GIF interlace passes: (start row, step)
_GIF_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_pixels(b: bytes) -> tuple[list[int], list[int]] | None:
    """GIF87a/89a first frame → (row-major top-down RGB ints,
    [h, w, 3]) — pure stdlib: the only compression in GIF is LZW,
    decoded by :func:`_gif_lzw_decode`; interlaced frames are
    re-ordered through the four-pass row schedule. Uses the local
    color table when present, else the global one. ``None`` on
    malformed streams, missing palettes, or truncation — the caller
    fails fast rather than fabricating pixels."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    packed = b[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = b[pos : pos + n]
        if len(gct) < n:
            return None
        pos += n
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension: skip label + sub-blocks
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:  # image descriptor
            if pos + 10 > len(b):
                return None
            w, h = struct.unpack("<HH", b[pos + 5 : pos + 9])
            ipacked = b[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 3 * (2 << (ipacked & 0x07))
                pal = b[pos : pos + n]
                if len(pal) < n:
                    return None
                pos += n
            if pal is None or w == 0 or h == 0:
                return None
            if pos >= len(b):
                return None
            min_code = b[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                return None
            data = bytearray()
            while pos < len(b) and b[pos] != 0:
                ln = b[pos]
                chunk = b[pos + 1 : pos + 1 + ln]
                if len(chunk) < ln:
                    return None
                data += chunk
                pos += 1 + ln
            idx = _gif_lzw_decode(min_code, bytes(data))
            if idx is None or len(idx) < w * h:
                return None
            idx = idx[: w * h]
            pmax = len(pal) // 3
            if ipacked & 0x40:  # interlaced: re-order rows
                rows = [None] * h
                src = 0
                for start, step in _GIF_INTERLACE:
                    for y in range(start, h, step):
                        rows[y] = idx[src * w : (src + 1) * w]
                        src += 1
                idx = [v for row in rows for v in row]
            out: list[int] = []
            for v in idx:
                if v >= pmax:
                    return None
                out += [pal[3 * v], pal[3 * v + 1], pal[3 * v + 2]]
            return out, [h, w, 3]
        elif blk == 0x3B:
            return None  # trailer before any image frame
        else:
            return None
    return None


def encode_gif_rgb(
    width: int, height: int, pix: bytes, interlace: bool = False
) -> bytes:
    """Spec-valid GIF89a from row-major top-down RGB bytes (palette
    built from the distinct colors, ≤256) — test-fixture encoder for
    :func:`decode_gif_pixels`, writing real LZW sub-blocks and
    optionally the four-pass interlaced row order."""
    if len(pix) != width * height * 3:
        raise ValueError("pix must be width*height*3 RGB bytes")
    colors: dict[bytes, int] = {}
    idx = []
    for i in range(width * height):
        c = pix[3 * i : 3 * i + 3]
        if c not in colors:
            if len(colors) == 256:
                raise ValueError("more than 256 distinct colors")
            colors[c] = len(colors)
        idx.append(colors[c])
    depth = max(1, (len(colors) - 1).bit_length())
    pal = b"".join(colors) + b"\x00\x00\x00" * (
        (1 << depth) - len(colors)
    )
    if interlace:
        order = []
        for start, step in _GIF_INTERLACE:
            order += list(range(start, height, step))
        idx = [
            idx[y * width + x] for y in order for x in range(width)
        ]
    min_code = max(2, depth)
    lzw = _gif_lzw_encode(min_code, idx)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        sub += bytes((len(chunk),)) + chunk
    sub += b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HH", width, height)
        + bytes((0x80 | (depth - 1), 0, 0))
        + pal
        + b"\x2C"
        + struct.pack("<HHHH", 0, 0, width, height)
        + bytes((0x40 if interlace else 0x00,))
        + bytes((min_code,))
        + bytes(sub)
        + b"\x3B"
    )
