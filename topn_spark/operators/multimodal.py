"""Multimodal columns: images/audio/video as opaque binary + typed
metadata.

The Spark-side plumbing (schemas, binaryFile source, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample operators, batch
shapes, partition sizing) is real and tested; the actual media
decoding is STUBBED — the image/audio libraries are not in this
container — behind ``decoder=`` hooks that either raise
``NotImplementedError`` (default) or compute a deterministic fake
(``fake=True``) so the distributed pipeline shape is exercisable
end-to-end.

Scale notes: binary payloads make wide rows — keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so tasks get
a handful of assets each; never collect payloads; project metadata
columns early so Catalyst prunes the binary column out of plans that
don't touch it.
"""

from __future__ import annotations

import hashlib
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


def decode_image(
    df: DataFrame, payload_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Decode image dims via Arrow-batched ``mapInPandas``.

    Real decode requires PIL/opencv (absent here) → raises
    ``NotImplementedError`` per batch unless ``fake=True``, which
    derives deterministic dims from a sha256 of the payload. The
    distributed plumbing — schema evolution, Arrow batch iteration,
    partition-parallel execution — is identical either way.
    """
    out_schema = T.StructType(df.schema.fields + _DECODED_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/opencv; pass fake=True "
                    "for the deterministic test decoder"
                )
            dims = [
                _fake_dims(p if p is not None else b"")
                for p in pdf[payload_col]
            ]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["n_bytes"] = [
                len(p) if p is not None else 0 for p in pdf[payload_col]
            ]
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
