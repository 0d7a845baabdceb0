"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` content plus a metadata struct and
runs decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages — the shape that scales: media bytes never leave
the executor, Python sees columnar batches, partitioning is by asset id.

The actual codec work is STUBBED (this container ships no image/audio
libraries): ``decode`` parses only the deterministic fake header written
by ``synthesize_assets`` and raises ``NotImplementedError`` for real
formats.  Everything around the stub — schemas, batch iteration, UDF
signatures, partition behavior — is real and tested; a real codec drops
into ``_decode_bytes`` without touching any plan.
"""

from __future__ import annotations

import hashlib
import math
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal asset schema
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_MAGIC = b"FAKE"
_HEADER_FMT = "<4sII"  # magic, width, height
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)


def synthesize_assets(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake assets derived from ids (test/demo source).

    Content is a tiny FAKE-format blob: 12-byte header (magic, width,
    height) + 32 pseudo-pixel bytes derived from the id via sha256 — fully
    deterministic, so every downstream stage is oracle-able in pytest.
    """
    @F.pandas_udf(T.BinaryType())
    def fake_content(ids: pd.Series) -> pd.Series:
        def blob(i: int) -> bytes:
            # truncated (sign-of-dividend) remainder to match Spark/SQL %,
            # so header fields agree with the meta struct and the oracle
            # even for negative ids (Python's % is floored, not truncated)
            w = 16 + int(math.fmod(i, 16))
            h = 16 + int(math.fmod(i * 7, 16))
            body = hashlib.sha256(str(i).encode()).digest()
            return struct.pack(_HEADER_FMT, _MAGIC, w, h) + body

        return ids.map(blob)

    ident = F.col(id_col).cast("long")
    return docs.select(
        ident.alias("asset_id"),
        F.when(ident % 3 == 0, "image")
        .when(ident % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        fake_content(ident).alias("content"),
        F.struct(
            F.lit("fake").alias("format"),
            (ident % 16 + 16).cast("int").alias("width"),
            ((ident * 7) % 16 + 16).cast("int").alias("height"),
            (ident * 40 + 1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_bytes(content: bytes) -> tuple[int, int, bytes]:
    """Decode one asset's bytes -> (width, height, raw pixel bytes).

    FAKE-format blobs (``synthesize_assets``) decode natively — that is
    the sandbox/test codec and stays fully deterministic.  Anything else
    auto-upgrades to Pillow when it is importable (real clusters), so a
    real image corpus decodes with no code change; without Pillow (this
    container) real formats raise ``NotImplementedError``.  Audio/video
    codecs (ffmpeg/soundfile) would slot in the same way."""
    if content[:4] == _MAGIC:
        _, w, h = struct.unpack(_HEADER_FMT, content[:_HEADER_SIZE])
        return w, h, content[_HEADER_SIZE:]
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "real codecs are not available in this environment (no PIL); "
            "only FAKE-format blobs (synthesize_assets) decode"
        ) from None
    import io

    with Image.open(io.BytesIO(bytes(content))) as img:
        w, h = img.size
        return w, h, img.tobytes()


DECODED_SCHEMA = T.StructType(
    ASSET_SCHEMA.fields
    + [
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
        T.StructField("n_pixels_bytes", T.IntegerType()),
    ]
)


def decode_assets(assets: DataFrame) -> DataFrame:
    """Decode stage: Arrow-batched ``mapInPandas``; bytes stay columnar,
    one Python roundtrip per batch (not per row)."""
    from ..session import ensure_package_on_workers

    # the worker closure references module-level _decode_bytes (the codec
    # swap point), so the package must be importable worker-side even when
    # the session wasn't built by get_spark
    ensure_package_on_workers(assets.sparkSession)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["content"].map(_decode_bytes)
            pdf["decoded_width"] = [d[0] for d in decoded]
            pdf["decoded_height"] = [d[1] for d in decoded]
            pdf["n_pixels_bytes"] = [len(d[2]) for d in decoded]
            yield pdf

    return assets.mapInPandas(batches, schema=DECODED_SCHEMA)


FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """Feature extraction stage: deterministic 8-dim embedding of the
    content bytes (sha256 over the lowercase-hex encoding, so SQL oracles
    can replay it — DuckDB's sha256 takes VARCHAR only).  Stands in for a
    model forward pass; the batch shape (mapInPandas, array<float> output)
    is the real contract a GPU encoder plugs into."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            def feat(content: bytes) -> list[float]:
                d = hashlib.sha256(content.hex().encode()).digest()
                return [
                    int.from_bytes(d[i * 4 : i * 4 + 4], "little") / 2**32
                    for i in range(FEATURE_DIM)
                ]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "features": pdf["content"].map(feat),
                }
            )

    return assets.mapInPandas(batches, schema=FEATURES_SCHEMA)


def resize_images(assets: DataFrame, *, max_side: int = 16) -> DataFrame:
    """Resize stage (images only): recomputes target dims JVM-side, marks
    content for re-encode.  The byte transform itself is the stubbed
    decode/encode pair; dimension math and filtering are real."""
    scale = F.least(
        F.lit(1.0),
        max_side / F.greatest(F.col("meta.width"), F.col("meta.height")),
    )
    return assets.filter(F.col("modality") == "image").select(
        "asset_id",
        "modality",
        "content",
        "meta",
        F.floor(F.col("meta.width") * scale).cast("int").alias("target_width"),
        F.floor(F.col("meta.height") * scale).cast("int").alias("target_height"),
    )


def sample_frames(assets: DataFrame, *, every_ms: int = 500) -> DataFrame:
    """Frame sampling (videos only): one output row per sampled timestamp
    (explode of a JVM-side sequence) — the decode of each frame is the
    stub; the row fan-out and partitioning are the real plumbing."""
    return (
        assets.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("meta.duration_ms"),
                    F.lit(every_ms).cast("long"),
                )
            ),
        )
        .select("asset_id", "frame_ts_ms", "content", "meta")
    )
