"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode libraries (PIL/ffmpeg/torchaudio) are NOT in this container, so the
decode kernels are stubbed behind clearly-marked gates; everything Spark-side —
schema, partitioning, Arrow batch shape, mapInPandas plumbing — is real and
tested. Swap `_decode_image_stub` for a real decoder and nothing else changes.

Design notes for 100 TB of media:
- media rows are large; `spark.sql.files.maxPartitionBytes` and the
  `repartition(n)` before mapInPandas control batch memory, and the work is
  embarrassingly parallel.
- metadata (mime/width/height/duration) lives in a sibling struct column so
  filters prune on parquet statistics without touching bytes (column pruning:
  a query on metadata never reads the binary column's pages).
- feature extraction returns fixed-size float arrays → directly feeds
  functions.similarity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16

try:  # real decoders, if ever present
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def _decode_image_stub(content: bytes) -> bytes:
    """STUB: real impl would decode to RGB pixel buffer.

    Without a codec library we either raise (strict mode) or produce a
    deterministic fake derived from the bytes so the pipeline shape is
    exercisable end-to-end. The fake chains md5 over HEX DIGEST STRINGS
    (h1 = md5(content), h2 = md5(ascii(h1)), ...) rather than digest bytes —
    semantically equivalent fake pixels, but expressible in ANSI SQL
    (DuckDB's md5() takes VARCHAR only), so the mapInPandas feature path
    gets a real value-hash oracle in the correctness gate.
    """
    if HAVE_PIL:
        raise NotImplementedError("wire PIL decode here when the lib is available")
    out = b""
    seed = content or b""
    while len(out) < 64:
        hx = hashlib.md5(seed).hexdigest()
        out += bytes.fromhex(hx)
        seed = hx.encode("ascii")
    return out[:64]


def _features_from_pixels(pixels: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake feature vector from the (fake) pixel buffer."""
    return [pixels[i * 4] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, content_col: str = "content",
                     id_col: str = "media_id", dim: int = FEATURE_DIM) -> DataFrame:
    """media → (media_id, feature array<float>) via Arrow-batched mapInPandas.

    The UDF boundary transfers only (id, content); metadata columns are
    pruned. Batches arrive as pandas DataFrames (Arrow), the per-row decode is
    the only Python work.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    # self-contained closure: pickles BY VALUE so workers don't need
    # peerdb_spark importable (module-level refs pickle by reference);
    # mirrors _decode_image_stub/_features_from_pixels — keep in sync
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def _decode(content: bytes) -> bytes:
            out = b""
            seed = content or b""
            while len(out) < 64:
                hx = hashlib.md5(seed).hexdigest()
                out += bytes.fromhex(hx)
                seed = hx.encode("ascii")
            return out[:64]

        for pdf in batches:
            feats = [
                [_decode(c)[i * 4] / 255.0 for i in range(dim)] for c in pdf[content_col]
            ]
            yield _pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, content_col).mapInPandas(run, out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """media → (media_id, content, meta) with resized pixel payloads.

    Arrow-batched mapInPandas; the resize kernel is STUBBED (no codec libs in
    this container): it produces a deterministic fake buffer of exactly
    width·height·3 bytes derived from the source bytes, and rewrites the
    metadata struct to the target dimensions — so downstream schema,
    partitioning and size accounting behave exactly as with a real resampler.
    Swap the inner `_resize` for PIL's `Image.resize` and nothing else moves.
    """
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("meta", MEDIA_META),
        ]
    )
    target = (width, height)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        w, h = target
        n_bytes = w * h * 3

        def _resize(content: bytes) -> bytes:
            # STUB: real impl decodes + resamples; fake is deterministic
            # in the source bytes and exactly the target buffer size.
            # md5 HEX-digest chain (not digest bytes) so the DuckDB oracle
            # reproduces the buffer: b = unhex(h1)||unhex(h2)||..., h1 =
            # md5(content), h_i = md5(ascii(h_{i-1}))
            out = b""
            seed = content or b""
            while len(out) < n_bytes:
                hx = hashlib.md5(seed).hexdigest()
                out += bytes.fromhex(hx)
                seed = hx.encode("ascii")
            return out[:n_bytes]

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "content": [_resize(c) for c in pdf["content"]],
                    "meta": [
                        ("image/raw-rgb", w, h, None, None) for _ in range(len(pdf))
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(run, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000,
                      id_col: str = "media_id") -> DataFrame:
    """Video frame-sampling plumbing: (media_id, frame_ts_ms) rows from the
    metadata duration — pure JVM explode; the decode of each frame is the
    stubbed kernel above. Filters/limits push down before any byte is read."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never touches the binary column (check the
    plan: ReadSchema excludes `content`)."""
    return df.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.col("meta.width")).alias("avg_width"),
        F.sum(F.coalesce(F.col("meta.duration_ms"), F.lit(0))).alias("total_duration_ms"),
    )
