"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The decode step is STUBBED (no image/audio libs in this container):
``decode_image_batch`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder produces
(height, width, mean_luma) from the byte content so the Spark-side
plumbing — schema, batching, partitioning — is real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
    ]
)


def binary_meta(df: DataFrame, content: str = "content") -> DataFrame:
    """Cheap JVM-side metadata over binary columns: byte length + md5
    digest (no Python boundary)."""
    return df.withColumn("n_bytes", F.octet_length(content)).withColumn(
        "digest", F.md5(F.col(content))
    )


def decode_media(df: DataFrame, fake: bool = False, batch_limit: int = 256) -> DataFrame:
    """Decode binary media via mapInPandas (Arrow batches). Stubbed:
    real decode raises; ``fake=True`` derives deterministic pseudo
    dimensions from the bytes, keeping the distributed plumbing real.
    """

    def _decode(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image/audio decoding requires libs not present in this "
                    "container; pass fake=True for the deterministic stub"
                )
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.md5(bytes(content)).digest()
                out.append(
                    {
                        "media_id": int(mid),
                        "height": 1 + h[0] % 64,
                        "width": 1 + h[1] % 64,
                        "mean_luma": h[2] / 255.0,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(_decode, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
    ]
)


def resize_media(
    df: DataFrame, height: int = 32, width: int = 32, fake: bool = False
) -> DataFrame:
    """Resize plumbing via mapInPandas: binary in -> binary out with
    target dims. Stubbed like decode: real resample raises; the fake
    path emits a deterministic content digest of the requested size so
    batch shape, schema, and downstream joins are real."""

    def _resize(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resampling requires libs not present in this "
                    "container; pass fake=True for the deterministic stub"
                )
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                seed = hashlib.md5(bytes(content)).digest()
                n = height * width
                buf = (seed * (n // len(seed) + 1))[:n]
                out.append(
                    {
                        "media_id": int(mid),
                        "content": buf,
                        "height": height,
                        "width": width,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(_resize, RESIZED_SCHEMA)


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Feature-extraction plumbing: binary media -> ``array<float>``
    embedding, the bridge from multimodal columns into the similarity
    operators (``operators/similarity.py`` top-k / near-dup run
    unchanged on this output). Fake path: md5-derived unit-scale
    floats, deterministic across runs and engines."""

    def _extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "feature extraction requires model libs not present in "
                    "this container; pass fake=True for the deterministic stub"
                )
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.md5(bytes(content)).digest()
                vec = [
                    (h[i % len(h)] ^ (i * 31 & 0xFF)) / 255.0 - 0.5
                    for i in range(dim)
                ]
                out.append({"media_id": int(mid), "embedding": vec})
            yield pd.DataFrame(out, columns=[f.name for f in FEATURES_SCHEMA.fields])

    return df.select("media_id", "content").mapInPandas(_extract, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: pick every Nth media row per mime
    (stand-in for temporal sampling; the real sampler would emit
    multiple rows per video via the same mapInPandas shape)."""
    from pyspark.sql import Window

    w = Window.partitionBy("mime").orderBy("media_id")
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") - 1) % every_n == 0)
        .drop("_rn")
    )
