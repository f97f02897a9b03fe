"""Multimodal column convention (SURVEY.md L5): image/audio/video payloads
travel as an opaque ``binary`` column plus a typed metadata struct; decode /
feature-extraction runs as Arrow-batched ``mapInPandas``.

The decode step itself is a DETERMINISTIC FAKE (this environment ships no
image/audio codecs — see the round brief): it derives pseudo-features from
the raw bytes. The Spark-side plumbing — schema, batch iteration, partition
behavior, UDF signature — is real and is what the tests exercise. Swapping
in PIL/torchaudio means replacing ``_fake_decode_batch`` only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the engine-wide media column convention
MEDIA_SCHEMA = StructType(
    [
        StructField("data", BinaryType(), nullable=False),
        StructField("mime", StringType(), nullable=False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("n_bytes", LongType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", mime: str = "image/fake") -> DataFrame:
    """Wrap a column's UTF-8 bytes as a media struct (deterministic payload
    stand-in for real image/audio bytes)."""
    data = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.length(data).cast("long").alias("n_bytes"),
        (F.length(data) % 640).cast("int").alias("width"),
        (F.length(data) % 480).cast("int").alias("height"),
    )
    return df.withColumn(
        "media", F.struct(data.alias("data"), F.lit(mime).alias("mime"), meta.alias("meta"))
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: 'decodes' dimensions and a byte
    checksum from the payload. Replace with a real decoder in production.

    NULL payloads (a doc with no media) decode to NULL metadata — one null
    row anywhere in the corpus must not kill the whole decode job."""
    payloads = pdf["data"]
    n_bytes = payloads.map(lambda b: len(b) if b is not None else None)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("Int64"),
            "width": (n_bytes % 640).astype("Int32"),
            "height": (n_bytes % 480).astype("Int32"),
            "checksum": payloads.map(
                lambda b: sum(b[:64]) % 1_000_000_007 if b is not None else None
            ).astype("Int64"),
        }
    )


def decode_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode over the media convention: mapInPandas keeps the
    payload off the driver and processes whole record batches per task."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col("media.data").alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _fake_decode_batch(pdf)

    return src.mapInPandas(run, schema=DECODED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_id", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Video-style frame sampling over the media convention: each payload
    splits into ``n_frames`` contiguous byte ranges ("frames"), one output
    row per frame — a 1->N Arrow batch expansion, the shape a real
    frame-extractor (ffmpeg/decord) produces. The fake extractor is
    deterministic byte slicing + md5, so the whole Python path gets a full
    oracle; payload bytes never leave the executors."""
    import hashlib

    src = df.select(F.col(id_col).alias("doc_id"), F.col("media.data").alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, fids, sizes, digests = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["data"]):
                # a NULL id or media-less doc yields no frames, not a
                # crash: Arrow hands a nullable long column to pandas as
                # float64 with NaN, and appending that NaN would blow up
                # the int64 Series below (the one-null-row-kills-the-job
                # failure decode_media already guards against)
                if payload is None or pd.isna(doc_id):
                    continue
                n = len(payload)
                for k in range(n_frames):
                    lo, hi = k * n // n_frames, (k + 1) * n // n_frames
                    frame = payload[lo:hi]
                    ids.append(int(doc_id))
                    fids.append(k)
                    sizes.append(len(frame))
                    digests.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_id": pd.Series(fids, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_md5": digests,
                }
            )

    return src.mapInPandas(run, schema=FRAME_SCHEMA)
