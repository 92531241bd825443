"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas
iterators (`mapInPandas`) -- the real distribution/batching machinery,
with the codec itself stubbed (no image/audio libraries in this
container; see `decode_image_meta`).

At scale the pattern is: keep blobs in their own column, partition by a
content key, and run decode/feature-extraction as mapInPandas so each
task streams Arrow batches instead of per-row Python calls.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = ("doc_id long, n_bytes long, width int, height int, "
                 "format string")


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Model a multimodal table: text encoded to a binary payload
    column (stand-in for image/audio bytes) + metadata."""
    return docs.select("doc_id",
                       F.encode(F.col(text_col), "UTF-8").alias("payload"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real image decoder. A production
    build would call PIL/ffmpeg here; this container has neither, so
    dimensions derive from the byte length (stable + testable)."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, "fake"


def decode_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas decode: per Arrow batch, extract (n_bytes, width,
    height, format) from the binary payload. Swap `_fake_decode` for a
    real codec to productionize -- the Spark-side plumbing (schema,
    batch iteration, partition parallelism) is the part under test."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": meta.map(lambda t: t[0]),
                "width": meta.map(lambda t: t[1]),
                "height": meta.map(lambda t: t[2]),
                "format": meta.map(lambda t: t[3]),
            })

    return df.mapInPandas(decode, DECODE_SCHEMA)
