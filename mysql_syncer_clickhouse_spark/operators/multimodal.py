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


try:                                    # real codec if the env has it
    from PIL import Image as _PIL_Image  # pragma: no cover
except ImportError:                     # this container: no PIL/ffmpeg
    _PIL_Image = None


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real image decoder: dimensions
    derive from the byte length (stable + oracle-checkable)."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, "fake"


def _decode(payload: bytes) -> tuple[int, int, int, str]:
    """Decode image metadata: uses PIL when the library is importable
    AND the payload parses as a real image; otherwise the deterministic
    fake. The fixture payloads are UTF-8 text, so tests always take the
    fake path -- environment-limited, documented in COVERAGE.md. The
    Spark-side plumbing (Arrow batching, schema, partition parallelism)
    is identical either way."""
    if _PIL_Image is not None:
        import io
        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return (len(payload), im.width, im.height,
                        (im.format or "unknown").lower())
        except Exception:
            pass
    return _fake_decode(payload)


def decode_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas decode: per Arrow batch, extract (n_bytes, width,
    height, format) from the binary payload via `_decode` (PIL when
    available, deterministic fake otherwise) -- the Spark-side plumbing
    (schema, batch iteration, partition parallelism) is the part under
    test."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_decode)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bytes": meta.map(lambda t: t[0]),
                "width": meta.map(lambda t: t[1]),
                "height": meta.map(lambda t: t[2]),
                "format": meta.map(lambda t: t[3]),
            })

    return df.mapInPandas(decode, DECODE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, payload binary, width int, height int"


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stub: output payload is the input truncated/zero-padded
    to width*height bytes (a real build calls PIL.Image.resize here).
    The Spark-side contract under test: binary in -> binary out through
    Arrow batches, one output row per input row."""
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(
                lambda b: bytes(b[:target]).ljust(target, b"\0"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out,
                                "width": width, "height": height})

    return df.mapInPandas(resize, RESIZE_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame binary, frame_n_bytes long"


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stub (video -> n evenly spaced frames): slices
    the payload into n equal byte ranges (a real build seeks with
    ffmpeg). Fan-out happens INSIDE the Arrow batch (n rows out per row
    in), so the operator parallelizes by input partition and never
    materializes whole videos per frame."""
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step:(i + 1) * step]))
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs, "frame": frames,
                "frame_n_bytes": [len(f) for f in frames]})

    return df.mapInPandas(sample, FRAMES_SCHEMA)


FEATURES_SCHEMA = "doc_id long, features array<double>"


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stub (payload -> embedding vector): a real
    build runs a vision/audio encoder per Arrow batch; the fake derives
    dim deterministic values from the byte length so the whole path is
    oracle-checkable."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "features": n.map(lambda ln: [
                    (ln * (j + 1)) % 997 / 997.0 for j in range(dim)]),
            })

    return df.mapInPandas(extract, FEATURES_SCHEMA)
