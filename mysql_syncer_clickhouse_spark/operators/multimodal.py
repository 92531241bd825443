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

import os
import struct
import zlib
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


try:                                    # optional full codec (see _decode)
    from PIL import Image as _PIL_Image  # pragma: no cover
except ImportError:                     # this container: no PIL/ffmpeg
    _PIL_Image = None

# PIL decoding is an explicit opt-in, NOT on by mere importability:
# the registered oracle mirrors the header-parse/fake arithmetic, so an
# environment that happens to have PIL must not silently change results.
_REAL_CODEC = os.environ.get("SPARK_GRAFT_REAL_CODEC", "") == "1"

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_bmp_header(width: int, height: int) -> bytes:
    """Minimal 54-byte BMP: BITMAPFILEHEADER + BITMAPINFOHEADER,
    header-only (no pixel array) -- crawl-scale metadata extraction
    reads headers, and truncated files are the common case anyway."""
    return (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, width, height,
                          1, 24, 0, 0, 0, 0, 0, 0))


def make_png_header(width: int, height: int) -> bytes:
    """Minimal 33-byte PNG: signature + a valid IHDR chunk (real
    CRC32), 8-bit RGB."""
    chunk = b"IHDR" + struct.pack(">II", width, height) + bytes(
        [8, 2, 0, 0, 0])
    return (_PNG_SIG + struct.pack(">I", 13) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def parse_image_header(payload: bytes) -> tuple[int, int, str] | None:
    """Pure-Python image metadata from fixed header offsets -- a REAL
    decoder for the two formats whose headers need no codec library:
    PNG (IHDR width/height, big-endian at bytes 16..23) and BMP
    (int32 LE at 18/22; negative height = top-down, take abs).
    Returns (width, height, format) or None if not an image."""
    if payload[:8] == _PNG_SIG and len(payload) >= 24 \
            and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return w, h, "png"
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return abs(w), abs(h), "bmp"
    return None


def _fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """Deterministic stand-in for a real image decoder: dimensions
    derive from the byte length (stable + oracle-checkable)."""
    n = len(payload)
    return n, n % 640, (n * 7) % 480, "fake"


def _decode(payload: bytes) -> tuple[int, int, int, str]:
    """Decode image metadata, in order: (1) the pure-Python PNG/BMP
    header parse (real decoding, always on, deterministic); (2) PIL
    for other formats IF opted in via SPARK_GRAFT_REAL_CODEC=1; (3)
    the deterministic fake for non-image payloads. The Spark-side
    plumbing (Arrow batching, schema, partition parallelism) is
    identical on every path."""
    payload = bytes(payload)
    hdr = parse_image_header(payload)
    if hdr is not None:
        return (len(payload), *hdr)
    if _REAL_CODEC and _PIL_Image is not None:  # pragma: no cover
        import io
        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return (len(payload), im.width, im.height,
                        (im.format or "unknown").lower())
        except Exception:
            pass
    return _fake_decode(payload)


MIXED_SCHEMA = "doc_id long, payload binary"


def with_mixed_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture payload column exercising every decode path:
    doc_id%3==0 -> a BMP header, ==1 -> a PNG header (both with
    dimensions DERIVED FROM doc_id, so the downstream decode proves
    the header parser round-trips), ==2 -> UTF-8 text (fake path).
    Arrow-batched like the decoders; one output row per input row."""
    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                w = int(doc_id % 64 + 1)
                h = int((doc_id * 7) % 48 + 1)
                m = doc_id % 3
                if m == 0:
                    out.append(make_bmp_header(w, h))
                elif m == 1:
                    out.append(make_png_header(w, h))
                else:
                    out.append(str(text).encode("utf-8"))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": out})

    return docs.select("doc_id", text_col).mapInPandas(synth, MIXED_SCHEMA)


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
