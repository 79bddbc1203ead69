"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested - schema contracts, Arrow batch
shapes, partition-size control for fat binary rows, mapInPandas UDF
signatures. The actual codec work (image decode, resampling, frame
sampling) is STUBBED behind `_decode_*` with deterministic fakes, because
no image/audio libraries exist in this container; swap the stub body for
PIL/librosa/pyav on a real cluster - the Spark plumbing does not change.

Partitioning note for 100 TB of binaries: rows are huge (MBs), so the knob
that matters is `spark.sql.files.maxPartitionBytes` (keep partitions ~128-
256 MB) and `maxRecordsPerBatch` for Arrow transfer; `repartition_for_blobs`
caps records per task so a single executor never materializes more than
`target_rows_per_partition` blobs at once.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

IMAGE_META_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha256", StringType()),
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("feature", ArrayType(FloatType())),
])


def parse_image_header(data: bytes) -> tuple[str, int, int] | None:
    """REAL header-only dimension extraction for PNG / JPEG / GIF using
    nothing but stdlib struct - no pixel decode, no image library.

    * PNG: the IHDR chunk is mandatory and first (RFC 2083): width/height
      are big-endian uint32 at byte offsets 16/20.
    * JPEG: walk the marker segments; the SOFn frame header (C0-CF minus
      C4/C8/CC) carries [precision u8][height u16][width u16] after the
      2-byte segment length.
    * GIF: logical screen width/height are little-endian uint16 at 6/8.

    Returns (format, width, height) or None when the blob is not one of
    these formats / is truncated before its header completes."""
    if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n" \
            and data[12:16] == b"IHDR":
        w, h = struct.unpack(">II", data[16:24])
        return "png", int(w), int(h)
    if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", data[6:10])
        return "gif", int(w), int(h)
    if len(data) >= 4 and data[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                return None  # marker desync: corrupt stream
            marker = data[i + 1]
            if marker == 0xFF:  # fill bytes before a marker
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if i + 4 > len(data):
                return None
            seglen = struct.unpack(">H", data[i + 2:i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(data):
                    return None
                h, w = struct.unpack(">HH", data[i + 5:i + 9])
                return "jpeg", int(w), int(h)
            if marker == 0xDA:  # entropy-coded data starts: no SOF seen
                return None
            i += 2 + seglen
        return None
    return None


def _decode_image_stub(data: bytes) -> tuple[str, int, int]:
    """PNG/JPEG/GIF dimensions are REAL (header-parsed, stdlib-only; see
    parse_image_header). Everything else - and truncated/corrupt headers -
    falls back to the declared deterministic fake (sniffed format + digest-
    derived dims), standing in for a full decoder (PIL etc., not in this
    container)."""
    real = parse_image_header(data)
    if real is not None:
        return real
    if data[:3] == b"\xff\xd8\xff":
        fmt = "jpeg"
    elif data[:8] == b"\x89PNG\r\n\x1a\n":
        fmt = "png"
    else:
        fmt = "unknown"
    d = hashlib.sha256(data).digest()
    w = 16 + (struct.unpack(">H", d[0:2])[0] % 2048)
    h = 16 + (struct.unpack(">H", d[2:4])[0] % 2048)
    return fmt, w, h


def _extract_feature_stub(data: bytes, dim: int = 8) -> list[float]:
    """STUB for an embedding model: deterministic digest-derived vector,
    unit-normalized (so downstream cosine ops behave like real features).
    The digest chain extends for dim > 16 (one sha256 supplies 16 int16
    values; review fix: larger advertised dims crashed struct.unpack)."""
    d = hashlib.sha256(b"feat:" + data).digest()
    while len(d) < 2 * dim:
        d += hashlib.sha256(d).digest()
    vals = [struct.unpack(">h", d[2 * i:2 * i + 2])[0] / 32768.0
            for i in range(dim)]
    norm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [float(v / norm) for v in vals]


def image_metadata(pages: DataFrame, binary_col: str = "html",
                   url_col: str = "url", feature_dim: int = 8) -> DataFrame:
    """Decode/extract over a binary column via mapInPandas (Arrow batches of
    raw bytes; per-batch loop is over blobs, not pixels - the codec call is
    the vectorized unit)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in IMAGE_META_SCHEMA.fields}
            for url, blob in zip(pdf[url_col], pdf[binary_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                fmt, w, h = _decode_image_stub(data)
                out["url"].append(url)
                out["n_bytes"].append(len(data))
                out["sha256"].append(hashlib.sha256(data).hexdigest())
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(_extract_feature_stub(data, feature_dim))
            if out["url"]:  # empty frames infer wrong dtypes for Arrow
                yield pd.DataFrame(out)

    return pages.select(url_col, binary_col).mapInPandas(gen, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("format", StringType()),
    StructField("src_width", IntegerType()),
    StructField("src_height", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("resized", BinaryType()),
])


def _resize_stub(data: bytes, width: int, height: int) -> bytes:
    """STUB for a pixel resampler. Real path (PIL) is import-gated - the
    library is absent in this container, so the fake produces a
    deterministic digest-derived payload of the REAL output size
    (width * height * 3 RGB bytes), keeping downstream batch shapes,
    memory math and Arrow transfer honest."""
    try:  # pragma: no cover - PIL not installed in-sandbox
        import io

        from PIL import Image
        img = Image.open(io.BytesIO(data)).convert("RGB")
        return img.resize((width, height)).tobytes()
    except ImportError:
        seed = hashlib.sha256(b"resize:%d:%d:" % (width, height) + data)
        out, chunk = bytearray(), seed.digest()
        need = width * height * 3
        while len(out) < need:
            out.extend(chunk)
            chunk = hashlib.sha256(chunk).digest()
        return bytes(out[:need])


def resize_images(pages: DataFrame, width: int, height: int,
                  binary_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Resize plumbing over a binary image column (the decode -> resample
    -> re-encode stage of a multimodal training pipeline): mapInPandas
    over Arrow batches of blobs, one output row per decodable input,
    dimensions from the REAL header parse, pixels from the import-gated
    resampler (`_resize_stub` - PIL when present, deterministic fake
    here). Rows whose header cannot be parsed are dropped (they belong to
    the binary_stats quarantine path). Output rows are width*height*3
    bytes each - size the input with repartition_for_blobs so a task
    holds at most target_rows_per_partition resized blobs."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in RESIZED_SCHEMA.fields}
            for url, blob in zip(pdf[url_col], pdf[binary_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                hdr = parse_image_header(data)
                if hdr is None:
                    continue
                fmt, sw, sh = hdr
                out["url"].append(url)
                out["format"].append(fmt)
                out["src_width"].append(sw)
                out["src_height"].append(sh)
                out["width"].append(width)
                out["height"].append(height)
                out["resized"].append(_resize_stub(data, width, height))
            if out["url"]:  # empty frames infer wrong dtypes for Arrow
                yield pd.DataFrame(out)

    return pages.select(url_col, binary_col).mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("frame_ix", IntegerType()),
    StructField("frame", BinaryType()),
])


def _frame_count_stub(data: bytes) -> int:
    """STUB for container demuxing (pyav): deterministic digest-derived
    frame count in [8, 256)."""
    try:  # pragma: no cover - pyav not installed in-sandbox
        import io

        import av
        with av.open(io.BytesIO(data)) as c:
            return c.streams.video[0].frames
    except ImportError:
        d = hashlib.sha256(b"frames:" + data).digest()
        return 8 + (struct.unpack(">H", d[0:2])[0] % 248)


def sample_media_frames(pages: DataFrame, every_n: int = 10,
                        binary_col: str = "html",
                        url_col: str = "url",
                        max_frames: int = 32) -> DataFrame:
    """Frame-sampling plumbing for video/audio blobs: one output row per
    sampled frame (frame_ix = 0, every_n, 2*every_n, ... capped at
    max_frames rows per blob - the cap bounds the fan-out so one long
    video cannot blow up a task's output). Demux/decode is import-gated
    (`_frame_count_stub`; pyav when present, deterministic fake frame
    payloads here - 64 digest bytes standing in for an encoded frame).
    The row-per-frame shape is what downstream per-frame feature
    extraction joins against."""
    assert every_n >= 1 and max_frames >= 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in FRAME_SCHEMA.fields}
            for url, blob in zip(pdf[url_col], pdf[binary_col]):
                if blob is None:
                    continue
                data = bytes(blob)
                n_frames = _frame_count_stub(data)
                taken = 0
                for ix in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    payload = hashlib.sha256(
                        b"frame:%d:" % ix + data).digest()
                    out["url"].append(url)
                    out["frame_ix"].append(ix)
                    out["frame"].append(payload + payload)
                    taken += 1
            if out["url"]:  # empty frames infer wrong dtypes for Arrow
                yield pd.DataFrame(out)

    return pages.select(url_col, binary_col).mapInPandas(gen, FRAME_SCHEMA)


def repartition_for_blobs(df: DataFrame, target_rows_per_partition: int = 64,
                          approx_total: int | None = None) -> DataFrame:
    """Cap blobs per task so executor memory is bounded by
    target_rows_per_partition x blob size, not by input split size.

    ALWAYS pass `approx_total` at scale (row-group counts from the table's
    metadata, a frontier counter, ...): the fallback is a count() job -
    metadata-only on plain parquet scans, but a full pass over any computed
    input."""
    total = approx_total if approx_total is not None else df.count()
    n = max(1, (total + target_rows_per_partition - 1)
            // target_rows_per_partition)
    return df.repartition(n)


def binary_stats(pages: DataFrame, binary_col: str = "html",
                 url_col: str = "url") -> DataFrame:
    """JVM-only pass over binary columns (no Python): sizes + digests -
    the cheap pre-filter before any decode stage. url_col parameterized
    for API parity with image_metadata (review fix)."""
    return pages.select(
        F.col(url_col),
        F.length(F.col(binary_col)).alias("n_bytes"),
        F.sha2(F.col(binary_col), 256).alias("sha256"),
    ).filter(F.col("n_bytes").isNotNull())
