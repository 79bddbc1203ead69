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
