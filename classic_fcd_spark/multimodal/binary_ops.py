"""Binary-column operators over media tables.

Design for 100 TB of media:
- content is ONE opaque `binary` column; all filters/joins run on the
  narrow metadata columns, so parquet column pruning means a metadata
  query never reads a byte of media.
- mapInPandas streams Arrow record batches through the Python worker —
  per-batch (not per-row) overhead, bounded memory via
  spark.sql.execution.arrow.maxRecordsPerBatch.
- feature vectors come back as array<float>, ready for the
  similarity-search operators (classic_fcd_spark.operators.similarity).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), False),
        StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sig", StringType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def decode_stub(content: bytes, kind: str, deterministic_fake: bool = False):
    """Codec boundary.  Real deployments plug Pillow/torchaudio/pyav here;
    this container has none, so either fail loudly or produce a stable
    fake derived from the content hash (NOT a decode — a test double)."""
    if not deterministic_fake:
        raise NotImplementedError(
            f"no {kind} codec available in this environment; "
            "pass deterministic_fake=True for pipeline testing"
        )
    digest = hashlib.md5(content).digest()
    return {
        "luma_mean": digest[0] / 255.0,
        "luma_std": digest[1] / 255.0,
        "entropy": digest[2] / 255.0,
    }


def _feature_vec(content: bytes) -> list[float]:
    """Deterministic fake embedding: FEATURE_DIM floats from md5 bytes."""
    digest = hashlib.md5(content).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) → FEATURES_SCHEMA via mapInPandas.

    The iterator signature processes one Arrow batch at a time; content
    bytes stay inside the worker and are dropped from the output
    projection (only the narrow feature columns shuffle onward).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len).astype("int64"),
                    "sig": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "features": content.map(lambda b: _feature_vec(bytes(b))),
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample_offsets(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling *plan*: one row per sampled frame offset —
    pure Column algebra (sequence + explode), no decode needed until the
    offsets reach the (stubbed) codec step."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_offset_ms"),
        )
    )


def synthetic_media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media fixture: documents.text bytes as content, kind
    round-robin by doc_id, metadata derived from n_chars — gives the
    binary plumbing real (if fake) data at every scale factor."""
    from classic_fcd_spark.session import load_tables

    docs = load_tables(spark, sf_dir)["documents"]
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Resize (the brief's decode → transform → re-encode shape).
# ---------------------------------------------------------------------------
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("content", BinaryType(), False),
        StructField("meta", MEDIA_META),
    ]
)


def resize_stub(
    content: bytes, w: int, h: int, deterministic_fake: bool = False
) -> bytes:
    """Codec boundary for resize.  Real deployments decode with
    Pillow/pyav, resample, re-encode; this container has no codecs, so
    either fail loudly or produce a stable fake whose SIZE scales with
    the target dims (so downstream byte accounting is exercised)."""
    if not deterministic_fake:
        raise NotImplementedError(
            "no image codec available in this environment; "
            "pass deterministic_fake=True for pipeline testing"
        )
    digest = hashlib.md5(content + f":{w}x{h}".encode()).digest()
    n = max(1, (w * h) // 64)
    return (digest * (n // len(digest) + 1))[:n]


def resize_images(
    media: DataFrame, width: int, height: int, deterministic_fake: bool = True
) -> DataFrame:
    """Image resize through the mapInPandas boundary: bytes transform in
    the Arrow batch, metadata rewritten to the target dims.  Non-image
    rows pass through untouched (the transform is kind-scoped, like a
    real pipeline's per-modality stages).  Output schema == input schema,
    so resize stages compose/chain."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            content = pdf["content"].copy()
            content[is_img] = [
                resize_stub(bytes(b), width, height, deterministic_fake)
                for b in content[is_img]
            ]
            meta = []
            for m, img in zip(pdf["meta"], is_img):
                if img and m is not None:
                    m = dict(m)
                    m["width"], m["height"] = width, height
                meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": content,
                    "meta": meta,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


# ---------------------------------------------------------------------------
# Container-header sniffing — honestly implementable WITHOUT codecs:
# image dimensions and audio sample rates live in fixed-layout container
# headers (PNG IHDR, JPEG SOF markers, GIF logical screen descriptor,
# BMP info header, WAV fmt chunk), so a few bytes of arithmetic recover
# them.  This narrows the NotImplementedError boundary to actual PIXEL/
# SAMPLE decoding; format detection and geometry filtering ("drop images
# under 64px", the LAION/DataComp filter) run for real at scan speed.
# ---------------------------------------------------------------------------
SNIFF_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
    ]
)


def sniff_media_header(content: bytes):
    """(format, width, height, sample_rate) from container magic bytes —
    pure byte arithmetic per the public format specs; unknown/truncated
    content yields (None, None, None, None), never an exception."""
    none = (None, None, None, None)
    try:
        b = bytes(content or b"")
        if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
                None,
            )
        if b[:3] == b"\xff\xd8\xff":
            # walk JPEG segments to the first SOF0-SOF15 frame header
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    break
                # the spec allows any number of 0xFF fill bytes before a
                # marker — skip padding so it is not misread as a marker
                while i + 9 < len(b) and b[i + 1] == 0xFF:
                    i += 1
                marker = b[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(b[i + 2 : i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                        None,
                    )
                i += 2 + seg_len
            return ("jpeg", None, None, None)
        if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
                None,
            )
        if b[:2] == b"BM" and len(b) >= 26:
            return (
                "bmp",
                int.from_bytes(b[18:22], "little", signed=True),
                abs(int.from_bytes(b[22:26], "little", signed=True)),
                None,
            )
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE" and len(b) >= 28:
            # fmt chunk: sample rate at offset 24 when fmt is first
            if b[12:16] == b"fmt ":
                return ("wav", None, None, int.from_bytes(b[24:28], "little"))
            return ("wav", None, None, None)
        if b[:4] == b"fLaC" and len(b) >= 22:
            # METADATA_BLOCK_STREAMINFO is mandatory-first (RFC 9639
            # §8.1): 4-byte marker, 4-byte block header, then at byte
            # offset 18 the 20-bit sample rate (bits 80-99 of the block)
            if (b[4] & 0x7F) == 0:  # block type 0 = STREAMINFO
                sr = (b[18] << 12) | (b[19] << 4) | (b[20] >> 4)
                return ("flac", None, None, sr or None)
            return ("flac", None, None, None)
        if b[:4] == b"OggS" and len(b) >= 27:
            # first page payload starts after the 27-byte page header +
            # segment table; a Vorbis identification header packet is
            # "\x01vorbis" + version(4) + channels(1) + rate(4 LE)
            # (Vorbis I spec §4.2.2)
            nseg = b[26]
            off = 27 + nseg
            if b[off : off + 7] == b"\x01vorbis" and len(b) >= off + 16:
                return (
                    "ogg",
                    None,
                    None,
                    int.from_bytes(b[off + 12 : off + 16], "little") or None,
                )
            return ("ogg", None, None, None)
        if len(b) >= 12 and b[4:8] == b"ftyp":
            # ISO-BMFF (MP4/MOV): walk top-level boxes to moov, then
            # moov's children to each trak/tkhd; the track header's
            # width/height live in the box's last 8 bytes as 16.16
            # fixed-point (ISO 14496-12 §8.3.2).  Audio tracks carry
            # 0x0 — take the first non-zero geometry (the video track).
            def boxes(lo: int, hi: int):
                i = lo
                while i + 8 <= hi:
                    size = int.from_bytes(b[i : i + 4], "big")
                    typ = b[i + 4 : i + 8]
                    if size == 1:  # 64-bit largesize
                        if i + 16 > hi:
                            return
                        size = int.from_bytes(b[i + 8 : i + 16], "big")
                    if size < 8 or i + size > hi:
                        return
                    yield i, size, typ
                    i += size

            for mi, msize, mtyp in boxes(0, len(b)):
                if mtyp != b"moov":
                    continue
                for ti, tsize, ttyp in boxes(mi + 8, mi + msize):
                    if ttyp != b"trak":
                        continue
                    for hi_, hsize, htyp in boxes(ti + 8, ti + tsize):
                        if htyp != b"tkhd" or hsize < 24:
                            continue
                        w = int.from_bytes(
                            b[hi_ + hsize - 8 : hi_ + hsize - 4], "big"
                        ) >> 16
                        h = int.from_bytes(
                            b[hi_ + hsize - 4 : hi_ + hsize], "big"
                        ) >> 16
                        if w and h:
                            return ("mp4", w, h, None)
            return ("mp4", None, None, None)
        return none
    except Exception:  # noqa: BLE001 — sniffing must never fail a scan
        return none


def with_header_meta(media: DataFrame, content_col: str = "content") -> DataFrame:
    """media + a `sniffed` struct column (SNIFF_SCHEMA) via mapInPandas —
    Arrow batches, a few byte reads per row, no codec import anywhere."""
    out_schema = StructType(
        media.schema.fields + [StructField("sniffed", SNIFF_SCHEMA)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["sniffed"] = [
                dict(zip(("format", "width", "height", "sample_rate"),
                         sniff_media_header(c)))
                for c in pdf[content_col]
            ]
            yield pdf

    return media.mapInPandas(run, out_schema)
