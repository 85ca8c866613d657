"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is a `binary`
column (or an object-store URI); decode / feature-extract / resize /
frame-sample run as Arrow-batched `mapInPandas` stages so each task
streams record batches without materializing the partition.

Decode is probed at import: when PIL is importable the image path is a
REAL decode (PIL.Image.open -> true width/height/mean luma); otherwise
a deterministic STUB (clearly marked) derives fake but stable
"features" from the bytes themselves, so the Spark-side plumbing —
schema, batch iteration, partitioning, UDF signatures — is exercised
identically in both environments (this container ships no media libs).
Both paths are unit-tested (tests/test_pipeline_ops.py: stub
determinism always; the PIL path when PIL exists).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

try:  # optional dependency probe — executors take the same path
    from PIL import Image as _PILImage  # noqa: N811

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), False),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha256", StringType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_luma", DoubleType(), False),
    ]
)


def to_media_table(documents: DataFrame) -> DataFrame:
    """Demo adapter: treat each document's UTF-8 bytes as an opaque
    payload (shape stand-in for real image/audio bytes)."""
    return documents.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def _stub_decode(payload: bytes) -> tuple[int, int, float]:
    """STUB — deterministic fake decode, used when PIL is absent (this
    container ships no media libraries by design).

    Derives stable pseudo-dimensions/luma from a sha256 of the bytes so
    tests and the driver get reproducible values."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    luma = digest[2] / 255.0
    return width, height, luma


def _pil_decode(payload: bytes) -> tuple[int, int, float]:
    """REAL image decode via PIL (used automatically when importable):
    true dimensions + mean luminance of the 8-bit grayscale conversion.
    Falls back to the stub for bytes PIL cannot parse, so mixed/corrupt
    corpora never kill the stage."""
    import io

    try:
        with _PILImage.open(io.BytesIO(payload)) as img:
            gray = img.convert("L")
            hist = gray.histogram()
            n = sum(hist) or 1
            luma = sum(i * c for i, c in enumerate(hist)) / (255.0 * n)
            return img.width, img.height, luma
    except Exception:
        return _stub_decode(payload)


def default_decoder():
    """The probed decode fn shipped to executors (PIL when available)."""
    return _pil_decode if HAVE_PIL else _stub_decode


def extract_media_features(media: DataFrame, decoder=None) -> DataFrame:
    """mapInPandas decode/feature stage — streams Arrow batches; memory
    is bounded by the batch size regardless of partition size. The
    decoder defaults to the import-probe result (real PIL decode when
    present, deterministic stub otherwise)."""
    decode = decoder or default_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": pd.Series([f[0] for f in feats], dtype="int32"),
                    "height": pd.Series([f[1] for f in feats], dtype="int32"),
                    "mean_luma": pd.Series([f[2] for f in feats], dtype="float64"),
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def media_features_oracle_checkable(documents: DataFrame) -> DataFrame:
    """The SQL-checkable projection of the pipeline: n_bytes + sha256
    are decode-independent invariants DuckDB can verify; the fake_*
    features are covered by the rows-only check + pytest determinism."""
    out = extract_media_features(to_media_table(documents))
    return out.select("doc_id", "n_bytes", "payload_sha256")


FRAME_SIZE = 256  # fake container: fixed-size frame records


def resize_stub(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """Resize stage PLUMBING: payload -> payload' with new dimensions.

    STUB decode/re-encode (no media libs in this container): the
    "resized" payload is a deterministic digest-expansion of the
    original bytes sized target_w*target_h (a real deployment swaps the
    body for PIL resize + re-encode; the mapInPandas batch shape,
    schema, and determinism contract are what this stage pins down)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h
        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for p in pdf["payload"]:
                raw = bytes(p)
                buf = bytearray()
                counter = 0
                while len(buf) < n_out:  # deterministic byte expansion
                    buf += hashlib.sha256(raw + counter.to_bytes(4, "big")).digest()
                    counter += 1
                out.append(bytes(buf[:n_out]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "payload": out,
                }
            )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("media_type", StringType(), False),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )
    return media.mapInPandas(run, schema)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_no", IntegerType(), False),
        StructField("frame_offset", LongType(), False),
        StructField("frame_len", LongType(), False),
        StructField("frame_sha256", StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame, every_n: int = 4, frame_size: int = FRAME_SIZE
) -> DataFrame:
    """Frame-sampling PLUMBING (video shape): treat the payload as a
    container of fixed-size frame records and emit every ``every_n``-th
    frame — the 1->N mapInPandas explode with memory bounded by the
    Arrow batch, never the video length. Offsets/lengths are pure
    arithmetic (SQL-oracle-checkable); the frame payload digest stands
    in for the decoded frame tensor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            doc_ids, frame_nos, offsets, lens, shas = [], [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(p)
                n_frames = (len(raw) + frame_size - 1) // frame_size
                for i in range(0, n_frames, every_n):
                    off = i * frame_size
                    chunk = raw[off : off + frame_size]
                    doc_ids.append(int(doc_id))
                    frame_nos.append(i)
                    offsets.append(off)
                    lens.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "frame_no": pd.Series(frame_nos, dtype="int32"),
                    "frame_offset": pd.Series(offsets, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "frame_sha256": shas,
                }
            )

    return media.mapInPandas(run, FRAMES_SCHEMA)


def frame_sample_sql(every_n: int = 4, frame_size: int = FRAME_SIZE) -> str:
    """DuckDB twin of sample_frames' arithmetic projection over the
    documents-as-media adapter (frame digests are UDF-side only)."""
    return f"""
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id, CAST(i AS INT) AS frame_no,
       CAST(i * {frame_size} AS BIGINT) AS frame_offset,
       CAST(least({frame_size}, n - i * {frame_size}) AS BIGINT) AS frame_len
FROM b, unnest(range(0, CAST(ceil(n / {frame_size}.0) AS BIGINT), {every_n})) AS t(i)
"""
