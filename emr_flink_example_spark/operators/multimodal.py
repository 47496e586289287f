"""Multimodal column plumbing (SURVEY.md §2 Part C).

Image/audio/video payloads are opaque `binary` columns with typed metadata.
The container has no codec libraries, so actual decoding is stubbed
(`decode_image_real` raises NotImplementedError unless PIL is importable);
what IS real and tested is everything Spark-side: the binary schema, Arrow
batch transfer, the `mapInPandas` iterator contract, and the deterministic
fake "decode" used to validate the plumbing end-to-end against the oracle.

At 100 TB the binary payloads dominate the scan; the pattern is:
read binaryFile/parquet -> repartition by size budget -> mapInPandas decode
(Arrow-batched, one python worker per core) -> write features columnar.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load

META_SCHEMA = "doc_id bigint, byte_len bigint, width int, height int, format string"


def decode_image_real(payload: bytes) -> dict:
    """Real decoder, gated on an optional dependency. This sandbox has no
    Pillow and installs are prohibited (constraint recorded in SURVEY §7
    "Hard parts" item 0), so here the ImportError branch is the only one
    that ever runs; the decode path below is complete and is exercised by
    tests/test_multimodal_real.py wherever Pillow IS installed (it
    pytest-skips otherwise). Returns the same schema as
    `fake_decode_batch` rows, so swapping kernels changes no plumbing."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires Pillow, not available in this container; "
            "use the deterministic fake decode for plumbing tests"
        ) from exc
    import io as _io

    with Image.open(_io.BytesIO(payload)) as im:  # pragma: no cover - needs PIL
        return {
            "byte_len": len(payload),
            "width": im.width,
            "height": im.height,
            "format": (im.format or "").lower(),
        }


def fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: metadata derived arithmetically from the
    payload length, so the oracle can verify the full Arrow round-trip."""
    byte_len = pdf["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": byte_len,
            "width": (byte_len % 640 + 1).astype("int32"),
            "height": (byte_len * 7 % 480 + 1).astype("int32"),
            "format": "fake",
        }
    )


def extract_image_meta(df: DataFrame) -> DataFrame:
    """mapInPandas over (doc_id, payload binary) -> typed metadata rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield fake_decode_batch(pdf)

    return df.mapInPandas(run, schema=META_SCHEMA)


def q_multimodal_binary_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Binary-column metadata, pure-JVM path: utf-8 payload bytes, lengths,
    magic-prefix hex — the non-UDF half of the multimodal surface."""
    docs = load(spark, sf, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.length("text").alias("char_len"),
        F.upper(F.hex(F.encode(F.substring("text", 1, 4), "utf-8"))).alias("magic_hex"),
    )


def q_multimodal_decode_mapinpandas(spark: SparkSession, sf: str) -> DataFrame:
    """The Arrow/mapInPandas decode pipeline over synthesized binary payloads."""
    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return extract_image_meta(docs)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, new_w int, new_h int, resized_len bigint"
MAX_W, MAX_H = 320, 240

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"
FRAME_STRIDE = 4


def resize_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake resize: crop-to-fit bounds, payload shrunk
    proportionally — the real PIL/opencv kernel drops in here unchanged."""
    meta = fake_decode_batch(pdf)
    new_w = meta["width"].clip(upper=MAX_W)
    new_h = meta["height"].clip(upper=MAX_H)
    return pd.DataFrame(
        {
            "doc_id": meta["doc_id"],
            "width": meta["width"],
            "height": meta["height"],
            "new_w": new_w.astype("int32"),
            "new_h": new_h.astype("int32"),
            "resized_len": (new_w.astype("int64") * new_h // 16),
        }
    )


def q_multimodal_resize(spark: SparkSession, sf: str) -> DataFrame:
    """decode -> resize fused in ONE mapInPandas pass (one Arrow round-trip,
    one Python worker pipeline — never two chained UDF stages)."""
    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield resize_batch(pdf)

    return docs.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake frame sampler: frame count derived from payload
    length, every FRAME_STRIDE-th frame emitted with a content-addressed
    hash — 1 video row -> N frame rows (generator-style expansion)."""
    import hashlib

    out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_hash": []}
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        n_frames = len(payload) % 24 + 1
        hx = payload.hex().upper()
        for idx in range(0, n_frames, FRAME_STRIDE):
            out["doc_id"].append(doc_id)
            out["frame_idx"].append(idx)
            out["frame_hash"].append(hashlib.md5(f"{hx}-{idx}".encode()).hexdigest())
    return pd.DataFrame(out)


def q_multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Video frame-sampling plumbing: binary payload -> sampled frame rows.

    The expansion happens inside mapInPandas (no explode of a
    python-materialized array column), so peak memory per task is one Arrow
    batch of payloads plus its sampled frames — at 100 TB tune
    `maxRecordsPerBatch` down so payload batches fit the worker."""
    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield sample_frames_batch(pdf)

    return docs.mapInPandas(run, schema=FRAME_SCHEMA)


#: audio framing: window length / hop in samples (one byte = one fake sample)
AUDIO_WIN = 64
AUDIO_HOP = 32

AUDIO_SCHEMA = "doc_id bigint, win_idx int, n_samples int, energy bigint"


def audio_windows_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake audio featurizer: the payload's bytes act as the
    waveform (one byte = one sample, centered at 128); overlapping
    AUDIO_WIN-sample windows at AUDIO_HOP, each reduced to an INTEGER
    energy (sum of squared centered samples) — integer so the value is
    order-independent and engine-exact."""
    out: dict[str, list] = {"doc_id": [], "win_idx": [], "n_samples": [], "energy": []}
    for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
        samples = [b - 128 for b in payload]
        n = len(samples)
        idx = 0
        start = 0
        while start < n:
            win = samples[start : start + AUDIO_WIN]
            out["doc_id"].append(doc_id)
            out["win_idx"].append(idx)
            out["n_samples"].append(len(win))
            out["energy"].append(sum(s * s for s in win))
            idx += 1
            start += AUDIO_HOP
    return pd.DataFrame(out)


def q_multimodal_audio_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Audio featurization plumbing: binary waveform -> overlapping frame
    windows with per-window energy, completing the image (decode/resize) /
    video (frame sample) / AUDIO trio.

    Same scale shape as the other mapInPandas kernels: the 1->N window
    expansion happens inside the Python worker per Arrow batch (no
    driver-side arrays, no explode of a Python-materialized column); real
    deployments swap the byte-waveform stand-in for an actual audio decode
    behind the identical schema and batching."""
    docs = load(spark, sf, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield audio_windows_batch(pdf)

    return docs.mapInPandas(run, schema=AUDIO_SCHEMA)


QUERIES = {
    "multimodal_binary_meta": q_multimodal_binary_meta,
    "multimodal_decode_mapinpandas": q_multimodal_decode_mapinpandas,
    "multimodal_resize": q_multimodal_resize,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    # appended last (new r5 surface) so the existing driver-checked prefix
    # composition shifts as little as possible
    "multimodal_audio_windows": q_multimodal_audio_windows,
}

ORACLES = {
    "multimodal_binary_meta": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               length(text) AS char_len,
               upper(hex(encode(substr(text, 1, 4)))) AS magic_hex
        FROM documents
    """,
    "multimodal_decode_mapinpandas": """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               (octet_length(encode(text)) % 640 + 1)::INT AS width,
               (octet_length(encode(text)) * 7 % 480 + 1)::INT AS height,
               'fake' AS format
        FROM documents
    """,
    "multimodal_resize": f"""
        WITH meta AS (
            SELECT doc_id,
                   (octet_length(encode(text)) % 640 + 1)::INT AS width,
                   (octet_length(encode(text)) * 7 % 480 + 1)::INT AS height
            FROM documents
        )
        SELECT doc_id, width, height,
               least(width, {MAX_W})::INT AS new_w,
               least(height, {MAX_H})::INT AS new_h,
               (least(width, {MAX_W})::BIGINT * least(height, {MAX_H}) // 16) AS resized_len
        FROM meta
    """,
    "multimodal_audio_windows": f"""
        WITH wave AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM documents
        ), wins AS (
            SELECT doc_id, hx, n,
                   unnest(generate_series(0, greatest(n - 1, 0), {AUDIO_HOP})) AS start
            FROM wave
        )
        SELECT doc_id,
               (start // {AUDIO_HOP})::INT AS win_idx,
               least({AUDIO_WIN}, n - start)::INT AS n_samples,
               list_sum(list_transform(
                   generate_series(start + 1, least(start + {AUDIO_WIN}, n)),
                   i -> (('0x' || substr(hx, 2 * i - 1, 2))::BIGINT - 128)
                        * (('0x' || substr(hx, 2 * i - 1, 2))::BIGINT - 128)))::BIGINT
                   AS energy
        FROM wins
    """,
    "multimodal_frame_sample": f"""
        WITH v AS (
            SELECT doc_id, hex(encode(text)) AS hx,
                   octet_length(encode(text)) % 24 + 1 AS n_frames
            FROM documents
        )
        SELECT doc_id, idx::INT AS frame_idx,
               md5(hx || '-' || idx::VARCHAR) AS frame_hash
        FROM v, unnest(generate_series(0, n_frames - 1, {FRAME_STRIDE})) AS t(idx)
    """,
}
