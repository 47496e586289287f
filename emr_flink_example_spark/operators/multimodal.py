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
    """Real decoder — gated on an optional dependency not present here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires Pillow, not available in this container; "
            "use the deterministic fake decode for plumbing tests"
        ) from exc
    raise NotImplementedError("wire PIL Image.open here when the codec lib exists")


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


QUERIES = {
    "multimodal_binary_meta": q_multimodal_binary_meta,
    "multimodal_decode_mapinpandas": q_multimodal_decode_mapinpandas,
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
}
