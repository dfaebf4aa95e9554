"""Multimodal declared query: binary-column decode plumbing via
mapInPandas, oracle-checked because the stub decoder is deterministic
byte-length arithmetic (see functions/multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from home_credit_data_engineering_spark.functions.multimodal import (
    decode_stub,
    with_binary_payload,
)
from home_credit_data_engineering_spark.plans.registry import register
from home_credit_data_engineering_spark.sources.readers import read_testdata


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(64 + octet_length(encode(text)) % 576 AS BIGINT) AS width,
           CAST(48 + octet_length(encode(text)) % 432 AS BIGINT) AS height,
           CAST(1 + octet_length(encode(text)) % 8 AS BIGINT) AS n_frames
    FROM documents
    """,
    operators=("M-ext:decode",),
    doc="Binary-column decode plumbing: text → UTF-8 binary payload → "
    "Arrow-batched mapInPandas 'decoder' emitting typed metadata. The "
    "decode itself is a deterministic stub (codecs absent here); the "
    "schema/batching/partitioning path is the real thing.",
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_testdata(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs, "text")
    return decode_stub(payloads, "doc_id", "payload")
