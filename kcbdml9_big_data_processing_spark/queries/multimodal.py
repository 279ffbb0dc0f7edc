"""Multimodal feature-extraction query: binary payload column +
Arrow-batched Pandas featurization, oracle-checked.

The only Pandas-UDF query in the registry — deliberately: everything
SQL-expressible stays JVM-side (see operators/multimodal.py for why
this one can't), and the oracle proves the Python path computes
exactly what the relational spec says.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import (
    attach_binary_payload,
    extract_features,
    sample_frames,
)
from ..sources.parquet import read_table
from .registry import register


@register(
    "multimodal_features",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS digest,
               CAST((octet_length(encode(text)) % 640) + 1 AS BIGINT) AS width,
               CAST((octet_length(encode(text)) % 480) + 1 AS BIGINT) AS height
        FROM documents
    """,
    prepare=True,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset featurization: documents.text UTF-8-encoded as the
    opaque payload (the stand-in for image bytes), features extracted
    in mapInPandas (Arrow batches, one Python worker per partition).
    Deterministic featurizer = SHA-256 + length-derived fields, so
    DuckDB can verify the whole Python path."""
    docs = read_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(docs, "doc_id", "text", "source")
    return extract_features(assets)


@register(
    "multimodal_frame_sample",
    oracle="""
        SELECT doc_id AS asset_id,
               CAST(u.k AS BIGINT) AS frame_idx,
               sha256(substring(text, CAST(u.k * 64 + 1 AS BIGINT), 64))
                   AS frame_digest,
               CAST(length(substring(text, CAST(u.k * 64 + 1 AS BIGINT), 64))
                   AS BIGINT) AS frame_chars
        FROM documents,
             unnest(generate_series(
                 0, CAST(ceil(length(text) / 64.0) AS BIGINT) - 1)) u(k)
        WHERE u.k % 2 = 0
    """,
    prepare=True,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (the video shape): decode each asset's payload,
    cut into 64-char frames, keep every 2nd, digest each kept frame —
    a one-row-in / many-rows-out mapInPandas where the fan-out happens
    inside the Arrow batch. The oracle re-derives every kept frame
    relationally, so the Python decode+slice+digest path is
    value-hash-checked end to end."""
    docs = read_table(spark, sf_dir, "documents")
    assets = attach_binary_payload(docs, "doc_id", "text", "source")
    return sample_frames(assets)
