"""Multimodal feature-extraction query: binary payload column +
Arrow-batched Pandas featurization, oracle-checked.

The only Pandas-UDF query in the registry — deliberately: everything
SQL-expressible stays JVM-side (see operators/multimodal.py for why
this one can't), and the oracle proves the Python path computes
exactly what the relational spec says.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import attach_binary_payload, extract_features
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
