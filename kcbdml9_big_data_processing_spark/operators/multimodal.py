"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with feature extraction as Arrow-batched Pandas functions
over ``mapInPandas``.

North-star extension (the reference has no binary surface). The
design for 100 TB of images/audio/video:

- the payload is an opaque ``binary`` column; Spark shuffles/stores it
  like any other column — no special casing, and parquet keeps it
  columnar with metadata-only row-group skipping on the typed fields.
- decode / resize / frame-sample run inside ``mapInPandas``: one
  Python worker per partition, Arrow batches in/out, so the per-row
  Python overhead is amortized across the batch (the 10-100x
  difference vs row-at-a-time UDFs).
- this container has no image/audio libraries, so the real decoder is
  gated behind an import-try (``decode_image``); the deterministic
  feature extractor below exercises the identical plumbing — schema,
  batch shape, Arrow round-trip — and is what tests/oracles check.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal asset schema: payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ]
)

#: output schema of extract_features (declared up front — mapInPandas
#: requires an explicit schema; schema drift fails fast at plan time)
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, source_col: str
) -> DataFrame:
    """Build the canonical asset frame from a text table (the testdata
    stand-in for real image bytes: UTF-8-encoded text as the opaque
    payload). Column-level ops only — stays in codegen."""
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.col(source_col).alias("source"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic per-asset features via mapInPandas.

    The "decode" is a deterministic fake (byte length, SHA-256,
    pseudo width/height from the byte length) so the Arrow plumbing is
    real and testable without image libraries; swap ``_featurize`` for
    a real decoder (see :func:`decode_image`) in a full environment.
    """

    def _featurize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "digest": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    # deterministic fake dimensions from the length
                    "width": payloads.map(
                        lambda b: (len(b) % 640) + 1 if b is not None else None
                    ),
                    "height": payloads.map(
                        lambda b: (len(b) % 480) + 1 if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(_featurize, FEATURE_SCHEMA)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — requires an imaging library that is NOT in
    this container; the Spark-side contract (signature, schema,
    batching) is identical to :func:`extract_features`."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow, which is not installed in this "
            "environment; extract_features exercises the identical "
            "mapInPandas plumbing with a deterministic featurizer"
        ) from e
    raise NotImplementedError("wire a real decoder here when pillow is available")
