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


#: real-decode output: intrinsic image properties + a pixel digest
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("mode", T.StringType(), True),
        T.StructField("pixel_digest", T.StringType(), True),
    ]
)


def decode_image(df: DataFrame) -> DataFrame:
    """Real image decode — requires pillow, which is NOT baked into
    this container (the import gate below turns its absence into a
    clear NotImplementedError at plan-construction time, not a worker
    crash mid-job). The Spark-side contract (Arrow ``mapInPandas``
    over binary payloads, typed output schema, per-batch iteration) is
    identical to :func:`extract_features`, which IS oracle-checked; on
    a pillow-equipped cluster this decodes each payload once per Arrow
    batch and emits intrinsic properties + a digest of the decoded
    pixel buffer (content-addressed dedup key for decoded images).
    Pinned by the pillow-gated test in tests/test_llm_ops.py, which
    runs wherever pillow exists."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires pillow, which is not installed in this "
            "environment; extract_features exercises the identical "
            "mapInPandas plumbing with a deterministic featurizer"
        ) from e

    def _decode(batches: Iterator) -> Iterator:
        import io

        import pandas as pd
        import PIL.Image

        for pdf in batches:
            widths, heights, modes, digests = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    widths.append(None)
                    heights.append(None)
                    modes.append(None)
                    digests.append(None)
                    continue
                img = PIL.Image.open(io.BytesIO(bytes(payload)))
                img.load()
                widths.append(img.width)
                heights.append(img.height)
                modes.append(img.mode)
                digests.append(hashlib.sha256(img.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": widths,
                    "height": heights,
                    "mode": modes,
                    "pixel_digest": digests,
                }
            )

    return df.mapInPandas(_decode, DECODED_SCHEMA)


#: frame sampling: fixed-width frames of the decoded stream, keeping
#: every _FRAME_STRIDE-th frame (the video-frame-sampling shape)
FRAME_LEN = 64
FRAME_STRIDE = 2

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_digest", T.StringType(), True),
        T.StructField("frame_chars", T.LongType(), True),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling over ``mapInPandas`` — the one-row-in /
    many-rows-out multimodal shape (video -> sampled frames): decode
    the opaque payload, cut the decoded stream into fixed-width
    frames, keep every ``FRAME_STRIDE``-th one with its index and
    digest.

    Row explosion happens INSIDE the Arrow batch (the Python worker
    emits a longer DataFrame than it received) — no Spark-side explode
    of anything Python computed, no per-row UDF calls. A real video
    pipeline swaps the character windows for decoded frames; the
    schema, batching, and fan-out shape are identical. Deterministic
    stand-in = char windows + SHA-256, so the whole Python path is
    oracle-checkable."""

    def _sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, digs, lens = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    continue
                stream = bytes(payload).decode("utf-8")
                n_frames = -(-len(stream) // FRAME_LEN)
                for k in range(0, n_frames, FRAME_STRIDE):
                    frame = stream[k * FRAME_LEN : (k + 1) * FRAME_LEN]
                    ids.append(aid)
                    idxs.append(k)
                    digs.append(hashlib.sha256(frame.encode("utf-8")).hexdigest())
                    lens.append(len(frame))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "frame_digest": digs,
                    "frame_chars": lens,
                }
            )

    return df.mapInPandas(_sample, FRAME_SCHEMA)


def resize_payload(df: DataFrame, factor: int) -> DataFrame:
    """Payload "resize": deterministic byte-level downsample (every
    ``factor``-th byte) as the binary->binary mapInPandas transform —
    the image-resize shape without an imaging library. The payload
    column goes in as Arrow binary and comes out as Arrow binary; a
    real pipeline swaps the subsampling lambda for PIL/libvips resize
    (see :func:`decode_image` for the environment gate) and nothing
    else changes. Pinned against a pure-Python reference in
    tests/test_llm_ops.py (no SQL oracle: neither engine slices blobs
    relationally)."""
    out_schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("n_bytes", T.LongType(), True),
        ]
    )

    def _resize(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b)[::factor] if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": resized,
                    "n_bytes": resized.map(
                        lambda b: len(b) if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(_resize, out_schema)
