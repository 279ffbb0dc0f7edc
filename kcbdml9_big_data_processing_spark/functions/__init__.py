"""Reusable Column-expression builders (all JVM-side, codegen-friendly)."""

from .exact import (
    bucket_start,
    bucket_start_sql,
    davg,
    davg_sql,
    dsum,
    dsum_sql,
    epoch_micros,
    epoch_millis,
)

__all__ = [
    "dsum",
    "davg",
    "dsum_sql",
    "davg_sql",
    "bucket_start",
    "bucket_start_sql",
    "epoch_millis",
    "epoch_micros",
]
