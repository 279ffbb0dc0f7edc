"""Reusable Column-expression builders (all JVM-side, codegen-friendly)."""

from .exact import dsum, davg, dsum_sql, davg_sql, bucket_start, bucket_start_sql

__all__ = ["dsum", "davg", "dsum_sql", "davg_sql", "bucket_start", "bucket_start_sql"]
