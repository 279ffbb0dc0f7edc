"""Corpus ingestion: raw text on disk -> ``documents``-shaped frames.

The engine's whole LLM-pipeline surface (dedup, curation, quality
models, text analysis) operates on the five-column ``documents``
schema ``(doc_id, text, lang, source, n_chars)``; these readers are
the front door that gets a raw crawl there declaratively — one
document per text file, or JSON-lines with a malformed-record policy.
No reference counterpart (the reference ingests device metrics, not
corpora); this is a north-star extension alongside
operators/sampling.py.

Scale notes (100 TB): JSONL is the preferred shape — line-splittable,
so Spark parallelizes WITHIN files and `maxPartitionBytes` governs
task sizing. `wholetext` ingestion necessarily makes one row per
file (a file is the document), so parallelism == file count and a
single multi-GB file is one task — shard huge raw files upstream or
use JSONL. Both readers are scan-only: no shuffle, no Python rows,
ids derived per-row from the portable first-48-bits-of-sha256 recipe
(operators/sampling._bucket) so re-ingestion, retries, and AQE
re-plans produce identical ids on any cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the engine-wide documents schema (TESTDATA.md)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _h48(col: Column) -> Column:
    """First 48 bits of sha256 as a positive long — the portable id
    hash (same formula as operators/sampling._bucket, unreduced)."""
    return F.conv(F.substring(F.sha2(col, 256), 1, 12), 16, 10).cast("long")


def ingest_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """One document per text file under ``path`` (``wholetext``): the
    file's full content is ``text``, its path is ``source``, and
    ``doc_id`` is the 48-bit sha256 of the path — stable across
    re-ingestions and portable across engines (collision odds at 48
    bits are ~n²/2⁴⁹: negligible below ~10M files; dedup downstream
    keys on content, not on these ids). ``lang`` is left null — run
    the language_id scorer downstream if needed; ``n_chars`` is
    computed. Returns the frame in the ``documents`` schema (same
    names/types; path and length are provably non-null), so every
    operator in the engine consumes it directly. Zero-byte files yield
    NO row (Spark's text source emits nothing for them) — an empty
    file carries no document, and the quality gate would drop the
    empty string anyway; pinned in tests/test_corpus_ingest.py."""
    raw = spark.read.text(path, wholetext=True)
    return raw.select(
        _h48(F.input_file_name()).alias("doc_id"),
        F.col("value").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.input_file_name().alias("source"),
        F.length("value").cast("long").alias("n_chars"),
    )


def ingest_jsonl(
    spark: SparkSession,
    path: str,
    cleanup: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines ingestion with an explicit malformed-record policy:
    returns ``(docs, rejects)`` where ``docs`` is ``documents``-shaped
    and ``rejects`` carries each unparseable line verbatim for
    quarantine (PERMISSIVE capture via ``columnNameOfCorruptRecord``
    — at 100 TB silently dropping dirty lines is how a corpus loses
    an unknown slice of itself; the reject frame makes the loss
    measurable and re-driable).

    Field policy: ``text`` is required (a parsed line without it is a
    reject); ``doc_id`` defaults to the 48-bit sha256 of the text,
    ``n_chars`` to ``length(text)``; ``lang``/``source`` default null.
    The schema is pinned, never inferred — inference is an extra full
    scan and nondeterministic under dirty data.

    Spark refuses to filter on the corrupt column of an un-materialized
    scan (internal-column restriction), so the parsed frame is
    persisted — one scan serves both outputs. Pass ``cleanup`` to
    receive it for release (the repo's standard cache-handover
    convention); without it the parse is materialized immediately and
    stays cached until the caller clears it."""
    schema = T.StructType(
        list(DOCUMENTS_SCHEMA) + [T.StructField(_CORRUPT, T.StringType())]
    )
    parsed = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
        .persist()
    )
    bad_parse = F.col(_CORRUPT).isNotNull()
    no_text = F.col("text").isNull()
    docs = (
        parsed.where(~bad_parse & ~no_text)
        .select(
            F.coalesce(F.col("doc_id"), _h48(F.col("text"))).alias("doc_id"),
            "text",
            "lang",
            "source",
            F.coalesce(F.col("n_chars"), F.length("text").cast("long")).alias(
                "n_chars"
            ),
        )
    )
    rejects = parsed.where(bad_parse | no_text).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct("*"))).alias("raw"),
        F.when(bad_parse, F.lit("malformed"))
        .otherwise(F.lit("missing_text"))
        .alias("reason"),
    )
    if cleanup is not None:
        cleanup.append(parsed)
    else:
        parsed.count()
    return docs, rejects
