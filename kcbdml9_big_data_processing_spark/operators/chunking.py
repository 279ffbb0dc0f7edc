"""Document chunking: split long documents into fixed-size,
overlapping token-window chunks — the context-window preparation step
between curation and training (or embedding) that every long-document
corpus needs.

Pure per-row array expressions + one posexplode: chunk starts are a
``sequence`` over the token array, each chunk a ``slice`` — so the
operator is scan-speed, shuffle-free, and linear in output size at
any corpus scale. Chunk boundaries are a deterministic function of
the token count alone, so reruns, retries, and other engines
reproduce identical chunks (the suite hash-checks chunk CONTENT via
a cross-engine fingerprint, not just counts).

Chunking rule: starts are ``1, 1+step, ...`` up to
``max(n_tokens - overlap, 1)`` inclusive, with ``step = chunk_tokens
- overlap``. Consequences worth stating: a document with at most
``chunk_tokens`` tokens yields exactly one chunk; every non-first
chunk overlaps its predecessor by ``overlap`` tokens; the last chunk
is the only one that may run short, and it always carries more than
``overlap`` tokens (so no chunk is a pure suffix of its
predecessor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per chunk: (id_col, chunk_idx [0-based], chunk_text,
    n_tokens). See module docstring for the boundary rule."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(toks) - F.lit(overlap), F.lit(1)),
        F.lit(step),
    )
    # slice each chunk out of the token array BEFORE exploding: the
    # explode then emits (text, n_tokens) structs of chunk size, not
    # rows dragging the full document array along — carrying the whole
    # array through posexplode is O(n_chunks * doc_len) per document
    # (quadratic in doc length at fixed step; measured 2x on the suite)
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(F.slice(toks, s, chunk_tokens), " ").alias("text"),
            F.size(F.slice(toks, s, chunk_tokens)).cast("long").alias("n"),
        ),
    )
    return docs.select(
        id_col,
        F.posexplode(chunks).alias("chunk_idx", "__chunk"),
    ).select(
        id_col,
        "chunk_idx",
        F.col("__chunk.text").alias("chunk_text"),
        F.col("__chunk.n").alias("n_tokens"),
    )
