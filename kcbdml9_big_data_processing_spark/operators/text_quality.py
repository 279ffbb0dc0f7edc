"""Corpus-hygiene operators a pre-training pipeline runs beyond the
basic quality signals: intra-document repetition (Gopher-style
repetition rules — Rae et al. 2021, "Scaling Language Models", §A1.1)
and benchmark-contamination flagging (n-gram overlap against an
evaluation set — the decontamination step of GPT-2/3-style data prep).

Both are DataFrame-in/DataFrame-out operators (no table read, no
registry entry — composed by jobs/training_data.py and usable on any
(doc_id, text) frame). Everything is built-in higher-order array
functions — JVM-side, codegen'd, scan-speed; the contamination join
broadcasts only the BENCHMARK's shingles (small by definition: an eval
set is KBs–MBs while the corpus is TBs), so the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def _toks(text_col: str) -> Column:
    return F.split(F.trim(F.col(text_col)), _WS)


def _word_ngrams(toks: Column, n: int) -> Column:
    """All word-``n``-grams of a token array, as strings. Built with
    the Column API (not F.expr SQL) deliberately: a ``'\\s+'`` literal
    inside expr SQL unescapes to ``'s+'`` and silently splits on the
    letter s — the Column API takes the pattern verbatim."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics, all per-row expressions:

    - ``dup_word_frac``: fraction of word occurrences that are repeats
      (1 - distinct/total) — Gopher's duplicate-word-fraction rule;
    - ``top_word_frac``: share of the single most frequent word —
      catches "word word word ..." degenerate generations that still
      pass a distinct-ratio test when mixed with filler;
    - ``dup_3gram_frac``: fraction of word-3-gram occurrences that are
      repeats — catches looped phrases with a rotating vocabulary.

    The most-frequent-word count is an O(unique × total) per-row
    nested array scan — bounded by document length, embarrassingly
    parallel, no shuffle anywhere.
    """
    toks = _toks(text_col)
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    grams = _word_ngrams(toks, 3)
    n_g = F.size(grams)
    n_g_uniq = F.size(F.array_distinct(grams))
    return docs.select(
        "doc_id",
        (F.lit(1.0) - n_uniq.cast("double") / n.cast("double")).alias(
            "dup_word_frac"
        ),
        (top_cnt.cast("double") / n.cast("double")).alias("top_word_frac"),
        (F.lit(1.0) - n_g_uniq.cast("double") / n_g.cast("double")).alias(
            "dup_3gram_frac"
        ),
    )


def quantile_prune(
    df: DataFrame,
    score_col: str,
    keep_frac: float,
    by: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep the top ``keep_frac`` of rows by ``score_col`` (higher is
    better), optionally within each ``by`` group — the quantile-pruning
    step quality-classifier pipelines run (keep the best-scoring X% of
    a crawl, per language, rather than thresholding at a fixed value
    that drifts with the corpus).

    Deterministic: ranking is by (score DESC, id ASC), so ties at the
    cut line resolve by id instead of partition order, and reruns at
    any partitioning keep the identical set. One window per group —
    a single shuffle on ``by`` (or a global sort when ``by`` is None;
    at 100 TB prefer a grouped prune, or pre-compute the global score
    cutoff on a sample and broadcast a plain filter).
    """
    from pyspark.sql.window import Window

    part = Window.partitionBy(by) if by is not None else Window.partitionBy()
    w = part.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    n = F.count(F.lit(1)).over(part)
    keep_n = F.ceil(n * F.lit(keep_frac)).cast("long")
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__keep_n", keep_n)
        .where(F.col("__rn") <= F.col("__keep_n"))
        .drop("__rn", "__keep_n")
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    ngram: int = 3,
    text_col: str = "text",
    benchmark_text_col: str = "text",
) -> DataFrame:
    """Flag corpus docs sharing any word-``ngram`` with the benchmark
    set: returns (doc_id, n_contaminated_ngrams, contaminated).

    Shape for 100 TB: the benchmark's distinct shingle fingerprints
    (xxhash64 longs) are aggregated to one small frame and BROADCAST;
    each corpus doc then counts its matching shingles with a map-side
    array intersect against the broadcast set — the corpus is touched
    once, projection-only, zero shuffle of corpus data. (A 10k-question
    eval set is ~1e5 shingles ≈ 1 MB of longs.) Lowercased on both
    sides so casing can't hide overlap; ``ngram`` defaults small for
    the synthetic corpus — real decontamination uses 8-13."""

    def shingles(col: str) -> Column:
        toks = F.split(F.trim(F.lower(F.col(col))), _WS)
        return F.array_distinct(
            F.transform(_word_ngrams(toks, ngram), lambda g: F.xxhash64(g))
        )

    bench_sh = (
        benchmark.select(F.explode(shingles(benchmark_text_col)).alias("k"))
        .distinct()
        .agg(F.collect_set("k").alias("bench_set"))
    )
    n_hits = F.size(F.array_intersect(shingles(text_col), F.col("bench_set")))
    return (
        docs.crossJoin(F.broadcast(bench_sh))
        .select(
            "doc_id",
            n_hits.cast("long").alias("n_contaminated_ngrams"),
            (n_hits > 0).alias("contaminated"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    span_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
    cleanup: list[DataFrame] | None = None,
) -> DataFrame:
    """Cross-DOCUMENT repeated token spans — the memorization-hazard
    signal behind exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", which
    removes 50-token spans occurring verbatim more than once; the
    suffix-array formulation there is single-machine — this is the
    shuffle-bounded Spark shape of the same detection).

    Every ``span_tokens``-token window (stride 1) is fingerprinted;
    per-document DISTINCT fingerprints explode into a (fingerprint ->
    distinct-doc count) aggregation, and spans seen in >= 2 documents
    come back as (id_col, n_repeated_spans): how many of each
    document's distinct spans also appear verbatim elsewhere.
    Documents with zero shared spans are absent (join the result back
    and coalesce to 0 for a total accounting).

    Fingerprint scheme: each token is xxhash64'd ONCE (a dedicated
    projection, so codegen evaluates it once per row, not once per
    window), and a window's fingerprint chains its token hashes
    through xxhash64(acc, h) — O(span) JVM hash calls per window, full
    64-bit space, ANSI-safe (a plain polynomial overflows longs under
    ANSI arithmetic), instead of building and hashing a span STRING
    per window. Consumers compare COUNTS, so any collision-resistant
    scheme is equivalent — the oracle twin counts raw span strings.

    The exploded postings frame feeds two consumers (the
    shared-fingerprint aggregation and the per-doc count), so it is
    persisted — but ONLY when a ``cleanup`` list is passed to release
    the cache once results materialize (same convention as
    queries/dedup._exact_jaccard_pairs). Without ``cleanup`` the
    operator stays fully lazy: the explode recomputes once per
    consumer, the honest trade for a caller that cannot own an
    unpersist (r6 ADVICE — an unconditional persist leaked executor
    memory per call in long-lived sessions).

    Scale shape: only (doc_id, 8-byte fingerprint) rows ever shuffle —
    never span text; work is one explode (~n_tokens rows per doc), one
    map-side-combined count per fingerprint, one semi-join back. A
    boilerplate span shared by millions of docs costs one count row,
    not a pair join — this DETECTS repeats; removing them is the
    caller's policy (typically: drop or truncate the offending
    documents, which the returned per-doc counts rank)."""
    token_hashes = F.transform(_toks(text_col), lambda t: F.xxhash64(t))
    hashed = docs.select(F.col(id_col), token_hashes.alias("__th"))
    window_fp = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.size(F.col("__th")) - (span_tokens - 1), F.lit(1)),
        ),
        lambda i: F.aggregate(
            F.slice(F.col("__th"), i, span_tokens),
            F.lit(0).cast("long"),
            lambda acc, v: F.xxhash64(acc, v),
        ),
    )
    ex = hashed.select(
        id_col, F.explode(F.array_distinct(window_fp)).alias("fp")
    )
    if cleanup is not None:
        ex = ex.persist()
        cleanup.append(ex)
    shared = (
        ex.groupBy("fp")
        .agg(F.count_distinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("fp")
    )
    return (
        ex.join(shared, "fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_repeated_spans"))
    )
