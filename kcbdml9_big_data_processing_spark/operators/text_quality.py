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
