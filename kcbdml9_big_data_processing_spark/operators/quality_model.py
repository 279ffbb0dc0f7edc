"""Fasttext-style linear text-classifier INFERENCE (hashed n-gram
features), the model-based quality-filtering step of an LLM data
pipeline (CCNet / fastText quality classifiers): each document's word
unigrams + bigrams hash into a fixed feature space (the hashing
trick), a weight vector scores every feature, and the document's
score is the sum — one scan-parallel projection, no shuffle, no
Python rows.

No reference counterpart (the reference is a telco-metrics engine —
this is a north-star extension operator alongside
operators/sampling.py and operators/text_quality.py).

Scale shape (100 TB): inference is a pure per-row expression, so it
runs at scan speed on any number of executors with zero coordination;
the model rides along as a plan literal — the moral equivalent of a
broadcast variable, ~`dim` longs per executor, no join. Determinism:
the feature hash is the same first-48-bits-of-sha256 formula as
operators/sampling._bucket (portable across engines and machines —
retries / speculative tasks / AQE re-plans cannot change a score),
and weights are integer milli-units so the per-document sum is exact
integer arithmetic in any evaluation order.

Training is out of scope by design — the pipeline serves a model, it
does not fit one; callers pass trained weights (any int sequence).
:func:`default_weights` provides the deterministic stand-in the gated
query uses so both engines can pin the arithmetic without a model
artifact.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .text_quality import _toks, _word_ngrams


def _h48_py(s: str) -> int:
    """First 48 bits of sha256 — the Python twin of the engine-side
    feature hash (same formula as operators/sampling._bucket)."""
    return int(hashlib.sha256(s.encode("utf-8")).hexdigest()[:12], 16)


def default_weights(dim: int, lo: int = -1000, hi: int = 1000, salt: str = "w") -> list[int]:
    """Deterministic integer milli-weights in [lo, hi] derived from the
    feature index — a reproducible stand-in for trained weights (both
    engines embed the identical list as a plan literal, so no model
    file is needed to pin the inference arithmetic)."""
    span = hi - lo + 1
    return [(_h48_py(f"{salt}|{j}") % span) + lo for j in range(dim)]


def _feature_id(gram: Column, dim: int) -> Column:
    """Hashing-trick feature id in [0, dim): first 48 bits of sha256
    of the n-gram string, mod the feature-space size — bit-identical
    to the DuckDB formula in queries/curation (same recipe
    operators/sampling.bucket_sql established)."""
    h48 = F.conv(F.substring(F.sha2(gram, 256), 1, 12), 16, 10).cast("long")
    return h48 % dim


def classifier_score(
    docs: DataFrame,
    weights: Sequence[int],
    ngram_max: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with a linear model over hashed word
    n-gram features: ``score = sum(weights[h(gram) % dim])`` over all
    word n-grams of order 1..``ngram_max`` (n-gram boundary semantics
    shared with :func:`~.text_quality._word_ngrams`, so a doc shorter
    than ``n`` contributes its truncated slice once).

    Returns one row per input document: ``(id_col, n_feats, score)``
    with ``score`` the exact integer sum of milli-weights —
    thresholding (keep/drop, or ``score * 1000 >= min_milli *
    n_feats`` for a mean cutoff) is the caller's policy, kept out of
    the operator like sampling's keep-decisions.

    The token array, the n-gram array, AND the weight vector are each
    BOUND once via the ``transform(array(x), v -> ...)`` idiom before
    reuse — interpreted higher-order expressions get no CSE (see
    queries/text.language_id), so a weight-array literal referenced
    directly inside the per-n-gram lambda would be REBUILT per n-gram
    (measured: ~4.5 s extra at sf0.1 for dim=512 — the bug this
    binding avoids); as a lambda variable it is constructed once per
    row and the inner lookup just indexes it."""
    dim = len(weights)
    wl = F.array(*[F.lit(int(w)) for w in weights])

    def ngrams_of(t: Column) -> Column:
        arrs = [t] + [_word_ngrams(t, n) for n in range(2, ngram_max + 1)]
        return F.concat(*arrs) if len(arrs) > 1 else arrs[0]

    def scored(b: Column) -> Column:
        return F.transform(
            F.array(ngrams_of(b["t"])),
            lambda g: F.struct(
                F.size(g).cast("long").alias("n_feats"),
                F.aggregate(
                    g,
                    F.lit(0).cast("long"),
                    lambda acc, gr: acc
                    + F.element_at(b["w"], (_feature_id(gr, dim) + 1).cast("int")),
                ).alias("score"),
            ),
        )[0]

    bound = F.transform(
        F.array(F.struct(_toks(text_col).alias("t"), wl.alias("w"))), scored
    )[0]
    return docs.select(F.col(id_col), F.inline(F.array(bound)))


def classifier_score_py(
    text: str, weights: Sequence[int], ngram_max: int = 2
) -> tuple[int, int]:
    """Pure-Python reference of :func:`classifier_score` for
    differential tests: returns (n_feats, score) with the identical
    tokenization, truncated-slice n-gram boundary, hash, and weight
    lookup."""
    import re

    toks = re.split(r"\s+", text.strip())
    grams = list(toks)
    for n in range(2, ngram_max + 1):
        upper = max(len(toks) - (n - 1), 1)
        grams += [" ".join(toks[i : i + n]) for i in range(upper)]
    dim = len(weights)
    score = sum(int(weights[_h48_py(g) % dim]) for g in grams)
    return len(grams), score
