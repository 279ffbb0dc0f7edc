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

Serving and fitting are split: callers of :func:`classifier_score`
pass trained weights (any int sequence; :func:`default_weights` is
the deterministic stand-in the gated query uses so both engines can
pin the inference arithmetic without a model artifact), and
:func:`train_classifier` fits those weights from a labeled corpus —
the seed-label bootstrap of a fastText/CCNet-style quality filter
(label a few thousand docs good/bad, fit the linear model, score the
corpus). Training is a bounded-iteration Spark JOB, not a query: each
pass is one corpus scan plus a ``dim``-key aggregation (map-side
combine reduces every task's output to at most ``dim`` rows before
the shuffle), the weight vector lives driver-side between passes and
rides into each pass as a plan literal. All training arithmetic the
cluster performs is exact-integer or correctly-rounded IEEE-754
double ops (+,-,*,/ and floor — no transcendentals: the squashing
function is the rational fast-sigmoid z/(2(1+|z|))), and per-row
residuals quantize to fixed-point longs BEFORE the gradient
aggregation, so gradients are exact integer sums — training is
bit-deterministic under any partitioning, task retry, or evaluation
order, and :func:`train_classifier_py` reproduces the exact integer
weight trajectory in pure Python (the differential pin in
tests/test_llm_ops.py).
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


def _toks_py(text: str) -> list[str]:
    """EXACT Python mirror of the engine tokenizer
    ``split(trim(text), '\\s+')``: Spark's ``trim`` removes only
    U+0020 spaces, and Java's ``\\s`` is the ASCII class
    ``[ \\t\\n\\x0b\\f\\r]`` — so a leading tab yields a leading ''
    token and NBSP is not whitespace. Python's ``str.strip()`` /
    ``re`` ``\\s`` are Unicode-wide and DIVERGE on exactly those
    inputs (a bit-equality twin using them is wrong on any text with
    non-space whitespace); every *_py twin in this module must
    tokenize through here."""
    import re

    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


def default_weights(dim: int, lo: int = -1000, hi: int = 1000, salt: str = "w") -> list[int]:
    """Deterministic integer milli-weights in [lo, hi] derived from the
    feature index — a reproducible stand-in for trained weights (both
    engines embed the identical list as a plan literal, so no model
    file is needed to pin the inference arithmetic)."""
    span = hi - lo + 1
    return [(_h48_py(f"{salt}|{j}") % span) + lo for j in range(dim)]


def _feature_id(gram: Column, dim: int) -> Column:
    """Hashing-trick feature id in [0, dim): first 48 bits of sha256
    of the n-gram string (the shared operators/sampling.h48 recipe),
    mod the feature-space size — bit-identical to the DuckDB formula
    in queries/curation."""
    from .sampling import h48

    return h48(gram) % dim


def score_expr(
    weights: Sequence[int], ngram_max: int = 2, text_col: str = "text"
) -> Column:
    """The scoring expression behind :func:`classifier_score` as a
    reusable ``struct(n_feats, score)`` Column, for callers that fold
    model inference into an existing per-row scan (e.g. the curator's
    quality gate) instead of paying a join against a separate scored
    frame. Consume it through ONE generator (``F.inline(F.array(e))``)
    or one struct reference — reading two fields off two copies of the
    expression duplicates the whole tree (no CSE in interpreted
    higher-order expressions)."""
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

    return F.transform(
        F.array(F.struct(_toks(text_col).alias("t"), wl.alias("w"))), scored
    )[0]


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
    bound = score_expr(weights, ngram_max=ngram_max, text_col=text_col)
    return docs.select(F.col(id_col), F.inline(F.array(bound)))


#: fixed-point scale for quantized per-row residuals (and the default
#: learning-rate denominator's unit): residuals live in (-1, 1), so
#: the quantized long is |rq| <= 2^20 and a gradient sum over any
#: realistic partition count stays far inside long range.
_RESID_Q = 1 << 20


def train_classifier(
    docs: DataFrame,
    label_col: str = "label",
    dim: int = 512,
    iters: int = 8,
    lr_num: int = 1 << 12,
    lr_den: int | None = None,
    ngram_max: int = 2,
    text_col: str = "text",
    init: Sequence[int] | None = None,
) -> list[int]:
    """Fit integer milli-weights for :func:`classifier_score` from a
    labeled corpus (``label_col`` in {0, 1}; 1 = keep-quality) by
    full-batch gradient descent on a logistic-style loss — the
    seed-label bootstrap of a fastText/CCNet quality filter, run as a
    bounded number of Spark passes.

    Per pass, entirely declarative: every doc's score under the
    current weights (the SAME bound-literal expression
    :func:`classifier_score` serves with) normalizes to
    ``z = score / (1000 * n_feats)``, squashes through the rational
    fast-sigmoid ``0.5 + z / (2 * (1 + |z|))`` (only +,-,*,/ and
    abs — every op correctly rounded IEEE-754, no transcendental
    whose last ulp could differ between runtimes), and the residual
    ``sigma - y`` quantizes to a fixed-point long
    (``floor(resid * 2^20 + 0.5)``) BEFORE the n-grams explode; the
    per-feature gradient is then an exact integer ``sum`` grouped by
    the 48-bit-sha256 feature id. The weight update runs driver-side
    in exact Python ints: ``w_j -= (grad_j * lr_num) // lr_den`` with
    ``lr_den`` defaulting to ``2^20 * n_docs`` (i.e. ``lr_num`` is
    the step per unit mean-residual, in milli-weight units).

    Bit-determinism: integer sums commute, so the gradient — and
    therefore the whole weight trajectory — is identical under any
    partitioning, AQE re-plan, task retry, or executor count;
    :func:`train_classifier_py` reproduces it exactly in pure Python
    (differential-pinned in tests/test_llm_ops.py).

    100 TB shape: each pass is one corpus scan plus a shuffle of at
    most ``dim`` rows per map task (partial aggregation combines the
    exploded n-grams map-side; only (fid, partial-sum) pairs move),
    a ``dim``-row collect, and a driver update of ``dim`` ints —
    the classic broadcast-model iteration, linear in corpus bytes
    per pass with a fixed number of passes. Null/absent text is the
    caller's problem, exactly as in :func:`classifier_score`."""
    if lr_den is None:
        lr_den = _RESID_Q * max(docs.count(), 1)
    w = [0] * dim if init is None else [int(x) for x in init]
    if len(w) != dim:
        raise ValueError(f"init has {len(w)} weights, expected dim={dim}")

    def ngrams_of(t: Column) -> Column:
        arrs = [t] + [_word_ngrams(t, n) for n in range(2, ngram_max + 1)]
        return F.concat(*arrs) if len(arrs) > 1 else arrs[0]

    base = docs.select(
        F.col(label_col).cast("long").alias("y"), F.col(text_col).alias("_txt")
    )
    for _ in range(iters):
        wl = F.array(*[F.lit(int(x)) for x in w])

        def scored(b: Column) -> Column:
            # hash each n-gram to its feature id ONCE and bind the id
            # array (sha256 per gram is the dominant per-row cost —
            # re-deriving ids after the explode would pay it twice and
            # shuffle full gram strings instead of ints)
            fids = F.transform(
                ngrams_of(b["t"]),
                lambda gr: (_feature_id(gr, dim)).cast("int"),
            )
            return F.transform(
                F.array(fids),
                lambda fa: F.struct(
                    F.size(fa).cast("long").alias("n"),
                    F.aggregate(
                        fa,
                        F.lit(0).cast("long"),
                        lambda acc, fid: acc + F.element_at(b["w"], fid + 1),
                    ).alias("score"),
                    fa.alias("fids"),
                ),
            )[0]

        bound = F.transform(
            F.array(F.struct(_toks("_txt").alias("t"), wl.alias("w"))), scored
        )[0]
        z = F.col("score") / (F.lit(1000.0) * F.col("n"))
        sig = F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))
        rq = F.floor((sig - F.col("y")) * _RESID_Q + F.lit(0.5)).cast("long")
        grads = {
            r["fid"]: r["grad"]
            for r in (
                base.select("y", F.inline(F.array(bound)))
                .select(rq.alias("rq"), F.explode("fids").alias("fid"))
                .groupBy("fid")
                .agg(F.sum("rq").alias("grad"))
                .collect()
            )
        }
        w = [wj - (grads.get(j, 0) * lr_num) // lr_den for j, wj in enumerate(w)]
    return w


def train_classifier_py(
    rows: Sequence[tuple[str, int]],
    dim: int = 512,
    iters: int = 8,
    lr_num: int = 1 << 12,
    lr_den: int | None = None,
    ngram_max: int = 2,
    init: Sequence[int] | None = None,
) -> list[int]:
    """Pure-Python reference of :func:`train_classifier` for the
    differential pin: identical tokenization, n-gram boundary, hash,
    fast-sigmoid op ORDER (IEEE doubles make same-order +,-,*,/
    bit-identical across runtimes), residual quantization, integer
    gradient accumulation, and floor-division update — given the same
    (text, label) rows it must produce the same exact integer weight
    trajectory."""
    import math

    if lr_den is None:
        lr_den = _RESID_Q * max(len(rows), 1)
    w = [0] * dim if init is None else [int(x) for x in init]
    docs = []
    for text, y in rows:
        toks = _toks_py(text)
        grams = list(toks)
        for n in range(2, ngram_max + 1):
            upper = max(len(toks) - (n - 1), 1)
            grams += [" ".join(toks[i : i + n]) for i in range(upper)]
        docs.append(([_h48_py(g) % dim for g in grams], int(y)))
    for _ in range(iters):
        grads = [0] * dim
        for fids, y in docs:
            score = sum(w[j] for j in fids)
            z = score / (1000.0 * len(fids))
            sig = 0.5 + z / (2.0 * (1.0 + abs(z)))
            rq = math.floor((sig - y) * _RESID_Q + 0.5)
            for j in fids:
                grads[j] += rq
        w = [wj - (grads[j] * lr_num) // lr_den for j, wj in enumerate(w)]
    return w


def classifier_score_py(
    text: str, weights: Sequence[int], ngram_max: int = 2
) -> tuple[int, int]:
    """Pure-Python reference of :func:`classifier_score` for
    differential tests: returns (n_feats, score) with the identical
    tokenization, truncated-slice n-gram boundary, hash, and weight
    lookup."""
    toks = _toks_py(text)
    grams = list(toks)
    for n in range(2, ngram_max + 1):
        upper = max(len(toks) - (n - 1), 1)
        grams += [" ".join(toks[i : i + n]) for i in range(upper)]
    dim = len(weights)
    score = sum(int(weights[_h48_py(g) % dim]) for g in grams)
    return len(grams), score
