"""Deterministic sequence packing — the dataset-assembly step between
curation and training: concatenate documents into fixed-token-budget
training sequences (GPT-style "packing") so short documents don't
waste context-window padding.

The exact bin-packing objective is NP-hard and inherently sequential;
what production pipelines actually run is GREEDY packing over a
deterministic document order, which this operator expresses
relationally so it scales and reruns bit-identically:

- shard by id hash (``pmod(doc_id, shards)``) — packing is
  embarrassingly parallel across shards, and the shard count is the
  parallelism knob (each shard's window is independent state);
- within a shard, order by doc_id (deterministic, storage-order-free)
  and take a running token total;
- a document's sequence is ``floor(exclusive_prefix_tokens / budget)``
  — the greedy "fill until the budget crosses" assignment. A document
  straddling a boundary starts inside the earlier sequence (the
  concat-then-chunk semantic most packers use, where the chunker cuts
  mid-document); budget overshoot per sequence is bounded by one
  document.

Shape at 100 TB: one shuffle on the shard key, one running-sum window
per shard — no global sort, no driver state, no iteration. Every
piece (hash, cumsum of integers, floor division) is engine-exact, so
the assignment is value-hash-checkable against a SQL oracle and
reproducible across reruns, repartitionings, and engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_WS = r"\s+"


def pack_sequences(
    df: DataFrame,
    budget_tokens: int,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document a packed-sequence id: returns the input's
    ``id_col`` plus ``shard``, ``n_tokens`` (whitespace tokens — swap
    in a real tokenizer's counts upstream by passing a frame that
    already carries them), and ``seq_id`` (globally unique:
    ``shard * 2^40 + sequence-within-shard``)."""
    n_tokens = F.size(F.split(F.trim(F.col(text_col)), _WS)).cast("long")
    shard = F.pmod(F.col(id_col), F.lit(shards)).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        df.select(
            F.col(id_col),
            shard.alias("shard"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn(
            "seq_id",
            F.col("shard") * F.lit(1 << 40)
            + F.floor(prefix / F.lit(budget_tokens)).cast("long"),
        )
    )
