"""Fact x dimension enrichment join.

J1 in SURVEY.md §2.5 (batch/BatchJobImpl.scala:40-44): inner equi-join
of the device fact stream with the user_metadata dimension, dropping
the duplicate key.

Scale: the dimension side of this class of join is small (20 rows in
the reference; user/customer dims are usually << facts), so we hint
``broadcast`` by default — a broadcast hash join replicates the dim to
every executor and the 100 TB fact side never shuffles. Set
``broadcast_dim=False`` for a genuinely large dimension and Catalyst
(with AQE) picks sort-merge / shuffled hash instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Join ``fact`` with ``dim`` on fact_key == dim_key, keeping one
    key column (the fact's)."""
    dim_key = dim_key if dim_key is not None else fact_key
    right = F.broadcast(dim) if broadcast_dim else dim
    joined = fact.join(right, fact[fact_key] == dim[dim_key], how)
    return joined.drop(dim[dim_key])
