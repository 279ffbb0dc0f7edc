"""Physical-plan inspection helpers."""

from .inspect import (
    physical_plan,
    has_broadcast_hash_join,
    pushed_filters,
    partition_filters,
    wholestage_codegen_spans,
)

__all__ = [
    "physical_plan",
    "has_broadcast_hash_join",
    "pushed_filters",
    "partition_filters",
    "wholestage_codegen_spans",
]
