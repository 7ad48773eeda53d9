from novlake_spark.plans.inspect import (
    broadcast_hint_count,
    explain_str,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    pruned_read_schema,
    wholestage_codegen_spans,
)

__all__ = [
    "broadcast_hint_count",
    "explain_str",
    "has_broadcast_hash_join",
    "has_pushed_filters",
    "has_take_ordered",
    "pruned_read_schema",
    "wholestage_codegen_spans",
]
