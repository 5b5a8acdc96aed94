from .core import (
    dow_sunday0,
    string_agg_distinct_ordered,
    surrogate_key,
    try_to_timestamp,
    with_lineage_columns,
)

__all__ = [
    "dow_sunday0",
    "string_agg_distinct_ordered",
    "surrogate_key",
    "try_to_timestamp",
    "with_lineage_columns",
]
