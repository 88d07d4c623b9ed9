from embulk_input_marketo_ray.sinks.exactly_once import (
    BucketMergeWriter,
    changes_between,
    compact,
    lookup_keys,
    vacuum,
    read_lake,
    read_lake_table,
)

__all__ = [
    "BucketMergeWriter",
    "changes_between",
    "compact",
    "lookup_keys",
    "vacuum",
    "read_lake",
    "read_lake_table",
]
