from embulk_input_marketo_ray.functions.scalar import (
    normalize_nulls,
    parse_typed,
    sha256_column,
    stable_key_hash,
)

__all__ = ["normalize_nulls", "parse_typed", "sha256_column", "stable_key_hash"]
