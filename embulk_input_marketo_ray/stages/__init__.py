from embulk_input_marketo_ray.stages.extractor import PagedExtractor
from embulk_input_marketo_ray.stages.normalize import ChangeEventNormalizer
from embulk_input_marketo_ray.stages.lww import (
    LAKE_KEY,
    add_bucket_and_partial_lww,
    lww_merge,
)

__all__ = [
    "PagedExtractor",
    "ChangeEventNormalizer",
    "LAKE_KEY",
    "add_bucket_and_partial_lww",
    "lww_merge",
]
