from embulk_input_marketo_ray.state.watermark import (
    DateRange,
    WatermarkCheckpoint,
    clamp_to_date,
    slice_range,
)
from embulk_input_marketo_ray.state.manifest import PartitionManifest

__all__ = [
    "DateRange",
    "WatermarkCheckpoint",
    "clamp_to_date",
    "slice_range",
    "PartitionManifest",
]
