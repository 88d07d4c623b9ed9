from embulk_input_marketo_ray.sinks.exactly_once import BucketMergeWriter, read_lake

__all__ = ["BucketMergeWriter", "read_lake"]
