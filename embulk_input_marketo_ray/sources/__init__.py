from embulk_input_marketo_ray.sources.change_events import read_change_events

__all__ = ["read_change_events"]
