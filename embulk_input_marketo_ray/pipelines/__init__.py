from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay

__all__ = ["ReplayConfig", "replay"]
