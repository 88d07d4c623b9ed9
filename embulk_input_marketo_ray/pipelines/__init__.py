from embulk_input_marketo_ray.pipelines.cdc_replay import (
    AuditFailed,
    AuditReport,
    ReplayConfig,
    replay,
)

__all__ = ["AuditFailed", "AuditReport", "ReplayConfig", "replay"]
