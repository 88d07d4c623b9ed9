"""Embulk-style config front door (U2/U3).

A user of the reference configures a run with a YAML block like::

    in:
      type: marketo
      target: lead
      account_id: ...
      from_date: "2024-01-01"
      fetch_days: 30
      included_fields: [score, revenue]
      column_prefix: mk

``run_from_config`` accepts the same shape as a dict (the ``in:`` body)
and dispatches through the target registry, applying the reference's
validation rules at plan time (@Config/@ConfigDefault analogs):

- ``target`` required, must be one of the 8 targets
  (MarketoInputPluginDelegate.java:57-71);
- bulk-extract targets require ``from_date``
  (delegate/MarketoBaseBulkExtractInputPlugin.java:92-110) and reject a
  ``from_date`` in the future of ``job_start``;
- ``fetch_days`` must be positive; defaults to 1 like the reference;
- credential fields are accepted and ignored (no real API here).
"""

from __future__ import annotations

from datetime import datetime
from typing import Any

BULK_EXTRACT_TARGETS = {"lead", "activity", "program_members"}

_DEFAULTS = {
    "fetch_days": 1,
    "column_prefix": "mk",
    "batch_size": 300,
}


def _parse_date(value) -> datetime:
    if isinstance(value, datetime):
        return value
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return datetime.strptime(str(value), fmt)
        except ValueError:
            continue
    raise ValueError(f"unparseable date {value!r} (expected YYYY-MM-DD[THH:MM:SS])")


def validate_config(config: dict) -> dict:
    """Normalize + validate an embulk-style config body; returns the
    effective config with defaults applied."""
    if "target" not in config:
        raise ValueError("config requires 'target'")
    cfg = {**_DEFAULTS, **config}
    if cfg["target"] in BULK_EXTRACT_TARGETS or cfg["target"] == "lead":
        if "from_date" not in config:
            raise ValueError(f"target {cfg['target']!r} requires 'from_date'")
        cfg["from_date"] = _parse_date(cfg["from_date"])
        job_start = cfg.get("job_start")
        if job_start is not None and cfg["from_date"] >= _parse_date(job_start):
            raise ValueError("from_date must be before the job start time")
    if int(cfg["fetch_days"]) <= 0:
        raise ValueError(f"fetch_days must be positive, got {cfg['fetch_days']}")
    # W1 (lead only): use_updated_at switches the incremental column to
    # the updatedAt analog, which the reference rejects under
    # incremental import (LeadBulkExtractInputPlugin.java:28-40 sets
    # the column; MarketoBaseBulkExtractInputPlugin.java:102-106 throws)
    if (
        cfg["target"] == "lead"
        and cfg.get("use_updated_at", False)
        and cfg.get("incremental", True)
    ):
        raise ValueError("Column 'updatedAt' cannot be incremental imported")
    if int(cfg["batch_size"]) > 300:
        cfg["batch_size"] = 300  # hard max, rest/MarketoRestClient.java:114-117
    return cfg


def run_from_config(config: dict) -> Any:
    """Validate and dispatch: returns the target's Dataset."""
    from embulk_input_marketo_ray.registry import build_target

    cfg = validate_config(config)
    return build_target(cfg["target"], cfg)
