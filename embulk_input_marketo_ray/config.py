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

# the reference's documented defaults (README.md:44-54 base table,
# :56-75 bulk-extract + csv tables)
_DEFAULTS = {
    "fetch_days": 1,
    "column_prefix": "mk",
    "batch_size": 300,
    "max_return": 200,
    "marketo_limit_interval_milis": 20,
    "polling_interval_second": 60,
    "bulk_job_timeout_second": 3600,
    "incremental_column": "createdAt",
    "quotes_in_quoted_fields": "NONE",
}

# every config key the reference's README documents (README.md:44-54
# base, :56-75 bulk extract + csv parser, :84-95 lead, :121-155
# lead-by-list/program, :160-179 program, custom object + program
# members delegate configs) plus this engine's own extensions. An
# unknown key is a config error — the reference's ConfigMapper rejects
# undeclared fields the same way.
KNOWN_KEYS = frozenset(
    {
        # base (all targets)
        "target",
        "account_id",
        "client_id",
        "client_secret",
        "marketo_limit_interval_milis",
        "batch_size",
        "max_return",
        "partner_api_key",
        # bulk extract (lead / activity / program_members)
        "from_date",
        "fetch_days",
        "polling_interval_second",
        "bulk_job_timeout_second",
        "incremental",
        "incremental_column",
        # csv parser
        "escape",
        "quote",
        "quotes_in_quoted_fields",
        # lead
        "use_updated_at",
        "included_fields",
        # activity
        "activity_type_ids",
        # program
        "query_by",
        "earliest_updated_at",
        "latest_updated_at",
        "earliest_day",
        "latest_day",
        "filter_type",
        "filter_values",
        "tag_type",
        "tag_value",
        "report_duration",
        "report_duration_days",
        # lead-by-list / lead-by-program / program members
        "list_ids",
        "program_ids",
        "number_concurrent_export_job",
        "program_member_counts",
        "metrics",
        # custom object
        "custom_object_api_name",
        "custom_object_filter_type",
        "custom_object_filter_values",
        "custom_object_fields",
        "from_value",
        "to_value",
        # engine extensions (fixture sizing + lake wiring)
        "n_records",
        "n_objects",
        "n_events",
        "existing_ids",
        "events_dir",
        "lake_dir",
        "out_dir",
        "job_start",
        "num_buckets",
        "column_prefix",
        "lake_layout",
        "dedup_by_uid",
        "sf_dir",
    }
)

_QUOTES_MODES = {
    "NONE",
    "ACCEPT_ONLY_RFC4180_ESCAPED",
    "ACCEPT_STRAY_QUOTES_ASSUMING_NO_DELIMITERS_IN_FIELDS",
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
    unknown = sorted(set(config) - KNOWN_KEYS)
    if unknown:
        raise ValueError(f"unknown config keys: {unknown}")
    cfg = {**_DEFAULTS, **config}
    if cfg["quotes_in_quoted_fields"] not in _QUOTES_MODES:
        raise ValueError(
            f"quotes_in_quoted_fields must be one of {sorted(_QUOTES_MODES)}, "
            f"got {cfg['quotes_in_quoted_fields']!r}"
        )
    for key in (
        "marketo_limit_interval_milis",
        "polling_interval_second",
        "bulk_job_timeout_second",
    ):
        if int(cfg[key]) < 0:
            raise ValueError(f"{key} must be >= 0, got {cfg[key]}")
    # partner_api_key rides the identity call when present
    # (rest/MarketoBaseRestClient.java:128-136); accepted + threaded,
    # credentials are fixture-simulated here
    if cfg.get("partner_api_key") is not None:
        cfg["partner_api_key"] = str(cfg["partner_api_key"])
    # incremental_column=updatedAt is the same rejection rule as
    # use_updated_at (MarketoBaseBulkExtractInputPlugin.java:102-106)
    if cfg["incremental_column"] not in ("createdAt", "updatedAt"):
        raise ValueError(
            f"incremental_column must be createdAt or updatedAt, "
            f"got {cfg['incremental_column']!r}"
        )
    if cfg["incremental_column"] == "updatedAt":
        cfg["use_updated_at"] = True
    if int(cfg["max_return"]) > 200:
        cfg["max_return"] = 200  # MAX_RETURN, rest/MarketoRestClient.java:57
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
