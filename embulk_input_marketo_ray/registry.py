"""Target dispatch registry — the plugin-of-plugins surface (U1).

The reference dispatches a ``target`` config value to one of 8 input
delegates (MarketoInputPluginDelegate.java:55-102). Here each target is
a builder ``(config: dict) -> ray.data.Dataset`` composed from the
engine's sources and stages, so a user of the reference can address the
same 8 logical tables:

| target | reference delegate | engine composition |
|---|---|---|
| lead | LeadBulkExtractInputPlugin | CDC replay lake (dynamic mk_ schema, watermark slices) |
| activity | ActivityBulkExtractInputPlugin | csv/all-string payloads -> static ACTIVITY schema + dead-letter filter |
| campaign | CampaignInputPlugin | token-paged source, static CAMPAIGN-shaped records |
| program | ProgramInputPlugin | offset-paged source (query_by rules validated at plan time) |
| all_lead_with_list_id | LeadWithListInputPlugin | parent-driven fetch-join tagged listId |
| all_lead_with_program_id | LeadWithProgramInputPlugin | same, tagged programId |
| custom_object | CustomObjectInputPlugin | offset+token hybrid source over an id range |
| program_members | ProgramMembersBulkExtractInputPlugin | per-program fetch, <=2 concurrent export jobs |
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import ray.data


def _lead(config: dict) -> "ray.data.Dataset":
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake

    if "lake_dir" in config:
        return read_lake(config["lake_dir"])
    from datetime import timedelta

    from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
    from embulk_input_marketo_ray.synth import (
        BASE_TS,
        default_events_dir,
        generate_change_events,
        load_evolution_log,
    )

    n = int(config.get("n_events", 6000))
    events_dir = config.get("events_dir") or default_events_dir(n)
    generate_change_events(events_dir, n)
    import tempfile

    lake_dir = config.get("out_dir") or tempfile.mkdtemp(prefix="graft_lead_lake_")
    from_ts = config.get("from_date", BASE_TS)
    replay(
        ReplayConfig(
            events_dir=events_dir,
            lake_dir=lake_dir,
            evolution_log=load_evolution_log(events_dir),
            from_ts=from_ts if from_ts >= BASE_TS else BASE_TS,
            job_start=BASE_TS + timedelta(seconds=n + 50),
            fetch_days=int(config.get("fetch_days", 100)),
            num_buckets=int(config.get("num_buckets", 16)),
            included_fields=config.get("included_fields"),
            column_prefix=config.get("column_prefix", "mk"),
            # W1: lead's only config branch — switch the watermark
            # column to the updatedAt analog (incremental must then be
            # off; replay() enforces the reference's rejection)
            use_updated_at=bool(config.get("use_updated_at", False)),
            incremental=bool(config.get("incremental", True)),
            lake_layout=config.get("lake_layout", "rewrite"),
        )
    )
    return read_lake(lake_dir)


# the synthetic activity stream's "describe" result: available activity
# type ids (the analog of MarketoService.getActivityTypes used by
# ActivityBulkExtractInputPlugin.java:122-147 to validate the filter)
AVAILABLE_ACTIVITY_TYPE_IDS = frozenset(range(12))


def sanitize_activity_type_ids(raw_ids: list) -> list[int]:
    """Activity-type-id validation
    (ActivityBulkExtractInputPlugin.java:74-120): collect ALL
    blank/non-numeric entries into one error (unlike the list/program
    sanitizer, which fails on the first), then reject ids absent from
    the available activity types with the reference's two-part error."""
    invalid = [str(i) for i in raw_ids if not str(i).strip().isdigit()]
    if invalid:
        raise ValueError(f"Invalid activity type id: [{', '.join(invalid)}]")
    ids = [int(str(i).strip()) for i in raw_ids]
    unknown = [i for i in ids if i not in AVAILABLE_ACTIVITY_TYPE_IDS]
    if unknown:
        available = ", ".join(str(i) for i in sorted(AVAILABLE_ACTIVITY_TYPE_IDS))
        raise ValueError(
            f"Invalid activity type ids: [{', '.join(map(str, unknown))}], "
            f"Available activity types: {available}"
        )
    return ids


def _activity(config: dict) -> "ray.data.Dataset":
    """Static-schema activity stream, deduped by ``marketoGUID``.

    The reference DECLARES ``uid_column=marketoGUID``
    (delegate/ActivityBulkExtractInputPlugin.java:34-35,53-54) but never
    consumes it (SURVEY.md §2.3 T6); here the identity is enforced:
    exact dedup on the uid keeps the first occurrence.

    ``activity_type_ids`` filters the stream to the listed types,
    pushed into the read path like the reference's bulk-extract filter
    (rest/MarketoRestClient.java:219-226)."""
    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        keep_one_per_key,
        q_activity_static_schema,
    )

    # the uid dedup repartitions by key; the shuffle strategy must be
    # set BEFORE the source dataset is created (context snapshots at
    # dataset creation)
    _ensure_hash_shuffle()
    type_ids = config.get("activity_type_ids")
    ds = q_activity_static_schema(config.get("sf_dir", ""))
    if type_ids:
        wanted = sanitize_activity_type_ids(type_ids)
        import pyarrow as pa
        import pyarrow.compute as pc

        # activityTypeId is a string column in the static schema
        value_set = pa.array([str(i) for i in wanted], type=pa.string())

        def keep_types(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("activityTypeId"), value_set=value_set))

        ds = ds.map_batches(keep_types, batch_format="pyarrow")
    if config.get("dedup_by_uid", True):
        import pyarrow as pa

        def add_seq(batch: pa.Table) -> pa.Table:
            # activityDate is the watermark; use it as the keep-first order
            seq = batch.column("activityDate").cast(pa.int64())
            return batch.append_column("_seq", seq)

        ds = ds.map_batches(add_seq, batch_format="pyarrow")
        ds = keep_one_per_key(ds, ["marketoGUID"], "_seq", keep="first", num_buckets=16)
        ds = ds.drop_columns(["_seq"])
    return ds


def _campaign(config: dict) -> "ray.data.Dataset":
    from embulk_input_marketo_ray.sources.paged import read_token_paged

    return read_token_paged(int(config.get("n_records", 1000)))


def _program(config: dict) -> "ray.data.Dataset":
    query_by = config.get("query_by", "date_range")
    if query_by not in ("date_range", "tag"):
        raise ValueError(f"program query_by must be date_range or tag, got {query_by!r}")
    if query_by == "tag" and not (config.get("tag_type") and config.get("tag_value")):
        # ProgramInputPlugin.java:83-133 validation rules
        raise ValueError("query_by=tag requires tag_type and tag_value")
    from embulk_input_marketo_ray.sources.paged import read_offset_paged

    if query_by == "tag":
        # the tag query changes the fetched RECORD SET, not just the
        # config shape: tagType/tagValue are passed to the server and
        # only matching programs come back (MarketoRestClient.java:373-391)
        return read_offset_paged(
            int(config.get("n_records", 1000)),
            tag_type=str(config["tag_type"]),
            tag_value=str(config["tag_value"]),
        )
    # date_range: optional earliest/latest day window + optional
    # filter_type/filter_values refinement, all server-side
    # (rest/MarketoRestClient.java:476-488). filter_type without
    # filter_values is the reference's validation error
    # (ProgramInputPlugin.java:128-131).
    filter_type = config.get("filter_type")
    filter_values = config.get("filter_values")
    if filter_type is not None and not filter_values:
        raise ValueError("filter_value is required when selected filter_type")
    date_range = None
    if "earliest_day" in config or "latest_day" in config:
        earliest = config.get("earliest_day")
        if earliest is None:
            # ProgramInputPlugin.java:97-99
            raise ValueError("`earliest_updated_at` is required when query by Date Range")
        latest = config.get("latest_day")
        if "report_duration_days" in config:
            # report_duration preferred over latest_updated_at
            # (ProgramInputPlugin.java:103-108)
            latest = int(earliest) + int(config["report_duration_days"])
        if latest is None:
            raise ValueError("`latest_updated_at` is required when query by Date Range")
        if int(earliest) > int(latest):
            raise ValueError(
                f"Invalid date range. `earliest_updated_at` ({earliest}) cannot "
                f"precede the `latest_updated_at` ({latest})."
            )
        date_range = (int(earliest), int(latest))
    field_filter = None
    if filter_type is not None:
        vals = (
            [v.strip() for v in filter_values.split(",")]
            if isinstance(filter_values, str)
            else [str(v).strip() for v in filter_values]
        )
        field_filter = (str(filter_type), frozenset(v for v in vals if v))
    return read_offset_paged(
        int(config.get("n_records", 1000)),
        date_range=date_range,
        field_filter=field_filter,
    )


def _lead_with_list(config: dict) -> "ray.data.Dataset":
    from embulk_input_marketo_ray.sources.fetch_join import read_children_of, sanitize_ids

    parents = sanitize_ids([str(x) for x in config.get("list_ids", ["1", "2"])])
    return read_children_of(parents, parent_column="listId")


def _lead_with_program(config: dict) -> "ray.data.Dataset":
    from embulk_input_marketo_ray.sources.fetch_join import read_children_of, sanitize_ids

    parents = sanitize_ids([str(x) for x in config.get("program_ids", ["1", "2"])])
    return read_children_of(parents, parent_column="programId")


def refine_filter_values(filter_values) -> list[str]:
    """CustomObjectInputPlugin.refineFilterValues (java:73-77): split a
    comma-joined string (or accept a list), trim, drop blanks, dedup.
    The reference collects into a Set; here first-occurrence order is
    kept so chunking is deterministic."""
    vals = (
        filter_values.split(",")
        if isinstance(filter_values, str)
        else [str(v) for v in filter_values]
    )
    return list(dict.fromkeys(v.strip() for v in vals if v and v.strip()))


def _custom_object(config: dict) -> "ray.data.Dataset":
    """All three reference query modes
    (delegate/CustomObjectInputPlugin.java:53-96): explicit
    filter_values list, bounded from/to id range, and the open-ended
    scan (no to_value) that stops at the first empty 300-id chunk.
    Validation mirrors the reference's errors verbatim."""
    if not str(config.get("custom_object_filter_type", "")).strip():
        raise ValueError("`custom_object_filter_type` cannot be empty")
    if not str(config.get("custom_object_api_name", "")).strip():
        raise ValueError("`custom_object_api_name` cannot be empty")
    from embulk_input_marketo_ray.sources.paged import read_custom_objects

    raw_values = config.get("custom_object_filter_values")
    from_value = int(config.get("from_value", 1))
    to_value = config.get("to_value")
    if raw_values is not None:
        refined = refine_filter_values(raw_values)
        if not refined:
            raise ValueError(
                "`custom_object_filter_values` cannot contain empty values only"
            )
        # the fixture's object ids are integers; non-numeric values
        # match nothing (like a dedupeField value absent from the DB)
        int_vals = [int(v) for v in refined if v.lstrip("-").isdigit()]
        return read_custom_objects(
            filter_values=int_vals,
            existing_ids=config.get("existing_ids"),
        )
    if to_value is not None and int(to_value) <= from_value:
        raise ValueError(
            f"`to_value` ({to_value}) cannot be less than the `from_value` ({from_value})"
        )
    if to_value is None:
        n_objects = int(config.get("n_objects", 700))
        existing = config.get("existing_ids")
        if existing is None:
            existing = range(1, n_objects + 1)
        return read_custom_objects(from_value, None, existing_ids=existing)
    # bounded range honors the same fixture universe as the other two
    # modes (existing_ids=None = every requested id exists)
    return read_custom_objects(
        from_value, int(to_value), existing_ids=config.get("existing_ids")
    )


def _program_members(config: dict) -> "ray.data.Dataset":
    from embulk_input_marketo_ray.sources.fetch_join import read_children_of, sanitize_ids

    parents = sanitize_ids([str(x) for x in config.get("program_ids", ["1", "2", "3"])])
    # number_concurrent_export_job <= 2
    cap = min(int(config.get("number_concurrent_export_job", 2)), 2)
    counts = config.get("program_member_counts")
    if counts is not None:
        counts = {int(k): int(v) for k, v in counts.items()}
    return read_children_of(
        parents,
        parent_column="programId",
        max_concurrent_jobs=cap,
        children_counts=counts,
        metrics=config.get("metrics"),
    )


TARGETS: dict[str, Callable[[dict], Any]] = {
    "lead": _lead,
    "activity": _activity,
    "campaign": _campaign,
    "program": _program,
    "all_lead_with_list_id": _lead_with_list,
    "all_lead_with_program_id": _lead_with_program,
    "custom_object": _custom_object,
    "program_members": _program_members,
}


def build_target(target: str, config: dict | None = None) -> "ray.data.Dataset":
    """Dispatch like the reference: unknown targets fail with the list
    of valid ones (MarketoInputPluginDelegate.java:57-71)."""
    if target not in TARGETS:
        raise ValueError(f"unknown target {target!r}; valid: {sorted(TARGETS)}")
    return TARGETS[target](config or {})
