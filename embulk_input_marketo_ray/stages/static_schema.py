"""Static (hard-coded) schemas + invalid-record filtering.

The reference's three non-describe targets carry fixed schemas:

- ACTIVITY: 8 columns incl. the JSON ``attributes`` column
  (delegate/ActivityBulkExtractInputPlugin.java:154-167); watermark
  column ``activityDate``, uid column ``marketoGUID`` (:34-35,53-54);
- CAMPAIGN: 8 columns (delegate/CampaignInputPlugin.java:34-47);
- PROGRAM: 17 columns incl. 3 JSON columns
  (delegate/ProgramInputPlugin.java:203-225).

JSON-typed columns are carried as canonical JSON strings (SURVEY.md
§1.4: Embulk JSON -> canonical-JSON string column); parsing into
structs happens only when a downstream kernel needs it.

Invalid-record filter (M7, delegate/CustomObjectInputPlugin.java:99-111):
records carrying a non-null ``reasons`` error node are dropped and
counted to a dead-letter metric instead of failing the run.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.compute as pc

from embulk_input_marketo_ray.functions.scalar import parse_typed

# (column -> marketo dataType); "json" marks canonical-JSON passthrough
ACTIVITY_FIELDS: dict[str, str] = {
    "marketoGUID": "string",  # uid / dedup identity
    "leadId": "string",
    "activityDate": "datetime",  # watermark column
    "activityTypeId": "string",
    "campaignId": "string",
    "primaryAttributeValueId": "string",
    "primaryAttributeValue": "string",
    "attributes": "json",
}

CAMPAIGN_FIELDS: dict[str, str] = {
    "id": "integer",
    "name": "string",
    "description": "string",
    "type": "string",
    "programName": "string",
    "workspaceName": "string",
    "createdAt": "datetime",
    "updatedAt": "datetime",
}

PROGRAM_FIELDS: dict[str, str] = {
    "id": "integer",
    "name": "string",
    "description": "string",
    "createdAt": "datetime",
    "updatedAt": "datetime",
    "startDate": "date",
    "endDate": "date",
    "url": "string",
    "type": "string",
    "channel": "string",
    "status": "string",
    "workspace": "string",
    "headStart": "boolean",
    "folder": "json",
    "tags": "json",
    "costs": "json",
}


def _canonical_json(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Validate + canonicalize a JSON string column (sorted keys, tight
    separators). Invalid JSON -> null (lenient, like the reference's
    per-value parse fallback)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = []
    for v in col:
        if not v.is_valid:
            out.append(None)
            continue
        try:
            out.append(json.dumps(json.loads(v.as_py()), sort_keys=True, separators=(",", ":")))
        except (json.JSONDecodeError, TypeError):
            out.append(None)
    return pa.array(out, type=pa.string())


def apply_static_schema(batch: pa.Table, fields: dict[str, str]) -> pa.Table:
    """All-string record batch -> typed batch per a static schema.
    Missing source columns become typed nulls (the static schema is
    closed-world: extra columns are dropped)."""
    n = batch.num_rows
    out: dict[str, pa.Array | pa.ChunkedArray] = {}
    for name, mtype in fields.items():
        if name not in batch.column_names:
            target = pa.string() if mtype == "json" else None
            from embulk_input_marketo_ray.types import arrow_type_for

            out[name] = pa.nulls(n, type=target or arrow_type_for(mtype))
        elif mtype == "json":
            out[name] = _canonical_json(batch.column(name))
        else:
            out[name] = parse_typed(batch.column(name), mtype)
    return pa.table(out)


def filter_invalid_records(
    batch: pa.Table, reasons_column: str = "reasons", metrics=None
) -> pa.Table:
    """M7: drop records with a populated error node, count dead-letters."""
    if reasons_column not in batch.column_names:
        return batch
    valid = pc.is_null(batch.column(reasons_column))
    dropped = batch.num_rows - pc.sum(valid.cast(pa.int64())).as_py()
    if dropped and metrics is not None:
        metrics.inc.remote("dead_letter_records", int(dropped))
    return batch.filter(valid).drop_columns([reasons_column])
