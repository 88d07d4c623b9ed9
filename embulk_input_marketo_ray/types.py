"""Marketo field-metadata type system mapped onto Arrow.

Reproduces the Marketo dataType -> Embulk column-type mapping
(reference ``model/MarketoField.java:73-116`` and
``rest/MarketoRestClient.java:77-92``) as Marketo dataType -> Arrow
type. Where the two reference tables disagree (``percent``: LONG at
``rest/MarketoRestClient.java:86`` vs DOUBLE at
``model/MarketoField.java:80``) we follow the REST-client table (LONG),
per FIXTURES.md F3.

Timestamp formats mirror ``MarketoUtils.java:43-44``:
``%Y-%m-%dT%H:%M:%S%z`` for datetime, ``%Y-%m-%d`` for date. Arrow
timestamps are kept tz-naive UTC (DuckDB-compatible).

The widening lattice used by in-flight schema evolution follows the
same mapping: integer -> float -> string; anything -> string.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

# Marketo-side format strings (MarketoUtils.java:43-44)
MARKETO_DATETIME_FORMAT = "%Y-%m-%dT%H:%M:%S%z"
MARKETO_DATE_FORMAT = "%Y-%m-%d"

TIMESTAMP_TYPE = pa.timestamp("us")  # tz-naive UTC throughout

# Marketo dataType -> Arrow type (model/MarketoField.java:73-116,
# rest/MarketoRestClient.java:77-92; unknown types fall back to string
# per model/MarketoField.java:23-29).
MARKETO_TO_ARROW: dict[str, pa.DataType] = {
    "datetime": TIMESTAMP_TYPE,
    "date": TIMESTAMP_TYPE,
    "integer": pa.int64(),
    "score": pa.int64(),
    "percent": pa.int64(),  # REST-client table wins (LONG)
    "float": pa.float64(),
    "currency": pa.float64(),
    "boolean": pa.bool_(),
    "email": pa.string(),
    "formula": pa.string(),
    "url": pa.string(),
    "phone": pa.string(),
    "textarea": pa.string(),
    "text": pa.string(),
    "string": pa.string(),
    "reference": pa.string(),
}

# strptime format for the string->timestamp projection, per dataType
MARKETO_TS_FORMAT: dict[str, str] = {
    "datetime": MARKETO_DATETIME_FORMAT,
    "date": MARKETO_DATE_FORMAT,
}

# widening lattice rank for schema evolution (int -> float -> string)
_WIDEN_RANK = {"integer": 0, "score": 0, "percent": 0, "float": 1, "currency": 1, "string": 2}


def arrow_type_for(marketo_type: str) -> pa.DataType:
    """Unknown dataType falls back to string (model/MarketoField.java:23-29)."""
    return MARKETO_TO_ARROW.get(marketo_type, pa.string())


def widen(from_type: str, to_type: str) -> str:
    """Return the wider of the two Marketo types along the int->float->string lattice."""
    fr = _WIDEN_RANK.get(from_type, 2)
    to = _WIDEN_RANK.get(to_type, 2)
    return to_type if to >= fr else from_type


@dataclass(frozen=True)
class MarketoField:
    """(name, dataType) field-metadata pair — the unit of dynamic schema
    (model/MarketoField.java:12-45)."""

    name: str
    data_type: str

    @property
    def arrow_type(self) -> pa.DataType:
        return arrow_type_for(self.data_type)


# Column-name prefix applied to projected dynamic fields
# (MarketoUtils.java:95-98; default "mk" per
# delegate/MarketoBaseInputPluginDelegate.java:52-54).
COLUMN_PREFIX = "mk"


def prefixed(name: str, prefix: str = COLUMN_PREFIX) -> str:
    return f"{prefix}_{name}"
