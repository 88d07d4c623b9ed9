"""Watermark-sliced Parquet change-event source.

The read-side analog of the reference's bulk-extract source (SURVEY.md
§2.1 S1/S2): in this engine the "server" is the Parquet change-event
table, so a bulk-extract export job for a DateRange slice becomes
``ray.data.read_parquet`` with a pushed-down row filter for that slice
(row-group pruning keeps the scan proportional to the window, not the
table) and pruned columns.

Slices are inclusive ``[from, to]`` at second granularity with +1 s
gaps (MarketoUtils.java:100-113; the reference's API timestamps are
second-granular, MarketoUtils.java:56), so the union of slice filters
covers the window exactly once — the structural dedup guarantee D3.
"""

from __future__ import annotations

import glob

import pyarrow.dataset as pads

import ray.data

from embulk_input_marketo_ray.state.watermark import DateRange


def _slice_filter(slices: list[DateRange], ts_column: str):
    """Union of slice predicates covering the window exactly once.

    The reference's slices are inclusive at SECOND granularity with +1 s
    gaps (its API timestamps are second-granular); this engine's
    ``event_ts`` is microsecond-granular, so an inclusive [from, to]
    per-slice filter would silently drop sub-second events falling in
    the 1 s gap between adjacent slices. Interior slices are therefore
    read HALF-OPEN ``[from, next.from)`` — adjacent slices tile the
    window with no gap — and only the final slice keeps the reference's
    inclusive upper bound.
    """
    expr = None
    for i, s in enumerate(slices):
        lo = pads.field(ts_column) >= s.from_ts
        if i + 1 < len(slices):
            e = lo & (pads.field(ts_column) < slices[i + 1].from_ts)
        else:
            e = lo & (pads.field(ts_column) <= s.to_ts)
        expr = e if expr is None else (expr | e)
    return expr


def read_change_events(
    events_dir: str,
    slices: list[DateRange],
    ts_column: str = "event_ts",
    columns: list[str] | None = None,
    **read_kwargs,
) -> "ray.data.Dataset":
    """Read only the window's rows (predicate pushdown) and columns."""
    files = sorted(glob.glob(f"{events_dir}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {events_dir}")
    return ray.data.read_parquet(
        files,
        filter=_slice_filter(slices, ts_column),
        columns=columns,
        **read_kwargs,
    )
