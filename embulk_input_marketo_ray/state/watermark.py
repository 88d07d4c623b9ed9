"""Watermark slicing and checkpointing.

Reproduces the reference's incremental-window semantics:

- ``slice_range``: split ``[from, to]`` into sub-slices of at most
  ``max_range`` days where the next slice starts 1 second after the
  previous slice ends, so slices never overlap and no record is pulled
  twice (``MarketoUtils.java:100-113``; non-overlap rule at ``:110``;
  tested by ``MarketoUtilsTest.java:80-91``).
- ``clamp_to_date``: window end = ``min(from + fetch_days, job_start)``
  — "Lock down to date" future clamping
  (``delegate/MarketoBaseBulkExtractInputPlugin.java:112-123``), and a
  ``from`` in the future is a config error (``:92-110``).
- ``WatermarkCheckpoint``: the watermark advances to ``to_date`` only
  after a fully successful commit ("We will always move the range
  forward", ``delegate/MarketoBaseBulkExtractInputPlugin.java:125-137``;
  program variant carries ``report_duration``,
  ``delegate/ProgramInputPlugin.java:181-201``). Persisted as a JSON
  file written atomically (temp + ``os.replace``).

These are plan-time (driver-side) constructs: the slice list becomes
the partition spec fed into ``ray.data.read_parquet`` predicates, so
the half-open interval rule is enforced by the read filter, not by a
runtime dedup.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timedelta


@dataclass(frozen=True)
class DateRange:
    """A ``[from_ts, to_ts]`` (inclusive) watermark slice — the unit of
    bulk-extract work (MarketoUtils.java:125-144)."""

    from_ts: datetime
    to_ts: datetime

    def __post_init__(self) -> None:
        if self.from_ts > self.to_ts:
            raise ValueError(f"DateRange from_ts {self.from_ts} > to_ts {self.to_ts}")


def slice_range(
    from_ts: datetime, to_ts: datetime, max_range: timedelta = timedelta(days=30)
) -> list[DateRange]:
    """Split ``[from_ts, to_ts]`` into non-overlapping inclusive slices.

    Mirrors ``MarketoUtils.sliceRange`` (MarketoUtils.java:100-113): each
    slice spans at most ``max_range``; the next slice starts 1 second
    after the previous one ends (``:110``), so boundary records are never
    double-pulled (D3 in SURVEY.md §2.7).
    """
    if from_ts > to_ts:
        raise ValueError(f"from_ts {from_ts} is after to_ts {to_ts}")
    slices: list[DateRange] = []
    cur = from_ts
    one_sec = timedelta(seconds=1)
    while cur <= to_ts:
        end = min(cur + max_range, to_ts)
        slices.append(DateRange(cur, end))
        cur = end + one_sec
    return slices


def clamp_to_date(from_ts: datetime, fetch_days: int, job_start: datetime) -> datetime:
    """Window end = ``min(from + fetch_days, job_start)`` with validation.

    Mirrors delegate/MarketoBaseBulkExtractInputPlugin.java:92-123:
    a ``from_ts`` at or after ``job_start`` is a configuration error
    (there is nothing to fetch yet), and the window end is clamped to
    the job start so the run never reads into the future.
    """
    if from_ts >= job_start:
        raise ValueError(
            f"from_date {from_ts.isoformat()} is not before job start "
            f"{job_start.isoformat()}; nothing to import"
        )
    if fetch_days <= 0:
        raise ValueError(f"fetch_days must be positive, got {fetch_days}")
    return min(from_ts + timedelta(days=fetch_days), job_start)


_ISO = "%Y-%m-%dT%H:%M:%S.%f"


class WatermarkCheckpoint:
    """Run-level watermark, advanced only on success (W4 in SURVEY.md §2.9).

    Stored as ``<state_dir>/checkpoint.json``:
    ``{"from_date": iso, "report_duration_us": int | null, "runs": int}``.
    The write is atomic (temp file + ``os.replace``) and happens strictly
    AFTER the sink manifest commit, mirroring the reference's ConfigDiff
    being emitted only after a successful ingest
    (delegate/MarketoBaseBulkExtractInputPlugin.java:125-137).
    """

    def __init__(self, state_dir: str, filesystem=None) -> None:
        # optional pyarrow.fs routing (state/fsio.py seam); None = POSIX
        from embulk_input_marketo_ray.state.fsio import resolve_path

        if filesystem is None:
            filesystem, state_dir = resolve_path(state_dir)
        self.fs = filesystem
        self.state_dir = state_dir
        self.path = os.path.join(state_dir, "checkpoint.json")

    def load(self) -> dict | None:
        from embulk_input_marketo_ray.state.fsio import fs_exists, fs_read_json

        if not fs_exists(self.fs, self.path):
            return None
        return fs_read_json(self.fs, self.path)

    def from_date(self, default: datetime) -> datetime:
        state = self.load()
        if state is None:
            return default
        return datetime.strptime(state["from_date"], _ISO)

    def advance(self, to_date: datetime, report_duration: timedelta | None = None) -> None:
        """``from_date := to_date`` for the next run; atomic write."""
        from embulk_input_marketo_ray.state.fsio import (
            fs_mkdirs,
            fs_write_json_atomic,
        )

        fs_mkdirs(self.fs, self.state_dir)
        prev = self.load() or {"runs": 0}
        state = {
            "from_date": to_date.strftime(_ISO),
            "report_duration_us": (
                int(report_duration.total_seconds() * 1_000_000) if report_duration else None
            ),
            "runs": prev.get("runs", 0) + 1,
        }
        fs_write_json_atomic(self.fs, self.path, state)
