"""Watermark slicing / clamping / checkpoint semantics.

Mirrors the reference's unit tests: sliceRange arithmetic
(MarketoUtilsTest.java:80-91), to_date clamping and future-from
rejection (MarketoBaseBulkExtractInputPluginTest.java:58-166).
"""

from datetime import datetime, timedelta

import pytest

from embulk_input_marketo_ray.state.watermark import (
    DateRange,
    WatermarkCheckpoint,
    clamp_to_date,
    slice_range,
)

D0 = datetime(2024, 1, 1)


def test_slice_range_single():
    s = slice_range(D0, D0 + timedelta(days=10))
    assert s == [DateRange(D0, D0 + timedelta(days=10))]


def test_slice_range_plus_one_second_non_overlap():
    # 61 days -> [d0, d0+30d], [d0+30d+1s, d0+60d], [d0+60d+2s, d0+61d]
    end = D0 + timedelta(days=61)
    s = slice_range(D0, end)
    assert len(s) == 3
    assert s[0] == DateRange(D0, D0 + timedelta(days=30))
    assert s[1].from_ts == s[0].to_ts + timedelta(seconds=1)
    assert s[1].to_ts == s[1].from_ts + timedelta(days=30)
    assert s[2].from_ts == s[1].to_ts + timedelta(seconds=1)
    assert s[2].to_ts == end
    # non-overlap: every boundary pair is disjoint
    for a, b in zip(s, s[1:]):
        assert a.to_ts < b.from_ts


def test_slice_range_rejects_inverted():
    with pytest.raises(ValueError):
        slice_range(D0, D0 - timedelta(seconds=1))


def test_clamp_to_date_future_clamped():
    job_start = D0 + timedelta(days=7)
    assert clamp_to_date(D0, 30, job_start) == job_start
    assert clamp_to_date(D0, 3, job_start) == D0 + timedelta(days=3)


def test_clamp_rejects_future_from():
    with pytest.raises(ValueError):
        clamp_to_date(D0 + timedelta(days=1), 30, D0)


def test_checkpoint_advances_only_on_call(tmp_path):
    ck = WatermarkCheckpoint(str(tmp_path))
    assert ck.from_date(D0) == D0
    to = D0 + timedelta(days=30)
    ck.advance(to)
    assert ck.from_date(D0) == to
    assert ck.load()["runs"] == 1
    ck.advance(to + timedelta(days=30))
    assert ck.load()["runs"] == 2


def test_slice_filter_keeps_subsecond_boundary_events(tmp_path):
    """Microsecond-granular events falling inside the reference's 1 s
    inter-slice gap must still be read: interior slices are half-open
    [from, next.from), only the final slice is inclusive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from embulk_input_marketo_ray.sources.change_events import read_change_events

    end0 = D0 + timedelta(days=30)  # slice 0 ends here; slice 1 starts +1 s
    ts = [
        D0,  # slice 0 start
        end0,  # slice 0 inclusive end (second-granular)
        end0 + timedelta(microseconds=400_000),  # inside the 1 s gap
        end0 + timedelta(seconds=1),  # slice 1 start
        D0 + timedelta(days=40),  # final slice, interior
    ]
    table = pa.table(
        {
            "event_ts": pa.array(ts, type=pa.timestamp("us")),
            "event_id": pa.array(range(len(ts)), type=pa.int64()),
        }
    )
    pq.write_table(table, tmp_path / "events_0.parquet")
    slices = slice_range(D0, D0 + timedelta(days=40))
    assert len(slices) == 2
    got = read_change_events(str(tmp_path), slices)
    assert sorted(r["event_id"] for r in got.take_all()) == [0, 1, 2, 3, 4]
    # and an event past the window end stays excluded
    got2 = read_change_events(str(tmp_path), slice_range(D0, D0 + timedelta(days=35)))
    assert sorted(r["event_id"] for r in got2.take_all()) == [0, 1, 2, 3]
