"""LWW merge kernel: keep-newest per key, tombstones, idempotence."""

import pyarrow as pa

from embulk_input_marketo_ray.stages.lww import add_bucket_and_partial_lww, lww_merge


def _events():
    return pa.table(
        {
            "repo": ["r1", "r1", "r1", "r2", "r2", "r1"],
            "path": ["a", "a", "b", "a", "a", "a"],
            "commit_seq": pa.array([1, 5, 2, 3, 4, 5], type=pa.int64()),
            "op": ["upsert", "upsert", "upsert", "upsert", "delete", "upsert"],
            "v": [10, 50, 20, 30, 40, 50],
        }
    )


def test_lww_keeps_newest_per_key():
    out = lww_merge(_events())
    rows = {(r["repo"], r["path"]): r["v"] for r in out.to_pylist()}
    # (r1,a): seq 5 wins (duplicated replay of seq 5 collapses to one row)
    # (r2,a): newest is a delete -> dropped
    assert rows == {("r1", "a"): 50, ("r1", "b"): 20}


def test_lww_order_insensitive():
    t = _events()
    shuffled = t.take(pa.array([5, 3, 0, 4, 2, 1]))
    assert lww_merge(t).sort_by("v").to_pylist() == lww_merge(shuffled).sort_by("v").to_pylist()


def test_lww_idempotent():
    once = lww_merge(_events())
    twice = lww_merge(once)
    assert once.sort_by("v").to_pylist() == twice.sort_by("v").to_pylist()


def test_delete_then_recreate():
    t = pa.table(
        {
            "repo": ["r", "r", "r"],
            "path": ["p", "p", "p"],
            "commit_seq": pa.array([1, 2, 3], type=pa.int64()),
            "op": ["upsert", "delete", "upsert"],
            "v": [1, 2, 3],
        }
    )
    out = lww_merge(t)
    assert out.to_pylist() == [{"repo": "r", "path": "p", "commit_seq": 3, "op": "upsert", "v": 3}]


def test_partial_combiner_keeps_tombstones():
    out = add_bucket_and_partial_lww(_events(), num_buckets=8)
    rows = {(r["repo"], r["path"]): r for r in out.to_pylist()}
    # tombstone for (r2,a) must survive the partial combine
    assert rows[("r2", "a")]["op"] == "delete"
    assert rows[("r1", "a")]["commit_seq"] == 5
    assert "bucket" in out.column_names


def test_empty_table_passthrough():
    empty = _events().slice(0, 0)
    assert lww_merge(empty).num_rows == 0
