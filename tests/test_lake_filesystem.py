"""The pyarrow.fs seam (state/fsio.py): the lake's full lifecycle —
replay commit, merge-on-read, time travel, CDC feed, point lookup,
compaction, vacuum — running on a ``pyarrow.fs.SubTreeFileSystem``
rooted in tmp, byte-compared against the same replay on the plain
local path. Proves every state operation routes through the injected
filesystem (an unrouted ``os.*`` call would resolve against the cwd
and fail or diverge), which is the object-store readiness seam the
sandbox can actually test (no S3 endpoint here; the S3 rename caveat
is documented in fsio.py)."""

from datetime import timedelta

import pyarrow.fs as pafs
import pytest

from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
from embulk_input_marketo_ray.sinks.exactly_once import (
    changes_between,
    compact,
    lake_stats,
    lookup_keys,
    read_lake_table,
    snapshot_diff,
    vacuum,
)
from embulk_input_marketo_ray.synth import (
    BASE_TS,
    generate_change_events,
    load_evolution_log,
)

N = 4000


def _cfg(events_dir, lake_dir, job_offset_s, fs=None):
    return ReplayConfig(
        events_dir=events_dir,
        lake_dir=lake_dir,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=job_offset_s),
        fetch_days=100,
        num_buckets=8,
        lake_layout="delta",
        compact_threshold=100,
        lake_filesystem=fs,
    )


def _sorted_state(lake_dir, fs=None, **kw):
    t = read_lake_table(
        lake_dir, columns=["repo", "path", "commit_seq", "content_sha256"],
        filesystem=fs, **kw,
    )
    return t.sort_by([("repo", "ascending"), ("path", "ascending")])


def test_lake_lifecycle_on_subtree_filesystem(ray_session, tmp_path):
    events = str(tmp_path / "events")
    generate_change_events(events, N, seed=31, n_repos=12, n_files=5, force=True)

    # reference lake: plain local path, no filesystem injection
    local_lake = str(tmp_path / "local_lake")
    r1l = replay(_cfg(events, local_lake, N // 2))
    r2l = replay(_cfg(events, local_lake, N + 50))

    # seam lake: SubTreeFileSystem rooted at tmp — the lake path is
    # RELATIVE to the subtree, so any unrouted os.* access breaks
    root = tmp_path / "subtree_root"
    root.mkdir()
    fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())
    r1 = replay(_cfg(events, "fs_lake", N // 2, fs=fs))
    r2 = replay(_cfg(events, "fs_lake", N + 50, fs=fs))
    assert (r1["from"], r1["to"]) == (r1l["from"], r1l["to"])
    assert (r2["from"], r2["to"]) == (r2l["from"], r2l["to"])
    assert (root / "fs_lake" / "manifest.json").exists()  # landed in the subtree

    # merge-on-read equality, head state and time travel
    assert _sorted_state("fs_lake", fs=fs).equals(_sorted_state(local_lake))
    assert _sorted_state("fs_lake", fs=fs, as_of=r1["to"]).equals(
        _sorted_state(local_lake, as_of=r1l["to"])
    )

    # CDC feed + snapshot diff across the two windows
    feed_fs = (
        changes_between("fs_lake", since=r1["to"], until=r2["to"], filesystem=fs)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    feed_local = (
        changes_between(local_lake, since=r1l["to"], until=r2l["to"])
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert feed_fs.equals(feed_local)
    diff_fs = (
        snapshot_diff("fs_lake", v1=r1["to"], v2=r2["to"], filesystem=fs)
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    diff_local = (
        snapshot_diff(local_lake, v1=r1l["to"], v2=r2l["to"])
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    assert diff_fs.equals(diff_local)

    # point lookup through the routed manifest
    head = _sorted_state(local_lake)
    keys = [
        (head.column("repo")[i].as_py(), head.column("path")[i].as_py())
        for i in (0, head.num_rows // 2)
    ]
    lk = lookup_keys("fs_lake", keys, filesystem=fs)
    assert lk.num_rows == len(set(keys))

    # metadata-only stats see both layers
    st = lake_stats("fs_lake", filesystem=fs)
    assert st["totals"]["files"] >= 2 and st["totals"]["rows"] > 0

    # maintenance: compact folds deltas to one base per pid; reads
    # unchanged; vacuum reclaims superseded deltas INSIDE the subtree
    done = compact("fs_lake", filesystem=fs)
    assert done and all(r["files_merged"] >= 2 for r in done)
    assert _sorted_state("fs_lake", fs=fs).equals(_sorted_state(local_lake))
    removed = vacuum("fs_lake", filesystem=fs)
    assert removed and all(not p.startswith("/") for p in removed)
    assert _sorted_state("fs_lake", fs=fs).equals(_sorted_state(local_lake))

    # pre-compaction history is refused loudly, same as local
    with pytest.raises(ValueError):
        read_lake_table("fs_lake", as_of=r1["to"], filesystem=fs)

    # W5: an immediate re-run reads the routed checkpoint and skips
    r3 = replay(_cfg(events, "fs_lake", N + 50, fs=fs))
    assert r3["skipped"] is True
