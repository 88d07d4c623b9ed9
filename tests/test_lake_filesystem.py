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


def test_index_lifecycle_on_subtree_filesystem(ray_session, tmp_path):
    """Both persisted indexes run their full lifecycle (init, ingest,
    delete, re-ingest, probe, compact, vacuum) through an injected
    SubTreeFileSystem, verdict-equal to the plain local path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle
    from embulk_input_marketo_ray.stages import sig_index as si
    from embulk_input_marketo_ray.stages import vec_index as vi

    _ensure_hash_shuffle()
    root = tmp_path / "idx_root"
    root.mkdir()
    fs = pafs.SubTreeFileSystem(str(root), pafs.LocalFileSystem())

    long_a = "the quick brown fox jumps over the lazy dog " * 30
    long_b = "entirely different content about query engines " * 30

    def docs(rows):
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": pa.array([r[1] for r in rows]),
                }
            )
        )

    def drive_sig(idx, fskw):
        si.init_index(idx, **fskw)
        r1 = si.ingest(idx, docs([(10, long_a), (20, long_b)]), "w1", **fskw)
        si.delete_docs(idx, [10], "d1", **fskw)
        r2 = si.ingest(idx, docs([(10, long_a)]), "w2", **fskw)  # re-admit
        si.compact_index(idx, **fskw)
        si.vacuum_index(idx, grace_seconds=0, **fskw)
        r3 = si.probe_docs(idx, docs([(31, long_a), (32, long_b)]), **fskw)
        return [t.to_pylist() for t in (r1, r2, r3)]

    got = drive_sig("sig_idx", {"filesystem": fs})
    want = drive_sig(str(tmp_path / "sig_local"), {})
    assert got == want
    assert (root / "sig_idx" / "manifest.json").exists()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((64, 8))
    x[1] = x[0]
    vecs = pa.table(
        {
            "vec_id": pa.array(np.arange(64), type=pa.int64()),
            "embedding": pa.array([r.tolist() for r in x], type=pa.list_(pa.float64())),
        }
    )
    q = vecs.slice(0, 1)

    def drive_vec(idx, fskw):
        vi.init_vec_index(idx, n_centroids=2, train_rows=64, **fskw)
        vi.ingest_vectors(idx, rd.from_arrow(vecs), "w1", **fskw)
        vi.delete_vectors(idx, [1], "d1", **fskw)
        vi.compact_vec_index(idx, **fskw)
        vi.vacuum_vec_index(idx, grace_seconds=0, **fskw)
        return vi.ann_topk_index(idx, q, k=3, n_probe=2, **fskw).to_pylist()

    gv = drive_vec("vec_idx", {"filesystem": fs})
    wv = drive_vec(str(tmp_path / "vec_local"), {})
    assert gv == wv
    assert (root / "vec_idx" / "centroids.parquet").exists()
