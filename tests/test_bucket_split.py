"""Extendible-hash bucket splitting (lake growth beyond num_buckets).

The 100 TB design point: a fixed bucket count chosen on day one means
buckets grow without bound as the lake grows. With
``split_threshold_rows`` set, an oversized bucket splits into
suffix children (stages/lww.py routing; sinks/exactly_once.py
split_pieces) — rewrites stay bounded to the one oversized partition
and the routing directory stays a few KB.

Covers: directory construction, routing/modulo equivalence, split
correctness vs the pandas oracle in BOTH lake layouts, the per-file
suffix invariant, and crash-resume convergence under splitting.
"""

import glob
import hashlib
import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from datetime import timedelta

from embulk_input_marketo_ray.functions.scalar import stable_key_hash, stable_key_hash_raw
from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table, split_pieces
from embulk_input_marketo_ray.stages.lww import (
    bucket_depths,
    build_directory,
    route_buckets,
)
from embulk_input_marketo_ray.state.manifest import PartitionManifest
from embulk_input_marketo_ray.synth import (
    BASE_TS,
    generate_change_events,
    load_evolution_log,
)

N_EVENTS = 5000


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("split_events"))
    generate_change_events(d, N_EVENTS, seed=17, n_repos=24, n_files=4)
    return d


def oracle_multiset(events_dir, to_ts):
    df = pd.concat(
        pd.read_parquet(f) for f in sorted(glob.glob(f"{events_dir}/events_*.parquet"))
    )
    df = df[df.event_ts <= to_ts]
    df = df.sort_values("commit_seq", kind="stable").drop_duplicates(
        ["repo", "path"], keep="last"
    )
    df = df[df.op == "upsert"]
    df["content_sha256"] = df.content.map(
        lambda c: hashlib.sha256(c.encode()).hexdigest()
    )
    return sorted(
        map(tuple, df[["repo", "path", "content_sha256"]].itertuples(index=False))
    )


def lake_multiset(lake):
    t = read_lake_table(lake).select(["repo", "path", "content_sha256"])
    return sorted(map(tuple, t.to_pandas().itertuples(index=False)))


def cfg_for(events_dir, lake_dir, **kw):
    base = dict(
        events_dir=events_dir,
        lake_dir=lake_dir,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=N_EVENTS + 50),
        fetch_days=100,
        num_buckets=4,
        split_threshold_rows=40,
        extractor_concurrency=(1, 2),
    )
    base.update(kw)
    return ReplayConfig(**base)


# ---------------------------------------------------------------------------
# directory construction + routing units
# ---------------------------------------------------------------------------


def test_build_directory_identity_before_splits():
    depths = {b: 3 for b in range(8)}
    d = build_directory(depths)
    assert d.tolist() == list(range(8))


def test_build_directory_after_split():
    # bucket 3 (depth 3) split into 3 and 11 at depth 4
    depths = {b: 3 for b in range(8)}
    depths[3] = 4
    depths[11] = 4
    d = build_directory(depths)
    assert len(d) == 16
    for idx, owner in enumerate(d.tolist()):
        depth = depths[owner]
        assert idx & ((1 << depth) - 1) == owner


def test_build_directory_rejects_inconsistent_map():
    depths = {b: 3 for b in range(8)}
    depths[3] = 4  # parent deepened but child 11 missing
    with pytest.raises(RuntimeError, match="unowned hash suffixes"):
        build_directory(depths)


def test_routing_matches_modulo_at_initial_depth():
    t = pa.table(
        {
            "repo": [f"r{i % 13}" for i in range(500)],
            "path": [f"p{i}" for i in range(500)],
        }
    )
    directory = build_directory({b: 4 for b in range(16)})
    via_dir = route_buckets(t, directory)
    via_mod = stable_key_hash(t, ["repo", "path"], 16)
    np.testing.assert_array_equal(via_dir, via_mod)


def test_split_pieces_partitions_by_suffix_bit():
    t = pa.table(
        {
            "repo": [f"r{i}" for i in range(200)],
            "path": [f"p{i}" for i in range(200)],
        }
    )
    pieces = split_pieces(t, suffix=0, depth=0, split_threshold=60, max_depth=8)
    assert sum(p.num_rows for _, _, p in pieces) == 200
    assert all(p.num_rows <= 60 for _, _, p in pieces)
    seen = set()
    for suffix, depth, piece in pieces:
        assert (suffix, depth) not in seen
        seen.add((suffix, depth))
        raw = stable_key_hash_raw(piece, ["repo", "path"])
        assert (raw & np.uint64((1 << depth) - 1) == suffix).all()


# ---------------------------------------------------------------------------
# end-to-end: split lake equals oracle, per-file suffix invariant holds
# ---------------------------------------------------------------------------


def _check_suffix_invariant(lake):
    """Every committed partition holds exactly the keys whose hash
    suffix matches its pid at its manifest depth."""
    manifest = PartitionManifest(lake)
    state = manifest.load()["partitions"]
    n_checked = 0
    for pid, entry in state.items():
        depth = entry["depth"]
        for name in entry.get("files") or [f"part-{pid}.parquet"]:
            t = pq.read_table(manifest.file_path(name), columns=["repo", "path"])
            if t.num_rows == 0:
                continue
            raw = stable_key_hash_raw(t, ["repo", "path"])
            assert (raw & np.uint64((1 << depth) - 1) == int(pid)).all(), (
                f"rows in {name} violate suffix {pid} at depth {depth}"
            )
            n_checked += 1
    assert n_checked > 0
    return state


def test_rewrite_layout_split_matches_oracle(events_dir, tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    report = replay(cfg_for(events_dir, lake))
    assert not report["skipped"]
    state = _check_suffix_invariant(lake)
    # splitting actually happened: more partitions than the initial 4,
    # and every partition is within threshold (or at max depth)
    assert len(state) > 4
    assert max(e["depth"] for e in state.values()) > 2
    assert all(e["rows"] <= 40 for e in state.values())
    to_ts = pd.Timestamp(BASE_TS) + pd.Timedelta(seconds=N_EVENTS + 50)
    assert lake_multiset(lake) == oracle_multiset(events_dir, to_ts)


def test_delta_layout_split_at_compaction_matches_oracle(events_dir, tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    # several incremental windows so compaction (and the split inside
    # it) actually triggers
    for js in (1000, 2000, 3000, 4000, N_EVENTS + 50):
        cfg = cfg_for(
            events_dir, lake, lake_layout="delta", compact_threshold=2
        )
        cfg.job_start = BASE_TS + timedelta(seconds=js)
        replay(cfg)
    state = _check_suffix_invariant(lake)
    assert len(state) > 4
    to_ts = pd.Timestamp(BASE_TS) + pd.Timedelta(seconds=N_EVENTS + 50)
    assert lake_multiset(lake) == oracle_multiset(events_dir, to_ts)


def test_split_incremental_routing_after_split(events_dir, tmp_path, ray_session):
    """A second window routed by the post-split directory produces the
    same lake as one big window (splits chain across windows)."""
    lake_steps = str(tmp_path / "steps")
    for js in (2500, N_EVENTS + 50):
        cfg = cfg_for(events_dir, lake_steps)
        cfg.job_start = BASE_TS + timedelta(seconds=js)
        replay(cfg)
    lake_full = str(tmp_path / "full")
    replay(cfg_for(events_dir, lake_full))
    assert lake_multiset(lake_steps) == lake_multiset(lake_full)
    _check_suffix_invariant(lake_steps)


def test_split_crash_resume_converges(events_dir, tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    crash_cfg = cfg_for(events_dir, lake, fail_buckets=frozenset({1}))
    with pytest.raises(Exception):
        replay(crash_cfg)
    # nothing committed for the crashed run beyond completed buckets;
    # manifest is still loadable and the retry converges
    report = replay(cfg_for(events_dir, lake))
    assert not report["skipped"]
    to_ts = pd.Timestamp(BASE_TS) + pd.Timedelta(seconds=N_EVENTS + 50)
    assert lake_multiset(lake) == oracle_multiset(events_dir, to_ts)
    _check_suffix_invariant(lake)


def test_split_requires_power_of_two_buckets(events_dir, tmp_path, ray_session):
    cfg = cfg_for(events_dir, str(tmp_path / "lake"), num_buckets=6)
    with pytest.raises(ValueError, match="power-of-two"):
        replay(cfg)


def test_split_disabled_manifest_has_no_depth(events_dir, tmp_path, ray_session):
    lake = str(tmp_path / "lake")
    replay(cfg_for(events_dir, lake, split_threshold_rows=None))
    state = PartitionManifest(lake).load()["partitions"]
    assert state and all("depth" not in e for e in state.values())


def test_lookup_keys_prunes_to_routed_buckets(events_dir, tmp_path):
    """Point lookup routes through the SPLIT directory (not plain
    modulo) and returns exactly the head state of the requested keys;
    missing keys are absent; the num_buckets manifest stamp is present."""
    from embulk_input_marketo_ray.sinks.exactly_once import lookup_keys

    lake = str(tmp_path / "lake")
    replay(cfg_for(events_dir, lake))
    state = PartitionManifest(lake).load()
    assert state["num_buckets"] == 4
    assert any("depth" in e for e in state["partitions"].values())  # split happened

    full = read_lake_table(lake).to_pandas()
    keys = [tuple(r) for r in full[["repo", "path"]].head(5).itertuples(index=False)]
    keys.append(("org/no-such-repo", "nope.py"))
    got = (
        lookup_keys(lake, keys, columns=["repo", "path", "content_sha256"])
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    want = (
        full[[(r, p) in set(keys) for r, p in zip(full.repo, full.path)]][
            ["repo", "path", "content_sha256"]
        ]
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == 5  # the missing key contributed nothing
