"""In-flight schema evolution with PHYSICALLY heterogeneous source files.

The real evolution hard case (SURVEY.md §7.3): older Parquet segments
were written before a column existed, so blocks arrive with different
schemas. The normalizer must project every block to the final evolved
schema (missing columns -> typed nulls) so the downstream shuffle sees
aligned blocks, and the lake must match a pandas oracle that replays
the same heterogeneous input.
"""

import glob
import hashlib
import os
from datetime import timedelta

import pandas as pd
import pyarrow.parquet as pq
import pytest

from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
from embulk_input_marketo_ray.synth import BASE_TS, generate_change_events, load_evolution_log

N = 2000


@pytest.fixture(scope="module")
def het_events_dir(tmp_path_factory):
    """Generate events, then strip the late-evolution columns from the
    EARLY files — simulating segments written before the columns existed."""
    d = str(tmp_path_factory.mktemp("het_events"))
    generate_change_events(d, N, seed=13, n_repos=8, n_files=4)
    files = sorted(glob.glob(f"{d}/events_*.parquet"))
    for f in files[:2]:  # early segments: attr_updated not yet invented
        t = pq.read_table(f)
        t = t.drop_columns(["attr_updated"])
        pq.write_table(t, f)
    return d


def test_replay_over_heterogeneous_files(het_events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(
        events_dir=het_events_dir,
        lake_dir=lake,
        evolution_log=load_evolution_log(het_events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=N + 50),
        fetch_days=100,
        num_buckets=8,
    )
    report = replay(cfg)
    assert report["events_read"] > 0
    got = read_lake_table(lake)

    # oracle: same replay in pandas over the heterogeneous files
    frames = []
    for f in sorted(glob.glob(f"{het_events_dir}/events_*.parquet")):
        frames.append(pd.read_parquet(f))
    df = pd.concat(frames, ignore_index=True)  # missing col -> NaN
    df = df.sort_values("commit_seq", kind="stable").drop_duplicates(
        ["repo", "path"], keep="last"
    )
    df = df[df.op == "upsert"]
    df["content_sha256"] = df.content.map(lambda c: hashlib.sha256(c.encode()).hexdigest())

    left = sorted(
        map(tuple, got.select(["repo", "path", "content_sha256"]).to_pandas().itertuples(index=False))
    )
    right = sorted(map(tuple, df[["repo", "path", "content_sha256"]].itertuples(index=False)))
    assert left == right

    # final schema still carries the evolved column, typed
    import pyarrow as pa

    assert pa.types.is_timestamp(got.schema.field("mk_updated").type)
    # rows whose winning version came from an early (pre-column) segment
    # have null mk_updated; late-segment winners are populated
    gdf = got.select(["commit_seq", "mk_updated"]).to_pandas()
    early_winners = gdf[gdf.commit_seq < N // 2]
    assert early_winners.mk_updated.isna().all()
    assert gdf[gdf.commit_seq >= (2 * N) // 3].mk_updated.notna().any()


def test_narrowed_included_fields_preserves_committed_columns(tmp_path):
    """A second incremental run with a NARROWED included_fields must not
    delete already-committed mk_ columns from rewritten buckets: the
    sink unifies toward the union of stored lake schema and the new
    target schema."""
    d = str(tmp_path / "events")
    generate_change_events(d, N, seed=17, n_repos=8, n_files=4)
    lake = str(tmp_path / "lake")

    def cfg_for(job_end_s, included):
        return ReplayConfig(
            events_dir=d,
            lake_dir=lake,
            evolution_log=load_evolution_log(d),
            from_ts=BASE_TS,
            job_start=BASE_TS + timedelta(seconds=job_end_s),
            fetch_days=100,
            num_buckets=4,
            included_fields=included,
        )

    # window 1 (clamped to mid-stream): full dynamic schema
    r1 = replay(cfg_for(job_end_s=N // 2, included=None))
    assert not r1["skipped"]
    full_cols = set(read_lake_table(lake).column_names)
    assert "mk_score" in full_cols

    # window 2: narrowed keep-list drops 'score' from the TARGET schema
    r2 = replay(cfg_for(job_end_s=N + 50, included=["revenue"]))
    assert not r2["skipped"]
    got = read_lake_table(lake)
    # committed column survives in rewritten partitions
    assert "mk_score" in got.column_names
    gdf = got.to_pandas()
    # window-1 winners whose newest version predates window 2 keep it
    assert gdf.mk_score.notna().any()
