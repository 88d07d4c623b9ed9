"""Synthetic change-event generator: determinism + required properties."""

import glob

import pandas as pd
import pyarrow.parquet as pq

from embulk_input_marketo_ray.synth import generate_change_events, load_evolution_log


def _read_all(d):
    return pd.concat(pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/events_*.parquet")))


def test_deterministic(tmp_path):
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    generate_change_events(d1, 2000, seed=11, n_files=3)
    generate_change_events(d2, 2000, seed=11, n_files=3)
    pd.testing.assert_frame_equal(_read_all(d1).reset_index(drop=True), _read_all(d2).reset_index(drop=True))


def test_required_properties(tmp_path):
    d = str(tmp_path / "ev")
    generate_change_events(d, 3000, seed=5, n_repos=10, n_files=2)
    df = _read_all(d)
    # duplicated replayed events exist (same commit_seq twice, identical rows)
    assert df.commit_seq.duplicated().any()
    dups = df[df.commit_seq.duplicated(keep=False)].sort_values("commit_seq")
    g = dups.groupby("commit_seq").nunique()
    assert (g.commit == 1).all() and (g.content == 1).all()
    # tombstones exist
    assert (df.op == "delete").any()
    # multiple versions of the same key
    assert df.groupby(["repo", "path"]).size().max() > 1
    # skewed repos: hottest repo sees far more events than the median
    counts = df.repo.value_counts()
    assert counts.iloc[0] > 3 * counts.median()
    # evolution log is present and well-formed
    evo = load_evolution_log(d)
    assert {e["kind"] for e in evo} == {"add_column", "widen_type"}


def test_idempotent_cache(tmp_path):
    d = str(tmp_path / "ev")
    generate_change_events(d, 500, seed=1)
    m1 = sorted(glob.glob(f"{d}/events_*.parquet"))
    import os

    times = [os.path.getmtime(f) for f in m1]
    generate_change_events(d, 500, seed=1)  # cached: no rewrite
    assert [os.path.getmtime(f) for f in m1] == times
