"""Skew handling and fault-injected replay.

- Hot-key skew: one (repo, path) key carrying a large share of all
  events must not blow up a shuffle partition — the pre-shuffle partial
  combine collapses each block to <=1 row per key, so the exchange
  moves O(blocks) rows per key, not O(events) (SURVEY.md §7.3 skew).
- Transient extractor faults mid-replay retry inside the actor and the
  run still converges to the oracle state (T3 semantics end-to-end).
"""

import hashlib
from datetime import timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
from embulk_input_marketo_ray.state.manifest import PartitionManifest
from embulk_input_marketo_ray.synth import BASE_TS, generate_change_events, load_evolution_log

N = 3000


@pytest.fixture(scope="module")
def hot_key_events(tmp_path_factory):
    """Events where ONE key receives half of all updates (ultra-hot)."""
    d = str(tmp_path_factory.mktemp("hot"))
    generate_change_events(d, N, seed=3, n_repos=6, n_files=3)
    import glob

    files = sorted(glob.glob(f"{d}/events_*.parquet"))
    t = pq.read_table(files[0])
    half = t.num_rows // 2
    hot_repo = pa.array(["org/hot"] * half + t.column("repo").to_pylist()[half:])
    hot_path = pa.array(["HOT.py"] * half + t.column("path").to_pylist()[half:])
    t = t.set_column(t.schema.get_field_index("repo"), "repo", hot_repo)
    t = t.set_column(t.schema.get_field_index("path"), "path", hot_path)
    pq.write_table(t, files[0])
    return d


def test_hot_key_replay_correct_and_bounded(hot_key_events, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = ReplayConfig(
        events_dir=hot_key_events,
        lake_dir=lake,
        evolution_log=load_evolution_log(hot_key_events),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=N + 50),
        fetch_days=100,
        num_buckets=8,
        batch_size=256,  # many blocks -> exercises the per-block combine
    )
    replay(cfg)
    got = read_lake_table(lake).to_pandas()
    # the hot key survives as exactly ONE row with the max upsert seq
    hot = got[(got.repo == "org/hot") & (got.path == "HOT.py")]
    assert len(hot) == 1
    import glob

    df = pd.concat(pd.read_parquet(f) for f in glob.glob(f"{hot_key_events}/events_*.parquet"))
    hot_events = df[(df.repo == "org/hot") & (df.path == "HOT.py")]
    winner = hot_events.sort_values("commit_seq", kind="stable").iloc[-1]
    assert winner.op == "upsert" or len(hot) == 0  # if delete won, row absent
    if winner.op == "upsert":
        assert hot.commit_seq.iloc[0] == winner.commit_seq
    # lineage: dropped counts account for the collapsed hot versions
    stats = PartitionManifest(lake).load()["partitions"]
    assert sum(s["dropped"] for s in stats.values()) > 0


def test_replay_with_transient_extractor_faults(tmp_path):
    d = str(tmp_path / "ev")
    generate_change_events(d, 1500, seed=21, n_repos=5, n_files=2)
    lake_ok = str(tmp_path / "lake_ok")
    lake_faulty = str(tmp_path / "lake_faulty")

    def cfg(lake, **kw):
        return ReplayConfig(
            events_dir=d,
            lake_dir=lake,
            evolution_log=load_evolution_log(d),
            from_ts=BASE_TS,
            job_start=BASE_TS + timedelta(seconds=1550),
            fetch_days=100,
            num_buckets=4,
            **kw,
        )

    replay(cfg(lake_ok))
    # every ~3rd page hits a transient fault; retries absorb them
    replay(cfg(lake_faulty, extractor_kwargs={"fault_rate": 0.3}))

    def ms(lake):
        t = read_lake_table(lake).select(["repo", "path", "content_sha256"])
        return sorted(map(tuple, t.to_pandas().itertuples(index=False)))

    assert ms(lake_ok) == ms(lake_faulty)
