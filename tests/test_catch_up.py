"""Multi-window catch-up loop (binlog-tail shape) + stage-stats artifact."""

import glob
import hashlib
import os
from datetime import timedelta

import pandas as pd

from embulk_input_marketo_ray.pipelines.cdc_replay import (
    ReplayConfig,
    replay,
    replay_until_caught_up,
)
from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
from embulk_input_marketo_ray.synth import BASE_TS, generate_change_events, load_evolution_log

N = 3000


def test_catch_up_in_small_windows_equals_one_big_window(tmp_path):
    d = str(tmp_path / "ev")
    generate_change_events(d, N, seed=31, n_repos=6, n_files=3)
    lake_steps = str(tmp_path / "lake_steps")
    lake_full = str(tmp_path / "lake_full")

    def cfg(lake, fetch_days):
        return ReplayConfig(
            events_dir=d,
            lake_dir=lake,
            evolution_log=load_evolution_log(d),
            from_ts=BASE_TS,
            job_start=BASE_TS + timedelta(seconds=N + 10),
            fetch_days=fetch_days,
            num_buckets=4,
        )

    # chain three incremental windows: each run's job_start clamps its
    # window end ("Lock down to date"), and the checkpoint carries the
    # watermark into the next run
    reports = []
    for js in (1000, 2000, N + 10):
        c = cfg(lake_steps, fetch_days=100)
        c.job_start = BASE_TS + timedelta(seconds=js)
        reports.append(replay(c))
    assert all(not r["skipped"] for r in reports)

    # catch-up API: next run is a skip (watermark at job start)
    final = replay_until_caught_up(cfg(lake_steps, fetch_days=100))
    assert final[-1]["skipped"]

    replay(cfg(lake_full, fetch_days=100))

    def ms(lake):
        t = read_lake_table(lake).select(["repo", "path", "content_sha256"])
        return sorted(map(tuple, t.to_pandas().itertuples(index=False)))

    assert ms(lake_steps) == ms(lake_full)

    # per-stage stats artifact exists and mentions the pipeline stages
    stats_file = os.path.join(lake_steps, "_state", "last_run_stats.txt")
    assert os.path.exists(stats_file)
    text = open(stats_file).read()
    assert "IngestStage" in text or "ReadParquet" in text
