"""Late-materialization (two-phase LWW) replay plan.

The late plan scans only the key+version columns, reduces to per-key
winners, and ingests/normalizes/ships ONLY winning rows — the rest of
the engine (exactly-once sink, manifest, resume, layouts, splitting)
is unchanged, so these tests pin plan EQUIVALENCE: the late lake must
be bit-identical (multiset + per-partition fingerprints) to the eager
lake on the same window, including crash-resume and the delta layout.
"""

import os
from datetime import timedelta

import pytest

from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
from embulk_input_marketo_ray.state.manifest import PartitionManifest
from embulk_input_marketo_ray.synth import (
    BASE_TS,
    generate_change_events,
    load_evolution_log,
)

N_EVENTS = 4000


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_late"))
    # 12 repos x 64 paths << 4000 events: a version-heavy window where
    # the late plan pays off (and auto should select it)
    generate_change_events(d, N_EVENTS, seed=7, n_repos=12, n_files=4)
    return d


def cfg_for(events_dir, lake_dir, **kw):
    kw.setdefault("fetch_days", 100)
    # fixtures are far below the production small-window floor; disable
    # it so these tests exercise the late plan (the floor itself is
    # covered by test_auto_small_window_floor)
    kw.setdefault("late_min_events", 0)
    return ReplayConfig(
        events_dir=events_dir,
        lake_dir=lake_dir,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=N_EVENTS + 50),
        num_buckets=8,
        **kw,
    )


def multiset(lake_dir):
    df = read_lake_table(lake_dir).select(["repo", "path", "content_sha256"]).to_pandas()
    return sorted(map(tuple, df.itertuples(index=False)))


def fingerprints(lake_dir):
    return {
        p: s["fingerprint"]
        for p, s in PartitionManifest(lake_dir).load()["partitions"].items()
    }


def test_late_matches_eager_bit_for_bit(events_dir, tmp_path):
    lake_e = str(tmp_path / "lake_eager")
    lake_l = str(tmp_path / "lake_late")
    re = replay(cfg_for(events_dir, lake_e, materialization="eager"))
    rl = replay(cfg_for(events_dir, lake_l, materialization="late"))
    assert re["materialization"] == "eager"
    assert rl["materialization"] == "late"
    # protocol accounting sees the FULL stream in both plans
    # (synth injects ~2% replayed duplicates, so > N_EVENTS)
    assert rl["events_read"] == re["events_read"] >= N_EVENTS
    assert rl["rows_out"] == re["rows_out"]
    assert multiset(lake_e) == multiset(lake_l)
    assert fingerprints(lake_e) == fingerprints(lake_l)
    # scratch is cleaned up
    assert not os.path.exists(os.path.join(lake_l, "_shuffle_scan"))
    assert not os.path.exists(os.path.join(lake_l, "_shuffle_late"))


def test_auto_picks_late_on_version_heavy_window(events_dir, tmp_path):
    r = replay(cfg_for(events_dir, str(tmp_path / "lake"), materialization="auto"))
    assert r["materialization"] == "late"
    assert 0 < r["winner_rows"] <= r["scanned_rows"]
    assert r["scanned_rows"] >= N_EVENTS


def test_auto_small_window_floor(events_dir, tmp_path):
    # with the default late_min_events floor, a 4k-event window goes
    # eager WITHOUT paying the winner scan (footer-only estimate)
    r = replay(
        cfg_for(
            events_dir, str(tmp_path / "lake"), late_min_events=200_000
        )
    )
    assert r["materialization"] == "eager"
    assert r["winner_rows"] is None and r["scanned_rows"] is None


def test_auto_falls_back_to_eager_on_unique_keys(tmp_path):
    # keyspace (200 x 64) far larger than the event count: most keys
    # are written once, the winner set ~= the window — a second full
    # read buys nothing, so auto must pick the single-pass plan
    d = str(tmp_path / "events_uniq")
    generate_change_events(d, 2000, seed=3, n_repos=200, n_files=4)
    cfg = ReplayConfig(
        events_dir=d,
        lake_dir=str(tmp_path / "lake"),
        evolution_log=load_evolution_log(d),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=2050),
        fetch_days=100,
        num_buckets=8,
        late_min_events=0,  # exercise the RATIO fallback, not the size floor
    )
    r = replay(cfg)
    assert r["materialization"] == "eager"
    assert r["winner_rows"] > cfg.late_ratio * r["scanned_rows"]


def test_late_broadcast_limit_enforced(events_dir, tmp_path):
    with pytest.raises(ValueError, match="late_broadcast_limit"):
        replay(
            cfg_for(
                events_dir,
                str(tmp_path / "lake"),
                materialization="late",
                late_broadcast_limit=16,
            )
        )


def test_late_crash_resume_converges(events_dir, tmp_path):
    lake_ok = str(tmp_path / "lake_ok")
    lake_crash = str(tmp_path / "lake_crash")
    replay(cfg_for(events_dir, lake_ok, materialization="late"))
    with pytest.raises(Exception):
        replay(
            cfg_for(
                events_dir,
                lake_crash,
                materialization="late",
                fail_buckets=frozenset({2, 5}),
            )
        )
    # a crashed window commits NOTHING (single atomic manifest commit);
    # the retry re-runs the whole window and converges
    assert PartitionManifest(lake_crash).committed_ids() == set()
    replay(cfg_for(events_dir, lake_crash, materialization="late"))
    assert multiset(lake_ok) == multiset(lake_crash)
    assert fingerprints(lake_ok) == fingerprints(lake_crash)


def test_late_skips_committed_buckets(events_dir, tmp_path):
    # after a committed run, re-running the same window (checkpoint
    # dropped) must skip every bucket: the winner scan filters committed
    # buckets BEFORE the full-column pass, so pass 2 ships zero rows
    lake = str(tmp_path / "lake")
    replay(cfg_for(events_dir, lake, materialization="late"))
    os.remove(os.path.join(lake, "_state", "checkpoint.json"))
    r = replay(cfg_for(events_dir, lake, materialization="late"))
    assert r["buckets_skipped"] == len(PartitionManifest(lake).committed_ids())
    assert r["buckets_written"] == 0
    assert r["winner_rows"] == 0


def test_late_delta_layout_matches_rewrite(events_dir, tmp_path):
    lake_r = str(tmp_path / "lake_rewrite")
    lake_d = str(tmp_path / "lake_delta")
    # two incremental windows so the delta layout actually appends
    for lake, layout in ((lake_r, "rewrite"), (lake_d, "delta")):
        replay(
            cfg_for(
                events_dir, lake, materialization="late", lake_layout=layout, fetch_days=1
            )
        )
        replay(
            cfg_for(
                events_dir, lake, materialization="late", lake_layout=layout, fetch_days=100
            )
        )
    assert multiset(lake_r) == multiset(lake_d)


def test_late_actor_ingest_mode(events_dir, tmp_path):
    lake_t = str(tmp_path / "lake_tasks")
    lake_a = str(tmp_path / "lake_actors")
    replay(cfg_for(events_dir, lake_t, materialization="late", ingest_mode="tasks"))
    replay(
        cfg_for(
            events_dir,
            lake_a,
            materialization="late",
            ingest_mode="actors",
            extractor_concurrency=(1, 2),
        )
    )
    assert multiset(lake_t) == multiset(lake_a)


def test_invalid_events_dead_lettered_both_plans(events_dir, tmp_path):
    """Events with a null key/version/op or an unknown op are dropped
    (counted, not ingested) by BOTH plans, and the two plans still
    agree bit-for-bit."""
    import shutil
    import glob as _glob
    import pyarrow as pa
    import pyarrow.parquet as pq

    poisoned = str(tmp_path / "events_poisoned")
    shutil.rmtree(poisoned, ignore_errors=True)
    shutil.copytree(events_dir, poisoned)
    base = pq.read_table(sorted(_glob.glob(f"{events_dir}/events_*.parquet"))[0])
    bad = base.slice(0, 4).to_pydict()
    bad["repo"][0] = None          # null key
    bad["path"][1] = None          # null key
    bad["op"][2] = None            # null op
    bad["op"][3] = "noop"          # unknown op
    # far-future versions so a bug (ingesting them) would visibly win LWW
    bad["commit_seq"] = [10**12 + i for i in range(4)]
    pq.write_table(
        pa.Table.from_pydict(bad, schema=base.schema),
        f"{poisoned}/events_9999.parquet",
    )

    lakes = {}
    for mat in ("eager", "late"):
        lake = str(tmp_path / f"lake_{mat}")
        r = replay(cfg_for(poisoned, lake, materialization=mat))
        assert r["materialization"] == mat
        lakes[mat] = (multiset(lake), fingerprints(lake))
    clean_lake = str(tmp_path / "lake_clean")
    replay(cfg_for(events_dir, clean_lake, materialization="eager"))
    # poisoned input converges to the clean input's lake in both plans
    assert lakes["eager"] == lakes["late"] == (
        multiset(clean_lake),
        fingerprints(clean_lake),
    )


def test_auto_ingest_batch_bounds_fragments_per_bucket():
    """Planner-automatic fragment sizing: per-bucket fragment count
    (= ceil(window_rows / batch_rows)) stays ~flat across 1x/4x/16x
    windows instead of growing linearly with the fixed 128k batch."""
    import math

    from embulk_input_marketo_ray.pipelines.cdc_replay import (
        _INGEST_BATCH_ROWS,
        _MAX_BATCH_EST_BYTES,
        _TARGET_FRAGS_PER_BUCKET,
        _auto_ingest_batch_rows,
    )

    bytes_per_row = 322  # measured footer bytes/row of the synth events
    base = 2_500_000
    frags = []
    for mult in (1, 4, 16):
        rows = base * mult
        b = _auto_ingest_batch_rows(rows, rows * bytes_per_row)
        assert b >= _INGEST_BATCH_ROWS  # never below the fusion floor
        assert b * bytes_per_row <= max(
            _MAX_BATCH_EST_BYTES, _INGEST_BATCH_ROWS * bytes_per_row
        )  # never above the per-task memory budget
        frags.append(math.ceil(rows / b))
    assert max(frags) <= _TARGET_FRAGS_PER_BUCKET + 2
    # the fixed batch would have been ~6x worse at the 16x window
    assert math.ceil(base * 16 / _INGEST_BATCH_ROWS) > 5 * max(frags)
    # unknown layout keeps the measured default
    assert _auto_ingest_batch_rows(1 << 62, 1 << 62) == _INGEST_BATCH_ROWS
    # tiny window: floor wins
    assert _auto_ingest_batch_rows(10_000, 10_000 * 600) == _INGEST_BATCH_ROWS


def test_window_estimator_rows_and_bytes(events_dir):
    """Footer-stats estimator returns a row upper bound covering the
    window and a positive byte estimate, without reading data pages."""
    import glob

    import pyarrow.parquet as pq

    from embulk_input_marketo_ray.pipelines.cdc_replay import _estimate_window_rows
    from embulk_input_marketo_ray.state.watermark import slice_range
    from embulk_input_marketo_ray.synth import BASE_TS

    files = sorted(glob.glob(f"{events_dir}/events_*.parquet"))
    slices = slice_range(BASE_TS, BASE_TS + timedelta(days=30), timedelta(days=30))
    rows, nbytes = _estimate_window_rows(files, slices, "event_ts")
    assert rows > 0 and nbytes > 0
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    assert rows <= total
