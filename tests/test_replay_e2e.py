"""End-to-end CDC replay: golden oracle, exactly-once, resume, multi-window.

The oracle is a single-process pandas replay (FIXTURES.md "Expected-output
oracles"): apply events in commit_seq order, LWW per (repo, path), drop
tombstoned keys; compare the engine's lake on the row multiset of
(repo, path, sha256(content)), the final schema, and the watermark.
"""

import hashlib
import json
import os
from datetime import datetime, timedelta

import pandas as pd
import pyarrow.parquet as pq
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
    d = str(tmp_path_factory.mktemp("events"))
    generate_change_events(d, N_EVENTS, seed=7, n_repos=12, n_files=4)
    return d


def oracle_lake(events_dir, from_ts, to_ts):
    """Pandas replay of the window [from_ts, to_ts] inclusive."""
    import glob

    df = pd.concat(pd.read_parquet(f) for f in sorted(glob.glob(f"{events_dir}/events_*.parquet")))
    df = df[(df.event_ts >= from_ts) & (df.event_ts <= to_ts)]
    df = df.sort_values("commit_seq", kind="stable")
    df = df.drop_duplicates(["repo", "path"], keep="last")
    df = df[df.op == "upsert"]
    df["content_sha256"] = df.content.map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    return df


def lake_multiset(table):
    df = table.select(["repo", "path", "content_sha256"]).to_pandas()
    return sorted(map(tuple, df.itertuples(index=False)))


def cfg_for(events_dir, lake_dir, fetch_days=100, **kw):
    return ReplayConfig(
        events_dir=events_dir,
        lake_dir=lake_dir,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=N_EVENTS + 100),
        fetch_days=fetch_days,
        num_buckets=8,
        extractor_concurrency=(1, 2),
        **kw,
    )


def test_replay_matches_oracle(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    report = replay(cfg_for(events_dir, lake))
    assert not report["skipped"]
    assert report["events_in"] > 0

    to_ts = datetime.fromisoformat(report["to"])
    expected = oracle_lake(events_dir, BASE_TS, to_ts)
    got = read_lake_table(lake)
    assert lake_multiset(got) == sorted(
        map(tuple, expected[["repo", "path", "content_sha256"]].itertuples(index=False))
    )
    # evolved final schema present and typed
    names = got.column_names
    for c in ["mk_score", "mk_revenue", "mk_active", "mk_updated", "content_sha256"]:
        assert c in names
    import pyarrow as pa

    assert got.schema.field("mk_score").type == pa.float64()  # widened int->float
    assert got.schema.field("mk_revenue").type == pa.float64()
    assert got.schema.field("mk_active").type == pa.bool_()
    assert pa.types.is_timestamp(got.schema.field("mk_updated").type)


def test_disk_shuffle_matches_hash_shuffle(events_dir, tmp_path):
    """Both sink shuffle implementations produce identical lakes."""
    lake_hash = str(tmp_path / "lake_hash")
    lake_disk = str(tmp_path / "lake_disk")
    # pin eager: auto would pick the late plan and bypass both shuffles
    replay(cfg_for(events_dir, lake_hash, shuffle="hash", materialization="eager"))
    replay(cfg_for(events_dir, lake_disk, shuffle="disk", materialization="eager"))
    assert lake_multiset(read_lake_table(lake_hash)) == lake_multiset(
        read_lake_table(lake_disk)
    )
    # disk-shuffle scratch is cleaned up after commit
    assert not os.path.exists(os.path.join(lake_disk, "_shuffle"))


def test_replay_is_idempotent_exactly_once(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    replay(cfg_for(events_dir, lake))
    first = lake_multiset(read_lake_table(lake))
    fp1 = {p: s["fingerprint"] for p, s in PartitionManifest(lake).load()["partitions"].items()}

    # wipe the checkpoint (simulate lost watermark) and replay the same window
    os.remove(os.path.join(lake, "_state", "checkpoint.json"))
    replay(cfg_for(events_dir, lake))
    second = lake_multiset(read_lake_table(lake))
    fp2 = {p: s["fingerprint"] for p, s in PartitionManifest(lake).load()["partitions"].items()}
    assert first == second
    assert fp1 == fp2


def test_skip_run_when_watermark_in_future(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    cfg = cfg_for(events_dir, lake)
    cfg.from_ts = cfg.job_start + timedelta(days=1)
    report = replay(cfg)
    assert report["skipped"]


def test_crash_resume_converges(events_dir, tmp_path):
    lake_crash = str(tmp_path / "lake_crash")
    lake_ok = str(tmp_path / "lake_ok")

    # clean run for the expected state
    replay(cfg_for(events_dir, lake_ok))
    expected = lake_multiset(read_lake_table(lake_ok))

    # crashing run: two buckets fail -> whole run fails, nothing committed
    with pytest.raises(Exception):
        replay(cfg_for(events_dir, lake_crash, fail_buckets=frozenset({2, 5})))
    manifest = PartitionManifest(lake_crash)
    assert manifest.committed_ids() == set()
    # watermark must NOT have advanced (W4)
    ck = os.path.join(lake_crash, "_state", "checkpoint.json")
    assert not os.path.exists(ck)

    # resume without faults -> converges to the clean state
    report = replay(cfg_for(events_dir, lake_crash))
    assert lake_multiset(read_lake_table(lake_crash)) == expected
    assert os.path.exists(ck)
    assert report["events_in"] > 0


def test_resume_skips_committed_buckets(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    replay(cfg_for(events_dir, lake))
    manifest = PartitionManifest(lake)
    committed = manifest.committed_ids()
    assert committed
    mtimes = {p: os.path.getmtime(manifest.data_path(p)) for p in committed}

    # same window again after dropping the checkpoint: all buckets already
    # carry this watermark -> all skipped, no partition rewritten
    os.remove(os.path.join(lake, "_state", "checkpoint.json"))
    report = replay(cfg_for(events_dir, lake))
    assert report["buckets_skipped"] == len(committed)
    assert report["buckets_written"] == 0
    assert {p: os.path.getmtime(manifest.data_path(p)) for p in committed} == mtimes


def test_multi_window_incremental_upsert(events_dir, tmp_path):
    """Two sequential windows == one big window (incremental correctness)."""
    lake_inc = str(tmp_path / "lake_inc")
    lake_full = str(tmp_path / "lake_full")

    # incremental: a first window clamped to ~half the events ("Lock down
    # to date"), then a second run from the advanced checkpoint. The next
    # run restarts AT the previous to_date (from := to, W4), so the
    # boundary second is pulled twice — LWW idempotence must absorb it.
    cfg1 = cfg_for(events_dir, lake_inc)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    assert not r1["skipped"]

    cfg2 = cfg_for(events_dir, lake_inc)  # checkpoint supplies from_ts
    r2 = replay(cfg2)
    assert not r2["skipped"]
    assert datetime.fromisoformat(r2["from"]) > BASE_TS

    replay(cfg_for(events_dir, lake_full))
    assert lake_multiset(read_lake_table(lake_inc)) == lake_multiset(read_lake_table(lake_full))


def test_replay_use_updated_at_slices_on_updated_ts(tmp_path):
    """W1: use_updated_at switches the watermark column. The synthetic
    updated_ts lags event_ts by 0-6 s, so a mid-stream window boundary
    selects a different row set than the default column; verify against
    a pandas oracle filtered on updated_ts."""
    import pandas as pd

    from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
    from embulk_input_marketo_ray.synth import (
        BASE_TS,
        generate_change_events,
        load_evolution_log,
    )

    n = 2000
    d = str(tmp_path / "events")
    generate_change_events(d, n, seed=23, n_repos=8, n_files=4)
    lake = str(tmp_path / "lake")
    cut = n // 2  # window end falls mid-stream
    cfg = ReplayConfig(
        events_dir=d,
        lake_dir=lake,
        evolution_log=load_evolution_log(d),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=cut),
        fetch_days=100,
        num_buckets=4,
        incremental=False,
        use_updated_at=True,
    )
    report = replay(cfg)
    assert not report["skipped"]
    got = read_lake_table(lake).select(["repo", "path", "content_sha256"]).to_pandas()

    import glob as _glob
    import hashlib as _hashlib

    frames = [pd.read_parquet(f) for f in sorted(_glob.glob(f"{d}/events_*.parquet"))]
    df = pd.concat(frames, ignore_index=True)
    df = df[df.updated_ts <= BASE_TS + timedelta(seconds=cut)]  # the W1 column
    df = df.sort_values("commit_seq", kind="stable").drop_duplicates(
        ["repo", "path"], keep="last"
    )
    df = df[df.op == "upsert"]
    df["content_sha256"] = df.content.map(
        lambda c: _hashlib.sha256(c.encode()).hexdigest()
    )
    left = sorted(map(tuple, got[["repo", "path", "content_sha256"]].itertuples(index=False)))
    right = sorted(map(tuple, df[["repo", "path", "content_sha256"]].itertuples(index=False)))
    assert left == right
    # differs from the default-column row set (updated_ts lags event_ts)
    df2 = pd.concat(frames, ignore_index=True)
    df2 = df2[df2.event_ts <= BASE_TS + timedelta(seconds=cut)]
    assert len(df2) != len(pd.concat(frames, ignore_index=True)[
        pd.concat(frames, ignore_index=True).updated_ts <= BASE_TS + timedelta(seconds=cut)
    ])

    # non-incremental: the watermark did not advance
    from embulk_input_marketo_ray.state.watermark import WatermarkCheckpoint

    assert WatermarkCheckpoint(lake + "/_state").load() is None


def test_activity_type_ids_filter_pushed():
    from embulk_input_marketo_ray.registry import build_target

    ds = build_target("activity", {"activity_type_ids": ["3", " 7 "]})
    vals = {r["activityTypeId"] for r in ds.take_all()}
    assert vals == {"3", "7"}


def _delta_cfg(d, lake, n, **kw):
    from embulk_input_marketo_ray.synth import BASE_TS, load_evolution_log

    base = dict(
        events_dir=d,
        lake_dir=lake,
        evolution_log=load_evolution_log(d),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=n + 50),
        fetch_days=100,
        num_buckets=4,
        lake_layout="delta",
    )
    base.update(kw)
    return ReplayConfig(**base)


def test_delta_layout_matches_rewrite_layout(tmp_path):
    """Multi-window replay over the delta lake layout produces the
    identical final state as the rewrite layout (and as each other)."""
    from embulk_input_marketo_ray.pipelines.cdc_replay import replay_until_caught_up
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake, read_lake_table
    from embulk_input_marketo_ray.synth import generate_change_events

    n = 3000
    d = str(tmp_path / "events")
    generate_change_events(d, n, seed=31, n_repos=8, n_files=4)

    lake_r = str(tmp_path / "lake_rewrite")
    lake_d = str(tmp_path / "lake_delta")
    # several small windows -> several deltas per bucket
    reports_r = replay_until_caught_up(
        _delta_cfg(d, lake_r, n, lake_layout="rewrite", fetch_days=0.01)
    )
    reports_d = replay_until_caught_up(
        _delta_cfg(d, lake_d, n, fetch_days=0.01)
    )
    assert len(reports_d) == len(reports_r) > 1

    cols = ["repo", "path", "commit_seq", "content_sha256"]
    rt = read_lake_table(lake_r, columns=cols).to_pandas()
    dt = read_lake_table(lake_d, columns=cols).to_pandas()
    left = sorted(map(tuple, rt.itertuples(index=False)))
    right = sorted(map(tuple, dt.itertuples(index=False)))
    assert left == right
    # distributed merge-on-read agrees with the driver-side reader
    ds_rows = sorted(
        (r["repo"], r["path"], r["commit_seq"], r["content_sha256"])
        for r in read_lake(lake_d, columns=cols).take_all()
    )
    assert ds_rows == right


def test_delta_layout_compaction_and_resume(tmp_path):
    """Compaction folds base+deltas into one base without changing
    state; a crashed window converges on re-run (exactly-once)."""
    from embulk_input_marketo_ray.pipelines.cdc_replay import replay_until_caught_up
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
    from embulk_input_marketo_ray.state.manifest import PartitionManifest
    from embulk_input_marketo_ray.synth import generate_change_events

    n = 3000
    d = str(tmp_path / "events")
    generate_change_events(d, n, seed=37, n_repos=8, n_files=4)
    lake = str(tmp_path / "lake")

    # low threshold forces compaction across the ~n/120s windows
    reports = replay_until_caught_up(
        _delta_cfg(d, lake, n, fetch_days=0.01, compact_threshold=2)
    )
    assert len(reports) > 3
    m = PartitionManifest(lake)
    sets = m.committed_file_sets()
    assert any(
        any("base-" in f for f in fs) for fs in sets.values()
    ), "compaction never triggered"
    # every pid's set is within threshold+1 files
    assert all(len(fs) <= 3 for fs in sets.values())

    before = read_lake_table(lake, columns=["repo", "path", "content_sha256"]).to_pandas()

    # crash-resume: new lake, inject a crash in one bucket, then rerun
    lake2 = str(tmp_path / "lake2")
    with pytest.raises(Exception):
        replay_until_caught_up(
            _delta_cfg(d, lake2, n, fail_buckets=frozenset({2}))
        )
    replay_until_caught_up(_delta_cfg(d, lake2, n))
    after = read_lake_table(lake2, columns=["repo", "path", "content_sha256"]).to_pandas()
    assert sorted(map(tuple, before.itertuples(index=False))) == sorted(
        map(tuple, after.itertuples(index=False))
    )


def test_routing_hash_version_guard(events_dir, tmp_path):
    """A lake stamped with a different routing-hash version must refuse
    incremental replay (a changed hash would route keys away from their
    committed buckets and duplicate them)."""
    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    replay(cfg1)

    mpath = os.path.join(lake, "manifest.json")
    with open(mpath) as f:
        state = json.load(f)
    from embulk_input_marketo_ray.functions.scalar import ROUTING_HASH_VERSION

    assert state["routing_hash"] == ROUTING_HASH_VERSION
    state["routing_hash"] = "some-other-hash-v9"
    with open(mpath, "w") as f:
        json.dump(state, f)

    with pytest.raises(RuntimeError, match="routing-hash version"):
        replay(cfg_for(events_dir, lake))

    # pre-versioning lakes (no stamp, partitions present) are accepted
    del state["routing_hash"]
    with open(mpath, "w") as f:
        json.dump(state, f)
    r = replay(cfg_for(events_dir, lake))
    assert not r["skipped"]
    with open(mpath) as f:
        assert json.load(f)["routing_hash"] == ROUTING_HASH_VERSION


def test_delta_lake_time_travel_as_of(events_dir, tmp_path):
    """as_of reads reconstruct an earlier window's exact lake state
    from the delta history (merge-on-read over only the files whose
    window tag <= as_of)."""
    from embulk_input_marketo_ray.sinks.exactly_once import select_files_as_of

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    snap1 = lake_multiset(read_lake_table(lake))

    cfg2 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    r2 = replay(cfg2)
    assert lake_multiset(read_lake_table(lake)) != snap1  # lake moved on

    # time travel back to window 1's watermark
    back = read_lake_table(lake, as_of=r1["to"])
    assert lake_multiset(back) == snap1
    # as_of the current watermark == the current lake
    assert lake_multiset(read_lake_table(lake, as_of=r2["to"])) == lake_multiset(
        read_lake_table(lake)
    )
    # an as_of before the first window: every partition absent -> empty
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake

    with pytest.raises(FileNotFoundError):
        read_lake(lake, as_of="1999-01-01T00:00:00")

    # rewrite layout has no history
    lake_rw = str(tmp_path / "lake_rw")
    replay(cfg_for(events_dir, lake_rw))
    with pytest.raises(ValueError, match="rewrite-layout"):
        read_lake_table(lake_rw, as_of=r1["to"])

    # compaction discards pre-base history: force compaction each window
    lake_c = str(tmp_path / "lake_c")
    cfgc = cfg_for(events_dir, lake_c, lake_layout="delta", compact_threshold=1)
    cfgc.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    rc1 = replay(cfgc)
    replay(cfg_for(events_dir, lake_c, lake_layout="delta", compact_threshold=1))
    with pytest.raises(ValueError, match="compaction"):
        from embulk_input_marketo_ray.state.manifest import PartitionManifest as PM

        select_files_as_of(PM(lake_c).committed_file_sets(), rc1["to"])


def test_changes_between_emits_window_cdc_feed(events_dir, tmp_path):
    """changes_between = CDC OUT of the lake: per-key latest state (op
    kept, deletes included) over exactly the windows in (since, until]."""
    import glob

    from embulk_input_marketo_ray.sinks.exactly_once import changes_between

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    r2 = replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))

    feed = changes_between(lake, since=r1["to"]).take_all()
    got = {(r["repo"], r["path"]): r["op"] for r in feed}

    # pandas oracle: LWW (op kept) over the second window's event range
    # (the engine re-pulls the boundary second: from == prior to, inclusive)
    df = pd.concat(
        pd.read_parquet(f) for f in sorted(glob.glob(f"{events_dir}/events_*.parquet"))
    )
    lo, hi = datetime.fromisoformat(r2["from"]), datetime.fromisoformat(r2["to"])
    df = df[(df.event_ts >= lo) & (df.event_ts <= hi)]
    df = df.sort_values("commit_seq", kind="stable").drop_duplicates(
        ["repo", "path"], keep="last"
    )
    want = {(r.repo, r.path): r.op for r in df.itertuples(index=False)}
    assert got == want
    assert any(op == "delete" for op in got.values())  # deletes ride the feed

    # empty range
    assert changes_between(lake, since=r2["to"]).count() == 0


def test_snapshot_diff_classifies_state_changes(events_dir, tmp_path):
    """snapshot_diff = state-level diff between two lake versions:
    added / deleted / modified by live-set membership; unchanged keys
    absent; upsert-then-delete inside the range cancels out entirely
    (unlike the event-level CDC feed, which reports those keys)."""
    import glob

    from embulk_input_marketo_ray.sinks.exactly_once import snapshot_diff

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    r2 = replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))

    got = {
        (r["repo"], r["path"]): (r["change_kind"], r["old_seq"], r["new_seq"])
        for r in snapshot_diff(lake, v1=r1["to"], v2=r2["to"]).take_all()
    }

    # pandas oracle: LWW live state at each watermark, full-outer diff
    df = pd.concat(
        pd.read_parquet(f) for f in sorted(glob.glob(f"{events_dir}/events_*.parquet"))
    )

    def live(to_iso):
        w = df[df.event_ts <= datetime.fromisoformat(to_iso)]
        w = w.sort_values("commit_seq", kind="stable").drop_duplicates(
            ["repo", "path"], keep="last"
        )
        return {
            (r.repo, r.path): r.commit_seq
            for r in w[w.op == "upsert"].itertuples(index=False)
        }

    s1, s2 = live(r1["to"]), live(r2["to"])
    want = {}
    for k in set(s1) | set(s2):
        if k not in s1:
            want[k] = ("added", None, s2[k])
        elif k not in s2:
            want[k] = ("deleted", s1[k], None)
        elif s1[k] != s2[k]:
            want[k] = ("modified", s1[k], s2[k])
    assert got == want
    kinds = {k for k, _, _ in got.values()}
    assert kinds == {"added", "deleted", "modified"}  # fixture hits all three

    # unchanged keys (live in both at the same seq) never ride the diff
    unchanged = {k for k in s1 if s2.get(k) == s1[k]}
    assert unchanged and not (unchanged & set(got))

    # same-version diff is empty; v1 after a history-folding compaction raises
    assert snapshot_diff(lake, v1=r2["to"], v2=r2["to"]).count() == 0
    lake_c = str(tmp_path / "lake_c")
    cfgc = cfg_for(events_dir, lake_c, lake_layout="delta", compact_threshold=1)
    cfgc.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    rc1 = replay(cfgc)
    rc2 = replay(cfg_for(events_dir, lake_c, lake_layout="delta", compact_threshold=1))
    with pytest.raises(ValueError, match="compaction"):
        snapshot_diff(lake_c, v1=rc1["to"], v2=rc2["to"])


def test_submit_replay_cli_history_reads(events_dir, tmp_path):
    """The ray-job CLI's history-read modes (--snapshot-diff /
    --cdc-feed-since) print one JSON line whose row count matches the
    library surfaces, and --out writes the result as parquet."""
    import subprocess
    import sys

    from embulk_input_marketo_ray.sinks.exactly_once import (
        changes_between,
        snapshot_diff,
    )

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    r2 = replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))
    want_diff = snapshot_diff(lake, v1=r1["to"], v2=r2["to"]).count()
    want_feed = changes_between(lake, since=r1["to"]).count()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo_root, "scripts", "submit_replay.py")

    def cli(*extra):
        env = dict(os.environ, PYTHONPATH=repo_root, RAY_ADDRESS="local")
        out = subprocess.run(
            [sys.executable, script, "--events-dir", events_dir,
             "--lake-dir", lake, *extra],
            capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    outdir = str(tmp_path / "diff_out")
    got = cli("--snapshot-diff", r1["to"], r2["to"], "--out", outdir)
    assert got["rows"] == want_diff and got["read"] == "snapshot_diff"
    written = pq.read_table(outdir) if os.path.isfile(outdir) else None
    if written is None:  # directory of block files
        import pyarrow.dataset as pads

        written = pads.dataset(outdir).to_table()
    assert written.num_rows == want_diff
    assert set(written.column("change_kind").to_pylist()) <= {
        "added", "deleted", "modified"
    }

    got = cli("--cdc-feed-since", r1["to"])
    assert got["rows"] == want_feed and got["read"] == "cdc_feed"


def test_vacuum_collects_compacted_deltas_and_tmp(events_dir, tmp_path):
    """Compaction rewrites a partition's file list to its base file,
    orphaning the old deltas on disk; vacuum removes exactly those (and
    _tmp leftovers) without changing what any reader sees."""
    import os

    from embulk_input_marketo_ray.sinks.exactly_once import vacuum

    lake = str(tmp_path / "lake")
    # compact_threshold=1: every second window folds the history
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=1)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    replay(cfg1)
    replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=1))
    before = lake_multiset(read_lake_table(lake))

    # a crashed-run leftover under _tmp
    leftover = os.path.join(lake, "_tmp", "delta-99999-x.parquet")
    with open(leftover, "wb") as f:
        f.write(b"junk")

    listed = vacuum(lake, dry_run=True)
    assert leftover in listed
    assert any(os.path.basename(p).startswith("delta-") for p in listed)
    assert all(os.path.exists(p) for p in listed)  # dry run deletes nothing

    removed = vacuum(lake)
    assert sorted(removed) == sorted(listed)
    assert not any(os.path.exists(p) for p in removed)
    # readers see the identical lake afterwards; re-vacuum is a no-op
    assert lake_multiset(read_lake_table(lake)) == before
    assert vacuum(lake) == []


def test_history_surfaces_never_see_uncommitted_window(events_dir, tmp_path):
    """Exactly-once extends to the history surfaces: a window-2 crash
    (after some buckets already wrote files) leaves as_of, the CDC feed
    and point lookups exactly at window-1 state; the clean rerun
    converges and the feed then emits exactly window 2."""
    from embulk_input_marketo_ray.sinks.exactly_once import (
        changes_between,
        lookup_keys,
    )

    lake = str(tmp_path / "lake")
    kw = dict(lake_layout="delta", compact_threshold=100)
    cfg1 = cfg_for(events_dir, lake, **kw)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    snap1 = lake_multiset(read_lake_table(lake))
    keys = sorted({t[:2] for t in snap1})[:3]
    look1 = lookup_keys(lake, keys).select(["repo", "path", "content_sha256"])

    with pytest.raises(Exception):
        replay(cfg_for(events_dir, lake, fail_buckets=frozenset({1}), **kw))

    # nothing from the crashed window is visible on ANY surface
    assert lake_multiset(read_lake_table(lake)) == snap1
    assert lake_multiset(read_lake_table(lake, as_of=r1["to"])) == snap1
    assert changes_between(lake, since=r1["to"]).count() == 0
    got = lookup_keys(lake, keys).select(["repo", "path", "content_sha256"])
    assert got.sort_by([("repo", "ascending"), ("path", "ascending")]).equals(
        look1.sort_by([("repo", "ascending"), ("path", "ascending")])
    )

    # clean rerun converges; the feed emits exactly window 2
    r2 = replay(cfg_for(events_dir, lake, **kw))
    assert not r2["skipped"]
    want = oracle_lake(events_dir, BASE_TS, datetime.fromisoformat(r2["to"]))
    assert lake_multiset(read_lake_table(lake)) == sorted(
        map(tuple, want[["repo", "path", "content_sha256"]].itertuples(index=False))
    )
    assert changes_between(lake, since=r1["to"]).count() > 0


def test_cdc_feed_applies_downstream_to_source_head(events_dir, tmp_path):
    """The downstream-consumer contract of changes_between: a consumer
    holding the window-1 snapshot (as_of) that applies the (w1, w2]
    feed — upserts replace, deletes drop — ends at exactly the source
    lake's head state."""
    from embulk_input_marketo_ray.sinks.exactly_once import changes_between

    lake = str(tmp_path / "lake")
    kw = dict(lake_layout="delta", compact_threshold=100)
    cfg1 = cfg_for(events_dir, lake, **kw)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    r2 = replay(cfg_for(events_dir, lake, **kw))

    snap = read_lake_table(lake, as_of=r1["to"]).select(
        ["repo", "path", "commit_seq", "content_sha256"]
    ).to_pandas()
    feed = (
        changes_between(lake, since=r1["to"], until=r2["to"])
        .select_columns(["repo", "path", "commit_seq", "content_sha256", "op"])
        .to_pandas()
    )
    # consumer apply: feed rows win over snapshot rows (they are newer
    # by construction); deletes drop the key
    snap["op"] = "upsert"
    applied = (
        pd.concat([snap, feed])
        .sort_values("commit_seq", kind="stable")
        .drop_duplicates(["repo", "path"], keep="last")
    )
    applied = applied[applied.op == "upsert"][["repo", "path", "content_sha256"]]
    got = sorted(map(tuple, applied.itertuples(index=False)))
    assert got == lake_multiset(read_lake_table(lake))


def test_replay_refuses_changed_num_buckets(events_dir, tmp_path):
    """Changing num_buckets on an existing lake would re-route keys
    away from their committed rows (silent duplicates) — refused, like
    a routing-hash change. Same count replays fine; pre-stamp lakes
    (no num_buckets key) are accepted and stamped on the next commit."""
    lake = str(tmp_path / "lake")
    cfg = cfg_for(events_dir, lake)
    cfg.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    replay(cfg)

    cfg_wide = cfg_for(events_dir, lake)
    cfg_wide.num_buckets = 16
    with pytest.raises(RuntimeError, match="num_buckets"):
        replay(cfg_wide)

    # pre-stamp lake: drop the stamp, replay with ANY count is accepted
    mpath = PartitionManifest(lake).path
    with open(mpath) as f:
        state = json.load(f)
    del state["num_buckets"]
    with open(mpath, "w") as f:
        json.dump(state, f)
    r = replay(cfg_for(events_dir, lake))  # same count, next window
    assert not r["skipped"]
    with open(mpath) as f:
        assert json.load(f)["num_buckets"] == 8


def test_compact_folds_deltas_preserves_reads(events_dir, tmp_path):
    """Standalone compact(): two delta windows -> one base file per
    partition; live reads and point lookups identical before/after;
    vacuum then reclaims the superseded deltas; pre-compaction history
    raises instead of serving a wrong snapshot; re-compact is a no-op."""
    import os

    import pytest as _pytest

    from embulk_input_marketo_ray.sinks.exactly_once import (
        changes_between,
        compact,
        read_lake_table,
        vacuum,
    )

    lake = str(tmp_path / "lake")
    # high threshold: inline compaction never fires, both windows stay deltas
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    r1 = replay(cfg1)
    r2 = replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))
    before = lake_multiset(read_lake_table(lake))
    as_of_w1_before = lake_multiset(read_lake_table(lake, as_of=r1["to"]))
    assert as_of_w1_before is not None

    plan = compact(lake, dry_run=True)
    assert plan and all(p["files_merged"] == 2 for p in plan)
    # dry run changes nothing
    assert lake_multiset(read_lake_table(lake)) == before

    done = compact(lake)
    assert [p["pid"] for p in done] == [p["pid"] for p in plan]
    assert lake_multiset(read_lake_table(lake)) == before

    # every partition now lists exactly one base- file
    from embulk_input_marketo_ray.state.manifest import PartitionManifest

    manifest = PartitionManifest(lake)
    for pid, entry in manifest.load()["partitions"].items():
        assert len(entry["files"]) == 1 and entry["files"][0].startswith("base-")

    # history before the compaction is gone -> loud refusal, not a wrong answer
    with _pytest.raises(ValueError, match="base compaction"):
        read_lake_table(lake, as_of=r1["to"])
    with _pytest.raises(ValueError):
        changes_between(lake, since=r1["to"], until=r2["to"])
    # the latest snapshot is still addressable by as_of
    assert lake_multiset(read_lake_table(lake, as_of=r2["to"])) == before

    removed = vacuum(lake)
    assert any(os.path.basename(p).startswith("delta-") for p in removed)
    assert lake_multiset(read_lake_table(lake)) == before

    # nothing left to fold
    assert compact(lake) == []


def test_compact_crash_before_commit_is_invisible(events_dir, tmp_path, monkeypatch):
    """A compact() that dies after writing base files but BEFORE the
    manifest commit leaves readers on the old file lists; the orphan
    bases are vacuumable; a rerun converges."""
    from embulk_input_marketo_ray.sinks import exactly_once as xo
    from embulk_input_marketo_ray.state.manifest import PartitionManifest

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    replay(cfg1)
    replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))
    before = lake_multiset(xo.read_lake_table(lake))
    files_before = PartitionManifest(lake).committed_file_sets()

    def boom(self, *a, **kw):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(PartitionManifest, "commit", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected crash"):
        xo.compact(lake)
    monkeypatch.undo()

    # manifest untouched: readers see the identical lake via the OLD files
    assert PartitionManifest(lake).committed_file_sets() == files_before
    assert lake_multiset(xo.read_lake_table(lake)) == before
    # the orphaned new bases are unreferenced -> vacuum lists them
    orphans = [p for p in xo.vacuum(lake, dry_run=True) if "base-" in p]
    assert orphans
    # rerun converges (overwrites the same deterministic base names)
    done = xo.compact(lake)
    assert done and lake_multiset(xo.read_lake_table(lake)) == before
    assert xo.vacuum(lake) != []


def test_fragment_formats_produce_identical_lakes(events_dir, tmp_path):
    """The three fragment encodings of the two-phase disk shuffle
    (parquet / ipc / ipc_lz4 — sinks/exactly_once.FragmentWriter) are
    pure transport: the committed lake must be byte-identical on the
    (repo, path, content_sha256) multiset across all of them, and an
    unknown format must fail loudly at config time."""
    lakes = {}
    for fmt in ("parquet", "ipc", "ipc_lz4"):
        lake = str(tmp_path / f"lake_{fmt}")
        report = replay(
            cfg_for(
                events_dir,
                lake,
                shuffle="disk",
                fragment_format=fmt,
                shuffle_scratch_dir=str(tmp_path / f"scratch_{fmt}"),
            )
        )
        assert not report["skipped"]
        lakes[fmt] = lake_multiset(read_lake_table(lake))
    assert lakes["parquet"] == lakes["ipc"] == lakes["ipc_lz4"]
    assert len(lakes["parquet"]) > 0

    with pytest.raises(ValueError, match="fragment_format"):
        replay(
            cfg_for(
                events_dir,
                str(tmp_path / "lake_bad"),
                shuffle="disk",
                fragment_format="zstd",
            )
        )


def test_sorted_compaction_clusters_and_lookups_match(events_dir, tmp_path):
    """compact(sort=True): bases come out key-clustered (each row
    group's [min,max] key range disjoint from the next — the stats a
    filtered read prunes on), reads and point lookups are identical to
    the unsorted lake, and lookup_keys' pushdown path returns the same
    rows through multi-row-group bases."""
    from embulk_input_marketo_ray.sinks.exactly_once import (
        compact,
        lookup_keys,
        read_lake_table,
    )
    from embulk_input_marketo_ray.state.manifest import PartitionManifest

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    replay(cfg1)
    replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))
    before = lake_multiset(read_lake_table(lake))
    head = read_lake_table(lake).select(["repo", "path"]).to_pandas()
    keys = sorted(map(tuple, head.itertuples(index=False)))[:7]
    look_before = sorted(
        map(
            tuple,
            lookup_keys(lake, keys)
            .select(["repo", "path", "content_sha256"])
            .to_pandas()
            .itertuples(index=False),
        )
    )

    done = compact(lake, sort=True, row_group_rows=32)
    assert done
    assert lake_multiset(read_lake_table(lake)) == before

    manifest = PartitionManifest(lake)
    multi_group = 0
    for pid, fs in manifest.committed_file_sets().items():
        assert len(fs) == 1 and "base-" in fs[0]
        pf = pq.ParquetFile(fs[0])
        multi_group += pf.metadata.num_row_groups > 1
        sch = pf.schema_arrow.names
        ri = sch.index("repo")
        # first-sort-column stats ascend across row groups (what a
        # repo-predicate scan prunes on; stats are per-column, so the
        # composite (repo,path) range is checked at row level below)
        repo_ranges = []
        for g in range(pf.metadata.num_row_groups):
            rs = pf.metadata.row_group(g).column(ri).statistics
            repo_ranges.append((rs.min, rs.max))
        for (_, hi), (lo2, _) in zip(repo_ranges, repo_ranges[1:]):
            assert hi <= lo2
        # the rows themselves are (repo, path)-sorted — the clustering
        # invariant pyarrow's row-group pruning feeds on
        t = pq.read_table(fs[0], columns=["repo", "path"]).to_pandas()
        pairs = list(map(tuple, t.itertuples(index=False)))
        assert pairs == sorted(pairs)
    assert multi_group > 0  # row_group_rows=32 really split the bases

    look_after = sorted(
        map(
            tuple,
            lookup_keys(lake, keys)
            .select(["repo", "path", "content_sha256"])
            .to_pandas()
            .itertuples(index=False),
        )
    )
    assert look_after == look_before

    # absent key still absent through the pushdown path
    miss = lookup_keys(lake, [("no/such", "file.py")])
    assert miss.num_rows == 0


def test_lake_stats_inventory(events_dir, tmp_path):
    """lake_stats: metadata-only ANALYZE — per-partition rows/files/
    bytes/row-groups + the clustered-base flag flips with
    compact(sort=True)."""
    from embulk_input_marketo_ray.sinks.exactly_once import (
        compact,
        lake_stats,
        read_lake_table,
    )

    lake = str(tmp_path / "lake")
    cfg1 = cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100)
    cfg1.job_start = BASE_TS + timedelta(seconds=N_EVENTS // 2)
    replay(cfg1)
    replay(cfg_for(events_dir, lake, lake_layout="delta", compact_threshold=100))

    live = read_lake_table(lake).num_rows
    s = lake_stats(lake)
    assert s["num_buckets"] == 8
    # deltas still hold superseded versions/tombstones: physical >= live
    assert s["totals"]["rows"] >= live
    assert all(p["files"] == 2 for p in s["partitions"].values())  # 2 deltas
    assert all(p["clustered_base"] is None for p in s["partitions"].values())
    assert s["totals"]["bytes"] > 0 and s["totals"]["row_groups"] > 0

    compact(lake, sort=True, row_group_rows=32)
    s2 = lake_stats(lake)
    # one tombstone-free base per partition: physical == live exactly
    assert s2["totals"]["rows"] == live
    assert all(p["files"] == 1 for p in s2["partitions"].values())
    assert all(p["clustered_base"] is True for p in s2["partitions"].values())
