"""Write-Audit-Publish gate (ReplayConfig.audit): quality checks run
over the staged-but-invisible window and can veto the publish — nothing
commits, the watermark stays, a rerun converges. The Iceberg/Netflix
WAP pattern on top of the exactly-once manifest (VERDICT round-4
follow-on; reference has no analog — its sink is the Embulk page
output, exactly-once here is the engine's own S8 machinery)."""

import json
from datetime import timedelta

import pytest

from embulk_input_marketo_ray.pipelines.cdc_replay import (
    AuditFailed,
    ReplayConfig,
    replay,
)
from embulk_input_marketo_ray.sinks.exactly_once import read_lake_table
from embulk_input_marketo_ray.state.manifest import PartitionManifest
from embulk_input_marketo_ray.synth import (
    BASE_TS,
    generate_change_events,
    load_evolution_log,
)

N_EVENTS = 2000


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events"))
    generate_change_events(d, N_EVENTS, seed=11, n_repos=8, n_files=4)
    return d


def _cfg(events_dir, lake_dir, **kw):
    return ReplayConfig(
        events_dir=events_dir,
        lake_dir=lake_dir,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        job_start=BASE_TS + timedelta(seconds=N_EVENTS + 100),
        fetch_days=100,
        num_buckets=8,
        extractor_concurrency=(1, 2),
        **kw,
    )


def _multiset(table):
    df = table.select(["repo", "path", "content_sha256"]).to_pandas()
    return sorted(map(tuple, df.itertuples(index=False)))


def test_audit_veto_commits_nothing_and_rerun_converges(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    seen = {}

    def veto(report):
        seen["rows"] = report.total_rows
        seen["pids"] = sorted(r["pid"] for r in report.stats_rows)
        return False

    with pytest.raises(AuditFailed):
        replay(_cfg(events_dir, lake, audit=veto))
    assert seen["rows"] > 0  # the audit really saw the staged window

    # nothing published: no committed partitions, no advanced watermark
    assert PartitionManifest(lake).committed_file_sets() == {}
    assert read_lake_table(lake) is None

    # the staged orphans don't poison a rerun: a passing run converges
    # to the same lake as a never-vetoed clean run
    replay(_cfg(events_dir, lake))
    clean = str(tmp_path / "clean")
    replay(_cfg(events_dir, clean))
    assert _multiset(read_lake_table(lake)) == _multiset(read_lake_table(clean))


def test_audit_sees_exact_would_be_state(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    captured = {}

    def audit(report):
        # distributed DQ check over the would-be-published live state
        t = report.read_state(
            columns=["repo", "path", "content_sha256"]
        ).to_pandas()
        captured["staged"] = sorted(map(tuple, t.itertuples(index=False)))
        return True

    replay(_cfg(events_dir, lake, audit=audit))
    assert captured["staged"] == _multiset(read_lake_table(lake))


def test_audit_veto_second_window_preserves_first(events_dir, tmp_path):
    lake = str(tmp_path / "lake")
    base = dict(
        events_dir=events_dir,
        lake_dir=lake,
        evolution_log=load_evolution_log(events_dir),
        from_ts=BASE_TS,
        fetch_days=100,
        num_buckets=8,
        extractor_concurrency=(1, 2),
        lake_layout="delta",
        compact_threshold=100,
    )
    r1 = replay(
        ReplayConfig(job_start=BASE_TS + timedelta(seconds=N_EVENTS // 2), **base)
    )
    w1_state = _multiset(read_lake_table(lake))

    with pytest.raises(AuditFailed):
        replay(
            ReplayConfig(
                job_start=BASE_TS + timedelta(seconds=N_EVENTS + 100),
                audit=lambda report: False,
                **base,
            )
        )
    # window 1's published state is untouched and the watermark did not
    # advance past it
    assert _multiset(read_lake_table(lake)) == w1_state
    with open(f"{lake}/_state/checkpoint.json") as f:
        from_date = json.load(f)["from_date"]
    assert from_date.startswith(r1["to"])  # still window 1's watermark

    # a passing window 2 then converges with a clean two-window run
    replay(
        ReplayConfig(job_start=BASE_TS + timedelta(seconds=N_EVENTS + 100), **base)
    )
    clean = str(tmp_path / "clean")
    base2 = dict(base, lake_dir=clean)
    replay(ReplayConfig(job_start=BASE_TS + timedelta(seconds=N_EVENTS // 2), **base2))
    replay(ReplayConfig(job_start=BASE_TS + timedelta(seconds=N_EVENTS + 100), **base2))
    assert _multiset(read_lake_table(lake)) == _multiset(read_lake_table(clean))
