"""The flagship pipeline: CDC replay -> exactly-once upserted lake.

Ray-Data-first dataflow (SURVEY.md §7.1), mirroring the reference run
lifecycle (transaction -> validate -> schema -> ingest -> ConfigDiff,
SURVEY.md §3) as:

    read_parquet(events, filter=watermark slices, columns=pruned)
      -> map_batches(PagedExtractor, actor pool)          # protocol state T1-T4
      -> map_batches(ChangeEventNormalizer, actor pool)   # typed projection + evolution + sha256
      -> map_batches(add_bucket_and_partial_lww)          # pre-shuffle combiner
      -> [resume filter: drop already-committed buckets]
      -> groupby(bucket).map_groups(BucketMergeWriter)    # the single shuffle; merge+write
      -> driver: manifest.commit -> checkpoint.advance    # commit point, then watermark (W4)

Everything streams; the only driver-side materialization is the
per-bucket lineage stats (num_buckets rows).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_input_marketo_ray.sources.change_events import read_change_events
from embulk_input_marketo_ray.stages.extractor import PagedExtractor
from embulk_input_marketo_ray.stages.lww import (
    BUCKET_COLUMN,
    add_bucket,
    add_bucket_and_partial_lww,
    winner_candidates,
    winner_hash,
)

# Rows per UDF call for the fused read->ingest stages. Ray's parquet
# reader streams ~10k-row record batches; with batch_size=None every
# downstream map_batches runs per record batch — ~1,700 stage
# constructions and a 60x fragment-file explosion were measured on an
# 8.8M-event window. An explicit 128k-row batch re-batches once
# (bounded concat) and amortizes per-call cost ~70x.
_INGEST_BATCH_ROWS = 1 << 17
from embulk_input_marketo_ray.stages.normalize import (
    ChangeEventNormalizer,
    filter_invalid_events,
)
from embulk_input_marketo_ray.sinks.exactly_once import BucketMergeWriter
from embulk_input_marketo_ray.state.manifest import PartitionManifest
from embulk_input_marketo_ray.state.watermark import (
    WatermarkCheckpoint,
    clamp_to_date,
    slice_range,
)

_ISO = "%Y-%m-%dT%H:%M:%S"


class AuditFailed(RuntimeError):
    """A ReplayConfig.audit callback vetoed the publish: the window's
    staged files were written but NOT committed (invisible to every
    reader), and the watermark did not advance — a rerun re-imports the
    same window."""


@dataclass
class AuditReport:
    """What a Write-Audit-Publish callback sees: the staged window
    before it becomes visible. ``stats_rows`` is the per-bucket lineage
    (pid, rows, events_in, dropped, fingerprint, ...); ``file_sets`` is
    each touched pid's WOULD-BE-COMMITTED file list (prior committed
    files + the window's staged ones). ``read_state()`` is the
    would-be-published live table as a Dataset — the exact rows every
    reader would see if the commit went through (merge-on-read, one
    task per bucket, no shuffle) — so audits run as ordinary
    distributed pipelines over data no reader can see yet."""

    stats_rows: list
    file_sets: dict  # pid -> absolute paths (committed + staged)
    from_ts: datetime
    to_ts: datetime
    filesystem: "object" = None

    def read_state(self, columns: list | None = None):
        from embulk_input_marketo_ray.sinks.exactly_once import read_file_sets

        import ray.data as _rd

        if not self.file_sets:
            return _rd.from_items([]).limit(0)
        return read_file_sets(self.file_sets, columns=columns, filesystem=self.filesystem)

    @property
    def total_rows(self) -> int:
        return sum(r["rows"] for r in self.stats_rows)


@dataclass
class ReplayConfig:
    """Run configuration — the engine analog of the reference's @Config
    task (SURVEY.md §2.10 U3). Validation happens at plan time (M10)."""

    events_dir: str
    lake_dir: str
    evolution_log: list[dict]
    from_ts: datetime
    job_start: datetime
    fetch_days: int = 30
    # W1: incremental-column selection. The default watermark column is
    # the createdAt analog (event_ts); ``use_updated_at`` switches the
    # slice filter to the updatedAt analog (updated_ts), mirroring
    # LeadBulkExtractInputPlugin.java:28-40. The reference REJECTS
    # incremental import over updatedAt (records touched after the
    # window would be permanently skipped):
    # MarketoBaseBulkExtractInputPlugin.java:102-106.
    incremental: bool = True
    use_updated_at: bool = False
    created_ts_column: str = "event_ts"
    updated_ts_column: str = "updated_ts"
    max_range_days: int = 30  # MARKETO_MAX_RANGE_EXTRACT
    num_buckets: int = 32
    page_size: int = 300
    # autoscaling (min, max) pool for the single fused ingest stage
    # (extract -> normalize -> partial LWW): a FIXED pool that reserves
    # every CPU starves the read/shuffle tasks and stalls the pipeline —
    # let Ray size the pool under backpressure instead.
    extractor_concurrency: int | tuple[int, int] = (1, 4)
    # "tasks" (default): the fused narrow stage (extract -> normalize ->
    # partial LWW) runs as a TASK-based map, which Ray fuses with the
    # read into ONE operator — no extra object-store round trip of the
    # full stream, no actor-pool ramp-up, no reserved CPUs. Per-task
    # state rebuild (evolution schedule, extractor protocol counters) is
    # microseconds. "actors": the same stage as an autoscaling actor
    # pool — required when extractor state is genuinely expensive or
    # must persist across batches (e.g. fault-injection tests that count
    # retries per worker, real OAuth token reuse).
    ingest_mode: str = "tasks"
    batch_size: int = 32768
    # Rows per fused ingest batch (tasks mode). None = planner-automatic:
    # sized from the window's footer-stats estimate so the disk
    # shuffle's per-bucket fragment count stays ~flat across window
    # sizes instead of growing linearly (see _auto_ingest_batch_rows);
    # an int pins it (bench sweeps, tests).
    ingest_batch_rows: int | None = None
    # reference configs: case-insensitive dynamic-field keep-list and
    # output column prefix (included_fields / column_prefix)
    included_fields: list[str] | None = None
    column_prefix: str = "mk"
    # bytes per Ray Data block; lower for very wide content rows so a
    # batch x pool fits worker heaps (SURVEY.md §7.3 "very wide records")
    target_max_block_size: int | None = None
    # "hash" (default): Ray's hash-shuffle keyed repartition — fastest
    # at small/medium inputs. "disk": two-phase fragment shuffle
    # (per-task bucket fragments -> per-bucket merge) — no aggregator
    # actors, so it wins when the hash path's aggregator acceptance
    # serializes (multi-million-event windows); safe because LWW is
    # idempotent under duplicated fragment rows.
    shuffle: str = "hash"
    # "rewrite" (default): each window rewrites touched buckets' full
    # partitions — simplest reads, but write amplification grows with
    # LAKE size. "delta": each window appends one delta file per
    # touched bucket (cost ∝ window) with LWW merge-on-read and
    # automatic compaction after `compact_threshold` files — the
    # 100 TB lake-growth path (LSM level-0 style).
    lake_layout: str = "rewrite"
    compact_threshold: int = 8
    # where "disk" shuffle fragments live; default under the lake. A
    # tmpfs path (/dev/shm/...) lifts the disk-bandwidth cap when the
    # scratch fits memory (on a cluster: per-node NVMe spill volumes).
    shuffle_scratch_dir: str | None = None
    # fragment encoding for the "disk" shuffle: "parquet" (snappy) for
    # bandwidth-capped devices, "ipc" (uncompressed Arrow) for tmpfs /
    # fast NVMe; "auto" picks ipc when the scratch lives on /dev/shm
    fragment_format: str = "auto"
    # override_num_blocks for the read (None = Ray's dynamic splitting).
    # Ray 2.49's dynamic SplitBlocks path re-slices every output batch;
    # at high read concurrency those extra passes amplify under memory-
    # bandwidth saturation. One block per input file is right when the
    # layout is already sized for the cluster (our writers fix n_files).
    read_num_blocks: int | None = None
    collect_stats: bool = True
    fail_buckets: frozenset = field(default_factory=frozenset)
    extractor_kwargs: dict = field(default_factory=dict)
    # Write-Audit-Publish gate (the Iceberg/Netflix WAP pattern): when
    # set, the callback runs AFTER the window's files are fully staged
    # but BEFORE the manifest commit, receiving an AuditReport over the
    # staged (still-invisible) rows + per-bucket lineage. Returning
    # False — or raising — aborts the publish: nothing commits, the
    # watermark does not advance, and the staged files are exactly the
    # crash-orphans the existing vacuum/rerun machinery already
    # reclaims (a clean rerun converges bit-for-bit). Quality checks
    # therefore gate the lake without a quarantine copy of the data.
    audit: "object" = None  # Callable[[AuditReport], bool] | None
    # Bucket splitting (lake growth beyond the initial num_buckets):
    # when set, a bucket whose merged partition exceeds this many rows
    # splits into extendible-hash suffix children (stages/lww.py
    # routing; sinks/exactly_once.py split_pieces) — the bucket count
    # grows with the lake instead of buckets growing without bound.
    # Requires power-of-two num_buckets (suffix-bit routing). In the
    # delta layout the split happens at compaction. None = fixed
    # bucket count (the pre-split behavior, bit-for-bit).
    split_threshold_rows: int | None = None
    split_max_depth: int = 20
    # Late materialization (two-phase LWW). CDC replay windows are
    # usually version-heavy: most events LOSE the per-key
    # last-writer-wins race, yet the eager plan normalizes, hashes and
    # shuffles every one of them — at 100 TB that ships content bytes
    # through the exchange only to drop them at the merge. "late" runs
    # a cheap winner scan first (key + version columns only — the read
    # prunes everything else), reduces to the per-key max version per
    # bucket, broadcasts the winner set once (``ray.put``), and then
    # ingests the full-column stream with a vectorized winner filter —
    # normalize/sha256/exchange touch ONLY rows that reach the lake.
    # "auto" (default) runs the scan (∝ two narrow columns) and picks:
    # late when winners/events <= late_ratio AND the winner set fits
    # the broadcast budget, else the eager single-pass plan (a
    # mostly-unique-key window would pay a second full read for
    # nothing). "eager" is the round-1 plan, unconditionally.
    materialization: str = "auto"
    late_ratio: float = 0.5
    late_broadcast_limit: int = 256 << 20
    # auto also stays eager BELOW this window size: the late plan adds
    # ~3 extra dataset launches (~1s of fixed cost) which only pays for
    # itself when the skipped per-event work (~5 us x losing events)
    # exceeds it — breakeven ~200k events on this hardware
    late_min_events: int = 200_000
    # Optional pyarrow.fs.FileSystem routing ALL lake-side state IO
    # (manifest, partition files, watermark checkpoint, audit reads) —
    # the object-store seam (state/fsio.py; S3 caveat documented
    # there). None = local POSIX fast path. The "disk" shuffle's
    # fragment scratch is NODE-LOCAL/shared-POSIX by contract and is
    # NOT routed: with a non-local lake filesystem an explicit
    # shuffle_scratch_dir is required for shuffle="disk".
    lake_filesystem: "object" = None


def _estimate_window_rows(files: list[str], slices, ts_column: str) -> tuple[int, int]:
    """Upper-bound (rows, compressed bytes) of the watermark window from
    parquet FOOTER statistics only (no data read; partially-overlapping
    row groups are counted whole). Drives the auto planner's
    small-window floor — a window below ``late_min_events`` goes eager
    without even paying the winner scan's dataset launches — and the
    automatic ingest-batch sizing (``_auto_ingest_batch_rows``)."""
    import pyarrow.parquet as pq

    total = 0
    total_bytes = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ci = names.index(ts_column)
        except ValueError:
            return 1 << 62, 1 << 62  # unknown layout: assume big, let the scan decide
        for i in range(md.num_row_groups):
            rg = md.row_group(i)
            st = rg.column(ci).statistics
            if st is None or not st.has_min_max:
                total += rg.num_rows
                total_bytes += rg.total_byte_size
                continue
            lo, hi = st.min, st.max
            for s in slices:
                if hi >= s.from_ts and lo <= s.to_ts:
                    total += rg.num_rows
                    total_bytes += rg.total_byte_size
                    break
    return total, total_bytes


# Automatic fragment sizing for the disk shuffle. Each ingest batch
# writes at most ONE fragment file per touched bucket, so per-bucket
# fragment count ~= ceil(window_rows / ingest_batch_rows): a fixed
# 128k-row batch grows the fragment count linearly with the window
# (126 files/bucket measured at 9.79M events) and the phase-B merge
# pays a per-file open each. Scale the batch so fragments/bucket stays
# ~flat, bounded above by a per-task memory budget. ``est_bytes`` is
# footer ``total_byte_size`` (UNcompressed, ~Arrow heap size), so the
# budget caps per-task heap directly; Ray's streaming backpressure
# bounds how many such batches are in flight. Past the budget knee
# (windows whose flat-fragment batch would exceed it) fragment counts
# grow again, linearly but 6x+ slower than the fixed batch — at that
# scale the lake's bucket count itself grows (split_threshold_rows),
# which re-flattens per-bucket merge cost.
_TARGET_FRAGS_PER_BUCKET = 48
_MAX_BATCH_EST_BYTES = 256 << 20


def _auto_ingest_batch_rows(est_rows: int, est_bytes: int) -> int:
    if est_rows <= 0 or est_rows >= (1 << 61):  # unknown layout: keep default
        return _INGEST_BATCH_ROWS
    by_frags = -(-est_rows // _TARGET_FRAGS_PER_BUCKET)
    bytes_per_row = max(est_bytes / est_rows, 1e-9)
    by_memory = int(_MAX_BATCH_EST_BYTES / bytes_per_row)
    return max(_INGEST_BATCH_ROWS, min(by_frags, max(by_memory, _INGEST_BATCH_ROWS)))


def _merge_fragments(shuffle_dir: str, writer, frag_stats):
    """Phase B shared by the disk shuffle and the late plan: one TASK
    per touched bucket reads its fragments, LWW-merges (+ lake state)
    and writes atomically. Task-based — FragmentMerger construction is
    a pickle of small config, so an actor pool would pay ramp-up for
    nothing."""
    import ray

    from embulk_input_marketo_ray.sinks.exactly_once import FragmentMerger

    frag_rows = frag_stats.take_all()  # small: blocks x touched buckets
    buckets_present = sorted({r["bucket"] for r in frag_rows if r["bucket"] >= 0})
    if not buckets_present:
        return [], None
    # one block per bucket DIRECTLY — a repartition of this tiny spec
    # dataset costs ~2 s of pure Ray overhead per run
    specs = ray.data.from_items(
        [{"bucket": b} for b in buckets_present],
        override_num_blocks=len(buckets_present),
    )

    def merge_block(batch: pa.Table) -> pa.Table:
        return FragmentMerger(shuffle_dir=shuffle_dir, writer=writer)(batch)

    stats = specs.map_batches(merge_block, batch_size=None, batch_format="pyarrow")
    return stats.take_all(), stats


class LateIngestStage:
    """Pass 2 of the late-materialization plan (usable as a task fn
    wrapper or an actor-pool class, mirroring IngestStage's two modes):
    paged-protocol accounting over EVERY event (so rate limits, retries
    and the events_read metric see the full stream, exactly like the
    eager plan), then a vectorized winner filter — only rows whose
    (key, version) pair won the pass-1 scan are normalized, sha256'd,
    bucket-routed and written to exchange fragments."""

    def __init__(
        self,
        evolution_log,
        page_size,
        metrics,
        num_buckets,
        extractor_kwargs,
        prefix,
        included_fields,
        directory,
        winners_ref,
        shuffle_dir,
        frag_fmt,
        done_buckets=(),
    ) -> None:
        import ray

        from embulk_input_marketo_ray.sinks.exactly_once import FragmentWriter

        self.extractor = PagedExtractor(
            page_size=page_size, metrics=metrics, **extractor_kwargs
        )
        self.normalizer = ChangeEventNormalizer(
            evolution_log, prefix=prefix, included_fields=included_fields
        )
        self.num_buckets = num_buckets
        self.directory = directory
        # zero-copy plasma view of the broadcast winner-key set
        self.winner_set = ray.get(winners_ref)
        self.fw = FragmentWriter(shuffle_dir, num_buckets, frag_fmt)
        # exact committed-bucket exclusion (mirrors the eager path's
        # drop_committed). The scan already excludes done buckets, but
        # only through the uint64 winner-hash membership set — a hash
        # collision with a row in a committed bucket would otherwise
        # write a fragment there and re-merge an already-committed
        # partition; this filter makes the guarantee exact again.
        self.skip_buckets = pa.array(done_buckets) if len(done_buckets) else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = self.extractor(batch)
        # dead-letter filter first: a null-key winner candidate from the
        # scan must never reach the lake through the hash-set filter
        batch = filter_invalid_events(batch, metrics=self.extractor.metrics)
        # uint64 membership probe; false-positive-only under collision
        # (see stages.lww.winner_hash)
        batch = batch.filter(
            pc.is_in(pa.array(winner_hash(batch)), value_set=self.winner_set)
        )
        if batch.num_rows == 0:
            return pa.table(
                {"bucket": pa.array([], type=pa.int32()), "rows": pa.array([], type=pa.int64())}
            )
        batch = self.normalizer(batch)
        t = add_bucket_and_partial_lww(batch, self.num_buckets, directory=self.directory)
        if self.skip_buckets is not None:
            t = t.filter(
                pc.invert(pc.is_in(t.column(BUCKET_COLUMN), value_set=self.skip_buckets))
            )
        return self.fw(t)


def _winner_scan(
    cfg: "ReplayConfig",
    slices,
    ts_column: str,
    blocks: int,
    directory,
    done_buckets,
    scan_dir: str,
    frag_fmt: str,
    batch_rows: int = _INGEST_BATCH_ROWS,
):
    """Pass 1 of the late plan: read ONLY the key + version columns
    (parquet pruning — content never leaves storage), reduce each block
    to its per-key max version, exchange the tiny candidates by bucket
    via fragments, and reduce each bucket to its global winners.

    Returns ``(winner_hash_ds, scanned_rows)`` where the dataset is the
    MATERIALIZED per-bucket uint64 winner-hash sets (column ``wh``, 8
    bytes/winner, ``None`` when the window has no candidates). Hashing
    happens inside the per-bucket reduce, so nothing reaches the driver
    here — the caller sizes the broadcast from block metadata
    (``count()``) and only ``ray.get``s the set after the
    ``late_broadcast_limit`` check passes. The winner count is bounded
    by the window's key cardinality — the same bound as the lake rows
    this window can touch."""
    import ray

    from embulk_input_marketo_ray.sinks.exactly_once import FragmentWriter, read_fragment

    ds = read_change_events(
        cfg.events_dir,
        slices,
        ts_column=ts_column,
        # op is read ONLY for the dead-letter rule: an invalid event
        # (e.g. unknown op on a valid key) must never become a winner,
        # or pass 2 would dead-letter the winner row and lose the key
        columns=["repo", "path", "commit_seq", "op"],
        override_num_blocks=blocks,
        batch_size=batch_rows,
    )
    nb = cfg.num_buckets
    skip = pa.array(done_buckets) if len(done_buckets) else None

    def scan_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # no metrics here: pass 2 re-filters the full stream and owns
        # the events_invalid count (counting both would double it)
        batch = filter_invalid_events(batch).select(["repo", "path", "commit_seq"])
        t = add_bucket(winner_candidates(batch), nb, directory=directory)
        if skip is not None:
            t = t.filter(pc.invert(pc.is_in(t.column(BUCKET_COLUMN), value_set=skip)))
        out = FragmentWriter(scan_dir, nb, frag_fmt)(t)
        # rows_in carries the pre-combine scan count for the auto
        # late/eager decision (attributed to the first stats row;
        # bucket=-1 padding row when the block produced no fragments)
        if out.num_rows == 0:
            return pa.table(
                {
                    "bucket": pa.array([-1], type=pa.int32()),
                    "rows": pa.array([0], type=pa.int64()),
                    "rows_in": pa.array([n], type=pa.int64()),
                }
            )
        rows_in = np.zeros(out.num_rows, dtype=np.int64)
        rows_in[0] = n
        return out.append_column("rows_in", pa.array(rows_in))

    frag_stats = ds.map_batches(
        scan_block,
        batch_size=batch_rows,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    stat_rows = frag_stats.take_all()
    scanned = int(sum(r["rows_in"] for r in stat_rows))
    buckets_present = sorted({r["bucket"] for r in stat_rows if r["bucket"] >= 0})
    if not buckets_present:
        return None, scanned
    specs = ray.data.from_items(
        [{"bucket": b} for b in buckets_present],
        override_num_blocks=len(buckets_present),
    )

    def reduce_bucket(batch: pa.Table) -> pa.Table:
        import glob as _glob
        import os as _os
        from concurrent.futures import ThreadPoolExecutor

        tables = []
        for b in batch.column("bucket").to_pylist():
            files = sorted(
                _glob.glob(_os.path.join(scan_dir, f"bucket={b:05d}", "*.parquet"))
                + _glob.glob(_os.path.join(scan_dir, f"bucket={b:05d}", "*.arrow"))
            )
            if not files:
                continue
            # one tiny fragment per upstream batch: the per-file open
            # cost dominates a serial read (same fix as FragmentMerger)
            if len(files) > 8:
                with ThreadPoolExecutor(max_workers=8) as ex:
                    frags = list(ex.map(read_fragment, files))
            else:
                frags = [read_fragment(f) for f in files]
            cands = pa.concat_tables(frags)
            tables.append(winner_candidates(cands))
        if not tables:
            return pa.table({"wh": pa.array([], type=pa.uint64())})
        # hash in the reduce task: the driver never sees winner strings,
        # only (after the budget check) the 8-byte membership hashes
        w = pa.concat_tables(tables)
        return pa.table({"wh": pa.array(winner_hash(w))})

    winners_ds = specs.map_batches(reduce_bucket, batch_size=None, batch_format="pyarrow")
    return winners_ds.materialize(), scanned


def replay(cfg: ReplayConfig) -> dict:
    """Run one incremental window; returns the run report.

    Resumable: buckets whose manifest entry already carries this
    window's ``watermark_to`` are skipped (their events filtered out
    before the shuffle); the watermark advances only after the manifest
    commit. A window fully in the future is a skip-run (W5)."""
    t0 = time.perf_counter()
    # keyed repartition (the sink's bucket co-location guarantee)
    # requires the hash shuffle strategy
    import ray
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    import logging

    # empty shuffle partitions produce empty-schema bundles that trip a
    # benign-but-noisy "RefBundle with a different schema" warning
    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).setLevel(logging.ERROR)

    ctx = DataContext.get_current()
    # replay() tunes the global DataContext for its own datasets; save
    # the touched fields and restore them on exit so the tuning doesn't
    # leak into unrelated datasets created later in the same session
    _saved_ctx = {
        "shuffle_strategy": ctx.shuffle_strategy,
        "max_hash_shuffle_aggregators": ctx.max_hash_shuffle_aggregators,
        "hash_shuffle_operator_actor_num_cpus_per_partition_override": (
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override
        ),
        "target_max_block_size": ctx.target_max_block_size,
    }
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # One aggregator actor per shuffle partition oversubscribes small
    # clusters (64 actors on 32 CPUs was observed 30x slower than 8);
    # each aggregator handles many partitions, so cap the pool to a
    # fraction of cluster CPUs. Partition->bucket mapping is unaffected.
    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    import os as _os

    _aggs = _os.environ.get("GRAFT_AGGS")  # tuning override for bench sweeps
    # Aggregator pool sized to the WINDOW, not just the cluster:
    # acceptance parallelism is the hash path's bottleneck on big
    # windows (32 aggs measured 18-26% faster than 16 on an 8.8M-event
    # window at 32 CPUs), but each aggregator is an actor spin-up, so
    # small windows pay pure fixed cost for a wide pool (8 aggs: 3.2 s
    # vs 32 aggs: 5.5 s on a 612k-event window). Estimate window size
    # from the input files' bytes (~40 MB of parquet per aggregator),
    # clamped to [8, min(buckets, cpus)]. One per PARTITION (Ray's
    # default) oversubscribes small nodes: 64 actors on 32 CPUs
    # measured 30x slower in round 1.
    if _aggs:
        ctx.max_hash_shuffle_aggregators = int(_aggs)
    else:
        import glob as _glob

        input_bytes = sum(
            _os.path.getsize(f) for f in _glob.glob(cfg.events_dir + "/*.parquet")
        )
        by_size = max(8, input_bytes // (40 << 20))
        ctx.max_hash_shuffle_aggregators = max(2, min(cfg.num_buckets, total_cpus, by_size))
    # aggregators are concat-bound; the default 0.0625 cpu/partition
    # reservation starves map stages on small nodes (see queries.py)
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    if cfg.target_max_block_size is not None:
        ctx.target_max_block_size = cfg.target_max_block_size
    try:
        return _replay_inner(cfg, ctx, t0)
    finally:
        for k, v in _saved_ctx.items():
            setattr(ctx, k, v)


def _replay_inner(cfg: ReplayConfig, ctx, t0: float) -> dict:
    import ray

    # W1 validation (MarketoBaseBulkExtractInputPlugin.java:102-106):
    # incremental import over the updatedAt analog would permanently
    # skip records touched after their window — reject with the
    # reference's error.
    ts_column = cfg.updated_ts_column if cfg.use_updated_at else cfg.created_ts_column
    if cfg.incremental and cfg.use_updated_at:
        raise ValueError("Column 'updatedAt' cannot be incremental imported")

    ckpt = WatermarkCheckpoint(cfg.lake_dir + "/_state", filesystem=cfg.lake_filesystem)
    from_ts = ckpt.from_date(cfg.from_ts)
    if from_ts >= cfg.job_start:
        # W5: nothing to fetch yet; re-emit the same window untouched
        return {"skipped": True, "from": from_ts.isoformat(), "events_in": 0, "rows_out": 0}
    to_ts = clamp_to_date(from_ts, cfg.fetch_days, cfg.job_start)
    slices = slice_range(from_ts, to_ts, timedelta(days=cfg.max_range_days))
    watermark_to = to_ts.strftime(_ISO)

    manifest = PartitionManifest(cfg.lake_dir, filesystem=cfg.lake_filesystem)
    manifest.prepare()
    manifest_state = manifest.load()
    manifest.check_routing_version(manifest_state)
    manifest.check_num_buckets(cfg.num_buckets, manifest_state)
    done_pids = {
        pid
        for pid, st in manifest_state["partitions"].items()
        if st.get("watermark_to") == watermark_to
    }
    done_buckets = np.array(sorted(int(p) for p in done_pids), dtype=np.int32)

    # bucket splitting: snapshot per-bucket depths + routing directory
    # at run start (routing and writer share the same snapshot; a split
    # this window takes effect for the NEXT window's routing)
    depths = None
    directory = None
    if cfg.split_threshold_rows:
        if cfg.num_buckets & (cfg.num_buckets - 1):
            raise ValueError(
                "split_threshold_rows requires power-of-two num_buckets "
                f"(suffix-bit routing), got {cfg.num_buckets}"
            )
        from embulk_input_marketo_ray.stages.lww import bucket_depths, build_directory

        depths = bucket_depths(manifest_state, cfg.num_buckets)
        directory = build_directory(depths)

    normalizer = ChangeEventNormalizer(
        cfg.evolution_log, prefix=cfg.column_prefix, included_fields=cfg.included_fields
    )
    target_schema = normalizer.final_schema()

    from embulk_input_marketo_ray.state.metrics import MetricsActor

    metrics = MetricsActor.remote()

    # One fused actor pool for the narrow stages (paged-fetch protocol ->
    # typed normalize -> partial LWW + bucket). Fusing avoids two extra
    # actor-pool spin-ups and two object-store round trips of the full
    # stream per run; the stages remain separately testable classes.
    class IngestStage:
        def __init__(
            self,
            evolution_log,
            page_size,
            metrics,
            num_buckets,
            extractor_kwargs,
            prefix="mk",
            included_fields=None,
            directory=None,
        ):
            self.extractor = PagedExtractor(
                page_size=page_size, metrics=metrics, **extractor_kwargs
            )
            self.normalizer = ChangeEventNormalizer(
                evolution_log, prefix=prefix, included_fields=included_fields
            )
            self.num_buckets = num_buckets
            self.directory = directory

        def __call__(self, batch: pa.Table) -> pa.Table:
            batch = self.extractor(batch)
            batch = filter_invalid_events(batch, metrics=self.extractor.metrics)
            batch = self.normalizer(batch)
            return add_bucket_and_partial_lww(
                batch, self.num_buckets, directory=self.directory
            )

    if cfg.ingest_mode not in ("tasks", "actors"):
        raise ValueError(f"ingest_mode must be 'tasks' or 'actors', got {cfg.ingest_mode!r}")

    # Read-block count balances two REAL per-block costs: fewer blocks
    # starve the pipeline of waves (64 blocks at 32 CPUs measured
    # 16.2 s vs 12.1 s at 128 on an 8.8M-event window), while every
    # block pays a ~0.1-0.2 s hash-shuffle submission (a 5k-event
    # window forced to 128 blocks measured 13.6 s — pure submit
    # overhead). Target ~10 MB of input per block, clamped to
    # [cpus, 4*cpus] — the same cluster-size-aware sizing Ray's own
    # planner applies, made explicit so both costs stay bounded.
    import glob as _glob
    import os as _os2

    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    event_files = _glob.glob(cfg.events_dir + "/*.parquet")
    input_bytes = sum(_os2.path.getsize(f) for f in event_files)
    blocks = cfg.read_num_blocks or int(
        min(max(input_bytes // (10 << 20), total_cpus), 4 * total_cpus)
    )
    # Asking for MORE blocks than input files makes Ray append a
    # SplitBlocks re-slicing operator, which breaks read->map fusion
    # (measured: the fused single-operator Phase A is 2x the unfused
    # chain on an 8.8M-event window). When the file count already
    # provides >= 1 task per CPU, cap at the file count and keep the
    # fusion; only genuinely under-partitioned layouts pay the split.
    if len(event_files) >= total_cpus:
        blocks = min(blocks, len(event_files))
    # footer-stats window estimate drives BOTH the ingest-batch sizing
    # (fragments/bucket stay ~flat across window sizes) and the auto
    # planner's small-window floor below
    est_rows, est_bytes = _estimate_window_rows(event_files, slices, ts_column)
    batch_rows = cfg.ingest_batch_rows or _auto_ingest_batch_rows(est_rows, est_bytes)
    ds = read_change_events(
        cfg.events_dir,
        slices,
        ts_column=ts_column,
        override_num_blocks=blocks,
        batch_size=batch_rows,
    )
    stage_kwargs = {
        "evolution_log": cfg.evolution_log,
        "page_size": cfg.page_size,
        "metrics": metrics,
        "num_buckets": cfg.num_buckets,
        "extractor_kwargs": cfg.extractor_kwargs,
        "prefix": cfg.column_prefix,
        "included_fields": cfg.included_fields,
        "directory": directory,
    }
    if cfg.ingest_mode == "tasks":
        # task-based map fuses with the read into one operator (no extra
        # object-store round trip of the full stream, no pool ramp-up);
        # per-batch stage construction is microseconds. zero_copy_batch
        # hands the UDF sliced views — safe: every kernel downstream is
        # offset-independent (see functions/scalar.py::compact).
        def ingest_batch(batch: pa.Table) -> pa.Table:
            return IngestStage(**stage_kwargs)(batch)

        ds = ds.map_batches(
            ingest_batch,
            batch_format="pyarrow",
            # NOT batch_size=None: the read streams ~10k-row record
            # batches, so "whole block" degrades to per-record-batch
            # calls (measured ~1,700 stage constructions per window and
            # a weak partial combine); an explicit 128k batch re-batches
            # once and amortizes (see _INGEST_BATCH_ROWS); sized by the
            # planner so fragments/bucket stay flat at big windows
            batch_size=batch_rows,
            zero_copy_batch=True,
        )
    else:
        ds = ds.map_batches(
            IngestStage,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=cfg.extractor_concurrency,
            fn_constructor_kwargs=stage_kwargs,
        )
    if len(done_buckets):
        skip = pa.array(done_buckets)

        def drop_committed(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column(BUCKET_COLUMN), value_set=skip))
            return batch.filter(mask)

        ds = ds.map_batches(drop_committed, batch_format="pyarrow")

    # The single wide stage. Two implementations:
    #
    # - "disk" (default): two-phase fragment shuffle. Phase A streams the
    #   narrow stages and spills each block's rows into per-bucket
    #   parquet fragments (pure task parallelism — Ray 2.49's
    #   hash-shuffle submit path serializes on aggregator acceptance and
    #   left a 32-CPU node half idle). Phase B merges each bucket's
    #   fragments (+ prior lake state) and writes atomically. Duplicated
    #   fragments from retried tasks are harmless: the LWW merge is
    #   idempotent under duplicated rows.
    # - "hash": keyed repartition so every bucket lands wholly in one
    #   block, then merge+write per bucket inside the block.
    #   (groupby().map_groups is deliberately avoided in BOTH paths: its
    #   sort-based path in Ray 2.49 can split one group across two UDF
    #   calls, which would clobber a write-per-group sink.)
    import os
    import shutil as _shutil

    if cfg.shuffle not in ("disk", "hash"):
        raise ValueError(f"shuffle must be 'disk' or 'hash', got {cfg.shuffle!r}")
    if cfg.lake_layout not in ("rewrite", "delta"):
        raise ValueError(f"lake_layout must be 'rewrite' or 'delta', got {cfg.lake_layout!r}")
    if cfg.materialization not in ("auto", "eager", "late"):
        raise ValueError(
            f"materialization must be 'auto', 'eager' or 'late', got {cfg.materialization!r}"
        )
    if cfg.fragment_format not in ("auto", "parquet", "ipc", "ipc_lz4"):
        raise ValueError(
            "fragment_format must be 'auto', 'parquet', 'ipc' or 'ipc_lz4', "
            f"got {cfg.fragment_format!r}"
        )
    from embulk_input_marketo_ray.sinks.exactly_once import DeltaBucketWriter

    split_kwargs = {
        "split_threshold": cfg.split_threshold_rows,
        "depths": depths,
        "split_max_depth": cfg.split_max_depth,
    }
    if cfg.lake_layout == "delta":
        writer = DeltaBucketWriter(
            cfg.lake_dir, watermark_to, target_schema,
            fail_buckets=cfg.fail_buckets, compact_threshold=cfg.compact_threshold,
            filesystem=cfg.lake_filesystem,
            **split_kwargs,
        )
    else:
        writer = BucketMergeWriter(
            cfg.lake_dir, watermark_to, target_schema, fail_buckets=cfg.fail_buckets,
            filesystem=cfg.lake_filesystem,
            **split_kwargs,
        )
    if (
        cfg.lake_filesystem is not None or "://" in cfg.lake_dir
    ) and not cfg.shuffle_scratch_dir:
        # fragment/scan scratch is node-local/shared-POSIX by contract
        # and is NOT routed through the lake filesystem: with a remote
        # lake, default it to a deterministic local temp dir (multi-node
        # clusters are caught by the node-local guard below and must
        # set shuffle_scratch_dir explicitly)
        import hashlib as _hashlib
        import tempfile as _tf

        tag = _hashlib.sha256(cfg.lake_dir.encode()).hexdigest()[:12]
        scratch_root = os.path.join(_tf.gettempdir(), f"graft_shuffle_{tag}")
    else:
        scratch_root = cfg.shuffle_scratch_dir or os.path.join(cfg.lake_dir, "_shuffle")
    frag_fmt = cfg.fragment_format
    if frag_fmt == "auto":
        frag_fmt = "ipc" if scratch_root.startswith("/dev/shm") else "parquet"
    # fail FAST on a multi-node cluster with node-local scratch: the
    # phase-B merge tasks would not see fragments written on other
    # nodes and die with confusing missing-fragment errors instead
    import tempfile as _tempfile

    from embulk_input_marketo_ray.pipelines.queries import _multi_node_cluster

    if (
        scratch_root.startswith(("/dev/shm", _tempfile.gettempdir()))
        and _multi_node_cluster()
    ):
        raise RuntimeError(
            f"shuffle_scratch_dir={scratch_root!r} is node-local but this "
            "Ray cluster has multiple alive nodes; point it (or leave the "
            "default lake-local _shuffle) at a filesystem shared by every "
            "node"
        )

    # ---- materialization decision (see ReplayConfig.materialization) ----
    mat_used = "eager"
    winners_n: int | None = None
    scanned_n: int | None = None
    consider_late = cfg.materialization != "eager"
    if (
        cfg.materialization == "auto"
        and cfg.late_min_events
        and est_rows < cfg.late_min_events
    ):
        # footer-only estimate: the window is too small for the late
        # plan's extra dataset launches to pay off — skip even the scan
        consider_late = False
    if consider_late:
        scan_dir = scratch_root + "_scan"
        _shutil.rmtree(scan_dir, ignore_errors=True)
        winners_ds, scanned_n = _winner_scan(
            cfg, slices, ts_column, blocks, directory, done_buckets, scan_dir, frag_fmt,
            batch_rows=batch_rows,
        )
        _shutil.rmtree(scan_dir, ignore_errors=True)
        # size the broadcast from BLOCK METADATA (count of 8-byte
        # hashes) before any driver collection: a high-cardinality
        # window must fall back to eager without the driver ever
        # holding the winner set it is refusing to broadcast
        winners_n = winners_ds.count() if winners_ds is not None else 0
        too_big = 8 * winners_n > cfg.late_broadcast_limit
        low_dedup = scanned_n == 0 or winners_n > cfg.late_ratio * scanned_n
        if cfg.materialization == "late" and too_big:
            raise ValueError(
                f"late-materialization winner set ({8 * winners_n} bytes) exceeds "
                f"late_broadcast_limit ({cfg.late_broadcast_limit}); use "
                "materialization='auto' (falls back to eager) or raise the limit"
            )
        if cfg.materialization == "late" or not (too_big or low_dedup):
            mat_used = "late"

    if mat_used == "late":
        shuffle_dir = scratch_root + "_late"
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        # ONE broadcast of the winner-hash set (ray.put): every pass-2
        # task reads the same plasma object zero-copy — never re-shipped
        # per batch. This is the FIRST driver collection of the set,
        # and it runs only after the 8*winners_n budget check above.
        if winners_ds is None:
            wh = pa.array([], type=pa.uint64())
        else:
            parts = [t for t in ray.get(winners_ds.to_arrow_refs()) if t.num_rows]
            wh = (
                pa.concat_tables(parts).column("wh").combine_chunks()
                if parts
                else pa.array([], type=pa.uint64())
            )
        winners_ref = ray.put(wh)
        ds2 = read_change_events(
            cfg.events_dir,
            slices,
            ts_column=ts_column,
            override_num_blocks=blocks,
            batch_size=batch_rows,
        )
        late_kwargs = dict(
            stage_kwargs,
            winners_ref=winners_ref,
            shuffle_dir=shuffle_dir,
            frag_fmt=frag_fmt,
            done_buckets=done_buckets,
        )
        if cfg.ingest_mode == "tasks":

            def late_ingest(batch: pa.Table) -> pa.Table:
                return LateIngestStage(**late_kwargs)(batch)

            frag_stats = ds2.map_batches(
                late_ingest,
                batch_size=batch_rows,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            frag_stats = ds2.map_batches(
                LateIngestStage,
                batch_format="pyarrow",
                batch_size=cfg.batch_size,
                concurrency=cfg.extractor_concurrency,
                fn_constructor_kwargs=late_kwargs,
            )
        stats_rows, stats = _merge_fragments(shuffle_dir, writer, frag_stats)
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        stage_stats_text = (
            f"== Pass 1 (winner scan: {winners_n} winners of {scanned_n} events) ==\n"
            "(key+version columns only; see _winner_scan)\n"
            "== Pass 2 (protocol -> winner filter -> normalize -> fragment spill) ==\n"
            + frag_stats.stats()
            + "\n== Phase B (per-bucket merge + commit) ==\n"
            + (stats.stats() if stats is not None else "(empty window)")
        )
    elif cfg.shuffle == "disk":
        from embulk_input_marketo_ray.sinks.exactly_once import FragmentWriter

        shuffle_dir = scratch_root
        _shutil.rmtree(shuffle_dir, ignore_errors=True)  # scratch of crashed runs
        # task-based (construction = mkdirs, idempotent): fuses into the
        # same task chain as read+ingest — Phase A is one wave of pure
        # tasks with no pool ramp-up or reserved CPUs
        def write_fragments(block: pa.Table) -> pa.Table:
            return FragmentWriter(shuffle_dir, cfg.num_buckets, frag_fmt)(block)

        frag_stats = ds.map_batches(
            write_fragments,
            batch_size=batch_rows,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        stats_rows, stats = _merge_fragments(shuffle_dir, writer, frag_stats)
        _shutil.rmtree(shuffle_dir, ignore_errors=True)
        stage_stats_text = (
            "== Phase A (read -> ingest -> fragment spill) ==\n"
            + frag_stats.stats()
            + "\n== Phase B (per-bucket merge + commit) ==\n"
            + (stats.stats() if stats is not None else "(empty window)")
        )
    else:
        # sort=False: Ray 2.49's hash-shuffle finalize can't sort an
        # empty partition (empty-schema block); the writer sorts its own.
        shuffled = ds.repartition(cfg.num_buckets, keys=[BUCKET_COLUMN])

        def merge_and_write(block: pa.Table) -> pa.Table:
            return writer(block)

        stats = shuffled.map_batches(
            merge_and_write, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        stats_rows = stats.take_all()  # small: <= num_buckets lineage rows
        stage_stats_text = stats.stats()

    if cfg.collect_stats:
        # per-stage wall/cpu/row throughput (ds.stats) for this run,
        # persisted next to the checkpoint — the "throughput metrics
        # emitted per stage" artifact
        from embulk_input_marketo_ray.state.fsio import fs_mkdirs, fs_open_output

        fs_mkdirs(cfg.lake_filesystem, cfg.lake_dir + "/_state")
        with fs_open_output(
            cfg.lake_filesystem, cfg.lake_dir + "/_state/last_run_stats.txt"
        ) as f:
            f.write(stage_stats_text.encode())

    pids = [r["pid"] for r in stats_rows]
    if len(set(pids)) != len(pids):
        raise RuntimeError(
            "bucket split across shuffle partitions — exactly-once sink "
            f"invariant violated (duplicate pids in {sorted(pids)})"
        )

    if cfg.audit is not None:
        # full would-be lake: committed partitions the window didn't
        # touch + the touched pids' staged (would-be) file sets
        would_be = manifest.committed_file_sets()
        would_be.update(
            {
                r["pid"]: [
                    manifest.file_path(n)
                    for n in __import__("json").loads(r["files"])
                ]
                for r in stats_rows
            }
        )
        report = AuditReport(
            stats_rows=stats_rows,
            file_sets=would_be,
            from_ts=from_ts,
            to_ts=to_ts,
            filesystem=cfg.lake_filesystem,
        )
        if cfg.audit(report) is False:
            raise AuditFailed(
                f"audit vetoed window [{from_ts} .. {to_ts}]: "
                f"{sum(len(f) for f in report.file_sets.values())} staged "
                f"file(s) left uncommitted ({report.total_rows} rows); "
                f"watermark not advanced"
            )

    manifest.commit(
        {
            r["pid"]: {
                "rows": r["rows"],
                "events_in": r["events_in"],
                "lake_in": r["lake_in"],
                "dropped": r["dropped"],
                "watermark_to": r["watermark_to"],
                "fingerprint": r["fingerprint"],
                "files": __import__("json").loads(r["files"]),
                # depth only when splitting is enabled (-1 = untracked);
                # entries without it default to log2(num_buckets)
                **({"depth": r["depth"]} if r["depth"] >= 0 else {}),
            }
            for r in stats_rows
        },
        # point-lookup readers recompute a key's bucket route from this
        # (empty buckets have no partition entry, so the count cannot be
        # inferred from the manifest's partition list)
        extra={"num_buckets": cfg.num_buckets},
    )
    # ConfigDiff analog: from := to, only after commit; report_duration
    # carried like the program target (ProgramInputPlugin.java:181-201).
    # Non-incremental runs (incremental=false) leave the watermark
    # untouched — every run re-imports the configured window, like the
    # reference emitting no from_date advance in its ConfigDiff.
    if cfg.incremental:
        ckpt.advance(to_ts, report_duration=to_ts - from_ts)

    counters = ray.get(metrics.get.remote())
    ray.kill(metrics)
    events_read = int(counters.get("events_read", 0))
    merged_in = int(sum(r["events_in"] for r in stats_rows))
    rows_out = int(sum(r["rows"] for r in stats_rows))
    wall = time.perf_counter() - t0
    return {
        "skipped": False,
        "from": from_ts.isoformat(),
        "to": to_ts.isoformat(),
        "slices": len(slices),
        "buckets_written": len(stats_rows),
        "buckets_skipped": len(done_pids),
        "events_read": events_read,
        "events_in": merged_in,  # post partial-combine, pre final merge
        "rows_out": rows_out,
        "wall_s": wall,
        "events_per_s": events_read / wall if wall > 0 else 0.0,
        # which plan ran (late = two-phase winner-scan + filtered fetch)
        "materialization": mat_used,
        "winner_rows": winners_n,
        "scanned_rows": scanned_n,
        # planner-chosen ingest batch (fragments/bucket ~= ceil(rows/batch))
        "ingest_batch_rows": batch_rows,
    }


def replay_until_caught_up(cfg: ReplayConfig, max_windows: int = 100) -> list[dict]:
    """Binlog-tail shape: run incremental windows back-to-back until the
    watermark reaches the job start (a skip-run, W5). Each window is its
    own committed, resumable unit; the checkpoint chains them."""
    reports = []
    for _ in range(max_windows):
        report = replay(cfg)
        reports.append(report)
        if report["skipped"]:
            break
    return reports
