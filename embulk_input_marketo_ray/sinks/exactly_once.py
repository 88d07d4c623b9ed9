"""Exactly-once Parquet lake sink.

Replaces the reference's row-by-row PageBuilder sink
(delegate/MarketoBaseInputPluginDelegate.java:78-94) and its
byte-range-resume download (MarketoServiceImpl.java:113-133) with the
idiomatic distributed equivalent: each hash bucket of the upsert key is
one output partition; the merge kernel and the write happen together in
one ``groupby(bucket).map_groups`` stage; the partition file is written
to a temp path, fsynced, and atomically renamed; the driver then
commits the run's manifest (state/manifest.py) and only afterwards
advances the watermark checkpoint (W4).

Idempotence argument (exactly-once): partition ids are a deterministic
hash of the key, the merge is LWW (order-insensitive given
``commit_seq``), and re-merging the same window's events into an
already-merged lake partition is a fixed point — so any crash/retry
at any point converges to the same bytes on re-run.

Incremental multi-run upsert: the writer reads the bucket's existing
committed lake partition (from prior watermark windows), unify-casts it
to the current evolved schema (missing columns -> typed nulls), and
merges it with the window's events; tombstones delete matching older
lake rows and are then dropped.

Per-partition lineage (SURVEY.md §2.5 A4) is returned as the stage's
output rows and recorded in the manifest: events_in, lake_in, rows_out,
tombstones applied, and an order-insensitive content fingerprint.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray.data

from embulk_input_marketo_ray.stages.lww import BUCKET_COLUMN, LAKE_KEY, lww_merge
from embulk_input_marketo_ray.state.fsio import (
    fs_exists,
    fs_file_size,
    fs_isdir,
    fs_isfile,
    fs_listdir,
    fs_delete,
    fs_open_output,
)
from embulk_input_marketo_ray.state.manifest import PartitionManifest


def _fingerprint(table: pa.Table) -> str:
    """Order-insensitive partition fingerprint over (repo, path,
    content_sha256): Arrow sort + one sha256 over the sorted array's
    offsets+data buffers (no per-row Python list/sort — that loop was
    measurable inside the commit path on large buckets). Hashing the
    offsets buffer keeps row boundaries unambiguous."""
    if table.num_rows == 0:
        return "empty"
    import hashlib

    key = pc.binary_join_element_wise(
        table.column("repo").cast(pa.string()),
        table.column("path").cast(pa.string()),
        table.column("content_sha256").cast(pa.string()),
        "|",
    )
    arr = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
    arr = arr.take(pc.sort_indices(arr)).cast(pa.large_string())
    h = hashlib.sha256()
    h.update(arr.buffers()[1])  # offsets
    h.update(arr.buffers()[2])  # concatenated values
    return h.hexdigest()


_STATS_SCHEMA = pa.schema(
    [
        ("pid", pa.string()),
        ("rows", pa.int64()),
        ("events_in", pa.int64()),
        ("lake_in", pa.int64()),
        ("dropped", pa.int64()),
        ("watermark_to", pa.string()),
        ("fingerprint", pa.string()),
        ("files", pa.string()),  # json list of the pid's committed file names
        ("depth", pa.int64()),  # extendible-hash depth of the bucket's suffix
    ]
)
_EMPTY_STATS = _STATS_SCHEMA.empty_table()


def split_pieces(
    merged: pa.Table,
    suffix: int,
    depth: int,
    split_threshold: int,
    max_depth: int,
) -> list[tuple[int, int, pa.Table]]:
    """Recursive extendible-hash split of one merged bucket table.

    Returns ``[(suffix, depth, table), ...]`` — a single piece when the
    table fits ``split_threshold`` rows, else the bucket split by
    successive hash bits (child suffixes ``s`` and ``s | 2^d``) until
    every piece fits or ``max_depth`` is reached. Row count is the
    right size proxy here because LWW collapses each key to one row —
    a bucket's size is its distinct-key count, which splitting halves
    in expectation; a hot KEY cannot be split but also cannot grow a
    bucket (it stays one row).
    """
    from embulk_input_marketo_ray.functions.scalar import stable_key_hash_raw
    from embulk_input_marketo_ray.stages.lww import LAKE_KEY

    if merged.num_rows <= split_threshold or depth >= max_depth:
        return [(suffix, depth, merged)]
    raw = stable_key_hash_raw(merged, LAKE_KEY)
    bit = (raw >> np.uint64(depth)) & np.uint64(1)
    mask = pa.array(bit.astype(bool))
    left = merged.filter(pc.invert(mask))
    right = merged.filter(mask)
    return split_pieces(
        left, suffix, depth + 1, split_threshold, max_depth
    ) + split_pieces(
        right, suffix | (1 << depth), depth + 1, split_threshold, max_depth
    )


class BucketMergeWriter:
    """Per-bucket merge + atomic write; used inside ``map_groups``.

    Plain callable (stateless aside from small config) — the group
    shuffle provides the partitioning; returns one lineage row.
    ``fail_buckets`` injects crashes for the resume tests.
    """

    def __init__(
        self,
        lake_dir: str,
        watermark_to: str,
        target_schema: pa.Schema,
        fail_buckets: frozenset[int] = frozenset(),
        split_threshold: int | None = None,
        depths: dict[int, int] | None = None,
        split_max_depth: int = 20,
        filesystem=None,
    ) -> None:
        # optional pyarrow.fs.FileSystem routing all lake IO (picklable,
        # so the object rides the stage closure into Ray workers); None
        # = local POSIX fast path (state/fsio.py seam)
        self.fs = filesystem
        self.lake_dir = lake_dir
        self.watermark_to = watermark_to
        self.target_schema = target_schema
        self.fail_buckets = fail_buckets
        # bucket splitting (lake growth): when a merged bucket exceeds
        # ``split_threshold`` rows it splits into suffix children (see
        # split_pieces); ``depths`` is the manifest's per-bucket depth
        # map captured at run start (routing uses the same snapshot).
        self.split_threshold = split_threshold
        self.depths = depths or {}
        self.split_max_depth = split_max_depth

    def _maybe_split(self, bucket: int, merged: pa.Table) -> list[tuple[int, int, pa.Table]]:
        """[(suffix, depth, piece)] — single piece (depth -1 = "no depth
        tracking") when splitting is disabled; manifest entries without
        a depth default to the initial log2(num_buckets) on later runs."""
        if not self.split_threshold:
            return [(bucket, -1, merged)]
        # routing only emits buckets present in the depth map; a miss is a bug
        depth = int(self.depths[bucket])
        return split_pieces(
            merged, bucket, depth, self.split_threshold, self.split_max_depth
        )

    def _union_schema(self, lake_schema: pa.Schema) -> pa.Schema:
        """Union of the current target schema and the committed lake
        partition's schema. If a later run narrows ``included_fields``
        (or an evolution-log column disappears), columns already
        committed to the lake are PRESERVED — projecting to the current
        target alone would silently delete committed data from every
        rewritten bucket and leave the lake schema-inconsistent across
        touched/untouched partitions."""
        fields = list(self.target_schema)
        present = set(self.target_schema.names)
        for f in lake_schema:
            if f.name not in present:
                fields.append(f)
        return pa.schema(fields)

    def _unify(self, table: pa.Table, schema: pa.Schema | None = None) -> pa.Table:
        """Cast a (possibly older-schema) table to ``schema`` (default:
        the current evolved target schema): add missing columns as typed
        nulls, widen types."""
        schema = schema or self.target_schema
        cols = []
        for field in schema:
            if field.name in table.column_names:
                cols.append(table.column(field.name).cast(field.type))
            else:
                cols.append(pa.nulls(table.num_rows, type=field.type))
        return pa.Table.from_arrays(cols, schema=schema)

    def __call__(self, block: pa.Table) -> pa.Table:
        """Process one hash-partition block, which may contain SEVERAL
        whole buckets (the block arrives sorted by bucket from
        ``repartition(num_buckets, keys=[bucket], sort=True)``; a
        bucket is never split across partitions because partition id is
        a deterministic function of the bucket value). Ray's
        ``map_groups`` is NOT used here: in Ray 2.49 its sort-based
        path can split one group across two block-level UDF calls,
        which for a write-per-group sink silently clobbers data."""
        if block.num_rows == 0:
            return _EMPTY_STATS
        block = block.sort_by(BUCKET_COLUMN)  # contiguous runs per bucket
        buckets = block.column(BUCKET_COLUMN)
        values = np.asarray(buckets.combine_chunks() if isinstance(buckets, pa.ChunkedArray) else buckets)
        uniq, starts = np.unique(values, return_index=True)
        ends = np.append(starts[1:], len(values))
        stats = [
            self._write_one(int(b), block.slice(int(s), int(e - s)))
            for b, s, e in zip(uniq, starts, ends)
        ]
        return pa.concat_tables(stats)

    def _write_one(self, bucket: int, group: pa.Table) -> pa.Table:
        if bucket in self.fail_buckets:
            raise RuntimeError(f"injected crash in bucket {bucket}")
        manifest = PartitionManifest(self.lake_dir, filesystem=self.fs)
        pid = f"{bucket:05d}"
        events = group.drop_columns([BUCKET_COLUMN])

        lake_path = manifest.data_path(pid)
        if fs_exists(self.fs, lake_path):
            # prior windows' committed state; synthetic op/seq columns are
            # restored from the stored commit_seq (kept in the lake).
            # Unify BOTH sides toward the union of the stored lake schema
            # and the new target schema so a narrowed included_fields run
            # never deletes committed columns.
            stored = pq.read_table(lake_path, filesystem=self.fs)
            union = self._union_schema(stored.schema)
            lake = self._unify(stored, union)
            lake_in = lake.num_rows
            merged_input = pa.concat_tables(
                [self._unify(events, union), lake], promote_options="none"
            )
        else:
            lake_in = 0
            merged_input = self._unify(events)

        merged = lww_merge(merged_input, LAKE_KEY, "commit_seq", op_column="op")
        n_events = events.num_rows
        import json as _json

        # one piece normally; several when the bucket crossed the split
        # threshold (every piece is written+promoted before the driver's
        # single manifest commit makes them all visible atomically)
        pieces = self._maybe_split(bucket, merged)
        total_rows = sum(p.num_rows for _, _, p in pieces)
        rows = []
        for i, (suffix, depth, piece) in enumerate(pieces):
            piece_pid = f"{suffix:05d}"
            tmp = manifest.tmp_path(piece_pid)
            with fs_open_output(self.fs, tmp) as f:
                pq.write_table(piece, f)
            manifest.promote(piece_pid)
            # window lineage is attributed to the first piece (the
            # original suffix); per-piece rows/fingerprints stay exact
            rows.append(
                {
                    "pid": piece_pid,
                    "rows": piece.num_rows,
                    "events_in": n_events if i == 0 else 0,
                    "lake_in": lake_in if i == 0 else 0,
                    "dropped": (n_events + lake_in - total_rows) if i == 0 else 0,
                    "watermark_to": self.watermark_to,
                    "fingerprint": _fingerprint(piece),
                    "files": _json.dumps([f"part-{piece_pid}.parquet"]),
                    "depth": depth,
                }
            )
        return pa.Table.from_pylist(rows, schema=_STATS_SCHEMA)


class DeltaBucketWriter(BucketMergeWriter):
    """Delta-file lake layout: a window appends ONE delta file per
    touched bucket instead of rewriting the bucket's full partition.

    Motivation (lake growth): the rewrite layout's per-window cost is
    read+merge+write of the whole bucket — write amplification grows
    with LAKE size, so a 100 TB lake with small incremental windows
    pays ~lake/window extra IO every run. Here a window's cost is
    ∝ the window: the delta holds the window's per-key-latest events
    (tombstones KEPT — they must be able to delete base rows), and
    readers/compaction LWW-merge base+deltas by ``commit_seq``
    (order-insensitive, so merge-on-read is exact).

    Compaction: when a bucket's file count exceeds
    ``compact_threshold``, base+deltas are merged (tombstones dropped)
    into a new single base file — LSM level-0 style. Replaced files are
    no longer referenced by the manifest (readers use the manifest's
    "files" list only) and are ignored on disk.

    Exactly-once: the delta file name is a deterministic function of
    (bucket, watermark), written via temp+atomic-rename, so a crashed
    window's re-run overwrites the same file and re-commits the same
    manifest entry — same fixed point as the rewrite layout.
    """

    def __init__(
        self,
        lake_dir: str,
        watermark_to: str,
        target_schema: pa.Schema,
        fail_buckets: frozenset[int] = frozenset(),
        compact_threshold: int = 8,
        split_threshold: int | None = None,
        depths: dict[int, int] | None = None,
        split_max_depth: int = 20,
        filesystem=None,
    ) -> None:
        super().__init__(
            lake_dir,
            watermark_to,
            target_schema,
            fail_buckets,
            split_threshold=split_threshold,
            depths=depths,
            split_max_depth=split_max_depth,
            filesystem=filesystem,
        )
        self.compact_threshold = compact_threshold
        import re as _re

        self._wm_tag = _re.sub(r"[^0-9A-Za-z]", "", watermark_to)

    def _write_one(self, bucket: int, group: pa.Table) -> pa.Table:
        import json as _json

        if bucket in self.fail_buckets:
            raise RuntimeError(f"injected crash in bucket {bucket}")
        manifest = PartitionManifest(self.lake_dir, filesystem=self.fs)
        pid = f"{bucket:05d}"
        events = group.drop_columns([BUCKET_COLUMN])

        # window-local LWW combine; tombstones survive into the delta
        delta = lww_merge(self._unify(events), LAKE_KEY, "commit_seq", op_column=None)
        name = f"delta-{pid}-{self._wm_tag}.parquet"
        tmp = manifest.tmp_file_path(name)
        with fs_open_output(self.fs, tmp) as f:
            pq.write_table(delta, f)
        manifest.promote_file(name)

        entry = manifest.load()["partitions"].get(pid)
        prev_files = list(entry.get("files", [])) if entry else []
        files = prev_files + ([name] if name not in prev_files else [])
        depth = int(self.depths[bucket]) if self.split_threshold else -1
        if len(files) <= self.compact_threshold:
            return pa.Table.from_pylist(
                [
                    {
                        "pid": pid,
                        "rows": delta.num_rows,
                        "events_in": events.num_rows,
                        "lake_in": 0,
                        "dropped": events.num_rows - delta.num_rows,
                        "watermark_to": self.watermark_to,
                        "fingerprint": _fingerprint(delta),
                        "files": _json.dumps(files),
                        "depth": depth,
                    }
                ],
                schema=_STATS_SCHEMA,
            )

        # compaction: merge base+deltas; this is also the split point —
        # an oversized bucket leaves compaction as several suffix
        # children, each with its own single base file
        merged = merge_bucket_files(
            [manifest.file_path(n) for n in files],
            drop_tombstones=True,
            filesystem=self.fs,
        )
        pieces = self._maybe_split(bucket, merged)
        rows = []
        for i, (suffix, pdepth, piece) in enumerate(pieces):
            piece_pid = f"{suffix:05d}"
            base = f"base-{piece_pid}-{self._wm_tag}.parquet"
            btmp = manifest.tmp_file_path(base)
            with fs_open_output(self.fs, btmp) as f:
                pq.write_table(piece, f)
            manifest.promote_file(base)
            rows.append(
                {
                    "pid": piece_pid,
                    "rows": piece.num_rows,
                    "events_in": events.num_rows if i == 0 else 0,
                    "lake_in": 0,
                    "dropped": (events.num_rows - delta.num_rows) if i == 0 else 0,
                    "watermark_to": self.watermark_to,
                    "fingerprint": _fingerprint(piece),
                    "files": _json.dumps([base]),
                    "depth": pdepth,
                }
            )
        return pa.Table.from_pylist(rows, schema=_STATS_SCHEMA)


def merge_bucket_files(
    paths: list[str],
    drop_tombstones: bool = True,
    columns: list[str] | None = None,
    filter_expr=None,
    filesystem=None,
) -> pa.Table:
    """LWW merge-on-read of one bucket's committed file set (optional
    base + per-window deltas). Schemas may differ across windows
    (evolution) — unified permissively (missing columns -> nulls).

    ``columns`` pushes projection INTO the parquet reads: only the
    requested columns plus the merge's own needs (key, commit_seq, op)
    leave storage — a narrow read over a content-heavy lake skips the
    content bytes entirely instead of pruning after the merge. Columns
    a given window's file predates (schema evolution) are skipped at
    that file and surface as nulls via the permissive concat.

    ``filter_expr`` (a ``pyarrow.dataset`` Expression over the KEY
    columns) pushes row selection into the reads too: row groups whose
    min/max stats exclude the filter never leave storage — on a
    key-SORTED base (``compact(sort=True)``) a point lookup touches
    O(1) row groups instead of the whole file. Only key predicates are
    sound here: LWW resolves each key from that key's rows alone, so
    dropping other keys' rows pre-merge cannot change any kept row."""
    need = None
    if columns is not None:
        need = list(dict.fromkeys(list(columns) + LAKE_KEY + ["commit_seq", "op"]))
    def _read_one(p: str) -> pa.Table:
        present = set(pq.read_schema(p, filesystem=filesystem).names)
        cols = [c for c in need if c in present] if need is not None else None
        if filter_expr is not None:
            return pads.dataset(p, format="parquet", filesystem=filesystem).to_table(
                columns=cols, filter=filter_expr
            )
        if need is None:
            return pq.read_table(p, filesystem=filesystem)
        return pq.read_table(p, columns=cols, filesystem=filesystem)

    tables = [_read_one(p) for p in paths]
    if len(tables) == 1 and drop_tombstones is False:
        return tables[0]
    merged_input = (
        tables[0]
        if len(tables) == 1
        else pa.concat_tables(tables, promote_options="permissive")
    )
    return lww_merge(
        merged_input,
        LAKE_KEY,
        "commit_seq",
        op_column="op" if drop_tombstones else None,
        drop_tombstones=drop_tombstones,
    )


class FragmentWriter:
    """Phase A of the disk shuffle: each ingest block is split by bucket
    and appended as one parquet fragment per (block, bucket) under
    ``lake/_shuffle/bucket=<b>/``.

    No aggregator actors, no all-to-all object transfer: the exchange
    rides the filesystem (object-store-to-disk on one node; a shared
    FS / per-node spill volume on a cluster). Retried tasks may write
    duplicate fragments — harmless, because the LWW merge is idempotent
    under duplicated rows (same (key, seq) collapses to the same row).
    """

    def __init__(self, shuffle_dir: str, num_buckets: int, fragment_format: str = "parquet") -> None:
        if fragment_format not in ("parquet", "ipc", "ipc_lz4"):
            raise ValueError(
                f"fragment_format must be 'parquet', 'ipc' or 'ipc_lz4', got {fragment_format!r}"
            )
        self.shuffle_dir = shuffle_dir
        self.num_buckets = num_buckets
        # "parquet" (snappy) for real disks — 2-3x fewer bytes through a
        # bandwidth-capped device; "ipc" (uncompressed Arrow IPC) for
        # tmpfs / fast NVMe scratch — fragment write becomes a memcpy,
        # no encode/decode CPU on either side of the exchange;
        # "ipc_lz4" (lz4-frame Arrow IPC) when the scratch is fast but
        # BANDWIDTH-bound — ~2.5x fewer bytes through the exchange for
        # ~5 ms/10k-row block of encode CPU (measured on the 13-column
        # change-event schema), the knob that trades spare CPU for
        # memory/storage bandwidth at wide parallelism.
        self.fragment_format = fragment_format
        self._ipc_options = (
            pa.ipc.IpcWriteOptions(compression="lz4")
            if fragment_format == "ipc_lz4"
            else None
        )
        for b in range(num_buckets):
            os.makedirs(os.path.join(shuffle_dir, f"bucket={b:05d}"), exist_ok=True)

    def __call__(self, block: pa.Table) -> pa.Table:
        import uuid

        if block.num_rows == 0:
            return pa.table({"bucket": pa.array([], type=pa.int32()),
                             "rows": pa.array([], type=pa.int64()),
                             "frag_path": pa.array([], type=pa.string())})
        block = block.sort_by(BUCKET_COLUMN)
        values = block.column(BUCKET_COLUMN)
        values = np.asarray(values.combine_chunks() if isinstance(values, pa.ChunkedArray) else values)
        uniq, starts = np.unique(values, return_index=True)
        ends = np.append(starts[1:], len(values))
        frag = uuid.uuid4().hex[:12]
        out_b, out_n, out_p = [], [], []
        for b, s, e in zip(uniq, starts, ends):
            part = block.slice(int(s), int(e - s)).drop_columns([BUCKET_COLUMN])
            bucket_dir = os.path.join(self.shuffle_dir, f"bucket={int(b):05d}")
            # split children carry ids >= the initial num_buckets — their
            # directories aren't pre-created in __init__
            os.makedirs(bucket_dir, exist_ok=True)
            stem = os.path.join(bucket_dir, f"frag-{frag}")
            if self.fragment_format in ("ipc", "ipc_lz4"):
                with pa.OSFile(stem + ".arrow", "wb") as f:
                    with pa.ipc.new_file(f, part.schema, options=self._ipc_options) as w:
                        w.write_table(part)
            else:
                pq.write_table(part, stem + ".parquet")
            out_b.append(int(b))
            out_n.append(part.num_rows)
            out_p.append(
                stem + (".arrow" if self.fragment_format in ("ipc", "ipc_lz4") else ".parquet")
            )
        # frag_path lets RETRY-SAFE consumers read exactly the fragments
        # the SUCCESSFUL task attempt wrote (a retried phase-A task may
        # leave duplicate fragments on disk — harmless for the LWW merge,
        # which is idempotent and globs, but a counting kernel must use
        # the explicit list; see pipelines.queries.fragment_keyed_exchange)
        return pa.table({"bucket": pa.array(out_b, type=pa.int32()),
                         "rows": pa.array(out_n, type=pa.int64()),
                         "frag_path": pa.array(out_p, type=pa.string())})


def read_fragment(path: str) -> pa.Table:
    """Read one exchange fragment (Arrow IPC or parquet, by suffix)."""
    if path.endswith(".arrow"):
        with pa.ipc.open_file(path) as r:
            return r.read_all()
    return pq.read_table(path)


class FragmentMerger:
    """Phase B: one task per bucket reads its fragments (+ the existing
    committed lake partition), LWW-merges, writes atomically. The
    per-bucket ``writer`` (rewrite or delta layout) is injected."""

    def __init__(self, shuffle_dir: str, writer: "BucketMergeWriter") -> None:
        self.writer = writer
        self.shuffle_dir = shuffle_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        import glob as _glob
        from concurrent.futures import ThreadPoolExecutor

        out = []
        for b in batch.column("bucket").to_pylist():
            files = sorted(
                _glob.glob(os.path.join(self.shuffle_dir, f"bucket={b:05d}", "*.parquet"))
                + _glob.glob(os.path.join(self.shuffle_dir, f"bucket={b:05d}", "*.arrow"))
            )
            if not files:
                continue
            # a bucket accumulates one tiny fragment per upstream batch
            # (~100+ files); the ~2-3 ms open/parse per file is IO+GIL-
            # released overhead, so a thread pool turns a serial 0.3 s
            # scan into ~0.05 s — the merge stage's dominant cost
            if len(files) > 8:
                with ThreadPoolExecutor(max_workers=8) as ex:
                    frags = list(ex.map(read_fragment, files))
            else:
                frags = [read_fragment(f) for f in files]
            events = pa.concat_tables(frags)
            out.append(self.writer._write_one(int(b), events.append_column(
                BUCKET_COLUMN, pa.array(np.full(events.num_rows, b, dtype=np.int32)))))
        if not out:
            return _EMPTY_STATS
        return pa.concat_tables(out)


def _file_window_tag(path: str) -> str | None:
    """Window tag baked into delta-layout file names
    (``delta-<pid>-<tag>.parquet`` / ``base-<pid>-<tag>.parquet``);
    the tag is the window's ISO watermark stripped to alnum, fixed
    width, so lexicographic order == time order. ``part-`` files
    (rewrite layout) carry no history -> None."""
    import re as _re

    m = _re.match(
        r"(?:delta|base)-\d+-([0-9A-Za-z]+)\.parquet$", os.path.basename(path)
    )
    return m.group(1) if m else None


def _as_of_tag(as_of) -> str:
    import re as _re
    from datetime import datetime as _dt

    if isinstance(as_of, _dt):
        as_of = as_of.isoformat()
    return _re.sub(r"[^0-9A-Za-z]", "", str(as_of))


def select_files_as_of(sets: dict[str, list[str]], as_of) -> dict[str, list[str]]:
    """Time travel over the delta lake: per partition, keep only the
    files of windows committed at-or-before ``as_of`` (ISO watermark
    string or datetime). History granularity is the WINDOW — each
    window appends one delta per touched bucket — and retention ends
    at the last compaction: once a bucket compacts its deltas into a
    ``base-`` file, states older than that base are gone (raise, don't
    silently return the wrong snapshot). Partitions first touched
    after ``as_of`` are simply absent from the snapshot."""
    tag = _as_of_tag(as_of)
    out: dict[str, list[str]] = {}
    for pid, fs in sorted(sets.items()):
        kept: list[str] = []
        compacted_past = False
        for p in fs:
            t = _file_window_tag(p)
            if t is None:
                raise ValueError(
                    f"as_of read requires the delta lake layout; {os.path.basename(p)} "
                    "is a rewrite-layout partition with no window history"
                )
            if t <= tag:
                kept.append(p)
            elif os.path.basename(p).startswith("base-"):
                compacted_past = True
        if not kept:
            if compacted_past:
                raise ValueError(
                    f"partition {pid}: history before its base compaction was "
                    f"discarded; as_of={as_of!r} predates the oldest retained state "
                    "(raise compact_threshold to retain more windows)"
                )
            continue  # partition did not exist yet at as_of
        out[pid] = kept
    return out


def changes_between(
    lake_dir: str, since, until=None, columns: list[str] | None = None,
    filesystem=None,
) -> "ray.data.Dataset":
    """CDC feed OUT of the delta lake: one row per key changed in the
    windows committed after ``since`` and at-or-before ``until``
    (watermark ISO strings / datetimes; ``until=None`` = everything
    after ``since``). Rows keep the ``op`` column — a consumer applies
    upserts and deletes downstream; the row is each key's LATEST state
    within the range (per-window deltas are already LWW-combined, the
    range merge LWW-combines across windows).

    Requires the delta layout, and history back to ``since``: a bucket
    whose ``base-`` compaction is newer than ``since`` folded earlier
    windows into one state and can no longer isolate the range —
    raises instead of emitting a wrong feed. One merge task per bucket,
    no shuffle (files are already key-partitioned)."""
    since_tag = _as_of_tag(since)
    until_tag = _as_of_tag(until) if until is not None else None
    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs
    sets = manifest.committed_file_sets()
    selected: dict[str, list[str]] = {}
    for pid, fs in sorted(sets.items()):
        kept: list[str] = []
        for p in fs:
            t = _file_window_tag(p)
            if t is None:
                raise ValueError(
                    f"changes_between requires the delta lake layout; "
                    f"{os.path.basename(p)} is a rewrite-layout partition"
                )
            name = os.path.basename(p)
            if name.startswith("base-") and t > since_tag:
                raise ValueError(
                    f"partition {pid}: its base compaction ({t}) is newer than "
                    f"since={since!r}; the per-window history of the requested "
                    "range was folded into the base (raise compact_threshold "
                    "to retain more windows)"
                )
            if name.startswith("delta-") and t > since_tag and (
                until_tag is None or t <= until_tag
            ):
                kept.append(p)
        if kept:
            selected[pid] = kept
    if not selected:
        import ray.data as _rd

        return _rd.from_items([]).limit(0)
    specs = ray.data.from_items(
        [{"pid": pid, "paths": "\n".join(fs)} for pid, fs in sorted(selected.items())]
    ).repartition(len(selected))

    def merge_read(batch: pa.Table):
        for paths in batch.column("paths").to_pylist():
            merged = merge_bucket_files(
                paths.split("\n"), drop_tombstones=False, columns=columns,
                filesystem=filesystem,
            )
            yield merged.select(columns) if columns else merged

    return specs.map_batches(merge_read, batch_format="pyarrow", batch_size=None)


_DIFF_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("change_kind", pa.string()),
        ("old_seq", pa.int64()),
        ("new_seq", pa.int64()),
    ]
)


def snapshot_diff(lake_dir: str, v1, v2, filesystem=None) -> "ray.data.Dataset":
    """Set-level diff between two committed lake versions: one row per
    key whose live state differs between the ``v1`` and ``v2``
    snapshots, classified ``added`` (absent at v1), ``deleted``
    (absent — or tombstoned — at v2) or ``modified`` (live in both
    with a different ``commit_seq``). Unchanged keys are not emitted.

    Distinct from ``changes_between`` (the delta-file CDC feed): the
    feed replays window deltas and reports each changed key's latest
    EVENT (op column as the event stream saw it); the diff compares
    MATERIALIZED STATES, so a key upserted then deleted inside the
    range never appears, and a key re-upserted to a new commit_seq
    reports exactly one ``modified`` row regardless of how many
    windows touched it.

    Scale shape: ZERO shuffle. Both snapshots share the lake's bucket
    partitioning, so the diff is one task per bucket — merge-on-read
    of the two as-of file sets with projection pushed to the key +
    ``commit_seq`` columns (content bytes never leave storage),
    full-outer joined per bucket with an Arrow hash join. Per-bucket
    pairing is sound because ``select_files_as_of`` RAISES if any
    compaction (the only split point in the delta layout) folded
    history after ``v1`` — if both selections succeed, no key moved
    buckets between the two versions."""
    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs
    sets = manifest.committed_file_sets()
    old_sets = select_files_as_of(sets, v1)
    new_sets = select_files_as_of(sets, v2)
    pids = sorted(set(old_sets) | set(new_sets))
    if not pids:
        import ray.data as _rd

        return _rd.from_items([]).limit(0)
    specs = ray.data.from_items(
        [
            {
                "pid": pid,
                "old": "\n".join(old_sets.get(pid, [])),
                "new": "\n".join(new_sets.get(pid, [])),
            }
            for pid in pids
        ]
    ).repartition(len(pids))

    def _side(paths: str, seq_name: str) -> pa.Table:
        if not paths:
            return pa.table(
                {
                    **{k: pa.array([], pa.string()) for k in LAKE_KEY},
                    seq_name: pa.array([], pa.int64()),
                }
            )
        t = merge_bucket_files(
            paths.split("\n"), drop_tombstones=True, columns=["commit_seq"],
            filesystem=filesystem,
        )
        return t.select(LAKE_KEY + ["commit_seq"]).rename_columns(
            LAKE_KEY + [seq_name]
        )

    def diff(batch: pa.Table):
        for old_paths, new_paths in zip(
            batch.column("old").to_pylist(), batch.column("new").to_pylist()
        ):
            yield diff_states(
                _side(old_paths, "old_seq"), _side(new_paths, "new_seq")
            )

    return specs.map_batches(diff, batch_format="pyarrow", batch_size=None)


def diff_states(old: pa.Table, new: pa.Table) -> pa.Table:
    """The snapshot_diff classification kernel: full-outer Arrow hash
    join of two live states (unique keys each, ``old_seq``/``new_seq``
    version columns), keeping only keys absent from one side or with a
    differing version — change_kind added / deleted / modified."""
    joined = old.join(new, keys=LAKE_KEY, join_type="full outer").combine_chunks()
    old_seq = joined.column("old_seq")
    new_seq = joined.column("new_seq")
    # not_equal is null exactly when one side is absent — i.e. a changed
    # row (both-null is impossible after the full outer join)
    j = joined.filter(pc.fill_null(pc.not_equal(old_seq, new_seq), True))
    o, n = j.column("old_seq"), j.column("new_seq")
    kind = pc.if_else(
        pc.is_null(o),
        pa.scalar("added"),
        pc.if_else(pc.is_null(n), pa.scalar("deleted"), pa.scalar("modified")),
    )
    return pa.table(
        {
            "repo": j.column("repo"),
            "path": j.column("path"),
            "change_kind": kind,
            "old_seq": o.cast(pa.int64()),
            "new_seq": n.cast(pa.int64()),
        },
        schema=_DIFF_SCHEMA,
    )


def read_lake(
    lake_dir: str, columns: list[str] | None = None, as_of=None, filesystem=None
) -> "ray.data.Dataset":
    """Read the committed lake partitions (manifest-listed files only).

    Rewrite layout (one file per pid): plain parallel parquet read.
    Delta layout: merge-on-read — one task per bucket LWW-merges its
    base+delta set (no shuffle needed: the file set is already
    partitioned by the bucket hash of the upsert key). ``as_of``
    (delta layout only) reads the lake AS OF an earlier window's
    watermark (see select_files_as_of)."""
    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    sets = manifest.committed_file_sets()
    if as_of is not None:
        sets = select_files_as_of(sets, as_of)
    if not sets:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    return read_file_sets(sets, columns=columns, filesystem=manifest.fs)


def read_file_sets(
    sets: dict[str, list[str]], columns: list[str] | None = None, filesystem=None
) -> "ray.data.Dataset":
    """Merge-on-read over explicit pid -> file-path sets — the kernel of
    ``read_lake``, reusable on file sets that are NOT (yet) the
    committed manifest state: a Write-Audit-Publish gate reads the
    WOULD-BE state of an uncommitted window through this (see
    pipelines.cdc_replay.AuditReport.read_state)."""
    if all(len(fs) == 1 and _is_merged_file(fs[0]) for fs in sets.values()):
        files = [fs[0] for _, fs in sorted(sets.items())]
        return ray.data.read_parquet(files, columns=columns, filesystem=filesystem)

    specs = ray.data.from_items(
        [{"pid": pid, "paths": "\n".join(fs)} for pid, fs in sorted(sets.items())]
    ).repartition(len(sets))

    def merge_read(batch: pa.Table):
        for paths in batch.column("paths").to_pylist():
            merged = merge_bucket_files(
                paths.split("\n"), drop_tombstones=True, columns=columns,
                filesystem=filesystem,
            )
            yield merged.select(columns) if columns else merged

    return specs.map_batches(merge_read, batch_format="pyarrow", batch_size=None)


def read_lake_table(
    lake_dir: str, columns: list[str] | None = None, as_of=None, filesystem=None
) -> pa.Table:
    """Driver-side (small-result) materialization of the lake;
    ``as_of`` = time travel (delta layout, see select_files_as_of)."""
    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs
    sets = manifest.committed_file_sets()
    if as_of is not None:
        sets = select_files_as_of(sets, as_of)
    if not sets:
        return None
    tables = []
    for _, fs in sorted(sets.items()):
        if len(fs) == 1 and _is_merged_file(fs[0]):
            if columns:
                present = set(pq.read_schema(fs[0], filesystem=filesystem).names)
                merged = pq.read_table(
                    fs[0], columns=[c for c in columns if c in present],
                    filesystem=filesystem,
                )
            else:
                merged = pq.read_table(fs[0], filesystem=filesystem)
        else:  # delta sets (even singletons) still hold tombstones
            merged = merge_bucket_files(
                fs, drop_tombstones=True, columns=columns, filesystem=filesystem
            )
        tables.append(merged.select(columns) if columns else merged)
    return pa.concat_tables(tables, promote_options="permissive")


def _is_merged_file(path: str) -> bool:
    """part-/base- files hold fully merged, tombstone-free state;
    delta- files still carry tombstones and need merge-on-read."""
    base = os.path.basename(path)
    return base.startswith("part-") or base.startswith("base-")


def lookup_keys(
    lake_dir: str,
    keys: list[tuple[str, str]],
    columns: list[str] | None = None,
    filesystem=None,
) -> pa.Table:
    """Point lookup with partition pruning: read ONLY the buckets the
    requested ``(repo, path)`` keys route to, never the whole lake.

    The reader recomputes each key's bucket exactly the way the writer
    placed it — the extendible-hash directory when the manifest carries
    split depths, else ``stable_key_hash % num_buckets`` — so a lookup
    touches 1 partition per distinct routed bucket (O(keys), not
    O(lake)). Keys whose head state is a tombstone (or that never
    existed) are simply absent from the result. Driver-side by design:
    point lookups are small; bulk access goes through ``read_lake``.

    Requires a lake committed with the ``num_buckets`` manifest stamp
    (written since round 3); raises on older lakes rather than guessing
    a route."""
    from embulk_input_marketo_ray.functions.scalar import stable_key_hash
    from embulk_input_marketo_ray.stages.lww import (
        LAKE_KEY,
        bucket_depths,
        build_directory,
        route_buckets,
    )
    from embulk_input_marketo_ray.state.manifest import PartitionManifest

    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs
    state = manifest.load()
    num_buckets = state.get("num_buckets")
    if num_buckets is None:
        raise ValueError(
            f"{lake_dir}: manifest carries no num_buckets stamp — this lake "
            "predates point-lookup support; read it via read_lake instead"
        )
    keys_tbl = pa.table(
        {
            "repo": pa.array([k[0] for k in keys], type=pa.string()),
            "path": pa.array([k[1] for k in keys], type=pa.string()),
        }
    )
    has_depths = any(
        "depth" in entry for entry in state.get("partitions", {}).values()
    )
    if has_depths:
        directory = build_directory(bucket_depths(state, num_buckets))
        buckets = route_buckets(keys_tbl, directory, LAKE_KEY)
    else:
        buckets = stable_key_hash(keys_tbl, LAKE_KEY, num_buckets)

    committed = manifest.committed_file_sets()
    if not committed:
        raise FileNotFoundError(f"no committed partitions under {lake_dir}")
    wanted = pc.binary_join_element_wise(
        keys_tbl.column("repo"), keys_tbl.column("path"), "\x00"
    )
    # key-predicate pushdown: row groups whose repo/path stats exclude
    # every probed key never leave storage (O(1) groups per key on a
    # sorted base, see compact(sort=True)); sound for LWW because a
    # key's winner depends only on that key's own rows. The (repo in R)
    # x (path in P) cross is a superset of the exact pairs — the
    # existing exact filter below finishes the job.
    probe_filter = pads.field("repo").isin(
        keys_tbl.column("repo").unique()
    ) & pads.field("path").isin(keys_tbl.column("path").unique())
    out: list[pa.Table] = []
    for b in sorted(set(int(x) for x in buckets)):
        fs = committed.get(f"{int(b):05d}")
        if not fs:
            continue  # bucket never received data -> keys absent
        merged = merge_bucket_files(
            fs, drop_tombstones=True, columns=columns, filter_expr=probe_filter,
            filesystem=filesystem,
        )
        joined = pc.binary_join_element_wise(
            merged.column("repo").cast(pa.string()),
            merged.column("path").cast(pa.string()),
            "\x00",
        )
        hit = pc.is_in(joined, value_set=wanted)
        part = merged.filter(hit)
        out.append(part.select(columns) if columns else part)
    if not out:
        empty = merge_bucket_files(
            [fs[0] for fs in list(committed.values())[:1]], drop_tombstones=True,
            filesystem=filesystem,
        ).slice(0, 0)
        return empty.select(columns) if columns else empty
    return pa.concat_tables(out, promote_options="permissive")



def lake_stats(lake_dir: str, filesystem=None) -> dict:
    """ANALYZE-style lake inventory from metadata alone: per-partition
    physical rows (parquet footers) + last-commit lineage rows, file
    count/bytes, parquet row-group count
    and whether the partition is a single key-clustered base (rows
    sorted by the upsert key — what ``compact(sort=True)`` leaves
    behind), plus lake-level totals. Reads ONLY the manifest and
    parquet FOOTERS — no data pages are decoded at any lake size, so
    this is safe to run from a driver against a 100 TB lake.

    The sortedness probe compares each row group's first-key-column
    min/max chain (ascending => clustered); it is exact for what the
    pruning path (merge_bucket_files filter_expr) feeds on."""
    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs

    def _pf(path: str) -> pq.ParquetFile:
        if filesystem is None:
            return pq.ParquetFile(path)
        return pq.ParquetFile(filesystem.open_input_file(path))

    state = manifest.load()
    parts = {}
    totals = {"rows": 0, "files": 0, "bytes": 0, "row_groups": 0}
    for pid, entry in sorted(state["partitions"].items()):
        names = entry.get("files") or [f"part-{pid}.parquet"]
        paths = [manifest.file_path(n) for n in names]
        nbytes = sum(fs_file_size(filesystem, p) for p in paths)
        row_groups = 0
        physical_rows = 0
        clustered = None
        for p in paths:
            md = _pf(p).metadata
            row_groups += md.num_row_groups
            physical_rows += md.num_rows
        if len(paths) == 1 and _is_merged_file(paths[0]):
            pf = _pf(paths[0])
            try:
                ri = pf.schema_arrow.names.index(LAKE_KEY[0])
                chain = [
                    (pf.metadata.row_group(g).column(ri).statistics.min,
                     pf.metadata.row_group(g).column(ri).statistics.max)
                    for g in range(pf.metadata.num_row_groups)
                ]
                clustered = all(
                    hi <= lo2 for (_, hi), (lo2, _) in zip(chain, chain[1:])
                )
            except (AttributeError, ValueError):
                clustered = None  # stats absent -> unknown
        parts[pid] = {
            # footer-exact stored rows: includes superseded versions and
            # tombstones still awaiting compaction in the delta layout
            # (== live rows once a partition is a single tombstone-free
            # base). Live counts need a merge — by design not done here.
            "physical_rows": physical_rows,
            "last_commit_rows": entry.get("rows"),
            "files": len(paths),
            "bytes": nbytes,
            "row_groups": row_groups,
            "clustered_base": clustered,
        }
        totals["rows"] += physical_rows
        totals["files"] += len(paths)
        totals["bytes"] += nbytes
        totals["row_groups"] += row_groups
    return {
        "num_buckets": state.get("num_buckets"),
        "partitions": parts,
        "totals": totals,
    }


def vacuum(lake_dir: str, dry_run: bool = False, filesystem=None) -> list[str]:
    """Remove lake data files the manifest no longer references:
    compaction-superseded deltas (a compaction rewrites a partition's
    file list to its single ``base-`` file, orphaning the old per-window
    deltas on disk) and ``_tmp/`` leftovers of crashed runs (the
    exactly-once sink promotes tmp files atomically, so anything still
    under ``_tmp/`` was never committed).

    Returns the removed absolute paths (``dry_run=True`` lists without
    deleting). Reclaims space only — readers never see orphans (every
    read path lists files THROUGH the manifest), so vacuum is safe to
    skip and safe to re-run. Single-writer discipline applies: do not
    vacuum concurrently with a replay into the same lake (an in-flight
    run's promoted-but-uncommitted window files would be collected).
    Note time travel: deltas superseded by compaction are already
    unreachable (``select_files_as_of`` raises for pre-base states), so
    vacuum does not reduce the reachable history."""
    from embulk_input_marketo_ray.state.manifest import PartitionManifest

    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs
    lake_dir = manifest.out_dir
    referenced = {os.path.basename(p) for fs in manifest.committed_file_sets().values() for p in fs}
    removed: list[str] = []
    for name in fs_listdir(filesystem, lake_dir):
        full = os.path.join(lake_dir, name)
        if not fs_isfile(filesystem, full):
            continue
        is_data = name.endswith(".parquet") and (
            name.startswith(("part-", "base-", "delta-"))
        )
        if is_data and name not in referenced:
            removed.append(full)
    tmp_dir = os.path.join(lake_dir, "_tmp")
    if fs_isdir(filesystem, tmp_dir):
        removed.extend(
            os.path.join(tmp_dir, n) for n in fs_listdir(filesystem, tmp_dir)
        )
    if not dry_run:
        for p in removed:
            fs_delete(filesystem, p)
    return removed


def compact(
    lake_dir: str,
    min_files: int = 2,
    dry_run: bool = False,
    sort: bool = False,
    row_group_rows: int = 16384,
    filesystem=None,
) -> list[dict]:
    """Standalone lake maintenance: fold every delta-layout partition's
    base+delta files into ONE fresh base file (tombstones dropped) —
    the explicit counterpart of the inline ``compact_threshold``
    compaction that otherwise only triggers when a replay happens to
    touch an over-threshold bucket. Run it between replays to bound
    merge-on-read fan-in (and then ``vacuum`` to reclaim the superseded
    deltas).

    Scale shape: partitions are independent, so compaction is one wave
    of per-partition Ray tasks (read files -> LWW merge -> write base)
    when a Ray session exists, else a local loop. The driver only
    handles file NAMES and lineage rows, never data. Exactly-once: new
    base files are written via tmp + atomic rename and the manifest is
    committed ONCE after every partition succeeds — a crash beforehand
    leaves the manifest unchanged and the new bases unreferenced
    (reclaimed by ``vacuum``, invisible to readers, which list files
    only through the manifest).

    Retention: the new base carries the partition's LATEST window tag,
    so ``as_of`` reads at-or-after that window are unchanged while
    older snapshots raise (same rule as inline compaction —
    ``select_files_as_of`` refuses to silently serve a wrong snapshot).
    ``changes_between`` with ``since`` older than the compaction
    likewise raises. Compact only what your history consumers no
    longer need.

    ``sort=True`` writes CLUSTERED bases: rows ordered by the upsert
    key with ``row_group_rows``-row groups, so every row group's
    parquet min/max stats cover a disjoint key range — point lookups
    (``lookup_keys``) and key-filtered scans then prune to O(1) row
    groups per probed key via ``merge_bucket_files(filter_expr=...)``
    instead of decoding the bucket. Read results are identical either
    way (LWW output order was never guaranteed); sorting costs one
    in-memory Arrow sort per partition at compaction time — the
    Hudi/Iceberg "sorted clustering" maintenance trade.

    Returns one ``{"pid", "files_merged", "rows"}`` row per compacted
    partition (``dry_run=True`` plans without writing). Single-writer
    discipline: don't run concurrently with a replay into this lake.
    """
    import json as _json

    from embulk_input_marketo_ray.state.manifest import PartitionManifest

    manifest = PartitionManifest(lake_dir, filesystem=filesystem)
    filesystem = manifest.fs
    state = manifest.load()
    work: list[tuple[str, list[str], str]] = []
    for pid, entry in sorted(state["partitions"].items()):
        names = entry.get("files")
        if not names or len(names) < min_files:
            continue  # rewrite layout or already a single base
        tags = [_file_window_tag(manifest.file_path(n)) for n in names]
        if any(t is None for t in tags):
            raise ValueError(
                f"partition {pid}: compact requires the delta lake layout "
                f"(found untagged file in {names})"
            )
        work.append((pid, names, max(tags)))
    if dry_run or not work:
        return [{"pid": pid, "files_merged": len(ns), "rows": None} for pid, ns, _ in work]

    def _compact_one(pid: str, names: list[str], tag: str) -> dict:
        m = PartitionManifest(lake_dir, filesystem=filesystem)
        merged = merge_bucket_files(
            [m.file_path(n) for n in names], drop_tombstones=True,
            filesystem=filesystem,
        )
        if sort:
            merged = merged.sort_by(
                [("repo", "ascending"), ("path", "ascending")]
            )
        base = f"base-{pid}-{tag}.parquet"
        tmp = m.tmp_file_path(base)
        with fs_open_output(filesystem, tmp) as f:
            pq.write_table(
                merged, f, row_group_size=row_group_rows if sort else None
            )
        m.promote_file(base)
        return {
            "pid": pid,
            "base": base,
            "rows": merged.num_rows,
            "fingerprint": _fingerprint(merged),
            "files_merged": len(names),
        }

    import ray as _ray

    if _ray.is_initialized() and len(work) > 1:
        remote = _ray.remote(num_cpus=1)(_compact_one)
        results = _ray.get([remote.remote(pid, ns, tag) for pid, ns, tag in work])
    else:
        results = [_compact_one(pid, ns, tag) for pid, ns, tag in work]

    stats_by_pid = {}
    for r in results:
        entry = dict(state["partitions"][r["pid"]])
        entry.update(
            {"rows": r["rows"], "fingerprint": r["fingerprint"], "files": [r["base"]]}
        )
        stats_by_pid[r["pid"]] = entry
    manifest.commit(stats_by_pid)
    return [
        {"pid": r["pid"], "files_merged": r["files_merged"], "rows": r["rows"]}
        for r in results
    ]
