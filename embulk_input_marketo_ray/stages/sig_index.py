"""Persisted MinHash-LSH signature index with incremental ingest —
the CDC x dedup fusion: near-duplicate detection of each ARRIVING
batch against everything already admitted, without ever rescanning or
re-shuffling the historical corpus.

This extends the reference's incremental-import model (watermark
windows that only ever touch the new slice —
``MarketoUtils.java``/``MarketoInputPluginDelegate.java`` advance a
persisted watermark and fetch only ``[from, to)``) to the LLM-pipeline
dedup family: the persisted state here is an LSH band index + a
signature store instead of a timestamp.

Layout (all state under ``index_dir``):

- ``manifest.json`` — parameters + the COMMITTED ingest list. Readers
  resolve data files through the manifest only, so a crashed ingest's
  partial files are invisible until its manifest commit (the same
  manifest-last visibility rule as ``sinks/exactly_once.py``).
- ``bands/bucket=<b>/<ingest_id>.parquet`` — ``(band, band_hash,
  doc_id)`` rows of ADMITTED docs, bucketed by ``band_hash %
  num_buckets``: an arriving batch prunes its index probe to the
  buckets its own band hashes touch.
- ``sigs/bucket=<b>/<ingest_id>.parquet`` — ``(doc_id, minhash)``
  signatures of admitted docs, bucketed by ``doc_id % num_buckets``:
  the pair verify fetches only the buckets containing candidate ids.
- ``results/<ingest_id>.parquet`` — the per-doc verdicts, making
  re-ingest of a committed ``ingest_id`` a pure replay (idempotent,
  returns the recorded result without recomputation).

Dup semantics (deterministic, replicated by the independent oracle in
``pipelines/oracles.py``):

- candidate pairs: within every ``(band, band_hash)`` run, each NEW
  doc pairs with the MIN admitted (old) id in the run, and each
  non-min NEW doc pairs with the run's min NEW id. Pairing only with
  the run minimum bounds candidates at O(new rows x bands) even on a
  degenerate hot bucket (a width cap, the standard LSH guard).
- verify: a pair is a duplicate iff >= ``agree_slots`` of the
  ``num_perm`` minhash slots agree (the unbiased Jaccard estimator,
  thresholded in integer slot counts so the decision is exact).
- verdict: any verified old target -> ``status='dup'``, ``dup_of`` =
  min verified old id (old matches dominate new ones); else any
  verified new target -> dup of that batch-minimum; else ``admitted``.
  Only admitted docs enter the index, so a dup chain inside one batch
  points at its batch representative, which may itself be a dup of an
  old doc — cluster resolution stays a downstream concern
  (``resolve_dup_clusters``).

Scale shape: the historical corpus never moves — every ingest touches
index bytes proportional to the BATCH's band/sig buckets. The only
driver state is the per-ingest dup id set (bounded by the ingest batch
size, which is the small side by design — a CDC batch, not the lake).
"""

from __future__ import annotations

import contextlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from embulk_input_marketo_ray.stages.dedup import (
    MinHasher,
    explode_lsh_bands,
    sorted_member_mask,
)
from embulk_input_marketo_ray.state.fsio import (
    fs_delete,
    fs_exists,
    fs_file_size,
    fs_isdir,
    fs_isfile,
    fs_listdir,
    fs_mkdirs,
    fs_mtime,
    fs_open_output,
    fs_read_json,
    fs_replace,
    resolve_path,
)

def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def init_index(
    index_dir: str,
    num_bands: int = 16,
    num_perm: int = 64,
    num_buckets: int = 8,
    agree_slots: int = 32,
    filesystem=None,
) -> dict:
    """Create an empty index (idempotent: an existing manifest with the
    same parameters is returned; different parameters raise — the band
    hashes of two parameterizations are not comparable).

    ``filesystem``: optional pyarrow.fs.FileSystem routing ALL index
    state IO (state/fsio.py seam, same contract as the lake); None =
    local POSIX fast path. URI-style index_dir auto-resolves."""
    filesystem, index_dir = _resolve_index_fs(index_dir, filesystem)
    fs_mkdirs(filesystem, index_dir)
    params = {
        "num_bands": num_bands,
        "num_perm": num_perm,
        "num_buckets": num_buckets,
        "agree_slots": agree_slots,
    }
    path = _manifest_path(index_dir)
    if fs_exists(filesystem, path):
        state = fs_read_json(filesystem, path)
        got = {k: state[k] for k in params}
        if got != params:
            raise ValueError(
                f"index at {index_dir} was created with {got}, not {params}; "
                "signatures/band hashes are not comparable across parameters"
            )
        return state
    state = {**params, "ingests": {}}
    _write_manifest(index_dir, state, fs=filesystem)
    return state


def _resolve_index_fs(index_dir: str, filesystem):
    """(fs, path) front door shared by every index entry point."""
    if filesystem is None:
        return resolve_path(index_dir)
    return filesystem, index_dir


def _write_manifest(index_dir: str, state: dict, fs=None) -> None:
    path = _manifest_path(index_dir)
    tmp = path + ".tmp"
    with fs_open_output(fs, tmp) as f:
        f.write(json.dumps(state, indent=1, sort_keys=True).encode())
    fs_replace(fs, tmp, path)


@contextlib.contextmanager
def _manifest_lock(index_dir: str, timeout: float = 30.0, stale_after: float = 60.0, fs=None):
    """Serialize manifest read-modify-write across concurrently
    submitted ingest / compact jobs (scripts/index_ingest.py presents
    them as independent cluster jobs). The commit critical section is
    a millisecond JSON rewrite, so contention is negligible; without
    the lock, two commits interleaving load->mutate->write lose one
    side's entry — an ingest committed during a compact's commit would
    vanish from the manifest and vacuum would later delete its files.

    The lock is an ``O_CREAT|O_EXCL`` file on the index's shared POSIX
    filesystem (atomic there, incl. NFSv3+ — the same requirement the
    manifest's ``os.replace`` commit already imposes). A crashed
    holder's lock goes stale after ``stale_after`` seconds and is
    broken by the next waiter.

    Non-local filesystems (``fs`` set) have no O_EXCL: the lock
    degrades to a no-op and the SINGLE-WRITER-PER-INDEX discipline is
    the contract — the same caveat as the lake manifest on S3-class
    stores (state/fsio.py docstring); a multi-writer deployment there
    needs a conditional-put/lease protocol out of scope here."""
    if fs is not None:
        yield
        return
    path = os.path.join(index_dir, "manifest.lock")
    deadline = time.time() + timeout
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            break
        except FileExistsError:
            try:
                if time.time() - os.path.getmtime(path) > stale_after:
                    with contextlib.suppress(FileNotFoundError):
                        os.unlink(path)
                    continue
            except FileNotFoundError:
                continue
            if time.time() > deadline:
                raise TimeoutError(
                    f"manifest lock {path} held longer than {timeout}s; "
                    "a concurrent ingest/compact commit is stuck or the "
                    "holder crashed within the stale window"
                )
            time.sleep(0.05)
    try:
        yield
    finally:
        os.close(fd)
        with contextlib.suppress(FileNotFoundError):
            os.unlink(path)


def _load_manifest(index_dir: str, fs=None) -> dict:
    return fs_read_json(fs, _manifest_path(index_dir))


def _committed_files(state: dict, index_dir: str, kind: str, buckets) -> list[str]:
    """Data files visible through the manifest, pruned to ``buckets``
    (None = all): the compacted base file per bucket (if any) plus the
    per-ingest files of ingests NOT yet folded into a base. Partial
    files of uncommitted ingests/compactions never appear."""
    want = None if buckets is None else set(int(b) for b in buckets)
    out = []
    for b, fname in state.get("base", {}).get(kind, {}).items():
        if want is None or int(b) in want:
            out.append(os.path.join(index_dir, kind, f"bucket={b}", fname))
    for ingest_id, meta in state["ingests"].items():
        if meta.get("folded"):
            continue
        for b in meta.get(f"{kind}_buckets", []):
            if want is None or int(b) in want:
                out.append(
                    os.path.join(index_dir, kind, f"bucket={b}", f"{ingest_id}.parquet")
                )
    return out


def _atomic_write(table: pa.Table, path: str, fs=None) -> None:
    fs_mkdirs(fs, os.path.dirname(path))
    tmp = path + ".tmp"
    with fs_open_output(fs, tmp) as f:
        pq.write_table(table, f)
    fs_replace(fs, tmp, path)


def _index_read_blocks(files: list[str], fs=None) -> int | None:
    """Explicit block count for index-file reads: Ray's dynamic block
    splitting costs ~0.25 s of sampling per execution — pure overhead
    on the small committed-file sets a probe touches. Above 64 MB keep
    dynamic sizing (the historical-corpus path)."""
    total = sum(fs_file_size(fs, f) for f in files)
    if total >= (64 << 20):
        return None
    return max(4, len(files))


def _next_seq(state: dict) -> int:
    """Monotonic commit sequence shared by ingests and deletes (assigned
    under the manifest lock, so commit order == seq order). It scopes
    tombstone application: a delete at seq D kills only rows written by
    ingests with seq < D, so a doc re-ingested (and re-ADMITTED) after
    its delete stays visible to probes and survives compaction's fold."""
    return int(state.get("next_seq", 0))


# seq assigned to data rows whose per-ingest provenance is gone (compacted
# base files): every tombstone applies to them — a base only ever contains
# rows of ingests committed BEFORE any still-unfolded delete (the fold
# snapshot takes unfolded ingests and unfolded deletes from one manifest
# read, and seq order == commit order)
_BASE_FILE_SEQ = -1
# legacy delete entries (written before seq stamping) keep the old
# kill-everything semantics; legacy ingest entries sort before any
# stamped delete
_LEGACY_DELETE_SEQ = np.iinfo(np.int64).max
_LEGACY_INGEST_SEQ = 0


def _dead_mask(dead_ids: np.ndarray, dead_seqs: np.ndarray, ids: np.ndarray,
               file_seq: int) -> np.ndarray:
    """Boolean mask of ``ids`` killed for rows written at ``file_seq``:
    id is tombstoned AND its latest delete committed after the write."""
    if not len(dead_ids) or not len(ids):
        return np.zeros(len(ids), dtype=bool)
    idx = np.minimum(np.searchsorted(dead_ids, ids), len(dead_ids) - 1)
    return (dead_ids[idx] == ids) & (dead_seqs[idx] > file_seq)


def _committed_files_by_seq(
    state: dict, index_dir: str, kind: str, buckets
) -> list[tuple[int, list[str]]]:
    """Like ``_committed_files`` but grouped by the writing ingest's
    commit seq (base files under ``_BASE_FILE_SEQ``), so readers can
    apply seq-scoped tombstones per group. Group count is bounded by
    the number of unfolded ingests (1 right after a compaction)."""
    want = None if buckets is None else set(int(b) for b in buckets)
    groups: dict[int, list[str]] = {}
    for b, fname in state.get("base", {}).get(kind, {}).items():
        if want is None or int(b) in want:
            groups.setdefault(_BASE_FILE_SEQ, []).append(
                os.path.join(index_dir, kind, f"bucket={b}", fname)
            )
    for ingest_id, meta in state["ingests"].items():
        if meta.get("folded"):
            continue
        seq = int(meta.get("seq", _LEGACY_INGEST_SEQ))
        for b in meta.get(f"{kind}_buckets", []):
            if want is None or int(b) in want:
                groups.setdefault(seq, []).append(
                    os.path.join(index_dir, kind, f"bucket={b}", f"{ingest_id}.parquet")
                )
    return sorted(groups.items())


# tombstones-between-compactions budget: the unfolded delete set rides
# one driver read + one broadcast per ingest, so it must stay the small
# side. 10M int64 ids = 80 MB — generous; past it the remedy is a
# compaction (which folds tombstones into the bases and clears the set)
TOMBSTONE_BROADCAST_LIMIT = 10_000_000


def delete_docs(index_dir: str, doc_ids, delete_id: str, filesystem=None) -> dict:
    """Tombstone-delete admitted docs from the index — the CDC 'op =
    delete' story for the dedup state (GDPR erasure, retractions,
    re-crawls): subsequent ingests no longer match against the deleted
    docs, so an identical re-arrival is ADMITTED again.

    Deletes are TOMBSTONES, not in-place rewrites (the lake's delta
    rule): one ``deletes/<delete_id>.parquet`` id list, committed to
    the manifest LAST, so a crashed delete is invisible and a committed
    ``delete_id`` replays idempotently. Each delete commit records the
    shared seq counter, and tombstones apply ONLY to rows of ingests
    committed before the delete — a re-ingested (re-admitted) id is
    live again immediately and is NOT dropped by a later compaction
    fold (the re-crawl / GDPR-then-reconsent flow). Probes exclude
    tombstoned ids at the index read; ``compact_index`` folds
    tombstones INTO the new bases (dropping only the rows they scope
    to) and marks them folded; ``vacuum_index`` then reclaims the
    folded tombstone files. Historical ingest RESULTS are never
    rewritten — a verdict that pointed at a later-deleted doc is
    history, not state."""
    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    state = _load_manifest(index_dir, fs=fs)
    if delete_id in state.get("deletes", {}):
        return state["deletes"][delete_id]
    path = os.path.join(index_dir, "deletes", f"{delete_id}.parquet")
    _atomic_write(pa.table({"doc_id": pa.array(ids, type=pa.int64())}), path, fs=fs)
    with _manifest_lock(index_dir, fs=fs):
        state = _load_manifest(index_dir, fs=fs)  # re-read: no lost updates
        if delete_id in state.get("deletes", {}):
            return state["deletes"][delete_id]
        seq = _next_seq(state)
        meta = {"n": int(len(ids)), "seq": seq}
        state.setdefault("deletes", {})[delete_id] = meta
        state["next_seq"] = seq + 1
        _write_manifest(index_dir, state, fs=fs)
    return meta


def _tombstone_entries(state: dict, index_dir: str, fs=None) -> tuple[np.ndarray, np.ndarray]:
    """(ids, seqs): sorted unique doc_ids of all committed NOT-yet-folded
    deletes, with each id's LATEST delete seq (folded tombstones are
    already absent from the bases). A row written by an ingest at seq s
    is dead iff its id is here with seq > s — see ``_dead_mask``."""
    parts, seq_parts = [], []
    for delete_id, meta in state.get("deletes", {}).items():
        if meta.get("folded"):
            continue
        p = os.path.join(index_dir, "deletes", f"{delete_id}.parquet")
        ids = np.asarray(
            pq.read_table(p, filesystem=fs).column("doc_id"), dtype=np.int64
        )
        parts.append(ids)
        seq_parts.append(
            np.full(len(ids), int(meta.get("seq", _LEGACY_DELETE_SEQ)), dtype=np.int64)
        )
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ids = np.concatenate(parts)
    seqs = np.concatenate(seq_parts)
    order = np.lexsort((seqs, ids))  # by id, then seq: run-last = max seq
    ids, seqs = ids[order], seqs[order]
    last = np.r_[ids[1:] != ids[:-1], True]
    ids, seqs = ids[last], seqs[last]
    if len(ids) > TOMBSTONE_BROADCAST_LIMIT:
        raise RuntimeError(
            f"{len(ids)} unfolded tombstones exceed the broadcast budget "
            f"({TOMBSTONE_BROADCAST_LIMIT}); run compact_index to fold them "
            "into the bases"
        )
    return ids, seqs


class _SideBands:
    """Stage: tag band rows with probe side + band-hash bucket."""

    def __init__(self, side: int, num_buckets: int) -> None:
        self._side = side
        self._nb = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        bucket = (
            np.asarray(batch.column("band_hash"), dtype=np.uint64)
            % np.uint64(self._nb)
        ).astype(np.int32)
        return pa.table(
            {
                "band": batch.column("band").cast(pa.int32()),
                "band_hash": batch.column("band_hash").cast(pa.uint64()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "side": pa.array(
                    np.full(batch.num_rows, self._side, dtype=np.int32), type=pa.int32()
                ),
                "bucket": pa.array(bucket, type=pa.int32()),
            }
        )


_PAIR_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("other", pa.int64()), ("other_is_old", pa.int32())]
)


def candidate_pairs_block(block: pa.Table) -> pa.Table:
    """Run-slicing pair kernel over a (band, band_hash)-partitioned
    block of tagged band rows: per run, every NEW id pairs with the
    run's min OLD id (if any), and every non-min NEW id pairs with the
    run's min NEW id. One vectorized pass, no per-bucket UDF calls."""
    if block.num_rows == 0:
        return _PAIR_SCHEMA.empty_table()
    order = pc.sort_indices(
        block,
        sort_keys=[
            ("band", "ascending"),
            ("band_hash", "ascending"),
            ("side", "ascending"),  # old (0) before new (1)
            ("doc_id", "ascending"),
        ],
    )
    b = block.take(order)
    band = np.asarray(b.column("band"))
    bh = np.asarray(b.column("band_hash"))
    side = np.asarray(b.column("side"))
    ids = np.asarray(b.column("doc_id"), dtype=np.int64)
    n = len(ids)
    new_run = np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])]
    run_idx = np.cumsum(new_run) - 1
    starts = np.flatnonzero(new_run)
    n_runs = len(starts)

    # per-run min old id: rows sorted old-first + id asc, so the run's
    # first row is the min old id when that row IS old
    first_is_old = side[starts] == 0
    min_old = np.where(first_is_old, ids[starts], -1)

    # per-run min NEW id: first new row of each run
    is_new = side == 1
    # index of first new row per run (n if none)
    first_new = np.full(n_runs, -1, dtype=np.int64)
    new_pos = np.flatnonzero(is_new)
    if len(new_pos):
        # first new position per run via reduceat over sorted positions
        run_of_new = run_idx[new_pos]
        first_mask = np.r_[True, run_of_new[1:] != run_of_new[:-1]]
        first_new[run_of_new[first_mask]] = new_pos[first_mask]

    out_doc, out_other, out_old = [], [], []
    # new-vs-old: every new row in a run with an old min pairs with it
    has_old = min_old[run_idx] >= 0
    sel = is_new & has_old
    if sel.any():
        out_doc.append(ids[sel])
        out_other.append(min_old[run_idx[sel]])
        out_old.append(np.ones(int(sel.sum()), dtype=np.int32))
    # new-vs-new: non-first new rows pair with the run's first new id
    pos = np.arange(n)
    fn = first_new[run_idx]
    sel2 = is_new & (fn >= 0) & (pos > fn)
    if sel2.any():
        out_doc.append(ids[sel2])
        out_other.append(ids[fn[sel2]])
        out_old.append(np.zeros(int(sel2.sum()), dtype=np.int32))
    if not out_doc:
        return _PAIR_SCHEMA.empty_table()
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            "other": pa.array(np.concatenate(out_other), type=pa.int64()),
            "other_is_old": pa.array(np.concatenate(out_old), type=pa.int32()),
        }
    )


def pack_sigs(col, num_perm: int) -> pa.Array:
    """Fixed-size-list minhash -> variable-width binary (one 8*num_perm
    byte blob per row). Exchange rows that DON'T carry a signature ride
    as plain nulls costing zero bytes — a null fixed-size list still
    allocates its full child storage (520 B/row of zeros through every
    exchange), which is why signatures never cross an exchange as
    lists."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    width = 8 * num_perm
    # pa.binary() carries int32 offsets: a block whose packed payload
    # would exceed 2^31 bytes (~4.2M rows at num_perm=64) cannot be
    # represented — np.arange would wrap silently and from_buffers does
    # not validate, so fail loudly (callers pack per exchange block,
    # which Ray's block sizing keeps far below this)
    if (n + 1) * width > np.iinfo(np.int32).max:
        raise ValueError(
            f"pack_sigs block too large for int32 binary offsets: "
            f"{n} rows x {width} B/row; split the block"
        )
    flat = np.asarray(col.flatten(), dtype=np.uint64)
    offsets = np.arange(0, (n + 1) * width, width, dtype=np.int32)
    return pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())],
    )


def unpack_sigs(col, num_perm: int) -> np.ndarray:
    """Binary-packed signatures -> (n, num_perm) uint64 matrix. Rows of
    a fresh (post-take/filter) binary array are back-to-back in the
    data buffer, so this is one zero-copy frombuffer, no per-row
    gather."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    width = 8 * num_perm
    off = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset : col.offset + n + 1
    ]
    if off[-1] - off[0] != n * width or not ((off[1:] - off[:-1]) == width).all():
        raise ValueError("packed signature rows must all be 8*num_perm bytes")
    return np.frombuffer(
        col.buffers()[2], dtype=np.uint64, count=n * num_perm, offset=int(off[0])
    ).reshape(n, num_perm)


def _slots_schema(num_perm: int) -> pa.Schema:
    return pa.schema(
        [
            ("key", pa.int64()),
            ("pair_doc", pa.int64()),
            ("pair_other", pa.int64()),
            ("other_is_old", pa.int32()),
            ("slot", pa.int32()),
            ("minhash", pa.binary()),
        ]
    )


def attach_and_verify_sigs(pairs, sigs, num_perm: int, agree_slots: int):
    """Signature-agreement verification of candidate pairs via the
    tagged-union keyed-exchange shape of ``verify_pairs_jaccard``
    (dedup.py): pair endpoints and signature rows co-partition on the
    doc id (one fixed-size signature copy moves per sparse pair side,
    never a corpus scan), then the signature-carrying slot rows
    co-partition on the PAIR key and a vectorized slot-equality count
    applies the integer ``agree_slots`` threshold. Duplicate candidate
    pairs (same pair from several bands) collapse in the second
    exchange. Returns verified pairs (doc_id, other, other_is_old)."""
    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        _keyed_repartition,
        _shuffle_width,
    )

    _ensure_hash_shuffle()
    union_schema = _slots_schema(num_perm)

    def explode_slots(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "doc_id" not in batch.column_names:
            return union_schema.empty_table()
        a = np.asarray(batch.column("doc_id"), dtype=np.int64)
        b = np.asarray(batch.column("other"), dtype=np.int64)
        old = np.asarray(batch.column("other_is_old"), dtype=np.int32)
        n = len(a)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "pair_doc": pa.array(np.tile(a, 2), type=pa.int64()),
                "pair_other": pa.array(np.tile(b, 2), type=pa.int64()),
                "other_is_old": pa.array(np.tile(old, 2), type=pa.int32()),
                "slot": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int32), n), type=pa.int32()
                ),
                "minhash": pa.nulls(2 * n, type=pa.binary()),
            }
        )

    def sig_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column("doc_id").cast(pa.int64()),
                "pair_doc": pa.nulls(n, type=pa.int64()),
                "pair_other": pa.nulls(n, type=pa.int64()),
                "other_is_old": pa.nulls(n, type=pa.int32()),
                "slot": pa.array(np.full(n, -1, dtype=np.int32), type=pa.int32()),
                "minhash": pack_sigs(batch.column("minhash"), num_perm),
            }
        )

    u = pairs.map_batches(explode_slots, batch_format="pyarrow").union(
        sigs.map_batches(sig_rows, batch_format="pyarrow")
    )
    by_key = _keyed_repartition(u, _shuffle_width(), ["key"])

    slotted_schema = pa.schema(
        [
            ("pair_doc", pa.int64()),
            ("pair_other", pa.int64()),
            ("other_is_old", pa.int32()),
            ("slot", pa.int32()),
            ("minhash", pa.binary()),
        ]
    )

    def fill_sigs(block: pa.Table) -> pa.Table:
        """Per key-partition: copy each key's signature onto every
        pair-slot row that references it (sorted-run gather)."""
        if block.num_rows == 0:
            return slotted_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("key", "ascending"), ("slot", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("key"), dtype=np.int64)
        slot = np.asarray(t.column("slot"), dtype=np.int32)
        # a key's sig row sorts FIRST in its run (slot -1)
        new_run = np.r_[True, key[1:] != key[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        has_sig = slot[starts] == -1
        sel = (slot >= 0) & has_sig[run_idx]
        if not sel.any():
            return slotted_schema.empty_table()
        src = starts[run_idx[sel]]  # the sig row of each selected slot row
        # Arrow-side gather: the pair-slot rows carry NULL minhash, so
        # the copy must come from take() (numpy can't hold the nulls)
        mh = t.column("minhash")
        if isinstance(mh, pa.ChunkedArray):
            mh = mh.combine_chunks()
        return pa.table(
            {
                "pair_doc": t.column("pair_doc").filter(pa.array(sel)),
                "pair_other": t.column("pair_other").filter(pa.array(sel)),
                "other_is_old": t.column("other_is_old").filter(pa.array(sel)),
                "slot": t.column("slot").filter(pa.array(sel)),
                "minhash": mh.take(pa.array(src, type=pa.int64())),
            }
        )

    slotted = by_key.map_batches(
        fill_sigs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    by_pair = _keyed_repartition(
        slotted, _shuffle_width(), ["pair_doc", "pair_other"]
    )

    def judge(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("pair_doc", "ascending"),
                ("pair_other", "ascending"),
                ("slot", "ascending"),
            ],
        )
        t = block.take(order)
        d = np.asarray(t.column("pair_doc"), dtype=np.int64)
        o = np.asarray(t.column("pair_other"), dtype=np.int64)
        slot = np.asarray(t.column("slot"), dtype=np.int32)
        old = np.asarray(t.column("other_is_old"), dtype=np.int32)
        sigs_m = unpack_sigs(t.column("minhash"), num_perm)
        new_run = np.r_[True, (d[1:] != d[:-1]) | (o[1:] != o[:-1])]
        starts = np.flatnonzero(new_run)
        counts = np.diff(np.r_[starts, len(d)])
        # duplicate candidates from several bands produce repeated
        # (slot0, slot1) rows in one run; the first slot-0 and the
        # LAST row (slot 1 sorts after every slot 0) are one of each
        first = starts
        last = starts + counts - 1
        ok = (slot[first] == 0) & (slot[last] == 1) & (counts >= 2)
        agree = (sigs_m[first] == sigs_m[last]).sum(axis=1)
        keep = ok & (agree >= agree_slots)
        if not keep.any():
            return _PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "doc_id": pa.array(d[first][keep], type=pa.int64()),
                "other": pa.array(o[first][keep], type=pa.int64()),
                "other_is_old": pa.array(old[first][keep], type=pa.int32()),
            }
        )

    return by_pair.map_batches(
        judge, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def probe_docs(index_dir: str, docs, filesystem=None) -> pa.Table:
    """READ-ONLY dedup lookup: the verdicts ``ingest`` would produce
    for ``docs`` — duplicate-of-index / duplicate-within-batch /
    admitted — WITHOUT mutating any state (no index append, no result
    file, no manifest commit). The dedup-as-a-service call: 'would
    these docs be duplicates?' before deciding to crawl / pay / store.
    Identical decision rule and scale shape to ``ingest`` (the probe is
    ingest minus its two write steps)."""
    return ingest(
        index_dir, docs, ingest_id="__probe__", _commit=False, filesystem=filesystem
    )


def ingest(index_dir: str, docs, ingest_id: str, _commit: bool = True, filesystem=None):
    """Incrementally ingest ``docs`` (a Dataset with doc_id + text):
    flag each doc as duplicate-of-index / duplicate-within-batch /
    admitted, append admitted docs' bands + signatures to the index,
    and commit the manifest LAST. Returns the verdicts as a pyarrow
    Table ``(doc_id, status, dup_of)``.

    Exactly-once: a committed ``ingest_id`` replays its recorded result
    without recomputation; a crashed ingest's partial files are
    invisible (manifest-resolved reads) and are overwritten
    deterministically on retry. ``_commit=False`` (via ``probe_docs``)
    skips the append + commit steps entirely."""
    import ray
    import ray.data

    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        _keyed_repartition,
        _shuffle_width,
    )

    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    result_path = os.path.join(index_dir, "results", f"{ingest_id}.parquet")
    if ingest_id in state["ingests"]:
        return pq.read_table(result_path, filesystem=fs)

    num_bands = state["num_bands"]
    num_perm = state["num_perm"]
    num_buckets = state["num_buckets"]
    agree_slots = state["agree_slots"]
    _ensure_hash_shuffle()

    # 1. signatures of the arriving batch (materialized: re-used by the
    # band probe, the verify exchange and the index append — the batch
    # is the small side by design, 64 uint64 slots per doc)
    hasher = MinHasher(num_perm=num_perm)
    sigs_new = docs.map_batches(
        hasher, batch_format="pyarrow", batch_size=2048
    ).select_columns(["doc_id", "minhash"]).materialize()

    # 2. band rows of the batch + the PRUNED index probe: only the
    # band-hash buckets the batch touches are read back
    def new_bands(batch: pa.Table) -> pa.Table:
        return explode_lsh_bands(batch, num_bands=num_bands)

    bands_new = sigs_new.map_batches(new_bands, batch_format="pyarrow").map_batches(
        _SideBands(side=1, num_buckets=num_buckets), batch_format="pyarrow"
    )
    bands_new = bands_new.materialize()
    touched = set()
    batch_hashes: set[int] = set()
    for ref in bands_new.to_arrow_refs():
        blk = ray.get(ref)
        if blk.num_rows:
            touched.update(
                int(v) for v in pc.unique(blk.column("bucket")).to_pylist()
            )
            batch_hashes.update(
                int(v) for v in pc.unique(blk.column("band_hash")).to_pylist()
            )
    touched = sorted(touched)
    # the batch's distinct band-hash set is bounded by batch_rows x
    # num_bands (the small side by design): broadcast it so index band
    # rows that cannot collide are dropped AT THE READ, before the
    # exchange — per-ingest shuffle payload stays ∝ candidates even as
    # the index grows
    hash_ref = ray.put(np.array(sorted(batch_hashes), dtype=np.uint64))

    # tombstoned docs are dead to every probe: exclude them at the
    # index read, before the exchange — a deleted doc can then never
    # be a pair target, so its signature is never fetched either
    # (candidate old ids derive from the surviving band rows).
    # Tombstones are SEQ-SCOPED: a delete kills only rows of ingests
    # committed before it, so files are read in per-ingest-seq groups
    # (group count = unfolded ingests, 1 right after a compaction)
    tomb_ids, tomb_seqs = _tombstone_entries(state, index_dir, fs=fs)
    tomb_ref = ray.put((tomb_ids, tomb_seqs)) if len(tomb_ids) else None

    def make_band_pruner(file_seq: int):
        def prune_to_batch_hashes(batch: pa.Table) -> pa.Table:
            want = ray.get(hash_ref)
            h = np.asarray(batch.column("band_hash"), dtype=np.uint64)
            batch = batch.filter(pa.array(sorted_member_mask(want, h)))
            if tomb_ref is not None and batch.num_rows:
                dead_ids, dead_seqs = ray.get(tomb_ref)
                ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
                batch = batch.filter(
                    pa.array(~_dead_mask(dead_ids, dead_seqs, ids, file_seq))
                )
            return batch

        return prune_to_batch_hashes

    old_band_sides = []
    for file_seq, files in _committed_files_by_seq(state, index_dir, "bands", touched):
        # columns= also suppresses hive-partition inference (the
        # bucket=<b> path segment would otherwise be appended as a
        # string column and break the union schema)
        old_band_sides.append(
            ray.data.read_parquet(
                files,
                columns=["band", "band_hash", "doc_id"],
                override_num_blocks=_index_read_blocks(files, fs=fs),
                filesystem=fs,
            )
            .map_batches(make_band_pruner(file_seq), batch_format="pyarrow")
            .map_batches(
                _SideBands(side=0, num_buckets=num_buckets), batch_format="pyarrow"
            )
        )
    if old_band_sides:
        tagged = bands_new.union(*old_band_sides)
    else:
        tagged = bands_new
    by_band = _keyed_repartition(tagged, _shuffle_width(), ["band", "band_hash"])
    pairs = by_band.map_batches(
        candidate_pairs_block,
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    # 3. verify pairs by signature agreement; old sigs fetched only
    # from the doc_id buckets candidate old ids live in. The distinct
    # old-id set (needed for the bucket prune + broadcast prefilter)
    # is folded per block with arrow/numpy — never a per-row Python
    # scan of the pair rows
    pairs = pairs.materialize()
    old_id_chunks = []
    for ref in pairs.to_arrow_refs():
        blk = ray.get(ref)
        if blk.num_rows:
            old_rows = blk.filter(
                pc.equal(blk.column("other_is_old"), pa.scalar(1, pa.int32()))
            )
            if old_rows.num_rows:
                old_id_chunks.append(
                    np.unique(np.asarray(old_rows.column("other"), dtype=np.int64))
                )
    old_ids = (
        np.unique(np.concatenate(old_id_chunks))
        if old_id_chunks
        else np.array([], dtype=np.int64)
    )
    sig_buckets = np.unique(old_ids % num_buckets).tolist()
    sig_sides = [sigs_new]
    # same prefilter shape: only candidate old ids' signatures enter the
    # verify exchange (the id set is ∝ the sparse candidate pairs,
    # driver-known already). Seq-scoped dead filtering matters here too:
    # a re-admitted id has signature rows in BOTH its dead pre-delete
    # file and its live re-ingest file — only the live one may join
    old_ids_ref = ray.put(old_ids)

    def make_sig_pruner(file_seq: int):
        def prune_to_candidates(batch: pa.Table) -> pa.Table:
            want = ray.get(old_ids_ref)
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            batch = batch.filter(pa.array(sorted_member_mask(want, ids)))
            if tomb_ref is not None and batch.num_rows:
                dead_ids, dead_seqs = ray.get(tomb_ref)
                ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
                batch = batch.filter(
                    pa.array(~_dead_mask(dead_ids, dead_seqs, ids, file_seq))
                )
            return batch

        return prune_to_candidates

    for file_seq, files in _committed_files_by_seq(state, index_dir, "sigs", sig_buckets):
        sig_sides.append(
            ray.data.read_parquet(
                files,
                columns=["doc_id", "minhash"],
                override_num_blocks=_index_read_blocks(files, fs=fs),
                filesystem=fs,
            ).map_batches(make_sig_pruner(file_seq), batch_format="pyarrow")
        )
    sigs_all = sig_sides[0] if len(sig_sides) == 1 else sig_sides[0].union(*sig_sides[1:])
    verified = attach_and_verify_sigs(pairs, sigs_all, num_perm, agree_slots)

    # 4. verdicts. The per-doc (min old target, min new target) fold
    # happens INSIDE the verify execution: a per-block arrow group-min
    # appended to the judge's map chain shrinks every block to <= 2
    # tiny rows per doc BEFORE anything reaches the driver (no extra
    # exchange — a keyed verdict repartition was measured at +10 s per
    # 10k-doc wave in pure hash-shuffle fixed cost). The driver then
    # merges the partial mins and builds the result table with
    # vectorized numpy only — no per-row Python at any batch size.
    _IMAX = np.iinfo(np.int64).max
    _PARTIAL_SCHEMA = pa.schema(
        [("doc_id", pa.int64()), ("other_is_old", pa.int32()), ("min_other", pa.int64())]
    )

    def partial_min_fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        g = block.group_by(["doc_id", "other_is_old"]).aggregate([("other", "min")])
        return pa.table(
            {
                "doc_id": g.column("doc_id"),
                "other_is_old": g.column("other_is_old"),
                "min_other": g.column("other_min"),
            }
        )

    # STREAMING collection (iter_batches, whole blocks): to_arrow_refs
    # takes the bulk-materialize path, which was measured ~2x slower
    # than streaming consumption for this chained-exchange pipeline
    partial_parts = [
        t
        for t in verified.map_batches(
            partial_min_fold,
            batch_size=None,  # whole-block: fuses with judge, keeps
            batch_format="pyarrow",  # the 64-way task parallelism
            zero_copy_batch=True,
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if t.num_rows
    ]
    if partial_parts:
        pt = pa.concat_tables(partial_parts)
        p_ids = np.asarray(pt.column("doc_id"), dtype=np.int64)
        p_flag = np.asarray(pt.column("other_is_old"), dtype=np.int32)
        p_min = np.asarray(pt.column("min_other"), dtype=np.int64)
    else:
        p_ids = np.empty(0, dtype=np.int64)
        p_flag = np.empty(0, dtype=np.int32)
        p_min = np.empty(0, dtype=np.int64)

    # all batch ids (sigs_new is materialized; arrow-refs concat only)
    id_parts = [
        t
        for t in ray.get(sigs_new.select_columns(["doc_id"]).to_arrow_refs())
        if t.num_rows
    ]
    all_ids = np.sort(
        np.concatenate(
            [np.asarray(t.column("doc_id"), dtype=np.int64) for t in id_parts]
        )
        if id_parts
        else np.empty(0, dtype=np.int64)
    )
    # uid contract (same as the lake's T6 dedup-identity rule): a batch
    # carrying one doc_id twice has no well-defined verdict — the min
    # merge below would mark only the first occurrence, and the index
    # append would either double the doc's rows or drop both — so
    # refuse loudly instead of guessing
    if len(all_ids) and (all_ids[1:] == all_ids[:-1]).any():
        dupes = np.unique(all_ids[1:][all_ids[1:] == all_ids[:-1]])[:5]
        raise ValueError(
            f"ingest batch contains duplicated doc_id(s) {dupes.tolist()}; "
            "deduplicate by doc_id upstream (one row per uid per ingest)"
        )

    def _final_min(flag_val: int) -> np.ndarray:
        """min target per doc in all_ids order (IMAX = none), merged
        from the per-block partials with one sort + reduceat."""
        out = np.full(len(all_ids), _IMAX, dtype=np.int64)
        sel = p_flag == flag_val
        if not sel.any():
            return out
        ids, mins = p_ids[sel], p_min[sel]
        order = np.argsort(ids, kind="stable")
        ids, mins = ids[order], mins[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        run_min = np.minimum.reduceat(mins, starts)
        pos = np.searchsorted(all_ids, ids[starts])
        out[pos] = run_min  # pair doc_ids are batch ids by construction
        return out

    best_old = _final_min(1)
    best_new = _final_min(0)
    is_dup = (best_old < _IMAX) | (best_new < _IMAX)
    dup_of = np.where(best_old < _IMAX, best_old, best_new)
    result = pa.table(
        {
            "doc_id": pa.array(all_ids, type=pa.int64()),
            "status": pc.if_else(
                pa.array(is_dup), pa.scalar("dup"), pa.scalar("admitted")
            ),
            "dup_of": pa.array(dup_of, type=pa.int64(), mask=~is_dup),
        }
    )
    n_docs = result.num_rows
    dup_id_arr = all_ids[is_dup]
    if not _commit:  # probe_docs: verdicts only, nothing written
        return result

    # 5. append admitted docs' bands + sigs, one file per bucket;
    # the dup id set is bounded by the ingest batch (broadcast is the
    # small side — a CDC batch, never the lake)
    dup_ref = ray.put(dup_id_arr)  # already sorted (all_ids order)

    def admitted_only(batch: pa.Table) -> pa.Table:
        dup_arr = ray.get(dup_ref)
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(~sorted_member_mask(dup_arr, ids)))

    # both index appends ride ONE tagged-union exchange keyed on
    # (kind, bucket) — band rows and signature rows co-partition, each
    # block writes its (kind, bucket) files, and the ingest spends one
    # dataset execution on the append instead of two. Signatures cross
    # the exchange PACKED as variable binary (zero bytes on band rows,
    # see pack_sigs) and are unpacked back to the on-disk
    # fixed-size-list schema at the writer.
    def band_rows_u(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "kind": pa.array(np.zeros(n, dtype=np.int32), type=pa.int32()),
                "bucket": batch.column("bucket"),
                "band": batch.column("band"),
                "band_hash": batch.column("band_hash"),
                "doc_id": batch.column("doc_id"),
                "minhash": pa.nulls(n, type=pa.binary()),
            }
        )

    def sig_rows_u(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        bucket = (
            np.asarray(batch.column("doc_id"), dtype=np.int64) % num_buckets
        ).astype(np.int32)
        return pa.table(
            {
                "kind": pa.array(np.ones(n, dtype=np.int32), type=pa.int32()),
                "bucket": pa.array(bucket, type=pa.int32()),
                "band": pa.nulls(n, type=pa.int32()),
                "band_hash": pa.nulls(n, type=pa.uint64()),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "minhash": pack_sigs(batch.column("minhash"), num_perm),
            }
        )

    append_union = (
        bands_new.map_batches(admitted_only, batch_format="pyarrow")
        .select_columns(["band", "band_hash", "doc_id", "bucket"])
        .map_batches(band_rows_u, batch_format="pyarrow")
        .union(
            sigs_new.map_batches(admitted_only, batch_format="pyarrow").map_batches(
                sig_rows_u, batch_format="pyarrow"
            )
        )
    )

    def write_bucket_files(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "kind": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.int32()),
                }
            )
        out_kind, out_bucket = [], []
        for kind_code, kind, cols in (
            (0, "bands", ["band", "band_hash", "doc_id"]),
            (1, "sigs", ["doc_id", "minhash"]),
        ):
            side = block.filter(
                pc.equal(block.column("kind"), pa.scalar(kind_code, pa.int32()))
            )
            if side.num_rows == 0:
                continue
            buckets = np.unique(np.asarray(side.column("bucket"), dtype=np.int32))
            for bkt in buckets:
                part = side.filter(
                    pc.equal(side.column("bucket"), pa.scalar(int(bkt), pa.int32()))
                ).select(cols)
                if kind_code == 1:
                    mat = unpack_sigs(part.column("minhash"), num_perm)
                    part = part.set_column(
                        part.schema.get_field_index("minhash"),
                        "minhash",
                        pa.FixedSizeListArray.from_arrays(
                            pa.array(mat.reshape(-1), type=pa.uint64()), num_perm
                        ),
                    )
                _atomic_write(
                    part,
                    os.path.join(
                        index_dir, kind, f"bucket={int(bkt)}", f"{ingest_id}.parquet"
                    ),
                    fs=fs,
                )
                out_kind.append(kind_code)
                out_bucket.append(int(bkt))
        return pa.table(
            {
                "kind": pa.array(out_kind, type=pa.int32()),
                "bucket": pa.array(out_bucket, type=pa.int32()),
            }
        )

    written = (
        _keyed_repartition(append_union, _shuffle_width(), ["kind", "bucket"])
        .map_batches(
            write_bucket_files,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    written_band_buckets = sorted({r["bucket"] for r in written if r["kind"] == 0})
    written_sig_buckets = sorted({r["bucket"] for r in written if r["kind"] == 1})

    # 6. record the result, then commit the manifest LAST (under the
    # commit lock: a concurrent compact's read-modify-write must not
    # interleave with ours, or one side's entry is lost)
    _atomic_write(result, result_path, fs=fs)
    with _manifest_lock(index_dir, fs=fs):
        state = _load_manifest(index_dir, fs=fs)  # re-read: no lost updates
        seq = _next_seq(state)
        state["ingests"][ingest_id] = {
            "bands_buckets": written_band_buckets,
            "sigs_buckets": written_sig_buckets,
            "n_docs": int(n_docs),
            "n_admitted": int(n_docs - len(dup_id_arr)),
            "seq": seq,
        }
        state["next_seq"] = seq + 1
        _write_manifest(index_dir, state, fs=fs)
    return result


# ---------------------------------------------------------------------------
# index maintenance: compaction + vacuum (the lake's story, same rules)
# ---------------------------------------------------------------------------


def compact_index(index_dir: str, filesystem=None) -> list[str]:
    """Fold every bucket's per-ingest files into ONE base file per
    (kind, bucket) — the read-amplification fix once many small
    ingests have accumulated (a probe otherwise opens one file per
    committed ingest per touched bucket).

    One Ray task per (kind, bucket): reads that bucket's committed
    files, writes ``base-<gen>.parquet`` atomically. The manifest
    commit happens LAST and atomically flips resolution to the new
    bases (ingest entries keep their results for replay but their
    bucket lists are marked folded); a crash mid-compaction leaves the
    manifest untouched and only orphans new base files, which
    ``vacuum_index`` reclaims. Returns the new base file paths."""
    import ray

    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    gen = int(state.get("base_gen", 0)) + 1
    # tombstone snapshot: these deletes' ids are dropped from the new
    # bases, so ONLY these delete entries flip to folded at commit (the
    # same snapshot rule as folded_ids below — a delete committed after
    # this snapshot keeps its tombstone file live for probes)
    folded_delete_ids = {
        d for d, meta in state.get("deletes", {}).items() if not meta.get("folded")
    }
    dead_ref = ray.put(_tombstone_entries(state, index_dir, fs=fs))

    @ray.remote
    def _fold(kind: str, bucket: int, files: list[tuple[str, int]]) -> str:
        # files carry the writing ingest's commit seq: a tombstone drops
        # only rows written BEFORE it, so an id re-admitted after its
        # delete keeps its rows in the new base (the ADVICE re-ingest fix)
        dead_ids, dead_seqs = ray.get(dead_ref)
        parts = []
        for f, file_seq in files:
            t = pq.read_table(f, filesystem=fs)
            if len(dead_ids) and t.num_rows:
                ids = np.asarray(t.column("doc_id"), dtype=np.int64)
                t = t.filter(pa.array(~_dead_mask(dead_ids, dead_seqs, ids, file_seq)))
            parts.append(t)
        merged = pa.concat_tables(parts).combine_chunks()
        path = os.path.join(index_dir, kind, f"bucket={bucket}", f"base-{gen}.parquet")
        _atomic_write(merged, path, fs=fs)
        return path

    tasks = []
    new_base: dict[str, dict[str, str]] = {"bands": {}, "sigs": {}}
    # the fold snapshot: ONLY these ingests' files go into the new
    # bases, so ONLY they flip to folded at commit — an ingest that
    # commits between this snapshot and the manifest commit keeps its
    # per-ingest files referenced (marking it folded would silently
    # drop its rows from probes and let vacuum delete its files)
    folded_ids = {
        ingest_id
        for ingest_id, meta in state["ingests"].items()
        if not meta.get("folded")
    }
    for kind in ("bands", "sigs"):
        by_bucket: dict[int, list[tuple[str, int]]] = {}
        # current resolution: existing base (if any) + unfolded ingests
        base = state.get("base", {}).get(kind, {})
        for b, fname in base.items():
            by_bucket.setdefault(int(b), []).append(
                (os.path.join(index_dir, kind, f"bucket={b}", fname), _BASE_FILE_SEQ)
            )
        for ingest_id, meta in state["ingests"].items():
            if ingest_id not in folded_ids:
                continue
            seq = int(meta.get("seq", _LEGACY_INGEST_SEQ))
            for b in meta.get(f"{kind}_buckets", []):
                by_bucket.setdefault(int(b), []).append(
                    (
                        os.path.join(
                            index_dir, kind, f"bucket={b}", f"{ingest_id}.parquet"
                        ),
                        seq,
                    )
                )
        for bucket, files in sorted(by_bucket.items()):
            tasks.append((kind, bucket, _fold.remote(kind, bucket, files)))

    out_paths = []
    for kind, bucket, ref in tasks:
        path = ray.get(ref)
        new_base[kind][str(bucket)] = os.path.basename(path)
        out_paths.append(path)

    # commit: under the lock, re-read so concurrent ingest commits are
    # not clobbered (an unlocked re-read still loses an ingest that
    # commits between it and the write), and mark folded ONLY the
    # snapshot's ingests
    with _manifest_lock(index_dir, fs=fs):
        state = _load_manifest(index_dir, fs=fs)
        state["base"] = new_base
        state["base_gen"] = gen
        for ingest_id in folded_ids:
            if ingest_id in state["ingests"]:
                state["ingests"][ingest_id]["folded"] = True
        for delete_id in folded_delete_ids:
            if delete_id in state.get("deletes", {}):
                state["deletes"][delete_id]["folded"] = True
        _write_manifest(index_dir, state, fs=fs)
    return out_paths


def vacuum_index(index_dir: str, grace_seconds: float = 900.0, filesystem=None) -> list[str]:
    """Remove every data file the manifest does not reference:
    superseded per-ingest files after a compaction, orphaned bases
    from a crashed compaction, and ``.tmp`` leftovers. Never touches
    the manifest or results. Returns the removed paths.

    Safe concurrently with READS (readers resolve files only through
    the committed manifest). An in-flight INGEST's already-written but
    not-yet-committed bucket files are also unreferenced, so vacuum
    skips any file modified within ``grace_seconds`` (default 15 min,
    far above an ingest's write-to-commit gap); pass 0 only when no
    ingest can be running."""
    import time

    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    referenced = set(_committed_files(state, index_dir, "bands", None))
    referenced.update(_committed_files(state, index_dir, "sigs", None))
    # unfolded tombstone files are live probe state; folded ones were
    # baked into the bases by the compaction and are reclaimable
    for delete_id, meta in state.get("deletes", {}).items():
        if not meta.get("folded"):
            referenced.add(
                os.path.join(index_dir, "deletes", f"{delete_id}.parquet")
            )
    now = time.time()
    removed = []
    for kind in ("bands", "sigs", "deletes"):
        root = os.path.join(index_dir, kind)
        if not fs_isdir(fs, root):
            continue
        for bucket_dir in fs_listdir(fs, root):
            d = os.path.join(root, bucket_dir)
            # deletes/ is flat (no bucket subdirs); bands/sigs nest
            files = (
                [(d, None)] if fs_isfile(fs, d) else [(d, f) for f in fs_listdir(fs, d)]
            )
            for base, fname in files:
                path = base if fname is None else os.path.join(base, fname)
                if path in referenced:
                    continue
                try:
                    if now - fs_mtime(fs, path) < grace_seconds:
                        continue  # possibly an in-flight ingest's file
                except OSError:
                    continue
                fs_delete(fs, path)
                removed.append(path)
    return removed
