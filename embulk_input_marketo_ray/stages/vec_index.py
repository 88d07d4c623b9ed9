"""Persisted IVF (inverted-file) vector index with incremental ingest
— the embedding-side sibling of ``stages/sig_index.py``: approximate
nearest-neighbor search over a corpus that grows batch by batch,
without retraining or rescanning what is already indexed.

Same state discipline as the signature index and the lake
(``sinks/exactly_once.py``): all reads resolve through
``manifest.json``, data files commit before the manifest does, a
crashed ingest's partial files are invisible and are rewritten
deterministically on retry, and a committed ``ingest_id`` replays its
recorded summary without recomputation.

Layout (all under ``index_dir``):

- ``manifest.json`` — parameters, ``trained`` flag, committed ingests
  with their touched cluster lists.
- ``centroids.parquet`` — the coarse quantizer, trained ONCE on the
  ``train_rows`` SMALLEST vec_ids of the first ingest (deterministic
  under any Ray block ordering; standard IVF practice is a bounded
  sample, constant cost wrt corpus size).
  Later ingests assign against the frozen quantizer: centroids never
  move, so earlier cluster files stay valid (drift is a rebuild, not
  an incremental op — documented, like FAISS's add-after-train).
- ``vectors/cluster=<c>/<ingest_id>.parquet`` — ``(vec_id, embedding,
  cluster)`` rows. The cluster id is materialized in-file so the query
  path knows each row's list without re-deriving it.

Query path: probe the ``n_probe`` closest centroid lists per query,
read ONLY those clusters' committed files, and score exactly — the
cluster files already carry the embeddings, so unlike the in-memory
ANN pipelines there is NO attach exchange at all: one streaming pass
over ~n_probe/n_centroids of the corpus, per-block partial top-k, and
a tiny driver merge (queries x k rows).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from embulk_input_marketo_ray.stages.sig_index import (
    _BASE_FILE_SEQ,
    _index_read_blocks,
    _LEGACY_DELETE_SEQ,
    _LEGACY_INGEST_SEQ,
    _dead_mask,
    _manifest_lock,
    _next_seq,
    _resolve_index_fs,
)
from embulk_input_marketo_ray.state.fsio import (
    fs_delete,
    fs_exists,
    fs_isdir,
    fs_isfile,
    fs_listdir,
    fs_mkdirs,
    fs_mtime,
    fs_open_output,
    fs_read_json,
    fs_replace,
)
from embulk_input_marketo_ray.stages.similarity import (
    kmeans_centroids,
    list_column_matrix,
)


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest.json")


def _write_manifest(index_dir: str, state: dict, fs=None) -> None:
    path = _manifest_path(index_dir)
    tmp = path + ".tmp"
    with fs_open_output(fs, tmp) as f:
        f.write(json.dumps(state, indent=1, sort_keys=True).encode())
    fs_replace(fs, tmp, path)


def _load_manifest(index_dir: str, fs=None) -> dict:
    return fs_read_json(fs, _manifest_path(index_dir))


def _atomic_write(table: pa.Table, path: str, fs=None) -> None:
    fs_mkdirs(fs, os.path.dirname(path))
    tmp = path + ".tmp"
    with fs_open_output(fs, tmp) as f:
        pq.write_table(table, f)
    fs_replace(fs, tmp, path)


def init_vec_index(
    index_dir: str, n_centroids: int = 32, seed: int = 7, train_rows: int = 4096,
    filesystem=None,
) -> dict:
    """Create an empty index (idempotent; parameter mismatch raises —
    cluster assignments are not comparable across quantizers).
    ``filesystem``: optional pyarrow.fs routing (state/fsio.py seam)."""
    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    fs_mkdirs(fs, index_dir)
    params = {"n_centroids": n_centroids, "seed": seed, "train_rows": train_rows}
    path = _manifest_path(index_dir)
    if fs_exists(fs, path):
        state = fs_read_json(fs, path)
        got = {k: state[k] for k in params}
        if got != params:
            raise ValueError(
                f"vector index at {index_dir} was created with {got}, not "
                f"{params}; cluster assignments are not comparable"
            )
        return state
    state = {**params, "trained": False, "ingests": {}}
    _write_manifest(index_dir, state, fs=fs)
    return state


def _centroids_path(index_dir: str) -> str:
    return os.path.join(index_dir, "centroids.parquet")


def _load_centroids(index_dir: str, fs=None) -> np.ndarray:
    t = pq.read_table(_centroids_path(index_dir), filesystem=fs)
    return list_column_matrix(t.column("centroid"))


def delete_vectors(index_dir: str, vec_ids, delete_id: str, filesystem=None) -> dict:
    """Tombstone-delete indexed vectors — the embedding-side sibling of
    ``sig_index.delete_docs`` (erasure / retraction of indexed items):
    one ``deletes/<delete_id>.parquet`` id list committed to the
    manifest LAST (crash-invisible, idempotent replay). Deletes are
    SEQ-SCOPED like the signature index's: the recorded commit seq
    limits the tombstone to rows of ingests committed before it, so a
    vec_id re-ingested after its delete is scored again and survives
    compaction. Queries exclude tombstoned ids at scoring;
    ``compact_vec_index`` folds tombstones into the new bases and marks
    them folded; ``vacuum_vec_index`` reclaims folded tombstone files."""
    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    ids = np.unique(np.asarray(list(vec_ids), dtype=np.int64))
    state = _load_manifest(index_dir, fs=fs)
    if delete_id in state.get("deletes", {}):
        return state["deletes"][delete_id]
    path = os.path.join(index_dir, "deletes", f"{delete_id}.parquet")
    _atomic_write(pa.table({"vec_id": pa.array(ids, type=pa.int64())}), path, fs=fs)
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


# same budget rationale as sig_index.TOMBSTONE_BROADCAST_LIMIT
VEC_TOMBSTONE_BROADCAST_LIMIT = 10_000_000


def _vec_tombstone_entries(state: dict, index_dir: str, fs=None) -> tuple[np.ndarray, np.ndarray]:
    """(ids, seqs): sorted unique vec_ids of committed not-yet-folded
    deletes with each id's LATEST delete seq (see sig_index's
    ``_tombstone_entries`` / ``_dead_mask`` for the scoping rule)."""
    parts, seq_parts = [], []
    for delete_id, meta in state.get("deletes", {}).items():
        if meta.get("folded"):
            continue
        p = os.path.join(index_dir, "deletes", f"{delete_id}.parquet")
        ids = np.asarray(
            pq.read_table(p, filesystem=fs).column("vec_id"), dtype=np.int64
        )
        parts.append(ids)
        seq_parts.append(
            np.full(len(ids), int(meta.get("seq", _LEGACY_DELETE_SEQ)), dtype=np.int64)
        )
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    ids = np.concatenate(parts)
    seqs = np.concatenate(seq_parts)
    order = np.lexsort((seqs, ids))
    ids, seqs = ids[order], seqs[order]
    last = np.r_[ids[1:] != ids[:-1], True]
    ids, seqs = ids[last], seqs[last]
    if len(ids) > VEC_TOMBSTONE_BROADCAST_LIMIT:
        raise RuntimeError(
            f"{len(ids)} unfolded tombstones exceed the broadcast budget "
            f"({VEC_TOMBSTONE_BROADCAST_LIMIT}); run compact_vec_index to "
            "fold them into the bases"
        )
    return ids, seqs


def _committed_files(state: dict, index_dir: str, clusters) -> list[str]:
    """Vector files visible through the manifest: the compacted base
    per cluster (if any) plus per-ingest files of unfolded ingests."""
    return [f for _, fs in _committed_files_by_seq(state, index_dir, clusters) for f in fs]


def _committed_files_by_seq(
    state: dict, index_dir: str, clusters
) -> list[tuple[int, list[str]]]:
    """Committed vector files grouped by the writing ingest's commit
    seq (base files under ``_BASE_FILE_SEQ``), for seq-scoped tombstone
    application at the read."""
    want = None if clusters is None else set(int(c) for c in clusters)
    groups: dict[int, list[str]] = {}
    for c, fname in state.get("base", {}).items():
        if want is None or int(c) in want:
            groups.setdefault(_BASE_FILE_SEQ, []).append(
                os.path.join(index_dir, "vectors", f"cluster={c}", fname)
            )
    for ingest_id, meta in state["ingests"].items():
        if meta.get("folded"):
            continue
        seq = int(meta.get("seq", _LEGACY_INGEST_SEQ))
        for c in meta.get("clusters", []):
            if want is None or int(c) in want:
                groups.setdefault(seq, []).append(
                    os.path.join(
                        index_dir, "vectors", f"cluster={c}", f"{ingest_id}.parquet"
                    )
                )
    return sorted(groups.items())


def ingest_vectors(index_dir: str, vecs, ingest_id: str, filesystem=None) -> dict:
    """Add a batch of ``(vec_id, embedding)`` rows: train the quantizer
    if this is the first ingest (first ``train_rows`` rows, dataset
    order), assign every vector distributedly against the frozen
    centroids, append one file per touched cluster, commit the
    manifest LAST. Returns ``{"n": ..., "clusters": [...]}``; a
    committed ``ingest_id`` replays its recorded summary."""
    import ray

    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        _keyed_repartition,
        _shuffle_width,
    )

    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    if ingest_id in state["ingests"]:
        return dict(state["ingests"][ingest_id])

    _ensure_hash_shuffle()
    if not state["trained"]:
        # training sample = the train_rows SMALLEST vec_ids of this
        # first batch — deterministic regardless of Ray block order
        # (a dataset-order `limit` is not: block completion order can
        # reorder or truncate the sample). Per-block partial top-N
        # keeps the driver payload at train_rows x dim.
        tr = int(state["train_rows"])

        def first_rows(batch: pa.Table) -> pa.Table:
            if batch.num_rows <= tr:
                return batch
            idx = pc.sort_indices(batch, sort_keys=[("vec_id", "ascending")])
            return batch.take(idx.slice(0, tr))

        # streaming collection: to_arrow_refs takes the bulk-materialize
        # execution path, measured ~2x slower than streaming on chained
        # pipelines (see sig_index partial-fold note)
        parts = [
            p
            for p in vecs.map_batches(first_rows, batch_format="pyarrow").iter_batches(
                batch_size=None, batch_format="pyarrow"
            )
            if p.num_rows
        ]
        sample = pa.concat_tables(parts).combine_chunks()
        idx = pc.sort_indices(sample, sort_keys=[("vec_id", "ascending")])
        sample = sample.take(idx.slice(0, tr))
        x = list_column_matrix(sample.column("embedding"))
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        c = kmeans_centroids(x, state["n_centroids"], seed=state["seed"])
        flat = pa.array(c.reshape(-1), type=pa.float64())
        _atomic_write(
            pa.table(
                {"centroid": pa.FixedSizeListArray.from_arrays(flat, c.shape[1])}
            ),
            _centroids_path(index_dir),
            fs=fs,
        )
        # trained flips in the SAME commit as this ingest (below); a
        # crash here leaves a deterministic centroid file to overwrite
    centroids = _load_centroids(index_dir, fs=fs)

    def assign(batch: pa.Table) -> pa.Table:
        x = list_column_matrix(batch.column("embedding"))
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        cid = np.argmax(x @ centroids.T, axis=1).astype(np.int32)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "embedding": batch.column("embedding"),
                "cluster": pa.array(cid, type=pa.int32()),
            }
        )

    assigned = vecs.map_batches(assign, batch_format="pyarrow")

    def write_cluster_file(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"cluster": pa.array([], type=pa.int32()), "n": pa.array([], type=pa.int64())})
        clusters = np.unique(np.asarray(block.column("cluster"), dtype=np.int32))
        ns = []
        for c in clusters:
            part = block.filter(
                pc.equal(block.column("cluster"), pa.scalar(int(c), pa.int32()))
            )
            _atomic_write(
                part,
                os.path.join(
                    index_dir, "vectors", f"cluster={int(c)}", f"{ingest_id}.parquet"
                ),
                fs=fs,
            )
            ns.append(part.num_rows)
        return pa.table(
            {
                "cluster": pa.array(clusters, type=pa.int32()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    written = (
        _keyed_repartition(assigned, _shuffle_width(), ["cluster"])
        .map_batches(
            write_cluster_file,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    clusters = sorted({int(r["cluster"]) for r in written})
    n = int(sum(r["n"] for r in written))

    # commit under the shared lock (see sig_index._manifest_lock): a
    # concurrent compact's read-modify-write must not interleave here
    with _manifest_lock(index_dir, fs=fs):
        state = _load_manifest(index_dir, fs=fs)
        state["trained"] = True
        seq = _next_seq(state)
        state["ingests"][ingest_id] = {"clusters": clusters, "n": n, "seq": seq}
        state["next_seq"] = seq + 1
        _write_manifest(index_dir, state, fs=fs)
    return dict(state["ingests"][ingest_id])


def ann_topk_index(
    index_dir: str, queries: pa.Table, k: int = 5, n_probe: int = 8, filesystem=None
) -> pa.Table:
    """Exact top-k within the probed inverted lists: per query, the
    ``n_probe`` centroids closest to it (stable argsort, oracle-equal
    tie order); reads only those clusters' committed files; per-block
    cosine scoring + per-block partial top-k; driver merges the tiny
    (queries x k x blocks) partials. Returns
    ``(query_id, neighbor_id, rank)``."""
    import ray
    import ray.data

    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    if not state["trained"]:
        raise ValueError(f"vector index at {index_dir} has no committed ingest")
    centroids = _load_centroids(index_dir, fs=fs)
    qm = list_column_matrix(queries.column("embedding"))
    qm = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    qids = np.asarray(queries.column("vec_id"), dtype=np.int64)
    probe = np.argsort(-(qm @ centroids.T), axis=1, kind="stable")[:, :n_probe]

    probed_clusters = sorted({int(c) for row in probe for c in row})
    probes_by_cluster: dict[int, list[int]] = {}
    for qi, row in enumerate(probe):
        for cid in row:
            probes_by_cluster.setdefault(int(cid), []).append(qi)
    file_groups = _committed_files_by_seq(state, index_dir, probed_clusters)
    empty = pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "neighbor_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
        }
    )
    if not file_groups:
        return empty
    qref = ray.put((qids, qm, probes_by_cluster))
    tomb_ids, tomb_seqs = _vec_tombstone_entries(state, index_dir, fs=fs)
    tomb_ref = ray.put((tomb_ids, tomb_seqs)) if len(tomb_ids) else None

    def make_score_block(file_seq: int):
        def score_block(batch: pa.Table) -> pa.Table:
            return _score_block(batch, file_seq)

        return score_block

    def _score_block(batch: pa.Table, file_seq: int) -> pa.Table:
        out_schema = pa.schema(
            [
                ("query_id", pa.int64()),
                ("neighbor_id", pa.int64()),
                ("cos", pa.float64()),
            ]
        )
        if tomb_ref is not None and batch.num_rows:
            dead_ids, dead_seqs = ray.get(tomb_ref)
            bids = np.asarray(batch.column("vec_id"), dtype=np.int64)
            batch = batch.filter(
                pa.array(~_dead_mask(dead_ids, dead_seqs, bids, file_seq))
            )
        if batch.num_rows == 0:
            return out_schema.empty_table()
        q_ids, q_mat, probing = ray.get(qref)
        x = list_column_matrix(batch.column("embedding"))
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
        cl = np.asarray(batch.column("cluster"), dtype=np.int32)
        parts = []
        for c in np.unique(cl):
            qs = probing.get(int(c))
            if not qs:
                continue
            rows = cl == c
            sub_x, sub_ids = x[rows], ids[rows]
            cos = sub_x @ q_mat[qs].T  # (n_rows, n_probing)
            m = len(sub_ids)
            part = pa.table(
                {
                    "query_id": pa.array(
                        np.repeat(q_ids[qs], m), type=pa.int64()
                    ),
                    "neighbor_id": pa.array(np.tile(sub_ids, len(qs)), type=pa.int64()),
                    "cos": pa.array(cos.T.reshape(-1), type=pa.float64()),
                }
            )
            # per-block partial top-k per query keeps the driver merge
            # at (queries x k x blocks) rows
            idx = pc.sort_indices(
                part,
                sort_keys=[
                    ("query_id", "ascending"),
                    ("cos", "descending"),
                    ("neighbor_id", "ascending"),
                ],
            )
            t = part.take(idx)
            qcol = np.asarray(t.column("query_id"), dtype=np.int64)
            starts = np.flatnonzero(np.r_[True, qcol[1:] != qcol[:-1]])
            base = np.repeat(starts, np.diff(np.r_[starts, len(qcol)]))
            keep = (np.arange(len(qcol)) - base) < k
            parts.append(t.filter(pa.array(keep)))
        if not parts:
            return out_schema.empty_table()
        return pa.concat_tables(parts)

    sides = [
        ray.data.read_parquet(
            files,
            columns=["vec_id", "embedding", "cluster"],
            override_num_blocks=_index_read_blocks(files, fs=fs),
            filesystem=fs,
        ).map_batches(make_score_block(file_seq), batch_format="pyarrow")
        for file_seq, files in file_groups
    ]
    ds = sides[0] if len(sides) == 1 else sides[0].union(*sides[1:])
    rows = ds.take_all()
    if not rows:
        return empty
    merged = pa.Table.from_pylist(rows)
    idx = pc.sort_indices(
        merged,
        sort_keys=[
            ("query_id", "ascending"),
            ("cos", "descending"),
            ("neighbor_id", "ascending"),
        ],
    )
    t = merged.take(idx)
    qcol = np.asarray(t.column("query_id"), dtype=np.int64)
    starts = np.flatnonzero(np.r_[True, qcol[1:] != qcol[:-1]])
    base = np.repeat(starts, np.diff(np.r_[starts, len(qcol)]))
    rank = np.arange(len(qcol), dtype=np.int64) - base + 1
    keep = rank <= k
    return pa.table(
        {
            "query_id": t.column("query_id").filter(pa.array(keep)),
            "neighbor_id": t.column("neighbor_id").filter(pa.array(keep)),
            "rank": pa.array(rank[keep], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# index maintenance (same rules as sig_index / the lake)
# ---------------------------------------------------------------------------


def compact_vec_index(index_dir: str, filesystem=None) -> list[str]:
    """Fold each cluster's per-ingest files into one ``base-<gen>``
    file (a probe otherwise opens one file per ingest per probed
    cluster). One Ray task per cluster; manifest commit LAST; a crash
    orphans only new bases (vacuumable). Returns new base paths."""
    import ray

    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    gen = int(state.get("base_gen", 0)) + 1
    # tombstone snapshot (same rule as the ingest fold snapshot below):
    # these ids drop out of the new bases, so ONLY these delete entries
    # flip to folded at commit
    folded_delete_ids = {
        d for d, meta in state.get("deletes", {}).items() if not meta.get("folded")
    }
    dead_ref = ray.put(_vec_tombstone_entries(state, index_dir, fs=fs))

    @ray.remote
    def _fold(cluster: int, files: list[tuple[str, int]]) -> str:
        # seq-scoped: a tombstone drops only rows written before it, so
        # a re-ingested-after-delete vec_id keeps its rows in the base
        dead_ids, dead_seqs = ray.get(dead_ref)
        parts = []
        for f, file_seq in files:
            t = pq.read_table(f, filesystem=fs)
            if len(dead_ids) and t.num_rows:
                ids = np.asarray(t.column("vec_id"), dtype=np.int64)
                t = t.filter(pa.array(~_dead_mask(dead_ids, dead_seqs, ids, file_seq)))
            parts.append(t)
        merged = pa.concat_tables(parts).combine_chunks()
        path = os.path.join(
            index_dir, "vectors", f"cluster={cluster}", f"base-{gen}.parquet"
        )
        _atomic_write(merged, path, fs=fs)
        return path

    by_cluster: dict[int, list[tuple[str, int]]] = {}
    base = state.get("base", {})
    for c, fname in base.items():
        by_cluster.setdefault(int(c), []).append(
            (os.path.join(index_dir, "vectors", f"cluster={c}", fname), _BASE_FILE_SEQ)
        )
    # the fold snapshot: only these ingests are marked folded at
    # commit — an ingest that commits between snapshot and commit
    # keeps its per-ingest files referenced (its rows were NOT folded
    # into the new bases)
    folded_ids = {
        ingest_id
        for ingest_id, meta in state["ingests"].items()
        if not meta.get("folded")
    }
    for ingest_id, meta in state["ingests"].items():
        if ingest_id not in folded_ids:
            continue
        seq = int(meta.get("seq", _LEGACY_INGEST_SEQ))
        for c in meta.get("clusters", []):
            by_cluster.setdefault(int(c), []).append(
                (
                    os.path.join(
                        index_dir, "vectors", f"cluster={c}", f"{ingest_id}.parquet"
                    ),
                    seq,
                )
            )
    refs = [(c, _fold.remote(c, files)) for c, files in sorted(by_cluster.items())]
    new_base: dict[str, str] = {}
    out = []
    for c, ref in refs:
        path = ray.get(ref)
        new_base[str(c)] = os.path.basename(path)
        out.append(path)

    # commit under the lock: an ingest committing between the re-read
    # and the write would otherwise vanish from the manifest (and
    # vacuum would later delete its committed files)
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
    return out


def vacuum_vec_index(index_dir: str, grace_seconds: float = 900.0, filesystem=None) -> list[str]:
    """Remove every vector file the manifest does not reference
    (superseded per-ingest files, orphaned bases, .tmp leftovers).

    Safe concurrently with READS (manifest-resolved). An in-flight
    ingest's written-but-uncommitted cluster files are also
    unreferenced, so files modified within ``grace_seconds`` are
    skipped (default 15 min); pass 0 only when no ingest can be
    running."""
    import time

    fs, index_dir = _resolve_index_fs(index_dir, filesystem)
    state = _load_manifest(index_dir, fs=fs)
    referenced = set(_committed_files(state, index_dir, None))
    # unfolded tombstone files are live query state; folded ones were
    # baked into the bases and are reclaimable
    for delete_id, meta in state.get("deletes", {}).items():
        if not meta.get("folded"):
            referenced.add(os.path.join(index_dir, "deletes", f"{delete_id}.parquet"))
    now = time.time()
    removed = []
    for root, nested in (
        (os.path.join(index_dir, "vectors"), True),
        (os.path.join(index_dir, "deletes"), False),
    ):
        if not fs_isdir(fs, root):
            continue
        for entry in fs_listdir(fs, root):
            d = os.path.join(root, entry)
            files = [os.path.join(d, f) for f in fs_listdir(fs, d)] if nested else [d]
            for path in files:
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
