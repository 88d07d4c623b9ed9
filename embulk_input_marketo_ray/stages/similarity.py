"""Similarity search over embedding columns: LSH-bucketed ANN and
embedding-cosine near-duplicate detection.

The brute-force cosine top-k baseline lives in
``pipelines/queries.q_ann_topk`` (numpy matmul per batch against a
``ray.put``-broadcast query matrix). These are the SCALE paths:

- **Random-hyperplane LSH ANN**: sign(X @ H) -> bucket key; queries and
  candidates that share a bucket are compared exactly. One groupby-shaped
  shuffle over bucket keys instead of an all-pairs matmul: at 10^10
  rows the all-pairs scan is infeasible, bucketed compare is
  O(rows x bucket_hit_rate). Recall depends on n_planes/n_tables
  (documented trade-off, standard LSH result).
- **Embedding near-dup**: same bucketing; bucket members are candidate
  pairs; pairs with exact cosine >= threshold survive. Partitioning
  assumption: near-identical vectors collide in at least one table
  with probability 1-(1-p^b)^T.

Shuffle-payload design (the 100 TB shape): the bucket explosion carries
ONLY ``(vec_id, lsh_table, lsh_bucket)`` — the embedding vectors are
NOT replicated into the n_tables exploded copies (that would move
n_tables x the dataset through the shuffle). Bucket groups emit
candidate ID PAIRS; the exact-cosine verification then attaches each
side's vector via a hash-partitioned join against the embeddings table,
so vectors move once per (sparse) candidate-pair side.

The (seeded) hyperplane matrix is broadcast via closure capture — it is
tiny (dim x n_planes floats).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data


def list_column_matrix(col) -> np.ndarray:
    """(n, dim) float64 matrix from a list<float> column, zero-copy
    flatten of the Arrow values buffer — ``np.stack(col.to_pylist())``
    boxes every element through Python and was the hot-path cost of
    the ANN stages. Assumes uniform list lengths (embeddings)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        values = col.values
    else:
        offsets = np.asarray(col.offsets)
        widths = np.diff(offsets)
        if len(widths) and (widths != widths[0]).any():
            raise ValueError("ragged list column; expected uniform embedding dim")
        dim = int(widths[0]) if len(widths) else 0
        values = col.values
        if offsets[0] != 0:  # sliced array: honor the offset window
            values = values.slice(int(offsets[0]), int(offsets[-1] - offsets[0]))
    return np.asarray(values).astype(np.float64, copy=False).reshape(len(col), dim)


def _embedding_matrix(batch: pa.Table, column: str = "embedding") -> np.ndarray:
    emb = list_column_matrix(batch.column(column))
    norms = np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-30)
    return emb / norms


def read_query_vectors(embeddings_path: str, n_queries: int) -> pa.Table:
    """Query rows (``vec_id < n_queries``) via a PUSHED-DOWN parquet
    predicate: ``filters=`` prunes row groups whose vec_id statistics
    exclude the range and row-filters the survivors inside the reader,
    so the driver cost is O(n_queries + one row group) — never the
    whole embeddings column (the round-2 scale-killer: a full
    ``pq.read_table`` then in-memory filter materialized the entire
    corpus on the driver just to keep 3 rows)."""
    return pq.read_table(
        embeddings_path,
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n_queries)],
    )


def _hyperplanes(dim: int, n_planes: int, table_idx: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed + 1000 * table_idx)
    return rng.standard_normal((dim, n_planes))


def _bucket_keys(x: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (x @ planes) > 0
    weights = (1 << np.arange(planes.shape[1], dtype=np.int64))
    return bits @ weights


class LshBucketer:
    """Actor-pool stage: explode each vector to its (table, bucket)
    keys — ids only, no embedding replication through the shuffle."""

    def __init__(self, dim: int, n_planes: int = 12, n_tables: int = 4, seed: int = 7):
        self.planes = [_hyperplanes(dim, n_planes, t, seed) for t in range(n_tables)]
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch)
        ids = np.asarray(batch.column("vec_id"))
        keys = np.stack([_bucket_keys(x, p) for p in self.planes], axis=1)  # (n, T)
        tables = np.broadcast_to(np.arange(self.n_tables, dtype=np.int32), keys.shape)
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, self.n_tables), type=pa.int64()),
                "lsh_table": pa.array(tables.reshape(-1), type=pa.int32()),
                "lsh_bucket": pa.array(keys.reshape(-1), type=pa.int64()),
            }
        )


def _explode_keys(
    embeddings_path: str, n_planes: int, n_tables: int
) -> tuple["ray.data.Dataset", "ray.data.Dataset", int]:
    """(key dataset, embeddings dataset, dim) for the bucketed paths."""
    # dim from the FIRST row only (never the whole column on the driver)
    first = next(pq.ParquetFile(embeddings_path).iter_batches(batch_size=1))
    dim = len(first.column("embedding")[0])
    from embulk_input_marketo_ray.pipelines.queries import _clean_schema

    # explicit metadata-free schema: testdata parquet carries pandas
    # schema metadata that makes pa.Schema unhashable inside Ray's
    # schema dedup — strip it at the source
    cols = ["vec_id", "embedding"]
    ds = ray.data.read_parquet(
        embeddings_path, columns=cols, schema=_clean_schema(embeddings_path, cols)
    )
    # task-based stage (closure over the tiny plane matrices), not an
    # actor pool: this pipeline already runs keyed shuffles + a join +
    # downstream stages concurrently, and every actor-pool minimum is a
    # CPU permanently reserved for the whole streaming plan — on small
    # nodes that starves the join aggregators into a deadlock
    bucketer = LshBucketer(dim=dim, n_planes=n_planes, n_tables=n_tables)

    def explode(batch: pa.Table) -> pa.Table:
        return bucketer(batch)

    keys = ds.map_batches(explode, batch_format="pyarrow")
    return keys, ds, dim


def _unpack_embeddings(col, n_rows: int) -> np.ndarray:
    """uniform-width embedding blobs (all rows valid; fixed-size-binary
    or large_binary) -> (n, dim) float64 view."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_binary(col.type):
        width = col.type.byte_width // 8
        a = np.frombuffer(col.buffers()[1], dtype=np.float64)
        start = col.offset * width
        return a[start : start + n_rows * width].reshape(n_rows, width)
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + n_rows + 1
    ]
    a = np.frombuffer(col.buffers()[2], dtype=np.float64)
    return a[offsets[0] // 8 : offsets[-1] // 8].reshape(n_rows, -1)


def _valid_f64_matrix(col, dim: int) -> np.ndarray:
    """(n_valid, dim) float64 view of a large_binary column whose VALID
    rows are all dim*8 bytes. Null rows contribute ZERO value bytes
    (the reason this stage ships large_binary, not fixed-size-binary:
    an all-null fixed-size slot still occupies dim*8 bytes, which at
    scale shipped that many zero-bytes per candidate-pair row through
    the widest shuffle). Valid payloads are contiguous and in row
    order in the values buffer, so the matrix rows align with the
    valid-row subsequence of the column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = np.frombuffer(col.buffers()[1], dtype=np.int64)[
        col.offset : col.offset + len(col) + 1
    ]
    vals = np.frombuffer(col.buffers()[2], dtype=np.float64)
    return vals[offsets[0] // 8 : offsets[-1] // 8].reshape(-1, dim)


def _binary_blob(x: np.ndarray) -> pa.LargeBinaryArray:
    """(n, dim) float64 matrix -> all-valid large_binary column of
    dim*8-byte rows. Zero-copy: pa.py_buffer wraps the ndarray's own
    buffer (keeping it alive), so no n*dim*8 tobytes() duplicate."""
    n, dim = x.shape
    off = np.arange(n + 1, dtype=np.int64) * (dim * 8)
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(off), pa.py_buffer(np.ascontiguousarray(x))],
    )


def _sorted_runs(
    block: pa.Table, keys: list[str]
) -> tuple[pa.Table, np.ndarray, np.ndarray]:
    """Sort a block by integer key columns and locate the key runs
    vectorized: (sorted block, run starts, run ends). The whole-block
    alternative to per-group UDF dispatch — LSH buckets average a
    handful of rows, so a 16-partition exchange holds hundreds of
    thousands of groups per block and per-group Python calls dominate
    the stage (measured 36 s of 49 s at 120k vectors)."""
    block = block.sort_by([(k, "ascending") for k in keys])
    n = block.num_rows
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for k in keys:
        col = block.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        c = np.asarray(col)
        change[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(change)
    return block, starts, np.r_[starts[1:], n]


def _int64_col(block: pa.Table, name: str) -> np.ndarray:
    col = block.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return np.asarray(col, dtype=np.int64)


def _attach_embeddings(
    pairs: "ray.data.Dataset",
    embeddings: "ray.data.Dataset",
    key: str,
    out_column: str,
    dim: int,
    pair_schema: pa.Schema,
    num_partitions: int = 16,
    dedup_pairs: list[str] | None = None,
) -> "ray.data.Dataset":
    """Hash-partitioned join attaching the normalized embedding for
    ``pairs[key]`` as ``out_column`` (a fixed-size-binary blob).

    ``dedup_pairs``: int64 id columns forming a pair identity to
    dedup IN-BLOCK after the exchange. Candidate pairs surfacing from
    several LSH tables are identical rows; since the exchange routes
    by hash(``key``) and ``key`` is part of the identity, duplicates
    always colocate — folding the dedup here saves the whole
    ``keep_one_per_key`` keyed exchange the callers used to pay.

    Implemented as ONE keyed exchange over a tagged union of the pair
    rows and the embedding rows (the ``verify_pairs_jaccard`` pattern,
    dedup.py): each key-partition block holds every embedding plus every
    pair-slot that needs it; a vectorized searchsorted lookup attaches
    the blob in-block. vs ``Dataset.join`` this saves the per-join
    aggregator actor pool (~2-4 s spin-up each) and needs no
    schema-less-empty-block laundering (which forced an executing
    barrier before each join); shuffle payload is identical — one
    vector copy per corpus row + the sparse pair rows.
    ``pair_schema`` lists the columns carried through (nulls on
    embedding rows); ``pairs`` blocks may be schema-less empties."""
    blob_t = pa.large_binary()
    union_fields = (
        [("__key", pa.int64())]
        + [(f.name, f.type) for f in pair_schema]
        + [(out_column, blob_t)]
    )
    union_schema = pa.schema(union_fields)
    out_schema = pa.schema(
        [(f.name, f.type) for f in pair_schema] + [(out_column, blob_t)]
    )

    def pair_rows(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or key not in batch.column_names:
            return union_schema.empty_table()
        n = batch.num_rows
        arrays = [batch.column(key).cast(pa.int64())]
        arrays += [batch.column(f.name) for f in pair_schema]
        arrays += [pa.nulls(n, type=blob_t)]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    def emb_rows(batch: pa.Table) -> pa.Table:
        # acero rejected nested payloads; the blob form is kept because
        # it is also the cheapest thing to move and to row-index
        x = _embedding_matrix(batch)
        blob = _binary_blob(x)
        n = batch.num_rows
        arrays = [batch.column("vec_id").cast(pa.int64())]
        arrays += [pa.nulls(n, type=f.type) for f in pair_schema]
        arrays += [blob]
        return pa.Table.from_arrays(arrays, schema=union_schema)

    from embulk_input_marketo_ray.pipelines.queries import _keyed_repartition

    u = pairs.map_batches(pair_rows, batch_format="pyarrow").union(
        embeddings.map_batches(emb_rows, batch_format="pyarrow")
    )
    shuffled = _keyed_repartition(u, num_partitions, ["__key"])

    def attach(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        blob = block.column(out_column)
        if isinstance(blob, pa.ChunkedArray):
            blob = blob.combine_chunks()
        doc_mask = np.asarray(pc.is_valid(blob))
        pair_mask = ~doc_mask
        if not doc_mask.any() or not pair_mask.any():
            return out_schema.empty_table()
        keys = np.asarray(block.column("__key"), dtype=np.int64)
        dm = _valid_f64_matrix(blob, dim)  # rows = doc rows, in order
        dk = keys[doc_mask]
        order = np.argsort(dk)
        dk, dm = dk[order], np.take(dm, order, axis=0)
        pk = keys[pair_mask]
        pos = np.clip(np.searchsorted(dk, pk), 0, len(dk) - 1)
        matched = dk[pos] == pk  # inner-join semantics
        sel = np.zeros(block.num_rows, dtype=bool)
        sel[np.flatnonzero(pair_mask)[matched]] = True
        sub = block.filter(pa.array(sel))
        # np.take on the float64 view: a uint8-matrix fancy-index of the
        # same bytes measured 25x slower (per-byte inner loop)
        out_vals = np.take(dm, pos[matched], axis=0)
        if dedup_pairs and sub.num_rows:
            arrs = [
                np.asarray(
                    sub.column(c).combine_chunks()
                    if isinstance(sub.column(c), pa.ChunkedArray)
                    else sub.column(c),
                    dtype=np.int64,
                )
                for c in dedup_pairs
            ]
            order = np.lexsort(arrs[::-1])
            stacked = np.stack([a[order] for a in arrs])
            first = np.r_[True, (stacked[:, 1:] != stacked[:, :-1]).any(axis=0)]
            keep_idx = np.sort(order[first])
            sub = sub.take(pa.array(keep_idx))
            out_vals = np.take(out_vals, keep_idx, axis=0)
        out_blob = _binary_blob(out_vals)
        return pa.Table.from_arrays(
            [sub.column(f.name) for f in pair_schema] + [out_blob], schema=out_schema
        )

    return shuffled.map_batches(
        attach, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def ann_lsh_topk(
    embeddings_path: str,
    n_queries: int = 3,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 16,
) -> "ray.data.Dataset":
    # Defaults tuned for low-similarity corpora (true neighbors at
    # cosine ~0.35): p_collide/plane = 1 - acos(c)/pi ~ 0.62, so
    # 4 planes x 16 tables -> table recall ~0.15, overall ~0.93.
    # High-similarity corpora should RAISE n_planes (smaller buckets).
    """Approximate top-k: queries meet candidates only inside shared
    LSH buckets (ids only through the shuffle); exact cosine against a
    broadcast query matrix after the candidate join; per-query global
    top-k."""
    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        _keyed_repartition,
    )

    _ensure_hash_shuffle()
    keys, embeddings, dim = _explode_keys(embeddings_path, n_planes, n_tables)

    def block_candidates(block: pa.Table) -> pa.Table:
        """All (query_id, neighbor_id) pairs within each (table, bucket)
        run of the block, fully vectorized (each query meets every id in
        its bucket, itself included — semantics of the per-group form)."""
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        block, starts, ends = _sorted_runs(block, ["lsh_table", "lsh_bucket"])
        ids = _int64_col(block, "vec_id")
        qpos = np.flatnonzero(ids < n_queries)
        if not len(qpos):
            return empty
        sizes = ends - starts
        run_of_q = np.searchsorted(starts, qpos, side="right") - 1
        counts = sizes[run_of_q]
        total = int(counts.sum())
        out_starts = np.cumsum(counts) - counts
        jj = (
            np.arange(total)
            - np.repeat(out_starts, counts)
            + np.repeat(starts[run_of_q], counts)
        )
        return pa.table(
            {
                "query_id": pa.array(np.repeat(ids[qpos], counts), type=pa.int64()),
                "neighbor_id": pa.array(ids[jj], type=pa.int64()),
            }
        )

    cand = _keyed_repartition(keys, 16, ["lsh_table", "lsh_bucket"]).map_batches(
        block_candidates, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    # same (query, neighbor) may collide in several tables; the dedup
    # folds into the attach exchange (dedup_pairs) instead of paying a
    # keep_one_per_key exchange of its own
    return _exact_topk(
        cand,
        embeddings,
        embeddings_path,
        n_queries,
        k,
        dedup_pairs=["neighbor_id", "query_id"],
    )


def _exact_topk(
    cand: "ray.data.Dataset",
    embeddings: "ray.data.Dataset",
    embeddings_path: str,
    n_queries: int,
    k: int,
    dedup_pairs: list[str] | None = None,
) -> "ray.data.Dataset":
    """Shared tail of the bucketed ANN paths (LSH and IVF): candidate
    (query_id, neighbor_id) pairs -> exact cosine against a broadcast
    query matrix -> per-query global top-k."""
    from embulk_input_marketo_ray.pipelines.queries import grouped_map

    # broadcast the (tiny) normalized query matrix once, rows sorted by
    # query id so the per-batch row lookup is a vectorized searchsorted
    qt = read_query_vectors(embeddings_path, n_queries)
    qm = list_column_matrix(qt.column("embedding"))
    qm /= np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-30)
    qids = np.asarray(qt.column("vec_id"), dtype=np.int64)
    order = np.argsort(qids)
    qref = ray.put((qids[order], qm[order]))

    scored = _attach_embeddings(
        cand,
        embeddings,
        key="neighbor_id",
        out_column="nemb",
        dim=qm.shape[1],
        pair_schema=pa.schema([("query_id", pa.int64()), ("neighbor_id", pa.int64())]),
        dedup_pairs=dedup_pairs,
    )

    def score(batch: pa.Table) -> pa.Table:
        # task-based (no pool minimum); the broadcast query matrix is
        # fetched zero-copy from the object store per task
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        qids_sorted, qm = ray.get(qref)
        emb = _unpack_embeddings(batch.column("nemb"), batch.num_rows)
        q_rows = np.searchsorted(qids_sorted, np.asarray(batch.column("query_id"), dtype=np.int64))
        cos = np.einsum("ij,ij->i", emb, qm[q_rows])
        return pa.table(
            {
                "query_id": batch.column("query_id"),
                "neighbor_id": batch.column("neighbor_id"),
                "cos": pa.array(cos, type=pa.float64()),
            }
        )

    pairs = scored.map_batches(score, batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        # numpy argsort kernel (the repo's kernel idiom — no pandas in
        # the hot path): dedup neighbors (duplicate candidate pairs
        # from several buckets carry identical cos — same vectors),
        # then top-k by (cos desc, neighbor_id asc)
        qid = np.asarray(group.column("query_id"), dtype=np.int64)
        nid = np.asarray(group.column("neighbor_id"), dtype=np.int64)
        cos = np.asarray(group.column("cos"), dtype=np.float64)
        uniq_nid, first_idx = np.unique(nid, return_index=True)
        c = cos[first_idx]
        order = np.lexsort((uniq_nid, -c))[:k]
        return pa.table(
            {
                "query_id": pa.array(qid[first_idx][order], type=pa.int64()),
                "neighbor_id": pa.array(uniq_nid[order], type=pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    return grouped_map(pairs, ["query_id"], topk, num_partitions=max(n_queries, 1))


def kmeans_centroids(
    x: np.ndarray, n_centroids: int, seed: int = 7, n_iter: int = 10
) -> np.ndarray:
    """Spherical k-means (cosine metric) on a BOUNDED training sample:
    seeded kmeans++ init + Lloyd iterations, centroids re-normalized
    every round. Pure seeded numpy on the driver — deterministic, so
    the single-process oracle retrains bit-identically."""
    n = len(x)
    k = min(n_centroids, n)
    rng = np.random.default_rng(seed)
    centroids = [x[int(rng.integers(n))]]
    for _ in range(k - 1):
        d = np.min(np.stack([1.0 - x @ c for c in centroids]), axis=0)
        d = np.maximum(d, 0)
        p = d / d.sum() if d.sum() > 0 else np.full(n, 1.0 / n)
        centroids.append(x[int(rng.choice(n, p=p))])
    c = np.stack(centroids)
    for _ in range(n_iter):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(k):
            members = assign == j
            if members.any():
                v = x[members].sum(axis=0)
                c[j] = v / max(np.linalg.norm(v), 1e-30)
    return c


def ann_ivf_topk(
    embeddings_path: str,
    n_queries: int = 3,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 8,
    train_rows: int = 4096,
    seed: int = 7,
) -> "ray.data.Dataset":
    """IVF (inverted-file) ANN — the second scale path next to LSH.

    Train a coarse quantizer on a bounded sample (driver-side, constant
    cost wrt corpus size — standard IVF practice), assign every vector
    to its nearest centroid with a distributed task map (ids only
    through the shuffle, ONE row per vector — no n_tables amplification
    like LSH), then compare each query exactly against the vectors in
    its ``n_probe`` closest centroid lists.

    Partitioning assumption: one centroid's list must fit a shuffle
    partition — size ``n_centroids`` ~ sqrt(corpus) at scale (the
    defaults scan ~n_probe/n_centroids of the corpus per query;
    measured recall 0.87 at 25% scanned on the testdata embeddings).
    """
    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        grouped_map,
    )

    _ensure_hash_shuffle()

    # --- train on the first train_rows rows (file order, so the oracle
    # reproduces the exact sample) ---
    pf = pq.ParquetFile(embeddings_path)
    got, need = [], train_rows
    for rb in pf.iter_batches(batch_size=min(train_rows, 4096), columns=["embedding"]):
        got.append(pa.Table.from_batches([rb]))
        need -= rb.num_rows
        if need <= 0:
            break
    sample = pa.concat_tables(got).slice(0, train_rows)
    xs = _embedding_matrix(sample)
    centroids = kmeans_centroids(xs, n_centroids, seed=seed)

    # --- per-query probe lists (tiny, driver-side like the LSH query
    # matrix, read via a pushed-down vec_id predicate); stable argsort
    # so ties break identically in the oracle ---
    qt = read_query_vectors(embeddings_path, n_queries)
    qm = _embedding_matrix(qt)
    probe = np.argsort(-(qm @ centroids.T), axis=1, kind="stable")[:, :n_probe]
    qids_arr = np.asarray(qt.column("vec_id"))
    probes_by_centroid: dict[int, list[int]] = {}
    for qi, row in enumerate(probe):
        for cid in row:
            probes_by_centroid.setdefault(int(cid), []).append(int(qids_arr[qi]))

    # --- distributed assign (task map; centroid matrix via closure) ---
    from embulk_input_marketo_ray.pipelines.queries import _clean_schema

    cols = ["vec_id", "embedding"]
    ds = ray.data.read_parquet(
        embeddings_path, columns=cols, schema=_clean_schema(embeddings_path, cols)
    )

    def assign(batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch)
        cid = np.argmax(x @ centroids.T, axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "centroid_id": pa.array(cid.astype(np.int32), type=pa.int32()),
            }
        )

    keys = ds.map_batches(assign, batch_format="pyarrow")

    def list_candidates(group: pa.Table) -> pa.Table:
        """One centroid's inverted list -> (query_id, neighbor_id) pairs
        for every query probing this centroid. Pairs are unique by
        construction (each vector lives in exactly one list)."""
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        cid = int(group.column("centroid_id")[0].as_py())
        probing = probes_by_centroid.get(cid)
        if not probing:
            return empty
        ids = np.asarray(group.column("vec_id"))
        return pa.table(
            {
                "query_id": pa.array(
                    np.repeat(np.asarray(probing, dtype=np.int64), len(ids))
                ),
                "neighbor_id": pa.array(np.tile(ids, len(probing)), type=pa.int64()),
            }
        )

    cand = grouped_map(keys, ["centroid_id"], list_candidates)
    return _exact_topk(cand, ds, embeddings_path, n_queries, k)


def embedding_near_dup_pairs(
    embeddings_path: str,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 6,
) -> "ray.data.Dataset":
    """Embedding-cosine near-duplicate pairs (vec_id, dup_of, cos)."""
    from embulk_input_marketo_ray.pipelines.queries import (
        _ensure_hash_shuffle,
        _keyed_repartition,
    )

    _ensure_hash_shuffle()
    keys, embeddings, dim = _explode_keys(embeddings_path, n_planes, n_tables)

    def block_id_pairs(block: pa.Table) -> pa.Table:
        """All unordered id pairs within each (table, bucket) run of the
        block, fully vectorized (variable-size triu via the counts
        trick: element at local index L pairs with the L rows before it
        in its run). vec_id is the larger id, dup_of the smaller — same
        orientation the per-group np.triu form produced."""
        empty = pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        block, starts, ends = _sorted_runs(block, ["lsh_table", "lsh_bucket"])
        ids = _int64_col(block, "vec_id")
        n = block.num_rows
        sizes = ends - starts
        loc = np.arange(n) - np.repeat(starts, sizes)  # local index in run
        total = int(loc.sum())
        if total == 0:
            return empty
        out_starts = np.cumsum(loc) - loc
        g = np.arange(n)
        jj = np.repeat(g, loc)
        ii = np.arange(total) - np.repeat(out_starts, loc) + np.repeat(g - loc, loc)
        a, b = ids[ii], ids[jj]
        return pa.table(
            {
                "vec_id": pa.array(np.maximum(a, b), type=pa.int64()),
                "dup_of": pa.array(np.minimum(a, b), type=pa.int64()),
            }
        )

    cand = _keyed_repartition(keys, 16, ["lsh_table", "lsh_bucket"]).map_batches(
        block_id_pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    # same pair can surface from several tables; dedup folds into the
    # first attach exchange (hash(vec_id) colocates identical pairs)
    pair_schema = pa.schema([("vec_id", pa.int64()), ("dup_of", pa.int64())])
    j = _attach_embeddings(cand, embeddings, key="vec_id", out_column="emb_a",
                           dim=dim, pair_schema=pair_schema,
                           dedup_pairs=["vec_id", "dup_of"])
    j = _attach_embeddings(
        j,
        embeddings,
        key="dup_of",
        out_column="emb_b",
        dim=dim,
        pair_schema=pair_schema.append(pa.field("emb_a", pa.large_binary())),
    )

    def verify(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        a = _unpack_embeddings(batch.column("emb_a"), batch.num_rows)
        b = _unpack_embeddings(batch.column("emb_b"), batch.num_rows)
        cos = np.einsum("ij,ij->i", a, b)
        out = pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "dup_of": batch.column("dup_of"),
            }
        )
        return out.filter(pa.array(cos >= threshold))

    return j.map_batches(verify, batch_format="pyarrow")
