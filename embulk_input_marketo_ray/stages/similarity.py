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
    """fixed-size-binary embedding blobs -> (n, dim) float64 view."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    width = col.type.byte_width // 8
    a = np.frombuffer(col.buffers()[1], dtype=np.float64)
    start = col.offset * width
    return a[start : start + n_rows * width].reshape(n_rows, width)


def _fsb_bytes_matrix(col, n_rows: int) -> np.ndarray:
    """fixed-size-binary column -> (n, byte_width) uint8 view (null
    slots still occupy byte_width bytes, so row indexing is uniform)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    w = col.type.byte_width
    a = np.frombuffer(col.buffers()[1], dtype=np.uint8)
    start = col.offset * w
    return a[start : start + n_rows * w].reshape(n_rows, w)


def _attach_embeddings(
    pairs: "ray.data.Dataset",
    embeddings: "ray.data.Dataset",
    key: str,
    out_column: str,
    dim: int,
    pair_schema: pa.Schema,
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Hash-partitioned join attaching the normalized embedding for
    ``pairs[key]`` as ``out_column`` (a fixed-size-binary blob).

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
    blob_t = pa.binary(dim * 8)
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
        blob = pa.FixedSizeBinaryArray.from_buffers(
            blob_t, x.shape[0], [None, pa.py_buffer(np.ascontiguousarray(x).tobytes())]
        )
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
        mat = _fsb_bytes_matrix(blob, block.num_rows)
        dk, dm = keys[doc_mask], mat[doc_mask]
        order = np.argsort(dk)
        dk, dm = dk[order], dm[order]
        pk = keys[pair_mask]
        pos = np.clip(np.searchsorted(dk, pk), 0, len(dk) - 1)
        matched = dk[pos] == pk  # inner-join semantics
        sel = np.zeros(block.num_rows, dtype=bool)
        sel[np.flatnonzero(pair_mask)[matched]] = True
        sub = block.filter(pa.array(sel))
        out_bytes = np.ascontiguousarray(dm[pos][matched])
        out_blob = pa.FixedSizeBinaryArray.from_buffers(
            blob_t, len(out_bytes), [None, pa.py_buffer(out_bytes.tobytes())]
        )
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
        grouped_map,
        keep_one_per_key,
    )

    _ensure_hash_shuffle()
    keys, embeddings, dim = _explode_keys(embeddings_path, n_planes, n_tables)

    def bucket_candidates(group: pa.Table) -> pa.Table:
        """One (table, bucket) group -> (query_id, neighbor_id) id pairs."""
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        ids = np.asarray(group.column("vec_id"))
        qids = ids[ids < n_queries]
        if not len(qids):
            return empty
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, len(ids)), type=pa.int64()),
                "neighbor_id": pa.array(np.tile(ids, len(qids)), type=pa.int64()),
            }
        )

    cand = grouped_map(keys, ["lsh_table", "lsh_bucket"], bucket_candidates, num_partitions=16)
    # same (query, neighbor) may collide in several tables -> dedup
    cand = keep_one_per_key(cand, ["query_id", "neighbor_id"], "query_id", keep="first")
    return _exact_topk(cand, embeddings, embeddings_path, n_queries, k)


def _exact_topk(
    cand: "ray.data.Dataset",
    embeddings: "ray.data.Dataset",
    embeddings_path: str,
    n_queries: int,
    k: int,
) -> "ray.data.Dataset":
    """Shared tail of the bucketed ANN paths (LSH and IVF): candidate
    (query_id, neighbor_id) pairs -> exact cosine against a broadcast
    query matrix -> per-query global top-k."""
    from embulk_input_marketo_ray.pipelines.queries import grouped_map

    # broadcast the (tiny) normalized query matrix once, rows sorted by
    # query id so the per-batch row lookup is a vectorized searchsorted
    qt = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), pa.scalar(n_queries)))
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
        import pandas as pd

        df = group.to_pandas().drop_duplicates(["query_id", "neighbor_id"])
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rank"]], preserve_index=False
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
    # matrix); stable argsort so ties break identically in the oracle ---
    qt = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    qt = qt.filter(pc.less(qt.column("vec_id"), pa.scalar(n_queries)))
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
        grouped_map,
        keep_one_per_key,
    )

    _ensure_hash_shuffle()
    keys, embeddings, dim = _explode_keys(embeddings_path, n_planes, n_tables)

    def bucket_id_pairs(group: pa.Table) -> pa.Table:
        """One (table, bucket) group -> candidate id pairs (ids only)."""
        empty = pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        ids = np.sort(np.asarray(group.column("vec_id")))
        ii, jj = np.triu_indices(len(ids), k=1)
        return pa.table(
            {
                "vec_id": pa.array(ids[jj], type=pa.int64()),
                "dup_of": pa.array(ids[ii], type=pa.int64()),
            }
        )

    cand = grouped_map(keys, ["lsh_table", "lsh_bucket"], bucket_id_pairs, num_partitions=16)
    # same pair can surface from several tables
    cand = keep_one_per_key(cand, ["vec_id", "dup_of"], "vec_id", keep="first")

    pair_schema = pa.schema([("vec_id", pa.int64()), ("dup_of", pa.int64())])
    j = _attach_embeddings(cand, embeddings, key="vec_id", out_column="emb_a",
                           dim=dim, pair_schema=pair_schema)
    j = _attach_embeddings(
        j,
        embeddings,
        key="dup_of",
        out_column="emb_b",
        dim=dim,
        pair_schema=pair_schema.append(pa.field("emb_a", pa.binary(dim * 8))),
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
