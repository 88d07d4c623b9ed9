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
- **Embedding near-dup**: same bucketing; within a bucket, pairwise
  cosine >= threshold emits (vec_id, dup_of=min id). Partitioning
  assumption: near-identical vectors collide in at least one table
  with probability 1-(1-p^b)^T.

Both stages broadcast the (seeded) hyperplane matrix via closure
capture — it is tiny (dim x n_planes floats).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _embedding_matrix(batch: pa.Table, column: str = "embedding") -> np.ndarray:
    emb = np.stack(batch.column(column).to_pylist()).astype(np.float64)
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
    """Actor-pool stage: explode each vector to (table, bucket) keys."""

    def __init__(self, dim: int, n_planes: int = 12, n_tables: int = 4, seed: int = 7):
        self.planes = [_hyperplanes(dim, n_planes, t, seed) for t in range(n_tables)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        x = _embedding_matrix(batch)
        ids = np.asarray(batch.column("vec_id"))
        out_id, out_table, out_bucket, out_emb = [], [], [], []
        for t, planes in enumerate(self.planes):
            keys = _bucket_keys(x, planes)
            out_id.append(ids)
            out_table.append(np.full(len(ids), t, dtype=np.int32))
            out_bucket.append(keys)
            out_emb.append(x)
        emb = np.concatenate(out_emb)
        return pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_id), type=pa.int64()),
                "lsh_table": pa.array(np.concatenate(out_table), type=pa.int32()),
                "lsh_bucket": pa.array(np.concatenate(out_bucket), type=pa.int64()),
                "nembedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.reshape(-1), type=pa.float64()), emb.shape[1]
                ),
            }
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
    LSH buckets; per-bucket exact cosine, then per-query global top-k."""
    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle, grouped_map

    _ensure_hash_shuffle()
    dim = len(
        pq.read_table(embeddings_path, columns=["embedding"]).column("embedding")[0]
    )

    ds = ray.data.read_parquet(embeddings_path, columns=["vec_id", "embedding"])
    exploded = ds.map_batches(
        LshBucketer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "n_tables": n_tables},
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "neighbor_id": pa.array([], type=pa.int64()),
                "cos": pa.array([], type=pa.float64()),
            }
        )
        if group.num_rows == 0:
            return empty
        ids = np.asarray(group.column("vec_id"))
        qmask = ids < n_queries
        if not qmask.any():
            return empty
        emb = np.asarray(group.column("nembedding").combine_chunks().flatten()).reshape(
            group.num_rows, -1
        )
        cos = emb[qmask] @ emb.T
        qids = np.repeat(ids[qmask], len(ids))
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "neighbor_id": pa.array(np.tile(ids, qmask.sum()), type=pa.int64()),
                "cos": pa.array(cos.reshape(-1), type=pa.float64()),
            }
        )

    pairs = grouped_map(exploded, ["lsh_table", "lsh_bucket"], bucket_pairs, num_partitions=16)

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
        # same (query, neighbor) may collide in several tables -> dedup
        import pandas as pd

        df = group.to_pandas().drop_duplicates(["query_id", "neighbor_id"])
        df = df.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return pa.Table.from_pandas(
            df[["query_id", "neighbor_id", "rank"]], preserve_index=False
        )

    return grouped_map(pairs, ["query_id"], topk, num_partitions=max(n_queries, 1))


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
    dim = len(
        pq.read_table(embeddings_path, columns=["embedding"]).column("embedding")[0]
    )
    ds = ray.data.read_parquet(embeddings_path, columns=["vec_id", "embedding"])
    exploded = ds.map_batches(
        LshBucketer,
        batch_format="pyarrow",
        concurrency=(1, 4),
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes, "n_tables": n_tables},
    )

    def bucket_dups(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "dup_of": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows < 2:
            return empty
        ids = np.asarray(group.column("vec_id"))
        order = np.argsort(ids)
        ids = ids[order]
        emb = np.asarray(group.column("nembedding").combine_chunks().flatten()).reshape(
            group.num_rows, -1
        )[order]
        cos = emb @ emb.T
        ii, jj = np.nonzero(np.triu(cos >= threshold, k=1))
        if not len(ii):
            return empty
        return pa.table(
            {
                "vec_id": pa.array(ids[jj], type=pa.int64()),
                "dup_of": pa.array(ids[ii], type=pa.int64()),
            }
        )

    pairs = grouped_map(exploded, ["lsh_table", "lsh_bucket"], bucket_dups, num_partitions=16)
    # same pair can surface from several tables
    return keep_one_per_key(pairs, ["vec_id", "dup_of"], "vec_id", keep="first")
