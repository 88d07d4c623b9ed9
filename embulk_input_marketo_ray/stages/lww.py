"""Last-writer-wins upsert / tombstone merge, hash-bucketed.

The single wide stage of the CDC engine (SURVEY.md §2.4 J4 / §2.7 D5):
a hash shuffle on the composite upsert key ``(repo, path)`` with commit
order (``commit_seq``) as the monotonic version. This generalizes the
reference's incremental-import ordering + dedup story — the
non-overlapping +1 s slice rule (MarketoUtils.java:100-113) and the
declared-but-vestigial ``uid_column`` identity
(delegate/MarketoBaseBulkExtractInputPlugin.java:78-89) — into an
explicit idempotent merge, so replayed / duplicated events converge to
the same lake state (exactly-once).

Scale design:
- **Partial combine before the shuffle** (``add_bucket_and_partial_lww``
  runs inside ``map_batches``): each block is collapsed to its newest
  event per key first, so the all-to-all exchange moves at most one row
  per (key, block) instead of every event. Tombstones survive the
  partial (they must reach the final merge to delete older versions).
- **Bucketed, not per-key, groups**: the shuffle key is
  ``bucket = hash(repo, path) % num_buckets`` — a bounded number of
  groups, each merged with one vectorized kernel, instead of millions
  of tiny per-key ``map_groups`` calls. ``num_buckets`` bounds peak
  per-group memory (bucket ~ dataset/num_buckets) and is the unit of
  output partitioning / resume; skewed hot repos spread across buckets
  because the hash includes ``path``.
- Ordering never relies on cross-block order (W7): correctness depends
  only on the per-key ``commit_seq`` sort inside the merge kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from embulk_input_marketo_ray.functions.scalar import stable_key_hash, stable_key_hash_raw

LAKE_KEY = ["repo", "path"]
BUCKET_COLUMN = "bucket"


# ---------------------------------------------------------------------------
# Extendible-hash bucket routing (lake growth beyond the initial bucket count)
#
# A 100 TB lake can't live forever with the bucket count chosen on day
# one: buckets grow without bound as the keyspace grows. Instead of
# re-bucketing the whole lake (a full rewrite), buckets SPLIT like an
# extendible hash table: a bucket is identified by a SUFFIX of the key
# hash — ``suffix = hash & (2^depth - 1)`` — and a too-big bucket
# ``s`` at depth ``d`` splits into children ``s`` and ``s | 2^d`` at
# depth ``d+1`` (each child keeps exactly the keys whose next hash bit
# matches, so a split never moves a key across unrelated buckets and
# only rewrites the one oversized partition). Per-bucket depths live
# in the manifest; routing uses a directory of size 2^max_depth —
# a few KB even at thousands of buckets — built once per run on the
# driver and shipped to the ingest tasks.
# ---------------------------------------------------------------------------


def bucket_depths(manifest_state: dict, num_buckets: int) -> dict[int, int]:
    """Per-bucket depth map from the manifest (initial buckets default
    to ``log2(num_buckets)``). ``num_buckets`` must be a power of two
    when splitting is enabled — validated in ReplayConfig."""
    d0 = int(num_buckets).bit_length() - 1
    depths = {b: d0 for b in range(num_buckets)}
    for pid, entry in manifest_state.get("partitions", {}).items():
        depths[int(pid)] = int(entry.get("depth", d0))
    return depths


def build_directory(depths: dict[int, int]) -> np.ndarray:
    """Routing directory: ``directory[hash & (len-1)] -> bucket id``.

    Entry i is the unique committed bucket whose suffix matches i.
    Built shallow-to-deep so children override the region their parent
    used to own; validated dense (an inconsistent manifest — parent
    deepened without both children present — fails loudly)."""
    g = max(depths.values())
    size = 1 << g
    directory = np.full(size, -1, dtype=np.int32)
    for suffix, d in sorted(depths.items(), key=lambda kv: kv[1]):
        directory[suffix :: 1 << d] = suffix
    if (directory < 0).any():
        missing = np.flatnonzero(directory < 0)[:8].tolist()
        raise RuntimeError(
            f"bucket directory has unowned hash suffixes (first: {missing}) — "
            "manifest depth map is inconsistent"
        )
    return directory


def route_buckets(table: pa.Table, directory: np.ndarray, key_columns: list[str] = LAKE_KEY) -> np.ndarray:
    """Bucket id per row via the extendible-hash directory."""
    raw = stable_key_hash_raw(table, key_columns)
    idx = raw & np.uint64(len(directory) - 1)
    return directory[idx.astype(np.int64)]


def winner_candidates(
    table: pa.Table,
    key_columns: list[str] = LAKE_KEY,
    seq_column: str = "commit_seq",
) -> pa.Table:
    """EXACT per-key max version via Arrow's native hash aggregation —
    the reduction kernel of the late-materialization winner scan (both
    the per-block partial and the per-bucket final reduce).
    ``use_threads=False``: Ray provides the parallelism; Arrow's own
    pool would oversubscribe the node."""
    agg = table.group_by(key_columns, use_threads=False).aggregate([(seq_column, "max")])
    cols = {k: agg.column(k) for k in key_columns}
    cols[seq_column] = agg.column(seq_column + "_max")
    return pa.table(cols)


def winner_hash(
    table: pa.Table,
    key_columns: list[str] = LAKE_KEY,
    seq_column: str = "commit_seq",
) -> np.ndarray:
    """uint64 membership hash over (upsert key, version) — the
    late-materialization filter key. Winner IDENTITY is exact (the scan
    reduces with ``winner_candidates``); only the pass-2 MEMBERSHIP
    test hashes, which is safe because collisions are false-POSITIVE
    only: every key's true winner row always hashes into the set, and
    an extra colliding loser row merely re-loses the LWW race at the
    final merge. 8 bytes/winner also shrinks the broadcast ~10x vs
    composite strings."""
    h = stable_key_hash_raw(table, key_columns)
    seq = table.column(seq_column)
    if isinstance(seq, pa.ChunkedArray):
        seq = seq.combine_chunks()
    return h ^ (np.asarray(seq).astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def add_bucket(
    table: pa.Table,
    num_buckets: int,
    key_columns: list[str] = LAKE_KEY,
    directory: np.ndarray | None = None,
) -> pa.Table:
    """Append the deterministic shuffle/partition bucket id (extendible
    -hash directory routing when splitting is enabled, else
    ``hash % num_buckets``)."""
    if directory is not None:
        buckets = route_buckets(table, directory, key_columns)
    else:
        buckets = stable_key_hash(table, key_columns, num_buckets)
    return table.append_column(BUCKET_COLUMN, pa.array(buckets, type=pa.int32()))


def _composite_key(table: pa.Table, key_columns: list[str]) -> np.ndarray:
    joined = table.column(key_columns[0]).cast(pa.string())
    for k in key_columns[1:]:
        joined = pc.binary_join_element_wise(joined, table.column(k).cast(pa.string()), "\x00")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return np.asarray(joined, dtype=object)


def lww_merge(
    table: pa.Table,
    key_columns: list[str] = LAKE_KEY,
    seq_column: str = "commit_seq",
    op_column: str | None = "op",
    drop_tombstones: bool = True,
) -> pa.Table:
    """Keep the newest row per key; optionally drop tombstoned keys.

    Vectorized: one Arrow sort on ``seq_column`` + a hash-based
    keep-last over the composite key (pandas ``duplicated``, O(n)).
    Ties on ``commit_seq`` are exact replayed duplicates by
    construction, so either copy is correct.
    """
    if table.num_rows == 0:
        return table
    order = pc.sort_indices(table, sort_keys=[(seq_column, "ascending")])
    table = table.take(order)
    keys = _composite_key(table, key_columns)
    keep = ~pd.Series(keys).duplicated(keep="last").to_numpy()
    if drop_tombstones and op_column is not None:
        is_upsert = pc.equal(table.column(op_column), pa.scalar("upsert"))
        keep &= np.asarray(is_upsert.combine_chunks(), dtype=bool)
    return table.filter(pa.array(keep))


def add_bucket_and_partial_lww(
    batch: pa.Table,
    num_buckets: int,
    key_columns: list[str] = LAKE_KEY,
    seq_column: str = "commit_seq",
    directory: np.ndarray | None = None,
) -> pa.Table:
    """Per-block combiner + bucket assignment (runs pre-shuffle).

    Collapses the block to its newest event per key (tombstones kept —
    ``drop_tombstones=False`` — so deletes still reach the final merge)
    and appends the deterministic shuffle/partition bucket id. With a
    routing ``directory`` (bucket splitting enabled), the id comes from
    the extendible-hash suffix lookup; otherwise ``hash % num_buckets``
    (identical for power-of-two counts with no splits yet).
    """
    batch = lww_merge(batch, key_columns, seq_column, op_column=None)
    return add_bucket(batch, num_buckets, key_columns, directory)
