"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Training-data-pipeline additions (build brief): each follows the
scale-safe Ray Data shape —

- **exact**: vectorized content-hash per batch -> hash-partitioned
  ``groupby(hash_bucket).map_groups`` keeping the first (min id) row per
  hash. The shuffle moves one row per duplicate-set member; the group
  kernel is vectorized (no per-key Python).
- **MinHash+LSH**: shingle -> minhash signature per batch (numpy) ->
  explode to (band, band_hash) candidate rows -> groupby over band
  buckets -> candidate pairs verified by signature overlap. Cluster id
  = min doc id over matched pairs (single-pass; the synthetic corpus's
  duplicate sets are direct near-copies, so one propagation round
  suffices — document the assumption).
- **SimHash**: 64-bit hyperplane-free simhash over token hashes,
  vectorized; near-dup = identical simhash (tight) or banded simhash
  chunks for Hamming<=k.
- **n-gram Jaccard**: exact verification kernel used by the LSH path
  and exposed standalone for small candidate sets.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def sorted_member_mask(sorted_vals: np.ndarray, ids: np.ndarray) -> np.ndarray:
    """Boolean membership of ``ids`` in the SORTED array ``sorted_vals``
    — the one broadcast-searchsorted kernel behind every small-side
    attach filter in the engine (loser drop, member-length prefilter,
    sig-index candidate/band prunes, admitted split). Centralized so
    the empty-set and end-clip edges are handled once.

    Empty ``sorted_vals`` -> all-False (nothing is a member)."""
    if not len(sorted_vals):
        return np.zeros(len(ids), dtype=bool)
    pos = np.searchsorted(sorted_vals, ids)
    pos[pos >= len(sorted_vals)] = len(sorted_vals) - 1
    return sorted_vals[pos] == ids


def add_content_hash(batch: pa.Table, text_column: str = "text", out: str = "text_sha256") -> pa.Table:
    from embulk_input_marketo_ray.functions.scalar import sha256_column

    return batch.append_column(out, sha256_column(batch.column(text_column)))


def exact_dedup_keep_first(
    group: pa.Table, hash_column: str = "text_sha256", id_column: str = "doc_id"
) -> pa.Table:
    """Group kernel (one hash bucket): keep the min-id row per hash.

    Vectorized: sort by (hash, id), hash-based keep-first."""
    if group.num_rows == 0:
        return group
    order = pc.sort_indices(group, sort_keys=[(hash_column, "ascending"), (id_column, "ascending")])
    g = group.take(order)
    keys = g.column(hash_column).combine_chunks() if isinstance(
        g.column(hash_column), pa.ChunkedArray
    ) else g.column(hash_column)
    keep = ~pd.Series(np.asarray(keys, dtype=object)).duplicated(keep="first").to_numpy()
    return g.filter(pa.array(keep))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_WORD = re.compile(r"\w+")

_MERSENNE = np.uint64((1 << 61) - 1)


class MinHasher:
    """Actor-pool stage: per-document MinHash signature over word shingles.

    ``__init__`` draws the (a, b) permutation parameters once per actor
    from a fixed seed (deterministic across the fleet); ``__call__``
    computes signatures with one numpy min-reduce per document.
    """

    def __init__(
        self,
        text_column: str = "text",
        num_perm: int = 64,
        shingle_size: int = 3,
        seed: int = 1234,
    ) -> None:
        self.text_column = text_column
        self.num_perm = num_perm
        self.shingle_size = shingle_size
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_perm, dtype=np.uint64)
        self._tok_cache: dict[str, int] = {}

    # rolling-combine multipliers (odd -> full-period under uint64 wrap)
    _COMBINE = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9], dtype=np.uint64)

    def _token_hash(self, tok: str) -> int:
        # per-actor memo: corpora have Zipf vocabularies, so the cache
        # hit rate makes token hashing ~a dict lookup
        h = self._tok_cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            self._tok_cache[tok] = h
        return h

    def shingles(self, text: str) -> np.ndarray:
        """k-gram shingle hashes: hash each TOKEN once (memoized), then
        combine adjacent token hashes arithmetically — no per-shingle
        string join/digest (the hot-path cost at corpus scale)."""
        toks = _WORD.findall(text.lower())
        k = self.shingle_size
        th = np.fromiter((self._token_hash(t) for t in toks), dtype=np.uint64, count=len(toks))
        if len(th) < k:
            if len(th) == 0:
                return np.array([np.uint64(0)], dtype=np.uint64)
            combined = np.uint64(0)
            for i, v in enumerate(th):
                combined += v * self._COMBINE[i % k]
            return np.array([combined], dtype=np.uint64)
        n = len(th) - k + 1
        out = np.zeros(n, dtype=np.uint64)
        for j in range(k):
            out += th[j : j + n] * self._COMBINE[j % len(self._COMBINE)]
        return np.unique(out)

    def signature(self, text: str) -> np.ndarray:
        h = self.shingles(text)
        # (a*h + b) mod p, min over shingles, per permutation
        vals = (self.a[None, :] * h[:, None] + self.b[None, :]) % _MERSENNE
        return vals.min(axis=0)

    def _signatures_vectorized(self, col) -> np.ndarray:
        """Whole-batch signatures with no per-token Python iteration:
        Arrow regex split (C) -> pandas factorize (C) -> memoized hash
        of UNIQUE tokens only -> flat shingle combine + per-doc
        ``minimum.reduceat`` (numpy)."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lower = pc.utf8_lower(pc.coalesce(col, pa.scalar("")))
        toks = pc.split_pattern_regex(lower, pattern=r"\W+")
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets)
        n_docs = len(col)

        import pandas as pd

        words = np.asarray(flat, dtype=object)
        nonempty = words != ""
        codes, uniques = pd.factorize(words, use_na_sentinel=False)
        uniq_hash = np.fromiter(
            (self._token_hash(u) for u in uniques), dtype=np.uint64, count=len(uniques)
        )
        th = uniq_hash[codes]
        th[~nonempty] = np.uint64(0)

        # doc boundaries over the flat token array, dropping empty splits
        # by compacting: keep nonempty tokens, remap offsets
        keep_idx = np.flatnonzero(nonempty)
        th = th[keep_idx]
        new_offsets = np.searchsorted(keep_idx, offsets)

        k = self.shingle_size
        n_flat = len(th)
        # flat shingle hashes at every position with >= k tokens left
        if n_flat >= k:
            sh = np.zeros(n_flat - k + 1, dtype=np.uint64)
            for j in range(k):
                sh += th[j : j + n_flat - k + 1] * self._COMBINE[j % len(self._COMBINE)]
        else:
            sh = np.zeros(0, dtype=np.uint64)

        sigs = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
        starts = new_offsets[:-1]
        ends = new_offsets[1:]
        # Per-doc reduce: unique() first is load-bearing, not cosmetic —
        # synthetic/web corpora are highly repetitive, so the unique
        # shingle set is typically several times smaller than the raw
        # window count, and the (shingles x num_perm) modulo dominates.
        # (A fully flat reduceat over NON-unique shingles was measured
        # 17x slower on the sf0.1 corpus.)
        # Measured alternative (round 3, 50k-doc corpus): replacing this
        # loop with a flat batched kernel — (doc, shingle) pair
        # explosion + lexsort dedup + chunked (n_uniq x 64) modulo with
        # segmented minimum.reduceat — is bit-identical but SLOWER:
        # 5.7 s (4.1 s lexsort-unique prep + 1.7 s best-chunk modulo at
        # 4k shingles/chunk; 8.9 s at 256k/chunk) vs 3.8 s for this
        # loop. Per-doc arrays (~10^2 shingles x 64 perms) keep the
        # multiply/add/mod temporaries L2-resident, and per-doc
        # np.unique on small arrays beats one global 2.7M-pair lexsort.
        # The loop stays; see BASELINE.md "MinHash kernel A/B".
        for d in range(n_docs):
            s, e = starts[d], ends[d]
            n_tok = e - s
            if n_tok >= k:
                h = np.unique(sh[s : e - k + 1])
            elif n_tok > 0:  # short doc: single combined shingle
                combined = np.uint64(0)
                for i in range(n_tok):
                    combined += th[s + i] * self._COMBINE[i % k]
                h = np.array([combined], dtype=np.uint64)
            else:
                h = np.array([np.uint64(0)], dtype=np.uint64)
            vals = (self.a[None, :] * h[:, None] + self.b[None, :]) % _MERSENNE
            sigs[d] = vals.min(axis=0)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = self._signatures_vectorized(batch.column(self.text_column))
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1), type=pa.uint64()), self.num_perm
        )
        return batch.append_column("minhash", sig_col)


# per-permutation-slot multipliers for the vectorized band hash: a
# universal (multiply-sum mod 2^64) hash of the band's signature slice.
# Equality of band slices implies equality of hashes; a false collision
# between DIFFERENT slices is ~2^-64 per pair and is removed downstream
# by the exact verification step, so no byte-level digest is needed.
_BAND_MULT = np.random.default_rng(0xBA9D).integers(
    1, np.iinfo(np.uint64).max, size=4096, dtype=np.uint64
) | np.uint64(1)


def explode_lsh_bands(
    batch: pa.Table, num_bands: int, id_column: str = "doc_id"
) -> pa.Table:
    """(doc, signature) -> one row per (band, band_hash) — the LSH keys.

    Downstream: ``groupby(["band", "band_hash"])`` co-locates candidate
    duplicates. Fully vectorized: the band hash is a multiply-sum over
    the band's signature slice (no per-row digest loop — the former
    blake2b-per-row version was the row-at-a-time bottleneck at corpus
    scale).
    """
    sigs = np.asarray(batch.column("minhash").combine_chunks().flatten()).reshape(
        batch.num_rows, -1
    )
    num_perm = sigs.shape[1]
    rows_per_band = num_perm // num_bands
    ids = np.asarray(batch.column(id_column))
    # (n_docs, num_bands, rows_per_band) * multipliers -> sum over slot axis
    chunks = sigs[:, : num_bands * rows_per_band].reshape(len(ids), num_bands, rows_per_band)
    mult = _BAND_MULT[: num_bands * rows_per_band].reshape(num_bands, rows_per_band)
    hashes = (chunks * mult[None, :, :]).sum(axis=2, dtype=np.uint64)  # (n_docs, num_bands)
    bands = np.broadcast_to(np.arange(num_bands, dtype=np.int32), hashes.shape)
    return pa.table(
        {
            id_column: pa.array(np.repeat(ids, num_bands)),
            "band": pa.array(bands.reshape(-1), type=pa.int32()),
            "band_hash": pa.array(hashes.reshape(-1), type=pa.uint64()),
        }
    )


def lsh_bucket_to_pairs(group: pa.Table, id_column: str = "doc_id") -> pa.Table:
    """Group kernel for one (band, band_hash) bucket -> candidate pairs
    (min id paired with every other id; transitive closure resolved by
    min-label propagation downstream)."""
    ids = np.sort(np.asarray(group.column(id_column)))
    if len(ids) < 2:
        return pa.table({"doc_id": pa.array([], type=pa.int64()), "dup_of": pa.array([], type=pa.int64())})
    return pa.table(
        {
            "doc_id": pa.array(ids[1:], type=pa.int64()),
            "dup_of": pa.array(np.full(len(ids) - 1, ids[0]), type=pa.int64()),
        }
    )


_PAIRS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("dup_of", pa.int64())])


def lsh_block_to_pairs(block: pa.Table, id_column: str = "doc_id") -> pa.Table:
    """Whole-block candidate-pair emission for a key-partitioned block
    of (doc_id, band, band_hash) rows: ALL buckets in the block are
    processed with one vectorized run-detection pass (the per-group
    ``lsh_bucket_to_pairs`` kernel invoked thousands of times per block
    was the pipeline's dominant cost at corpus scale)."""
    if block.num_rows == 0:
        return _PAIRS_SCHEMA.empty_table()
    order = pc.sort_indices(
        block,
        sort_keys=[("band", "ascending"), ("band_hash", "ascending"), (id_column, "ascending")],
    )
    b = block.take(order)
    band = np.asarray(b.column("band"))
    bh = np.asarray(b.column("band_hash"))
    ids = np.asarray(b.column(id_column), dtype=np.int64)
    new_run = np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])]
    starts = np.flatnonzero(new_run)
    counts = np.diff(np.r_[starts, len(ids)])
    firsts = ids[starts]  # per-run min id (sorted within run)
    keep = ~new_run  # every non-first member pairs with its run's min
    return pa.table(
        {
            "doc_id": pa.array(ids[keep], type=pa.int64()),
            "dup_of": pa.array(np.repeat(firsts, counts - 1), type=pa.int64()),
        }
    )


def resolve_dup_clusters(
    pairs: "object", driver_pair_limit: int = 2_000_000, max_rounds: int = 16
) -> "object":
    """Candidate near-dup pairs -> connected components.

    Input dataset columns ``(doc_id, dup_of)``; output ``(doc_id,
    cluster_id)`` for every node appearing in a pair, ``cluster_id`` =
    min doc_id of the component.

    Two paths, per the standard trade-off:

    - pair set provably small (``count() <= driver_pair_limit``, the
      normal case — near-dup edges are sparse relative to the corpus):
      exact union-find on the driver, O(E a(E));
    - larger: fully distributed min-label propagation. Each round joins
      the (distributed) edge list with the current label table on the
      neighbor endpoint and takes the per-node min — no driver
      materialization and no broadcast dict anywhere; per-round state
      is one (node, label) row per DUP NODE (orders of magnitude
      smaller than the corpus). Convergence is detected by the label
      sum (labels only decrease, so an unchanged sum means a fixed
      point); components of diameter > ``max_rounds`` would come out
      non-minimal — near-dup clusters are dense and shallow in
      practice, and ``max_rounds`` bounds the join rounds.
    """
    import ray.data
    from ray.data.aggregate import Min, Sum

    # execute the (sparse) pair pipeline once; count() and the
    # union-find/propagation consumers below reuse the cached blocks
    # instead of re-running the upstream LSH pipeline per consumer
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if n_pairs <= driver_pair_limit:
        edge_rows = pairs.take_all()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edge_rows:
            ra, rb = find(int(r["doc_id"])), find(int(r["dup_of"]))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return ray.data.from_items(
            [{"doc_id": x, "cluster_id": find(x)} for x in sorted(parent)]
        )

    # distributed min-label propagation
    import ray.data as rd

    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    # a Dataset snapshots the DataContext at CREATION time; if the
    # caller built `pairs` before the hash-shuffle tuning above, joins
    # on its descendants fail (sparse partitions under the untuned
    # strategy surface as schema-less blocks inside the join). Re-wrap
    # the executed blocks so every derived dataset carries the tuned
    # context — refs only, no driver materialization.
    pairs = rd.from_arrow_refs(pairs.to_arrow_refs())
    num_partitions = 16

    def both_directions(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_id").combine_chunks() if isinstance(
            batch.column("doc_id"), pa.ChunkedArray
        ) else batch.column("doc_id")
        b = batch.column("dup_of").combine_chunks() if isinstance(
            batch.column("dup_of"), pa.ChunkedArray
        ) else batch.column("dup_of")
        return pa.table(
            {
                "node": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "nbr": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    edges = pairs.map_batches(both_directions, batch_format="pyarrow").materialize()

    def seed(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "label": pc.min_element_wise(batch.column("node"), batch.column("nbr")),
            }
        )

    labels = (
        edges.map_batches(seed, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    prev_sum = labels.aggregate(Sum("label"))

    def as_nbr_label(batch: pa.Table) -> pa.Table:
        # rename the label key so the join key name is unambiguous on
        # both sides (a right key sharing a LEFT column name trips
        # acero's field resolution inside Ray's hash join)
        return pa.table({"nbr": batch.column("node"), "nbr_label": batch.column("label")})

    converged = False
    for _ in range(max_rounds):
        cand = edges.join(
            labels.map_batches(as_nbr_label, batch_format="pyarrow"),
            "inner",
            num_partitions=num_partitions,
            on=("nbr",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        )

        def project(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("node"), "label": batch.column("nbr_label")})

        cand = cand.map_batches(project, batch_format="pyarrow")
        labels = (
            labels.union(cand)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new_sum = labels.aggregate(Sum("label"))
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # a component of diameter > max_rounds did not reach its fixed
        # point: its labels are an upper bound, not the component min —
        # downstream "canonical member" selection would be wrong for it.
        # Near-dup clusters are dense/shallow in practice, so this warns
        # rather than raises; callers needing exactness raise max_rounds.
        import warnings

        warnings.warn(
            f"resolve_dup_clusters: min-label propagation did not converge "
            f"within max_rounds={max_rounds}; cluster ids may be non-minimal "
            f"for components of diameter > {max_rounds}",
            RuntimeWarning,
            stacklevel=2,
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": batch.column("node"), "cluster_id": batch.column("label")}
        )

    return labels.map_batches(rename, batch_format="pyarrow")


def drop_schemaless_blocks(ds: "object", fallback_schema: pa.Schema) -> "object":
    """Remove the schema-less EMPTY blocks that Ray 2.49's keyed hash
    repartition emits for empty partitions — ``Dataset.join`` fails on
    them ("No match for key field ... on left side"). Block-level only:
    one tiny remote per block reads ``num_rows``; data never touches
    the driver. If every block is empty, a typed empty block with
    ``fallback_schema`` is substituted so downstream schemas resolve."""
    import ray
    import ray.data as rd

    @ray.remote
    def _rows(t: pa.Table) -> int:
        return t.num_rows

    refs = ds.to_arrow_refs()
    counts = ray.get([_rows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if not keep:
        return rd.from_arrow(fallback_schema.empty_table())
    return rd.from_arrow_refs(keep)


def verify_pairs_jaccard(
    pairs: "object",
    documents: "object",
    threshold: float = 0.5,
    num_partitions: int = 16,
    ngram: int = 3,
    id_column: str = "doc_id",
    text_column: str = "text",
) -> "object":
    """Exact n-gram-Jaccard verification of candidate pairs via
    hash-partitioned repartition joins — the 100 TB path (no
    driver-built text dict, no whole-corpus broadcast).

    Implemented as two keyed shuffles over a tagged union (instead of
    two ``Dataset.join`` calls, whose per-operator aggregator pools and
    barrier laundering tripled the wall time at small scale):

    1. explode each candidate pair to two slot rows keyed by its
       endpoint doc id, union with the documents' (id, text) rows, and
       repartition on the id — each group holds one doc's text plus
       every pair-slot that needs it (payload: one text copy per
       pair side, ∝ the sparse candidate set, not the corpus);
    2. repartition the text-carrying slot rows on the PAIR key — each
       group holds both endpoints' texts; compute the exact Jaccard
       and keep >= threshold. Duplicate candidates (same pair from
       several LSH bands) collapse here for free, so no separate
       pair-dedup shuffle is needed upstream.
    """
    union_schema = pa.schema(
        [
            ("key", pa.int64()),
            ("pair_doc", pa.int64()),
            ("pair_dup", pa.int64()),
            ("slot", pa.int32()),
            (text_column, pa.string()),
        ]
    )

    def explode_slots(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or id_column not in batch.column_names:
            return union_schema.empty_table()
        a = np.asarray(batch.column(id_column), dtype=np.int64)
        b = np.asarray(batch.column("dup_of"), dtype=np.int64)
        n = len(a)
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, b]), type=pa.int64()),
                "pair_doc": pa.array(np.tile(a, 2), type=pa.int64()),
                "pair_dup": pa.array(np.tile(b, 2), type=pa.int64()),
                "slot": pa.array(
                    np.repeat(np.array([0, 1], dtype=np.int32), n), type=pa.int32()
                ),
                text_column: pa.nulls(2 * n, type=pa.string()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "key": batch.column(id_column).cast(pa.int64()),
                "pair_doc": pa.nulls(n, type=pa.int64()),
                "pair_dup": pa.nulls(n, type=pa.int64()),
                "slot": pa.array(np.full(n, -1, dtype=np.int32), type=pa.int32()),
                text_column: batch.column(text_column),
            }
        )

    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    u = pairs.map_batches(explode_slots, batch_format="pyarrow").union(
        documents.map_batches(doc_rows, batch_format="pyarrow")
    )

    _slotted_schema = pa.schema(
        [
            ("pair_doc", pa.int64()),
            ("pair_dup", pa.int64()),
            ("slot", pa.int32()),
            (text_column, pa.string()),
        ]
    )

    def attach(block: pa.Table) -> pa.Table:
        """One key-partition block: vectorized doc-text lookup for every
        pair-slot row (sorted doc-key array + searchsorted — no per-key
        Python)."""
        if block.num_rows == 0:
            return _slotted_schema.empty_table()
        slots = np.asarray(block.column("slot"))
        doc_mask = slots == -1
        pair_mask = ~doc_mask
        if not doc_mask.any() or not pair_mask.any():
            return _slotted_schema.empty_table()
        keys = np.asarray(block.column("key"), dtype=np.int64)
        texts = np.asarray(block.column(text_column), dtype=object)
        dk = keys[doc_mask]
        dt = texts[doc_mask]
        order = np.argsort(dk)
        dk, dt = dk[order], dt[order]
        pk = keys[pair_mask]
        pos = np.clip(np.searchsorted(dk, pk), 0, len(dk) - 1)
        matched = dk[pos] == pk
        out_texts = dt[pos]
        out_texts[~matched] = None  # inner-join semantics downstream
        sub = block.filter(pa.array(pair_mask))
        return pa.table(
            {
                "pair_doc": sub.column("pair_doc"),
                "pair_dup": sub.column("pair_dup"),
                "slot": sub.column("slot"),
                text_column: pa.array(out_texts, type=pa.string()),
            }
        ).filter(pa.array(matched))

    from embulk_input_marketo_ray.pipelines.queries import _keyed_repartition

    slotted = _keyed_repartition(u, num_partitions, ["key"]).map_batches(
        attach, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    _out_schema = pa.schema(
        [("doc_id", pa.int64()), ("dup_of", pa.int64()), ("jaccard", pa.float64())]
    )

    def verify(block: pa.Table) -> pa.Table:
        """One pair-partition block: per-pair run detection is
        vectorized; the exact Jaccard kernel runs once per UNIQUE
        candidate pair (sparse by construction), with per-document
        n-gram sets memoized across the block."""
        if block.num_rows == 0:
            return _out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("pair_doc", "ascending"),
                ("pair_dup", "ascending"),
                ("slot", "ascending"),
            ],
        )
        b = block.take(order)
        a = np.asarray(b.column("pair_doc"), dtype=np.int64)
        d = np.asarray(b.column("pair_dup"), dtype=np.int64)
        slots = np.asarray(b.column("slot"))
        texts = np.asarray(b.column(text_column), dtype=object)
        starts = np.flatnonzero(np.r_[True, (a[1:] != a[:-1]) | (d[1:] != d[:-1])])
        ends = np.r_[starts[1:], len(a)]

        grams_cache: dict[int, set] = {}

        def grams_of(doc: int, text: str) -> set:
            g = grams_cache.get(doc)
            if g is None:
                g = _ngram_set(text, ngram)
                grams_cache[doc] = g
            return g

        out_a, out_d, out_j = [], [], []
        for s, e in zip(starts, ends):
            seg = slots[s:e]
            a_ix = s + int(np.argmax(seg == 0)) if (seg == 0).any() else -1
            b_ix = s + int(np.argmax(seg == 1)) if (seg == 1).any() else -1
            if a_ix < 0 or b_ix < 0:
                continue
            ga = grams_of(int(a[s]), texts[a_ix] or "")
            gb = grams_of(int(d[s]), texts[b_ix] or "")
            j = _jaccard_sets(ga, gb)
            if j >= threshold:
                out_a.append(int(a[s]))
                out_d.append(int(d[s]))
                out_j.append(j)
        return pa.table(
            {
                "doc_id": pa.array(out_a, type=pa.int64()),
                "dup_of": pa.array(out_d, type=pa.int64()),
                "jaccard": pa.array(out_j, type=pa.float64()),
            }
        )

    return _keyed_repartition(slotted, num_partitions, ["pair_doc", "pair_dup"]).map_batches(
        verify, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor-pool stage: 64-bit SimHash over word-token hashes.

    ``__call__`` is batch-vectorized with the same machinery as
    ``MinHasher._signatures_vectorized``: Arrow regex split (C) ->
    pandas factorize (C) -> blake2b of UNIQUE tokens only (memoized
    per actor across batches — Zipf vocabularies make this ~a dict
    lookup) -> per-doc bit votes via one ``add.reduceat``.
    ``simhash()`` keeps the per-document reference implementation for
    tests/oracles.
    """

    def __init__(self, text_column: str = "text") -> None:
        self.text_column = text_column
        self._tok_cache: dict[str, int] = {}
        self._bit_idx = np.arange(64, dtype=np.uint64)

    def _token_hash(self, tok: str) -> int:
        h = self._tok_cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            self._tok_cache[tok] = h
        return h

    def simhash(self, text: str) -> int:
        """Per-document reference kernel (used by tests + the oracle)."""
        toks = _WORD.findall(text.lower())
        if not toks:
            return 0
        hs = np.fromiter(
            (self._token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
        )
        bits = ((hs[:, None] >> self._bit_idx[None, :]) & np.uint64(1)).astype(np.int64)
        vote = bits.sum(axis=0) * 2 - len(hs)
        return int(((vote > 0).astype(np.uint64) << self._bit_idx).sum())

    def _simhash_vectorized(self, col) -> np.ndarray:
        import pandas as pd

        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lower = pc.utf8_lower(pc.coalesce(col, pa.scalar("")))
        toks = pc.split_pattern_regex(lower, pattern=r"\W+")
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets)
        n_docs = len(col)

        words = np.asarray(flat, dtype=object)
        nonempty = words != ""
        codes, uniques = pd.factorize(words, use_na_sentinel=False)
        uniq_hash = np.fromiter(
            (self._token_hash(u) for u in uniques), dtype=np.uint64, count=len(uniques)
        )
        # bit matrix of UNIQUE token hashes only: (n_uniq, 64). int8,
        # not int32 — the per-batch (n_flat, 64) gather below is the
        # stage's dominant allocation, and on lazy-memory hosts each
        # worker's FIRST touch of those pages costs ~0.3-1 ms/4KiB (see
        # __init__._tune_malloc); int8 quarters that one-time cost.
        ubits = ((uniq_hash[:, None] >> self._bit_idx[None, :]) & np.uint64(1)).astype(np.int8)

        keep_idx = np.flatnonzero(nonempty)
        kept_codes = codes[keep_idx]
        new_offsets = np.searchsorted(keep_idx, offsets)
        n_tok = np.diff(new_offsets)

        out = np.zeros(n_docs, dtype=np.uint64)
        if len(kept_codes) == 0:
            return out
        flat_bits = np.take(ubits, kept_codes, axis=0)  # (n_flat, 64) int8
        # reduceat needs strictly valid start indices; empty docs repeat
        # a boundary -> their "sum" is one spurious row, masked out below
        starts = np.minimum(new_offsets[:-1], len(kept_codes) - 1)
        # dtype=int32: accumulate in 32-bit so long documents cannot
        # overflow the int8 inputs
        ones = np.add.reduceat(flat_bits, starts, axis=0, dtype=np.int32)
        votes = 2 * ones - n_tok[:, None]
        sim = ((votes > 0).astype(np.uint64) << self._bit_idx[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[n_tok > 0] = sim[n_tok > 0]
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = self._simhash_vectorized(batch.column(self.text_column))
        return batch.append_column("simhash", pa.array(out, type=pa.uint64()))


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def _ngram_set(s: str, n: int = 3) -> set[str]:
    toks = _WORD.findall(s.lower())
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard_sets(ga: set, gb: set) -> float:
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (verification kernel)."""
    return _jaccard_sets(_ngram_set(a, n), _ngram_set(b, n))


# ---------------------------------------------------------------------------
# SimHash near-dup pairs (hamming-block banding)
# ---------------------------------------------------------------------------

# byte-table popcount (numpy 1.26 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hamming distance: byte-view of the xor through
    a 256-entry popcount table, summed per word."""
    x = np.ascontiguousarray(a ^ b).view(np.uint8).reshape(-1, 8)
    return _POP8[x].sum(axis=1, dtype=np.int64)


def explode_simhash_blocks(
    batch: pa.Table,
    num_blocks: int = 4,
    id_column: str = "doc_id",
    hash_column: str = "simhash",
) -> pa.Table:
    """(doc, simhash) -> one row per (block, block_value): Charikar-style
    hamming-block candidate generation. Pigeonhole: two 64-bit hashes
    within hamming distance < num_blocks must agree on at least one of
    the num_blocks equal-width bit blocks, so a groupby on
    (block, block_value) co-locates every pair the verify can accept.
    The 8-byte simhash rides each row so the in-block verify needs no
    second exchange (unlike MinHash, whose verification payload is the
    document text)."""
    h = np.asarray(batch.column(hash_column).combine_chunks() if isinstance(
        batch.column(hash_column), pa.ChunkedArray) else batch.column(hash_column))
    ids = np.asarray(batch.column(id_column), dtype=np.int64)
    width = 64 // num_blocks
    mask = np.uint64((1 << width) - 1)
    vals = np.stack(
        [(h >> np.uint64(b * width)) & mask for b in range(num_blocks)], axis=1
    )
    return pa.table(
        {
            id_column: pa.array(np.repeat(ids, num_blocks), type=pa.int64()),
            "block": pa.array(
                np.tile(np.arange(num_blocks, dtype=np.int32), len(ids)), type=pa.int32()
            ),
            "block_value": pa.array(vals.reshape(-1), type=pa.uint64()),
            hash_column: pa.array(np.repeat(h, num_blocks), type=pa.uint64()),
        }
    )


_SIMHASH_PAIRS_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("dup_of", pa.int64()), ("hamming", pa.int64())]
)


def simhash_block_to_pairs(
    block: pa.Table, max_hamming: int = 3, id_column: str = "doc_id"
) -> pa.Table:
    """Whole-block pair emission + hamming verify for a key-partitioned
    block of (doc_id, block, block_value, simhash) rows: one vectorized
    run-detection pass over ALL buckets in the block (the same
    run-slicing shape as ``lsh_block_to_pairs``), pairing each bucket
    member with the bucket's min id and keeping pairs within
    ``max_hamming`` bits. Verification is local — the simhash rides the
    candidate row — so this single kernel is both candidate generation
    and exact check."""
    if block.num_rows == 0:
        return _SIMHASH_PAIRS_SCHEMA.empty_table()
    order = pc.sort_indices(
        block,
        sort_keys=[
            ("block", "ascending"),
            ("block_value", "ascending"),
            (id_column, "ascending"),
        ],
    )
    b = block.take(order)
    blk = np.asarray(b.column("block"))
    bv = np.asarray(b.column("block_value"))
    ids = np.asarray(b.column(id_column), dtype=np.int64)
    sh = np.asarray(b.column("simhash"))
    new_run = np.r_[True, (blk[1:] != blk[:-1]) | (bv[1:] != bv[:-1])]
    starts = np.flatnonzero(new_run)
    counts = np.diff(np.r_[starts, len(ids)])
    keep = ~new_run
    a_ids = ids[keep]
    a_sh = sh[keep]
    first_ids = np.repeat(ids[starts], counts - 1)
    first_sh = np.repeat(sh[starts], counts - 1)
    d = hamming64(a_sh, first_sh)
    m = d <= max_hamming
    return pa.table(
        {
            "doc_id": pa.array(a_ids[m], type=pa.int64()),
            "dup_of": pa.array(first_ids[m], type=pa.int64()),
            "hamming": pa.array(d[m], type=pa.int64()),
        }
    )


def distinct_pair_rows(block: pa.Table) -> pa.Table:
    """Per-block distinct over (doc_id, dup_of) — run after a keyed
    repartition on the pair so cross-block duplicates (the same pair
    surfacing from several hamming blocks) collapse exactly."""
    if block.num_rows == 0:
        return block
    order = pc.sort_indices(
        block, sort_keys=[("doc_id", "ascending"), ("dup_of", "ascending")]
    )
    b = block.take(order)
    a = np.asarray(b.column("doc_id"))
    c = np.asarray(b.column("dup_of"))
    first = np.r_[True, (a[1:] != a[:-1]) | (c[1:] != c[:-1])]
    return b.filter(pa.array(first))
