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


def resolve_dup_clusters(pairs: "object", driver_pair_limit: int = 2_000_000) -> "object":
    """Candidate near-dup pairs -> connected components.

    Input dataset columns ``(doc_id, dup_of)``; output ``(doc_id,
    cluster_id)`` for every node appearing in a pair, ``cluster_id`` =
    min doc_id of the component.

    Two paths, per the standard trade-off:

    - pair set provably small (``count() <= driver_pair_limit``, the
      normal case — near-dup edges are sparse relative to the corpus):
      exact union-find on the driver, O(E a(E));
    - larger: iterative min-label propagation, each round one
      distributed pass over the (distributed) edge list against a
      broadcast label dict (labels = one row per DUP NODE, orders of
      magnitude smaller than the corpus; assumption documented here).
    """
    import ray
    import ray.data

    n_pairs = pairs.count()
    edge_rows = None
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

    # distributed propagation path
    labels: dict[int, int] = {}
    for r in pairs.iter_rows():
        a, b = int(r["doc_id"]), int(r["dup_of"])
        labels[a] = min(labels.get(a, a), b, a)
        labels[b] = min(labels.get(b, b), a, b)
    for _ in range(16):
        ref = ray.put(labels)

        def propagate(batch: pa.Table) -> pa.Table:
            lab = ray.get(ref)
            out_n, out_l = [], []
            for a, b in zip(batch.column("doc_id").to_pylist(), batch.column("dup_of").to_pylist()):
                la, lb = lab.get(a, a), lab.get(b, b)
                m = min(la, lb, lab.get(la, la), lab.get(lb, lb))
                if m < la:
                    out_n.append(a)
                    out_l.append(m)
                if m < lb:
                    out_n.append(b)
                    out_l.append(m)
            return pa.table(
                {"node": pa.array(out_n, type=pa.int64()), "label": pa.array(out_l, type=pa.int64())}
            )

        updates = pairs.map_batches(propagate, batch_format="pyarrow")
        changed = False
        for r in updates.iter_rows():
            if r["label"] < labels.get(r["node"], r["node"]):
                labels[r["node"]] = r["label"]
                changed = True
        if not changed:
            break
    return ray.data.from_items(
        [{"doc_id": k, "cluster_id": v} for k, v in sorted(labels.items())]
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
        # bit matrix of UNIQUE token hashes only: (n_uniq, 64)
        ubits = ((uniq_hash[:, None] >> self._bit_idx[None, :]) & np.uint64(1)).astype(np.int32)

        keep_idx = np.flatnonzero(nonempty)
        kept_codes = codes[keep_idx]
        new_offsets = np.searchsorted(keep_idx, offsets)
        n_tok = np.diff(new_offsets)

        out = np.zeros(n_docs, dtype=np.uint64)
        if len(kept_codes) == 0:
            return out
        flat_bits = ubits[kept_codes]  # (n_flat, 64) int32
        # reduceat needs strictly valid start indices; empty docs repeat
        # a boundary -> their "sum" is one spurious row, masked out below
        starts = np.minimum(new_offsets[:-1], len(kept_codes) - 1)
        ones = np.add.reduceat(flat_bits, starts, axis=0)  # (n_docs, 64)
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


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity (verification kernel)."""
    def grams(s: str) -> set[str]:
        toks = _WORD.findall(s.lower())
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(a), grams(b)
    if not ga and not gb:
        return 1.0
    inter = len(ga & gb)
    return inter / (len(ga) + len(gb) - inter)
