"""Independent single-process oracle implementations.

For operators whose semantics a SQL engine cannot express directly
(simhash/fingerprint bit kernels, MinHash+LSH banding, LSH bucketing),
the correctness oracle is a SECOND implementation: straightforward
per-row / single-process Python+numpy with none of the engine's
batch-vectorized or distributed machinery. ``materialize(sf_dir)``
writes each expected result as a parquet file under ``/tmp`` and
returns {query_name: path}; ``__ray_entry__.oracle_sql`` points DuckDB
at those files, so the driver's rows/schema/value-hash comparison runs
against genuinely recomputed values.

No Ray imports anywhere in this module — it must stay an independent
code path.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ORACLE_DIR = "/tmp/graft_oracles"


def _docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _write(name: str, table: pa.Table, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.parquet")
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def oracle_doc_simhash(sf_dir: str) -> pa.Table:
    """Per-row SimHash via the scalar reference kernel; int64 output to
    match the query's unsafe uint64->int64 reinterpret cast."""
    from embulk_input_marketo_ray.stages.dedup import SimHasher

    ids, texts = _docs(sf_dir)
    sh = SimHasher()
    vals = []
    for x in texts:
        v = sh.simhash(x or "")
        vals.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "simhash": pa.array(vals, type=pa.int64())}
    )


def oracle_doc_fingerprint(sf_dir: str) -> pa.Table:
    from embulk_input_marketo_ray.stages.text import Fingerprinter

    ids, texts = _docs(sf_dir)
    fp = Fingerprinter()
    vals = [
        f"{fp._fingerprint((x or '').encode()):016x}" if x is not None else None
        for x in texts
    ]
    return pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()), "fingerprint": pa.array(vals, type=pa.string())}
    )


def _minhash_pairs(sf_dir: str, num_bands: int = 16, threshold: float = 0.5):
    """Single-process MinHash+LSH: per-doc signatures (scalar kernel),
    band-hash dict buckets, min-id pairing, exact Jaccard filter —
    mirrors the distributed pipeline's parameters but none of its code
    paths (no batching, no shuffles, no factorize machinery)."""
    from embulk_input_marketo_ray.stages.dedup import _BAND_MULT, MinHasher, ngram_jaccard

    ids, texts = _docs(sf_dir)
    mh = MinHasher()
    rows_per_band = mh.num_perm // num_bands
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(ids, texts):
        sig = mh.signature(text or "")
        for b in range(num_bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            mult = _BAND_MULT[b * rows_per_band : (b + 1) * rows_per_band]
            h = int((chunk * mult).sum(dtype=np.uint64))
            buckets.setdefault((b, h), []).append(int(doc_id))
    pair_set: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(members)
        for other in ms[1:]:
            pair_set.add((other, ms[0]))
    text_of = dict(zip(ids, texts))
    out = []
    for a, b in sorted(pair_set):
        j = ngram_jaccard(text_of.get(a) or "", text_of.get(b) or "")
        if j >= threshold:
            out.append((a, b, j))
    return out


def oracle_doc_minhash_dup_pairs(sf_dir: str) -> pa.Table:
    out = _minhash_pairs(sf_dir)
    return pa.table(
        {
            "doc_id": pa.array([a for a, _, _ in out], type=pa.int64()),
            "dup_of": pa.array([b for _, b, _ in out], type=pa.int64()),
            "jaccard": pa.array([j for _, _, j in out], type=pa.float64()),
        }
    )


def _union_find_clusters(
    edges: list[tuple[int, int]], id_name: str
) -> pa.Table:
    """Union-find over an edge list -> (id_name, cluster_id) rows for
    every node appearing in an edge; cluster_id = component min."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pa.table(
        {
            id_name: pa.array(nodes, type=pa.int64()),
            "cluster_id": pa.array([find(n) for n in nodes], type=pa.int64()),
        }
    )


def oracle_doc_dup_clusters(sf_dir: str) -> pa.Table:
    """Union-find over the independently recomputed pair set."""
    return _union_find_clusters(
        [(a, b) for a, b, _ in _minhash_pairs(sf_dir)], "doc_id"
    )


def _normalized_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id"))
    x = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    return ids, x


def _lsh_buckets(x: np.ndarray, n_planes: int, n_tables: int):
    from embulk_input_marketo_ray.stages.similarity import _bucket_keys, _hyperplanes

    for t in range(n_tables):
        planes = _hyperplanes(x.shape[1], n_planes, t)
        keys = _bucket_keys(x, planes)
        buckets: dict[int, list[int]] = {}
        for row, k in enumerate(keys):
            buckets.setdefault(int(k), []).append(row)
        yield buckets


def oracle_ann_lsh_topk(
    sf_dir: str, n_queries: int = 3, k: int = 5, n_planes: int = 4, n_tables: int = 16
) -> pa.Table:
    ids, x = _normalized_embeddings(sf_dir)
    row_of = {int(v): i for i, v in enumerate(ids)}
    cands: dict[int, set[int]] = {q: set() for q in range(n_queries)}
    for buckets in _lsh_buckets(x, n_planes, n_tables):
        for members in buckets.values():
            mids = [int(ids[m]) for m in members]
            for q in mids:
                if q < n_queries:
                    cands[q].update(mids)
    out_q, out_n, out_r = [], [], []
    for q in range(n_queries):
        if not cands[q]:
            continue
        nbrs = sorted(cands[q])
        cos = x[[row_of[n] for n in nbrs]] @ x[row_of[q]]
        order = sorted(zip(nbrs, cos), key=lambda t: (-t[1], t[0]))[:k]
        for rank, (n, _) in enumerate(order, start=1):
            out_q.append(q)
            out_n.append(n)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


def oracle_ann_ivf_topk(
    sf_dir: str,
    n_queries: int = 3,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 8,
    train_rows: int = 4096,
    seed: int = 7,
) -> pa.Table:
    """Single-process IVF recompute. The coarse quantizer
    (``kmeans_centroids``) is a driver-side scalar function in both
    paths (reused here like the SimHash scalar kernel); sample =
    first ``train_rows`` rows in file order, exactly as the engine
    reads them."""
    from embulk_input_marketo_ray.stages.similarity import kmeans_centroids

    ids, x = _normalized_embeddings(sf_dir)
    centroids = kmeans_centroids(x[:train_rows], n_centroids, seed=seed)
    assign = np.argmax(x @ centroids.T, axis=1)
    row_of = {int(v): i for i, v in enumerate(ids)}
    out_q, out_n, out_r = [], [], []
    for q in range(n_queries):
        probes = np.argsort(-(x[row_of[q]] @ centroids.T), kind="stable")[:n_probe]
        member = np.isin(assign, probes)
        nbrs = sorted(int(v) for v in ids[member])
        if not nbrs:
            continue
        cos = x[[row_of[n] for n in nbrs]] @ x[row_of[q]]
        order = sorted(zip(nbrs, cos), key=lambda t: (-t[1], t[0]))[:k]
        for rank, (n, _) in enumerate(order, start=1):
            out_q.append(q)
            out_n.append(n)
            out_r.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "neighbor_id": pa.array(out_n, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
        }
    )


def oracle_embedding_near_dup(
    sf_dir: str, threshold: float = 0.45, n_planes: int = 10, n_tables: int = 6
) -> pa.Table:
    ids, x = _normalized_embeddings(sf_dir)
    pair_rows: set[tuple[int, int]] = set()
    for buckets in _lsh_buckets(x, n_planes, n_tables):
        for members in buckets.values():
            if len(members) < 2:
                continue
            mids = sorted(int(ids[m]) for m in members)
            for i in range(len(mids)):
                for j in range(i + 1, len(mids)):
                    pair_rows.add((mids[j], mids[i]))
    row_of = {int(v): i for i, v in enumerate(ids)}
    keep = [
        (a, b)
        for a, b in sorted(pair_rows)
        if float(x[row_of[a]] @ x[row_of[b]]) >= threshold
    ]
    return pa.table(
        {
            "vec_id": pa.array([a for a, _ in keep], type=pa.int64()),
            "dup_of": pa.array([b for _, b in keep], type=pa.int64()),
        }
    )


def oracle_embedding_dup_clusters(sf_dir: str) -> pa.Table:
    """Union-find over the independently recomputed cosine-LSH pair
    set (semantic-dedup cluster resolution)."""
    t = oracle_embedding_near_dup(sf_dir)
    edges = list(zip(t.column("vec_id").to_pylist(), t.column("dup_of").to_pylist()))
    return _union_find_clusters(edges, "vec_id")


def oracle_multimodal(sf_dir: str, n: int = 256) -> pa.Table:
    """The multimodal pipeline's observable output (media_id,
    media_type, decode_ok) recomputed from the deterministic synth
    rule; decode_ok is payload-validity (the stub decode succeeds on
    every non-null payload)."""
    from embulk_input_marketo_ray.stages.multimodal import synth_media_table

    t = synth_media_table(n)
    payload = t.column("payload")
    ok = pa.array([v.is_valid for v in payload.combine_chunks()], type=pa.bool_())
    return pa.table(
        {
            "media_id": t.column("media_id"),
            "media_type": t.column("media_type"),
            "decode_ok": ok,
        }
    )


_ORACLE_BUILDERS = {
    "doc_simhash": oracle_doc_simhash,
    "doc_fingerprint": oracle_doc_fingerprint,
    "doc_minhash_dup_pairs": oracle_doc_minhash_dup_pairs,
    "doc_dup_clusters": oracle_doc_dup_clusters,
    "ann_lsh_topk": oracle_ann_lsh_topk,
    "ann_ivf_topk": oracle_ann_ivf_topk,
    "embedding_near_dup": oracle_embedding_near_dup,
    "embedding_dup_clusters": oracle_embedding_dup_clusters,
    "multimodal_pipeline": oracle_multimodal,
}


def materialize(sf_dir: str, out_dir: str | None = None) -> dict[str, str]:
    """Write every parquet oracle for ``sf_dir``; returns name->path.
    Idempotent (atomic replace); cheap at correctness scale (500 docs)."""
    tag = sf_dir.strip("/").replace("/", "_")
    out_dir = out_dir or os.path.join(ORACLE_DIR, tag)
    return {name: _write(name, fn(sf_dir), out_dir) for name, fn in _ORACLE_BUILDERS.items()}
