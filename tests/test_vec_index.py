"""Persisted IVF vector index: ingest replay, frozen-quantizer
contract, crash invisibility, parameter guard. Result correctness vs
the sequential oracle is covered in test_entry.py
(`ann_incremental_topk`)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from embulk_input_marketo_ray.stages.vec_index import (
    _load_manifest,
    ann_topk_index,
    ingest_vectors,
    init_vec_index,
)


def _vecs_ds(ids, mat):
    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    flat = pa.array(np.asarray(mat, dtype=np.float64).reshape(-1), type=pa.float64())
    return ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(flat, mat.shape[1]),
            }
        )
    )


def _rand(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, dim))


def test_ingest_then_query_finds_exact_neighbor(ray_session, tmp_path):
    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=4)
    mat = _rand(64)
    ingest_vectors(idx, _vecs_ds(np.arange(64), mat), "w1")

    # a second wave contains an exact copy of vector 3 as id 100: the
    # query for vector 3 must rank {3, 100} as the top-2 (cos = 1.0)
    mat2 = _rand(8, seed=1)
    mat2[0] = mat[3]
    ingest_vectors(idx, _vecs_ds(np.arange(100, 108), mat2), "w2")

    q = pa.table(
        {
            "vec_id": pa.array([3], type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat[3], type=pa.float64()), mat.shape[1]
            ),
        }
    )
    res = ann_topk_index(idx, q, k=3, n_probe=2)
    top2 = {r["neighbor_id"] for r in res.to_pylist() if r["rank"] <= 2}
    assert top2 == {3, 100}


def test_quantizer_frozen_and_replay(ray_session, tmp_path):
    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=4)
    r1 = ingest_vectors(idx, _vecs_ds(np.arange(32), _rand(32)), "w1")
    cent_before = pq.read_table(os.path.join(idx, "centroids.parquet"))

    # second ingest must NOT retrain (frozen quantizer)
    ingest_vectors(idx, _vecs_ds(np.arange(100, 132), _rand(32, seed=9)), "w2")
    cent_after = pq.read_table(os.path.join(idx, "centroids.parquet"))
    assert cent_before.equals(cent_after)

    # committed ingest_id replays its summary, manifest unchanged
    state = _load_manifest(idx)
    r1b = ingest_vectors(idx, _vecs_ds(np.arange(500, 510), _rand(10)), "w1")
    assert r1b == r1
    assert _load_manifest(idx) == state


def test_vec_param_mismatch_and_untrained_query(ray_session, tmp_path):
    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=4)
    init_vec_index(idx, n_centroids=4)  # idempotent
    try:
        init_vec_index(idx, n_centroids=8)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not comparable" in str(e)

    q = pa.table(
        {
            "vec_id": pa.array([0], type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(np.zeros(8), type=pa.float64()), 8
            ),
        }
    )
    try:
        ann_topk_index(idx, q)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "no committed ingest" in str(e)


def test_vec_compact_vacuum_and_crash_retry(ray_session, tmp_path):
    """Compaction folds per-ingest cluster files into one base each;
    queries identical before/after + after vacuum; a crashed ingest
    (files written, manifest rolled back) retried under the same id
    converges to the never-crashed state."""
    import glob

    from embulk_input_marketo_ray.stages import vec_index as vi
    from embulk_input_marketo_ray.stages.vec_index import (
        compact_vec_index,
        vacuum_vec_index,
    )

    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=4)
    mat = _rand(64)
    ingest_vectors(idx, _vecs_ds(np.arange(64), mat), "w1")
    ingest_vectors(idx, _vecs_ds(np.arange(100, 132), _rand(32, seed=3)), "w2")

    q = pa.table(
        {
            "vec_id": pa.array([5], type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat[5], type=pa.float64()), mat.shape[1]
            ),
        }
    )
    before = ann_topk_index(idx, q, k=5, n_probe=2).to_pylist()

    bases = compact_vec_index(idx)
    assert bases
    assert vacuum_vec_index(idx) == []  # grace window skips fresh files
    removed = vacuum_vec_index(idx, grace_seconds=0.0)
    assert removed and not any("base-1" in p for p in removed)
    after = ann_topk_index(idx, q, k=5, n_probe=2).to_pylist()
    assert after == before
    assert vacuum_vec_index(idx, grace_seconds=0.0) == []

    # crash-retry convergence (vs a reference index that never crashed)
    idx_a, idx_b = str(tmp_path / "a"), str(tmp_path / "b")
    for d in (idx_a, idx_b):
        init_vec_index(d, n_centroids=4)
    ingest_vectors(idx_a, _vecs_ds(np.arange(32), mat[:32]), "w1")
    state0 = vi._load_manifest(idx_b)
    # run, then roll the manifest back = "crash before commit"
    ingest_vectors(idx_b, _vecs_ds(np.arange(32), mat[:32]), "w1")
    vi._write_manifest(idx_b, {**state0, "trained": False, "ingests": {}})
    r = ingest_vectors(idx_b, _vecs_ds(np.arange(32), mat[:32]), "w1")
    assert r == vi._load_manifest(idx_a)["ingests"]["w1"]
    files_a = sorted(
        os.path.relpath(p, idx_a) for p in glob.glob(f"{idx_a}/vectors/*/*.parquet")
    )
    files_b = sorted(
        os.path.relpath(p, idx_b) for p in glob.glob(f"{idx_b}/vectors/*/*.parquet")
    )
    assert files_a == files_b


# ---------------------------------------------------------------------------
# tombstone deletes
# ---------------------------------------------------------------------------


def test_vec_delete_excludes_from_queries_and_folds(ray_session, tmp_path):
    """A deleted vector never returns as a neighbor; compaction folds
    the tombstone into the bases (zero live tombstones, same results)
    and vacuum reclaims the folded tombstone file."""
    import numpy as np
    import pyarrow as pa

    from embulk_input_marketo_ray.stages.vec_index import (
        _load_manifest,
        _vec_tombstone_entries,
        ann_topk_index,
        compact_vec_index,
        delete_vectors,
        ingest_vectors,
        init_vec_index,
        vacuum_vec_index,
    )

    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=2, train_rows=64)
    rng = np.random.default_rng(5)
    n, dim = 64, 8
    x = rng.standard_normal((n, dim)).astype(np.float32)
    x[1] = x[0]  # vec 1 is identical to vec 0 -> its top neighbor
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row.tolist() for row in x], type=pa.list_(pa.float32())),
        }
    )
    ingest_vectors(idx, _vecs_ds(np.arange(n, dtype=np.int64), x), "w1")
    q = t.slice(0, 1)  # query with vec 0
    r = ann_topk_index(idx, q, k=2, n_probe=2)
    nbrs = r.column("neighbor_id").to_pylist()
    assert nbrs[0] == 0 and 1 in nbrs  # self + identical twin

    delete_vectors(idx, [1], "d1")
    r2 = ann_topk_index(idx, q, k=2, n_probe=2)
    assert 1 not in r2.column("neighbor_id").to_pylist()

    compact_vec_index(idx)
    state = _load_manifest(idx)
    assert state["deletes"]["d1"]["folded"] is True
    assert len(_vec_tombstone_entries(state, idx)[0]) == 0
    r3 = ann_topk_index(idx, q, k=2, n_probe=2)
    assert r3.equals(r2)
    removed = vacuum_vec_index(idx, grace_seconds=0)
    assert any("d1.parquet" in p for p in removed)


def test_vec_readmit_after_delete_is_live_and_survives_compaction(
    ray_session, tmp_path
):
    """Seq-scoped tombstones: a vec_id re-ingested AFTER its delete is
    scored again (only its pre-delete rows are dead) and its rows
    survive compaction's fold."""
    import numpy as np
    import pyarrow as pa

    from embulk_input_marketo_ray.stages.vec_index import (
        _load_manifest,
        ann_topk_index,
        compact_vec_index,
        delete_vectors,
        ingest_vectors,
        init_vec_index,
        vacuum_vec_index,
    )

    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=2, train_rows=64)
    rng = np.random.default_rng(11)
    n, dim = 64, 8
    x = rng.standard_normal((n, dim)).astype(np.float64)
    x[1] = x[0]  # vec 1 identical to vec 0
    ingest_vectors(idx, _vecs_ds(np.arange(n, dtype=np.int64), x), "w1")
    q = pa.table(
        {
            "vec_id": pa.array([0], type=pa.int64()),
            "embedding": pa.array([x[0].tolist()], type=pa.list_(pa.float64())),
        }
    )
    delete_vectors(idx, [1], "d1")
    assert 1 not in ann_topk_index(idx, q, k=2, n_probe=2).column(
        "neighbor_id"
    ).to_pylist()

    # re-arrival of the deleted id: its new rows are live immediately
    ingest_vectors(idx, _vecs_ds(np.array([1]), x[1:2]), "w2")
    r = ann_topk_index(idx, q, k=2, n_probe=2)
    assert 1 in r.column("neighbor_id").to_pylist()

    # and survive the fold (the delete only scopes to w1's rows)
    compact_vec_index(idx)
    vacuum_vec_index(idx, grace_seconds=0)
    state = _load_manifest(idx)
    assert state["deletes"]["d1"]["folded"] is True
    r2 = ann_topk_index(idx, q, k=2, n_probe=2)
    assert 1 in r2.column("neighbor_id").to_pylist()


def test_randomized_vec_lifecycle_matches_bruteforce(ray_session, tmp_path):
    """Model-based check of the IVF index state machine: a seeded
    random schedule of {ingest, delete, re-ingest, compact, vacuum}
    against a brute-force reference over the LIVE vector set. Queries
    restrict to vectors in the probed clusters (IVF semantics), so the
    reference scores exactly the live members of those clusters —
    pinning seq-scoped deletes and re-admits through maintenance."""
    import numpy as np
    import pyarrow as pa

    from embulk_input_marketo_ray.stages.vec_index import (
        _load_centroids,
        ann_topk_index,
        compact_vec_index,
        delete_vectors,
        ingest_vectors,
        init_vec_index,
        vacuum_vec_index,
    )

    rng = np.random.default_rng(23)
    n, dim = 96, 8
    x = rng.standard_normal((n, dim))
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)

    idx = str(tmp_path / "vidx")
    init_vec_index(idx, n_centroids=4, train_rows=48)

    first = list(range(48))
    ingest_vectors(idx, _vecs_ds(np.array(first), x[first]), "w0")
    live = set(first)
    remaining = set(range(48, n))
    deleted = set()

    centroids = _load_centroids(idx)
    assign = np.argmax(x @ centroids.T, axis=1)

    def check(k=4, n_probe=2):
        qi = int(rng.integers(0, n))
        q = pa.table(
            {
                "vec_id": pa.array([qi], type=pa.int64()),
                "embedding": pa.array([x[qi].tolist()], type=pa.list_(pa.float64())),
            }
        )
        got = ann_topk_index(idx, q, k=k, n_probe=n_probe)
        probe = np.argsort(-(x[qi] @ centroids.T), kind="stable")[:n_probe]
        cands = sorted(
            i for i in live if assign[i] in set(int(c) for c in probe)
        )
        if not cands:
            assert got.num_rows == 0
            return
        cos = np.array([x[qi] @ x[i] for i in cands])
        order = sorted(range(len(cands)), key=lambda j: (-cos[j], cands[j]))[:k]
        want = [cands[j] for j in order]
        assert got.column("neighbor_id").to_pylist() == want, (qi, want)

    for wave in range(1, 6):
        check()
        pool = sorted(remaining | deleted)
        if pool:
            take = sorted(
                int(v)
                for v in rng.choice(pool, size=min(len(pool), 12), replace=False)
            )
            ingest_vectors(idx, _vecs_ds(np.array(take), x[take]), f"w{wave}")
            live |= set(take)
            remaining -= set(take)
            deleted -= set(take)
        if live and rng.random() < 0.8:
            kill = sorted(
                int(v)
                for v in rng.choice(sorted(live), size=min(len(live), 5), replace=False)
            )
            delete_vectors(idx, kill, f"d{wave}")
            live -= set(kill)
            deleted |= set(kill)
        if rng.random() < 0.5:
            compact_vec_index(idx)
        if rng.random() < 0.5:
            vacuum_vec_index(idx, grace_seconds=0)
        check()
