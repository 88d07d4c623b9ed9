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
