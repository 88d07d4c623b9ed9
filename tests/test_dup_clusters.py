"""Connected-component resolution of near-dup candidate pairs."""

import ray.data
import pytest

from embulk_input_marketo_ray.stages.dedup import resolve_dup_clusters


def _pairs(rows):
    return ray.data.from_items([{"doc_id": a, "dup_of": b} for a, b in rows])


def test_union_find_transitive_chain():
    # 1-2, 2-3, 3-4 form one component; 10-11 another
    out = resolve_dup_clusters(_pairs([(2, 1), (3, 2), (4, 3), (11, 10)]))
    got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_cluster_id_is_component_min():
    out = resolve_dup_clusters(_pairs([(9, 7), (7, 5), (20, 9)]))
    got = {r["doc_id"]: r["cluster_id"] for r in out.take_all()}
    assert set(got.values()) == {5}


def test_distributed_propagation_path_matches_union_find():
    rows = [(2, 1), (3, 2), (4, 3), (11, 10), (12, 11), (30, 4)]
    exact = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_dup_clusters(_pairs(rows)).take_all()
    }
    prop = {
        r["doc_id"]: r["cluster_id"]
        for r in resolve_dup_clusters(_pairs(rows), driver_pair_limit=0).take_all()
    }
    assert exact == prop
    assert exact[30] == 1  # deep chain resolves to global min


def test_propagation_warns_when_max_rounds_insufficient():
    # path graph 1-2-...-12: diameter 11; labels move one hop per round,
    # so the far end can't reach the global min in 2 rounds and the
    # label sum is still decreasing when the round budget runs out
    rows = [(i + 1, i) for i in range(1, 12)]
    with pytest.warns(RuntimeWarning, match="did not converge"):
        out = resolve_dup_clusters(_pairs(rows), driver_pair_limit=0, max_rounds=2)
        out.materialize()
    # and with enough rounds the same graph converges silently
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in resolve_dup_clusters(
                _pairs(rows), driver_pair_limit=0, max_rounds=16
            ).take_all()
        }
    assert set(got.values()) == {1}
