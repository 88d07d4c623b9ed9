"""Force the DISTRIBUTED keyed-exchange path on test-scale inputs.

``queries._keyed_repartition`` collapses inputs under
``SMALL_INPUT_BYTES`` to a single block, so at sf0.001/0.01 the oracle
tests in test_entry.py only ever exercise the one-block path. This
module pins the threshold to 0 so the same queries run through the
real keyed hash exchange (partial combine -> hash repartition ->
in-block merge) and re-checks them against DuckDB — the regression
guard for the 100 TB path.
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from embulk_input_marketo_ray.pipelines import queries as Q

from test_entry import SF_DIR, TABLES, canon, to_df

# queries whose plans contain a keyed exchange / grouped aggregate
EXCHANGE_QUERIES = [
    "lww_latest",
    "dedup_first",
    "incremental_counts",
    "enrich_join",
    "distinct_values",
    "doc_dedup_exact",
    "session_windows",
    "ann_topk",
    "doc_minhash_dup_pairs",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.fixture(autouse=True)
def force_distributed(monkeypatch):
    monkeypatch.setattr(Q, "SMALL_INPUT_BYTES", 0)


@pytest.mark.parametrize("name", EXCHANGE_QUERIES)
def test_distributed_matches_oracle(con, name):
    got = canon(to_df(entry_mod.queries()[name](SF_DIR)))
    exp = canon(con.execute(entry_mod.oracle_sql()[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs oracle {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


# the ANN / near-dup plans (tagged-union embedding attach + grouped
# top-k) have recompute oracles instead of SQL; same forced-distributed
# re-check for them
@pytest.mark.parametrize(
    "name, oracle_name",
    [
        ("ann_ivf_topk", "oracle_ann_ivf_topk"),
        ("ann_lsh_topk", "oracle_ann_lsh_topk"),
        ("embedding_near_dup", "oracle_embedding_near_dup"),
    ],
)
def test_distributed_matches_recompute(name, oracle_name):
    from embulk_input_marketo_ray.pipelines import oracles

    got = canon(to_df(entry_mod.queries()[name](SF_DIR)))
    exp = canon(getattr(oracles, oracle_name)(SF_DIR).to_pandas())
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs oracle {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_frag_scratch_guard_on_multi_node(ray_session, monkeypatch):
    """With >1 alive Ray node and no GRAFT_FRAG_DIR, the fragment
    exchange must fail fast (node-local /dev/shm scratch would lose
    phase-A fragments); a shared GRAFT_FRAG_DIR passes through."""
    import pytest
    import ray as ray_mod

    from embulk_input_marketo_ray.pipelines import queries as q

    monkeypatch.delenv("GRAFT_FRAG_DIR", raising=False)
    monkeypatch.setattr(
        ray_mod, "nodes", lambda: [{"Alive": True}, {"Alive": True}]
    )
    assert q._multi_node_cluster() is True
    with pytest.raises(RuntimeError, match="GRAFT_FRAG_DIR"):
        q._frag_scratch_root()
    monkeypatch.setenv("GRAFT_FRAG_DIR", "/tmp/shared_scratch")
    assert q._frag_scratch_root() == "/tmp/shared_scratch"

    # single node (or a dead second node): the local default is fine
    monkeypatch.delenv("GRAFT_FRAG_DIR", raising=False)
    monkeypatch.setattr(
        ray_mod, "nodes", lambda: [{"Alive": True}, {"Alive": False}]
    )
    assert q._multi_node_cluster() is False
    assert q._frag_scratch_root()
