"""Property-based tests (hypothesis) for the core kernels.

The reference has no randomized testing (SURVEY.md §5); these go
beyond it: the LWW merge is checked against an independent pandas
oracle on arbitrary event multisets, the slicer invariants on
arbitrary windows, and the CSV tokenizer on round-tripped payloads.
"""

from datetime import datetime, timedelta

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from embulk_input_marketo_ray.sources.csv_source import QuotesPolicy, records_to_table
from embulk_input_marketo_ray.stages.lww import lww_merge
from embulk_input_marketo_ray.state.watermark import slice_range

D0 = datetime(2020, 1, 1)


@settings(max_examples=60, deadline=None)
@given(
    span_s=st.integers(min_value=0, max_value=200 * 86400),
    max_days=st.integers(min_value=1, max_value=40),
)
def test_slice_range_invariants(span_s, max_days):
    end = D0 + timedelta(seconds=span_s)
    slices = slice_range(D0, end, timedelta(days=max_days))
    # full coverage: starts at from, ends at to
    assert slices[0].from_ts == D0
    assert slices[-1].to_ts == end
    for s in slices:
        assert s.from_ts <= s.to_ts
        assert s.to_ts - s.from_ts <= timedelta(days=max_days)
    # +1 s non-overlap, no gaps beyond the 1 s step
    for a, b in zip(slices, slices[1:]):
        assert b.from_ts == a.to_ts + timedelta(seconds=1)


# op is a deterministic function of (key, seq): duplicated seqs model
# REPLAYED events, which are byte-identical in real CDC — mixed-op ties
# would make any tie-break convention arbitrary.
def _op_of(repo: str, path: str, seq: int) -> str:
    return "delete" if (hash((repo, path, seq)) & 3) == 0 else "upsert"


events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["r1", "r2", "r3"]),
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=50),  # commit_seq (dups allowed)
    ),
    min_size=0,
    max_size=60,
).map(lambda evs: [(r, p, s, _op_of(r, p, s)) for r, p, s in evs])


@settings(max_examples=80, deadline=None)
@given(events=events_strategy)
def test_lww_merge_matches_pandas_oracle(events):
    table = pa.table(
        {
            "repo": pa.array([e[0] for e in events], type=pa.string()),
            "path": pa.array([e[1] for e in events], type=pa.string()),
            "commit_seq": pa.array([e[2] for e in events], type=pa.int64()),
            "op": pa.array([e[3] for e in events], type=pa.string()),
        }
    )
    got = lww_merge(table)
    got_keys = {
        (r["repo"], r["path"]): r["commit_seq"] for r in got.to_pylist()
    }

    if events:
        df = pd.DataFrame(events, columns=["repo", "path", "commit_seq", "op"])
        # oracle: max seq per key; key survives iff SOME row at that max
        # seq is an upsert and the engine's stable keep-last picked it —
        # with seq ties of mixed ops the engine keeps the later input
        # row, so emulate with stable sort + keep last
        df = df.sort_values("commit_seq", kind="stable").drop_duplicates(
            ["repo", "path"], keep="last"
        )
        df = df[df.op == "upsert"]
        exp_keys = {
            (r.repo, r.path): r.commit_seq for r in df.itertuples()
        }
    else:
        exp_keys = {}
    assert got_keys == exp_keys


@settings(max_examples=80, deadline=None)
@given(events=events_strategy)
def test_lww_merge_idempotent_and_order_insensitive(events):
    table = pa.table(
        {
            "repo": pa.array([e[0] for e in events], type=pa.string()),
            "path": pa.array([e[1] for e in events], type=pa.string()),
            "commit_seq": pa.array([e[2] for e in events], type=pa.int64()),
            "op": pa.array([e[3] for e in events], type=pa.string()),
        }
    )
    once = lww_merge(table)
    twice = lww_merge(once)
    assert sorted(once.to_pylist(), key=str) == sorted(twice.to_pylist(), key=str)


csv_cell = st.text(
    alphabet=st.characters(blacklist_characters='",\r\n', blacklist_categories=("Cs",)),
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(st.tuples(csv_cell, csv_cell), min_size=1, max_size=8),
)
def test_csv_quoted_roundtrip(rows):
    """Any cell content survives a quote-everything CSV encoding."""

    def enc(v: str) -> str:
        return '"' + v.replace('"', '""') + '"'

    payload = "h1,h2\n" + "\n".join(f"{enc(a)},{enc(b)}" for a, b in rows) + "\n"
    t = records_to_table(payload, policy=QuotesPolicy.ACCEPT_ONLY_RFC4180_ESCAPED)
    # quoted values never null-normalize; "null" literal stays only unquoted
    got = list(zip(t.column("h1").to_pylist(), t.column("h2").to_pylist()))
    exp = [(a, b) for a, b in rows]
    assert got == exp


# ---------------------------------------------------------------------------
# vectorized within-run pair kernels (stages/similarity) vs brute force
# ---------------------------------------------------------------------------


def _brute_pairs(tables, buckets, ids):
    """Per-group np.triu reference for block_id_pairs."""
    from collections import defaultdict

    groups = defaultdict(list)
    for t, b, i in zip(tables, buckets, ids):
        groups[(t, b)].append(i)
    out = set()
    for members in groups.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                out.add((max(ms[x], ms[y]), min(ms[x], ms[y])))
    return out


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),  # lsh_table
            st.integers(min_value=0, max_value=4),  # lsh_bucket
        ),
        min_size=0,
        max_size=60,
    ),
)
def test_block_id_pairs_matches_brute_force(rows):
    """The run-slicing pair kernel emits exactly the per-group triu set
    (ids unique per (table, bucket), as the LSH explode guarantees)."""
    import numpy as np
    import pyarrow as pa

    from embulk_input_marketo_ray.stages.similarity import _int64_col, _sorted_runs

    # assign each row a unique id per (table,bucket) by construction
    seen = {}
    ids = []
    for t, b in rows:
        k = (t, b)
        seen[k] = seen.get(k, 0) + 1
        ids.append(len(ids))  # globally unique ids
    block = pa.table(
        {
            "lsh_table": pa.array([t for t, _ in rows], type=pa.int32()),
            "lsh_bucket": pa.array([b for _, b in rows], type=pa.int64()),
            "vec_id": pa.array(ids, type=pa.int64()),
        }
    )
    if block.num_rows == 0:
        return
    blk, starts, ends = _sorted_runs(block, ["lsh_table", "lsh_bucket"])
    vid = _int64_col(blk, "vec_id")
    n = blk.num_rows
    sizes = ends - starts
    loc = np.arange(n) - np.repeat(starts, sizes)
    total = int(loc.sum())
    got = set()
    if total:
        out_starts = np.cumsum(loc) - loc
        g = np.arange(n)
        jj = np.repeat(g, loc)
        ii = np.arange(total) - np.repeat(out_starts, loc) + np.repeat(g - loc, loc)
        a, b = vid[ii], vid[jj]
        got = set(zip(np.maximum(a, b).tolist(), np.minimum(a, b).tolist()))
    exp = _brute_pairs([t for t, _ in rows], [b for _, b in rows], ids)
    assert got == exp


@settings(max_examples=40, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=200))
def test_doc_split_hash_matches_sql_rule(ids):
    """The numpy multiplicative-hash split equals the SQL HUGEINT rule
    (exact integer arithmetic) for any non-negative doc_id."""
    import numpy as np

    from embulk_input_marketo_ray.pipelines.queries import (
        SPLIT_HASH_MOD,
        SPLIT_HASH_MULT,
        SPLIT_TRAIN_CUT,
        SPLIT_VAL_CUT,
    )

    arr = np.asarray(ids, dtype=np.uint64)
    h = ((arr % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD
    for i, doc_id in enumerate(ids):
        h_ref = ((doc_id % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD  # python bigint
        assert int(h[i]) == h_ref
        split = "train" if h_ref < SPLIT_TRAIN_CUT else ("val" if h_ref < SPLIT_VAL_CUT else "test")
        assert split in ("train", "val", "test")


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=4),
        ),
        min_size=0,
        max_size=60,
    ),
    n_queries=st.integers(min_value=0, max_value=6),
)
def test_block_candidates_matches_brute_force(rows, n_queries):
    """The ANN candidate kernel emits exactly query x bucket-members
    (self included) for every bucket containing a query id."""
    from collections import defaultdict

    import numpy as np
    import pyarrow as pa

    from embulk_input_marketo_ray.stages.similarity import _int64_col, _sorted_runs

    ids = list(range(len(rows)))
    block = pa.table(
        {
            "lsh_table": pa.array([t for t, _ in rows], type=pa.int32()),
            "lsh_bucket": pa.array([b for _, b in rows], type=pa.int64()),
            "vec_id": pa.array(ids, type=pa.int64()),
        }
    )
    if block.num_rows == 0:
        return
    blk, starts, ends = _sorted_runs(block, ["lsh_table", "lsh_bucket"])
    vid = _int64_col(blk, "vec_id")
    qpos = np.flatnonzero(vid < n_queries)
    got = set()
    if len(qpos):
        sizes = ends - starts
        run_of_q = np.searchsorted(starts, qpos, side="right") - 1
        counts = sizes[run_of_q]
        total = int(counts.sum())
        out_starts = np.cumsum(counts) - counts
        jj = (
            np.arange(total)
            - np.repeat(out_starts, counts)
            + np.repeat(starts[run_of_q], counts)
        )
        got = set(zip(np.repeat(vid[qpos], counts).tolist(), vid[jj].tolist()))
    groups = defaultdict(list)
    for (t, b), i in zip(rows, ids):
        groups[(t, b)].append(i)
    exp = set()
    for members in groups.values():
        for q in members:
            if q < n_queries:
                for m in members:
                    exp.add((q, m))
    assert got == exp


@given(
    hashes=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=80),
    max_h=st.integers(min_value=0, max_value=8),
)
@settings(max_examples=60, deadline=None)
def test_simhash_block_pairs_match_brute_force(hashes, max_h):
    """The fused run-slicing candidate+hamming kernel equals the naive
    per-bucket dict construction: same pair set, same distances."""
    import pyarrow as pa

    from embulk_input_marketo_ray.stages.dedup import (
        explode_simhash_blocks,
        simhash_block_to_pairs,
    )

    ids = list(range(len(hashes)))
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(hashes, type=pa.uint64()),
        }
    )
    got = {
        (r["doc_id"], r["dup_of"]): r["hamming"]
        for r in simhash_block_to_pairs(
            explode_simhash_blocks(t), max_hamming=max_h
        ).to_pylist()
    }

    buckets = {}
    for i, h in zip(ids, hashes):
        for b in range(4):
            buckets.setdefault((b, (h >> (b * 16)) & 0xFFFF), []).append(i)
    want = {}
    for ms in buckets.values():
        if len(ms) < 2:
            continue
        ms = sorted(ms)
        for o in ms[1:]:
            d = bin(hashes[o] ^ hashes[ms[0]]).count("1")
            if d <= max_h:
                want[(o, ms[0])] = d
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["r0", "r1", "r2"]),       # repo
            st.integers(min_value=0, max_value=4),      # window
            st.sampled_from(["a", "b", "c", "d", "e"]), # path
        ),
        min_size=0,
        max_size=60,
    ),
    min_support=st.integers(min_value=1, max_value=3),
)
def test_co_change_pair_kernel_matches_brute_force(rows, min_support):
    """The run-slice + np.triu pair kernel of q_co_change_pairs equals
    the O(n^2) itertools brute force on arbitrary (repo, win, path)
    multisets (duplicates collapse first, pairs ordered path_a<path_b,
    support counted across windows)."""
    from collections import Counter
    from itertools import combinations

    import numpy as np
    import pyarrow.compute as pc

    # brute force
    distinct = sorted(set(rows))
    by_group: dict = {}
    for repo, win, path in distinct:
        by_group.setdefault((repo, win), set()).add(path)
    want = Counter()
    for (repo, _win), paths in by_group.items():
        for a, b in combinations(sorted(paths), 2):
            want[(repo, a, b)] += 1
    want = {k: n for k, n in want.items() if n >= min_support}

    # engine kernel (same code shape as q_co_change_pairs.pairs)
    block = pa.table(
        {
            "repo": pa.array([r for r, _, _ in rows], type=pa.string()),
            "win": pa.array([w for _, w, _ in rows], type=pa.int64()),
            "path": pa.array([p for _, _, p in rows], type=pa.string()),
        }
    )
    d = block.group_by(["repo", "win", "path"]).aggregate([])
    if d.num_rows == 0:
        assert want == {}
        return
    order = pc.sort_indices(
        d,
        sort_keys=[("repo", "ascending"), ("win", "ascending"), ("path", "ascending")],
    )
    t = d.take(order)
    repo = np.asarray(t.column("repo"), dtype=object)
    win = np.asarray(t.column("win"), dtype=np.int64)
    path = np.asarray(t.column("path"), dtype=object)
    starts = np.flatnonzero(np.r_[True, (repo[1:] != repo[:-1]) | (win[1:] != win[:-1])])
    ends = np.r_[starts[1:], len(repo)]
    got = Counter()
    for s, e in zip(starts, ends):
        g = e - s
        if g < 2:
            continue
        i, j = np.triu_indices(g, k=1)
        for a, b in zip(path[s:e][i], path[s:e][j]):
            got[(repo[s], a, b)] += 1
    got = {k: n for k, n in got.items() if n >= min_support}
    assert got == want


@settings(max_examples=40, deadline=None)
@given(
    keys=st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=300, unique=True)
)
def test_bloom_never_false_negative(keys):
    """Decontamination exactness depends on the bloom prefilter having
    NO false negatives: every inserted key must probe true, for
    arbitrary unicode keys and a small table (high collision rate)."""
    import numpy as np

    from embulk_input_marketo_ray.stages.text import (
        bloom_fold,
        bloom_positions,
        bloom_probe,
    )

    m_bits = 1 << 10  # deliberately tiny: collisions guaranteed
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    arr = pa.array(keys, type=pa.string())
    bloom_fold(bits, bloom_positions(arr, m_bits))
    assert bloom_probe(bits, bloom_positions(arr, m_bits)).all()


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # band
            st.integers(min_value=0, max_value=5),    # band_hash
            st.integers(min_value=0, max_value=1),    # side (0=old, 1=new)
            st.integers(min_value=0, max_value=40),   # doc_id
        ),
        min_size=0,
        max_size=120,
    )
)
def test_sig_index_pair_kernel_matches_brute_force(rows):
    """candidate_pairs_block (vectorized run-slicing) == the dict-built
    reference rule: per (band, band_hash) bucket, each new id pairs
    with the bucket's min old id, and each non-min new id pairs with
    the bucket's min new id."""
    import numpy as np

    from embulk_input_marketo_ray.stages.sig_index import candidate_pairs_block

    # the engine dedupes (side, doc_id) within a bucket upstream (per-doc
    # distinct bands); mirror that precondition
    uniq = sorted({(b, h, s, d) for b, h, s, d in rows})
    block = pa.table(
        {
            "band": pa.array([r[0] for r in uniq], type=pa.int32()),
            "band_hash": pa.array([r[1] for r in uniq], type=pa.uint64()),
            "side": pa.array([r[2] for r in uniq], type=pa.int32()),
            "doc_id": pa.array([r[3] for r in uniq], type=pa.int64()),
        }
    )
    got = {
        (r["doc_id"], r["other"], r["other_is_old"])
        for r in candidate_pairs_block(block).to_pylist()
    }

    buckets: dict[tuple[int, int], dict[int, list[int]]] = {}
    for b, h, s, d in uniq:
        buckets.setdefault((b, h), {0: [], 1: []})[s].append(d)
    want = set()
    for members in buckets.values():
        olds, news = members[0], members[1]
        for d in news:
            if olds:
                want.add((d, min(olds), 1))
            if news and d != min(news):
                want.add((d, min(news), 0))
    assert got == want


# -- snapshot_diff classification kernel ------------------------------------

states_strategy = st.tuples(
    st.dictionaries(
        st.tuples(st.sampled_from(["r1", "r2"]), st.sampled_from(["a", "b", "c"])),
        st.integers(min_value=0, max_value=30),
        max_size=6,
    ),
    st.dictionaries(
        st.tuples(st.sampled_from(["r1", "r2"]), st.sampled_from(["a", "b", "c"])),
        st.integers(min_value=0, max_value=30),
        max_size=6,
    ),
)


@settings(max_examples=120, deadline=None)
@given(states=states_strategy)
def test_diff_states_matches_dict_reference(states):
    from embulk_input_marketo_ray.sinks.exactly_once import diff_states

    s_old, s_new = states

    def table(state, seq_name):
        keys = sorted(state)
        return pa.table(
            {
                "repo": pa.array([k[0] for k in keys], pa.string()),
                "path": pa.array([k[1] for k in keys], pa.string()),
                seq_name: pa.array([state[k] for k in keys], pa.int64()),
            }
        )

    got = {
        (r["repo"], r["path"]): (r["change_kind"], r["old_seq"], r["new_seq"])
        for r in diff_states(table(s_old, "old_seq"), table(s_new, "new_seq")).to_pylist()
    }
    want = {}
    for k in set(s_old) | set(s_new):
        if k not in s_old:
            want[k] = ("added", None, s_new[k])
        elif k not in s_new:
            want[k] = ("deleted", s_old[k], None)
        elif s_old[k] != s_new[k]:
            want[k] = ("modified", s_old[k], s_new[k])
    assert got == want


# ---------------------------------------------------------------------------
# funnel / retention / chunk kernels vs brute-force references
# ---------------------------------------------------------------------------

funnel_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),    # user
        st.integers(min_value=0, max_value=50),   # ts (us)
        st.integers(min_value=-1, max_value=2),   # stage (-1 = non-funnel)
    ),
    max_size=60,
)


@settings(max_examples=150, deadline=None)
@given(rows=funnel_rows)
def test_funnel_kernel_matches_brute_force(rows):
    from embulk_input_marketo_ray.pipelines.queries import funnel_stage_counts

    rows = sorted(rows)
    user = np.array([r[0] for r in rows], dtype=np.int64)
    ts = np.array([r[1] for r in rows], dtype=np.int64)
    stage = np.array([r[2] for r in rows], dtype=np.int8)
    got = funnel_stage_counts(user, ts, stage, 3)

    want = [0, 0, 0]
    for u in sorted(set(user.tolist())):
        floor = None
        for k in range(3):
            times = [
                t
                for uu, t, s in rows
                if uu == u and s == k and (floor is None or t >= floor)
            ]
            if not times:
                break
            floor = min(times)
            want[k] += 1
    assert got == want


retention_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # user
        st.integers(min_value=0, max_value=9),   # day number
    ),
    max_size=50,
)


@settings(max_examples=150, deadline=None)
@given(rows=retention_rows)
def test_retention_cells_match_brute_force(rows):
    from collections import Counter

    from embulk_input_marketo_ray.pipelines.queries import _DAY_US, retention_cells

    rows = sorted(rows)
    user = np.array([r[0] for r in rows], dtype=np.int64)
    day = np.array([r[1] for r in rows], dtype=np.int64) * _DAY_US
    coh, off = retention_cells(user, day)
    got = Counter(zip(coh.tolist(), off.tolist()))

    want: Counter = Counter()
    for u in sorted(set(user.tolist())):
        days = sorted({d for uu, d in rows if uu == u})
        for d in days:
            want[(days[0] * _DAY_US, d - days[0])] += 1
    assert got == want


@settings(max_examples=200, deadline=None)
@given(n_tok=st.integers(min_value=0, max_value=500))
def test_chunk_layout_invariants(n_tok):
    """The chunk grid covers [0, n_tok) exactly: starts on the stride
    grid, every doc >= 1 chunk, last chunk ends at n_tok (when any
    tokens exist), full adjacent chunks overlap by CHUNK_OVERLAP."""
    from embulk_input_marketo_ray.pipelines.queries import (
        CHUNK_OVERLAP,
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    n_chunks = (max(n_tok - CHUNK_OVERLAP, 1) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
    assert n_chunks >= 1
    starts = [i * CHUNK_STRIDE for i in range(n_chunks)]
    widths = [min(CHUNK_TOKENS, n_tok - s) for s in starts]
    if n_tok == 0:
        assert widths == [0]
        return
    # coverage without gaps: each chunk begins inside (or at the end
    # of) the previous one, and the last reaches n_tok
    assert starts[-1] + widths[-1] == n_tok
    for s, w in zip(starts, widths):
        assert w > 0
    for (s0, w0), (s1, _) in zip(
        list(zip(starts, widths)), list(zip(starts, widths))[1:]
    ):
        assert s1 <= s0 + w0  # no gap
        assert s1 - s0 == CHUNK_STRIDE
    # minimality: one chunk fewer could not reach n_tok even at full width
    if n_chunks > 1:
        assert (n_chunks - 2) * CHUNK_STRIDE + CHUNK_TOKENS < n_tok


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=20_000),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_hll_estimate_accuracy_and_mergeability(n, seed):
    """The sketch estimate tracks true cardinality within the p=12
    theoretical band (~1.04/sqrt(4096) ≈ 1.6% sigma; assert 6 sigma),
    and folding in two halves then merging (register max) is identical
    to folding once — the mergeability the distributed partials rely
    on."""
    from embulk_input_marketo_ray.pipelines.queries import (
        HLL_M,
        hll_estimate,
        hll_fold,
    )

    rng = np.random.default_rng(seed)
    vals = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    true_n = len(np.unique(vals))

    whole = np.zeros(HLL_M, dtype=np.uint8)
    hll_fold(vals, whole)
    a = np.zeros(HLL_M, dtype=np.uint8)
    b = np.zeros(HLL_M, dtype=np.uint8)
    hll_fold(vals[: n // 2], a)
    hll_fold(vals[n // 2 :], b)
    merged = np.maximum(a, b)
    assert np.array_equal(whole, merged)

    est = hll_estimate(whole)
    assert abs(est - true_n) <= max(0.10 * true_n, 20), (est, true_n)


@settings(max_examples=40, deadline=None)
@given(
    n_docs=st.integers(min_value=1, max_value=8),
    max_tokens=st.integers(min_value=0, max_value=60),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_span_corruption_matches_python_reference(n_docs, max_tokens, seed):
    """The vectorized mask+run-fuse kernel equals a per-token Python
    walk of the same hash rule on arbitrary corpora (including empty
    docs and docs whose every token masks)."""
    import pyarrow.parquet as pq

    from embulk_input_marketo_ray.pipelines import queries as q

    rng = np.random.default_rng(seed)
    docs = {}
    for d in range(n_docs):
        k = int(rng.integers(0, max_tokens + 1))
        docs[d] = ["w%d" % rng.integers(0, 50) for _ in range(k)]

    # pure-Python reference of the documented rule
    expected = set()
    for d, toks in docs.items():
        cur = None
        for i in range(len(toks)):
            mix = (((d % q.SPLIT_HASH_MOD) * 1_000_003 + i) % q.SPLIT_HASH_MOD)
            h = (mix * q.SPLIT_HASH_MULT) % q.SPLIT_HASH_MOD
            if h % 1000 < q.SPAN_MASK_PER_MILLE:
                if cur is None:
                    cur = [i, 1]
                else:
                    cur[1] += 1
            else:
                if cur is not None:
                    expected.add((d, cur[0], cur[1]))
                    cur = None
        if cur is not None:
            expected.add((d, cur[0], cur[1]))

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        t = pa.table(
            {
                "doc_id": pa.array(sorted(docs), type=pa.int64()),
                "text": pa.array([" ".join(docs[d]) for d in sorted(docs)]),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array([0] * len(docs), type=pa.int64()),
            }
        )
        pq.write_table(t, f"{tmp}/documents.parquet")
        out = q.q_doc_span_corruption(tmp).to_pandas()
        got = {
            (r.doc_id, r.span_start, r.span_len) for r in out.itertuples()
        }
    assert got == expected
