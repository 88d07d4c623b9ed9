"""Unit tests for round-3 catalog helpers: the history-lake fixture
cache and the stratified sampler's determinism (correctness of the
query RESULTS is covered by the DuckDB mirror in test_entry.py)."""

import numpy as np
import pyarrow as pa

from embulk_input_marketo_ray.pipelines import queries as q


def test_history_lake_cache_reuses_fixture(ray_session):
    """q_time_travel and q_cdc_feed share one two-window lake per
    process: same (n, windows) key -> the identical lake dir and replay
    results; a different key builds a separate lake."""
    n = 2500
    lake_a, res_a = q._replay_windows([n // 2, n + 50], n=n)
    lake_b, res_b = q._replay_windows([n // 2, n + 50], n=n)
    assert lake_a == lake_b
    assert res_a is res_b

    lake_c, _ = q._replay_windows([n + 50], n=n)
    assert lake_c != lake_a


def test_stratified_sampler_deterministic_and_rate_bounded(ray_session, tmp_path):
    """The keep decision is a pure function of doc_id: the same corpus
    re-partitioned arbitrarily yields the identical sample, and each
    language's realized rate tracks its configured per-mille rate."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n = 20_000
    langs = np.array(["en", "es", "de", "unknown"], dtype=object)[
        rng.integers(0, 4, size=n)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(["x"] * n),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")

    got1 = set(q.q_doc_sample_stratified(sf_dir).to_pandas()["doc_id"])
    got2 = set(q.q_doc_sample_stratified(sf_dir).to_pandas()["doc_id"])
    assert got1 == got2  # deterministic across executions

    df = q.q_doc_sample_stratified(sf_dir).to_pandas()
    counts = df.groupby("lang").size()
    totals = {l: int((langs == l).sum()) for l in ("en", "es", "de", "unknown")}
    for lang, total in totals.items():
        rate = q.SAMPLE_RATES_PER_MILLE.get(lang, q.SAMPLE_DEFAULT_PER_MILLE)
        realized = counts.get(lang, 0) / total
        # multiplicative-hash uniformity: within 5 points of the target
        assert abs(realized - rate / 1000) < 0.05, (lang, realized, rate)


def test_event_asof_join_edges(ray_session, tmp_path):
    """As-of join edge cases the sf tables can't guarantee: a marker
    event matches ITSELF (inclusive >=), users with no marker keep
    NULLs, and the forward-fill resets between users."""
    import datetime as dt

    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: view, purchase, view (after), purchase is its own match
        (1, 1, base + dt.timedelta(seconds=10), "view"),
        (2, 1, base + dt.timedelta(seconds=20), "purchase"),
        (3, 1, base + dt.timedelta(seconds=30), "view"),
        # user 2: never purchases
        (4, 2, base + dt.timedelta(seconds=5), "click"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = {
        r["event_id"]: r
        for r in q.q_event_asof_join(str(tmp_path)).take_all()
    }
    assert out[1]["last_purchase_ts"] is None and out[1]["lag_us"] is None
    assert out[2]["last_purchase_ts"] == base + dt.timedelta(seconds=20)
    assert out[2]["lag_us"] == 0  # a purchase matches itself
    assert out[3]["last_purchase_ts"] == base + dt.timedelta(seconds=20)
    assert out[3]["lag_us"] == 10_000_000
    assert out[4]["last_purchase_ts"] is None  # no marker for user 2
    assert len(out) == 4


def test_event_hop_windows_membership(ray_session, tmp_path):
    """An event belongs to exactly window/hop overlapping windows, and
    distinct-user counting survives the two-phase exchange (same user
    in two source rows counts once per window)."""
    import datetime as dt

    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)  # epoch-us divisible by the hop
    t = pa.table(
        {
            "event_id": pa.array([1, 2], type=pa.int64()),
            "ts": pa.array([base, base], type=pa.timestamp("us")),
            "user_id": pa.array([7, 7], type=pa.int64()),
            "event_type": pa.array(["view", "view"]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    rows = q.q_event_hop_windows(str(tmp_path)).take_all()
    hop_us = q.HOP_SECONDS * 1_000_000
    t0 = int(base.timestamp()) * 1_000_000
    got = {r["window_start_us"]: r for r in rows}
    assert set(got) == {t0, t0 - hop_us}  # exactly 2 windows
    for r in rows:
        assert r["n_events"] == 2
        assert r["n_users"] == 1  # same user deduped within the window


def test_doc_keyterms_rank_order(ray_session, tmp_path):
    """Rarity (df asc) dominates tf: a corpus-unique token outranks a
    locally frequent but corpus-common one."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(
                [
                    "common common common zebra",  # zebra unique to doc 1
                    "common other",
                ]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = q.q_doc_keyterms(str(tmp_path)).take_all()
    d1 = sorted((r for r in rows if r["doc_id"] == 1), key=lambda r: r["rank"])
    assert d1[0]["token"] == "zebra" and d1[0]["df"] == 1
    assert d1[1]["token"] == "common" and d1[1]["tf"] == 3 and d1[1]["df"] == 2


def test_bigram_collocations_gate(ray_session, tmp_path):
    """The integer PMI gate keeps a pair that always co-occurs and
    drops a pair of independent common tokens."""
    import pyarrow.parquet as pq

    # "san francisco" always adjacent; "the cat"/"the dog" dilute "the"
    docs = ["san francisco " + "the cat the dog " * 5] * 3
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = q.q_bigram_collocations(str(tmp_path)).take_all()
    pairs = {(r["t1"], r["t2"]) for r in rows}
    assert ("san", "francisco") in pairs
    assert ("the", "cat") not in pairs  # independent: lift ~2 < 3


def test_bigram_collocations_join_fallback(ray_session, tmp_path, monkeypatch):
    """Above the vocab broadcast budget the unigram attach must take
    the two keyed joins and produce identical results."""
    import pyarrow.parquet as pq

    docs = ["san francisco " + "the cat the dog " * 5] * 3
    t = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), type=pa.int64()),
            "text": pa.array(docs),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    fast = {
        (r["t1"], r["t2"]): (r["n_xy"], r["n_x"], r["n_y"])
        for r in q.q_bigram_collocations(str(tmp_path)).take_all()
    }
    monkeypatch.setattr(q, "COLLOC_BROADCAST_VOCAB", 0)
    slow = {
        (r["t1"], r["t2"]): (r["n_xy"], r["n_x"], r["n_y"])
        for r in q.q_bigram_collocations(str(tmp_path)).take_all()
    }
    assert fast == slow and ("san", "francisco") in fast


def test_event_range_join_edges(ray_session, tmp_path):
    """Range-join boundary semantics: exclusive at t, inclusive at
    t+R, windows spanning a bucket boundary sum their two partial
    counts, and zero-match purchases survive with 0."""
    import datetime as dt

    import pyarrow.parquet as pq

    base = dt.datetime(2024, 1, 1)  # bucket-aligned
    R = q.RANGE_JOIN_SECONDS

    def ev(eid, uid, sec, typ):
        return (eid, uid, base + dt.timedelta(seconds=sec), typ)

    rows = [
        # user 1: purchase mid-bucket; window spans into the next bucket
        ev(1, 1, R - 100, "purchase"),
        ev(2, 1, R - 100, "view"),      # ts == t: excluded (strict >)
        ev(3, 1, R - 50, "view"),       # same bucket: counted
        ev(4, 1, R + 10, "view"),       # next bucket, in window: counted
        ev(5, 1, 2 * R - 100, "view"),  # ts == t+R exactly: counted
        ev(6, 1, 2 * R - 99, "view"),   # 1s past window: excluded
        # user 2: purchase with no followers
        ev(7, 2, 10, "purchase"),
        # user 3 activity must not leak into user 1's window
        ev(8, 3, R - 50, "view"),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array([r[2] for r in rows], type=pa.timestamp("us")),
            "event_type": pa.array([r[3] for r in rows]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {r["event_id"]: r["n_follow"] for r in q.q_event_range_join(str(tmp_path)).take_all()}
    assert got == {1: 3, 7: 0}


def test_doc_dup_windows_cross_doc_only(ray_session, tmp_path):
    """A window repeated WITHIN one doc does not pass the >=2-docs
    gate, a window shared across docs does, and occurrence totals
    count every repeat."""
    import pyarrow.parquet as pq

    w = q.DUPWIN_W
    # tokenizer keeps [a-z]+ runs only — tokens must be pure letters
    shared = " ".join(chr(ord("a") + i) * 2 for i in range(w))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    shared + " filler one",
                    "other prefix " + shared + " " + shared,  # 2 occurrences
                    # within-doc-only repeat, never shared:
                    ("solo " * w + "solo " * w).strip(),
                ]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = {r["gram"]: r for r in q.q_doc_dup_windows(str(tmp_path)).take_all()}
    assert shared in rows
    assert rows[shared]["n_docs"] == 2 and rows[shared]["n_occ"] == 3
    assert all(g == shared or "solo" not in g for g in rows)


def test_doc_dup_coverage_interval_union(ray_session, tmp_path):
    """Overlapping repeated windows must not double-count positions:
    two docs sharing a (W+1)-token run contain 2 overlapping repeated
    windows whose union covers exactly W+1 positions."""
    import pyarrow.parquet as pq

    w = q.DUPWIN_W
    run = " ".join(chr(ord("a") + i) * 2 for i in range(w + 1))
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    run,                       # exactly the shared run
                    run + " unique tail here",
                    "nothing shared at all",   # coverage 0
                ]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in q.q_doc_dup_coverage(str(tmp_path)).take_all()}
    assert rows[1]["covered"] == w + 1 and rows[1]["dup_ratio"] == 1.0
    assert rows[2]["covered"] == w + 1 and rows[2]["n_tokens"] == w + 4
    assert rows[3]["covered"] == 0 and rows[3]["dup_ratio"] == 0.0


def test_doc_keyterms_join_fallback(ray_session, tmp_path, monkeypatch):
    """Above the vocab broadcast budget keyterms must take the keyed
    join + doc exchange and produce identical rankings."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(
                ["common common common zebra", "common other words here"]
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    fast = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"])
        for r in q.q_doc_keyterms(str(tmp_path)).take_all()
    }
    monkeypatch.setattr(q, "COLLOC_BROADCAST_VOCAB", 0)
    slow = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"])
        for r in q.q_doc_keyterms(str(tmp_path)).take_all()
    }
    assert fast == slow and fast[(1, 1)][0] == "zebra"


def test_doc_token_rarity_join_fallback(ray_session, tmp_path, monkeypatch):
    """Above the vocab budget rarity must take the keyed join + doc
    fold and produce identical scores."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                ["alpha beta beta", "beta gamma", ""]  # doc 3 drops (no tokens)
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    def snap():
        return {
            r["doc_id"]: (r["n_tokens"], r["sum_freq"], r["min_tok_freq"], r["mean_tok_freq"])
            for r in q.q_doc_token_rarity(str(tmp_path)).take_all()
        }

    fast = snap()
    monkeypatch.setattr(q, "COLLOC_BROADCAST_VOCAB", 0)
    slow = snap()
    assert fast == slow
    assert set(fast) == {1, 2}  # zero-token doc drops on both paths
    # doc 1: 3 occurrences; freq sum = alpha(1) + 2 x beta(3) = 7
    assert fast[1] == (3, 7, 1, 7 / 3)


def test_doc_mix_sample_rates_and_saturation(ray_session, tmp_path):
    """The mixing sampler solves per-language accept rates from the
    recipe: an over-represented language is downsampled toward its
    target share; a language scarcer than its recipe share saturates
    at keep-all (rate 1000); unlisted languages are excluded; and the
    decision is deterministic across executions."""
    import pyarrow.parquet as pq

    n_en, n_zh, n_xx = 18_000, 300, 500
    ids = np.arange(n_en + n_zh + n_xx, dtype=np.int64)
    langs = np.array(["en"] * n_en + ["zh"] * n_zh + ["xx"] * n_xx, dtype=object)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(["x"] * len(ids)),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array(np.ones(len(ids), dtype=np.int64)),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet")

    df = q.q_doc_mix_sample(sf_dir).to_pandas()
    counts = df.groupby("lang").size()

    # zh: budget=9400, want=9400*150//1000=1410 > 300 available -> keep all
    assert counts.get("zh", 0) == n_zh
    # xx: not in the recipe -> excluded entirely
    assert counts.get("xx", 0) == 0
    # en: want = 9400*400//1000 = 3760 of 18000 -> realized within hash noise
    want_en = (len(ids) * q.MIX_BUDGET_PER_MILLE // 1000) * q.MIX_WEIGHTS_PER_MILLE["en"] // 1000
    assert abs(counts.get("en", 0) - want_en) / want_en < 0.05

    df2 = q.q_doc_mix_sample(sf_dir).to_pandas()
    assert set(df["doc_id"]) == set(df2["doc_id"])


def test_doc_heavy_hitters_exact_threshold(ray_session, tmp_path):
    """Sketch-then-verify is EXACT: a token at exactly N/K is excluded
    (strict >), one just above is included, and a token hot inside one
    block but rare globally is killed by the verify pass. Expected set
    computed by brute-force python count."""
    import collections

    import pyarrow.parquet as pq

    K = q.HH_K
    # ~40k filler tokens, each unique; "hothot" above threshold;
    # "edge" placed at EXACTLY N/K once totals are known
    def word(i: int) -> str:
        # alphabetic-only unique fillers (the tokenizer splits on [^a-z])
        s = ""
        while True:
            s += chr(ord("a") + i % 26)
            i //= 26
            if not i:
                return "f" + s

    docs = []
    per_doc = 97
    fillers = 400 * per_doc
    for i in range(400):
        docs.append(" ".join(word(i * per_doc + j) for j in range(per_doc)))
    # one doc where "localhot" is extremely hot in-block but globally rare
    docs.append(" ".join(["localhot"] * 50))
    hot_n = 600  # comfortably above the final ~N/K threshold (~399)
    docs.append(" ".join(["hothot"] * hot_n))
    # solve edge count e so that e * K == N exactly: N = base + e
    base = fillers + 50 + hot_n
    # e*K = base + e  ->  e = base / (K-1); pick base adjustment
    rem = base % (K - 1)
    if rem:  # pad fillers so base divides evenly
        docs.append(" ".join(word(fillers + 100 + j) for j in range(K - 1 - rem)))
        base += K - 1 - rem
    e = base // (K - 1)
    docs.append(" ".join(["edgeedge"] * e))

    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(docs), dtype=np.int64)),
            "text": pa.array(docs),
            "lang": pa.array(["en"] * len(docs)),
            "source": pa.array(["s"] * len(docs)),
            "n_chars": pa.array([len(d) for d in docs], type=pa.int64()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, f"{sf_dir}/documents.parquet", row_group_size=50)

    counter = collections.Counter()
    for d in docs:
        counter.update(d.split())
    n_total = sum(counter.values())
    expected = {t for t, n in counter.items() if n * K > n_total}

    res = q.q_doc_heavy_hitters(sf_dir)
    got = {r["token"]: r["n"] for r in res.to_pylist()}
    assert set(got) == expected
    assert "hothot" in got and got["hothot"] == hot_n
    assert "edgeedge" not in got  # n * K == N -> strictly-greater excluded
    assert "localhot" not in got  # block-hot, globally rare -> verify kills it
    assert counter["edgeedge"] * K == n_total  # the edge case really is at the boundary


def test_bloom_no_false_negatives_and_bounded_fp(ray_session):
    """Bloom prefilter contract: every inserted key probes TRUE (no
    false negatives — exactness of the decontamination scan depends on
    it), and the fp rate on disjoint keys stays near the 10-bits/key
    design point (well under 5%)."""
    from embulk_input_marketo_ray.stages.text import (
        bloom_fold,
        bloom_positions,
        bloom_probe,
    )

    m_bits = 1 << 17  # 131072 bits for 10k keys ~= 13 bits/key
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    inserted = pa.array([f"in gram {i}" for i in range(10_000)], type=pa.string())
    bloom_fold(bits, bloom_positions(inserted, m_bits))

    assert bloom_probe(bits, bloom_positions(inserted, m_bits)).all()

    absent = pa.array([f"out gram {i}" for i in range(20_000)], type=pa.string())
    fp = bloom_probe(bits, bloom_positions(absent, m_bits)).mean()
    assert fp < 0.05, fp


def test_new_operators_survive_empty_corpus(ray_session, tmp_path):
    """Round-2 ADVICE found an empty-corpus crash in vocab_topk; every
    round-3 doc operator must return an EMPTY result (not raise) on a
    zero-row documents table."""
    import pyarrow.parquet as pq

    empty = pa.table(
        {
            "doc_id": pa.array([], type=pa.int64()),
            "text": pa.array([], type=pa.string()),
            "lang": pa.array([], type=pa.string()),
            "source": pa.array([], type=pa.string()),
            "n_chars": pa.array([], type=pa.int64()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(empty, f"{sf_dir}/documents.parquet")

    for fn in (
        q.q_doc_mix_sample,
        q.q_doc_heavy_hitters,
        q.q_doc_decontaminate_bloom,
        q.q_doc_global_shuffle,
        q.q_doc_curation_quantile,
        q.q_doc_source_report,
        q.q_doc_boilerplate,
        q.q_doc_length_batches,
        q.q_doc_incremental_dedup,
        q.q_doc_pii_redact,
        q.q_doc_dedup_near_keep_best,
        q.q_doc_chunks,
        q.q_bpe_pair_stats,
    ):
        res = fn(sf_dir)
        n = res.num_rows if isinstance(res, pa.Table) else res.count()
        assert n == 0, fn.__name__


def test_global_shuffle_partitioning_invariant(ray_session, tmp_path):
    """The (shard, pos) assignment is a pure function of the doc_id
    SET: writing the same corpus as one row group or many yields the
    identical assignment (resume/re-partition stability), and each
    shard's positions are exactly 0..n_shard-1."""
    import pyarrow.parquet as pq

    ids = np.arange(5_000, dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array(["x"] * len(ids)),
            "lang": pa.array(["en"] * len(ids)),
            "source": pa.array(["s"] * len(ids)),
            "n_chars": pa.array(np.ones(len(ids), dtype=np.int64)),
        }
    )
    d1, d2 = tmp_path / "one", tmp_path / "many"
    d1.mkdir(), d2.mkdir()
    pq.write_table(tbl, str(d1 / "documents.parquet"))
    pq.write_table(tbl, str(d2 / "documents.parquet"), row_group_size=137)

    a = {r["doc_id"]: (r["shard"], r["pos"]) for r in q.q_doc_global_shuffle(str(d1)).take_all()}
    b = {r["doc_id"]: (r["shard"], r["pos"]) for r in q.q_doc_global_shuffle(str(d2)).take_all()}
    assert a == b and len(a) == len(ids)

    by_shard: dict[int, list[int]] = {}
    for shard, pos in a.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard


def test_event_funnel_ordering_semantics(ray_session, tmp_path):
    """Stage k counts a user only when a stage-k event is AT-OR-AFTER
    the user's first qualifying stage-(k-1) time: an out-of-order
    purchase (before the click) must not convert, a same-instant chain
    must, and a user missing the middle stage stops at stage 1."""
    import pyarrow.parquet as pq

    def us(sec):
        return pa.scalar(sec * 1_000_000, type=pa.int64()).cast(pa.timestamp("us"))

    rows = [
        # u1: full in-order funnel
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        # u2: purchase BEFORE click -> converts to click only
        (2, 10, "signup"), (2, 30, "click"), (2, 20, "purchase"),
        # u3: same-instant chain (>= bound) -> all three
        (3, 10, "signup"), (3, 10, "click"), (3, 10, "purchase"),
        # u4: no click -> stops at signup even with a later purchase
        (4, 10, "signup"), (4, 40, "purchase"),
        # u5: click/purchase but never signed up -> counts nowhere
        (5, 10, "click"), (5, 20, "purchase"),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64) * 1_000_000,
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array(np.zeros(len(rows))),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {r["stage"]: r["users"] for r in q.q_event_funnel(str(tmp_path)).take_all()}
    assert got == {"signup": 4, "click": 3, "purchase": 2}


def test_doc_chunks_layout(ray_session, tmp_path):
    """Chunk math at the boundaries: empty doc -> one 0-token chunk;
    exactly CHUNK_TOKENS -> one chunk; one over -> two chunks whose
    second covers the overlap + the tail."""
    import pyarrow.parquet as pq

    texts = {
        10: "",                                  # 0 tokens
        11: " ".join(["tok"] * q.CHUNK_TOKENS),  # exactly one chunk
        12: " ".join(["tok"] * (q.CHUNK_TOKENS + 1)),
        13: " ".join(["tok"] * (2 * q.CHUNK_STRIDE + q.CHUNK_OVERLAP)),  # exactly 2
    }
    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[k] for k in sorted(texts)]),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["s"] * len(texts)),
            "n_chars": pa.array([len(texts[k]) for k in sorted(texts)], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = q.q_doc_chunks(str(tmp_path)).take_all()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["start_tok"], r["chunk_tokens"])
        )
    assert by_doc[10] == [(0, 0, 0)]
    assert by_doc[11] == [(0, 0, q.CHUNK_TOKENS)]
    assert by_doc[12] == [
        (0, 0, q.CHUNK_TOKENS),
        (1, q.CHUNK_STRIDE, q.CHUNK_TOKENS + 1 - q.CHUNK_STRIDE),
    ]
    assert by_doc[13] == [
        (0, 0, q.CHUNK_TOKENS),
        (1, q.CHUNK_STRIDE, q.CHUNK_STRIDE + q.CHUNK_OVERLAP),
    ]
    # every chunk pair overlaps by exactly CHUNK_OVERLAP tokens when full
    for doc, chunks in by_doc.items():
        for (i0, s0, w0), (i1, s1, w1) in zip(chunks, chunks[1:]):
            assert s1 - s0 == q.CHUNK_STRIDE and i1 == i0 + 1


def test_user_retention_semantics(ray_session, tmp_path):
    """Same-day repeat activity counts once, the cohort is the FIRST
    day, and offsets measure whole days from it."""
    import datetime as dt

    import pyarrow.parquet as pq

    d0 = dt.datetime(2024, 3, 1)
    rows = [
        # u1: active day 0 (twice), day 2
        (1, d0 + dt.timedelta(hours=1)),
        (1, d0 + dt.timedelta(hours=5)),
        (1, d0 + dt.timedelta(days=2, hours=3)),
        # u2: first seen day 1, active day 1 only
        (2, d0 + dt.timedelta(days=1, hours=2)),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    got = {
        (r["cohort_day"], r["day_offset"]): r["users"]
        for r in q.q_user_retention(str(tmp_path)).take_all()
    }
    assert got == {
        (d0, 0): 1,
        (d0, 2): 1,
        (d0 + dt.timedelta(days=1), 0): 1,
    }


def test_embedding_outliers_picks_farthest(ray_session, tmp_path):
    """The rank-1 outlier of a label is the vector pointing away from
    the cluster mass, ranks are 1..k, and a label smaller than k yields
    all its members ranked."""
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    # label 0: 20 vectors near +e0, one near -e0 (vec_id 99)
    base = np.zeros((21, 8)); base[:, 0] = 1.0
    base[:20] += rng.normal(0, 0.05, size=(20, 8))
    base[20] = -base[20]
    ids = np.r_[np.arange(20, dtype=np.int64), 99]
    # label 1: just 2 vectors (fewer than top-k)
    small = rng.normal(0, 1, size=(2, 8))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.r_[ids, [200, 201]], type=pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in np.vstack([base, small])],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0] * 21 + [1] * 2, type=pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = q.q_embedding_outliers(str(tmp_path)).take_all()
    lab0 = sorted((r for r in rows if r["label"] == 0), key=lambda r: r["rank"])
    assert lab0[0]["vec_id"] == 99 and lab0[0]["rank"] == 1
    assert [r["rank"] for r in lab0] == list(range(1, q.EMB_OUTLIER_TOP_K + 1))
    lab1 = [r for r in rows if r["label"] == 1]
    assert sorted(r["rank"] for r in lab1) == [1, 2]


def test_order_priority_join_inner_semantics(ray_session, tmp_path):
    """The tagged-union join is INNER (an orphan lineitem with no order
    row is dropped) and the high/low split follows the order's
    priority, not the lineitem."""
    import pyarrow.parquet as pq

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2], type=pa.int64()),
            "o_orderpriority": pa.array(["1-URGENT", "5-LOW"]),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 99], type=pa.int64()),  # 99 orphan
            "l_returnflag": pa.array(["A", "R", "A", "A"]),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in q.q_order_priority_report(str(tmp_path)).take_all()
    }
    assert got == {"A": (1, 1), "R": (1, 0)}  # orphan 99 excluded


def test_event_rolling_stats_frame(ray_session, tmp_path):
    """The frame never crosses a user boundary, the realized width
    saturates at ROLLING_WINDOW_ROWS, and win_max tracks the K-row
    sliding selection exactly."""
    import datetime as dt

    import pyarrow.parquet as pq

    base = dt.datetime(2024, 5, 1)
    vals_u1 = [5.0, 1.0, 9.0, 2.0, 3.0, 4.0, 0.5]
    rows = [(1, i, v) for i, v in enumerate(vals_u1)] + [(2, 0, 100.0)]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(seconds=r[1]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([r[2] for r in rows], type=pa.float64()),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = sorted(
        q.q_event_rolling_stats(str(tmp_path)).take_all(),
        key=lambda r: (r["user_id"], r["row_in_user"]),
    )
    u1 = [r for r in out if r["user_id"] == 1]
    K = q.ROLLING_WINDOW_ROWS
    want_max = [
        max(vals_u1[max(0, i - K + 1) : i + 1]) for i in range(len(vals_u1))
    ]
    assert [r["win_max"] for r in u1] == want_max
    assert [r["win_rows"] for r in u1] == [min(i + 1, K) for i in range(len(vals_u1))]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["win_max"] == 100.0 and u2[0]["win_rows"] == 1


def test_customer_anti_join_set_semantics(ray_session, tmp_path):
    """A customer with any qualifying order is excluded, one with only
    below-threshold orders is kept, and one with no orders at all is
    kept."""
    import pyarrow.parquet as pq

    customers = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
            "c_mktsegment": pa.array(["A", "B", "C"]),
        }
    )
    orders = pa.table(
        {
            "o_custkey": pa.array([1, 1, 2], type=pa.int64()),
            "o_totalprice": pa.array(
                [q.ANTI_JOIN_PRICE + 1, 10.0, q.ANTI_JOIN_PRICE], type=pa.float64()
            ),  # cust 1 qualifies; cust 2's order is AT the threshold (>)
        }
    )
    pq.write_table(customers, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    got = sorted(
        (r["c_custkey"], r["c_mktsegment"])
        for r in q.q_customer_anti_join(str(tmp_path)).take_all()
    )
    assert got == [(2, "B"), (3, "C")]


def test_order_priority_join_hot_key(ray_session, tmp_path):
    """Degenerate skew: EVERY lineitem hits one order key. The single
    order row co-resides with all fragments under the key hash, so the
    join stays exact."""
    import pyarrow.parquet as pq

    n = 50_000
    orders = pa.table(
        {
            "o_orderkey": pa.array([7, 8], type=pa.int64()),
            "o_orderpriority": pa.array(["2-HIGH", "5-LOW"]),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array(np.full(n, 7, dtype=np.int64)),
            "l_returnflag": pa.array(["A" if i % 2 else "R" for i in range(n)]),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"), row_group_size=4096)
    got = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in q.q_order_priority_report(str(tmp_path)).take_all()
    }
    assert got == {"A": (n // 2, 0), "R": (n // 2, 0)}


def test_run_query_cli(tmp_path):
    """The ad-hoc catalog CLI runs a query in a fresh process, prints
    one JSON line with the row count, and --out writes the result."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.dataset as pads

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo_root, "scripts", "run_query.py")
    env = dict(os.environ, PYTHONPATH=repo_root, RAY_ADDRESS="local")

    outdir = str(tmp_path / "funnel_out")
    out = subprocess.run(
        [sys.executable, script, "event_funnel",
         "--sf-dir", "/root/testdata/sf0.001", "--out", outdir],
        capture_output=True, text=True, timeout=300, env=env, cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    got = json.loads(out.stdout.strip().splitlines()[-1])
    assert got["query"] == "event_funnel" and got["rows"] == 3
    assert pads.dataset(outdir).to_table().num_rows == 3

    lst = subprocess.run(
        [sys.executable, script, "--list"],
        capture_output=True, text=True, timeout=120, env=env, cwd=str(tmp_path),
    )
    assert lst.returncode == 0
    names = json.loads(lst.stdout.strip().splitlines()[-1])
    assert "cdc_replay" in names and "event_funnel" in names


def _write_tpch_micro(tmp_path):
    """Minimal 6-table TPC-H micro-fixture for the Q5/Q18 edge tests."""
    import pyarrow.parquet as pq

    d = str(tmp_path)

    def ts(s):
        return np.datetime64(s, "us")

    pq.write_table(
        pa.table({"r_regionkey": pa.array([0, 1], pa.int32()),
                  "r_name": ["ASIA", "EUROPE"]}),
        f"{d}/region.parquet",
    )
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([10, 11, 20], pa.int32()),
            "n_name": ["JAPAN", "INDIA", "FRANCE"],
            "n_regionkey": pa.array([0, 0, 1], pa.int32()),
        }),
        f"{d}/nation.parquet",
    )
    # c1 JAPAN (in region), c2 FRANCE (out of region)
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1, 2], pa.int64()),
            "c_name": ["a", "b"],
            "c_nationkey": pa.array([10, 20], pa.int32()),
            "c_acctbal": pa.array([0.0, 0.0]),
            "c_mktsegment": ["BUILDING", "BUILDING"],
        }),
        f"{d}/customer.parquet",
    )
    # s1 JAPAN (local to c1), s2 INDIA (same region, NOT local)
    pq.write_table(
        pa.table({
            "s_suppkey": pa.array([1, 2], pa.int64()),
            "s_name": ["s1", "s2"],
            "s_nationkey": pa.array([10, 11], pa.int32()),
            "s_acctbal": pa.array([0.0, 0.0]),
        }),
        f"{d}/supplier.parquet",
    )
    # o1 in window (c1), o2 out of window (c1), o3 in window (c2)
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64()),
            "o_custkey": pa.array([1, 1, 2], pa.int64()),
            "o_orderstatus": ["O", "O", "O"],
            "o_totalprice": pa.array([100.0, 100.0, 100.0]),
            "o_orderdate": pa.array([ts("1996-06-01"), ts("1897-01-01"),
                                     ts("1996-06-01")]),
            "o_orderpriority": ["1-URGENT"] * 3,
        }),
        f"{d}/orders.parquet",
    )
    # lines: (o1, s1) local supplier -> counts; (o1, s2) same-region
    # non-local -> excluded; (o2, s1) out-of-window order; (o3, s1)
    # out-of-region customer
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
            "l_partkey": pa.array([1, 1, 1, 1], pa.int64()),
            "l_suppkey": pa.array([1, 2, 1, 1], pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 1], pa.int32()),
            "l_quantity": pa.array([301.0, 5.0, 300.0, 1.0]),
            "l_extendedprice": pa.array([10.0, 10.0, 10.0, 10.0]),
            "l_discount": pa.array([0.05, 0.0, 0.0, 0.0]),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": pa.array([ts("1996-07-01")] * 4),
        }),
        f"{d}/lineitem.parquet",
    )
    return d


def test_local_supplier_volume_semantics(ray_session, tmp_path):
    """Q5 filter algebra on a micro-fixture: only the (in-region
    customer, in-window order, supplier-nation == customer-nation)
    lineitem contributes; same-REGION-different-NATION suppliers are
    excluded (the filter is nation equality, not region joint
    membership)."""
    d = _write_tpch_micro(tmp_path)
    rows = {r["n_name"]: r["revenue_c100"] for r in q.q_local_supplier_volume(d).to_pylist()}
    # 10.00 -> 1000 cents, discount 5% -> x95
    assert rows == {"JAPAN": 1000 * 95}


def test_large_orders_threshold_strict(ray_session, tmp_path):
    """Q18 HAVING is STRICTLY greater: an order summing exactly to the
    threshold is excluded; the qualifying order carries its header."""
    d = _write_tpch_micro(tmp_path)
    got = q.q_large_orders(d).take_all()
    # o1: 301 + 5 = 306 > 300 qualifies; o2: 300 exactly -> excluded
    assert len(got) == 1
    r = got[0]
    assert r["o_orderkey"] == 1 and r["o_custkey"] == 1
    assert r["total_qty"] == 306 and r["o_totalprice_c"] == 10000


def test_embedding_kmeans_self_and_ties(ray_session, tmp_path):
    """Centroids assign to themselves at distance 0, and a point
    equidistant between two identical centroids goes to the LOWER
    rank (argmin first-occurrence == oracle row_number order)."""
    import pyarrow.parquet as pq

    k = q.KMEANS_K
    dim = 4
    rng = np.random.default_rng(7)
    base = rng.normal(size=(k, dim)).astype(np.float32) * 0.3
    base[1] = base[0]  # two IDENTICAL centroids -> rank tie
    extra = base[0:1] + 0.0  # a non-centroid point exactly on both
    vecs = np.vstack([base, extra])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
        "embedding": pa.array([v.tolist() for v in vecs],
                              type=pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(vecs), dtype=np.int32)),
    })
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    got = {r["vec_id"]: (r["cluster"], r["sq_dist"])
           for r in q.q_embedding_kmeans(str(tmp_path)).take_all()}
    assert len(got) == len(vecs)
    # centroid 0 and its twin 1 and the extra point all land on rank 0
    assert got[0] == (0, 0)
    assert got[1] == (0, 0)
    assert got[k] == (0, 0)
    # every other centroid lands on itself at distance 0
    for i in range(2, k):
        assert got[i] == (i, 0), i


def test_cochange_triangles_graph_semantics(ray_session, monkeypatch):
    """Triangle algebra on a known graph: a 4-clique puts every node in
    C(3,2)=3 triangles; a 2-path has none; repos never mix."""
    import itertools

    import ray.data

    clique = [("r1", a, b) for a, b in itertools.combinations("abcd", 2)]
    path = [("r2", "a", "b"), ("r2", "b", "c")]
    edges = pa.table(
        {
            "repo": pa.array([e[0] for e in clique + path]),
            "path_a": pa.array([e[1] for e in clique + path]),
            "path_b": pa.array([e[2] for e in clique + path]),
            "n_windows": pa.array([9] * (len(clique) + len(path)), pa.int64()),
        }
    )
    monkeypatch.setattr(q, "q_co_change_pairs", lambda sf: ray.data.from_arrow(edges))
    got = {(r["repo"], r["path"]): r["n_triangles"]
           for r in q.q_cochange_triangles("unused").take_all()}
    assert got == {("r1", n): 3 for n in "abcd"}


def test_bpe_pair_stats_byte_semantics(ray_session, tmp_path):
    """Pairs overlap ('aaa' -> 2x'aa'), non-alpha bytes break adjacency,
    case folds, multibyte utf-8 never fabricates an alpha pair."""
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["aaA b-c", "abéab"]),  # é between pairs
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([7, 5], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    got = {r["pair"]: r["n"] for r in q.q_bpe_pair_stats(str(tmp_path)).to_pylist()}
    # doc1: 'aaa b-c' -> aa, aa; doc2: 'abéab' -> ab, ab (é breaks b-a)
    assert got == {"aa": 2, "ab": 2}


def _write_events_values(tmp_path, values, types=None, row_group_size=None):
    import pyarrow.parquet as pq

    n = len(values)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(
                np.arange(n, dtype=np.int64) * 1_000_000, type=pa.int64()
            ).cast(pa.timestamp("us")),
            "user_id": pa.array(np.zeros(n, dtype=np.int64)),
            "event_type": pa.array(types or ["t"] * n),
            "value": pa.array(np.asarray(values, dtype=np.float64)),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"), row_group_size=row_group_size)


def test_value_quantile_sketch_error_bound(ray_session, tmp_path):
    """The reported quantile is the bucket's closest-to-zero endpoint,
    so for positive data: q_approx <= exact percentile_disc value and
    the relative gap is < 1/16 (4 mantissa bits)."""
    rng = np.random.default_rng(11)
    vals = np.exp(rng.normal(size=4000) * 2.0)  # heavy-tailed positives
    _write_events_values(tmp_path, vals)
    got = {r["p"]: r["q_approx"]
           for r in q.q_value_quantile_sketch(str(tmp_path)).take_all()}
    s = np.sort(vals)
    for p, approx in got.items():
        exact = s[int(np.ceil(p * len(s) / 100)) - 1]
        assert approx <= exact + 1e-12
        assert (exact - approx) / exact < 1 / 16 + 1e-9, (p, approx, exact)


def test_value_quantile_sketch_partition_invariant(ray_session, tmp_path):
    """Order-independent merge: the same data in 1 row group or many
    tiny ones yields the identical sketch output (no compaction
    schedule, unlike KLL)."""
    rng = np.random.default_rng(3)
    vals = rng.normal(size=3000) * 100  # mixed signs
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    _write_events_values(d1, vals)
    _write_events_values(d2, vals, row_group_size=173)
    a = sorted(map(tuple, q.q_value_quantile_sketch(str(d1)).to_pandas().values.tolist()))
    b = sorted(map(tuple, q.q_value_quantile_sketch(str(d2)).to_pandas().values.tolist()))
    assert a == b


def test_value_quantile_sketch_sign_ordering(ray_session, tmp_path):
    """Buckets sort in VALUE order across negatives, zero, positives:
    with n=10 powers of two the disc ranks land exactly: p50 ->
    rank 5 -> 1.0, p90 -> rank 9 -> 16.0, p99 -> rank 10 -> 32.0."""
    _write_events_values(
        tmp_path, [-4.0, -2.0, -1.0, 0.0, 1.0, 2.0, 4.0, 8.0, 16.0, 32.0]
    )
    got = {r["p"]: r["q_approx"]
           for r in q.q_value_quantile_sketch(str(tmp_path)).take_all()}
    assert got[50] == 1.0
    assert got[90] == 16.0
    assert got[99] == 32.0


def test_local_supplier_volume_hot_keys(ray_session, tmp_path):
    """Degenerate skew through BOTH chained exchanges: one customer
    owns every order and one order owns every lineitem. Each exchange
    hash-routes the single parent row with all its fragments, so the
    chain stays exact; revenue = n x 1000 cents x 100 (no discount)."""
    import pyarrow.parquet as pq

    d = str(tmp_path)
    n = 50_000
    pq.write_table(
        pa.table({"r_regionkey": pa.array([0], pa.int32()), "r_name": ["ASIA"]}),
        f"{d}/region.parquet",
    )
    pq.write_table(
        pa.table({
            "n_nationkey": pa.array([10], pa.int32()),
            "n_name": ["JAPAN"],
            "n_regionkey": pa.array([0], pa.int32()),
        }),
        f"{d}/nation.parquet",
    )
    pq.write_table(
        pa.table({
            "c_custkey": pa.array([1], pa.int64()),
            "c_name": ["hot"],
            "c_nationkey": pa.array([10], pa.int32()),
            "c_acctbal": pa.array([0.0]),
            "c_mktsegment": ["BUILDING"],
        }),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table({
            "s_suppkey": pa.array([1], pa.int64()),
            "s_name": ["s"],
            "s_nationkey": pa.array([10], pa.int32()),
            "s_acctbal": pa.array([0.0]),
        }),
        f"{d}/supplier.parquet",
    )
    pq.write_table(
        pa.table({
            "o_orderkey": pa.array([7], pa.int64()),
            "o_custkey": pa.array([1], pa.int64()),
            "o_orderstatus": ["O"],
            "o_totalprice": pa.array([1.0]),
            "o_orderdate": pa.array([np.datetime64("1996-06-01", "us")]),
            "o_orderpriority": ["1-URGENT"],
        }),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array(np.full(n, 7, dtype=np.int64)),
            "l_partkey": pa.array(np.ones(n, dtype=np.int64)),
            "l_suppkey": pa.array(np.ones(n, dtype=np.int64)),
            "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
            "l_quantity": pa.array(np.ones(n)),
            "l_extendedprice": pa.array(np.full(n, 10.0)),
            "l_discount": pa.array(np.zeros(n)),
            "l_tax": pa.array(np.zeros(n)),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array(
                np.full(n, np.datetime64("1996-07-01", "us"))
            ),
        }),
        f"{d}/lineitem.parquet",
        row_group_size=4096,
    )
    rows = q.q_local_supplier_volume(d).to_pylist()
    assert rows == [{"n_name": "JAPAN", "revenue_c100": n * 1000 * 100}]


def test_doc_length_ntiles_fill_rule(ray_session, tmp_path):
    """NTILE's exact fill rule: n=10,k=4 -> tile sizes 3,3,2,2 in rank
    order; n=3 < k -> one row per tile, tiles 1..3."""
    import pyarrow.parquet as pq

    def write(d, n):
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array(["x"] * n),
                    "lang": pa.array(["en"] * n),
                    "source": pa.array(["s"] * n),
                    # two docs share each length -> in-group tiebreak
                    "n_chars": pa.array((np.arange(n, dtype=np.int64) // 2) * 7),
                }
            ),
            str(d / "documents.parquet"),
        )

    d10, d3 = tmp_path / "a", tmp_path / "b"
    write(d10, 10), write(d3, 3)

    rows = sorted(
        q.q_doc_length_ntiles(str(d10)).take_all(), key=lambda r: r["rank"]
    )
    assert [r["rank"] for r in rows] == list(range(1, 11))
    # rank order == (n_chars, doc_id) order
    assert [r["doc_id"] for r in rows] == list(range(10))
    from collections import Counter

    sizes = Counter(r["ntile"] for r in rows)
    assert [sizes[t] for t in (1, 2, 3, 4)] == [3, 3, 2, 2]

    rows3 = sorted(
        q.q_doc_length_ntiles(str(d3)).take_all(), key=lambda r: r["rank"]
    )
    assert [r["ntile"] for r in rows3] == [1, 2, 3]


def test_event_dedup_window_chain_semantics(ray_session, tmp_path):
    """CHAIN dedup, not lag-gap: events at t, t+0.7W, t+1.4W keep
    {t, t+1.4W} (the middle is suppressed by t; the third clears the
    LAST KEPT, not the previous raw event). Keys never cross-suppress."""
    w = q.EVENT_DEDUP_SECONDS
    vals = [
        (1, 1, 0, "view"),
        (2, 1, int(0.7 * w), "view"),   # within W of kept t=0 -> drop
        (3, 1, int(1.4 * w), "view"),   # > W after kept t=0 -> keep
        (4, 1, int(1.4 * w), "click"),  # other type: kept
        (5, 2, int(0.1 * w), "view"),   # other user: kept
    ]
    _write_events_values(
        tmp_path, [0.0] * len(vals)
    )  # overwrite below with real rows
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([v[0] for v in vals], type=pa.int64()),
            "ts": pa.array(
                np.array([v[2] for v in vals], dtype=np.int64) * 1_000_000,
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            "user_id": pa.array([v[1] for v in vals], type=pa.int64()),
            "event_type": pa.array([v[3] for v in vals]),
            "value": pa.array(np.zeros(len(vals))),
            "props": pa.array(["{}"] * len(vals)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    kept = sorted(r["event_id"] for r in q.q_event_dedup_window(str(tmp_path)).take_all())
    assert kept == [1, 3, 4, 5]


def test_fragment_exchange_equivalence(ray_session, monkeypatch):
    """The disk-backed fragment exchange must produce identical results
    to the hash-shuffle path for every operator that can select it."""
    sf = "/root/testdata/sf0.01"

    def run_all():
        return (
            sorted(map(tuple, q.q_event_transitions(sf).to_pandas().values.tolist())),
            sorted(r["event_id"] for r in q.q_event_dedup_window(sf).take_all()),
            sorted(
                (r["event_id"], r["row_in_user"], r["win_rows"], r["win_max"])
                for r in q.q_event_rolling_stats(sf).take_all()
            ),
            sorted(
                (r["repo"], r["path"], r["commit_seq"], r["parent_seq"])
                for r in q.q_cdc_parent_seq(sf).take_all()
            ),
            sorted(
                (r["repo"], r["path"], r["commit_seq"], r["valid_to_seq"], r["version_no"])
                for r in q.q_scd2_history(sf).take_all()
            ),
        )

    base = run_all()
    # force the fragment path regardless of input size
    monkeypatch.setattr(q, "FRAG_EXCHANGE_BYTES", 0)
    monkeypatch.setattr(q, "SMALL_INPUT_BYTES", 0)
    frag = run_all()
    assert base == frag


def test_fragment_exchange_ignores_orphan_fragments(ray_session, monkeypatch):
    """Retry safety: duplicate fragment files on disk (a retried
    phase-A attempt) are never read — phase B consumes exactly the
    files the successful attempt reported, so counting kernels stay
    exact."""
    import shutil

    import ray.data

    from embulk_input_marketo_ray.sinks import exactly_once as xo

    real_writer = xo.FragmentWriter

    class DuplicatingWriter(real_writer):
        def __call__(self, block):
            stats = super().__call__(block)
            # simulate the dead attempt's orphans: copy every written
            # fragment to an unreported name
            for path in stats.column("frag_path").to_pylist():
                shutil.copy(path, path + ".orphan" + path[path.rfind("."):])
            return stats

    monkeypatch.setattr(xo, "FragmentWriter", DuplicatingWriter)

    n = 10_000
    tbl = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64) % 97),
            "v": pa.array(np.ones(n, dtype=np.int64)),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(8)
    out_schema = pa.schema([("total", pa.int64())])

    def count_kernel(t: pa.Table) -> pa.Table:
        return pa.table({"total": pa.array([t.num_rows], type=pa.int64())})

    got = q.fragment_keyed_exchange(ds, ["k"], count_kernel, out_schema)
    assert sum(r["total"] for r in got.take_all()) == n


def test_fragment_exchange_cleans_scratch(ray_session, tmp_path, monkeypatch):
    """The exchange's scratch directory is removed after the result is
    materialized — no fragment litter under GRAFT_FRAG_DIR."""
    import os

    import ray.data

    monkeypatch.setenv("GRAFT_FRAG_DIR", str(tmp_path))
    t = pa.table(
        {
            "k": pa.array(np.arange(1000, dtype=np.int64) % 7),
            "v": pa.array(np.ones(1000, dtype=np.int64)),
        }
    )
    out_schema = pa.schema([("total", pa.int64())])

    def kernel(tab):
        return pa.table({"total": pa.array([tab.num_rows], type=pa.int64())})

    got = q.fragment_keyed_exchange(ray.data.from_arrow(t), ["k"], kernel, out_schema)
    assert sum(r["total"] for r in got.take_all()) == 1000
    assert os.listdir(str(tmp_path)) == []


# ---------------------------------------------------------------------------
# round-4 late additions: CDC stream-health + EXISTS join + coverage curve
# ---------------------------------------------------------------------------


def _write_change_events(tmp_path, rows):
    """rows: (repo, path, commit_seq, op, updated_s) tuples in the CDC
    change-event schema (only the columns these kernels read)."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "repo": pa.array([r[0] for r in rows], type=pa.string()),
            "path": pa.array([r[1] for r in rows], type=pa.string()),
            "commit_seq": pa.array([r[2] for r in rows], type=pa.int64()),
            "op": pa.array([r[3] for r in rows], type=pa.string()),
            "updated_ts": pa.array(
                np.array([r[4] for r in rows], dtype=np.int64) * 1_000_000,
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
            "event_ts": pa.array(
                np.array([r[2] for r in rows], dtype=np.int64) * 1_000_000,
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
        }
    )
    pq.write_table(t, str(tmp_path / "events_0.parquet"))
    return str(tmp_path)


def test_cdc_late_arrivals_no_cross_key_carryover(ray_session, tmp_path, monkeypatch):
    """The segmented running max RESETS at key boundaries: key 'a' ends
    on a huge updated_ts; key 'b' (adjacent after the sort) starts
    lower — its first event must NOT count late. Within a key, equal
    timestamps are not late (strict <) and the worst regression is the
    gap to the running max, not to the immediate predecessor."""
    rows = [
        ("r", "a", 1, "upsert", 1_000_000),
        ("r", "a", 2, "upsert", 1_000_000),  # equal -> not late
        ("r", "b", 3, "upsert", 100),
        ("r", "b", 4, "upsert", 500),        # rising -> not late
        ("r", "b", 5, "upsert", 50),         # late vs 500 -> regression 450 s
        ("r", "b", 6, "upsert", 400),        # late vs 500 (not vs 50)
    ]
    monkeypatch.setattr(q, "_cdc_events_dir", lambda n=None: _write_change_events(tmp_path, rows))
    out = q.q_cdc_late_arrivals("unused").to_pandas().set_index("path")
    assert out.loc["a", "n_late"] == 0
    assert out.loc["a", "max_regression_us"] == 0
    assert out.loc["b", "n_events"] == 4
    assert out.loc["b", "n_late"] == 2
    assert out.loc["b", "max_regression_us"] == 450 * 1_000_000


def test_path_lifecycle_recreate_and_live(ray_session, tmp_path, monkeypatch):
    """Re-create = upsert immediately after a delete OF THE SAME KEY;
    a key ending on a delete is not live; a neighbouring key starting
    with an upsert after another key's trailing delete is NOT a
    re-create (run boundary masks the shift)."""
    rows = [
        ("r", "a", 1, "upsert", 0),
        ("r", "a", 2, "delete", 0),
        ("r", "a", 3, "upsert", 0),   # re-create
        ("r", "b", 4, "upsert", 0),   # NOT a re-create (new key)
        ("r", "b", 5, "delete", 0),   # b ends dead
    ]
    monkeypatch.setattr(q, "_cdc_events_dir", lambda n=None: _write_change_events(tmp_path, rows))
    out = q.q_path_lifecycle("unused").to_pandas().set_index("path")
    assert out.loc["a", "n_recreates"] == 1 and out.loc["a", "live"] == 1
    assert out.loc["b", "n_recreates"] == 0 and out.loc["b", "live"] == 0
    assert out.loc["b", "n_upserts"] == 1 and out.loc["b", "n_deletes"] == 1


def test_repo_churn_concentration_decile_cut(ray_session, tmp_path, monkeypatch):
    """A 3-path repo's top decile is ceil(3/10) = 1 path; the share is
    floor(1000 * top / total). Ties on count break by path asc."""
    rows = [("r", "hot", s, "upsert", 0) for s in range(8)]
    rows += [("r", "warm", 10, "upsert", 0), ("r", "cold", 11, "upsert", 0)]
    monkeypatch.setattr(q, "_cdc_events_dir", lambda n=None: _write_change_events(tmp_path, rows))
    out = q.q_repo_churn_concentration("unused").to_pandas()
    assert out.loc[0, "n_paths"] == 3
    assert out.loc[0, "top_paths"] == 1
    assert out.loc[0, "n_changes"] == 10
    assert out.loc[0, "top_share_pm"] == 800  # 8/10


def test_order_exists_join_strict_boundary(ray_session, tmp_path):
    """EXISTS is strict: a lineitem shipped EXACTLY +30 days does not
    qualify; +30 days +1 us does; an order with no lineitems never
    counts (and a lineitem run with no order row is ignored)."""
    import pyarrow.parquet as pq

    day_us = 86_400 * 1_000_000
    base = 1_700_000_000 * 1_000_000
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
            "o_custkey": pa.array([1, 1, 1], type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([1.0] * 3),
            "o_orderdate": pa.array([base] * 3, type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "2-HIGH"]),
        }
    )
    line = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 9], type=pa.int64()),
            "l_partkey": pa.array([0, 0, 0], type=pa.int64()),
            "l_suppkey": pa.array([0, 0, 0], type=pa.int64()),
            "l_linenumber": pa.array([1, 1, 1], type=pa.int32()),
            "l_quantity": pa.array([1.0] * 3),
            "l_extendedprice": pa.array([1.0] * 3),
            "l_discount": pa.array([0.0] * 3),
            "l_tax": pa.array([0.0] * 3),
            "l_returnflag": pa.array(["N"] * 3),
            "l_linestatus": pa.array(["O"] * 3),
            "l_shipdate": pa.array(
                [
                    base + q.EXISTS_LATE_DAYS * day_us,      # exactly +30d -> no
                    base + q.EXISTS_LATE_DAYS * day_us + 1,  # strictly past -> yes
                    base,                                    # orphan key -> ignored
                ],
                type=pa.int64(),
            ).cast(pa.timestamp("us")),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(line, str(tmp_path / "lineitem.parquet"))
    out = q.q_order_exists_join(str(tmp_path)).to_pandas()
    assert out.to_dict("records") == [
        {"o_orderpriority": "2-HIGH", "order_count": 1}
    ]


def test_vocab_coverage_tier_arithmetic(ray_session, tmp_path):
    """Tie tiers take exactly ceil((target - covered) / freq) tokens:
    corpus = 'aa' x4 + 'bb' x4 + 'cc' x2 (total 10). 50% needs 2
    tokens of the freq-4 tier (covered 8); 90% needs 2 + 1 more
    (covered 10); 99% the same."""
    import pyarrow.parquet as pq

    text = " ".join(["aa"] * 4 + ["bb"] * 4 + ["cc"] * 2)
    docs = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array([text]),
            "lang": pa.array(["en"]),
            "source": pa.array(["s"]),
            "n_chars": pa.array([len(text)], type=pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q.q_vocab_coverage(str(tmp_path)).to_pandas().set_index("pct_pm")
    assert out.loc[500, "k_tokens"] == 2 and out.loc[500, "covered"] == 8
    assert out.loc[900, "k_tokens"] == 3 and out.loc[900, "covered"] == 10
    assert out.loc[990, "k_tokens"] == 3
    assert (out["total"] == 10).all()


def test_user_interarrival_single_event_user(ray_session, tmp_path):
    """A single-event user reports zero gaps and zero gap stats; a
    two-event user reports the exact microsecond gap in sum AND max."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": pa.array([0, 5_500_000, 0], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([7, 7, 9], type=pa.int64()),
            "event_type": pa.array(["t"] * 3),
            "value": pa.array([0.0] * 3),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q.q_user_interarrival(str(tmp_path)).to_pandas().set_index("user_id")
    assert out.loc[9, "n_gaps"] == 0 and out.loc[9, "max_gap_us"] == 0
    assert out.loc[7, "n_gaps"] == 1
    assert out.loc[7, "sum_gap_us"] == 5_500_000
    assert out.loc[7, "max_gap_us"] == 5_500_000


def test_returned_revenue_topk_join_semantics(ray_session, tmp_path):
    """Only 'R' lineitems of in-window orders count; an 'R' lineitem
    whose order is outside the window is dropped by the join (its run
    has no order row); revenue is cents x (100 - disc%) summed across
    a customer's orders."""
    import pyarrow.parquet as pq

    in_win = np.datetime64("1997-02-01", "us").item()
    out_win = np.datetime64("1998-02-01", "us").item()
    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
            "o_custkey": pa.array([10, 10, 10], type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([0.0] * 3),
            "o_orderdate": pa.array(
                [in_win, in_win, out_win], type=pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(["1"] * 3),
        }
    )
    line = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
            "l_partkey": pa.array([0] * 4, type=pa.int64()),
            "l_suppkey": pa.array([0] * 4, type=pa.int64()),
            "l_linenumber": pa.array([1, 2, 1, 1], type=pa.int32()),
            "l_quantity": pa.array([1.0] * 4),
            "l_extendedprice": pa.array([10.00, 20.00, 5.00, 99.0]),
            "l_discount": pa.array([0.10, 0.00, 0.05, 0.0]),
            "l_tax": pa.array([0.0] * 4),
            "l_returnflag": pa.array(["R", "N", "R", "R"]),
            "l_linestatus": pa.array(["O"] * 4),
            "l_shipdate": pa.array([in_win] * 4, type=pa.timestamp("us")),
        }
    )
    cust = pa.table(
        {
            "c_custkey": pa.array([10], type=pa.int64()),
            "c_name": pa.array(["alice"]),
            "c_nationkey": pa.array([0], type=pa.int32()),
            "c_acctbal": pa.array([0.0]),
            "c_mktsegment": pa.array(["BUILDING"]),
        }
    )
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    pq.write_table(line, str(tmp_path / "lineitem.parquet"))
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    out = q.q_returned_revenue_topk(str(tmp_path)).to_pandas()
    # order 1: R item 1000c x 90 = 90000; order 2: 500c x 95 = 47500;
    # order 3 outside window -> dropped. N-flag item never counts.
    assert out.to_dict("records") == [
        {"c_custkey": 10, "c_name": "alice", "revenue_c100": 137_500}
    ]


def test_lineitem_discount_revenue_boundaries(ray_session, tmp_path):
    """Ship-year is half-open [FROM, TO); the discount band is on the
    ROUNDED percent (0.05 in, 0.0449 rounds to 4 -> out); quantity is
    strict <."""
    import pyarrow.parquet as pq

    d_in = np.datetime64("1997-01-01", "us").item()   # inclusive lower
    d_out = np.datetime64("1998-01-01", "us").item()  # exclusive upper
    line = pa.table(
        {
            "l_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "l_partkey": pa.array([0] * 5, type=pa.int64()),
            "l_suppkey": pa.array([0] * 5, type=pa.int64()),
            "l_linenumber": pa.array([1] * 5, type=pa.int32()),
            "l_quantity": pa.array([1.0, 1.0, 1.0, 24.0, 1.0]),
            "l_extendedprice": pa.array([10.0] * 5),
            "l_discount": pa.array([0.05, 0.0449, 0.07, 0.06, 0.06]),
            "l_tax": pa.array([0.0] * 5),
            "l_returnflag": pa.array(["N"] * 5),
            "l_linestatus": pa.array(["O"] * 5),
            "l_shipdate": pa.array(
                [d_in, d_in, d_in, d_in, d_out], type=pa.timestamp("us")
            ),
        }
    )
    pq.write_table(line, str(tmp_path / "lineitem.parquet"))
    out = q.q_lineitem_discount_revenue(str(tmp_path)).to_pandas()
    # rows 1 (1000c x 5) and 3 (1000c x 7) qualify; row 2 rounds to 4%,
    # row 4 fails qty <, row 5 is outside the year.
    assert out.loc[0, "n_items"] == 2
    assert out.loc[0, "revenue_c100"] == 5000 + 7000


def test_event_trending_gap_resets_prev(ray_session, tmp_path):
    """A window with no immediately preceding calendar window compares
    against 0 — a one-window gap must not leak the older count."""
    import pyarrow.parquet as pq

    w = q.TREND_WINDOW_US
    ts = [10, 20, w + 5, 3 * w + 1]  # windows 0, 0, 1, 3 (gap at 2)
    t = pa.table(
        {
            "event_id": pa.array(np.arange(4, dtype=np.int64)),
            "ts": pa.array(ts, type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([1] * 4, type=pa.int64()),
            "event_type": pa.array(["view"] * 4),
            "value": pa.array([0.0] * 4),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = (
        q.q_event_trending(str(tmp_path))
        .to_pandas()
        .sort_values("window_us")
        .reset_index(drop=True)
    )
    assert list(out["n"]) == [2, 1, 1]
    assert list(out["prev_n"]) == [0, 2, 0]  # window 3's prev is the GAP, not w1
    assert list(out["delta"]) == [2, -1, 1]


def test_embedding_quantize_zero_and_negative(ray_session, tmp_path):
    """An all-zero vector quantizes to zeros with scale 0 (no division
    blowup); negative components floor AWAY from zero (-127 exactly at
    -absmax); absmax is exact float32."""
    import pyarrow.parquet as pq

    emb = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0, 0.0], [-2.0, 1.0, 0.5]],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array([0, 0], type=pa.int32()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))
    out = q.q_embedding_quantize(str(tmp_path)).to_pandas().set_index("vec_id")
    assert out.loc[1, "scale_ppm"] == 0
    assert out.loc[1, "q_min"] == 0 and out.loc[1, "q_max"] == 0
    assert out.loc[2, "scale_ppm"] == 2_000_000
    # codes: floor(-2*127/2)=-127, floor(1*127/2)=63, floor(0.5*127/2)=31
    assert out.loc[2, "q_min"] == -127
    assert out.loc[2, "q_max"] == 63
    assert out.loc[2, "q_sum"] == -127 + 63 + 31


def test_doc_chunk_dedup_survives_prefix_insertion(ray_session, tmp_path):
    """The content-defined property: prepending bytes to a copy of a
    doc shifts every byte position, yet the boundaries (picked by a
    rolling CONTENT hash) re-align after the first chunk — duplicate
    chunks are found despite the shift, which fixed-width blocking
    could never do. Engine result must equal the single-process oracle
    on the same fixture."""
    import pyarrow.parquet as pq

    from embulk_input_marketo_ray.pipelines import oracles

    rng = np.random.default_rng(3)
    body = "".join(chr(97 + c) for c in rng.integers(0, 26, size=4000))
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array([body, "PREFIX-INSERTED:" + body]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([len(body), len(body) + 16], type=pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    got = q.q_doc_chunk_dedup(str(tmp_path)).to_pandas()
    exp = oracles.oracle_doc_chunk_dedup(str(tmp_path)).to_pandas()
    assert got.to_dict("records") == exp.to_dict("records")
    # the shifted copy re-syncs: a large majority of the byte stream
    # dedups away even though every absolute position moved
    assert got.loc[0, "n_chunks"] > got.loc[0, "n_distinct"]
    assert got.loc[0, "bytes_saved_pm"] > 400


def test_hop_distinct_users_hll_window_replication(ray_session, tmp_path):
    """One event lands in exactly WINDOW/HOP hop windows; a lone user
    estimates to 1 in each (HLL is exact at tiny cardinalities via the
    linear-counting branch)."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": pa.array([q.HOP_WINDOW_SECONDS * 5 * 1_000_000], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([42], type=pa.int64()),
            "event_type": pa.array(["view"]),
            "value": pa.array([0.0]),
            "props": pa.array(["{}"]),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q.q_hop_distinct_users_hll(str(tmp_path)).to_pandas()
    assert len(out) == q.HOP_WINDOW_SECONDS // q.HOP_SECONDS
    assert (out["approx_users"] == 1).all()


def test_customer_order_dist_counts_zero(ray_session, tmp_path):
    """The LEFT-join zero: a customer with no orders lands in the
    c_count=0 bucket (an inner join would lose them); orphan order
    rows without a customer never form a bucket."""
    import pyarrow.parquet as pq

    cust = pa.table(
        {
            "c_custkey": pa.array([1, 2, 3], type=pa.int64()),
            "c_name": pa.array(["a", "b", "c"]),
            "c_nationkey": pa.array([0, 0, 0], type=pa.int32()),
            "c_acctbal": pa.array([0.0] * 3),
            "c_mktsegment": pa.array(["X"] * 3),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([10, 11, 12], type=pa.int64()),
            "o_custkey": pa.array([1, 1, 9], type=pa.int64()),  # 9 is an orphan
            "o_orderstatus": pa.array(["O"] * 3),
            "o_totalprice": pa.array([1.0] * 3),
            "o_orderdate": pa.array([0] * 3, type=pa.int64()).cast(pa.timestamp("us")),
            "o_orderpriority": pa.array(["1"] * 3),
        }
    )
    pq.write_table(cust, str(tmp_path / "customer.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))
    out = q.q_customer_order_dist(str(tmp_path)).to_pandas().set_index("c_count")
    assert out.loc[0, "custdist"] == 2  # customers 2 and 3
    assert out.loc[2, "custdist"] == 1  # customer 1
    assert len(out) == 2  # no bucket from the orphan


def test_part_promo_share_flag_and_month(ray_session, tmp_path):
    """Only PROMO-part revenue counts in the numerator; lineitems
    outside the ship month never enter either sum."""
    import pyarrow.parquet as pq

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], type=pa.int64()),
            "p_name": pa.array(["x", "y"]),
            "p_brand": pa.array(["B"] * 2),
            "p_type": pa.array(["PROMO", "ECONOMY"]),
            "p_size": pa.array([1, 1], type=pa.int32()),
            "p_retailprice": pa.array([1.0, 1.0]),
        }
    )
    sep = np.datetime64("1997-09-15", "us").item()
    oct_ = np.datetime64("1997-10-01", "us").item()
    line = pa.table(
        {
            "l_partkey": pa.array([1, 2, 1], type=pa.int64()),
            "l_orderkey": pa.array([1, 1, 1], type=pa.int64()),
            "l_suppkey": pa.array([0] * 3, type=pa.int64()),
            "l_linenumber": pa.array([1] * 3, type=pa.int32()),
            "l_quantity": pa.array([1.0] * 3),
            "l_extendedprice": pa.array([10.0, 30.0, 99.0]),
            "l_discount": pa.array([0.0, 0.0, 0.0]),
            "l_tax": pa.array([0.0] * 3),
            "l_returnflag": pa.array(["N"] * 3),
            "l_linestatus": pa.array(["O"] * 3),
            "l_shipdate": pa.array([sep, sep, oct_], type=pa.timestamp("us")),
        }
    )
    pq.write_table(part, str(tmp_path / "part.parquet"))
    pq.write_table(line, str(tmp_path / "lineitem.parquet"))
    out = q.q_part_promo_share(str(tmp_path)).to_pandas()
    assert out.loc[0, "promo_rev_c100"] == 1000 * 100
    assert out.loc[0, "total_rev_c100"] == 4000 * 100
    assert out.loc[0, "promo_share_pm"] == 250


def test_doc_novelty_min_doc_attribution(ray_session, tmp_path):
    """The gram's FIRST doc (min doc_id) owns it: a verbatim echo of an
    earlier doc scores 0 novelty; the originator scores 1000; ties on
    the same gram resolve to the smaller doc_id."""
    import pyarrow.parquet as pq

    original = "alpha beta gamma delta epsilon zeta"
    docs = pa.table(
        {
            "doc_id": pa.array([5, 9], type=pa.int64()),
            "text": pa.array([original, original]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([len(original)] * 2, type=pa.int64()),
        }
    )
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = q.q_doc_novelty(str(tmp_path)).to_pandas().set_index("doc_id")
    assert out.loc[5, "novelty_pm"] == 1000
    assert out.loc[9, "novelty_pm"] == 0
    assert out.loc[5, "n_grams"] == out.loc[9, "n_grams"] == 4


def test_event_type_affinity_pairs(ray_session, tmp_path):
    """Pairs are unordered (lexicographic a < b), deduped per user
    (repeat events don't inflate the count), single-type users emit
    nothing."""
    import pyarrow.parquet as pq

    rows = [
        (1, "view"), (1, "view"), (1, "click"),    # user 1: click+view
        (2, "view"), (2, "click"), (2, "buy"),     # user 2: 3 pairs
        (3, "view"),                               # user 3: nothing
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array([0] * len(rows), type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q.q_event_type_affinity(str(tmp_path)).to_pandas()
    got = {(r.type_a, r.type_b): r.n_users for r in out.itertuples()}
    assert got == {
        ("click", "view"): 2,
        ("buy", "click"): 1,
        ("buy", "view"): 1,
    }


# ---------------------------------------------------------------------------
# TPC-H Q15/Q16/Q17/Q22 shapes
# ---------------------------------------------------------------------------


def _write_lineitem(tmp_path, rows):
    """rows: (orderkey, partkey, suppkey, qty, price, disc, shipdate_str)."""
    import pyarrow.parquet as pq

    n = len(rows)
    t = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], type=pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], type=pa.int64()),
            "l_linenumber": pa.array(np.arange(n, dtype=np.int32)),
            "l_quantity": pa.array([float(r[3]) for r in rows]),
            "l_extendedprice": pa.array([float(r[4]) for r in rows]),
            "l_discount": pa.array([float(r[5]) for r in rows]),
            "l_tax": pa.array([0.0] * n),
            "l_returnflag": pa.array(["N"] * n),
            "l_linestatus": pa.array(["O"] * n),
            "l_shipdate": pa.array(
                [np.datetime64(r[6], "us") for r in rows], type=pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))


def test_top_supplier_revenue_keeps_ties(ray_session, tmp_path):
    """Two suppliers tying the quarter's max BOTH return; out-of-quarter
    rows never count; revenue is cents x (100 - disc%)."""
    import pyarrow.parquet as pq

    _write_lineitem(
        tmp_path,
        [
            (1, 1, 1, 1, 10.00, 0.00, "1996-02-01"),   # supp 1: 100000
            (2, 1, 2, 1, 5.00, 0.00, "1996-02-01"),    # supp 2: 50000
            (3, 1, 2, 1, 5.00, 0.00, "1996-03-31"),    # supp 2: +50000 -> tie
            (4, 1, 3, 1, 99.00, 0.00, "1996-04-01"),   # outside (half-open)
            (5, 1, 3, 1, 99.00, 0.00, "1995-12-31"),   # outside
        ],
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                "s_name": pa.array(["sa", "sb", "sc"]),
                "s_nationkey": pa.array([0, 0, 0], type=pa.int32()),
                "s_acctbal": pa.array([0.0, 0.0, 0.0]),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = q.q_top_supplier_revenue(str(tmp_path)).to_pandas()
    assert list(out["s_suppkey"]) == [1, 2]
    assert list(out["s_name"]) == ["sa", "sb"]
    assert set(out["revenue_c10k"]) == {100000}


def test_part_small_qty_integer_gate(ray_session, tmp_path):
    """The 20%-of-part-average gate evaluates as 5*qty*n < sum (exact):
    a part with quantities [1, 10, 10, 10] (sum 31, n 4) keeps only the
    qty-1 row (20 < 31); parts of other brands never contribute."""
    import pyarrow.parquet as pq

    _write_lineitem(
        tmp_path,
        [
            (1, 1, 1, 1, 7.00, 0.0, "1996-01-01"),
            (2, 1, 1, 10, 1.00, 0.0, "1996-01-01"),
            (3, 1, 1, 10, 1.00, 0.0, "1996-01-01"),
            (4, 1, 1, 10, 1.00, 0.0, "1996-01-01"),
            (5, 2, 1, 1, 50.00, 0.0, "1996-01-01"),  # wrong brand
        ],
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], type=pa.int64()),
                "p_name": pa.array(["a", "b"]),
                "p_brand": pa.array([q.Q17_BRAND, "Brand#99"]),
                "p_type": pa.array(["STANDARD", "STANDARD"]),
                "p_size": pa.array([1, 1], type=pa.int32()),
                "p_retailprice": pa.array([0.0, 0.0]),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    out = q.q_part_small_qty(str(tmp_path)).to_pandas()
    assert out.iloc[0]["total_c100"] == 700
    assert out.iloc[0]["n_small"] == 1
    assert out.iloc[0]["avg_yearly_c100"] == 100


def test_supplier_part_counts_distinct_and_exclusions(ray_session, tmp_path):
    """Duplicate (part, supplier) lineitems count once; excluded brand /
    type / size parts never appear."""
    import pyarrow.parquet as pq

    _write_lineitem(
        tmp_path,
        [
            (1, 1, 1, 1, 1.0, 0.0, "1996-01-01"),
            (2, 1, 1, 1, 1.0, 0.0, "1996-01-01"),  # dup pair
            (3, 1, 2, 1, 1.0, 0.0, "1996-01-01"),
            (4, 2, 1, 1, 1.0, 0.0, "1996-01-01"),  # excluded brand
            (5, 3, 1, 1, 1.0, 0.0, "1996-01-01"),  # excluded size
        ],
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
                "p_name": pa.array(["a", "b", "c"]),
                "p_brand": pa.array(["Brand#1", q.Q16_EXCL_BRAND, "Brand#1"]),
                "p_type": pa.array(["STANDARD", "STANDARD", "STANDARD"]),
                "p_size": pa.array([1, 1, 99], type=pa.int32()),
                "p_retailprice": pa.array([0.0] * 3),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    out = q.q_supplier_part_counts(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["brand"], r["ptype"], r["size"], r["supplier_cnt"]) == (
        "Brand#1", "STANDARD", 1, 2,
    )


def test_idle_customer_balance_gate_and_window(ray_session, tmp_path):
    """Only above-mean-positive-balance customers with no RECENT order
    survive; the empty result keeps its three columns."""
    import pyarrow.parquet as pq

    def write_customers(bals):
        pq.write_table(
            pa.table(
                {
                    "c_custkey": pa.array(
                        np.arange(1, len(bals) + 1, dtype=np.int64)
                    ),
                    "c_name": pa.array([f"c{i}" for i in range(len(bals))]),
                    "c_nationkey": pa.array([7] * len(bals), type=pa.int32()),
                    "c_acctbal": pa.array([float(b) for b in bals]),
                    "c_mktsegment": pa.array(["BUILDING"] * len(bals)),
                }
            ),
            str(tmp_path / "customer.parquet"),
        )

    def write_orders(rows):  # (custkey, date)
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(
                        np.arange(1, len(rows) + 1, dtype=np.int64)
                    ),
                    "o_custkey": pa.array([r[0] for r in rows], type=pa.int64()),
                    "o_orderstatus": pa.array(["O"] * len(rows)),
                    "o_totalprice": pa.array([1.0] * len(rows)),
                    "o_orderdate": pa.array(
                        [np.datetime64(r[1], "us") for r in rows],
                        type=pa.timestamp("us"),
                    ),
                    "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
                }
            ),
            str(tmp_path / "orders.parquet"),
        )

    # mean of positive balances = (100 + 300) / 2 = 200
    write_customers([100.00, 300.00, -50.00, 250.00])
    write_orders(
        [
            (2, "2001-05-01"),  # cust 2 above mean but RECENT order -> out
            (4, "1999-01-01"),  # cust 4 above mean, only an OLD order -> in
            (1, "1999-01-01"),  # cust 1 below mean -> out regardless
        ]
    )
    out = q.q_idle_customer_balance(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["nationkey"], r["numcust"], r["totacctbal_c100"]) == (7, 1, 25000)

    # everyone ordered recently -> empty but schema-stable
    write_orders([(1, "2001-05-01"), (2, "2001-05-01"), (3, "2001-05-01"), (4, "2001-05-01")])
    out = q.q_idle_customer_balance(str(tmp_path)).to_pandas()
    assert len(out) == 0
    assert list(out.columns) == ["nationkey", "numcust", "totacctbal_c100"]


def test_nation_pair_volume_directions_and_years(ray_session, tmp_path):
    """Both directions and ship-years land in separate cells; same-nation
    trade and out-of-window rows never count."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([3, 7, 9], type=pa.int32()),
                "n_name": pa.array(["NATION_3", "NATION_7", "NATION_9"]),
                "n_regionkey": pa.array([0, 0, 0], type=pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                "s_name": pa.array(["sa", "sb", "sc"]),
                "s_nationkey": pa.array([3, 7, 9], type=pa.int32()),
                "s_acctbal": pa.array([0.0] * 3),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 20, 30], type=pa.int64()),
                "c_name": pa.array(["a", "b", "c"]),
                "c_nationkey": pa.array([7, 3, 9], type=pa.int32()),
                "c_acctbal": pa.array([0.0] * 3),
                "c_mktsegment": pa.array(["BUILDING"] * 3),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 200, 300], type=pa.int64()),
                "o_custkey": pa.array([10, 20, 30], type=pa.int64()),
                "o_orderstatus": pa.array(["O"] * 3),
                "o_totalprice": pa.array([1.0] * 3),
                "o_orderdate": pa.array(
                    [np.datetime64("1996-01-01", "us")] * 3, type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 3),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    _write_lineitem(
        tmp_path,
        [
            (100, 1, 1, 1, 10.00, 0.00, "1996-06-01"),  # supp N3 -> cust N7, 1996
            (100, 1, 1, 1, 20.00, 0.00, "1997-06-01"),  # same pair, 1997
            (200, 1, 2, 1, 5.00, 0.00, "1996-06-01"),   # supp N7 -> cust N3
            (200, 1, 1, 1, 99.00, 0.00, "1996-06-01"),  # supp N3 -> cust N3: same-nation, out
            (300, 1, 1, 1, 99.00, 0.00, "1996-06-01"),  # cust N9: out
            (100, 1, 1, 1, 99.00, 0.00, "1998-06-01"),  # outside window
        ],
    )
    out = q.q_nation_pair_volume(str(tmp_path)).to_pandas()
    got = {
        (r.supp_nation, r.cust_nation, r.l_year): r.revenue_c10k
        for r in out.itertuples()
    }
    assert got == {
        ("NATION_3", "NATION_7", 1996): 100000,
        ("NATION_3", "NATION_7", 1997): 200000,
        ("NATION_7", "NATION_3", 1996): 50000,
    }


def test_disjunctive_part_revenue_bitmask(ray_session, tmp_path):
    """A row matches only when ONE clause's part conjunct AND quantity
    conjunct hold together — a Brand#1 part with a clause-2 quantity
    does NOT match (the cross-clause trap the bitmask AND must avoid)."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], type=pa.int64()),
                "p_name": pa.array(["a", "b"]),
                "p_brand": pa.array(["Brand#1", "Brand#2"]),
                "p_type": pa.array(["STANDARD"] * 2),
                "p_size": pa.array([5, 10], type=pa.int32()),
                "p_retailprice": pa.array([0.0] * 2),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    _write_lineitem(
        tmp_path,
        [
            (1, 1, 1, 11, 10.00, 0.00, "1996-01-01"),  # clause 1: in
            (2, 1, 1, 15, 99.00, 0.00, "1996-01-01"),  # Brand#1 + clause-2 qty: OUT
            (3, 2, 1, 15, 7.00, 0.00, "1996-01-01"),   # clause 2: in
            (4, 2, 1, 31, 99.00, 0.00, "1996-01-01"),  # no qty clause: out
        ],
    )
    out = q.q_disjunctive_part_revenue(str(tmp_path)).to_pandas()
    assert out.iloc[0]["revenue_c10k"] == (1000 + 700) * 100
    assert out.iloc[0]["n_items"] == 2


def test_doc_surprisal_bits_and_fallback(ray_session, tmp_path, monkeypatch):
    """bits() semantics: corpus 'a a a b' -> total=4 (3 bits), count(a)=3
    (2 bits), count(b)=1 (1 bit); doc surprisals follow exactly. The
    keyed-join fallback (vocab budget 0) returns the identical table."""
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": pa.array(["a a a", "b"]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["s", "s"]),
            "n_chars": pa.array([5, 1], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q.q_doc_surprisal(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    # doc 1: 3 occurrences x (3 - 2) = 3 bits; doc 2: 1 x (3 - 1) = 2 bits
    assert out.loc[1, "n_tokens"] == 3 and out.loc[1, "sum_bits"] == 3
    assert out.loc[2, "n_tokens"] == 1 and out.loc[2, "sum_bits"] == 2
    assert out.loc[1, "mean_millibits"] == 1000
    assert out.loc[2, "mean_millibits"] == 2000

    monkeypatch.setattr(q, "COLLOC_BROADCAST_VOCAB", 0)
    fb = q.q_doc_surprisal(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    assert fb.equals(out)


def test_part_min_price_supplier_argmin_ties(ray_session, tmp_path):
    """All suppliers tying the per-part min return once each (even when
    one supplier offers the min price twice); non-LARGE parts drop."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array([1, 2], type=pa.int64()),
                "p_name": pa.array(["a", "b"]),
                "p_brand": pa.array(["Brand#1"] * 2),
                "p_type": pa.array(["LARGE", "SMALL"]),
                "p_size": pa.array([1, 1], type=pa.int32()),
                "p_retailprice": pa.array([0.0] * 2),
            }
        ),
        str(tmp_path / "part.parquet"),
    )
    _write_lineitem(
        tmp_path,
        [
            (1, 1, 1, 1, 5.00, 0.0, "1996-01-01"),
            (2, 1, 1, 1, 5.00, 0.0, "1996-01-01"),  # same supp, min twice
            (3, 1, 2, 1, 5.00, 0.0, "1996-01-01"),  # tie by another supp
            (4, 1, 3, 1, 9.00, 0.0, "1996-01-01"),  # above min
            (5, 2, 1, 1, 1.00, 0.0, "1996-01-01"),  # non-LARGE part
        ],
    )
    out = q.q_part_min_price_supplier(str(tmp_path)).to_pandas()
    got = sorted(
        (r.p_partkey, r.s_suppkey, r.min_price_c100) for r in out.itertuples()
    )
    assert got == [(1, 1, 500), (1, 2, 500)]


def test_customer_rfm_anchor_and_days(ray_session, tmp_path):
    """Recency anchors at the GLOBAL max order date; frequency and
    monetary fold per customer in integer cents."""
    import pyarrow.parquet as pq

    rows = [  # (custkey, date, price)
        (1, "2000-01-01", 10.00),
        (1, "2000-03-01", 5.50),
        (2, "2000-03-11", 2.25),
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
                "o_custkey": pa.array([r[0] for r in rows], type=pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows]),
                "o_orderdate": pa.array(
                    [np.datetime64(r[1], "us") for r in rows], type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = (
        q.q_customer_rfm(str(tmp_path)).to_pandas().set_index("c_custkey").sort_index()
    )
    assert out.loc[1, "frequency"] == 2
    assert out.loc[1, "monetary_c100"] == 1550
    assert out.loc[1, "recency_days"] == 10  # 2000-03-01 -> 2000-03-11
    assert out.loc[2, "recency_days"] == 0


def test_cochange_walk_rank_two_steps(ray_session, monkeypatch):
    """Hand-computed 2-step walk on a 3-path a-b-c (deg a=c=1, b=2):
    r1(a)=r1(c)=1e6//2=500000, r1(b)=1e6+1e6=2000000;
    r2(a)=r2(c)=2000000//2=1000000, r2(b)=500000+500000=1000000."""
    import ray.data

    edges = pa.table(
        {
            "repo": pa.array(["r", "r"]),
            "path_a": pa.array(["a", "b"]),
            "path_b": pa.array(["b", "c"]),
            "n_windows": pa.array([9, 9], pa.int64()),
        }
    )
    monkeypatch.setattr(q, "q_co_change_pairs", lambda sf: ray.data.from_arrow(edges))
    got = {r["path"]: r["rank2"] for r in q.q_cochange_walk_rank("unused").take_all()}
    assert got == {"a": 1000000, "b": 1000000, "c": 1000000}


def test_nation_market_share_numerator(ray_session, tmp_path):
    """Target-nation revenue counts in the numerator only for orders of
    REGION customers; non-region customers' orders drop entirely."""
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], type=pa.int32()),
                "r_name": pa.array(["ASIA", "OTHER"]),
            }
        ),
        str(tmp_path / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([3, 5, 9], type=pa.int32()),
                "n_name": pa.array(["NATION_3", "NATION_5", "NATION_9"]),
                "n_regionkey": pa.array([0, 0, 1], type=pa.int32()),
            }
        ),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], type=pa.int64()),
                "s_name": pa.array(["sa", "sb"]),
                "s_nationkey": pa.array([3, 9], type=pa.int32()),  # 1=target
                "s_acctbal": pa.array([0.0, 0.0]),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 20], type=pa.int64()),
                "c_name": pa.array(["a", "b"]),
                "c_nationkey": pa.array([5, 9], type=pa.int32()),  # 10 in-region
                "c_acctbal": pa.array([0.0, 0.0]),
                "c_mktsegment": pa.array(["BUILDING"] * 2),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([100, 200], type=pa.int64()),
                "o_custkey": pa.array([10, 20], type=pa.int64()),
                "o_orderstatus": pa.array(["O"] * 2),
                "o_totalprice": pa.array([1.0] * 2),
                "o_orderdate": pa.array(
                    [np.datetime64("1996-05-01", "us")] * 2, type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * 2),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    _write_lineitem(
        tmp_path,
        [
            (100, 1, 1, 1, 10.00, 0.00, "1996-06-01"),  # target supp, region cust
            (100, 1, 2, 1, 30.00, 0.00, "1996-06-01"),  # other supp, region cust
            (200, 1, 1, 1, 99.00, 0.00, "1996-06-01"),  # non-region cust: out
        ],
    )
    out = q.q_nation_market_share(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["o_year"], r["target_rev_c10k"], r["total_rev_c10k"], r["share_pm"]) == (
        1996, 100000, 400000, 250,
    )


def test_cohort_revenue_ages(ray_session, tmp_path):
    """Cohort = first order month; ages are month diffs; revenue folds
    per (cohort, age) cell in integer cents."""
    import pyarrow.parquet as pq

    rows = [  # (custkey, date, price)
        (1, "2000-01-15", 10.00),
        (1, "2000-03-02", 5.00),   # age 2
        (2, "2000-03-20", 2.00),   # its own cohort, age 0
        (2, "2000-03-25", 3.00),   # same cell
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(1, len(rows) + 1, dtype=np.int64)),
                "o_custkey": pa.array([r[0] for r in rows], type=pa.int64()),
                "o_orderstatus": pa.array(["O"] * len(rows)),
                "o_totalprice": pa.array([r[2] for r in rows]),
                "o_orderdate": pa.array(
                    [np.datetime64(r[1], "us") for r in rows], type=pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(rows)),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    out = q.q_cohort_revenue(str(tmp_path)).to_pandas()
    got = {
        (r.cohort_month, r.age_months): (r.n_orders, r.revenue_c100)
        for r in out.itertuples()
    }
    jan2000 = 2000 * 12 + 0
    mar2000 = 2000 * 12 + 2
    assert got == {
        (jan2000, 0): (1, 1000),
        (jan2000, 2): (1, 500),
        (mar2000, 0): (2, 500),
    }


def test_embedding_power_iteration_matvec(ray_session, tmp_path):
    """Hand-computed w = A_q^T (A_q @ 1) on a 2x2 grid; negative floats
    floor toward -inf like the SQL oracle."""
    import pyarrow.parquet as pq

    emb = [[1.0, 2.0], [-0.5, 1.0]]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1], type=pa.int64()),
                "embedding": pa.array(emb, type=pa.list_(pa.float32())),
                "label": pa.array([0, 0], type=pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    s = int(q.KMEANS_SCALE)
    qm = np.floor(np.array(emb) * s).astype(np.int64)
    expected = qm.sum(axis=1) @ qm
    out = q.q_embedding_power_iteration(str(tmp_path)).to_pandas()
    assert list(out["dim"]) == [0, 1]
    assert list(out["w"]) == list(expected)


def test_keyed_repartition_self_ensures_hash_shuffle(ray_session, monkeypatch):
    """A query whose first exchange is a direct keyed repartition must
    not crash in a session still on the sort-shuffle default (the
    standalone scripts/run_query.py path). Ray snapshots DataContext at
    SOURCE-DATASET creation, so the ensure must run inside _read_events
    — forcing the non-collapsed path (SMALL_INPUT_BYTES=0) proves the
    real keyed exchange compiles."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    prev = ctx.shuffle_strategy
    monkeypatch.setattr(q, "SMALL_INPUT_BYTES", 0)
    try:
        ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PULL_BASED
        out = q.q_co_change_pairs("unused")
        assert out.count() >= 0
    finally:
        ctx.shuffle_strategy = prev


def test_doc_span_corruption_runs_and_determinism(ray_session, tmp_path):
    """Consecutive masked token indexes fuse into one span (start, len);
    the layout is a pure function of (doc_id, token idx) — invariant to
    corpus partitioning."""
    import pyarrow.parquet as pq

    n = 40
    text = " ".join(f"tok{i}" for i in range(200))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([text] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([len(text)] * n, type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q.q_doc_span_corruption(str(tmp_path)).to_pandas()
    assert len(out) > 0
    # spans never overlap and never touch (a touching pair would have fused)
    for doc, g in out.groupby("doc_id"):
        g = g.sort_values("span_start")
        ends = (g["span_start"] + g["span_len"]).to_numpy()
        starts = g["span_start"].to_numpy()
        assert (starts[1:] > ends[:-1]).all()
    # repartitioned corpus -> identical layout
    pq.write_table(t.slice(0, 13), str(tmp_path / "a.parquet"))
    import ray.data

    # recompute via the mask rule directly for one (doc, idx) spot check
    u = np.uint64(7)
    mix = ((u % q.SPLIT_HASH_MOD) * np.uint64(1_000_003) + np.uint64(3)) % q.SPLIT_HASH_MOD
    h = (mix * np.uint64(q.SPLIT_HASH_MULT)) % q.SPLIT_HASH_MOD
    expect_masked = (h % 1000) < q.SPAN_MASK_PER_MILLE
    covered = False
    g7 = out[out["doc_id"] == 7]
    for r in g7.itertuples():
        if r.span_start <= 3 < r.span_start + r.span_len:
            covered = True
    assert covered == expect_masked


def test_embedding_truncation_error_energy(ray_session, tmp_path):
    """Exact integer energies: a vector whose head-K carries all the
    energy reports 1000 pm; zero vectors report 0 without dividing."""
    import pyarrow.parquet as pq

    k = q.MATRYOSHKA_K
    dim = k + 4
    v1 = [1.0] * k + [0.0] * 4          # all energy in the head
    v2 = [0.0] * k + [1.0] * 4          # none in the head
    v3 = [0.0] * dim                    # zero vector
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], type=pa.int64()),
                "embedding": pa.array([v1, v2, v3], type=pa.list_(pa.float32())),
                "label": pa.array([0, 0, 0], type=pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = (
        q.q_embedding_truncation_error(str(tmp_path))
        .to_pandas()
        .set_index("vec_id")
        .sort_index()
    )
    s2 = int(q.KMEANS_SCALE) ** 2
    assert out.loc[0, "energy_full"] == k * s2
    assert out.loc[0, "retained_pm"] == 1000
    assert out.loc[1, "energy_head"] == 0 and out.loc[1, "retained_pm"] == 0
    assert out.loc[2, "energy_full"] == 0 and out.loc[2, "retained_pm"] == 0


def test_doc_curation_priority_percentiles(ray_session, tmp_path):
    """Hand-checkable percentile algebra on 4 docs: longer + less
    repetitive + less compressible docs rank higher; percentile = 1000
    x strictly-smaller // total."""
    import pyarrow.parquet as pq

    texts = [
        "a b c " * 2,                    # short, repetitive (1 distinct gram)
        "unique words flow here nicely today",   # mid, no repetition
        "x " * 200,                     # long but maximally repetitive+compressible
        "completely varied language sample with many different tokens around",
    ]
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s"] * 4),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = (
        q.q_doc_curation_priority(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # recompute expected priorities from the returned metrics
    total = len(out)
    for col, invert in (("m_len", False), ("rep_pm", True), ("comp_pm", False)):
        vals = out[col].to_numpy()
        pct = np.array([1000 * int((vals < v).sum()) // total for v in vals])
        out[f"pct_{col}"] = (1000 - pct) if invert else pct
    expect = out["pct_m_len"] + out["pct_rep_pm"] + out["pct_comp_pm"]
    assert (out["priority"] == expect).all()
    # doc 4 (long, varied, incompressible) outranks doc 3 (repetitive)
    assert out.loc[4, "priority"] > out.loc[3, "priority"]


def test_bottomk_sample_mergeable_and_partition_invariant(ray_session, tmp_path):
    """The bottom-K of the whole corpus equals the bottom-K of any
    partitioning's partial bottom-Ks (the mergeability the per-block
    partials rely on), and the estimator entry is exact below K."""
    import pyarrow.parquet as pq

    n = 500
    ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "doc_id": pa.array(ids),
            "text": pa.array([chr(ord("a") + (i % 7)) * 3 for i in ids]),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([2] * n, type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = q.q_doc_bottomk_sample(str(tmp_path)).to_pandas()
    h = ((ids.astype(np.uint64) % q.SPLIT_HASH_MOD) * q.SPLIT_HASH_MULT) % q.SPLIT_HASH_MOD
    order = np.lexsort((ids, h))
    expect = ids[order][: q.BOTTOMK_K]
    assert list(out["doc_id"]) == list(expect)

    # KMV with fewer distinct tokens than K: exact count
    r = q.q_token_kmv_distinct(str(tmp_path)).to_pandas()
    assert r.iloc[0]["k_used"] == 7 and r.iloc[0]["est_distinct"] == 7


def test_user_cm_sketch_upper_bound(ray_session, tmp_path):
    """CM estimates are exact-or-over: est >= exact count for present
    users; a user with a unique unsaturated cell reports exactly."""
    import pyarrow.parquet as pq

    rows = [0] * 50 + [1] * 7 + [2] * 1
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array([0] * len(rows), type=pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(rows, type=pa.int64()),
            "event_type": pa.array(["e"] * len(rows)),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q.q_user_cm_sketch(str(tmp_path)).to_pandas().set_index("user_id")
    exact = {0: 50, 1: 7, 2: 1}
    for u, n in exact.items():
        assert out.loc[u, "est_count"] >= n
    # with 3 users in a 4x1024 sketch collisions are impossible: exact
    assert out.loc[0, "est_count"] == 50
    assert out.loc[1, "est_count"] == 7
    assert out.loc[2, "est_count"] == 1


def test_funnel_latency_first_pair_semantics(ray_session, tmp_path):
    """Latency = first signup -> first purchase AT OR AFTER it; a
    purchase before the signup neither converts nor pollutes; users
    without both steps drop."""
    import pyarrow.parquet as pq

    rows = [  # (user, type, t_us)
        (1, "purchase", 50),   # BEFORE signup: ignored
        (1, "signup", 100),
        (1, "purchase", 400),  # first after -> lat 300
        (1, "purchase", 900),
        (2, "signup", 10),     # never purchases
        (3, "purchase", 5),    # never signs up
        (4, "signup", 0),
        (4, "purchase", 0),    # same instant -> lat 0
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array([r[2] for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q.q_funnel_latency(str(tmp_path)).to_pandas().iloc[0]
    assert out["n_converted"] == 2
    assert out["sum_lat_us"] == 300
    assert out["min_lat_us"] == 0 and out["max_lat_us"] == 300
    assert out["mean_lat_us"] == 150


def test_event_trigram_paths_user_boundaries(ray_session, tmp_path):
    """Triples never span users; counts follow each user's (ts,
    event_id) order."""
    import pyarrow.parquet as pq

    rows = [  # (user, type, t)
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2), (1, "view", 3),
        (2, "view", 0), (2, "click", 1),  # only 2 events: no triple
        (3, "view", 0), (3, "click", 1), (3, "purchase", 2),
    ]
    t = pa.table(
        {
            "event_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "ts": pa.array([r[2] for r in rows], type=pa.int64()).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = q.q_event_trigram_paths(str(tmp_path)).to_pandas()
    got = {(r.t1, r.t2, r.t3): r.n for r in out.itertuples()}
    assert got == {
        ("view", "click", "purchase"): 2,
        ("click", "purchase", "view"): 1,
    }


def test_session_new_operators_survive_empty_inputs(ray_session, tmp_path):
    """Every operator added in the round-4 continuation returns an
    empty or zero-valued result (not an exception) on zero-row input
    tables — the empty-corpus guard extended to the new families."""
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "text": pa.array([], type=pa.string()),
                "lang": pa.array([], type=pa.string()),
                "source": pa.array([], type=pa.string()),
                "n_chars": pa.array([], type=pa.int64()),
            }
        ),
        f"{sf_dir}/documents.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "user_id": pa.array([], type=pa.int64()),
                "event_type": pa.array([], type=pa.string()),
                "value": pa.array([], type=pa.float64()),
                "props": pa.array([], type=pa.string()),
            }
        ),
        f"{sf_dir}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([], type=pa.int64()),
                "o_custkey": pa.array([], type=pa.int64()),
                "o_orderstatus": pa.array([], type=pa.string()),
                "o_totalprice": pa.array([], type=pa.float64()),
                "o_orderdate": pa.array([], type=pa.timestamp("us")),
                "o_orderpriority": pa.array([], type=pa.string()),
            }
        ),
        f"{sf_dir}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float32())),
                "label": pa.array([], type=pa.int32()),
            }
        ),
        f"{sf_dir}/embeddings.parquet",
    )

    # doc family: zero rows out
    for fn in (
        q.q_doc_surprisal,
        q.q_doc_span_corruption,
        q.q_doc_curation_priority,
        q.q_doc_bottomk_sample,
    ):
        res = fn(sf_dir)
        n = res.num_rows if isinstance(res, pa.Table) else res.count()
        assert n == 0, fn.__name__
    # sketches / scalars: one row, zero-valued
    r = q.q_token_kmv_distinct(sf_dir)
    assert r.column("est_distinct")[0].as_py() == 0
    r = q.q_token_overlap_sketch(sf_dir)
    assert r.column("k_used")[0].as_py() == 0
    # event family
    assert q.q_event_trigram_paths(sf_dir).num_rows == 0
    r = q.q_funnel_latency(sf_dir)
    assert r.column("n_converted")[0].as_py() == 0
    r = q.q_user_cm_sketch(sf_dir)
    assert sum(r.column("est_count").to_pylist()) == 0
    # orders family
    out = q.q_customer_rfm(sf_dir)
    n = out.num_rows if isinstance(out, pa.Table) else out.count()
    assert n == 0
    assert q.q_order_volume_cumulative(sf_dir).num_rows == 0
    assert q.q_cohort_revenue(sf_dir).count() == 0
    # embeddings family
    assert q.q_embedding_power_iteration(sf_dir).num_rows == 0
    assert q.q_embedding_truncation_error(sf_dir).count() == 0


def test_supplier_attach_exchange_fallback_matches_broadcast(
    ray_session, monkeypatch
):
    """Past Q5_SUPPLIER_BROADCAST_BUDGET the supplier-nation attach must
    ride the third tagged-union keyed exchange on l_suppkey and return
    tables identical to the broadcast path, for all three Q5/Q7/Q8
    shapes (the keep_best anti-join fallback idiom)."""
    sf = "/root/testdata/sf0.001"
    fns = [
        q.q_local_supplier_volume,
        q.q_nation_pair_volume,
        q.q_nation_market_share,
        q.q_part_revenue_by_nation,
    ]
    want = [fn(sf) for fn in fns]
    want = [w if isinstance(w, pa.Table) else w.to_arrow_refs() and None for w in want]

    monkeypatch.setattr(q, "Q5_SUPPLIER_BROADCAST_BUDGET", 0)
    got = [fn(sf) for fn in fns]
    for fn, w, g in zip(fns, want, got):
        assert w is not None, f"{fn.__name__} did not return a pa.Table"
        gp = g.to_pandas().sort_values(list(g.column_names)).reset_index(drop=True)
        wp = w.to_pandas().sort_values(list(w.column_names)).reset_index(drop=True)
        assert gp.equals(wp), f"{fn.__name__} exchange path diverged"


def test_jaccard_df_cap_bounds_boilerplate_fanout(ray_session, tmp_path):
    """A corpus where EVERY doc shares one boilerplate 3-gram: with the
    df cap the stop gram's O(n^2) fan-out is skipped (no pair may rely
    on it), while true duplicate pairs (sharing many rare grams) still
    pair; without the cap the boilerplate gram alone must NOT reach the
    J >= 1/2 threshold, so results agree on this corpus."""
    import pyarrow.parquet as pq

    # 12 docs with the same boilerplate sentence prefix, unique bodies;
    # docs 100/101 are verbatim duplicates of each other
    boiler = "all rights reserved"
    rows = []
    for d in range(12):
        rows.append((d, f"{boiler} unique body {d} alpha beta gamma delta {d}"))
    dup_text = f"{boiler} identical duplicate content here repeated words"
    rows += [(100, dup_text), (101, dup_text)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    capped = q.q_doc_jaccard_pairs(str(tmp_path), max_df=4).to_pandas()
    pairs = set(zip(capped["doc_id"], capped["dup_of"]))
    assert pairs == {(100, 101)}  # dup pair survives the cap
    uncapped = q.q_doc_jaccard_pairs(str(tmp_path)).to_pandas()
    assert set(zip(uncapped["doc_id"], uncapped["dup_of"])) == {(100, 101)}


def test_order_laggard_unique_rule_and_ties(ray_session, tmp_path):
    """Q21-shape rule on a hand-built fixture: single-supplier orders
    never count; a tie at the order max disqualifies BOTH suppliers;
    the unique latest supplier of a multi-supplier order counts."""
    import pyarrow.parquet as pq

    rows = [
        # order 1: s1 late, s2 early -> s1 laggard
        (1, 1, "1996-03-01"), (1, 2, "1996-01-01"),
        # order 2: tie at the max -> nobody
        (2, 1, "1996-05-01"), (2, 2, "1996-05-01"),
        # order 3: single supplier -> nobody
        (3, 1, "1996-07-01"),
        # order 4: s2 latest among three -> s2 laggard
        (4, 1, "1996-01-05"), (4, 2, "1996-09-01"), (4, 3, "1996-02-01"),
    ]
    import pandas as pd

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in rows], type=pa.int64()),
                "l_suppkey": pa.array([r[1] for r in rows], type=pa.int64()),
                "l_shipdate": pa.array(
                    pd.to_datetime([r[2] for r in rows]), type=pa.timestamp("us")
                ),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
                "s_name": pa.array(["sa", "sb", "sc"]),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    out = q.q_order_laggard_suppliers(str(tmp_path)).to_pandas()
    got = dict(zip(out["s_suppkey"], out["n_orders"]))
    assert got == {1: 1, 2: 1}


def test_part_revenue_by_nation_filter_and_grid(ray_session):
    """Q9 shape vs a direct DuckDB recompute at sf0.001 (full
    four-table join with the substring part filter)."""
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = (
        q.q_part_revenue_by_nation(sf)
        .to_pandas()
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("lineitem", "part", "supplier", "nation", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = con.execute(
        f"""
        SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))::BIGINT
                   AS revenue_c10k
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
                   AND p.p_name LIKE '%{q.Q9_PART_SUBSTR}%'
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df().reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_containment_catches_subset_jaccard_misses(ray_session, tmp_path):
    """A short doc fully embedded in a long one: containment flags the
    short->long direction while symmetric Jaccard (J ~ nA/nB) misses
    the pair entirely — the operator's reason to exist."""
    import pyarrow.parquet as pq

    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"unrelated filler token{i} body{i} extra{i}" for i in range(40))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": pa.array([quote, quote + " " + filler]),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    cont = q.q_doc_containment_pairs(str(tmp_path)).to_pandas()
    assert (1, 2) in set(zip(cont["doc_id"], cont["contained_in"]))
    assert (2, 1) not in set(zip(cont["doc_id"], cont["contained_in"]))
    jac = q.q_doc_jaccard_pairs(str(tmp_path)).to_pandas()
    assert len(jac) == 0  # symmetric Jaccard is blind to the subset


def test_event_rolling_median_window_algebra(ray_session, tmp_path):
    """Hand-built series: warm-up frames (width < W), an even-width
    frame's two-middle sum, and a spike day that drags the mean but
    not the median."""
    import pandas as pd
    import pyarrow.parquet as pq

    # one type, daily counts 1,3,5,100,7 (day 4 is a spike)
    rows = []
    counts = [1, 3, 5, 100, 7]
    for d, c in enumerate(counts):
        for i in range(c):
            rows.append((len(rows), f"2024-03-{d+1:02d} 10:00:00", 1, "click", 0.0, "{}"))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(pd.to_datetime([r[1] for r in rows]), type=pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], type=pa.float64()),
                "props": pa.array([r[5] for r in rows]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = (
        q.q_event_rolling_median(str(tmp_path))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    # frames: [1] [1,3] [1,3,5] [1,3,5,100] [1,3,5,7,100]
    assert out["median7_x2"].tolist() == [2, 4, 6, 8, 10]


def test_leakage_safe_split_same_split_per_cluster_and_fallback(ray_session):
    """Every near-dup cluster's members share ONE split (the leakage
    guard); unclustered docs agree with the plain per-doc split; the
    over-budget keyed-exchange fallback returns the identical table."""
    sf = "/root/testdata/sf0.01"
    out = q.q_doc_split_leakage_safe(sf).to_pandas()
    clusters = q.q_doc_dup_clusters(sf).to_pandas()
    merged = clusters.merge(out, on="doc_id")
    assert (merged.groupby("cluster_id")["split"].nunique() == 1).all()
    plain = q.q_doc_split(sf).to_pandas()
    unclustered = out[~out["doc_id"].isin(set(clusters["doc_id"]))]
    cmp = unclustered.merge(plain, on="doc_id", suffixes=("_safe", "_plain"))
    assert (cmp["split_safe"] == cmp["split_plain"]).all()

    fb = (
        q.q_doc_split_leakage_safe(sf, cluster_broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert fb.equals(out.sort_values("doc_id").reset_index(drop=True))
