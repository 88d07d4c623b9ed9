"""Unit tests for the training-data text / dedup kernels."""

import numpy as np
import pyarrow as pa

from embulk_input_marketo_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    add_content_hash,
    exact_dedup_keep_first,
    explode_lsh_bands,
    lsh_bucket_to_pairs,
    ngram_jaccard,
)
from embulk_input_marketo_ray.stages.text import (
    Fingerprinter,
    LangId,
    QualityScorer,
    token_counts,
)


def _docs():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                "the quick brown fox jumps over the lazy dog",
                "the quick brown fox jumps over the lazy dog",  # exact dup of 1
                "der Hund und die Katze und das Pferd ist gut",
                "completely different words entirely here now folks",
            ],
        }
    )


def test_token_counts():
    out = token_counts(pa.table({"text": ["a b  c", "", "x,y"]}))
    assert out.column("n_tokens_ws").to_pylist() == [3, 0, 1]
    assert out.column("n_tokens_bpe").to_pylist() == [3, 0, 3]  # x , y


def test_quality_scorer():
    out = QualityScorer()(_docs())
    rows = out.to_pylist()
    assert rows[0]["n_words"] == 9
    assert rows[0]["quality_ok"]
    assert 0 <= rows[0]["stopword_ratio"] <= 1


def test_langid_picks_marker_language():
    out = LangId()(_docs()).to_pylist()
    assert out[0]["lang_pred"] == "en"
    assert out[2]["lang_pred"] == "de"
    assert out[3]["lang_pred"] == "unknown"


def test_fingerprint_deterministic_and_identity():
    f = Fingerprinter()
    out1 = f(_docs()).column("fingerprint").to_pylist()
    out2 = Fingerprinter()(_docs()).column("fingerprint").to_pylist()
    assert out1 == out2
    assert out1[0] == out1[1]  # identical docs -> identical fingerprint
    assert out1[0] != out1[3]


def test_exact_dedup_keep_first():
    hashed = add_content_hash(_docs())
    out = exact_dedup_keep_first(hashed)
    ids = sorted(out.column("doc_id").to_pylist())
    assert ids == [1, 3, 4]  # doc 2 collapsed into doc 1


def test_minhash_identical_docs_identical_signatures():
    mh = MinHasher(num_perm=32)
    out = mh(_docs())
    sigs = np.asarray(out.column("minhash").combine_chunks().flatten()).reshape(4, 32)
    assert (sigs[0] == sigs[1]).all()
    assert (sigs[0] != sigs[3]).mean() > 0.8  # unrelated docs disagree


def test_minhash_near_dup_high_overlap():
    a = "the quick brown fox jumps over the lazy dog again and again every day"
    b = "the quick brown fox jumps over the lazy dog again and again every night"
    mh = MinHasher(num_perm=64)
    sa, sb = mh.signature(a), mh.signature(b)
    assert (sa == sb).mean() > 0.5
    assert ngram_jaccard(a, b) > 0.5


def test_lsh_band_explosion_and_pairs():
    mh = MinHasher(num_perm=32)
    t = mh(_docs())
    bands = explode_lsh_bands(t, num_bands=8)
    assert bands.num_rows == 4 * 8
    # docs 1 and 2 are identical -> every band collides
    import pandas as pd

    df = bands.to_pandas()
    both = df[df.doc_id.isin([1, 2])].groupby(["band", "band_hash"]).doc_id.nunique()
    assert (both == 2).sum() == 8
    one_bucket = pa.table(
        {"doc_id": pa.array([2, 1], type=pa.int64()),
         "band": pa.array([0, 0], type=pa.int32()),
         "band_hash": ["h", "h"]}
    )
    pairs = lsh_bucket_to_pairs(one_bucket)
    assert pairs.to_pylist() == [{"doc_id": 2, "dup_of": 1}]


def test_simhash_properties():
    sh = SimHasher()
    out = sh(_docs()).column("simhash").to_pylist()
    assert out[0] == out[1]
    h0, h3 = int(out[0]), int(out[3])
    assert bin(h0 ^ h3).count("1") > 10  # unrelated docs far apart
    assert sh.simhash("") == 0


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("a b c d", "a b c d") == 1.0
    assert ngram_jaccard("a b c d", "x y z w") == 0.0
    assert ngram_jaccard("", "") == 1.0


def test_simhash_vectorized_matches_reference_kernel():
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "Gamma", "delta42", "x", "the quick", "punct!,;"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 40)))) for _ in range(80)]
    texts += ["", "a", None]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    sh = SimHasher()
    assert sh(t).column("simhash").to_pylist() == [sh.simhash(x or "") for x in texts]


def test_fingerprint_vectorized_matches_reference_kernel():
    import numpy as np

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "Gamma", "delta42", "punct!,;"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 40)))) for _ in range(60)]
    texts += ["", "a", "long doc " * 200, None]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    f = Fingerprinter()
    expect = [
        f"{f._fingerprint((x or '').encode()):016x}" if x is not None else None for x in texts
    ]
    assert f(t).column("fingerprint").to_pylist() == expect


def test_dedup_near_anti_join_fallback_matches_broadcast():
    """Over the loser-broadcast budget the corpus dedup must switch to
    the keyed anti-join and produce the identical surviving-id set."""
    from embulk_input_marketo_ray.pipelines.queries import q_doc_dedup_near

    sf = "/root/testdata/sf0.001"
    bcast = sorted(r["doc_id"] for r in q_doc_dedup_near(sf).take_all())
    # limit=0 forces the join path for ANY non-empty loser set
    joined = sorted(
        r["doc_id"]
        for r in q_doc_dedup_near(sf, loser_broadcast_limit=0).take_all()
    )
    assert len(bcast) > 0
    assert bcast == joined


def test_keep_best_fallback_matches_broadcast_and_counts():
    """keep-best near-dedup: the anti-join fallback produces the
    identical survivor set, and the survivor COUNT equals the min-id
    policy's (same clusters, exactly one survivor per cluster)."""
    from embulk_input_marketo_ray.pipelines.queries import (
        q_doc_dedup_near,
        q_doc_dedup_near_keep_best,
    )

    sf = "/root/testdata/sf0.001"
    best = sorted(r["doc_id"] for r in q_doc_dedup_near_keep_best(sf).take_all())
    joined = sorted(
        r["doc_id"]
        for r in q_doc_dedup_near_keep_best(sf, loser_broadcast_limit=0).take_all()
    )
    assert len(best) > 0
    assert best == joined
    minid = sorted(r["doc_id"] for r in q_doc_dedup_near(sf).take_all())
    assert len(best) == len(minid)


def test_hamming64_and_simhash_block_pairs():
    from embulk_input_marketo_ray.stages.dedup import (
        explode_simhash_blocks,
        hamming64,
        simhash_block_to_pairs,
    )

    a = np.array([0, 0xFFFFFFFFFFFFFFFF, 0b1011], dtype=np.uint64)
    b = np.array([0, 0, 0b0010], dtype=np.uint64)
    assert hamming64(a, b).tolist() == [0, 64, 2]

    # doc 1 and 2 differ in one low bit (same 3 high blocks -> candidates,
    # hamming 1 -> kept); doc 3 is far from both (no shared block)
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "simhash": pa.array(
                [0x1111222233334444, 0x1111222233334445, 0x9999AAAABBBBCCCC],
                type=pa.uint64(),
            ),
        }
    )
    blocks = explode_simhash_blocks(t)
    assert blocks.num_rows == 12  # 3 docs x 4 blocks
    pairs = simhash_block_to_pairs(blocks)
    rows = {(r["doc_id"], r["dup_of"]): r["hamming"] for r in pairs.to_pylist()}
    # the (2, 1) pair surfaces from each of the 3 shared blocks
    assert set(rows) == {(2, 1)}
    assert rows[(2, 1)] == 1


def test_repetition_scores_kernel():
    from embulk_input_marketo_ray.stages.text import repetition_scores

    t = pa.table(
        {
            "text": pa.array(
                ["a b c a b c a b c", "one two three four", "x y", None, ""]
            )
        }
    )
    out = repetition_scores(t).to_pylist()
    assert (out[0]["n_grams"], out[0]["n_distinct_grams"]) == (7, 3)
    assert abs(out[0]["rep_ratio"] - (1 - 3 / 7)) < 1e-12
    assert (out[1]["n_grams"], out[1]["rep_ratio"]) == (2, 0.0)
    for r in out[2:]:
        assert r["n_grams"] == 0 and r["rep_ratio"] == 0.0


def test_pii_scan_counters():
    from embulk_input_marketo_ray.stages.text import pii_scan

    t = pa.table(
        {
            "text": pa.array(
                [
                    "mail bob@example.com or https://x.io/a and 10.0.0.1",
                    "clean prose only",
                    None,
                ]
            )
        }
    )
    out = pii_scan(t).to_pylist()
    assert (out[0]["n_emails"], out[0]["n_urls"], out[0]["n_ipv4"]) == (1, 1, 1)
    assert out[0]["has_pii"] and not out[1]["has_pii"] and not out[2]["has_pii"]


def test_doc_grams_boundaries():
    from embulk_input_marketo_ray.stages.text import doc_grams

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
            "text": pa.array(
                ["a b c d", "", "x, Y!  z", None, "one two"]  # punct/case/null
            ),
        }
    )
    out = doc_grams(t)
    rows = set(zip(out.column("doc_id").to_pylist(), out.column("gram").to_pylist()))
    # no gram crosses a document boundary; short/empty/null docs emit none
    assert rows == {(1, "a b c"), (1, "b c d"), (3, "x y z")}


def test_doc_grams_all_short():
    from embulk_input_marketo_ray.stages.text import doc_grams

    t = pa.table(
        {"doc_id": pa.array([1, 2], type=pa.int64()), "text": pa.array(["a b", ""])}
    )
    out = doc_grams(t)
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "gram"]


def test_decontaminator_distinct_hits_and_empty_bench():
    import ray

    from embulk_input_marketo_ray.stages.text import Decontaminator

    batch = pa.table(
        {
            "doc_id": pa.array([10, 11], type=pa.int64()),
            # doc 10 repeats the benchmark gram twice -> still ONE distinct hit
            "text": pa.array(["p q r s p q r", "clean words only here"]),
        }
    )
    ref = ray.put(pa.array(["p q r", "zzz yyy xxx"], type=pa.string()))
    out = Decontaminator(ref).__call__(batch).to_pylist()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[10]["n_hits"] == 1 and by_id[10]["contaminated"]
    assert by_id[11]["n_hits"] == 0 and not by_id[11]["contaminated"]

    empty_ref = ray.put(pa.array([], type=pa.string()))
    out2 = Decontaminator(empty_ref).__call__(batch).to_pylist()
    assert all(r["n_hits"] == 0 and not r["contaminated"] for r in out2)
