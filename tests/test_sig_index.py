"""Persisted signature index: ingest verdicts, exactly-once replay,
crash invisibility, and the parameter guard. Result CORRECTNESS vs the
sequential oracle is covered by the DuckDB mirror in test_entry.py
(`doc_incremental_dedup`)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from embulk_input_marketo_ray.stages.sig_index import (
    _load_manifest,
    _manifest_path,
    init_index,
    ingest,
)


def _docs_ds(rows):
    # the plan snapshots DataContext at dataset CREATION time, so the
    # shuffle strategy must be set before from_arrow (the queries()
    # wrapper does the same for catalog entries)
    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


LONG_A = "the quick brown fox jumps over the lazy dog " * 30
LONG_B = "entirely different content about distributed query engines " * 30


def test_ingest_flags_cross_batch_and_in_batch_dups(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    init_index(idx)

    # wave 1: two distinct docs -> both admitted
    r1 = ingest(idx, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    assert r1.column("status").to_pylist() == ["admitted", "admitted"]

    # wave 2: 31 dups wave-1 doc 10; 40+41 dup each other (in-batch);
    # 50 is novel
    r2 = ingest(
        idx,
        _docs_ds(
            [
                (31, LONG_A),
                (40, LONG_B.replace("query", "data")),
                (41, LONG_B.replace("query", "data")),
                (50, "totally novel text that matches nothing else here " * 30),
            ]
        ),
        "w2",
    )
    got = {r["doc_id"]: (r["status"], r["dup_of"]) for r in r2.to_pylist()}
    assert got[31] == ("dup", 10)  # cross-batch, against the index
    assert got[40] == ("admitted", None)  # in-batch min is the keeper
    assert got[41] == ("dup", 40)
    assert got[50] == ("admitted", None)

    # only admitted docs entered the index: a third wave dup of 41's
    # text must resolve to 40 (the admitted representative), not 41
    r3 = ingest(idx, _docs_ds([(60, LONG_B.replace("query", "data"))]), "w3")
    assert r3.to_pylist() == [{"doc_id": 60, "status": "dup", "dup_of": 40}]


def test_reingest_committed_id_replays_without_recompute(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    init_index(idx)
    r1 = ingest(idx, _docs_ds([(1, LONG_A)]), "w1")
    state_before = _load_manifest(idx)

    # replay with DIFFERENT data under the SAME ingest_id: the recorded
    # result returns and neither the manifest nor the index changes
    r1b = ingest(idx, _docs_ds([(999, LONG_B)]), "w1")
    assert r1b.to_pylist() == r1.to_pylist()
    assert _load_manifest(idx) == state_before


def test_uncommitted_partial_files_are_invisible(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A)]), "w1")

    # simulate a crashed ingest: data files exist, manifest never
    # committed -> a probe must not see doc 77
    state = _load_manifest(idx)
    some_bucket_dir = os.path.join(idx, "bands", "bucket=0")
    os.makedirs(some_bucket_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "band": pa.array([0], type=pa.int32()),
                "band_hash": pa.array([123], type=pa.uint64()),
                "doc_id": pa.array([77], type=pa.int64()),
            }
        ),
        os.path.join(some_bucket_dir, "crashed.parquet"),
    )
    assert _load_manifest(idx) == state  # manifest untouched

    r2 = ingest(idx, _docs_ds([(30, LONG_A)]), "w2")
    assert r2.to_pylist() == [{"doc_id": 30, "status": "dup", "dup_of": 10}]


def test_param_mismatch_raises(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    init_index(idx, num_bands=16)
    init_index(idx, num_bands=16)  # idempotent
    try:
        init_index(idx, num_bands=8)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "not comparable" in str(e)


def test_compact_and_vacuum_preserve_probe_results(ray_session, tmp_path):
    """compact_index folds per-ingest files into one base per bucket;
    probes after compaction (and after vacuum reclaims the superseded
    files) return identical verdicts; orphans from a simulated crashed
    compaction are vacuumed; re-compact + re-vacuum converge."""
    from embulk_input_marketo_ray.stages.sig_index import (
        compact_index,
        vacuum_index,
    )

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    ingest(idx, _docs_ds([(30, LONG_A.replace("dog", "cat"))]), "w2")

    before = ingest(
        idx, _docs_ds([(90, LONG_A), (91, LONG_B), (92, "novel stuff " * 60)]), "probe1"
    ).to_pylist()
    assert [(r["status"], r["dup_of"]) for r in before] == [
        ("dup", 10),
        ("dup", 20),
        ("admitted", None),  # 92 is admitted INTO the index here
    ]

    bases = compact_index(idx)
    assert bases and all(os.path.basename(p).startswith("base-1") for p in bases)

    # superseded per-ingest files still on disk until vacuum; the
    # default grace window protects an in-flight ingest's fresh files
    # (everything here is seconds old), so this quiesced test passes 0
    assert vacuum_index(idx) == []  # grace window skips fresh files
    removed = vacuum_index(idx, grace_seconds=0.0)
    assert removed  # the folded ingest files went away
    assert not any("base-1" in p for p in removed)

    # verdicts through the compacted+vacuumed index: same dup targets,
    # plus 192 now matches the doc 92 probe1 admitted
    after = ingest(
        idx, _docs_ds([(190, LONG_A), (191, LONG_B), (192, "novel stuff " * 60)]), "probe2"
    ).to_pylist()
    assert [(r["status"], r["dup_of"]) for r in after] == [
        ("dup", 10),
        ("dup", 20),
        ("dup", 92),
    ]

    # crashed compaction: orphan base file, manifest untouched
    orphan = os.path.join(idx, "bands", "bucket=0", "base-99.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "band": pa.array([0], type=pa.int32()),
                "band_hash": pa.array([1], type=pa.uint64()),
                "doc_id": pa.array([777], type=pa.int64()),
            }
        ),
        orphan,
    )
    assert orphan in vacuum_index(idx, grace_seconds=0.0)
    assert vacuum_index(idx, grace_seconds=0.0) == []  # converged


def test_compact_commit_does_not_fold_concurrent_ingest(ray_session, tmp_path):
    """An ingest that commits BETWEEN compact's fold snapshot and its
    manifest commit must stay unfolded (its files were not folded into
    the new bases): marking it folded would drop its rows from probes
    and let vacuum delete its files — permanent data loss."""
    from embulk_input_marketo_ray.stages import sig_index as si
    from embulk_input_marketo_ray.stages.sig_index import compact_index, vacuum_index

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A)]), "w1")

    # interleave: commit a second ingest AFTER compact reads its fold
    # snapshot but BEFORE compact takes the commit lock — the widest
    # window the lock leaves open. The nested ingest re-enters the
    # hooked lock; the fired flag makes that call delegate straight to
    # the real lock (no self-deadlock).
    import contextlib

    real_lock = si._manifest_lock
    fired = {"done": False}

    @contextlib.contextmanager
    def hooked_lock(index_dir, **kw):
        if not fired["done"]:
            fired["done"] = True
            ingest(idx, _docs_ds([(20, LONG_B)]), "w2")
        with real_lock(index_dir, **kw):
            yield

    si._manifest_lock = hooked_lock
    try:
        compact_index(idx)
    finally:
        si._manifest_lock = real_lock

    state = _load_manifest(idx)
    # w2's commit was not clobbered by compact's read-modify-write...
    assert "w2" in state["ingests"]
    assert state["ingests"]["w1"]["folded"] is True
    # ...and it is NOT marked folded (its files are not in the bases)
    assert not state["ingests"]["w2"].get("folded")

    # w2's rows still probe-visible, and vacuum does not remove them
    vacuum_index(idx, grace_seconds=0.0)
    r = ingest(idx, _docs_ds([(30, LONG_B)]), "w3")
    assert r.to_pylist() == [{"doc_id": 30, "status": "dup", "dup_of": 20}]


def test_crashed_ingest_retry_converges(ray_session, tmp_path):
    """A crash AFTER data files are written but BEFORE the manifest
    commit leaves partials invisible; retrying the same ingest_id
    rewrites them deterministically and commits — final state
    byte-identical to a never-crashed run (same verdicts, same files
    resolved, a later probe sees the same index)."""
    import glob

    from embulk_input_marketo_ray.stages import sig_index as si

    # reference run, no crash
    idx_a = str(tmp_path / "a")
    init_index(idx_a)
    ra1 = ingest(idx_a, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")

    # crashed run: monkey-simulate by doing the ingest, then rolling
    # the manifest back to pre-ingest (data files stay = the crash
    # state "files written, manifest not committed")
    idx_b = str(tmp_path / "b")
    state0 = init_index(idx_b)
    ingest(idx_b, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    si._write_manifest(idx_b, state0)  # roll back the commit

    # retry the SAME ingest: must recompute (not replay), overwrite the
    # partials, and commit
    rb1 = ingest(idx_b, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    assert rb1.to_pylist() == ra1.to_pylist()
    files_a = sorted(
        os.path.relpath(p, idx_a) for p in glob.glob(f"{idx_a}/*/bucket=*/*.parquet")
    )
    files_b = sorted(
        os.path.relpath(p, idx_b) for p in glob.glob(f"{idx_b}/*/bucket=*/*.parquet")
    )
    assert files_a == files_b

    # a later probe behaves identically on both indexes
    pa_ = ingest(idx_a, _docs_ds([(30, LONG_A)]), "w2").to_pylist()
    pb_ = ingest(idx_b, _docs_ds([(30, LONG_A)]), "w2").to_pylist()
    assert pa_ == pb_ == [{"doc_id": 30, "status": "dup", "dup_of": 10}]


def test_ingest_refuses_duplicated_doc_id(ray_session, tmp_path):
    """uid contract: one row per doc_id per ingest batch — a duplicated
    id has no well-defined verdict, so ingest refuses loudly instead of
    marking one occurrence and appending ambiguous index rows."""
    import pytest

    idx = str(tmp_path / "idx")
    init_index(idx)
    with pytest.raises(ValueError, match="duplicated doc_id"):
        ingest(idx, _docs_ds([(10, LONG_A), (10, LONG_B)]), "w1")
    # nothing committed: the id is free for a clean retry
    assert "w1" not in _load_manifest(idx)["ingests"]
    r = ingest(idx, _docs_ds([(10, LONG_A)]), "w1")
    assert r.to_pylist()[0]["status"] == "admitted"


def test_pack_sigs_rejects_int32_offset_overflow():
    from embulk_input_marketo_ray.stages.sig_index import pack_sigs

    import pytest

    # a fake fixed-size-list column large enough to overflow int32
    # offsets would need GBs; assert the guard arithmetic directly via
    # a tiny num_perm and a monkeypatched length check instead: the
    # guard fires on (n+1)*width > INT32_MAX
    class FakeCol:
        def __len__(self):
            return (2**31) // 8  # n*width == 2^31 at num_perm=1

        def flatten(self):
            raise AssertionError("guard must fire before flatten is used")

    with pytest.raises(ValueError, match="too large for int32"):
        pack_sigs(FakeCol(), num_perm=1)


# ---------------------------------------------------------------------------
# tombstone deletes
# ---------------------------------------------------------------------------


def test_delete_excludes_from_probes_and_readmits(ray_session, tmp_path):
    """A doc identical to a DELETED doc is admitted (the erasure story);
    an identical doc matching a surviving doc still flags dup."""
    from embulk_input_marketo_ray.stages.sig_index import delete_docs

    idx = str(tmp_path / "idx")
    init_index(idx)
    r1 = ingest(idx, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    assert r1.column("status").to_pylist() == ["admitted", "admitted"]

    delete_docs(idx, [10], "d1")
    r2 = ingest(idx, _docs_ds([(31, LONG_A), (32, LONG_B)]), "w2")
    got = dict(zip(r2.column("doc_id").to_pylist(), r2.column("status").to_pylist()))
    assert got == {31: "admitted", 32: "dup"}  # 10 erased, 20 survives


def test_delete_replay_idempotent_and_crash_invisible(ray_session, tmp_path):
    """A committed delete_id replays without effect; a tombstone file
    WITHOUT a manifest entry (crash before commit) is invisible."""
    from embulk_input_marketo_ray.stages.sig_index import (
        _tombstone_entries,
        delete_docs,
    )

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A)]), "w1")
    m1 = delete_docs(idx, [10], "d1")
    m2 = delete_docs(idx, [10, 999], "d1")  # replay: ids ignored
    assert m1 == m2 and m1["n"] == 1

    # crash simulation: partial tombstone file, no manifest entry
    orphan = pa.table({"doc_id": pa.array([20], type=pa.int64())})
    pq.write_table(orphan, os.path.join(idx, "deletes", "crashed.parquet"))
    state = _load_manifest(idx)
    assert set(_tombstone_entries(state, idx)[0].tolist()) == {10}


def test_compact_folds_tombstones_and_vacuum_reclaims(ray_session, tmp_path):
    """After compaction the tombstoned doc is gone from the BASES (probe
    result unchanged with zero live tombstones), the delete entry is
    folded, and vacuum reclaims its file; a delete committed AFTER the
    fold snapshot stays live."""
    from embulk_input_marketo_ray.stages.sig_index import (
        _tombstone_entries,
        compact_index,
        delete_docs,
        vacuum_index,
    )

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    delete_docs(idx, [10], "d1")
    compact_index(idx)
    state = _load_manifest(idx)
    assert state["deletes"]["d1"]["folded"] is True
    assert len(_tombstone_entries(state, idx)[0]) == 0

    # the erased doc is really gone from the bases
    r = ingest(idx, _docs_ds([(31, LONG_A), (32, LONG_B)]), "w2")
    got = dict(zip(r.column("doc_id").to_pylist(), r.column("status").to_pylist()))
    assert got == {31: "admitted", 32: "dup"}

    removed = vacuum_index(idx, grace_seconds=0)
    assert any("d1.parquet" in p for p in removed)
    # a fresh (unfolded) delete's file survives vacuum
    delete_docs(idx, [20], "d2")
    removed2 = vacuum_index(idx, grace_seconds=0)
    assert not any("d2.parquet" in p for p in removed2)
    assert os.path.exists(os.path.join(idx, "deletes", "d2.parquet"))


def test_probe_docs_read_only_and_matches_ingest(ray_session, tmp_path):
    """probe_docs returns the same verdicts a real ingest would, and
    leaves manifest + filesystem untouched (re-probing and then
    ingesting behaves as if the probe never happened)."""
    import glob

    from embulk_input_marketo_ray.stages.sig_index import probe_docs

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A), (20, LONG_B)]), "w1")
    before_manifest = open(_manifest_path(idx)).read()
    before_files = sorted(glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True))

    batch = [(31, LONG_A), (40, "totally novel prose " * 40)]
    p = probe_docs(idx, _docs_ds(batch))
    got = dict(zip(p.column("doc_id").to_pylist(), p.column("status").to_pylist()))
    assert got == {31: "dup", 40: "admitted"}

    assert open(_manifest_path(idx)).read() == before_manifest
    after_files = sorted(glob.glob(os.path.join(idx, "**", "*.parquet"), recursive=True))
    assert after_files == before_files

    # the real ingest after the probe sees the same verdicts
    r = ingest(idx, _docs_ds(batch), "w2")
    got2 = dict(zip(r.column("doc_id").to_pylist(), r.column("status").to_pylist()))
    assert got2 == got


def test_readmit_after_delete_is_probe_visible_and_survives_compaction(
    ray_session, tmp_path
):
    """The re-crawl / GDPR-then-reconsent flow: delete doc 10, re-ingest
    the SAME id — the re-admitted rows must be live to later probes
    (tombstones are seq-scoped to ingests committed BEFORE the delete)
    and must survive compaction's fold instead of silently vanishing."""
    from embulk_input_marketo_ray.stages.sig_index import (
        compact_index,
        delete_docs,
        vacuum_index,
    )

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A)]), "w1")
    delete_docs(idx, [10], "d1")
    # re-arrival of the deleted id: admitted again (not matched against
    # its own dead rows)
    r2 = ingest(idx, _docs_ds([(10, LONG_A)]), "w2")
    assert r2.column("status").to_pylist() == ["admitted"]

    # the re-admitted doc is LIVE index state: a near-identical arrival
    # dups against it even though the tombstone is still unfolded
    r3 = ingest(idx, _docs_ds([(31, LONG_A)]), "w3")
    assert r3.to_pylist() == [{"doc_id": 31, "status": "dup", "dup_of": 10}]

    # compaction folds the tombstone WITHOUT dropping the re-admitted
    # rows (only pre-delete rows are scoped to the tombstone)
    compact_index(idx)
    vacuum_index(idx, grace_seconds=0)
    state = _load_manifest(idx)
    assert state["deletes"]["d1"]["folded"] is True
    r4 = ingest(idx, _docs_ds([(52, LONG_A)]), "w4")
    assert r4.column("status").to_pylist() == ["dup"]
    assert r4.column("dup_of").to_pylist() == [10]


def test_compaction_snapshot_interleaved_ingest_and_vacuum_grace(
    ray_session, tmp_path, monkeypatch
):
    """The two lifecycle races ADVICE flagged, exercised for real: an
    ingest that commits BETWEEN compaction's snapshot and its manifest
    commit (1) keeps its rows probe-visible afterwards (it must NOT be
    marked folded by that compaction) and (2) its files survive a
    post-compaction vacuum with the default grace window."""
    import embulk_input_marketo_ray.stages.sig_index as si

    idx = str(tmp_path / "idx")
    init_index(idx)
    ingest(idx, _docs_ds([(10, LONG_A)]), "w1")

    # interleave: fire the w2 ingest commit inside compaction's window
    # between its state snapshot and its manifest commit, by hooking the
    # manifest-lock acquisition compaction takes for its final commit
    real_lock = si._manifest_lock
    fired = {"done": False}

    def lock_with_interleaved_ingest(index_dir, **kw):
        if not fired["done"]:
            fired["done"] = True  # before re-entering: ingest locks too
            ingest(idx, _docs_ds([(20, LONG_B)]), "w2")
        return real_lock(index_dir, **kw)

    monkeypatch.setattr(si, "_manifest_lock", lock_with_interleaved_ingest)
    si.compact_index(idx)
    monkeypatch.setattr(si, "_manifest_lock", real_lock)

    state = _load_manifest(idx)
    # w1 folded into the base; the interleaved w2 must NOT be folded
    assert state["ingests"]["w1"]["folded"] is True
    assert not state["ingests"]["w2"].get("folded")

    # vacuum with the default grace must spare w2's freshly-written,
    # still-referenced files; with grace it spares even unreferenced
    # fresh files, so check nothing referenced is gone via a probe
    si.vacuum_index(idx)
    r = ingest(idx, _docs_ds([(31, LONG_B), (32, LONG_A)]), "w3")
    got = dict(zip(r.column("doc_id").to_pylist(), r.column("status").to_pylist()))
    assert got == {31: "dup", 32: "dup"}  # both w1 (base) and w2 rows live


def test_randomized_lifecycle_matches_sequential_reference(ray_session, tmp_path):
    """Model-based check of the whole index state machine: a SEEDED
    random schedule of {ingest wave, delete admitted ids, re-ingest
    deleted ids, compact, vacuum} runs against BOTH the engine index
    and a dict-based sequential reference built from the ORACLE's
    helpers (independent code path). Every wave's verdicts must match
    exactly — pinning the seq-scoped tombstone semantics (a deleted id
    stops matching, a re-admitted id matches again) through arbitrary
    interleavings with compaction and vacuum."""
    import numpy as np

    from embulk_input_marketo_ray.pipelines.oracles import (
        _band_hash,
        _band_mult,
        _minhash_params,
        _minhash_signature,
        _SIGIDX_AGREE_SLOTS,
        _SIGIDX_NUM_BANDS,
        _MINHASH_NUM_PERM,
    )
    from embulk_input_marketo_ray.stages.sig_index import (
        compact_index,
        delete_docs,
        vacuum_index,
    )

    # corpus: 8 near-dup families x 6 variants; variants mutate one
    # trailing token so family members stay above the agree threshold
    bases = [
        f"family {f} shares this very long repeated base sentence about "
        f"distributed data engines and exactly once ingestion pipeline "
        f"semantics with plenty of shingles to hash " * 3
        for f in range(8)
    ]
    corpus = {}
    for f, base in enumerate(bases):
        for v in range(6):
            corpus[f * 10 + v] = base + f" variant{v}"

    a, b = _minhash_params()
    mult = _band_mult()
    r = _MINHASH_NUM_PERM // _SIGIDX_NUM_BANDS
    sig_of = {i: _minhash_signature(t, a, b) for i, t in corpus.items()}
    bands_of = {
        i: [
            (band, _band_hash(s[band * r : (band + 1) * r], mult[band * r : (band + 1) * r]))
            for band in range(_SIGIDX_NUM_BANDS)
        ]
        for i, s in sig_of.items()
    }

    def ref_ingest(index_bands, index_sigs, wave_ids):
        wave_ids = sorted(wave_ids)
        new_buckets = {}
        for i in wave_ids:
            for key in bands_of[i]:
                new_buckets.setdefault(key, []).append(i)
        out = {}
        admitted = []
        for i in wave_ids:
            best_old = best_new = None
            for key in bands_of[i]:
                olds = index_bands.get(key)
                if olds:
                    mo = min(olds)
                    agree = sum(
                        1 for x, y in zip(sig_of[i], index_sigs[mo]) if x == y
                    )
                    if agree >= _SIGIDX_AGREE_SLOTS and (best_old is None or mo < best_old):
                        best_old = mo
                mn = min(new_buckets[key])
                if mn < i:
                    agree = sum(1 for x, y in zip(sig_of[i], sig_of[mn]) if x == y)
                    if agree >= _SIGIDX_AGREE_SLOTS and (best_new is None or mn < best_new):
                        best_new = mn
            if best_old is not None:
                out[i] = ("dup", best_old)
            elif best_new is not None:
                out[i] = ("dup", best_new)
            else:
                out[i] = ("admitted", None)
                admitted.append(i)
        for i in admitted:
            index_sigs[i] = sig_of[i]
            for key in bands_of[i]:
                index_bands.setdefault(key, []).append(i)
        return out

    def ref_delete(index_bands, index_sigs, ids):
        for i in ids:
            index_sigs.pop(i, None)
            for key in bands_of[i]:
                lst = index_bands.get(key)
                if lst and i in lst:
                    lst.remove(i)

    idx = str(tmp_path / "idx")
    init_index(idx)
    index_bands, index_sigs = {}, {}
    rng = np.random.default_rng(17)
    never_ingested = set(corpus)
    deleted = set()
    admitted_live = set()

    for wave in range(6):
        pool = sorted(never_ingested | deleted)
        if not pool:
            break
        take = rng.choice(pool, size=min(len(pool), int(rng.integers(4, 10))), replace=False)
        wave_ids = sorted(int(x) for x in take)
        never_ingested -= set(wave_ids)
        deleted -= set(wave_ids)

        got = ingest(idx, _docs_ds([(i, corpus[i]) for i in wave_ids]), f"w{wave}")
        want = ref_ingest(index_bands, index_sigs, wave_ids)
        got_map = {
            int(row["doc_id"]): (row["status"], row["dup_of"])
            for row in got.to_pylist()
        }
        assert got_map == want, f"wave {wave} diverged: {got_map} vs {want}"
        admitted_live |= {i for i, (s, _) in want.items() if s == "admitted"}

        # random deletes of currently-admitted docs
        if admitted_live and rng.random() < 0.8:
            kill = sorted(
                int(x)
                for x in rng.choice(
                    sorted(admitted_live),
                    size=min(len(admitted_live), int(rng.integers(1, 4))),
                    replace=False,
                )
            )
            delete_docs(idx, kill, f"d{wave}")
            ref_delete(index_bands, index_sigs, kill)
            admitted_live -= set(kill)
            deleted |= set(kill)

        # random maintenance: must never change probe semantics
        if rng.random() < 0.5:
            compact_index(idx)
        if rng.random() < 0.5:
            vacuum_index(idx, grace_seconds=0)
