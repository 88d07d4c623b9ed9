"""Deterministic synthetic change-event table generator.

Produces the engine's primary input per ``BASELINE.json:input_hint``:
a Parquet table of source-code-repository change events with base
columns ``(repo, path, commit, lang, content)`` plus engine companion
columns ``commit_seq`` (monotonic version — the watermark /
incremental column, analog of the ``createdAt`` default at reference
``delegate/MarketoBaseBulkExtractInputPlugin.java:78-84``),
``event_ts``, and ``op`` in {upsert, delete} (tombstones), plus
all-string dynamic attribute columns that appear mid-stream per a
schema-evolution log (the describe-driven dynamic-schema analog,
FIXTURES.md F1/F2).

Required properties (FIXTURES.md F1), all seed-deterministic:
- Zipf-skewed repo distribution (hot-key handling exercise).
- Multiple versions of the same (repo, path) across watermark slices.
- Deletes followed by re-creates.
- Events exactly on slice boundaries (half-open +1 s rule proof,
  MarketoUtils.java:100-113).
- Duplicated replayed events (exactly-once check).

Generation is vectorized (numpy / pandas string ops); content strings
carry a deterministic payload so the sha256 invariant is meaningful.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = datetime(2024, 1, 1)  # event_ts = BASE_TS + commit_seq seconds

LANG_FOR_EXT = {"py": "py", "java": "java", "ts": "ts", "go": "go", "rs": "rs", "md": "md"}
_EXTS = list(LANG_FOR_EXT)

# Schema-evolution log (FIXTURES.md F2): dynamic attribute columns that
# become active at effective_seq, expressed in Marketo dataTypes
# (model/MarketoField.java:73-116). `score` later widens integer->float.
def evolution_log(n_events: int) -> list[dict]:
    return [
        {"effective_seq": 0, "kind": "add_column", "column": "score", "from_type": None, "to_type": "integer"},
        {"effective_seq": n_events // 4, "kind": "add_column", "column": "revenue", "from_type": None, "to_type": "currency"},
        {"effective_seq": n_events // 3, "kind": "add_column", "column": "active", "from_type": None, "to_type": "boolean"},
        {"effective_seq": n_events // 2, "kind": "widen_type", "column": "score", "from_type": "integer", "to_type": "float"},
        {"effective_seq": (2 * n_events) // 3, "kind": "add_column", "column": "updated", "from_type": None, "to_type": "datetime"},
    ]


def _commit_hexes(seqs: np.ndarray) -> np.ndarray:
    """40-hex commit ids, deterministic in commit_seq."""
    return np.array(
        [hashlib.sha1(f"commit:{s}".encode()).hexdigest() for s in seqs], dtype=object
    )


def generate_change_events(
    out_dir: str,
    n_events: int,
    seed: int = 42,
    n_repos: int | None = None,
    n_paths_per_repo: int = 64,
    delete_rate: float = 0.05,
    duplicate_rate: float = 0.02,
    n_files: int = 8,
    force: bool = False,
) -> str:
    """Write the change-event table as ``n_files`` Parquet files under
    ``out_dir`` (commit_seq-ordered within and across files). Returns
    ``out_dir``. Idempotent: skips generation if the _SUCCESS marker
    matches the requested parameters.
    """
    params = {
        "n_events": n_events, "seed": seed, "n_repos": n_repos,
        "n_paths_per_repo": n_paths_per_repo, "delete_rate": delete_rate,
        "duplicate_rate": duplicate_rate, "n_files": n_files, "v": 6,
    }
    marker = os.path.join(out_dir, "_SUCCESS")
    if not force and os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == params:
                return out_dir

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    if n_repos is None:
        n_repos = max(8, n_events // 2000)

    # Zipf-ish repo popularity (monorepos are hot keys)
    weights = 1.0 / np.arange(1, n_repos + 1) ** 1.1
    weights /= weights.sum()
    repo_idx = rng.choice(n_repos, size=n_events, p=weights)
    path_idx = rng.integers(0, n_paths_per_repo, size=n_events)

    seqs = np.arange(n_events, dtype=np.int64)
    repo = pd.array([f"org/repo-{i:05d}" for i in range(n_repos)], dtype=object)[repo_idx]
    ext_idx = (repo_idx * 7 + path_idx) % len(_EXTS)
    exts = np.array(_EXTS, dtype=object)[ext_idx]
    path = (
        pd.Series([f"src/m{i % 13:02d}/f_{i:04d}." for i in range(n_paths_per_repo)], dtype=object)[
            path_idx
        ].to_numpy()
        + exts
    )
    lang = np.array([LANG_FOR_EXT[e] for e in _EXTS], dtype=object)[ext_idx]

    op = np.where(rng.random(n_events) < delete_rate, "delete", "upsert").astype(object)
    # deterministic content payload: key + version + filler derived from seq
    filler = np.array(
        [hashlib.md5(f"pad:{s & 1023}".encode()).hexdigest() * 6 for s in range(1024)],
        dtype=object,
    )[seqs & 1023]
    content = (
        pd.Series(repo, dtype=object)
        + "|" + pd.Series(path, dtype=object)
        + "|v" + pd.Series(seqs).astype(str)
        + "|" + pd.Series(filler, dtype=object)
    ).to_numpy()
    content[op == "delete"] = ""

    # dynamic attrs (all-string, with "" / "null" literals sprinkled —
    # CsvTokenizer.java:490-514 null semantics)
    evo = evolution_log(n_events)
    active_from = {e["column"]: e["effective_seq"] for e in evo if e["kind"] == "add_column"}
    widen_at = {e["column"]: e["effective_seq"] for e in evo if e["kind"] == "widen_type"}

    def with_null_literals(values: np.ndarray, start: int) -> np.ndarray:
        out = values.astype(object)
        r = rng.random(n_events)
        out[r < 0.02] = "null"
        out[(r >= 0.02) & (r < 0.04)] = ""
        out[seqs < start] = None
        return out

    score_int = rng.integers(0, 100, size=n_events)
    score_vals = score_int.astype(str).astype(object)
    wseq = widen_at.get("score")
    if wseq is not None:  # widened rows carry float-formatted strings
        fmask = seqs >= wseq
        score_vals[fmask] = np.char.mod("%.1f", score_int[fmask] + 0.5).astype(object)
    attr_score = with_null_literals(score_vals, active_from["score"])
    attr_revenue = with_null_literals(
        np.char.mod("%.2f", rng.random(n_events) * 1e5).astype(object), active_from["revenue"]
    )
    attr_active = with_null_literals(
        np.where(rng.random(n_events) < 0.5, "true", "false").astype(object),
        active_from["active"],
    )
    # 86400 distinct second-of-day timestamps -> build the string pool
    # once and fancy-index (a per-row strftime loop is ~20s at 2M rows)
    ts_pool = np.array(
        [
            (BASE_TS + timedelta(seconds=s)).strftime("%Y-%m-%dT%H:%M:%S+0000")
            for s in range(86400)
        ],
        dtype=object,
    )
    attr_updated = with_null_literals(ts_pool[seqs % 86400], active_from["updated"])

    event_ts = np.datetime64(BASE_TS, "us") + seqs * np.timedelta64(1_000_000, "us")
    # updated_ts: the record's last-touch time (updatedAt analog for
    # W1/use_updated_at) — lags event_ts by a deterministic 0-6 s, so
    # a window sliced on updated_ts selects a different row set than
    # the default createdAt-analog column
    updated_ts = event_ts + (seqs % 7) * np.timedelta64(1_000_000, "us")

    # duplicated replayed events: re-append exact copies of a sample
    # (same commit_seq/commit) — replay must be idempotent (D5).
    n_dup = int(n_events * duplicate_rate)
    dup_idx = np.sort(rng.choice(n_events, size=n_dup, replace=False)) if n_dup else np.array([], dtype=np.int64)

    # Build and write PER seq-range chunk: a single Arrow string column
    # over the whole table overflows int32 offsets past ~2 GB of content
    # (the round-1 "superlinear >5M generation" was actually this
    # failure mode), and chunked build keeps peak memory ∝ chunk.
    columns = {
        "repo": (repo, pa.string()),
        "path": (path, pa.string()),
        "lang": (lang, pa.string()),
        "content": (content, pa.string()),
        "commit_seq": (seqs, pa.int64()),
        "event_ts": (event_ts, pa.timestamp("us")),
        "updated_ts": (updated_ts, pa.timestamp("us")),
        "op": (op, pa.string()),
        "attr_score": (attr_score, pa.string()),
        "attr_revenue": (attr_revenue, pa.string()),
        "attr_active": (attr_active, pa.string()),
        "attr_updated": (attr_updated, pa.string()),
    }
    per = (n_events + n_files - 1) // n_files
    for i in range(n_files):
        lo, hi = i * per, min((i + 1) * per, n_events)
        if lo >= hi:
            continue
        sel = np.arange(lo, hi, dtype=np.int64)
        # interleave this range's duplicated events, keeping seq order
        dups_here = dup_idx[(dup_idx >= lo) & (dup_idx < hi)]
        if len(dups_here):
            sel = np.sort(np.concatenate([sel, dups_here]), kind="stable")
        cols: dict[str, pa.Array] = {}
        for name, (arr, typ) in columns.items():
            if name == "commit_seq":
                cols["commit_seq"] = pa.array(arr[sel], type=typ)
                cols["commit"] = pa.array(_commit_hexes(arr[sel]), type=pa.string())
            else:
                cols[name] = pa.array(arr[sel], type=typ)
        chunk = pa.table(
            {k: cols[k] for k in
             ["repo", "path", "commit", "lang", "content", "commit_seq",
              "event_ts", "updated_ts", "op", "attr_score", "attr_revenue",
              "attr_active", "attr_updated"]}
        )
        # small row groups let readers split one file into several read
        # tasks (override_num_blocks > n_files); 32k rows x ~430 B/row
        # ~= 14 MB per group — big enough to amortize decode, small
        # enough for fine-grained parallelism and row-group pruning
        pq.write_table(
            chunk, os.path.join(out_dir, f"events_{i:04d}.parquet"), row_group_size=32768
        )

    with open(os.path.join(out_dir, "evolution.json"), "w") as f:
        json.dump(evo, f)
    with open(marker, "w") as f:
        json.dump(params, f)
    return out_dir


def load_evolution_log(events_dir: str) -> list[dict]:
    with open(os.path.join(events_dir, "evolution.json")) as f:
        return json.load(f)


def default_events_dir(n_events: int, seed: int = 42) -> str:
    return f"/tmp/graft_change_events/n{n_events}_s{seed}"


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media corpus (no real codecs in the sandbox):
    opaque binary payloads + typed metadata, the input shape of the
    multimodal stages (stages/multimodal.py). Lives here with the other
    synthetic-input generators so the single-process oracle can consume
    the same INPUT without importing engine stages."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [
        hashlib.blake2b(f"media:{i}".encode(), digest_size=32).digest()
        * (payload_bytes // 32)
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "media_type": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_width": pa.array(rng.integers(64, 1920, size=n), type=pa.int32()),
            "meta_height": pa.array(rng.integers(64, 1080, size=n), type=pa.int32()),
            "meta_sample_rate": pa.array(np.full(n, 16000), type=pa.int32()),
            "meta_n_frames": pa.array(rng.integers(8, 240, size=n), type=pa.int32()),
        }
    )


def synth_bmp(width: int, height: int, seed: int) -> bytes:
    """A REAL 24-bit uncompressed BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding) with deterministic pixels — decodable by any
    standards-compliant reader, built with nothing but struct/numpy."""
    import struct

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)  # BGR
    row_bytes = width * 3
    pad = (4 - row_bytes % 4) % 4
    body = b"".join(
        px[r].tobytes() + b"\x00" * pad for r in range(height - 1, -1, -1)
    )
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + info + body


def synth_wav(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """A REAL PCM16 mono WAV (RIFF/fmt/data) with a deterministic
    waveform — playable/decodable anywhere, pure struct/numpy."""
    import struct

    rng = np.random.default_rng(seed)
    samples = rng.integers(-(1 << 15), 1 << 15, size=n_samples, dtype=np.int64).astype(
        np.int16
    )
    data = samples.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def synth_png(width: int, height: int, seed: int) -> bytes:
    """A REAL 8-bit RGB PNG (signature + IHDR/IDAT/IEND with correct
    CRC32s, zlib-compressed scanlines, filter type 0) with
    deterministic pixels — decodable by any standards-compliant
    reader, built with nothing but struct/zlib/numpy. The pixel rule
    is the same rng rule as ``synth_bmp`` (array is RGB here; BMP
    stores the same array as BGR)."""
    import struct
    import zlib

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)  # RGB
    raw = b"".join(b"\x00" + px[r].tobytes() for r in range(height))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def synth_real_media_table(n: int, seed: int = 42) -> pa.Table:
    """Media corpus with REAL codec payloads: rows cycle genuine
    24-bit BMP / PCM16 WAV / 8-bit RGB PNG — the decodable companion
    of ``synth_media_table`` (kept for the PIL/soundfile-shaped stub
    stages). Small dimensions keep rows bounded (wide-row batch-size
    contract unchanged)."""
    rng = np.random.default_rng(seed)
    kinds, payloads, widths, heights, rates, frames = [], [], [], [], [], []
    for i in range(n):
        if i % 3 == 1:
            ns = int(rng.integers(256, 2048))
            kinds.append("audio")
            payloads.append(synth_wav(ns, 16000, seed=seed * 1_000_003 + i))
            widths.append(0)
            heights.append(0)
            rates.append(16000)
            frames.append(ns)
        else:
            w = int(rng.integers(4, 24))
            h = int(rng.integers(4, 24))
            maker = synth_bmp if i % 3 == 0 else synth_png
            kinds.append("image")
            payloads.append(maker(w, h, seed=seed * 1_000_003 + i))
            widths.append(w)
            heights.append(h)
            rates.append(0)
            frames.append(1)
    return pa.table(
        {
            "media_id": pa.array(range(n), type=pa.int64()),
            "media_type": pa.array(kinds, type=pa.string()),
            "payload": pa.array(payloads, type=pa.binary()),
            "meta_width": pa.array(widths, type=pa.int32()),
            "meta_height": pa.array(heights, type=pa.int32()),
            "meta_sample_rate": pa.array(rates, type=pa.int32()),
            "meta_n_frames": pa.array(frames, type=pa.int32()),
        }
    )
