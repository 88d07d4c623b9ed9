"""Vectorized scalar kernels used inside map_batches stages.

These re-express the reference's per-record lazy conversions
(AllStringJacksonServiceRecord.java:39-78) as Arrow-columnar kernels:
null-literal normalization, string -> typed parsing with the Marketo
timestamp formats, per-row sha256 content fingerprints, and the stable
key hash used for bucket partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from embulk_input_marketo_ray.types import MARKETO_TS_FORMAT, arrow_type_for

# CsvTokenizer.java:490-514 + AllStringJacksonServiceRecord.java:39-42:
# the literal string "null" and the empty (unquoted) value are null.
NULL_LITERALS = ("", "null")


def compact(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """One contiguous zero-offset Array for ``col``.

    pyarrow 16.1's ``if_else`` string kernel reads the VALUES buffer
    from position 0 regardless of the array's slice offset, silently
    returning garbage bytes for any non-zero-offset input (reproduced:
    ``pc.if_else(mask, null, arr.slice(65536, n))`` maps '40' to
    '\\x00\\x00'). Sliced arrays reach kernels whenever a caller splits
    a block with ``Table.slice`` or a map_batches stage opts into
    ``zero_copy_batch=True`` with a ``batch_size`` — so every kernel
    whose output feeds ``if_else`` compacts first. ``concat_arrays``
    of a single sliced array copies it to offset 0; already-contiguous
    input passes through zero-copy.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.offset != 0:
        col = pa.concat_arrays([col])
    return col


def normalize_nulls(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Map the "" / "null" literals of an all-string column to real nulls."""
    col = compact(col)
    mask = pc.is_in(col, value_set=pa.array(NULL_LITERALS, type=pa.string()))
    return pc.if_else(mask, pa.scalar(None, type=pa.string()), col)


def parse_typed(col: pa.ChunkedArray | pa.Array, marketo_type: str):
    """String column -> typed column per the Marketo dataType.

    Vectorized analog of the per-record visitor projection
    (AllStringJacksonServiceRecord.java:44-78, MarketoUtils.java:230-267):
    Long.parseLong / Double.parseDouble / Boolean.parseBoolean /
    timestamp-format parse, applied with pyarrow.compute kernels.
    """
    col = normalize_nulls(col)
    fmt = MARKETO_TS_FORMAT.get(marketo_type)
    if fmt is not None:
        # strptime with %z yields tz-aware; engine convention is naive UTC.
        parsed = pc.strptime(col, format=fmt, unit="us")
        if pa.types.is_timestamp(parsed.type) and parsed.type.tz is not None:
            parsed = parsed.cast(pa.timestamp("us"))
        return parsed
    target = arrow_type_for(marketo_type)
    if pa.types.is_boolean(target):
        # Boolean.parseBoolean semantics: case-insensitive "true" is
        # true, everything else false (nulls stay null).
        lowered = pc.utf8_lower(col)
        return pc.equal(lowered, pa.scalar("true"))
    if pa.types.is_integer(target):
        # Marketo integers may arrive as "42" or "42.0"; parse via float
        # then truncate, mirroring lenient Long.parseLong fallback paths.
        try:
            return pc.cast(col, target)
        except pa.ArrowInvalid:
            return pc.cast(pc.cast(col, pa.float64()), target, safe=False)
    return pc.cast(col, target)


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Per-row sha256 hex digest of a string/binary column.

    The per-row invariant of the engine (BASELINE.json:input_hint):
    lake ``content`` rows must hash-match the oracle's. There is no
    Arrow sha256 kernel, so this is a tight Python loop over zero-copy
    buffers — the only intentionally row-wise kernel in the engine;
    it is parallelized across blocks by map_batches.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    _sha = hashlib.sha256
    out = [
        _sha(v.as_buffer()).hexdigest() if v.is_valid else None for v in col.cast(pa.binary())
    ]
    return pa.array(out, type=pa.string())


# Identity of the routing-hash function below. The raw hash decides the
# persisted bucket of every lake row (stable_key_hash, extendible splits
# in sinks/exactly_once.split_pieces), so changing the implementation —
# algorithm, seed, or row-encoding — silently strands committed rows in
# buckets new events no longer route to. Bump this string with ANY such
# change; the replay manifest records it and refuses to replay into a
# lake written under a different version.
ROUTING_HASH_VERSION = "polars-hash_rows-seed42-v1"


def stable_key_hash_raw(table: pa.Table, key_columns: list[str]) -> np.ndarray:
    """Deterministic uint64 hash per row over a composite string key.

    The primitive behind bucket routing: polars' seeded xxhash over the
    joined key, vectorized and zero-copy from Arrow. Stable across
    processes and runs (required for deterministic partition ids in the
    exactly-once manifest; pandas' hash_array was observed to be
    process-dependent on Arrow-backed string arrays — do not use it
    here). Determinism holds within one polars build, which a cluster
    image guarantees.
    """
    import os

    # polars sizes its rayon pool to ALL cores at import; inside a
    # 32-actor pool that is 32x32 threads fighting for 32 CPUs — the
    # fused ingest stage measured ~10x slower in situ than in a
    # single-process micro-benchmark until the pool was pinned. One
    # thread per worker is correct when Ray provides the parallelism.
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import polars as pl

    # hash_rows over the key columns directly — the earlier
    # cast + binary_join composite-string build cost ~2 us/row and
    # dominated the routing hash; row-hashing skips the allocation
    return (
        pl.from_arrow(table.select(key_columns).combine_chunks())
        .hash_rows(seed=42)
        .to_numpy()
    )


def stable_key_hash(table: pa.Table, key_columns: list[str], num_buckets: int) -> np.ndarray:
    """Deterministic hash-bucket id per row: raw xxhash % num_buckets
    (for power-of-two ``num_buckets`` this equals the low-bit suffix
    used by extendible bucket splitting — see stages/lww.py)."""
    hashed = stable_key_hash_raw(table, key_columns)
    return (hashed % np.uint64(num_buckets)).astype(np.int32)
