"""Scalar kernels: null literals, typed projection, sha256, key hash."""

import hashlib

import numpy as np
import pyarrow as pa

from embulk_input_marketo_ray.functions.scalar import (
    normalize_nulls,
    parse_typed,
    sha256_column,
    stable_key_hash,
)


def test_null_literals():
    col = pa.array(["a", "", "null", None, "b"])
    out = normalize_nulls(col)
    assert out.to_pylist() == ["a", None, None, None, "b"]


def test_parse_integer_and_float_strings():
    assert parse_typed(pa.array(["1", "42", "null", ""]), "integer").to_pylist() == [1, 42, None, None]
    assert parse_typed(pa.array(["1.5", "null"]), "currency").to_pylist() == [1.5, None]
    # lenient integer: float-formatted strings truncate (widened source rows)
    assert parse_typed(pa.array(["3.7"]), "score").to_pylist() == [3]


def test_parse_boolean_java_semantics():
    # Boolean.parseBoolean: case-insensitive "true" -> True, else False
    out = parse_typed(pa.array(["true", "TRUE", "false", "yes", "null", None]), "boolean")
    assert out.to_pylist() == [True, True, False, False, None, None]


def test_parse_datetime_and_date_formats():
    dt = parse_typed(pa.array(["2024-03-01T12:30:45+0000", "null"]), "datetime")
    assert pa.types.is_timestamp(dt.type) and dt.type.tz is None
    assert dt.to_pylist()[0].isoformat() == "2024-03-01T12:30:45"
    assert dt.to_pylist()[1] is None
    d = parse_typed(pa.array(["2024-03-01"]), "date")
    assert d.to_pylist()[0].isoformat() == "2024-03-01T00:00:00"


def test_sha256_column_matches_hashlib():
    col = pa.array(["hello", "", None, "wörld"])
    out = sha256_column(col).to_pylist()
    assert out[0] == hashlib.sha256(b"hello").hexdigest()
    assert out[1] == hashlib.sha256(b"").hexdigest()
    assert out[2] is None
    assert out[3] == hashlib.sha256("wörld".encode()).hexdigest()


def test_stable_key_hash_deterministic_and_bounded():
    t = pa.table({"repo": ["a", "a", "b"], "path": ["x", "y", "x"]})
    h1 = stable_key_hash(t, ["repo", "path"], 16)
    h2 = stable_key_hash(t, ["repo", "path"], 16)
    assert np.array_equal(h1, h2)
    assert ((h1 >= 0) & (h1 < 16)).all()
    # same key in different tables -> same bucket
    t2 = pa.table({"repo": ["b"], "path": ["x"]})
    assert stable_key_hash(t2, ["repo", "path"], 16)[0] == h1[2]


def test_kernels_correct_on_sliced_nonzero_offset_input():
    """pyarrow 16.1's if_else string kernel reads the values buffer from
    position 0 for sliced (non-zero-offset) inputs — silent corruption
    ('40' -> '\\x00\\x00'). Sliced arrays reach kernels via Table.slice
    and zero_copy_batch=True map_batches; every public kernel must give
    offset-independent answers."""
    n = 4000
    vals = [str(i) if i % 7 else "null" for i in range(n)]
    vals[5] = ""
    base = pa.table(
        {
            "repo": pa.array([f"r{i % 13}" for i in range(n)]),
            "path": pa.array([f"p{i % 97}" for i in range(n)]),
            "v": pa.array(vals, type=pa.string()),
        }
    )
    sliced = base.slice(1111, 1500)  # chunks keep offset 1111
    compacted = pa.Table.from_pylist(sliced.to_pylist())
    assert sliced.column("v").chunk(0).offset != 0  # premise: actually sliced

    got = normalize_nulls(sliced.column("v"))
    want = normalize_nulls(compacted.column("v"))
    assert got.to_pylist() == want.to_pylist()

    got = parse_typed(sliced.column("v"), "integer")
    want = parse_typed(compacted.column("v"), "integer")
    assert got.to_pylist() == want.to_pylist()

    got = sha256_column(sliced.column("v"))
    want = sha256_column(compacted.column("v"))
    assert got.to_pylist() == want.to_pylist()

    got = stable_key_hash(sliced, ["repo", "path"], 32)
    want = stable_key_hash(compacted, ["repo", "path"], 32)
    assert np.array_equal(got, want)
