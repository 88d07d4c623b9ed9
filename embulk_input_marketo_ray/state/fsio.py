"""Filesystem seam for lake / index state IO.

The exactly-once machinery (state/manifest.py, sinks/exactly_once.py,
the replay's checkpoint) historically assumed a POSIX filesystem:
``open`` + ``os.fsync`` + atomic ``os.replace`` promotion. That is the
fast path and stays byte-identical here (``fs is None``). Passing a
``pyarrow.fs.FileSystem`` routes every state operation through it
instead, which makes the lake runnable on object stores and — the
testable seam in this sandbox — on ``pyarrow.fs.SubTreeFileSystem``
rooted anywhere.

Object-store caveat (documented, by design): S3-class stores have no
atomic rename, so ``replace`` degrades to pyarrow's ``move`` (copy +
delete on S3). The lake's exactly-once story does NOT rest on the
rename being atomic across readers — visibility comes from the
manifest commit (readers list data files only through
``manifest.json``, written LAST), and the single-writer-per-window
discipline means the worst crash outcome is an orphaned data file that
``vacuum`` reclaims. The manifest write itself is last-writer-wins on
S3 (no conditional put in pyarrow); true multi-writer manifests need a
conditional-put or commit-marker protocol on such stores — single
writer per lake remains the contract, exactly as on POSIX.

All helpers take ``fs`` FIRST and treat ``fs=None`` as "local POSIX via
os/builtins". ``pyarrow.fs.FileSystem`` objects are picklable, so
writer stages carry them into Ray workers via their closures.
"""

from __future__ import annotations

import json
import os
from contextlib import contextmanager
from typing import Any

__all__ = [
    "fs_exists",
    "fs_isdir",
    "fs_mkdirs",
    "fs_listdir",
    "fs_delete",
    "fs_replace",
    "fs_open_output",
    "fs_open_input",
    "fs_read_json",
    "fs_write_json_atomic",
    "fs_file_size",
    "resolve_path",
]


def resolve_path(path: str):
    """(fs, path): ``pyarrow.fs`` filesystem + path for URI-style paths
    (``s3://...``, ``gs://...``), ``(None, path)`` for local paths —
    the front door for string-configured lakes/indexes."""
    if "://" in path:
        from pyarrow import fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        return fs, rel
    return None, path


def fs_exists(fs: Any, path: str) -> bool:
    if fs is None:
        return os.path.exists(path)
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type != pafs.FileType.NotFound


def fs_isdir(fs: Any, path: str) -> bool:
    if fs is None:
        return os.path.isdir(path)
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type == pafs.FileType.Directory


def fs_mkdirs(fs: Any, path: str) -> None:
    if fs is None:
        os.makedirs(path, exist_ok=True)
    else:
        fs.create_dir(path, recursive=True)


def fs_listdir(fs: Any, path: str) -> list[str]:
    """Base names of the DIRECT children of ``path`` (files and dirs),
    sorted; [] for a missing directory."""
    if fs is None:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []
    from pyarrow import fs as pafs

    sel = pafs.FileSelector(path, recursive=False, allow_not_found=True)
    return sorted(os.path.basename(info.path.rstrip("/")) for info in fs.get_file_info(sel))


def fs_isfile(fs: Any, path: str) -> bool:
    if fs is None:
        return os.path.isfile(path)
    from pyarrow import fs as pafs

    return fs.get_file_info(path).type == pafs.FileType.File


def fs_delete(fs: Any, path: str) -> None:
    if fs is None:
        os.remove(path)
    else:
        fs.delete_file(path)


def fs_replace(fs: Any, src: str, dst: str) -> None:
    """Promote ``src`` into place at ``dst``. Local: atomic
    ``os.replace``. pyarrow fs: ``move`` — atomic rename where the
    store supports it (local, HDFS), copy+delete on S3-class stores
    (see the module docstring for why exactly-once survives that)."""
    if fs is None:
        os.replace(src, dst)
    else:
        if fs_exists(fs, dst):
            # move refuses to clobber on some backends; deterministic
            # rewrites regenerate identical bytes, so drop-then-move is
            # the same fixed point
            fs.delete_file(dst)
        fs.move(src, dst)


@contextmanager
def fs_open_output(fs: Any, path: str, fsync: bool = True):
    """Binary output stream. Local: plain file + optional fsync (the
    durability point before an atomic promote). pyarrow fs: the
    store's output stream (durable on close)."""
    if fs is None:
        with open(path, "wb") as f:
            yield f
            if fsync:
                f.flush()
                os.fsync(f.fileno())
    else:
        with fs.open_output_stream(path) as f:
            yield f


@contextmanager
def fs_open_input(fs: Any, path: str):
    if fs is None:
        with open(path, "rb") as f:
            yield f
    else:
        with fs.open_input_stream(path) as f:
            yield f


def fs_read_json(fs: Any, path: str) -> Any:
    with fs_open_input(fs, path) as f:
        return json.loads(f.read())


def fs_write_json_atomic(fs: Any, path: str, obj: Any) -> None:
    """tmp-write + promote; the caller's commit point."""
    tmp = path + ".tmp"
    data = json.dumps(obj, sort_keys=True).encode()
    with fs_open_output(fs, tmp) as f:
        f.write(data)
    fs_replace(fs, tmp, path)


def fs_file_size(fs: Any, path: str) -> int:
    if fs is None:
        return os.path.getsize(path)
    return fs.get_file_info(path).size


def fs_mtime(fs: Any, path: str) -> float:
    """Seconds-since-epoch mtime (vacuum grace windows)."""
    if fs is None:
        return os.path.getmtime(path)
    mt = fs.get_file_info(path).mtime
    return mt.timestamp() if mt is not None else 0.0
