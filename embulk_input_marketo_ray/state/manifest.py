"""Per-partition commit manifest for the exactly-once Parquet sink.

The reference has no mid-run checkpoint (Embulk "Resume supported: no",
reference README.md:25) — its resume story is byte-range download resume
(MarketoServiceImpl.java:113-133) plus run-level watermark carry-forward.
At Ray scale we replace that with a per-partition manifest: each output
partition (hash bucket of the upsert key) writes to a temp file, is
atomically renamed into place, and is recorded in ``manifest.json``
together with row count and a content fingerprint (per-partition lineage
metrics, SURVEY.md §2.5 A4). A re-run skips partitions already present
in the manifest, which makes replay idempotent = exactly-once.

Partition ids are deterministic (bucket index of a fixed hash), so a
retried or resumed run regenerates byte-identical partition content.
"""

from __future__ import annotations

import json
import os

from embulk_input_marketo_ray.state.fsio import (
    fs_exists,
    fs_mkdirs,
    fs_open_output,
    fs_read_json,
    fs_replace,
    resolve_path,
)


class PartitionManifest:
    """Atomic record of committed output partitions.

    Layout under ``out_dir``::

        part-<pid>.parquet      committed partition data (os.replace'd)
        _tmp/part-<pid>.parquet in-flight writes (ignored by readers)
        manifest.json           {"partitions": {pid: {rows, lineage...}}}

    ``manifest.json`` is only ever replaced atomically, so a crash
    between data rename and manifest write leaves a stale-but-ignored
    data file; the re-run overwrites it deterministically.
    """

    def __init__(self, out_dir: str, filesystem=None) -> None:
        # ``filesystem``: optional pyarrow.fs.FileSystem routing ALL
        # manifest/data IO (state/fsio.py seam); None = local POSIX
        # fast path. URI-style out_dir ("s3://...") auto-resolves.
        if filesystem is None:
            filesystem, out_dir = resolve_path(out_dir)
        self.fs = filesystem
        self.out_dir = out_dir
        self.tmp_dir = os.path.join(out_dir, "_tmp")
        self.path = os.path.join(out_dir, "manifest.json")

    def prepare(self) -> None:
        fs_mkdirs(self.fs, self.out_dir)
        fs_mkdirs(self.fs, self.tmp_dir)

    def load(self) -> dict:
        if not fs_exists(self.fs, self.path):
            return {"partitions": {}}
        return fs_read_json(self.fs, self.path)

    def committed_ids(self) -> set[str]:
        return set(self.load()["partitions"].keys())

    def check_routing_version(self, state: dict | None = None) -> None:
        """Refuse to replay into a lake whose committed rows were routed
        by a different hash implementation.

        A key's bucket is a pure function of the routing hash; under a
        changed hash the key's new events land in a different bucket
        than its committed row, the per-bucket LWW merge never sees the
        prior row, and the lake silently accumulates duplicate keys.
        Lakes stamped before versioning existed (no ``routing_hash``
        key, but partitions present) are accepted and stamped on the
        next commit — they were necessarily written by the v1 hash.
        """
        from embulk_input_marketo_ray.functions.scalar import ROUTING_HASH_VERSION

        state = self.load() if state is None else state
        stamped = state.get("routing_hash")
        if state["partitions"] and stamped is not None and stamped != ROUTING_HASH_VERSION:
            raise RuntimeError(
                f"lake at {self.out_dir} was written with routing-hash version "
                f"{stamped!r} but this build uses {ROUTING_HASH_VERSION!r}; "
                "replaying would route keys to different buckets than their "
                "committed rows and duplicate them. Rebuild the lake (full "
                "re-replay into an empty dir) or run the build matching the "
                "stamped version."
            )

    def check_num_buckets(self, num_buckets: int, state: dict | None = None) -> None:
        """Refuse to replay into a lake committed with a DIFFERENT
        bucket count — the same silent-duplicate failure mode as a
        routing-hash change (``bucket = hash % num_buckets``): a key's
        new events would land in a different partition than its
        committed row and the LWW merge would never see the prior row.
        Pre-stamp lakes (partitions present, no ``num_buckets`` key)
        are accepted and stamped on the next commit."""
        state = self.load() if state is None else state
        stamped = state.get("num_buckets")
        if state["partitions"] and stamped is not None and stamped != num_buckets:
            raise RuntimeError(
                f"lake at {self.out_dir} was committed with num_buckets="
                f"{stamped} but this run is configured with {num_buckets}; "
                "replaying would route keys to different partitions than "
                "their committed rows and duplicate them. Keep the lake's "
                "bucket count (growth is handled by split_threshold_rows, "
                "not by changing num_buckets) or re-replay into an empty dir."
            )

    def data_path(self, pid: str) -> str:
        return os.path.join(self.out_dir, f"part-{pid}.parquet")

    def tmp_path(self, pid: str) -> str:
        return os.path.join(self.tmp_dir, f"part-{pid}.parquet")

    def promote(self, pid: str) -> None:
        """Atomically move a finished tmp partition file into place
        (atomic locally; see fsio.fs_replace for the object-store
        caveat — visibility still comes from the manifest commit)."""
        fs_replace(self.fs, self.tmp_path(pid), self.data_path(pid))

    # --- named-file variants (delta lake layout: a partition is a SET
    # of files — optional base + per-window deltas — listed in its
    # manifest entry under "files") -------------------------------------

    def file_path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def tmp_file_path(self, name: str) -> str:
        return os.path.join(self.tmp_dir, name)

    def promote_file(self, name: str) -> None:
        fs_replace(self.fs, self.tmp_file_path(name), self.file_path(name))

    def files_of(self, pid: str) -> list[str]:
        """Committed file names of a partition: the entry's "files"
        list (delta layout) or the single part-<pid> file (rewrite)."""
        entry = self.load()["partitions"].get(pid)
        if entry and entry.get("files"):
            return list(entry["files"])
        return [f"part-{pid}.parquet"]

    def commit(self, stats_by_pid: dict[str, dict], extra: dict | None = None) -> None:
        """Merge partition stats into the manifest and write it atomically.

        Called once on the driver after all partitions of a run have been
        promoted — the manifest write is the commit point; the watermark
        checkpoint advances only after this returns (W4). ``extra``
        merges top-level run metadata (e.g. ``num_buckets``, which
        point-lookup readers need to recompute a key's bucket route).
        """
        from embulk_input_marketo_ray.functions.scalar import ROUTING_HASH_VERSION

        state = self.load()
        state["partitions"].update(stats_by_pid)
        if extra:
            state.update(extra)
        # record which routing-hash implementation placed these rows;
        # replay refuses a lake stamped with a different version (see
        # check_routing_version) instead of silently double-keying it
        state["routing_hash"] = ROUTING_HASH_VERSION
        tmp = self.path + ".tmp"
        with fs_open_output(self.fs, tmp) as f:
            f.write(json.dumps(state, sort_keys=True).encode())
        fs_replace(self.fs, tmp, self.path)

    def committed_files(self) -> list[str]:
        state = self.load()
        out: list[str] = []
        for pid in sorted(state["partitions"]):
            entry = state["partitions"][pid]
            names = entry.get("files") or [f"part-{pid}.parquet"]
            out.extend(self.file_path(n) for n in names)
        return out

    def committed_file_sets(self) -> dict[str, list[str]]:
        """pid -> absolute committed file paths (one per pid in the
        rewrite layout; base+deltas in the delta layout)."""
        state = self.load()
        return {
            pid: [
                self.file_path(n)
                for n in (entry.get("files") or [f"part-{pid}.parquet"])
            ]
            for pid, entry in state["partitions"].items()
        }
