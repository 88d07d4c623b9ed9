#!/usr/bin/env python
"""CDC replay as a submittable Ray job — the cluster deployment surface.

On a real fixed-size cluster:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python scripts/submit_replay.py \
           --events-dir s3://bucket/change_events \
           --lake-dir /mnt/shared/lake \
           --num-buckets 4096 --shuffle disk --lake-layout delta

``--events-dir`` may be any path/URI ``ray.data.read_parquet``
accepts, including object stores. ``--lake-dir`` may be a shared POSIX
path (NFS/EFS/Lustre — fastest: atomic ``os.replace`` commits) or,
since round 5, a ``pyarrow.fs``-resolvable URI (``s3://...``): all
lake state IO routes through the filesystem seam (state/fsio.py).
Object stores have no atomic rename, so the promote degrades to
copy+delete there — exactly-once still holds because visibility comes
from the manifest-last commit and the single-writer-per-lake
discipline (see fsio.py for the full caveat). With a remote lake the
"disk" shuffle scratch defaults to a node-local temp dir — set
``shuffle_scratch_dir`` explicitly on multi-node clusters.

The job is driver-light by design: the driver plans the window, builds
the Dataset pipeline and commits the manifest; all row work (extract ->
normalize -> partial LWW -> keyed exchange -> per-bucket merge+write)
streams through Ray Data tasks across the cluster. Re-submitting after
any failure resumes from the committed watermark (exactly-once sink;
W4/W5 semantics). Size ``--num-buckets`` to ~2-4x total cluster cores
and let ``--split-threshold-rows`` grow the partition count with the
lake thereafter.

Locally (this sandbox) it runs against the synthetic table:

    python scripts/submit_replay.py --events-dir /tmp/graft_change_events/n20000_s42 \
        --lake-dir /tmp/job_lake
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--events-dir", required=True)
    p.add_argument("--lake-dir", required=True)
    p.add_argument("--from-ts", default="2024-01-01T00:00:00",
                   help="initial watermark (ignored once a checkpoint exists)")
    p.add_argument("--fetch-days", type=int, default=30)
    p.add_argument("--num-buckets", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=65536)
    p.add_argument("--shuffle", choices=["hash", "disk"], default="hash")
    p.add_argument("--lake-layout", choices=["rewrite", "delta"], default="rewrite")
    p.add_argument("--split-threshold-rows", type=int, default=None)
    p.add_argument("--included-fields", nargs="*", default=None)
    p.add_argument("--use-updated-at", action="store_true")
    # history reads INSTEAD of a replay window (events-dir is unused
    # but still required by argparse symmetry; pass the lake's source)
    p.add_argument("--snapshot-diff", nargs=2, metavar=("V1", "V2"), default=None,
                   help="emit the state diff between two committed watermarks "
                        "(added/deleted/modified) instead of replaying")
    p.add_argument("--cdc-feed-since", default=None,
                   help="emit changes_between(since, until] instead of replaying")
    p.add_argument("--cdc-feed-until", default=None)
    p.add_argument("--out", default=None,
                   help="with a history read: write the result as partitioned "
                        "parquet under this directory; omit to just count")
    # lake maintenance INSTEAD of a replay window (single-writer
    # discipline: never run concurrently with a replay into this lake)
    p.add_argument("--compact", action="store_true",
                   help="fold every delta partition to one base file")
    p.add_argument("--sort", action="store_true",
                   help="with --compact: write key-CLUSTERED bases "
                        "(sorted by (repo,path), bounded row groups) so "
                        "point lookups prune to O(1) row groups")
    p.add_argument("--row-group-rows", type=int, default=16384)
    p.add_argument("--vacuum", action="store_true",
                   help="delete superseded/orphaned data files "
                        "(runs after --compact when both are given)")
    p.add_argument("--stats", action="store_true",
                   help="print the ANALYZE-style lake inventory (metadata "
                        "only, no data pages) instead of replaying")
    args = p.parse_args()

    import ray

    # `ray job submit` / cluster runs: connect to the running cluster.
    # Standalone local runs: Ray Data auto-inits; never re-init.
    if not ray.is_initialized():
        ray.init()

    from datetime import datetime

    from embulk_input_marketo_ray.pipelines import ReplayConfig, replay
    from embulk_input_marketo_ray.synth import load_evolution_log

    if args.sort and not args.compact:
        p.error("--sort requires --compact")
    if args.stats:
        from embulk_input_marketo_ray.sinks.exactly_once import lake_stats

        print(json.dumps(lake_stats(args.lake_dir)))
        ray.shutdown()
        return
    if args.compact or args.vacuum:
        from embulk_input_marketo_ray.sinks.exactly_once import compact, vacuum

        what = {"maintenance": True, "lake_dir": args.lake_dir}
        if args.compact:
            done = compact(
                args.lake_dir, sort=args.sort, row_group_rows=args.row_group_rows
            )
            what["compacted"] = len(done)
            what["rows"] = sum(r["rows"] or 0 for r in done)
            what["sorted"] = args.sort
        if args.vacuum:
            what["vacuumed_files"] = len(vacuum(args.lake_dir))
        print(json.dumps(what))
        ray.shutdown()
        return

    history_read = bool(args.snapshot_diff or args.cdc_feed_since)
    if (args.cdc_feed_until or args.out) and not history_read:
        # refuse to fall through to a lake-MUTATING replay when the
        # flags say the operator wanted a read
        p.error("--cdc-feed-until/--out require --snapshot-diff or --cdc-feed-since")
    if history_read:
        import os

        from embulk_input_marketo_ray.sinks.exactly_once import (
            changes_between,
            snapshot_diff,
        )

        if args.snapshot_diff:
            v1, v2 = args.snapshot_diff
            ds = snapshot_diff(args.lake_dir, v1=v1, v2=v2)
            what = {"read": "snapshot_diff", "v1": v1, "v2": v2}
        else:
            ds = changes_between(
                args.lake_dir, since=args.cdc_feed_since, until=args.cdc_feed_until
            )
            what = {"read": "cdc_feed", "since": args.cdc_feed_since,
                    "until": args.cdc_feed_until}
        if args.out:
            if os.path.isdir(args.out) and os.listdir(args.out):
                # write_parquet APPENDS uniquely-named files — a reused
                # directory would silently mix two runs' results
                p.error(f"--out {args.out} exists and is not empty")
            ds.write_parquet(args.out)  # streams; one file per output block
            what["out"] = args.out
            # an all-empty result writes no files (the dir may not exist)
            what["rows"] = (
                ray.data.read_parquet(args.out).count()
                if os.path.isdir(args.out) and os.listdir(args.out)
                else 0
            )
        else:
            what["rows"] = ds.count()
        print(json.dumps(what))
        ray.shutdown()
        return

    cfg = ReplayConfig(
        events_dir=args.events_dir,
        lake_dir=args.lake_dir,
        evolution_log=load_evolution_log(args.events_dir),
        from_ts=datetime.fromisoformat(args.from_ts),
        job_start=datetime.now(),
        fetch_days=args.fetch_days,
        num_buckets=args.num_buckets,
        batch_size=args.batch_size,
        shuffle=args.shuffle,
        lake_layout=args.lake_layout,
        split_threshold_rows=args.split_threshold_rows,
        included_fields=args.included_fields,
        use_updated_at=args.use_updated_at,
    )
    report = replay(cfg)
    print(json.dumps(report, default=str))
    ray.shutdown()


if __name__ == "__main__":
    main()
