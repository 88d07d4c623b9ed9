#!/usr/bin/env python
"""Persisted-index maintenance as a submittable Ray job — the
deployment surface for the two incremental indexes
(``stages/sig_index.py`` near-dup signatures, ``stages/vec_index.py``
IVF embeddings).

On a real fixed-size cluster:

    ray job submit --address http://<head>:8265 --working-dir . \
        -- python scripts/index_ingest.py sig ingest \
           --index-dir /mnt/shared/sig_index \
           --input /mnt/shared/docs_batch_0042.parquet \
           --ingest-id batch_0042

    python scripts/index_ingest.py vec ingest --index-dir ... \
        --input new_embeddings.parquet --ingest-id batch_0042
    python scripts/index_ingest.py sig delete --index-dir ... \
        --input retracted_ids.parquet --delete-id gdpr_0007
    python scripts/index_ingest.py sig compact --index-dir ...
    python scripts/index_ingest.py vec vacuum  --index-dir ...

``--index-dir`` may be a shared POSIX path (NFS/EFS/Lustre —
fastest: atomic ``os.replace`` commits and the O_EXCL manifest lock)
or, since round 5, a ``pyarrow.fs``-resolvable URI (``s3://...``):
all index state IO routes through the filesystem seam
(state/fsio.py). Object stores have no O_EXCL, so the manifest lock
degrades to a no-op there and SINGLE-WRITER-PER-INDEX is the
contract (the same caveat as the lake manifest). ``--input`` may be
any path/URI ``ray.data.read_parquet`` accepts, including object
stores.

``--ingest-id`` is the exactly-once key: re-submitting a committed id
replays the recorded result; retrying after a crash rewrites the
partial files deterministically and commits. Compaction folds each
bucket/cluster's per-ingest files into one base (probe fan-in drops to
one file per bucket). Vacuum reclaims what the manifest no longer
references — safe concurrently with reads (readers resolve files only
through the committed manifest); an IN-FLIGHT ingest's uncommitted
files are protected by the default 15-minute modification-time grace
window, so don't pass ``grace_seconds=0`` while an ingest may be
running.

``delete`` tombstones ids (``--input`` = a parquet with a doc_id /
vec_id column, ``--delete-id`` = the exactly-once key): probes exclude
them immediately, compaction folds them into the bases, vacuum then
reclaims the folded tombstone files.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("kind", choices=["sig", "vec"])
    p.add_argument("action", choices=["init", "ingest", "delete", "compact", "vacuum"])
    p.add_argument("--index-dir", required=True)
    p.add_argument("--input", help="parquet path for ingest (doc_id+text / vec_id+embedding)")
    p.add_argument("--ingest-id", help="exactly-once key for ingest")
    p.add_argument("--delete-id", help="exactly-once key for delete")
    p.add_argument("--num-buckets", type=int, default=64)
    p.add_argument("--n-centroids", type=int, default=256)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS (set by `ray job submit` on a cluster, `local`
        # in this sandbox) picks the target; None = standalone local
        ray.init()
    import ray.data

    from embulk_input_marketo_ray.pipelines.queries import _ensure_hash_shuffle

    _ensure_hash_shuffle()
    out: dict = {"kind": args.kind, "action": args.action}
    if args.kind == "sig":
        from embulk_input_marketo_ray.stages.sig_index import (
            compact_index,
            delete_docs,
            ingest,
            init_index,
            vacuum_index,
        )

        if args.action == "init":
            init_index(args.index_dir, num_buckets=args.num_buckets)
        elif args.action == "ingest":
            if not (args.input and args.ingest_id):
                p.error("ingest requires --input and --ingest-id")
            ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
            res = ingest(args.index_dir, ds, args.ingest_id)
            st = res.column("status").to_pylist()
            out.update(n_docs=len(st), n_dup=st.count("dup"))
        elif args.action == "delete":
            if not (args.input and args.delete_id):
                p.error("delete requires --input and --delete-id")
            import pyarrow.parquet as pq

            ids = pq.read_table(args.input, columns=["doc_id"]).column("doc_id")
            out.update(delete_docs(args.index_dir, ids.to_pylist(), args.delete_id))
        elif args.action == "compact":
            out["bases"] = len(compact_index(args.index_dir))
        else:
            out["removed"] = len(vacuum_index(args.index_dir))
    else:
        from embulk_input_marketo_ray.stages.vec_index import (
            compact_vec_index,
            delete_vectors,
            ingest_vectors,
            init_vec_index,
            vacuum_vec_index,
        )

        if args.action == "init":
            init_vec_index(args.index_dir, n_centroids=args.n_centroids)
        elif args.action == "ingest":
            if not (args.input and args.ingest_id):
                p.error("ingest requires --input and --ingest-id")
            ds = ray.data.read_parquet(args.input, columns=["vec_id", "embedding"])
            out.update(ingest_vectors(args.index_dir, ds, args.ingest_id))
        elif args.action == "delete":
            if not (args.input and args.delete_id):
                p.error("delete requires --input and --delete-id")
            import pyarrow.parquet as pq

            ids = pq.read_table(args.input, columns=["vec_id"]).column("vec_id")
            out.update(delete_vectors(args.index_dir, ids.to_pylist(), args.delete_id))
        elif args.action == "compact":
            out["bases"] = len(compact_vec_index(args.index_dir))
        else:
            out["removed"] = len(vacuum_vec_index(args.index_dir))

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
