#!/usr/bin/env python
"""Run any catalog pipeline as a submittable Ray job — the ad-hoc
analytics deployment surface (the batch counterpart of
``submit_replay.py``'s CDC job and ``index_ingest.py``'s index jobs).

On a real fixed-size cluster:

    ray job submit --address http://<head>:8265 --working-dir . \
        -- python scripts/run_query.py doc_dedup_near \
           --sf-dir /mnt/shared/corpus \
           --out /mnt/shared/results/dedup_near

``--sf-dir`` may be any path ``ray.data.read_parquet`` accepts (the
catalog reads ``<sf-dir>/<table>.parquet``). With ``--out`` the result
streams to partitioned parquet under that directory (one file per
result block — never one giant file, so a re-run can verify per
partition); without it only the row count is computed. Either way one
JSON line with {query, rows, wall_s, out} goes to stdout.

Locally (this sandbox):

    python scripts/run_query.py lineitem_rollup --sf-dir /root/testdata/sf0.01
    python scripts/run_query.py --list
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("query", nargs="?", help="a queries() catalog entry name")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--out", default=None,
                   help="directory to write the result as partitioned parquet")
    p.add_argument("--list", action="store_true", help="print catalog names and exit")
    p.add_argument("--stats", action="store_true",
                   help="print the Ray Data execution stats for the query to stderr")
    args = p.parse_args()

    import __ray_entry__ as entry_mod

    catalog = entry_mod.queries()
    if args.list:
        print(json.dumps(sorted(catalog)))
        return
    if not args.query:
        p.error("query name required (or --list)")
    if args.query not in catalog:
        p.error(f"unknown query {args.query!r}; --list prints the catalog")

    import ray

    if not ray.is_initialized():  # the job submitter / driver may own the session
        ray.init(address="local", include_dashboard=False)

    t0 = time.perf_counter()
    res = catalog[args.query](args.sf_dir)
    out_path = None
    import pyarrow as pa

    if isinstance(res, pa.Table):
        rows = res.num_rows
        if args.out:
            import os

            import pyarrow.parquet as pq

            os.makedirs(args.out, exist_ok=True)
            out_path = f"{args.out}/part-0.parquet"
            pq.write_table(res, out_path)
    else:  # ray.data.Dataset: stream to the sink, never materialize
        if args.out:
            res.write_parquet(args.out)
            out_path = args.out
            import ray.data

            rows = ray.data.read_parquet(args.out).count()
        else:
            rows = res.count()
        if args.stats:
            print(res.stats(), file=sys.stderr)
    wall = round(time.perf_counter() - t0, 3)
    print(json.dumps(
        {"query": args.query, "rows": int(rows), "wall_s": wall, "out": out_path}
    ))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
