"""Driver-facing query catalog: one entry per implemented operator.

Each function takes ``sf_dir`` (a testdata directory of parquet tables)
and returns a Dataset / pyarrow Table. ``__ray_entry__.queries()``
exposes them; ``__ray_entry__.oracle_sql()`` carries the matching
ANSI-SQL strings (column names deliberately identical). Oracle-checked
queries avoid float aggregates so value-hash comparisons are exact.

Operator -> SURVEY.md §2 mapping is noted per function.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray
import ray.data

from embulk_input_marketo_ray.stages.lww import BUCKET_COLUMN
from embulk_input_marketo_ray.stages.similarity import list_column_matrix
from embulk_input_marketo_ray.functions.scalar import stable_key_hash


def _ensure_hash_shuffle() -> None:
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ctx.max_hash_shuffle_aggregators = max(2, total_cpus // 2)
    # Aggregators are concat-bound; with the default 0.0625 cpu/partition
    # two chained shuffles reserve every CPU on a small node and the map
    # stages deadlock. Keep the reservation nominal.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    # default 200 shuffle partitions drowns small groupbys in per-partition
    # overhead; 2 partitions/CPU is plenty for work stealing
    ctx.default_hash_shuffle_parallelism = max(8, total_cpus * 2)


_TUNED_WIDTH: int | None = None
_TUNED_BYTES: int | None = None

# Below this input size (parquet bytes of the driving table, ~3-6x
# that in heap) a keyed hash exchange is pure fixed cost: aggregator
# actor spin-up (~2-4 s) plus ~0.1-1 s acceptance wall per submitted
# block, while the work itself is milliseconds on one core. Collapse
# such exchanges to a single split-based block instead (see
# _keyed_repartition). 16 MiB parquet keeps the single task's heap
# use under ~100 MB.
SMALL_INPUT_BYTES = 16 << 20


def _tune_shuffle_for_bytes(input_bytes: int) -> None:
    """Size shuffle width to the INPUT, not just the cluster.

    Each aggregator is an actor spin-up (~0.15 s) and each shuffle
    partition pays per-partition submit overhead — a 25 MB query
    shuffled through 16 aggregators x 64 partitions is pure fixed cost
    (the same window-sizing the flagship applies, cdc_replay.py:185).
    Called by ``_read`` with the main table's file size BEFORE the
    dataset is created (the plan snapshots DataContext at creation);
    only ever narrows the session defaults set by _ensure_hash_shuffle.
    """
    from ray.data import DataContext

    global _TUNED_WIDTH, _TUNED_BYTES
    _TUNED_BYTES = input_bytes
    ctx = DataContext.get_current()
    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    by_size = int(input_bytes // (40 << 20)) + 2
    ctx.max_hash_shuffle_aggregators = max(2, min(total_cpus // 2, by_size))
    parts = int(input_bytes // (10 << 20)) + 8
    ctx.default_hash_shuffle_parallelism = max(8, min(total_cpus * 2, parts))
    _TUNED_WIDTH = ctx.default_hash_shuffle_parallelism


def _shuffle_width() -> int:
    """Partition count for explicit keyed repartitions: the width
    ``_tune_shuffle_for_bytes`` sized to the driving table (every
    hash-shuffle partition costs a submit round-trip, so a 2 MB input
    must not pay 32 of them), falling back to 2/CPU."""
    if _TUNED_WIDTH is not None:
        return _TUNED_WIDTH
    total_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(8, total_cpus * 2)


def _small_input() -> bool:
    return _TUNED_BYTES is not None and _TUNED_BYTES < SMALL_INPUT_BYTES


def _keyed_repartition(ds: "ray.data.Dataset", width: int, keys: list[str]):
    """Keyed exchange sized to the INPUT, with a no-shuffle small path.

    Every downstream kernel in this repo slices its groups WITHIN the
    received block (sorted run detection), so "each key wholly in one
    partition" is trivially satisfied by "everything in one block".
    For inputs under SMALL_INPUT_BYTES the hash exchange's fixed cost
    (aggregator-pool spin-up + per-partition submit wall) dwarfs the
    parallelism it buys, so collapse to ONE block via the split-based
    (task-only, no aggregator actors) repartition. Bigger inputs take
    the real keyed hash exchange at the tuned width — the 100 TB path
    is unchanged.

    The shuffle strategy must be HASH_SHUFFLE BEFORE the source dataset
    is created (Ray snapshots DataContext at creation), so the ensure
    lives in ``_read`` / ``_read_events``, not here."""
    if _small_input():
        return ds.repartition(1)
    return ds.repartition(width, keys=keys)


_STAGE_CACHE: dict = {}


def _task_stage(cls, **init_kw):
    """Adapt a callable-class stage to a TASK-based ``map_batches`` fn.

    For stages whose per-worker state is cheap to build (compiled
    regexes, hash permutation tables, a broadcast lookup), an actor
    pool buys nothing but costs a ~2-3 s pool spin-up per execution —
    and task maps fuse with the upstream read (actor maps never do).
    The instance is still built once per WORKER PROCESS (module-level
    cache keyed by class + init kwargs), so the setup-once contract
    holds. Genuinely expensive state (models, codec contexts — e.g.
    the multimodal stages) stays on actor pools.
    """
    key = (cls.__module__, cls.__qualname__, tuple(sorted(init_kw.items())))

    def fn(batch):
        inst = _STAGE_CACHE.get(key)
        if inst is None:
            inst = _STAGE_CACHE.setdefault(key, cls(**init_kw))
        return inst(batch)

    return fn


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"

def _clean_schema(path: str, columns=None) -> pa.Schema:
    """Footer schema with ALL metadata stripped (schema- and field-level).

    The driver-generated parquet carries a pandas metadata dict that
    makes pa.Schema UNHASHABLE, which defeats Ray's schema-dedup fast
    path and spams 'Failed to hash the schemas (for deduplication)'
    warnings from every read task. Passing an explicit clean schema to
    read_parquet keeps every emitted block metadata-free at the source
    (no downstream strip stage, read->map fusion preserved)."""
    sch = pq.read_schema(path)
    fields = [
        sch.field(c).remove_metadata() for c in (columns or sch.names)
    ]
    return pa.schema(fields)


# Below this input size the read gets an EXPLICIT block count: Ray's
# dynamic block splitting (file sampling + SplitBlocks planning) costs
# a measured ~0.25 s PER EXECUTION regardless of data size — pure fixed
# cost on a sub-64MB table, the dominant term of every small catalog
# query. Explicit blocks keep 4..cpus-way parallelism without the
# sampling pass; big inputs keep Ray's dynamic sizing (the 100 TB path
# is unchanged).
_READ_DYNAMIC_BYTES = 64 << 20
_READ_BLOCK_BYTES = 256 << 10


def _small_read_blocks(total_bytes: int) -> int | None:
    if total_bytes >= _READ_DYNAMIC_BYTES:
        return None
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, min(cpus, total_bytes // _READ_BLOCK_BYTES + 1))


def _read(sf_dir: str, name: str, columns=None, **kw):
    path = _t(sf_dir, name)
    import os as _os

    # HASH_SHUFFLE must be set BEFORE the dataset exists: Ray snapshots
    # DataContext at creation, so a downstream keyed repartition crashes
    # in a fresh session (scripts/run_query.py) if the source was built
    # under the sort-shuffle default
    _ensure_hash_shuffle()
    # multi-table queries read the big driving table first, so its size
    # (not a small lookup side's) governs the plan's shuffle width
    nbytes = _os.path.getsize(path)
    _tune_shuffle_for_bytes(nbytes)
    if "override_num_blocks" not in kw:
        blocks = _small_read_blocks(nbytes)
        if blocks is not None:
            kw["override_num_blocks"] = blocks
    return ray.data.read_parquet(
        path, columns=columns, schema=_clean_schema(path, columns), **kw
    )


def _read_events(columns=None, n: int | None = None):
    """Events-fixture read with the same input-sized shuffle tuning as
    ``_read``: without it a 20k-row fixture pays a full cluster-width
    hash exchange (~4-5 s of aggregator spin-up + per-partition submit
    wall for milliseconds of work)."""
    import glob as _glob
    import os as _os

    events = _cdc_events_dir() if n is None else _cdc_events_dir(n)
    files = sorted(_glob.glob(f"{events}/events_*.parquet"))
    _ensure_hash_shuffle()  # before creation — see _read
    nbytes = sum(_os.path.getsize(f) for f in files)
    _tune_shuffle_for_bytes(nbytes)
    blocks = _small_read_blocks(nbytes)
    # explicit blocks can't go below the file count (Ray would coalesce
    # metadata fetches but still pays the sampling pass otherwise)
    if blocks is not None:
        blocks = max(blocks, len(files))
    return ray.data.read_parquet(files, columns=columns, override_num_blocks=blocks)



# ---------------------------------------------------------------------------
# generic keep-one-per-key (the LWW / dedup machinery on any Dataset)
# ---------------------------------------------------------------------------


def keep_one_per_key(
    ds: "ray.data.Dataset",
    key_columns: list[str],
    seq_column: str,
    keep: str = "last",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Distributed exact dedup: newest (``keep='last'``) or oldest
    (``'first'``) row per composite key, ordered by ``seq_column``.

    Shape (SURVEY.md §2.4 J4 / §2.7 D5): per-batch partial combine ->
    keyed hash repartition (each key wholly in one partition) -> one
    vectorized merge per partition. Never per-key map_groups.
    """
    _ensure_hash_shuffle()
    if num_buckets is None:
        num_buckets = _shuffle_width()
    desc = keep == "first"
    small = _small_input()

    def partial(batch: pa.Table) -> pa.Table:
        merged = _keep(batch)
        if small:  # single-block path: no bucket key needed
            return merged
        buckets = stable_key_hash(merged, key_columns, num_buckets)
        return merged.append_column(BUCKET_COLUMN, pa.array(buckets, type=pa.int32()))

    def _keep(table: pa.Table) -> pa.Table:
        if table.num_rows == 0:
            return table
        import pandas as pd

        order = pc.sort_indices(table, sort_keys=[(seq_column, "descending" if desc else "ascending")])
        table = table.take(order)
        joined = table.column(key_columns[0]).cast(pa.string())
        for k in key_columns[1:]:
            joined = pc.binary_join_element_wise(joined, table.column(k).cast(pa.string()), "\x00")
        arr = joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined
        mask = ~pd.Series(np.asarray(arr, dtype=object)).duplicated(keep="last").to_numpy()
        return table.filter(pa.array(mask))

    def final(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        out = _keep(block)
        return out if small else out.drop_columns([BUCKET_COLUMN])

    ds = ds.map_batches(partial, batch_format="pyarrow")
    ds = _keyed_repartition(ds, num_buckets, [BUCKET_COLUMN])
    return ds.map_batches(final, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


def grouped_map(
    ds: "ray.data.Dataset",
    keys: list[str],
    fn,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Robust per-group apply: keyed hash repartition + in-block group
    slicing. Replaces ``groupby().map_groups`` (whose Ray 2.49
    sort-based path can split one group across two UDF calls). ``fn``
    receives one whole group as a pyarrow Table and must handle the
    empty table (used for empty partitions)."""
    _ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = _shuffle_width()
    shuffled = _keyed_repartition(ds, num_partitions, keys)

    def apply(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return fn(block)
        block = block.sort_by([(k, "ascending") for k in keys])
        joined = block.column(keys[0]).cast(pa.string())
        for k in keys[1:]:
            joined = pc.binary_join_element_wise(joined, block.column(k).cast(pa.string()), "\x00")
        vals = np.asarray(
            joined.combine_chunks() if isinstance(joined, pa.ChunkedArray) else joined,
            dtype=object,
        )
        starts = np.flatnonzero(np.r_[True, vals[1:] != vals[:-1]])
        ends = np.r_[starts[1:], len(vals)]
        return pa.concat_tables(
            [fn(block.slice(int(s), int(e - s))) for s, e in zip(starts, ends)]
        )

    return shuffled.map_batches(apply, batch_size=None, batch_format="pyarrow", zero_copy_batch=True)


# merge algebra for two-phase grouped aggregation: how partial results
# combine across blocks. Partial counts merge by SUM.
_AGG_MERGE = {"count": "sum", "min": "min", "max": "max", "sum": "sum"}


def grouped_aggregate(
    ds: "ray.data.Dataset",
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Two-phase grouped aggregation (SURVEY.md §2.5): in-block Arrow
    ``group_by`` shrinks every block to one row per key BEFORE the
    exchange, the keyed repartition moves only those partial rows, and
    a second in-block ``group_by`` merges per the agg's algebra
    (count→sum of partials, min→min, max→max, sum→sum).

    ``aggs`` is ``[(column, fn, alias)]`` with fn in count/min/max/sum
    (``column`` ignored for count — it counts rows). Same results as
    ``ds.groupby(keys).aggregate(...)`` but the shuffle payload is
    bounded by keys × blocks rather than rows, and small inputs skip
    the aggregator pool entirely (``_keyed_repartition``). An empty
    ``aggs`` yields DISTINCT keys (A3).
    """
    _ensure_hash_shuffle()
    if num_partitions is None:
        num_partitions = _shuffle_width()

    def _apply(block: pa.Table, specs: list[tuple[str, str, str]]) -> pa.Table:
        pa_specs = [
            (([], "count_all") if fn == "count" else (col, fn)) for col, fn, _ in specs
        ]
        out = block.group_by(keys).aggregate(pa_specs)
        # arrow names outputs "{col}_{fn}" / "count_all"; rename to alias
        produced = [
            ("count_all" if fn == "count" else f"{col}_{fn}") for col, fn, _ in specs
        ]
        mapping = dict(zip(produced, [a for _, _, a in specs]))
        out = out.rename_columns([mapping.get(c, c) for c in out.column_names])
        return out.select(keys + [a for _, _, a in specs])

    merge_specs = [(alias, _AGG_MERGE[fn], alias) for _, fn, alias in aggs]
    partial_ds = ds.map_batches(
        lambda b: _apply(b, aggs), batch_format="pyarrow", batch_size=None
    )
    shuffled = _keyed_repartition(partial_ds, num_partitions, keys)
    return shuffled.map_batches(
        lambda b: _apply(b, merge_specs),
        batch_size=None,
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


# ---------------------------------------------------------------------------
# reference-operator queries over the testdata tables
# ---------------------------------------------------------------------------

# W2/M11: watermark-slice read with predicate pushdown (S1 read analog)
SLICE_FROM = "2024-01-08T00:00:00"
SLICE_TO = "2024-01-15T00:00:00"


def q_watermark_slice(sf_dir: str):
    """Inclusive [from, to] watermark window, pushed into the read."""
    import datetime as dt

    lo = dt.datetime.fromisoformat(SLICE_FROM)
    hi = dt.datetime.fromisoformat(SLICE_TO)
    return _read(
        sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type"],
        filter=((pads.field("ts") >= lo) & (pads.field("ts") <= hi)),
    )


def q_lww_latest(sf_dir: str):
    """J4/D5: last-writer-wins per (user_id, event_type), event_id as version."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    out = keep_one_per_key(ds, ["user_id", "event_type"], "event_id", keep="last")
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "last_event_id": t.column("event_id"),
            }
        ),
        batch_format="pyarrow",
    )


def q_dedup_first(sf_dir: str):
    """T6/D4: per-object dedup by id — keep the FIRST event per key."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])
    out = keep_one_per_key(ds, ["user_id", "event_type"], "event_id", keep="first")
    return out.map_batches(
        lambda t: pa.table(
            {
                "user_id": t.column("user_id"),
                "event_type": t.column("event_type"),
                "first_event_id": t.column("event_id"),
            }
        ),
        batch_format="pyarrow",
    )


def q_incremental_counts(sf_dir: str):
    """A1/A4: per-window lineage counts (day x event_type)."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "event_type"])

    def add_day(batch: pa.Table) -> pa.Table:
        day = pc.floor_temporal(batch.column("ts"), unit="day")
        return batch.append_column("day", day)

    ds = ds.map_batches(add_day, batch_format="pyarrow")
    return grouped_aggregate(
        ds,
        ["event_type", "day"],
        [
            ("event_id", "count", "n_events"),
            ("event_id", "min", "min_event_id"),
            ("event_id", "max", "max_event_id"),
        ],
    )


def q_enrich_join(sf_dir: str):
    """J1/J2/M8: broadcast-small-side enrichment join (orders x customer x nation)."""
    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    custkeys = np.asarray(cust.column("c_custkey"))
    order_ix = np.argsort(custkeys)
    nation_order = np.argsort(np.asarray(nation.column("n_nationkey")))
    # ALL derived structures built driver-side so the broadcast is
    # read-only: ray.get in the task is a worker-local zero-copy view
    # (fetched once per node), and the stage can run as TASKS — fusing
    # with the read instead of paying an actor-pool spin-up
    lookup_ref = ray.put(
        {
            "custkeys": custkeys[order_ix],
            "nationkeys": np.asarray(cust.column("c_nationkey"))[order_ix],
            "names_by_id": np.asarray(nation.column("n_name")).astype(object)[nation_order],
        }
    )

    def enrich(batch: pa.Table) -> pa.Table:
        lk = ray.get(lookup_ref)
        ck = np.asarray(batch.column("o_custkey"))
        # membership-guarded lookup: an o_custkey absent from the
        # customer table maps to null instead of a wrong neighbor
        # (and can't index past the end of the sorted key array)
        pos = np.clip(np.searchsorted(lk["custkeys"], ck), 0, len(lk["custkeys"]) - 1)
        matched = lk["custkeys"][pos] == ck
        nk = lk["nationkeys"][pos]
        names = lk["names_by_id"][nk].astype(object)
        names[~matched] = None
        return batch.append_column("nation", pa.array(names, type=pa.string()))

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    ds = ds.map_batches(enrich, batch_format="pyarrow")
    return grouped_aggregate(ds, ["nation"], [("o_orderkey", "count", "n_orders")])


def q_semi_join(sf_dir: str):
    """J3: semi-join via broadcast key set (orders of customers in nations 0-4)."""
    cust = pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    keys = pc.filter(
        cust.column("c_custkey"), pc.less(cust.column("c_nationkey"), pa.scalar(5))
    )
    key_set = pa.array(np.asarray(keys))
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("o_custkey"), value_set=key_set)),
        batch_format="pyarrow",
    )


def q_included_fields(sf_dir: str):
    """M5/M6: case-insensitive keep-list projection + mk_ column prefix."""
    include = ["C_CUSTKEY", "c_name", "C_NATIONKEY"]  # case-insensitive, like the reference
    all_cols = pq.read_schema(_t(sf_dir, "customer")).names
    wanted = [c for c in all_cols if c.lower() in {i.lower() for i in include}]
    ds = _read(sf_dir, "customer", columns=wanted)
    return ds.map_batches(
        lambda t: t.rename_columns([f"mk_{c}" for c in t.column_names]),
        batch_format="pyarrow",
    )


SESSION_GAP_MIN = 30


def q_session_windows(sf_dir: str):
    """Gap-based sessionization per user (the streaming-window custom
    operator): events more than SESSION_GAP_MIN minutes apart start a
    new session. Partitioned by user via the keyed-repartition
    grouped_map (each user's events wholly in one group, sorted by ts
    inside the kernel — per-key order only, W7); vectorized numpy
    diff/cumsum inside the group."""
    ds = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_start", pa.timestamp("us")),
            ("n_events", pa.int64()),
            ("first_event_id", pa.int64()),
        ]
    )

    def sessions(block: pa.Table) -> pa.Table:
        # whole-block run kernel (one vector pass per block, not one
        # Python call per user): a session starts where the user
        # changes OR the in-user gap exceeds the threshold
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        ts = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        n = len(user)
        new_user = np.r_[True, user[1:] != user[:-1]]
        gap = np.r_[
            True, (ts[1:] - ts[:-1]) > SESSION_GAP_MIN * 60 * 1_000_000
        ]
        start = new_user | gap
        starts = np.flatnonzero(start)
        counts = np.diff(np.r_[starts, n])
        idx = pa.array(starts)
        return pa.table(
            {
                "user_id": pa.array(user[starts]),
                "session_start": t.column("ts").take(idx),
                "n_events": pa.array(counts, type=pa.int64()),
                "first_event_id": t.column("event_id").take(idx).cast(pa.int64()),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(ds, ["user_id"], sessions, out_schema)


def q_union_slices(sf_dir: str):
    """D1: union of per-slice record streams (two disjoint windows)."""
    import datetime as dt

    def window(lo, hi):
        return _read(
            sf_dir, "events",
            columns=["event_id", "ts", "event_type"],
            filter=(
                (pads.field("ts") >= dt.datetime.fromisoformat(lo))
                & (pads.field("ts") <= dt.datetime.fromisoformat(hi))
            ),
        )

    a = window("2024-01-02T00:00:00", "2024-01-04T00:00:00")
    b = window("2024-01-10T00:00:00", "2024-01-12T00:00:00")
    return a.union(b)


def q_json_extract(sf_dir: str):
    """F6: JSON-typed column access — pull a key out of the props JSON
    (vectorized regex on the canonical payload; a full parse is only
    needed for nested shapes)."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])

    def extract(batch: pa.Table) -> pa.Table:
        m = pc.extract_regex(batch.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)')
        k = pc.struct_field(m, [0]).cast(pa.int64())
        return pa.table({"event_id": batch.column("event_id"), "k_value": k})

    return ds.map_batches(extract, batch_format="pyarrow")


def q_distinct_values(sf_dir: str):
    """A3: ordered distinct collection (program-id analog) via unique."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    distinct = grouped_aggregate(ds, ["event_type"], [])
    vals = sorted(r["event_type"] for r in distinct.take_all())
    return pa.table({"event_type": pa.array(vals, type=pa.string())})


PREVIEW_N = 15


def q_preview_limit(sf_dir: str):
    """M9/O1: preview = first 15 records in id order.

    No global sort: each block emits its local top-15 (vectorized
    partial sort), the driver merges the <= 15 x n_blocks survivors —
    O(n) scan + tiny driver merge instead of an all-to-all sort."""
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "event_type"])

    def local_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= PREVIEW_N:
            return batch
        order = pc.sort_indices(batch, sort_keys=[("event_id", "ascending")])
        return batch.take(order.slice(0, PREVIEW_N))

    parts = ds.map_batches(local_top, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(parts)
    order = pc.sort_indices(merged, sort_keys=[("event_id", "ascending")])
    return merged.take(order.slice(0, PREVIEW_N))


# ---------------------------------------------------------------------------
# training-data operators (documents / embeddings tables)
# ---------------------------------------------------------------------------


def q_doc_dedup_exact(sf_dir: str):
    """Exact dedup: min doc_id per sha256(text) + multiplicity."""
    from embulk_input_marketo_ray.stages.dedup import add_content_hash

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(add_content_hash, batch_format="pyarrow")
    ds = ds.select_columns(["doc_id", "text_sha256"])
    return grouped_aggregate(
        ds,
        ["text_sha256"],
        [("doc_id", "min", "doc_id"), ("doc_id", "count", "n_copies")],
    )


def q_doc_tokens(sf_dir: str):
    """Token counting: whitespace + BPE-ish regex, Arrow-vectorized."""
    from embulk_input_marketo_ray.stages.text import token_counts

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(token_counts, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens_ws", "n_tokens_bpe"])


def q_doc_quality(sf_dir: str):
    """Quality counters (integer outputs only, for exact oracle hashing)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def counters(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_chars": pc.utf8_length(text).cast(pa.int64()),
                "n_words": pc.count_substring_regex(text, pattern=r"\S+").cast(pa.int64()),
                "n_punct": pc.count_substring_regex(text, pattern=r"[^\w\s]").cast(pa.int64()),
            }
        )

    return ds.map_batches(counters, batch_format="pyarrow")


ANN_NUM_QUERIES = 3
ANN_TOP_K = 5


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: query matrix broadcast once (ray.put),
    per-batch numpy matmul, global top-k by groupby over query id.
    Query vectors are selected with a pushed-down parquet predicate —
    the driver never reads the full embeddings column."""
    from embulk_input_marketo_ray.stages.similarity import read_query_vectors

    qt = read_query_vectors(_t(sf_dir, "embeddings"), ANN_NUM_QUERIES)
    qm = list_column_matrix(qt.column("embedding"))
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    qids = np.asarray(qt.column("vec_id"))
    qref = ray.put((qids, qm))

    def score(batch: pa.Table) -> pa.Table:
        qids, qm = ray.get(qref)  # worker-local zero-copy view after first fetch
        emb = list_column_matrix(batch.column("embedding"))
        emb /= np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-30)
        cos = emb @ qm.T  # (batch, n_queries)
        n, q = cos.shape
        return pa.table(
            {
                "query_id": pa.array(np.repeat(qids, n), type=pa.int64()),
                "neighbor_id": pa.array(
                    np.tile(np.asarray(batch.column("vec_id")), q), type=pa.int64()
                ),
                "cos": pa.array(cos.T.reshape(-1), type=pa.float64()),
            }
        )

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    scored = ds.map_batches(score, batch_format="pyarrow")

    def topk(block: pa.Table) -> pa.Table:
        # block = all candidates of >=1 query ids (hash-partitioned)
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("query_id", "ascending"),
                ("cos", "descending"),
                ("neighbor_id", "ascending"),
            ],
        )
        t = block.take(order)
        qid = np.asarray(t.column("query_id"))
        rank = np.arange(len(qid), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, qid[1:] != qid[:-1]])
        rank = rank - np.repeat(rank[starts], np.diff(np.r_[starts, len(qid)])) + 1
        t = t.append_column("rank", pa.array(rank, type=pa.int64()))
        return t.filter(pa.array(rank <= ANN_TOP_K)).select(["query_id", "neighbor_id", "rank"])

    _ensure_hash_shuffle()
    shuffled = _keyed_repartition(scored, ANN_NUM_QUERIES, ["query_id"])
    return shuffled.map_batches(topk, batch_size=None, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# rows-only (non-SQL) operators
# ---------------------------------------------------------------------------


def q_doc_langid(sf_dir: str):
    from embulk_input_marketo_ray.stages.text import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(_task_stage(LangId), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "lang", "lang_pred"])


def q_lang_confusion(sf_dir: str):
    """Language-ID CONFUSION MATRIX: counts by (true lang, predicted
    lang) — the quality-evaluation grid for the classifier behind the
    stratified samplers and per-language curation (a misrouted language
    poisons its stratum's mixing rate). Composes the LangId stage with
    the two-phase grouped aggregate; the exchange moves only the
    langs x langs grid."""
    from embulk_input_marketo_ray.stages.text import LangId

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ds = ds.map_batches(_task_stage(LangId), batch_format="pyarrow")

    def to_pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "lang_pred": batch.column("lang_pred"),
                "n_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    return grouped_aggregate(
        ds.map_batches(to_pairs, batch_format="pyarrow"),
        ["lang", "lang_pred"],
        [("n_docs", "sum", "n_docs")],
    )


def q_order_volume_cumulative(sf_dir: str):
    """Cumulative order volume by day — the running-total time series
    (backlog/growth chart) computed WITHOUT a global sort: per-block
    (day, count, cents) partials fold in-block (payload bounded by the
    day domain x blocks), a driver merge walks the tiny day histogram
    once with integer cumulative sums."""
    _ensure_hash_shuffle()
    orders = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"])
    part_schema = pa.schema(
        [("day", pa.int64()), ("n", pa.int64()), ("cents", pa.int64())]
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        day = np.asarray(batch.column("o_orderdate"), dtype=np.int64) // 86_400_000_000
        cents = np.rint(
            np.asarray(batch.column("o_totalprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        t = pa.table({"day": pa.array(day), "n": pa.array(np.ones(len(day), dtype=np.int64)), "cents": pa.array(cents)})
        agg = t.group_by(["day"]).aggregate([("n", "sum"), ("cents", "sum")])
        return agg.rename_columns(["day", "n", "cents"]).cast(part_schema)

    ns: dict[int, int] = {}
    cs: dict[int, int] = {}
    for r in orders.map_batches(day_partial, batch_format="pyarrow").take_all():
        d = int(r["day"])
        ns[d] = ns.get(d, 0) + int(r["n"])
        cs[d] = cs.get(d, 0) + int(r["cents"])
    days = sorted(ns)
    cum_n = cum_c = 0
    out_n, out_c = [], []
    for d in days:
        cum_n += ns[d]
        cum_c += cs[d]
        out_n.append(cum_n)
        out_c.append(cum_c)
    return pa.table(
        {
            "day": pa.array(days, type=pa.int64()),
            "n_orders": pa.array([ns[d] for d in days], type=pa.int64()),
            "cum_orders": pa.array(out_n, type=pa.int64()),
            "cum_revenue_c100": pa.array(out_c, type=pa.int64()),
        }
    )


def q_repo_activity_trend(sf_dir: str):
    """Per-repo ACTIVITY TREND: the least-squares slope of daily event
    counts over the repo's day index, reported as the EXACT integer
    pair (numerator = n*Sxy - Sx*Sy, denominator = n*Sxx - Sx*Sx) so
    sign and cross-repo comparisons are bit-stable (slope = num/den;
    no float ever materializes). The regression-style aggregate shape:
    everything reduces to the five classic sums.

    Shape: (repo, day) counts via the two-phase aggregate; per-repo
    sums fold from <= days-per-repo rows through a second tiny
    aggregate — the exchange never carries events."""
    _ensure_hash_shuffle()
    ds = _read_events(columns=["repo", "event_ts"])

    def day_rows(batch: pa.Table) -> pa.Table:
        day = (
            np.asarray(batch.column("event_ts"), dtype="datetime64[us]").astype(np.int64)
            // 86_400_000_000
        )
        return pa.table(
            {
                "repo": batch.column("repo"),
                "day": pa.array(day, type=pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )

    daily = grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["repo", "day"],
        [("n", "sum", "n")],
    )

    def sums_rows(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch.column("day"), dtype=np.int64)
        y = np.asarray(batch.column("n"), dtype=np.int64)
        return pa.table(
            {
                "repo": batch.column("repo"),
                "k": pa.array(np.ones(len(x), dtype=np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxy": pa.array(x * y),
                "sxx": pa.array(x * x),
            }
        )

    sums = grouped_aggregate(
        daily.map_batches(sums_rows, batch_format="pyarrow"),
        ["repo"],
        [
            ("k", "sum", "k"),
            ("sx", "sum", "sx"),
            ("sy", "sum", "sy"),
            ("sxy", "sum", "sxy"),
            ("sxx", "sum", "sxx"),
        ],
    )

    def finish(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("k"), dtype=np.int64)
        sx = np.asarray(batch.column("sx"), dtype=np.int64)
        sy = np.asarray(batch.column("sy"), dtype=np.int64)
        sxy = np.asarray(batch.column("sxy"), dtype=np.int64)
        sxx = np.asarray(batch.column("sxx"), dtype=np.int64)
        return pa.table(
            {
                "repo": batch.column("repo"),
                "n_days": pa.array(k),
                "slope_num": pa.array(k * sxy - sx * sy, type=pa.int64()),
                "slope_den": pa.array(k * sxx - sx * sx, type=pa.int64()),
            }
        )

    return sums.map_batches(finish, batch_format="pyarrow")


FUNNEL_LAT_A = "signup"
FUNNEL_LAT_B = "purchase"


def q_funnel_latency(sf_dir: str):
    """Funnel STEP LATENCY: per user, the time from their FIRST
    ``signup`` to their first ``purchase`` AT OR AFTER it, aggregated
    to (n_converted, sum/min/max latency in exact integer us) — the
    time-to-convert metric next to ``event_funnel``'s ordered-stage
    counts. Users whose purchases all precede their signup don't
    convert.

    Shape: the scan keeps only the two step types (pushdown filter
    in-block), ONE keyed exchange on user co-locates each user's step
    events, the kernel takes first-A then searchsorted first-B >= A
    per run, and the block folds to ONE partial row; a driver sum
    finishes — integer microseconds end to end."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def steps_only(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array([FUNNEL_LAT_A, FUNNEL_LAT_B]),
        )
        t = batch.filter(keep)
        return pa.table(
            {
                "user_id": t.column("user_id").cast(pa.int64()),
                "is_b": pc.equal(
                    t.column("event_type"), pa.scalar(FUNNEL_LAT_B)
                ).cast(pa.int8()),
                "ts_us": t.column("ts").cast(pa.int64()),
            }
        )

    part_schema = pa.schema(
        [
            ("n_converted", pa.int64()),
            ("sum_lat_us", pa.int64()),
            ("min_lat_us", pa.int64()),
            ("max_lat_us", pa.int64()),
        ]
    )

    def latency_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("user_id", "ascending"), ("ts_us", "ascending")]
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        is_b = np.asarray(t.column("is_b"), dtype=np.int8)
        ts = np.asarray(t.column("ts_us"), dtype=np.int64)
        new_run = np.r_[True, user[1:] != user[:-1]]
        run_idx = np.cumsum(new_run) - 1
        n_runs = int(run_idx[-1]) + 1
        _IMAX = np.iinfo(np.int64).max
        # first A timestamp per run (events are time-sorted in-run)
        first_a = np.full(n_runs, _IMAX, dtype=np.int64)
        a_rows = is_b == 0
        np.minimum.at(first_a, run_idx[a_rows], ts[a_rows])
        # first B at or after the run's first A
        first_b = np.full(n_runs, _IMAX, dtype=np.int64)
        b_rows = (is_b == 1) & (ts >= first_a[run_idx])
        np.minimum.at(first_b, run_idx[b_rows], ts[b_rows])
        conv = (first_a < _IMAX) & (first_b < _IMAX)
        if not conv.any():
            return part_schema.empty_table()
        lat = first_b[conv] - first_a[conv]
        return pa.table(
            {
                "n_converted": pa.array([int(conv.sum())], type=pa.int64()),
                "sum_lat_us": pa.array([int(lat.sum())], type=pa.int64()),
                "min_lat_us": pa.array([int(lat.min())], type=pa.int64()),
                "max_lat_us": pa.array([int(lat.max())], type=pa.int64()),
            },
            schema=part_schema,
        )

    n = s = 0
    mn, mx = None, None
    for r in _keyed_exchange_apply(
        ds.map_batches(steps_only, batch_format="pyarrow"),
        ["user_id"],
        latency_kernel,
        part_schema,
    ).take_all():
        n += int(r["n_converted"])
        s += int(r["sum_lat_us"])
        mn = int(r["min_lat_us"]) if mn is None else min(mn, int(r["min_lat_us"]))
        mx = int(r["max_lat_us"]) if mx is None else max(mx, int(r["max_lat_us"]))
    return pa.table(
        {
            "n_converted": pa.array([n], type=pa.int64()),
            "sum_lat_us": pa.array([s], type=pa.int64()),
            "mean_lat_us": pa.array([s // max(n, 1)], type=pa.int64()),
            "min_lat_us": pa.array([mn if mn is not None else 0], type=pa.int64()),
            "max_lat_us": pa.array([mx if mx is not None else 0], type=pa.int64()),
        }
    )


CM_DEPTH = 4
CM_WIDTH = 1024
CM_PROBE_USERS = tuple(range(10))


def q_user_cm_sketch(sf_dir: str):
    """COUNT-MIN frequency sketch over the event stream: estimated
    per-user event counts for a probe set, from a d x w integer sketch
    — the mergeable point-frequency structure (Cormode & Muthukrishnan)
    completing the sketch family next to HLL (distinct), DDSketch
    (quantiles), KMV (cardinality+sample) and bottom-K (sampling).
    Estimates are upper bounds (est >= exact, within n/w with
    probability 1-2^-d); every arithmetic step is integer and the hash
    is the repo's SplitMix64, so the independent Python-replica oracle
    is bit-exact.

    Shape: each block folds its events into ONE d x w int64 matrix
    (three vectorized passes), partials ship as <= d*w nonzero rows,
    the driver sums matrices and answers the probe set with a min over
    d cells — the stream never shuffles and the sketch is 32 KiB at
    any cardinality."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id"])
    part_schema = pa.schema(
        [("row", pa.int32()), ("col", pa.int32()), ("cnt", pa.int64())]
    )
    seeds = np.arange(1, CM_DEPTH + 1, dtype=np.uint64) * np.uint64(
        0xA24BAED4963EE407
    )

    def cm_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        u = np.asarray(batch.column("user_id"), dtype=np.int64).view(np.uint64)
        rows_l, cols_l, cnts_l = [], [], []
        for d in range(CM_DEPTH):
            cols = (splitmix64(u ^ seeds[d]) % np.uint64(CM_WIDTH)).astype(np.int64)
            cnt = np.bincount(cols, minlength=CM_WIDTH).astype(np.int64)
            nz = np.flatnonzero(cnt)
            rows_l.append(np.full(len(nz), d, dtype=np.int32))
            cols_l.append(nz.astype(np.int32))
            cnts_l.append(cnt[nz])
        return pa.table(
            {
                "row": pa.array(np.concatenate(rows_l)),
                "col": pa.array(np.concatenate(cols_l)),
                "cnt": pa.array(np.concatenate(cnts_l)),
            },
            schema=part_schema,
        )

    cm = np.zeros((CM_DEPTH, CM_WIDTH), dtype=np.int64)
    for r in ds.map_batches(cm_partial, batch_format="pyarrow").take_all():
        cm[int(r["row"]), int(r["col"])] += int(r["cnt"])
    probe = np.array(CM_PROBE_USERS, dtype=np.uint64)
    ests = np.empty(len(probe), dtype=np.int64)
    for i, u in enumerate(probe):
        # % must stay in uint64 (a Python-int modulus silently promotes
        # uint64 to float64 and corrupts the low bits)
        cells = [
            cm[
                d,
                int(
                    splitmix64(np.array([u], dtype=np.uint64) ^ seeds[d])[0]
                    % np.uint64(CM_WIDTH)
                ),
            ]
            for d in range(CM_DEPTH)
        ]
        ests[i] = min(cells)
    return pa.table(
        {
            "user_id": pa.array(probe.astype(np.int64)),
            "est_count": pa.array(ests),
        }
    )


BOTTOMK_K = 100


def q_doc_bottomk_sample(sf_dir: str):
    """Fixed-size UNIFORM sample via the mergeable BOTTOM-K sketch: the
    K docs with the smallest multiplicative hash of doc_id — the
    distributed equivalent of reservoir sampling, but deterministic,
    mergeable (bottom-k of a union = bottom-k of the partials' union)
    and resumable (no RNG state, stable under repartition and under
    corpus growth: a new doc only enters by evicting the current max).

    Shape: per-block bottom-K partials (one np.partition per block),
    driver merge of K x blocks rows — no exchange at any corpus
    size."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    part_schema = pa.schema([("doc_id", pa.int64()), ("h", pa.int64())])

    def bottomk_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        ids = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = ((ids % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD
        k = min(BOTTOMK_K, len(h))
        sel = np.argpartition(h, k - 1)[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[sel].astype(np.int64)),
                "h": pa.array(h[sel].astype(np.int64)),
            },
            schema=part_schema,
        )

    rows = ds.map_batches(bottomk_partial, batch_format="pyarrow").take_all()
    if not rows:
        return part_schema.empty_table()
    merged = pa.Table.from_pylist(rows, schema=part_schema)
    order = pc.sort_indices(
        merged, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
    )
    return merged.take(order.slice(0, BOTTOMK_K))


KMV_K = 256


def q_token_kmv_distinct(sf_dir: str):
    """Distinct-token CARDINALITY via the KMV (k minimum values)
    sketch: keep the K smallest version-stable 64-bit token hashes;
    ``est = (K-1) * 2^64 // h_K`` — the classic order-statistics
    estimator, an alternative to HLL whose sketch doubles as a uniform
    sample of the distinct domain. Integer end to end (the division is
    one Python bigint floor on the driver), so the oracle (an
    independent pure-Python replica of the same polynomial hash) is
    bit-exact.

    Shape: per-block distinct-hash bottom-K partials, driver merge —
    the corpus never shuffles and the sketch is K uint64s."""
    from embulk_input_marketo_ray.stages.text import _poly_hash64

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["text"])
    part_schema = pa.schema([("h", pa.uint64())])

    def kmv_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        if len(flat) == 0:
            return part_schema.empty_table()
        flat = pc.unique(flat)
        h = np.unique(_poly_hash64(flat, np.uint64(1099511628211), np.uint64(0x9E3779B9)))
        k = min(KMV_K, len(h))
        return pa.table({"h": pa.array(h[:k], type=pa.uint64())}, schema=part_schema)

    hs = []
    for r in ds.map_batches(kmv_partial, batch_format="pyarrow").take_all():
        hs.append(int(r["h"]))
    merged = np.unique(np.array(hs, dtype=np.uint64))
    if len(merged) >= KMV_K:
        kth = int(merged[KMV_K - 1])
        est = (KMV_K - 1) * (1 << 64) // max(kth, 1)
        k_used = KMV_K
    else:
        est = len(merged)  # fewer distinct than K: the sketch is exact
        k_used = len(merged)
    return pa.table(
        {
            "k_used": pa.array([k_used], type=pa.int64()),
            "est_distinct": pa.array([int(est)], type=pa.int64()),
        }
    )


def q_token_overlap_sketch(sf_dir: str):
    """KMV SET-OPERATION estimate: the Jaccard overlap between the
    even-doc and odd-doc token vocabularies from two mergeable bottom-K
    sketches — among the K smallest hashes of the UNION, the fraction
    present in BOTH sides (the classic theta/KMV intersection rule; a
    union-bottom-K hash is always inside its own side's bottom-K, so
    the two per-side sketches suffice). Integer per-mille output,
    bit-exact vs the pure-Python replica oracle.

    Shape: per-block per-side distinct-hash bottom-K partials, driver
    merge of 2 x K x blocks uint64s — corpus never shuffles."""
    from embulk_input_marketo_ray.stages.text import _poly_hash64

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    part_schema = pa.schema([("side", pa.int8()), ("h", pa.uint64())])

    def kmv_sides(batch: pa.Table) -> pa.Table:
        parts = []
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        for side in (0, 1):
            sel = batch.filter(pa.array(ids % 2 == side))
            toks = pc.split_pattern_regex(
                pc.utf8_lower(pc.coalesce(sel.column("text"), pa.scalar(""))),
                pattern="[^a-z]+",
            )
            if isinstance(toks, pa.ChunkedArray):
                toks = toks.combine_chunks()
            flat = toks.flatten()
            flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
            if len(flat) == 0:
                continue
            h = np.unique(
                _poly_hash64(pc.unique(flat), np.uint64(1099511628211), np.uint64(0x9E3779B9))
            )[: KMV_K]
            parts.append(
                pa.table(
                    {
                        "side": pa.array(np.full(len(h), side, dtype=np.int8)),
                        "h": pa.array(h, type=pa.uint64()),
                    },
                    schema=part_schema,
                )
            )
        return pa.concat_tables(parts) if parts else part_schema.empty_table()

    a_parts, b_parts = [], []
    for r in ds.map_batches(kmv_sides, batch_format="pyarrow").take_all():
        (a_parts if int(r["side"]) == 0 else b_parts).append(int(r["h"]))
    a = np.unique(np.array(a_parts, dtype=np.uint64))[:KMV_K]
    b = np.unique(np.array(b_parts, dtype=np.uint64))[:KMV_K]
    union = np.unique(np.concatenate([a, b]))
    k_used = min(KMV_K, len(union))
    top = union[:k_used]
    n_both = int(
        (np.isin(top, a) & np.isin(top, b)).sum()
    )
    return pa.table(
        {
            "k_used": pa.array([k_used], type=pa.int64()),
            "n_both": pa.array([n_both], type=pa.int64()),
            "est_jaccard_pm": pa.array(
                [1000 * n_both // max(k_used, 1)], type=pa.int64()
            ),
        }
    )


CURATION_HIST_BUDGET = 2_000_000  # distinct metric values broadcast cap


def q_doc_curation_priority(sf_dir: str):
    """Composite CURATION PRIORITY: each doc scored by the sum of its
    integer percentile ranks across three quality metrics — length
    (higher better), 3-gram repetition per-mille (lower better),
    zlib compression per-mille (higher = less templated, better) —
    the multi-signal eviction/keep policy real curation pipelines run
    after the individual filters. ``priority = pct(len) + (1000 -
    pct(rep)) + pct(comp)`` where ``pct(v) = 1000 * #{strictly
    smaller} // total`` — pure integers, bit-stable vs the SQL
    rank()-window oracle.

    Shape: ONE metrics pass (grams + zlib fused per block) materializes
    a 4-int-column table; per-metric VALUE histograms fold from
    in-block partials to the driver (domains: distinct lengths +
    2x1001 per-milles — budgeted); percentiles then need only a
    broadcast cumulative histogram, NO keyed exchange and no global
    sort anywhere."""
    import zlib

    from embulk_input_marketo_ray.stages.text import doc_grams

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])
    metrics_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("m_len", pa.int64()),
            ("rep_pm", pa.int64()),
            ("comp_pm", pa.int64()),
        ]
    )

    def metrics_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return metrics_schema.empty_table()
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        g = doc_grams(batch, n=3)
        n_grams = np.zeros(len(ids), dtype=np.int64)
        n_dist = np.zeros(len(ids), dtype=np.int64)
        if g.num_rows:
            tot = g.group_by(["doc_id"]).aggregate([([], "count_all")])
            pos = np.searchsorted(ids, np.asarray(tot.column("doc_id"), dtype=np.int64))
            n_grams[pos] = np.asarray(tot.column("count_all"), dtype=np.int64)
            dis = (
                g.group_by(["doc_id", "gram"])
                .aggregate([])
                .group_by(["doc_id"])
                .aggregate([([], "count_all")])
            )
            pos = np.searchsorted(ids, np.asarray(dis.column("doc_id"), dtype=np.int64))
            n_dist[pos] = np.asarray(dis.column("count_all"), dtype=np.int64)
        rep_pm = 1000 * (n_grams - n_dist) // np.maximum(n_grams, 1)
        # same formula as q_doc_compression_ratio (ratio 0 for empty
        # text) so the SQL oracle can join that entry's parquet oracle
        comp = np.empty(len(ids), dtype=np.int64)
        texts = batch.column("text").to_pylist()
        for i, s in enumerate(texts):  # GIL-released C compress per doc
            raw = (s or "").encode("utf-8")
            comp[i] = (
                1000 * len(zlib.compress(raw, 6)) // len(raw) if raw else 0
            )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "m_len": batch.column("n_chars").cast(pa.int64()),
                "rep_pm": pa.array(rep_pm),
                "comp_pm": pa.array(comp),
            },
            schema=metrics_schema,
        )

    # metrics_block's searchsorted alignment needs doc_ids sorted
    # within the block: sort each batch first (cheap, in-block)
    def sort_block(batch: pa.Table) -> pa.Table:
        return batch.take(pc.sort_indices(batch, sort_keys=[("doc_id", "ascending")]))

    metrics = (
        ds.map_batches(sort_block, batch_format="pyarrow")
        .map_batches(metrics_block, batch_format="pyarrow")
        .materialize()
    )

    hist_schema = pa.schema(
        [("metric", pa.int32()), ("value", pa.int64()), ("cnt", pa.int64())]
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        parts = []
        for mi, col in enumerate(["m_len", "rep_pm", "comp_pm"]):
            t = (
                pa.table({"value": batch.column(col)})
                .group_by(["value"])
                .aggregate([([], "count_all")])
            )
            parts.append(
                pa.table(
                    {
                        "metric": pa.array(
                            np.full(t.num_rows, mi, dtype=np.int32)
                        ),
                        "value": t.column("value"),
                        "cnt": t.column("count_all").cast(pa.int64()),
                    },
                    schema=hist_schema,
                )
            )
        return pa.concat_tables(parts)

    hists: dict[int, dict[int, int]] = {0: {}, 1: {}, 2: {}}
    for r in metrics.map_batches(hist_partial, batch_format="pyarrow").take_all():
        h = hists[int(r["metric"])]
        v = int(r["value"])
        h[v] = h.get(v, 0) + int(r["cnt"])
    if sum(len(h) for h in hists.values()) > CURATION_HIST_BUDGET:
        raise RuntimeError(
            "metric-value histograms exceed the broadcast budget "
            f"({CURATION_HIST_BUDGET}); range-partition the metric space "
            "and rank per range instead"
        )
    total = sum(hists[0].values())
    broadcast = []
    for mi in range(3):
        vals = np.array(sorted(hists[mi]), dtype=np.int64)
        cnts = np.array([hists[mi][v] for v in vals], dtype=np.int64)
        below = np.r_[0, np.cumsum(cnts)[:-1]]  # strictly-smaller counts
        broadcast.append((vals, below))
    hist_ref = ray.put((broadcast, total))

    def score_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("priority", pa.array([], type=pa.int64()))
        (bc, tot) = ray.get(hist_ref)

        def pct(col: str, mi: int) -> np.ndarray:
            v = np.asarray(batch.column(col), dtype=np.int64)
            vals, below = bc[mi]
            return 1000 * below[np.searchsorted(vals, v)] // max(tot, 1)

        prio = pct("m_len", 0) + (1000 - pct("rep_pm", 1)) + pct("comp_pm", 2)
        return batch.append_column("priority", pa.array(prio, type=pa.int64()))

    return metrics.map_batches(score_block, batch_format="pyarrow")


def q_doc_fingerprint(sf_dir: str):
    from embulk_input_marketo_ray.stages.text import Fingerprinter

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(_task_stage(Fingerprinter), batch_format="pyarrow")
    return ds.select_columns(["doc_id", "fingerprint"])


def q_doc_simhash(sf_dir: str):
    from embulk_input_marketo_ray.stages.dedup import SimHasher

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(_task_stage(SimHasher), batch_format="pyarrow")
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t.column("doc_id"), "simhash": t.column("simhash").cast(pa.int64(), safe=False)}
        ),
        batch_format="pyarrow",
    )


def _t_tuned(sf_dir: str, name: str) -> str:
    """Path of a driving table for queries that read via a stage's own
    ``read_parquet`` (the ANN paths): tune the shuffle width to its
    size here, exactly as ``_read`` does."""
    import os as _os

    path = _t(sf_dir, name)
    _tune_shuffle_for_bytes(_os.path.getsize(path))
    return path


def q_ann_lsh_topk(sf_dir: str):
    """Approximate (LSH-bucketed) ANN — the scale path for q_ann_topk."""
    from embulk_input_marketo_ray.stages.similarity import ann_lsh_topk

    return ann_lsh_topk(_t_tuned(sf_dir, "embeddings"))


def q_ann_ivf_topk(sf_dir: str):
    """IVF (inverted-file) ANN — bounded-sample coarse quantizer +
    distributed nearest-centroid assignment + probe-list exact compare."""
    from embulk_input_marketo_ray.stages.similarity import ann_ivf_topk

    return ann_ivf_topk(_t_tuned(sf_dir, "embeddings"))


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup pairs via LSH buckets."""
    from embulk_input_marketo_ray.stages.similarity import embedding_near_dup_pairs

    # testdata embeddings are near-orthogonal (max off-diag cosine ~0.5);
    # a production near-dup threshold would be ~0.95
    return embedding_near_dup_pairs(_t_tuned(sf_dir, "embeddings"), threshold=0.45)


def q_multimodal_pipeline(sf_dir: str):
    """Decode -> resize -> audio-featurize over a synthetic media table
    (decode stubbed, Ray plumbing real; small batches for big rows)."""
    import ray.data as rd

    from embulk_input_marketo_ray.stages.multimodal import (
        DEFAULT_MEDIA_BATCH_SIZE,
        AudioFeaturizer,
        ImageDecoder,
        ImageResizer,
        synth_media_table,
    )

    ds = rd.from_arrow(synth_media_table(256))
    ds = ds.map_batches(
        ImageDecoder, batch_format="pyarrow", batch_size=DEFAULT_MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )
    ds = ds.map_batches(
        ImageResizer, batch_format="pyarrow", batch_size=DEFAULT_MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )
    ds = ds.map_batches(
        AudioFeaturizer, batch_format="pyarrow", batch_size=DEFAULT_MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )
    return ds.select_columns(["media_id", "media_type", "decode_ok"])


def q_multimodal_real_decode(sf_dir: str):
    """GENUINE-codec multimodal decode: real 24-bit BMPs and PCM16
    WAVs (generated by ``synth.synth_real_media_table``, validated by
    stdlib readers) decoded by ``RealMediaDecoder`` — struct header
    parsing + numpy pixel/sample kernels, no external codec libraries
    — closing the 'decode is a stub' gap for the formats pure
    stdlib/numpy can handle. Integer-exact decode facts (channel sums,
    sample energy, peak) so the oracle (generator-side ground truth +
    stdlib ``wave``) is bit-exact. Actor-pool stage, small batches for
    wide rows (the multimodal memory contract)."""
    import ray.data as rd

    from embulk_input_marketo_ray.stages.multimodal import (
        DEFAULT_MEDIA_BATCH_SIZE,
        RealMediaDecoder,
    )
    from embulk_input_marketo_ray.synth import synth_real_media_table

    _ensure_hash_shuffle()
    ds = rd.from_arrow(synth_real_media_table(256))
    return ds.map_batches(
        RealMediaDecoder,
        batch_format="pyarrow",
        batch_size=DEFAULT_MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )


def q_activity_static_schema(sf_dir: str):
    """F4: activity-style all-string payload -> static typed schema with
    canonical-JSON attributes + invalid-record (dead-letter) filter."""
    import ray.data as rd

    from embulk_input_marketo_ray.stages.static_schema import (
        ACTIVITY_FIELDS,
        apply_static_schema,
        filter_invalid_records,
    )

    rows = []
    for i in range(2000):
        rows.append(
            {
                "marketoGUID": f"guid{i:06d}",
                "leadId": str(i % 97),
                "activityDate": f"2024-02-{(i % 28) + 1:02d}T07:00:00+0000",
                "activityTypeId": str(i % 12),
                "campaignId": "null" if i % 5 == 0 else str(i % 40),
                "primaryAttributeValueId": str(i),
                "primaryAttributeValue": f"v{i}",
                "attributes": f'{{"Source Type":"List import","n":{i}}}',
                "reasons": '[{"code":"1003"}]' if i % 50 == 0 else None,
            }
        )
    ds = rd.from_items(rows)
    ds = ds.map_batches(filter_invalid_records, batch_format="pyarrow")
    return ds.map_batches(
        apply_static_schema, batch_format="pyarrow", fn_kwargs={"fields": ACTIVITY_FIELDS}
    )


def q_doc_dup_clusters(sf_dir: str):
    """MinHash+LSH pairs -> connected components (cluster_id = min
    doc_id); the canonical-document selection step of near-dedup."""
    from embulk_input_marketo_ray.stages.dedup import resolve_dup_clusters

    pairs = q_doc_minhash_dup_pairs(sf_dir).select_columns(["doc_id", "dup_of"])
    return resolve_dup_clusters(pairs)


def q_doc_dedup_near(sf_dir: str, loser_broadcast_limit: int = 256 << 20):
    """End-to-end near-dedup of the corpus: MinHash+LSH candidates ->
    exact-Jaccard verify -> connected components -> drop every
    non-canonical cluster member.

    Two drop strategies, budgeted like the flagship's
    ``late_broadcast_limit``:

    - loser set within budget (the normal case — near-dup losers are ∝
      the duplicate count, orders of magnitude smaller than the corpus):
      broadcast the sorted loser ids once (``ray.put``) and run a fused
      searchsorted filter — the 10^10-row path never shuffles;
    - over budget (a 50%-duplicate web crawl: billions of losers would
      be a multi-GB broadcast re-read by every task): keyed anti-join —
      one hash exchange of (corpus ids ⋈ loser ids), no driver
      materialization of the loser set at all. The budget check itself
      is block metadata (``count()`` of 8-byte ids), not a collect."""
    # set the shuffle strategy BEFORE creating datasets: a Dataset
    # snapshots the DataContext at creation, and the anti-join fallback
    # needs both sides planned under HASH_SHUFFLE
    _ensure_hash_shuffle()
    # materialize BEFORE count: a lazy count() would execute the whole
    # clustering pipeline once for the emptiness check and the
    # downstream map would execute it again
    clusters_ds = q_doc_dup_clusters(sf_dir).materialize()
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    if clusters_ds.count() == 0:  # empty pair set -> nothing to drop
        return ds

    def to_losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("doc_id"), batch.column("cluster_id"))
        return pa.table(
            {"loser_id": batch.filter(keep).column("doc_id").cast(pa.int64())}
        )

    losers_ds = clusters_ds.map_batches(to_losers, batch_format="pyarrow").materialize()
    return _drop_losers(ds, losers_ds, loser_broadcast_limit)


def _drop_losers(ds, losers_ds, loser_broadcast_limit: int):
    """Budgeted drop of a loser-id set from a corpus id Dataset: the
    shared tail of every near-dedup policy (min-id canonical,
    keep-best). ``losers_ds`` must be materialized with a single
    ``loser_id`` int64 column. Within budget: one ``ray.put`` of the
    sorted ids + fused searchsorted filter (corpus never shuffles);
    over budget: keyed anti-join (left-outer + keep-null), no driver
    materialization of the loser set."""
    n_losers = losers_ds.count()
    if n_losers == 0:
        return ds

    if 8 * n_losers <= loser_broadcast_limit:
        losers = np.sort(
            np.concatenate(
                [
                    np.asarray(t.column("loser_id"), dtype=np.int64)
                    for t in ray.get(losers_ds.to_arrow_refs())
                    if t.num_rows
                ]
            )
        )
        ref = ray.put(losers)

        def keep(batch: pa.Table) -> pa.Table:
            from embulk_input_marketo_ray.stages.dedup import sorted_member_mask

            losers = ray.get(ref)  # zero-copy plasma view after first fetch
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            return batch.filter(pa.array(~sorted_member_mask(losers, ids)))

        return ds.map_batches(keep, batch_format="pyarrow")

    # anti-join fallback: Ray Data has no anti join, so left-outer join
    # against a marker column and keep the null (non-matching) rows
    _ensure_hash_shuffle()

    def add_marker(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__loser", pa.array(np.ones(batch.num_rows, dtype=np.int8))
        )

    # drop the schema-less empty blocks the upstream keyed exchanges
    # emit for empty partitions — Dataset.join can't resolve the key
    # field on them (see stages/dedup.drop_schemaless_blocks)
    from embulk_input_marketo_ray.stages.dedup import drop_schemaless_blocks

    marked = drop_schemaless_blocks(
        losers_ds.map_batches(add_marker, batch_format="pyarrow").materialize(),
        pa.schema([("loser_id", pa.int64()), ("__loser", pa.int8())]),
    )
    joined = ds.join(
        marked,
        "left_outer",
        num_partitions=16,
        on=("doc_id",),
        right_on=("loser_id",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def keep_unmatched(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_null(batch.column("__loser"))).select(["doc_id"])

    return joined.map_batches(keep_unmatched, batch_format="pyarrow")


def q_doc_dedup_near_keep_best(sf_dir: str, loser_broadcast_limit: int = 256 << 20):
    """Near-dedup that keeps the BEST cluster member instead of the
    min-id one — the policy real curation pipelines use (keep the
    longest/highest-quality copy of a near-dup cluster). Survivor per
    cluster = max ``n_chars``, ties broken by min ``doc_id``;
    non-members all survive.

    Scale shape: cluster membership is ∝ the duplicate count (the
    small side by design), and it is BUDGETED like every small-side
    attach in this catalog (``loser_broadcast_limit``):

    - within budget (the normal case): member ids broadcast once
      (``ray.put``), member lengths fetched with a fused
      broadcast-searchsorted filter over a two-column pruned read —
      the corpus' text never moves and its id stream never shuffles —
      and the per-cluster argmax is ONE driver-side lexsort over
      member-only rows (three int64 columns ∝ the dup count). Zero
      keyed exchanges beyond the clustering itself.
    - over budget (a crawl where membership outgrows driver memory):
      no driver-held member set at all — the full corpus' (doc_id,
      n_chars) rows ride one keyed exchange on doc_id to meet the
      member rows (arrow group-max collapses the null-tagged union),
      and a second exchange on cluster_id picks winners per block
      (clusters are whole per partition).

    Either way the loser drop reuses the budgeted broadcast /
    anti-join tail shared with ``q_doc_dedup_near``."""
    _ensure_hash_shuffle()
    # materialize once, then count — a lazy count() would run the full
    # clustering pipeline twice (emptiness check + downstream use)
    members = q_doc_dup_clusters(sf_dir).materialize()
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_members = members.count()
    if n_members == 0:
        return ds

    # 32 B/member models what the driver actually holds on this path:
    # two int64 columns (doc_id, cluster_id) plus the derived
    # order/chars work arrays — not just the 8-byte id the loser-drop
    # broadcast gate models
    if 32 * n_members <= loser_broadcast_limit:
        # ---- broadcast path: no exchange, driver lexsort of members ----
        member_tbl = pa.concat_tables(
            [t for t in ray.get(members.to_arrow_refs()) if t.num_rows]
        ).combine_chunks()
        m_ids = np.asarray(member_tbl.column("doc_id"), dtype=np.int64)
        m_cids = np.asarray(member_tbl.column("cluster_id"), dtype=np.int64)
        order = np.argsort(m_ids, kind="stable")
        m_ids, m_cids = m_ids[order], m_cids[order]
        ids_ref = ray.put(m_ids)

        def member_lens(batch: pa.Table) -> pa.Table:
            from embulk_input_marketo_ray.stages.dedup import sorted_member_mask

            want = ray.get(ids_ref)  # zero-copy plasma view
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            hit = batch.filter(pa.array(sorted_member_mask(want, ids)))
            return pa.table(
                {
                    "doc_id": hit.column("doc_id").cast(pa.int64()),
                    "n_chars": hit.column("n_chars").cast(pa.int64()),
                }
            )

        lens_parts = [
            t
            for t in _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
            .map_batches(member_lens, batch_format="pyarrow")
            .iter_batches(batch_size=None, batch_format="pyarrow")
            if t.num_rows
        ]
        lens_tbl = (
            pa.concat_tables(lens_parts).combine_chunks()
            if lens_parts
            else pa.table({"doc_id": pa.array([], pa.int64()), "n_chars": pa.array([], pa.int64())})
        )
        l_ids = np.asarray(lens_tbl.column("doc_id"), dtype=np.int64)
        l_chars = np.asarray(lens_tbl.column("n_chars"), dtype=np.int64)
        # align lengths to the sorted member vector (every member is a
        # corpus doc, so the searchsorted hit is total)
        pos = np.searchsorted(m_ids, l_ids)
        chars = np.zeros(len(m_ids), dtype=np.int64)
        chars[pos] = l_chars
        # winner per cluster = max n_chars, ties min doc_id: lexsort is
        # last-key-primary, so (doc_id, -n_chars, cluster_id) sorts by
        # cluster, then length desc, then id asc — first row per
        # cluster run is the winner, the rest are losers
        w = np.lexsort((m_ids, -chars, m_cids))
        cid_sorted = m_cids[w]
        is_winner = np.r_[True, cid_sorted[1:] != cid_sorted[:-1]]
        losers_ds = ray.data.from_arrow(
            pa.table({"loser_id": pa.array(m_ids[w][~is_winner], type=pa.int64())})
        ).materialize()
        return _drop_losers(ds, losers_ds, loser_broadcast_limit)

    # ---- exchange path: membership too big for any driver-held set ----
    def member_lens_all(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": pa.nulls(batch.num_rows, type=pa.int64()),
                "n_chars": batch.column("n_chars").cast(pa.int64()),
            }
        )

    def member_rows(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
                "n_chars": pa.nulls(batch.num_rows, type=pa.int64()),
            }
        )

    lens_ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"]).map_batches(
        member_lens_all, batch_format="pyarrow"
    )
    tagged = members.map_batches(member_rows, batch_format="pyarrow").union(lens_ds)

    def attach(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_id": pa.array([], pa.int64()),
                    "n_chars": pa.array([], pa.int64()),
                }
            )
        g = block.group_by(["doc_id"]).aggregate(
            [("cluster_id", "max"), ("n_chars", "max")]
        )
        t = pa.table(
            {
                "doc_id": g.column("doc_id"),
                "cluster_id": g.column("cluster_id_max"),
                "n_chars": g.column("n_chars_max"),
            }
        )
        # length rows for non-members can only appear if the prefilter
        # had a searchsorted clip hit; membership requires cluster_id
        return t.filter(pc.is_valid(t.column("cluster_id")))

    attached = _keyed_exchange_apply(
        tagged,
        ["doc_id"],
        attach,
        pa.schema(
            [("doc_id", pa.int64()), ("cluster_id", pa.int64()), ("n_chars", pa.int64())]
        ),
    )

    def losers_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"loser_id": pa.array([], pa.int64())})
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("cluster_id", "ascending"),
                ("n_chars", "descending"),
                ("doc_id", "ascending"),
            ],
        )
        t = block.take(order)
        cid = np.asarray(t.column("cluster_id"), dtype=np.int64)
        is_winner = np.r_[True, cid[1:] != cid[:-1]]
        return pa.table(
            {"loser_id": t.column("doc_id").filter(pa.array(~is_winner))}
        )

    losers_ds = (
        _keyed_repartition(attached, _shuffle_width(), ["cluster_id"])
        .map_batches(
            losers_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .materialize()
    )
    return _drop_losers(ds, losers_ds, loser_broadcast_limit)


def q_token_paged_source(sf_dir: str):
    """S4: token-cursor paged source (fixture server) with mid-stream
    token expiry + rate-limit + bad-JSON injections, all retried."""
    from embulk_input_marketo_ray.sources.paged import read_token_paged

    return read_token_paged(2000, fail_plan={1: "602", 3: "606", 5: "badjson"})


def q_offset_paged_source(sf_dir: str):
    """S5: offset-window paged source, windows fanned out in parallel."""
    from embulk_input_marketo_ray.sources.paged import read_offset_paged

    return read_offset_paged(3000, fail_plan={0: "606"})


def q_offset_paged_csv(sf_dir: str):
    """S5 through the U4 decoder seam: the server serves raw CSV bodies
    (the bulk-extract stream shape) and ``csv_payload_decoder`` feeds
    the SAME offset-paging protocol — result set identical to the JSON
    envelope path."""
    from embulk_input_marketo_ray.sources.paged import read_offset_paged

    return read_offset_paged(1500, payload_format="csv")


def q_program_by_tag(sf_dir: str):
    """Program target with ``query_by=tag``: the tagType/tagValue pair
    is a SERVER-side filter — only matching programs are fetched
    (rest/MarketoRestClient.java:373-391, ProgramInputPlugin.java:83-133)."""
    from embulk_input_marketo_ray.registry import build_target

    return build_target(
        "program",
        {
            "query_by": "tag",
            "n_records": 3000,
            "tag_type": "type",
            "tag_value": "trigger",
        },
    )


CUSTOM_OBJECT_FROM = 1
CUSTOM_OBJECT_TO = 700


def q_custom_object_source(sf_dir: str):
    """S6: offset+token hybrid source over an id range (custom object).

    Chunks of 300 ids fan out in parallel; nested token pagination per
    chunk with full retry protocol (rest/MarketoRestClient.java:508-572).
    """
    from embulk_input_marketo_ray.sources.paged import read_custom_objects

    return read_custom_objects(CUSTOM_OBJECT_FROM, CUSTOM_OBJECT_TO, fail_plan={0: "606"})


# explicit filter_values variant (CustomObjectInputPlugin.java:87-91):
# 352 values in descending order — two 300-value chunks — plus two ids
# absent from the 1..700 universe that must return no record
CUSTOM_OBJECT_VALUES = list(range(500, 150, -1)) + [900, 901]


def q_custom_object_filter_values(sf_dir: str):
    """S6 variant: explicit custom_object_filter_values — the refined
    value list is queried in 300-value chunks (MAX_REQUEST_SIZE) that
    fan out in parallel, nested token pagination per chunk
    (rest/MarketoRestClient.java:576-580, MarketoServiceImpl.java:232-238);
    values absent from the object universe return no record."""
    from embulk_input_marketo_ray.registry import build_target

    return build_target(
        "custom_object",
        {
            "custom_object_api_name": "car_c",
            "custom_object_filter_type": "dedupeField_c",
            "custom_object_filter_values": CUSTOM_OBJECT_VALUES,
            "existing_ids": range(1, 701),
        },
    )


def q_program_date_range(sf_dir: str):
    """Program date_range query with the optional filterType /
    filterValues refinement, both applied SERVER-side like the real
    endpoint (rest/MarketoRestClient.java:476-488;
    ProgramInputPlugin.java:97-133 validation)."""
    from embulk_input_marketo_ray.registry import build_target

    return build_target(
        "program",
        {
            "n_records": 3000,
            "earliest_day": 2,
            "latest_day": 6,
            "filter_type": "workspaceName",
            "filter_values": "ws1, ws3",
        },
    )


def q_lead_by_list_join(sf_dir: str):
    """J1/S3: parent-driven nested fetch-join, children tagged listId,
    concurrency capped at 2 like the reference's export-job limit."""
    from embulk_input_marketo_ray.sources.fetch_join import read_children_of, sanitize_ids

    parents = sanitize_ids([" 11 ", "22", "33", "22"])
    return read_children_of(parents, children_per_parent=200, max_concurrent_jobs=2)


def q_csv_parse(sf_dir: str):
    """M1-M3: CSV payload parse (RFC4180 + null literals) as a batch
    stage: one synthetic bulk-extract CSV blob per partition."""
    import ray.data as rd

    from embulk_input_marketo_ray.sources.csv_source import records_to_table

    def make_csv(i: int) -> str:
        # n1 exercises the "null" literal vs a real value; n2 the
        # unquoted-empty (null) vs quoted-empty ("" stays a string)
        rows = [
            f'{j},"name_{i}_{j}","v""q",{j if j % 3 == 0 else "null"},'
            + ('""' if j % 5 == 0 else "")
            for j in range(i * 100, i * 100 + 100)
        ]
        return "id,name,quoted,n1,n2\n" + "\n".join(rows) + "\n"

    blobs = rd.from_items([{"payload": make_csv(i)} for i in range(8)])

    def parse(batch: pa.Table):
        for payload in batch.column("payload").to_pylist():
            yield records_to_table(payload)

    return blobs.map_batches(parse, batch_format="pyarrow", batch_size=None)


def q_doc_minhash_dup_pairs(sf_dir: str):
    """MinHash+LSH near-dup candidates, verified by signature overlap.

    shingle->minhash (actor pool) -> band explosion -> groupby band
    buckets -> candidate (doc_id, dup_of) pairs, deduplicated.
    """
    from embulk_input_marketo_ray.stages.dedup import (
        MinHasher,
        explode_lsh_bands,
        lsh_block_to_pairs,
    )

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(_task_stage(MinHasher), batch_format="pyarrow", batch_size=2048)
    bands = ds.map_batches(
        explode_lsh_bands, batch_format="pyarrow", fn_kwargs={"num_bands": 16}
    )
    pairs = _keyed_repartition(bands, 16, ["band", "band_hash"]).map_batches(
        lsh_block_to_pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    # verify candidates with exact n-gram Jaccard via hash-partitioned
    # repartition joins (the 100 TB path — no whole-corpus driver dict /
    # broadcast; shuffle payload ∝ candidate set). Cross-band duplicate
    # pairs collapse inside the verify's pair-keyed shuffle, so no
    # separate dedup pass is needed. The whole query is ONE streaming
    # execution (three keyed shuffles, no barriers).
    from embulk_input_marketo_ray.stages.dedup import verify_pairs_jaccard

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return verify_pairs_jaccard(pairs, docs, threshold=0.5)


def q_doc_pii_scan(sf_dir: str):
    """PII / contamination counters per document (emails, URLs, IPv4) —
    the pre-publication filter signal. One fused streaming map."""
    from embulk_input_marketo_ray.stages.text import pii_scan

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(pii_scan, batch_format="pyarrow").select_columns(
        ["doc_id", "n_emails", "n_urls", "n_ipv4", "has_pii"]
    )


def q_doc_pii_redact(sf_dir: str):
    """PII redaction transform (the publication step after the scan):
    emails/URLs/IPv4 replaced with fixed tokens, per-doc redaction
    count kept for audit. One fused streaming map over the corpus —
    at 100 TB this is a pure map stage, no shuffle, content bytes
    flow through once."""
    from embulk_input_marketo_ray.stages.text import pii_redact

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(pii_redact, batch_format="pyarrow").select_columns(
        ["doc_id", "text", "n_redactions"]
    )


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition quality signal: per-doc duplicate
    word-3-gram fraction (template/boilerplate detector). One fused
    streaming map, no shuffle."""
    from embulk_input_marketo_ray.stages.text import repetition_scores

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(repetition_scores, batch_format="pyarrow").select_columns(
        ["doc_id", "n_grams", "n_distinct_grams", "rep_ratio"]
    )


def q_doc_simhash_dup_pairs(sf_dir: str):
    """SimHash near-dup pairs via hamming-block banding: simhash (actor
    pool) -> explode to (block, block_value) rows with the 8-byte hash
    riding along -> ONE keyed exchange -> fused candidate+hamming-verify
    run-slicing kernel -> pair-keyed exchange for exact cross-block
    dedup. Unlike the MinHash path the verification payload is the hash
    itself, so the corpus text never moves."""
    from embulk_input_marketo_ray.stages.dedup import (
        SimHasher,
        distinct_pair_rows,
        explode_simhash_blocks,
        simhash_block_to_pairs,
    )

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(_task_stage(SimHasher), batch_format="pyarrow", batch_size=2048)
    ds = ds.drop_columns(["text"])
    blocks = ds.map_batches(explode_simhash_blocks, batch_format="pyarrow")
    pairs = _keyed_repartition(blocks, 16, ["block", "block_value"]).map_batches(
        simhash_block_to_pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return _keyed_repartition(pairs, 16, ["doc_id", "dup_of"]).map_batches(
        distinct_pair_rows, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# training-data corpus operators: split / curation / semantic dedup clusters
# ---------------------------------------------------------------------------

# Knuth multiplicative hash over doc_id mod 2^32: any worker computes a
# row's split with no RNG state and no coordination, and the assignment
# is stable under re-partitioning / re-ingestion — the property a
# train/val/test split of a 10^10-row corpus actually needs.
SPLIT_HASH_MULT = 2654435761
SPLIT_HASH_MOD = 1 << 32
SPLIT_TRAIN_CUT = int(0.8 * SPLIT_HASH_MOD)
SPLIT_VAL_CUT = int(0.9 * SPLIT_HASH_MOD)


def q_doc_split(sf_dir: str):
    """Deterministic train/val/test assignment by multiplicative hash
    of doc_id (80/10/10). Pure per-batch math — fuses with the read,
    no shuffle, no driver state."""
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def assign(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = ((ids % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD
        split = np.where(
            h < SPLIT_TRAIN_CUT, "train", np.where(h < SPLIT_VAL_CUT, "val", "test")
        )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "split": pa.array(split, type=pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow")


CURATION_MIN_WORDS = 5
CURATION_PUNCT_DENOM = 4  # keep while n_punct * 4 <= n_chars (ratio <= 0.25)


def q_doc_curation(sf_dir: str):
    """Composite curation pass — the canonical pre-training cleaning
    filter: language-ID gate + quality-counter thresholds fused into
    ONE streaming map over the corpus (no shuffle; rejected rows die
    in the same batch that scored them)."""
    from embulk_input_marketo_ray.stages.text import LangId

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    langid = _task_stage(LangId)

    def curate(batch: pa.Table) -> pa.Table:
        batch = langid(batch)
        text = batch.column("text")
        n_chars = pc.utf8_length(text).cast(pa.int64())
        n_words = pc.count_substring_regex(text, pattern=r"\S+").cast(pa.int64())
        n_punct = pc.count_substring_regex(text, pattern=r"[^\w\s]").cast(pa.int64())
        keep = pc.and_(
            pc.and_(
                pc.equal(batch.column("lang_pred"), pa.scalar("en")),
                pc.greater_equal(n_words, pa.scalar(CURATION_MIN_WORDS)),
            ),
            pc.less_equal(
                pc.multiply(n_punct, pa.scalar(CURATION_PUNCT_DENOM, type=pa.int64())),
                n_chars,
            ),
        )
        out = pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": batch.column("lang_pred"),
                "n_words": n_words,
            }
        )
        return out.filter(keep)

    return ds.map_batches(curate, batch_format="pyarrow")


VOCAB_TOP_K = 50


def q_doc_vocab_topk(sf_dir: str):
    """Corpus vocabulary: global token frequencies -> top-k — the
    vocab-building aggregate of a tokenizer pipeline.

    Tokens explode in-block (regex split + list flatten, no Python
    loop), counts combine in-block BEFORE the keyed exchange (the
    two-phase ``grouped_aggregate``: shuffle payload is distinct
    tokens x blocks, not token occurrences), and the global top-k is
    per-partition top-k + a <= k x partitions driver merge (the
    ``preview_limit`` pattern — never a global sort). Ties break
    (count desc, token asc) at every level, so the result set is
    deterministic."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def token_counts_block(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), pattern="[^a-z]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pa.table({"token": toks.flatten()})
        flat = flat.filter(pc.not_equal(flat.column("token"), pa.scalar("")))
        out = flat.group_by(["token"]).aggregate([([], "count_all")])
        out = out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        )
        return out.select(["token", "n"])

    partial = ds.map_batches(token_counts_block, batch_format="pyarrow")
    counts = grouped_aggregate(partial, ["token"], [("n", "sum", "n")])

    def local_top(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= VOCAB_TOP_K:
            return batch
        order = pc.sort_indices(
            batch, sort_keys=[("n", "descending"), ("token", "ascending")]
        )
        return batch.take(order.slice(0, VOCAB_TOP_K))

    parts = counts.map_batches(local_top, batch_format="pyarrow").take_all()
    if not parts:
        # empty corpus: from_pylist([]) would yield a ZERO-COLUMN table
        # and the sort below would raise on the missing keys
        return pa.table(
            {"token": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
        )
    merged = pa.Table.from_pylist(parts)
    order = pc.sort_indices(
        merged, sort_keys=[("n", "descending"), ("token", "ascending")]
    )
    return merged.take(order.slice(0, VOCAB_TOP_K))


GROUP_TOP_K = 5


def q_doc_topk_per_lang(sf_dir: str):
    """Per-group top-k (windowed ranking): the k longest documents of
    every language — `row_number() OVER (PARTITION BY lang ORDER BY
    ...)` semantics without a global sort. Counts compute in the same
    fused pass as the read; each language's rows land wholly in one
    partition via the keyed exchange; ranking is one vectorized
    sort + run-slice per block."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def measure(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "doc_id": batch.column("doc_id"),
                "n_tokens_ws": pc.count_substring_regex(
                    batch.column("text"), pattern=r"\S+"
                ).cast(pa.int64()),
            }
        )

    measured = ds.map_batches(measure, batch_format="pyarrow")

    def topk(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("lang", "ascending"),
                ("n_tokens_ws", "descending"),
                ("doc_id", "ascending"),
            ],
        )
        t = block.take(order)
        lang = np.asarray(t.column("lang"), dtype=object)
        starts = np.flatnonzero(np.r_[True, lang[1:] != lang[:-1]])
        rank = np.arange(len(lang), dtype=np.int64)
        rank = rank - np.repeat(rank[starts], np.diff(np.r_[starts, len(lang)])) + 1
        t = t.append_column("rank", pa.array(rank, type=pa.int64()))
        return t.filter(pa.array(rank <= GROUP_TOP_K))

    shuffled = _keyed_repartition(measured, _shuffle_width(), ["lang"])
    return shuffled.map_batches(
        topk, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def q_embedding_dup_clusters(sf_dir: str):
    """Embedding near-dup pairs -> connected components: the canonical
    -vector selection step of SEMANTIC dedup (same cluster machinery as
    the MinHash text path, driven by the cosine-LSH candidate pairs)."""
    from embulk_input_marketo_ray.stages.dedup import resolve_dup_clusters

    def _rename(names):
        def fn(t: pa.Table) -> pa.Table:
            # empty pair sets surface as 0-column blocks
            return t.rename_columns(names) if t.num_columns == len(names) else t
        return fn

    pairs = q_embedding_near_dup(sf_dir).map_batches(
        _rename(["doc_id", "dup_of"]), batch_format="pyarrow"
    )
    return resolve_dup_clusters(pairs).map_batches(
        _rename(["vec_id", "cluster_id"]), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# lake-history + lake-analytics queries over the synthetic change-event table
# (the engine's own CDC surface as oracle-checked operators: time travel,
# CDC feed out of the lake, head-state analytics, churn ranking)
# ---------------------------------------------------------------------------

# must match __ray_entry__.CDC_N_QUERY — the driver's oracle SQL reads the
# same cached parquet directory
CDC_QUERY_EVENTS = 20_000
CHURN_TOP_K = 3


def _cdc_events_dir(n: int = CDC_QUERY_EVENTS) -> str:
    """Deterministic cached change-event table (synth._SUCCESS marker)."""
    from embulk_input_marketo_ray.synth import (
        default_events_dir,
        generate_change_events,
    )

    return generate_change_events(default_events_dir(n), n)


# history-lake fixture cache, two layers:
# - per-process dict (exact object reuse within one driver/test run);
# - cross-process DISK cache under the system temp dir, keyed by
#   (n, windows, code fingerprint): replay output is a pure
#   deterministic function of the events table + window ends + the
#   writer code, so a lake built by a previous process (the
#   correctness phase, a test run) is byte-reusable by the next (the
#   bench phase) — the first call in a fresh process goes from ~3 s of
#   two-window replay to a marker read. The fingerprint hashes the
#   replay/sink/synth sources, so ANY code change invalidates the
#   cache rather than risking a stale-layout read.
_HIST_LAKE_CACHE: dict = {}


def _lake_fixture_fingerprint() -> str:
    import hashlib

    import embulk_input_marketo_ray.pipelines.cdc_replay as _cr
    import embulk_input_marketo_ray.sinks.exactly_once as _eo
    import embulk_input_marketo_ray.synth as _sy

    h = hashlib.sha256()
    for mod in (_cr, _eo, _sy):
        with open(mod.__file__, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _replay_windows(window_end_seconds, n: int = CDC_QUERY_EVENTS):
    """Incremental replay of consecutive watermark windows into a fresh
    delta-layout lake (compaction deferred so the per-window history is
    retained for as_of / changes_between). Returns (lake_dir, [results]),
    cached per (n, windows) in-process and on disk across processes.

    Window boundaries are inclusive on both ends and each follow-up
    window re-pulls the boundary second (from == prior to) — LWW makes
    the overlap idempotent (W3/W4, MarketoUtils.sliceRange analog)."""
    import json
    import shutil
    import tempfile
    from datetime import timedelta

    from embulk_input_marketo_ray.pipelines.cdc_replay import ReplayConfig, replay
    from embulk_input_marketo_ray.synth import BASE_TS, load_evolution_log

    key = (n, tuple(window_end_seconds))
    if key in _HIST_LAKE_CACHE:
        return _HIST_LAKE_CACHE[key]

    # the replay parameters below define the lake's bytes just as much
    # as the writer code does — they are part of the disk-cache key, so
    # editing them here invalidates previously built fixtures instead
    # of silently reusing a lake built under the old config
    replay_params = dict(
        fetch_days=100,
        num_buckets=16,
        lake_layout="delta",
        compact_threshold=100,
    )
    import hashlib as _hl

    param_sig = _hl.sha256(
        json.dumps(replay_params, sort_keys=True).encode()
    ).hexdigest()[:8]
    tag = (
        f"{n}_{'_'.join(str(w) for w in window_end_seconds)}"
        f"_{param_sig}_{_lake_fixture_fingerprint()}"
    )
    base = os.path.join(tempfile.gettempdir(), f"graft_lake_hist_{tag}")
    marker = os.path.join(base, "_FIXTURE_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            results = json.load(f)
        _HIST_LAKE_CACHE[key] = (base, results)
        return base, results

    events = _cdc_events_dir(n)
    build = tempfile.mkdtemp(prefix="graft_lake_hist_build_")
    results = []
    for js in window_end_seconds:
        cfg = ReplayConfig(
            events_dir=events,
            lake_dir=build,
            evolution_log=load_evolution_log(events),
            from_ts=BASE_TS,
            job_start=BASE_TS + timedelta(seconds=js),
            **replay_params,  # the cache-keyed subset — keep them tied
        )
        results.append(replay(cfg))
    with open(os.path.join(build, "_FIXTURE_SUCCESS"), "w") as f:
        json.dump(results, f)
    try:
        os.rename(build, base)  # atomic publish; loser of a race keeps its copy
        lake = base
    except OSError:
        lake = base if os.path.exists(marker) else build
        if lake is base:
            shutil.rmtree(build, ignore_errors=True)
    _HIST_LAKE_CACHE[key] = (lake, results)
    return lake, results


def q_time_travel(sf_dir: str):
    """Time travel over the delta lake (S8+W4): replay two incremental
    windows, then read the lake AS OF window 1's committed watermark —
    the snapshot must equal the LWW state over only window-1 events
    even though window 2 already moved the lake on. Merge-on-read over
    the per-partition file sets whose window tag <= as_of; one merge
    task per bucket, no shuffle (sinks/exactly_once.select_files_as_of)."""
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake

    n = CDC_QUERY_EVENTS
    lake, (r1, _r2) = _replay_windows([n // 2, n + 50])
    cols = ["repo", "path", "commit_seq", "content_sha256"]
    return read_lake(lake, as_of=r1["to"], columns=cols)


def q_cdc_feed(sf_dir: str):
    """CDC feed OUT of the lake (S8 downstream contract): after two
    incremental windows, changes_between(w1, w2] emits one row per key
    changed in window 2 — each key's LATEST state with the op column
    kept (deletes ride the feed as tombstones for downstream apply).
    One merge task per bucket over only the window-2 delta files; the
    boundary second is re-pulled by window 2, so the feed range is
    inclusive of w1's watermark (sinks/exactly_once.changes_between)."""
    from embulk_input_marketo_ray.sinks.exactly_once import changes_between

    n = CDC_QUERY_EVENTS
    lake, (r1, r2) = _replay_windows([n // 2, n + 50])
    return changes_between(
        lake, since=r1["to"], until=r2["to"],
        columns=["repo", "path", "commit_seq", "op"],
    )


def q_snapshot_diff(sf_dir: str):
    """Snapshot diff between two lake versions (S8/W4 downstream
    contract, complements `cdc_feed`): one row per key whose LIVE
    STATE differs between window 1's and window 2's committed
    snapshots — added / deleted / modified by set membership, not by
    event op. Zero shuffle: both snapshots share the bucket
    partitioning, one full-outer Arrow join per bucket over only the
    key + commit_seq columns (sinks/exactly_once.snapshot_diff)."""
    from embulk_input_marketo_ray.sinks.exactly_once import snapshot_diff

    n = CDC_QUERY_EVENTS
    lake, (r1, r2) = _replay_windows([n // 2, n + 50])
    return snapshot_diff(lake, v1=r1["to"], v2=r2["to"])


def q_repo_head_stats(sf_dir: str):
    """Analytics over the replayed lake head state (A1/A2 analog at the
    table level): per (repo, lang) live-file count, total content bytes
    and latest commit_seq. The lake read is merge-on-read with column
    pushdown; byte counts compute in the same fused pass; the exchange
    moves only per-block partial rows (two-phase grouped aggregate)."""
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake

    n = CDC_QUERY_EVENTS
    lake, _ = _replay_windows([n + 50])
    ds = read_lake(lake, columns=["repo", "lang", "content", "commit_seq"])

    def measure(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch.column("repo"),
                "lang": batch.column("lang"),
                "n_bytes": pc.utf8_length(batch.column("content")).cast(pa.int64()),
                "commit_seq": batch.column("commit_seq"),
            }
        )

    measured = ds.map_batches(measure, batch_format="pyarrow")
    return grouped_aggregate(
        measured,
        ["repo", "lang"],
        [
            ("n_bytes", "sum", "n_bytes"),
            ("", "count", "n_files"),
            ("commit_seq", "max", "last_seq"),
        ],
    )


def q_repo_churn_topk(sf_dir: str):
    """Churn hotspots: the CHURN_TOP_K most-changed paths per repo over
    the raw change-event stream — `row_number() OVER (PARTITION BY repo
    ORDER BY n_changes DESC, path)` semantics with ONE keyed exchange:
    per-block (repo, path) counts shrink each block before the shuffle
    (keyed by repo alone, so a repo's partials all land together), then
    a vectorized merge + run-rank per block. No global sort."""
    ds = _read_events(columns=["repo", "path"])

    def _n_changes(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [
                "n_changes" if c in ("count_all", "n_changes_sum") else c
                for c in t.column_names
            ]
        )

    def partial(batch: pa.Table) -> pa.Table:
        return _n_changes(
            batch.group_by(["repo", "path"]).aggregate([([], "count_all")])
        )

    def topk(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "n_changes": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        merged = _n_changes(
            block.group_by(["repo", "path"]).aggregate([("n_changes", "sum")])
        )
        order = pc.sort_indices(
            merged,
            sort_keys=[
                ("repo", "ascending"),
                ("n_changes", "descending"),
                ("path", "ascending"),
            ],
        )
        t = merged.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        starts = np.flatnonzero(np.r_[True, repo[1:] != repo[:-1]])
        rank = np.arange(len(repo), dtype=np.int64)
        rank = rank - np.repeat(rank[starts], np.diff(np.r_[starts, len(repo)])) + 1
        t = t.append_column("rank", pa.array(rank, type=pa.int64()))
        return t.select(["repo", "path", "n_changes", "rank"]).filter(
            pa.array(rank <= CHURN_TOP_K)
        )

    partial_ds = ds.map_batches(partial, batch_format="pyarrow")
    shuffled = _keyed_repartition(partial_ds, _shuffle_width(), ["repo"])
    return shuffled.map_batches(
        topk, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# per-lang keep rates out of 1000 for the stratified sampler: downsample
# hot languages, keep the tail whole (the corpus-balancing move of a
# training-data pipeline). Deterministic and re-partition-stable: the
# decision is a pure function of doc_id.
SAMPLE_RATES_PER_MILLE = {"en": 250, "es": 500, "unknown": 100}
SAMPLE_DEFAULT_PER_MILLE = 1000


def q_doc_sample_stratified(sf_dir: str):
    """Stratified downsampling by language: keep a doc iff its
    multiplicative doc_id hash lands under the language's per-mille
    rate. One fused map+filter with the read — no shuffle, no RNG
    state, stable under re-partitioning and resumable (same doc_id ->
    same decision on every run/worker). Reuses the q_doc_split hash so
    sampling composes consistently with split assignment."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = ((ids % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD
        lang = np.asarray(batch.column("lang"), dtype=object)
        rates = np.array(
            [SAMPLE_RATES_PER_MILLE.get(l, SAMPLE_DEFAULT_PER_MILLE) for l in lang],
            dtype=np.uint64,
        )
        keep = (h % 1000) < rates
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(pa.array(keep)),
                "lang": batch.column("lang").filter(pa.array(keep)),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow")


def q_cdc_parent_seq(sf_dir: str):
    """Parent-commit attribution (as-of/lag over the change stream):
    for every change event, the commit_seq of the SAME key's previous
    change (`lag() OVER (PARTITION BY repo, path ORDER BY commit_seq)`)
    — the pointer a diff/blame consumer chains on. One keyed exchange
    on (repo, path) then a single vectorized sort + shifted-compare per
    block: a key's run is contiguous after the sort, so parent = the
    previous row unless a new key starts there. No global sort."""
    ds = _read_events(columns=["repo", "path", "commit_seq"])

    def attach_parent(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "path": pa.array([], pa.string()),
                    "commit_seq": pa.array([], pa.int64()),
                    "parent_seq": pa.array([], pa.int64()),
                }
            )
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit_seq", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        path = np.asarray(t.column("path"), dtype=object)
        seq = np.asarray(t.column("commit_seq"), dtype=np.int64)
        new_key = np.r_[True, (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])]
        parent = np.empty(len(seq), dtype=np.int64)
        parent[0] = 0
        parent[1:] = seq[:-1]
        return pa.table(
            {
                "repo": t.column("repo"),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                # -1 marks a key's first change (SQL side: coalesce(lag(), -1))
                "parent_seq": pa.array(
                    np.where(new_key, np.int64(-1), parent), type=pa.int64()
                ),
            }
        )

    parent_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit_seq", pa.int64()),
            ("parent_seq", pa.int64()),
        ]
    )
    return _keyed_exchange_apply(ds, ["repo", "path"], attach_parent, parent_schema)


def q_evolved_attrs(sf_dir: str):
    """Schema-evolution end-state check (F1/F5/M3 + the evolution log):
    the lake's typed dynamic columns — mk_score widened int->float
    mid-stream, mk_revenue currency->double, mk_active boolean
    (Boolean.parseBoolean semantics), mk_updated datetime — must equal
    a pure-SQL recomputation from the winner rows' raw attr strings
    (null literals ""/"null" normalized, pre-add rows null). Exercises
    parse_typed + ChangeEventNormalizer across an add_column and a
    widen_type boundary, per-value (the flagship oracle checks only
    key + content sha)."""
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake

    n = CDC_QUERY_EVENTS
    lake, _ = _replay_windows([n + 50])
    return read_lake(
        lake,
        columns=[
            "repo", "path", "commit_seq",
            "mk_score", "mk_revenue", "mk_active", "mk_updated",
        ],
    )


# fixed probe keys for the key_lookup oracle query (present in the 20k
# change-event table; whether each is live at head is decided identically
# by both sides — a tombstoned key simply drops out of both results)
LOOKUP_KEYS = [
    ("org/repo-00000", "src/m00/f_0000.py"),
    ("org/repo-00000", "src/m00/f_0026.ts"),
    ("org/repo-00003", "src/m11/f_0063.py"),
    ("org/repo-99999", "src/m00/f_0000.py"),  # never existed
]


def q_key_lookup(sf_dir: str):
    """Point lookup with partition pruning (the lake's primary-key read
    path): route each (repo, path) to its bucket exactly as the writer
    placed it and merge-read ONLY those partitions — O(keys) partitions
    touched, not O(lake). Missing / tombstoned keys are absent from the
    result on both sides."""
    from embulk_input_marketo_ray.sinks.exactly_once import lookup_keys

    n = CDC_QUERY_EVENTS
    lake, _ = _replay_windows([n + 50])
    return lookup_keys(
        lake, LOOKUP_KEYS, columns=["repo", "path", "commit_seq", "content_sha256"]
    )


COMMIT_WINDOW_SECONDS = 1000


def q_commit_windows(sf_dir: str):
    """Tumbling-window aggregate over the change stream: events and
    distinct-path churn per (repo, fixed window of commit_seq). The
    window id computes in the same fused pass as the read; the exchange
    moves only per-block partial rows; distinct paths resolve exactly
    because the exchange keys on repo (a repo's partials co-locate) and
    the merge groups (repo, window, path) before counting."""
    ds = _read_events(columns=["repo", "path", "commit_seq"])

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.divide(batch.column("commit_seq"), COMMIT_WINDOW_SECONDS)
        t = pa.table(
            {
                "repo": batch.column("repo"),
                "win": pc.cast(win, pa.int64()),
                "path": batch.column("path"),
            }
        )
        out = t.group_by(["repo", "win", "path"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        )

    def finish(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "win": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "n_paths": pa.array([], pa.int64()),
                }
            )
        per_path = block.group_by(["repo", "win", "path"]).aggregate([("n", "sum")])
        out = per_path.group_by(["repo", "win"]).aggregate(
            [("n_sum", "sum"), ([], "count_all")]
        )
        return out.rename_columns(
            [
                {"n_sum_sum": "n_events", "count_all": "n_paths"}.get(c, c)
                for c in out.column_names
            ]
        ).select(["repo", "win", "n_events", "n_paths"])

    partial_ds = ds.map_batches(partial, batch_format="pyarrow")
    shuffled = _keyed_repartition(partial_ds, _shuffle_width(), ["repo"])
    return shuffled.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


CO_CHANGE_MIN_WINDOWS = 5


def q_co_change_pairs(sf_dir: str):
    """Co-change (logical-coupling) mining: pairs of paths in the same
    repo that changed within the same commit window, counted across
    windows, kept at support >= CO_CHANGE_MIN_WINDOWS — the windowed
    SELF-JOIN operator class, without a join: one keyed exchange on
    repo co-locates each repo's (win, path) set, then a vectorized
    sort + run-slice emits each window-group's within-group pairs
    (np.triu per group; the loop is over GROUPS, bounded by distinct
    (repo, win), not rows) and counts collapse in the same block.

    Partitioning assumption (100 TB note): pair fan-out is O(churn^2)
    per (repo, window) — bounded by COMMIT_WINDOW_SECONDS, the knob
    that caps per-window churn. A monorepo window touching 10^5 paths
    would emit 5e9 pairs; shrink the window (or pre-filter to hot
    paths via repo_churn_topk) before mining such repos."""
    ds = _read_events(columns=["repo", "path", "commit_seq"])

    def distinct_win_path(batch: pa.Table) -> pa.Table:
        win = pc.cast(
            pc.divide(batch.column("commit_seq"), COMMIT_WINDOW_SECONDS), pa.int64()
        )
        t = pa.table(
            {"repo": batch.column("repo"), "win": win, "path": batch.column("path")}
        )
        return t.group_by(["repo", "win", "path"]).aggregate([]).select(
            ["repo", "win", "path"]
        )

    def pairs(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "repo": pa.array([], pa.string()),
                "path_a": pa.array([], pa.string()),
                "path_b": pa.array([], pa.string()),
                "n_windows": pa.array([], pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        # partials from different source blocks may repeat a (repo, win,
        # path) row — exact-distinct again now that the repo co-locates
        d = block.group_by(["repo", "win", "path"]).aggregate([])
        order = pc.sort_indices(
            d,
            sort_keys=[
                ("repo", "ascending"),
                ("win", "ascending"),
                ("path", "ascending"),
            ],
        )
        t = d.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        win = np.asarray(t.column("win"), dtype=np.int64)
        path = np.asarray(t.column("path"), dtype=object)
        key_change = np.r_[
            True, (repo[1:] != repo[:-1]) | (win[1:] != win[:-1])
        ]
        starts = np.flatnonzero(key_change)
        ends = np.r_[starts[1:], len(repo)]
        ra, pa_, pb = [], [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            i, j = np.triu_indices(g, k=1)
            ra.append(np.repeat(repo[s], len(i)))
            pa_.append(path[s:e][i])
            pb.append(path[s:e][j])
        if not ra:
            return empty
        pair_tbl = pa.table(
            {
                "repo": pa.array(np.concatenate(ra), type=pa.string()),
                "path_a": pa.array(np.concatenate(pa_), type=pa.string()),
                "path_b": pa.array(np.concatenate(pb), type=pa.string()),
            }
        )
        counts = pair_tbl.group_by(["repo", "path_a", "path_b"]).aggregate(
            [([], "count_all")]
        )
        counts = counts.rename_columns(
            ["n_windows" if c == "count_all" else c for c in counts.column_names]
        )
        return counts.filter(
            pc.greater_equal(counts.column("n_windows"), CO_CHANGE_MIN_WINDOWS)
        ).select(["repo", "path_a", "path_b", "n_windows"])

    partial_ds = ds.map_batches(distinct_win_path, batch_format="pyarrow")
    shuffled = _keyed_repartition(partial_ds, _shuffle_width(), ["repo"])
    return shuffled.map_batches(
        pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# document-frequency cap for q_doc_jaccard_pairs: 0 = exact (no cap).
# A positive value drops posting runs longer than this before the
# O(run^2) pair fan-out — the stop-gram guard for boilerplate-heavy
# corpora, at the cost of missing pairs whose ONLY shared grams are
# stop grams (each drop is counted and logged per block).
JACCARD_MAX_DF = 0


def q_doc_jaccard_pairs(sf_dir: str, max_df: int | None = None):
    """EXACT n-gram-Jaccard duplicate pairs via a gram inverted index —
    the approximation-free counterpart of the MinHash path (recall 1.0
    by construction: any pair with J >= threshold shares a gram).

    COUNTING formulation — document text never moves, and no separate
    size-attach exchange exists either: every gram row piggybacks its
    doc's gram-set size (exact in the explode pass: a doc's grams never
    split across read batches), so a posting run emits each pair with
    BOTH endpoint sizes already attached. The per-pair emission count
    is the exact intersection |A∩B| (per-doc grams are distinct; each
    gram is wholly in one partition after the keyed exchange), so one
    grouped sum and the pure-int64 inequality
    ``J >= 1/2  <=>  2*i >= nA + nB - i`` finish the job — the same
    inequality the SQL oracle runs. Total exchanges: gram shuffle +
    pair-keyed aggregate, every row a handful of ints (the former
    text-attach verify shipped ~6 GB and was 25 s of a 30 s wall at
    sf0.1; this shape runs ~4 s).

    Partitioning assumption (100 TB note): candidate fan-out is
    O(posting_list^2) per gram — boilerplate "stop grams" in a web
    corpus need the document-frequency cap (``max_df`` /
    ``JACCARD_MAX_DF``: posting runs longer than the cap are dropped
    before the pair fan-out and counted into a per-block log line, so
    the exact path degrades predictably instead of exploding); capped
    runs lose pairs whose ONLY shared grams are stop grams, so at that
    scale prefer the MinHash path and keep this as the exact
    small/medium-corpus baseline."""
    from embulk_input_marketo_ray.stages.dedup import _ngram_set

    # resolved DRIVER-side so the closure captures the value (a module
    # global read inside the worker would see the import-time default)
    max_df = JACCARD_MAX_DF if max_df is None else int(max_df)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_g: list[str] = []
        out_n: list[int] = []
        for i, t in zip(ids, texts):
            gs = _ngram_set(t or "")
            for g in gs:
                out_id.append(i)
                out_g.append(g)
                out_n.append(len(gs))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "gram": pa.array(out_g, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    grams = ds.map_batches(explode_grams, batch_format="pyarrow")

    def postings_to_pairs(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "dup_of": pa.array([], pa.int64()),
                "i": pa.array([], pa.int64()),
                "na": pa.array([], pa.int64()),
                "nb": pa.array([], pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block, sort_keys=[("gram", "ascending"), ("doc_id", "ascending")]
        )
        t = block.take(order)
        gram = np.asarray(t.column("gram"), dtype=object)
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        ns = np.asarray(t.column("n"), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, gram[1:] != gram[:-1]])
        ends = np.r_[starts[1:], len(gram)]
        out_a, out_b, out_na, out_nb = [], [], [], []
        dropped_grams = 0
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            if max_df and g > max_df:
                dropped_grams += 1  # stop-gram guard: skip the O(g^2) fan-out
                continue
            i, j = np.triu_indices(g, k=1)
            out_a.append(ids[s:e][i])
            out_b.append(ids[s:e][j])
            out_na.append(ns[s:e][i])
            out_nb.append(ns[s:e][j])
        if dropped_grams:
            import logging

            logging.getLogger(__name__).info(
                "jaccard df-cap dropped %d gram(s) with df > %d in one block",
                dropped_grams,
                max_df,
            )
        if not out_a:
            return empty
        pair_tbl = pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_a), type=pa.int64()),
                "dup_of": pa.array(np.concatenate(out_b), type=pa.int64()),
                "na": pa.array(np.concatenate(out_na), type=pa.int64()),
                "nb": pa.array(np.concatenate(out_nb), type=pa.int64()),
            }
        )
        # per-block pair multiplicity = shared grams in this partition;
        # na/nb identical across a pair's copies (max = the value)
        out = pair_tbl.group_by(["doc_id", "dup_of"]).aggregate(
            [([], "count_all"), ("na", "max"), ("nb", "max")]
        )
        return pa.table(
            {
                "doc_id": out.column("doc_id"),
                "dup_of": out.column("dup_of"),
                "i": out.column("count_all").cast(pa.int64()),
                "na": out.column("na_max").cast(pa.int64()),
                "nb": out.column("nb_max").cast(pa.int64()),
            }
        )

    cands = _keyed_repartition(grams, _shuffle_width(), ["gram"]).map_batches(
        postings_to_pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    inter = grouped_aggregate(
        cands,
        ["doc_id", "dup_of"],
        [("i", "sum", "i"), ("na", "max", "na"), ("nb", "max", "nb")],
    )

    def judge(batch: pa.Table) -> pa.Table:
        iv = np.asarray(batch.column("i"), dtype=np.int64)
        na = np.asarray(batch.column("na"), dtype=np.int64)
        nb = np.asarray(batch.column("nb"), dtype=np.int64)
        # J >= 1/2  <=>  2*i >= nA + nB - i   (all int64, exact)
        keep = pa.array(2 * iv >= na + nb - iv)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(keep),
                "dup_of": batch.column("dup_of").filter(keep),
            }
        )

    return inter.map_batches(judge, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination / exact quantiles / corpus-frequency rarity
# ---------------------------------------------------------------------------

# benchmark membership: every doc_id divisible by DECONTAM_BENCH_MOD is
# "held out" as benchmark data; the rest is the training corpus
DECONTAM_BENCH_MOD = 97
DECONTAM_NGRAM = 3


def q_doc_decontaminate(sf_dir: str):
    """Benchmark decontamination scan (the GPT-3-style held-out-overlap
    filter): flag every corpus document sharing a word-3-gram with the
    benchmark subset (``doc_id % 97 == 0``).

    Shape: the benchmark side reduces to DISTINCT grams in-block, the
    small result is union'd on the driver and broadcast ONCE
    (``ray.put``); the corpus side streams — each batch grams, probes
    the broadcast ``is_in`` set and counts distinct hits locally, so
    the 10^10-row corpus never shuffles. The broadcast is the
    legitimately-small side: a benchmark suite's gram set is bounded by
    the BENCHMARK size, not the corpus (at 100 TB the corpus:benchmark
    ratio only grows). Zero-hit rows are kept (``n_hits = 0``) so the
    output is a full per-doc audit, not just the kill list."""
    from embulk_input_marketo_ray.stages.text import Decontaminator, doc_grams

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_gram_block(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        bench = batch.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0))
        grams = doc_grams(bench, n=DECONTAM_NGRAM)
        # distinct within the block before anything moves
        return grams.group_by(["gram"]).aggregate([]).select(["gram"])

    gram_set: set = set()
    for block in ds.map_batches(bench_gram_block, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        if block.num_rows:
            gram_set.update(block.column("gram").to_pylist())
    bench_ref = ray.put(pa.array(sorted(gram_set), type=pa.string()))

    def corpus_only(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(ids % DECONTAM_BENCH_MOD != 0))

    scan = _task_stage(Decontaminator, bench_ref=bench_ref, n=DECONTAM_NGRAM)
    return (
        ds.map_batches(corpus_only, batch_format="pyarrow")
        .map_batches(scan, batch_format="pyarrow")
    )


TOKEN_QUANTILE_PS = (0.25, 0.5, 0.75, 0.9, 0.99)


def q_token_quantiles(sf_dir: str):
    """EXACT distributed percentiles of per-doc whitespace token counts
    (the sequence-length distribution a training pipeline sizes its
    packing / truncation against).

    No global sort: token counts live in a bounded integer domain, so
    the exact distribution is a (value, count) histogram — in-block
    group_by shrinks each batch to its distinct counts, one keyed
    aggregate merges (payload = distinct values x blocks, independent
    of corpus rows), and the driver walks the tiny cumulative histogram
    to read off ``percentile_disc`` values (first value whose
    cumulative count >= ceil(p*N) — DuckDB's quantile_disc rule)."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def measure(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(batch.column("text"), pa.scalar("")), pattern=r"\S+"
        ).cast(pa.int64())
        t = pa.table({"n_tokens": n})
        out = t.group_by(["n_tokens"]).aggregate([([], "count_all")])
        return out.rename_columns(["n_tokens", "cnt"])

    partial = ds.map_batches(measure, batch_format="pyarrow")

    # all partials feed ONE cumulative walk anyway, so a keyed hash
    # exchange buys nothing here — its aggregator spin-up (~2-3 s) IS
    # the query cost at any input size. Task-based repartition(1) +
    # one merge block ships the same payload (distinct values x blocks,
    # bounded by the token-count domain, never by corpus rows).
    def merge_hist(block: pa.Table) -> pa.Table:
        out = block.group_by(["n_tokens"]).aggregate([("cnt", "sum")])
        return out.rename_columns(["n_tokens", "cnt"])

    hist = partial.repartition(1).map_batches(
        merge_hist, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    rows = hist.take_all()
    schema = {"p": pa.array([], type=pa.float64()), "n_tokens": pa.array([], type=pa.int64())}
    if not rows:
        return pa.table(schema)
    values = np.array([r["n_tokens"] for r in rows], dtype=np.int64)
    counts = np.array([r["cnt"] for r in rows], dtype=np.int64)
    order = np.argsort(values)
    values, cum = values[order], np.cumsum(counts[order])
    total = int(cum[-1])
    out_v = [
        int(values[np.searchsorted(cum, max(int(np.ceil(p * total)), 1))])
        for p in TOKEN_QUANTILE_PS
    ]
    return pa.table(
        {
            "p": pa.array(list(TOKEN_QUANTILE_PS), type=pa.float64()),
            "n_tokens": pa.array(out_v, type=pa.int64()),
        }
    )


def _budgeted_vocab_broadcast(counts_ds, key_col: str, val_col: str, limit: int):
    """``ray.put`` a (sorted keys, values) pair for a small count table,
    or return None when it exceeds ``limit`` rows (caller falls back to
    the keyed hash join). The shared small-side attach of the token
    operators (rarity / keyterms / collocations): one broadcast object,
    in-block ``searchsorted`` lookups, zero join exchanges."""
    counts_ds = counts_ds.materialize()  # count + collect = ONE execution
    n = counts_ds.count()
    if n > limit:
        return None
    if n:
        t = pa.concat_tables(ray.get(counts_ds.to_arrow_refs())).combine_chunks()
        t = t.take(pc.sort_indices(t, sort_keys=[(key_col, "ascending")]))
        keys = np.asarray(t.column(key_col), dtype=object)
        vals = np.asarray(t.column(val_col), dtype=np.int64)
    else:
        keys, vals = np.array([], dtype=object), np.array([], dtype=np.int64)
    return ray.put((keys, vals))


def q_doc_token_rarity(sf_dir: str):
    """Corpus-statistics quality score: per document, the mean / min
    CORPUS frequency of its tokens (high mean = boilerplate of common
    tokens; min = 1 marks docs carrying corpus-unique junk tokens).

    (1) global token counts via the two-phase grouped aggregate;
    (2) docs explode to DISTINCT (doc_id, token, k) rows in-block
    (payload = distinct tokens per doc, not occurrences); (3) the
    count attach is BUDGETED: a vocab at or under the broadcast limit
    ships once as sorted arrays, and because one doc's pairs never
    leave their block the per-doc fold happens in the SAME streaming
    pass — zero exchanges after the count aggregate; a web-corpus
    vocab (10^7-10^8 rows) falls back to one keyed hash join on token
    plus a grouped aggregate by doc_id. All integer arithmetic until
    the single final division, so the value-hash comparison vs SQL is
    exact. Docs with zero tokens drop (inner-join semantics, matching
    the SQL oracle)."""
    from embulk_input_marketo_ray.stages.dedup import drop_schemaless_blocks

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets)
        doc_of = (
            np.searchsorted(offsets, np.arange(len(flat), dtype=np.int64), side="right")
            - 1
        )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)[doc_of]
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "token": flat}).filter(
            pc.not_equal(flat, pa.scalar(""))
        )
        out = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["k" if c == "count_all" else c for c in out.column_names]
        ).select(["doc_id", "token", "k"])

    def token_counts_block(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pa.table({"token": toks.flatten()})
        flat = flat.filter(pc.not_equal(flat.column("token"), pa.scalar("")))
        out = flat.group_by(["token"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        ).select(["token", "n"])

    counts = grouped_aggregate(
        ds.map_batches(token_counts_block, batch_format="pyarrow"),
        ["token"],
        [("n", "sum", "n")],
    )
    pairs = ds.map_batches(explode_tokens, batch_format="pyarrow")

    counts = drop_schemaless_blocks(
        counts.materialize(), pa.schema([("token", pa.string()), ("n", pa.int64())])
    )

    vocab_ref = _budgeted_vocab_broadcast(counts, "token", "n", COLLOC_BROADCAST_VOCAB)
    if vocab_ref is not None:
        def fold_block(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "sum_freq": pa.array([], type=pa.int64()),
                    "min_tok_freq": pa.array([], type=pa.int64()),
                    "mean_tok_freq": pa.array([], type=pa.float64()),
                }
            )
            if b.num_rows == 0:
                return empty
            tokens, ns = ray.get(vocab_ref)
            tok = np.asarray(b.column("token"), dtype=object)
            n = ns[np.searchsorted(tokens, tok)]
            k = np.asarray(b.column("k"), dtype=np.int64)
            t = pa.table(
                {
                    "doc_id": b.column("doc_id").cast(pa.int64()),
                    "w": pa.array(k * n, type=pa.int64()),
                    "k": pa.array(k, type=pa.int64()),
                    "n": pa.array(n, type=pa.int64()),
                }
            )
            g = t.group_by(["doc_id"]).aggregate(
                [("w", "sum"), ("k", "sum"), ("n", "min")]
            )
            sum_freq = g.column("w_sum").cast(pa.int64())
            n_tokens = g.column("k_sum").cast(pa.int64())
            return pa.table(
                {
                    "doc_id": g.column("doc_id"),
                    "n_tokens": n_tokens,
                    "sum_freq": sum_freq,
                    "min_tok_freq": g.column("n_min").cast(pa.int64()),
                    "mean_tok_freq": pc.divide(
                        sum_freq.cast(pa.float64()), n_tokens.cast(pa.float64())
                    ),
                }
            )

        return pairs.map_batches(fold_block, batch_format="pyarrow")

    joined = pairs.join(
        counts,
        "inner",
        num_partitions=max(8, _shuffle_width() // 2),
        on=("token",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def weight(batch: pa.Table) -> pa.Table:
        k = batch.column("k").cast(pa.int64())
        n = batch.column("n").cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "w": pc.multiply(k, n),
                "k": k,
                "n": n,
            }
        )

    folded = grouped_aggregate(
        joined.map_batches(weight, batch_format="pyarrow"),
        ["doc_id"],
        [("w", "sum", "sum_freq"), ("k", "sum", "n_tokens"), ("n", "min", "min_tok_freq")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        sum_freq = batch.column("sum_freq").cast(pa.int64())
        n_tokens = batch.column("n_tokens").cast(pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": n_tokens,
                "sum_freq": sum_freq,
                "min_tok_freq": batch.column("min_tok_freq").cast(pa.int64()),
                "mean_tok_freq": pc.divide(
                    sum_freq.cast(pa.float64()), n_tokens.cast(pa.float64())
                ),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


ASOF_MARKER_TYPE = "purchase"


def q_event_asof_join(sf_dir: str):
    """Distributed AS-OF JOIN (time-series point-in-time attribution):
    every event joined to the SAME USER's latest ``purchase`` at or
    before it — ``ASOF LEFT JOIN`` semantics (inclusive ``>=``; events
    before the user's first purchase keep NULLs).

    Ray Data has no asof join; the shape here is the repo's standard
    one-exchange composition: tag the marker rows, union them with the
    event stream (markers are a FILTER of the same table, so the union
    costs one extra filtered pass, not a second shuffle side), ONE
    keyed exchange on user_id, then a per-block vectorized kernel —
    sort by (user, ts, tag), forward-fill the last marker index with
    ``np.maximum.accumulate``, reset at user-run starts, gather. No
    per-row loop, no driver state; payload = events + markers moving
    once. Partitioning assumption (documented): each user's rows fit
    one partition — the same per-key-locality every keyed operator in
    this catalog relies on; hot users would need ts-range sub-splits
    WITHIN a user, which the kernel's run-slicing would support
    unchanged if fed presorted sub-ranges."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def tag_rows(batch: pa.Table) -> pa.Table:
        ev = pa.table(
            {
                "event_id": batch.column("event_id").cast(pa.int64()),
                "user_id": batch.column("user_id").cast(pa.int64()),
                "ts": batch.column("ts"),
                "event_type": batch.column("event_type"),
                "tag": pa.array(np.ones(batch.num_rows, dtype=np.int8)),
            }
        )
        markers = ev.filter(
            pc.equal(batch.column("event_type"), pa.scalar(ASOF_MARKER_TYPE))
        )
        markers = markers.set_column(
            markers.schema.get_field_index("tag"),
            "tag",
            pa.array(np.zeros(markers.num_rows, dtype=np.int8)),
        )
        return pa.concat_tables([ev, markers])

    tagged = ds.map_batches(tag_rows, batch_format="pyarrow")
    def asof_kernel(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=pa.timestamp("us")),
                "event_type": pa.array([], type=pa.string()),
                "last_purchase_ts": pa.array([], type=pa.timestamp("us")),
                "lag_us": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("tag", "ascending"),  # marker sorts before its own event row
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        ts_us = np.asarray(t.column("ts")).astype("datetime64[us]").view(np.int64)
        tag = np.asarray(t.column("tag"), dtype=np.int8)
        n = len(user)
        idx = np.arange(n, dtype=np.int64)
        # forward-fill last marker position; a fill from BEFORE this
        # user's run start means "no marker yet for this user"
        marker_idx = np.where(tag == 0, idx, -1)
        ffill = np.maximum.accumulate(marker_idx)
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        valid = ffill >= run_start
        last_us = np.where(valid, ts_us[np.clip(ffill, 0, n - 1)], 0)
        ev = tag == 1
        null_mask = ~valid[ev]
        last_col = pa.array(last_us[ev], type=pa.int64(), mask=null_mask).cast(
            pa.timestamp("us")
        )
        lag_col = pa.array(ts_us[ev] - last_us[ev], type=pa.int64(), mask=null_mask)
        evm = pa.array(ev)
        return pa.table(
            {
                "event_id": t.column("event_id").filter(evm),
                "user_id": t.column("user_id").filter(evm),
                "ts": t.column("ts").filter(evm),
                "event_type": t.column("event_type").filter(evm),
                "last_purchase_ts": last_col,
                "lag_us": lag_col,
            }
        )

    asof_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("last_purchase_ts", pa.timestamp("us")),
            ("lag_us", pa.int64()),
        ]
    )
    return _keyed_exchange_apply(tagged, ["user_id"], asof_kernel, asof_schema)


# ---------------------------------------------------------------------------
# TF-IDF-style keyterm extraction / hopping windows / collocation mining
# ---------------------------------------------------------------------------

KEYTERMS_TOP_K = 3

HOP_SECONDS = 300
HOP_WINDOW_SECONDS = 600  # 2 hops: every event lands in exactly 2 windows

COLLOC_MIN_PAIR = 2  # bigram must occur at least this often
COLLOC_LIFT = 3      # n_xy * N >= LIFT * n_x * n_y  (all-integer PMI gate)
# vocab rows at/below this broadcast once (sorted arrays, ~40 MB at the
# bound); above it the unigram attach takes two keyed hash joins
COLLOC_BROADCAST_VOCAB = 2_000_000


def _explode_doc_tokens(batch: pa.Table) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """Tokenize a documents block: (flat tokens, doc index of each
    token, doc_id array) with boundary empties removed. Split on
    ``[^a-z]+`` after lowercasing == ``regexp_extract_all('[a-z]+')``:
    split empties only appear at string boundaries (separators
    collapse), so dropping them preserves within-doc adjacency."""
    toks = pc.split_pattern_regex(
        pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
        pattern="[^a-z]+",
    )
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = np.asarray(toks.offsets)
    doc_of = (
        np.searchsorted(offsets, np.arange(len(flat), dtype=np.int64), side="right") - 1
    )
    keep = pc.not_equal(flat, pa.scalar(""))
    flat = flat.filter(keep)
    doc_of = doc_of[np.asarray(keep)]
    ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
    return flat, doc_of, ids


def q_doc_keyterms(sf_dir: str):
    """Per-document keyterm extraction (TF-IDF-flavored, integer-exact):
    the top-k tokens of every doc ranked by CORPUS document-frequency
    ascending (rare-across-corpus first — the idf axis), term-frequency
    descending (the tf axis), token ascending. Ranking on the raw
    integer (df, -tf, token) key instead of tf*log(N/df) keeps the
    value-hash comparison vs SQL exact while selecting the same "rare
    but locally frequent" terms TF-IDF surfaces.

    Shape: per-doc (doc_id, token, tf) pairs fold in-block; df is the
    standard two-phase grouped count over those globally-distinct
    pairs. Attaching df is BUDGETED like the collocation attach: a
    vocab at or under COLLOC_BROADCAST_VOCAB rows broadcasts once as
    sorted arrays (in-block searchsorted — and the doc_id exchange
    drops entirely: pairs of one doc never leave their block, so the
    ranking fuses into the same pass); a web-corpus vocab (1e7-1e8
    rows) falls back to ONE keyed hash join plus the keyed exchange on
    doc_id + per-block run-rank. Same partitioning key discipline as
    q_doc_token_rarity."""
    from embulk_input_marketo_ray.stages.dedup import drop_schemaless_blocks

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def pairs_block(batch: pa.Table) -> pa.Table:
        flat, doc_of, ids = _explode_doc_tokens(batch)
        t = pa.table(
            {"doc_id": pa.array(ids[doc_of], type=pa.int64()), "token": flat}
        )
        out = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["tf" if c == "count_all" else c for c in out.column_names]
        ).select(["doc_id", "token", "tf"])

    # one doc lives wholly in one row/block, so in-block (doc_id, token)
    # pairs are already globally distinct: df = row count per token
    pairs = ds.map_batches(pairs_block, batch_format="pyarrow")
    df = grouped_aggregate(pairs, ["token"], [("token", "count", "df")])
    df = drop_schemaless_blocks(
        df.materialize(), pa.schema([("token", pa.string()), ("df", pa.int64())])
    )

    vocab_ref = _budgeted_vocab_broadcast(df, "token", "df", COLLOC_BROADCAST_VOCAB)
    if vocab_ref is not None:

        def attach_df(b: pa.Table) -> pa.Table:
            tokens, dfs = ray.get(vocab_ref)
            tok = np.asarray(b.column("token"), dtype=object)
            pos = np.searchsorted(tokens, tok) if len(tokens) else np.zeros(0, int)
            return b.append_column("df", pa.array(dfs[pos], type=pa.int64()))

        shuffled = pairs.map_batches(attach_df, batch_format="pyarrow")
    else:
        joined = pairs.join(
            df,
            "inner",
            num_partitions=max(8, _shuffle_width() // 2),
            on=("token",),
            aggregator_ray_remote_args={"num_cpus": 0.25},
        )
        shuffled = _keyed_repartition(joined, _shuffle_width(), ["doc_id"])

    def rank_block(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "token": pa.array([], type=pa.string()),
                "tf": pa.array([], type=pa.int64()),
                "df": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        block = pa.table(
            {
                "doc_id": block.column("doc_id").cast(pa.int64()),
                "token": block.column("token"),
                "tf": block.column("tf").cast(pa.int64()),
                "df": block.column("df").cast(pa.int64()),
            }
        )
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("doc_id", "ascending"),
                ("df", "ascending"),
                ("tf", "descending"),
                ("token", "ascending"),
            ],
        )
        t = block.take(order)
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        rank = np.arange(len(ids), dtype=np.int64)
        rank = rank - np.repeat(rank[starts], np.diff(np.r_[starts, len(ids)])) + 1
        t = t.append_column("rank", pa.array(rank, type=pa.int64()))
        return t.filter(pa.array(rank <= KEYTERMS_TOP_K))

    return shuffled.map_batches(
        rank_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def q_event_hop_windows(sf_dir: str):
    """Hopping (sliding) window aggregate over the event stream:
    600 s windows every 300 s — each event belongs to exactly
    window/hop = 2 overlapping windows. Per (window_start, event_type):
    event count and DISTINCT user count.

    Shape: the window replication is a cheap in-block explode (2 rows
    per event, integer arithmetic on the us timestamp — never a range
    join); count-distinct is the standard two exchanges, both with
    in-block partial folds so the payload is (window, type, user)
    groups, then (window, type) groups — never raw events."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    hop_us = HOP_SECONDS * 1_000_000
    n_hops = HOP_WINDOW_SECONDS // HOP_SECONDS

    def explode_windows(batch: pa.Table) -> pa.Table:
        t_us = np.asarray(batch.column("ts")).astype("datetime64[us]").view(np.int64)
        ws0 = (t_us // hop_us) * hop_us
        parts = []
        base = pa.table(
            {
                "window_start_us": pa.array(ws0, type=pa.int64()),
                "event_type": batch.column("event_type"),
                "user_id": batch.column("user_id").cast(pa.int64()),
            }
        )
        for k in range(n_hops):
            parts.append(
                base.set_column(
                    0, "window_start_us", pa.array(ws0 - k * hop_us, type=pa.int64())
                )
            )
        exploded = pa.concat_tables(parts)
        out = exploded.group_by(
            ["window_start_us", "event_type", "user_id"]
        ).aggregate([([], "count_all")])
        return out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        ).select(["window_start_us", "event_type", "user_id", "n"])

    per_user = grouped_aggregate(
        ds.map_batches(explode_windows, batch_format="pyarrow"),
        ["window_start_us", "event_type", "user_id"],
        [("n", "sum", "n")],
    )
    # rows now globally unique per (window, type, user): distinct-user
    # count is a row count, event count a sum
    return grouped_aggregate(
        per_user,
        ["window_start_us", "event_type"],
        [("n", "sum", "n_events"), ("user_id", "count", "n_users")],
    )


def q_bigram_collocations(sf_dir: str):
    """Collocation mining for tokenizer/vocab construction: adjacent
    token pairs that co-occur far more than independence predicts —
    the PMI gate kept ALL-INTEGER (``n_xy * N >= LIFT * n_x * n_y``
    with ``n_xy >= COLLOC_MIN_PAIR``) so the oracle comparison is
    exact; pmi = log(lift) is monotone in the same ratio.

    Shape: bigrams and unigrams both fold in-block before their
    two-phase counts (payload = distinct pairs/tokens per block, not
    occurrences). Attaching unigram counts to the bigram table is
    BUDGETED like every small-side attach in this repo: a vocab at or
    under ``broadcast_vocab_limit`` rows is ``ray.put`` once as a
    sorted (token, count) pair of arrays and looked up in-block via
    searchsorted (zero extra exchanges); a larger vocab falls back to
    TWO keyed hash joins (one per bigram side — a web-corpus vocab of
    1e7-1e8 rows never ships whole). The corpus total N is the only
    unconditional driver scalar (one int). Int64 overflow in the gate
    product surfaces loudly (Arrow/numpy raise on checked multiply) at
    ~n_xy*N > 2^63 — switch the comparison to a two-limb product
    before running corpora past ~1e9 x 1e9."""
    from embulk_input_marketo_ray.stages.dedup import drop_schemaless_blocks

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    # ONE tokenize pass + ONE keyed exchange for both count tables:
    # unigrams ride the same (t1, t2) key with the empty-string
    # sentinel in t2 (tokens are never empty — _explode_doc_tokens
    # strips boundary empties), halving the corpus passes and
    # collapsing the two grouped aggregates into one.
    _GRAMS_SCHEMA = pa.schema(
        [("t1", pa.string()), ("t2", pa.string()), ("cnt", pa.int64())]
    )

    def grams_block(batch: pa.Table) -> pa.Table:
        flat, doc_of, _ = _explode_doc_tokens(batch)
        n = len(flat)
        if n == 0:
            return _GRAMS_SCHEMA.empty_table()
        parts = [
            pa.table(
                {
                    "t1": flat,
                    "t2": pa.array(np.full(n, "", dtype=object), type=pa.string()),
                }
            )
        ]
        if n >= 2:
            valid = pa.array(doc_of[1:] == doc_of[:-1])
            parts.append(
                pa.table(
                    {"t1": flat.slice(0, n - 1), "t2": flat.slice(1)}
                ).filter(valid)
            )
        t = pa.concat_tables(parts)
        out = t.group_by(["t1", "t2"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["cnt" if c == "count_all" else c for c in out.column_names]
        ).select(["t1", "t2", "cnt"]).cast(_GRAMS_SCHEMA)

    counts = grouped_aggregate(
        ds.map_batches(grams_block, batch_format="pyarrow"),
        ["t1", "t2"],
        [("cnt", "sum", "cnt")],
    ).materialize()

    def split_uni(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.equal(b.column("t2"), pa.scalar("")))
        return pa.table({"token": sel.column("t1"), "n": sel.column("cnt")})

    def split_pairs(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.not_equal(b.column("t2"), pa.scalar("")))
        return pa.table(
            {"t1": sel.column("t1"), "t2": sel.column("t2"), "n_xy": sel.column("cnt")}
        )

    pair_counts = counts.map_batches(split_pairs, batch_format="pyarrow")
    uni = counts.map_batches(split_uni, batch_format="pyarrow").materialize()
    total_tokens = int(uni.sum(on="n") or 0)
    uni = drop_schemaless_blocks(
        uni, pa.schema([("token", pa.string()), ("n", pa.int64())])
    )

    # small-vocab fast path: one broadcast, zero join exchanges
    vocab_ref = _budgeted_vocab_broadcast(uni, "token", "n", COLLOC_BROADCAST_VOCAB)
    if vocab_ref is not None:

        def gate_broadcast(b: pa.Table) -> pa.Table:
            tokens, counts = ray.get(vocab_ref)
            t1 = np.asarray(b.column("t1"), dtype=object)
            t2 = np.asarray(b.column("t2"), dtype=object)
            # every bigram token came from the same corpus: always found
            n_x = counts[np.searchsorted(tokens, t1)]
            n_y = counts[np.searchsorted(tokens, t2)]
            n_xy = np.asarray(b.column("n_xy"), dtype=np.int64)
            if n_xy.size and int(n_xy.max()) * total_tokens > np.iinfo(np.int64).max:
                # exact at any corpus size: arbitrary-precision ints on
                # the (distinct-bigram-sized) gate only
                lhs = n_xy.astype(object) * total_tokens
                rhs = COLLOC_LIFT * (n_x.astype(object) * n_y.astype(object))
            else:
                lhs = np.multiply(n_xy, total_tokens, dtype=np.int64)
                rhs = COLLOC_LIFT * np.multiply(n_x, n_y, dtype=np.int64)
            keep = (n_xy >= COLLOC_MIN_PAIR) & (lhs >= rhs)
            return pa.table(
                {
                    "t1": b.column("t1").filter(pa.array(keep)),
                    "t2": b.column("t2").filter(pa.array(keep)),
                    "n_xy": pa.array(n_xy[keep], type=pa.int64()),
                    "n_x": pa.array(n_x[keep], type=pa.int64()),
                    "n_y": pa.array(n_y[keep], type=pa.int64()),
                }
            )

        return pair_counts.map_batches(gate_broadcast, batch_format="pyarrow")

    join_parts = max(8, _shuffle_width() // 2)
    left = pair_counts.map_batches(
        lambda b: b.rename_columns(
            ["token" if c == "t1" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    j1 = left.join(
        uni,
        "inner",
        num_partitions=join_parts,
        on=("token",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def swap_key(b: pa.Table) -> pa.Table:
        names = []
        for c in b.column_names:
            names.append(
                {"token": "t1", "n": "n_x", "t2": "token"}.get(c, c)
            )
        return b.rename_columns(names)

    # a mostly-empty first join emits schema-less empty partitions that
    # the second join cannot key through — drop them block-level
    swapped = drop_schemaless_blocks(
        j1.map_batches(swap_key, batch_format="pyarrow").materialize(),
        pa.schema(
            [
                ("t1", pa.string()),
                ("token", pa.string()),
                ("n_xy", pa.int64()),
                ("n_x", pa.int64()),
            ]
        ),
    )
    j2 = swapped.join(
        uni,
        "inner",
        num_partitions=join_parts,
        on=("token",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def gate(b: pa.Table) -> pa.Table:
        b = b.rename_columns(
            [{"token": "t2", "n": "n_y"}.get(c, c) for c in b.column_names]
        )
        n_xy = b.column("n_xy").cast(pa.int64())
        n_x = b.column("n_x").cast(pa.int64())
        n_y = b.column("n_y").cast(pa.int64())
        keep = pc.and_(
            pc.greater_equal(n_xy, pa.scalar(COLLOC_MIN_PAIR)),
            pc.greater_equal(
                pc.multiply_checked(n_xy, pa.scalar(total_tokens, type=pa.int64())),
                pc.multiply_checked(
                    pa.scalar(COLLOC_LIFT, type=pa.int64()),
                    pc.multiply_checked(n_x, n_y),
                ),
            ),
        )
        return pa.table(
            {"t1": b.column("t1"), "t2": b.column("t2"), "n_xy": n_xy,
             "n_x": n_x, "n_y": n_y}
        ).filter(keep)

    return j2.map_batches(gate, batch_format="pyarrow")


RANGE_JOIN_SECONDS = 600  # attribution window after each purchase


def q_event_range_join(sf_dir: str):
    """Distributed RANGE (interval/band) JOIN: for every ``purchase``
    event, the count of same-user events inside its attribution window
    ``(ts, ts + 600 s]`` — the bounded-range counterpart of
    ``q_event_asof_join``.

    The partitioning story is the point: keys are ``(user_id,
    time_bucket)`` with bucket width == the window size, so a purchase
    window spans AT MOST 2 buckets — each purchase ships exactly two
    probe pairs, events ship once to their own bucket, and NO key ever
    needs a whole user's history co-resident (a hot user's decade of
    events splits across time buckets; the per-user-exchange operators
    can't say that). Per block: one vectorized sort + cumulative event
    count; each probe pair's cumsum difference counts the events in
    ``(t, t+R]`` within its bucket — the bucket intersection falls out
    of the run structure, no clamping. A final two-phase grouped sum
    folds the <=2 partial counts per purchase (zero-match purchases
    survive with 0: their probes always emit)."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    r_us = RANGE_JOIN_SECONDS * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        t_us = np.asarray(batch.column("ts")).astype("datetime64[us]").view(np.int64)
        user = np.asarray(batch.column("user_id"), dtype=np.int64)
        eid = np.asarray(batch.column("event_id"), dtype=np.int64)
        is_p = np.asarray(
            pc.equal(batch.column("event_type"), pa.scalar(ASOF_MARKER_TYPE))
        )
        # events: one row in their own bucket, kind 0
        ev = {
            "user_id": user,
            "bucket": t_us // r_us,
            "ts_us": t_us,
            "kind": np.zeros(len(user), dtype=np.int8),
            "pid": np.zeros(len(user), dtype=np.int64),
            "pts": np.zeros(len(user), dtype=np.int64),
        }
        parts = [ev]
        pu, pt, pe = user[is_p], t_us[is_p], eid[is_p]
        for b_off in (0, 1):  # window (t, t+R] spans at most 2 buckets
            for kind, probe_ts in ((1, pt), (2, pt + r_us)):
                parts.append(
                    {
                        "user_id": pu,
                        "bucket": pt // r_us + b_off,
                        "ts_us": probe_ts,
                        "kind": np.full(len(pu), kind, dtype=np.int8),
                        "pid": pe,
                        "pts": pt,
                    }
                )
        cols = ["user_id", "bucket", "ts_us", "kind", "pid", "pts"]
        return pa.table(
            {c: pa.array(np.concatenate([p[c] for p in parts])) for c in cols}
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    shuffled = _keyed_repartition(exploded, _shuffle_width(), ["user_id", "bucket"])

    def count_kernel(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "ts_us": pa.array([], type=pa.int64()),
                "n_partial": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("bucket", "ascending"),
                ("ts_us", "ascending"),
                ("kind", "ascending"),  # events before probes at tie ts
            ],
        )
        t = block.take(order)
        kind = np.asarray(t.column("kind"), dtype=np.int8)
        csum = np.cumsum(kind == 0)
        pid = np.asarray(t.column("pid"), dtype=np.int64)
        bucket = np.asarray(t.column("bucket"), dtype=np.int64)
        m1, m2 = kind == 1, kind == 2
        # pair each probe-minus with its probe-plus by (pid, bucket):
        # both probe rows of a replica share them and are block-local
        o1 = np.lexsort((bucket[m1], pid[m1]))
        o2 = np.lexsort((bucket[m2], pid[m2]))
        n_partial = csum[m2][o2] - csum[m1][o1]
        return pa.table(
            {
                "event_id": pa.array(pid[m1][o1], type=pa.int64()),
                "user_id": pa.array(
                    np.asarray(t.column("user_id"), dtype=np.int64)[m1][o1],
                    type=pa.int64(),
                ),
                "ts_us": pa.array(
                    np.asarray(t.column("pts"), dtype=np.int64)[m1][o1],
                    type=pa.int64(),
                ),
                "n_partial": pa.array(n_partial, type=pa.int64()),
            }
        )

    counted = shuffled.map_batches(
        count_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    folded = grouped_aggregate(
        counted, ["event_id", "user_id", "ts_us"], [("n_partial", "sum", "n_follow")]
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts_us").cast(pa.timestamp("us")),
                "n_follow": b.column("n_follow").cast(pa.int64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


DUPWIN_W = 8        # tokens per window (Lee-et-al-style substring dedup unit)
DUPWIN_MIN_DOCS = 2  # windows repeated across at least this many docs


def q_doc_dup_windows(sf_dir: str):
    """Repeated n-gram WINDOW detection — the discovery core of
    substring-level training-data dedup ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022): every 8-token
    window that appears in >= 2 distinct documents, with its document
    and occurrence counts. Downstream, these windows are what a
    substring-dedup pass cuts out of the corpus.

    Shape: windows materialize in-block as joined strings
    (``binary_join_element_wise`` over W shifted slices — no per-row
    loop) and IMMEDIATELY fold to (gram, doc, k) partials, so the
    first exchange moves distinct grams per doc, not occurrences; the
    second two-phase fold by gram computes distinct-doc and total
    counts. At 100 TB the gram payload dominates — swap the gram
    string for a 128-bit hash in both exchanges and re-attach strings
    only for the surviving (repeated) minority via one keyed join; the
    string form here keeps the oracle comparison exact."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def windows_block(batch: pa.Table) -> pa.Table:
        flat, doc_of, ids = _explode_doc_tokens(batch)
        n = len(flat)
        empty = pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
                "k": pa.array([], type=pa.int64()),
            }
        )
        if n < DUPWIN_W:
            return empty
        m = n - DUPWIN_W + 1
        shifted = [flat.slice(k, m) for k in range(DUPWIN_W)]
        grams = pc.binary_join_element_wise(*shifted, pa.scalar(" "))
        same_doc = pa.array(doc_of[: m] == doc_of[DUPWIN_W - 1 :])
        t = pa.table(
            {
                "gram": grams,
                "doc_id": pa.array(ids[doc_of[:m]], type=pa.int64()),
            }
        ).filter(same_doc)
        out = t.group_by(["gram", "doc_id"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["k" if c == "count_all" else c for c in out.column_names]
        ).select(["gram", "doc_id", "k"])

    per_doc = grouped_aggregate(
        ds.map_batches(windows_block, batch_format="pyarrow"),
        ["gram", "doc_id"],
        [("k", "sum", "k")],
    )
    folded = grouped_aggregate(
        per_doc,
        ["gram"],
        [("doc_id", "count", "n_docs"), ("k", "sum", "n_occ")],
    )

    def gate(b: pa.Table) -> pa.Table:
        b = pa.table(
            {
                "gram": b.column("gram"),
                "n_docs": b.column("n_docs").cast(pa.int64()),
                "n_occ": b.column("n_occ").cast(pa.int64()),
            }
        )
        return b.filter(
            pc.greater_equal(b.column("n_docs"), pa.scalar(DUPWIN_MIN_DOCS))
        )

    return folded.map_batches(gate, batch_format="pyarrow")


# repeated-gram sets at/below this row count broadcast once; above it
# the membership test must fall back to a keyed join on gram (same
# doctrine as q_doc_dedup_near's loser set)
DUPWIN_BROADCAST_LIMIT = 5_000_000


def q_doc_dup_coverage(sf_dir: str):
    """Substring-dedup APPLICATION pass: per document, how many token
    positions are covered by at least one cross-doc repeated 8-token
    window (the spans a Lee-et-al substring dedup would cut), plus the
    doc's token count and the coverage ratio — the standard
    boilerplate/contamination signal.

    Shape: stage 1 is the dup-window discovery fold (exchanges move
    per-doc DISTINCT grams); the surviving repeated-gram set — small
    at normal dup rates, ∝ duplication not corpus — broadcasts once
    under ``DUPWIN_BROADCAST_LIMIT`` (sorted array + searchsorted
    membership, exactly the decontaminate shape), so the corpus itself
    NEVER shuffles: stage 2 is a second streaming read pass computing
    each doc's interval union with one vectorized min(gap, W) fold —
    no per-row loop, no driver state beyond the budgeted set. Above
    the budget, raise loudly rather than silently materialize (the
    keyed-join fallback of q_doc_dedup_near applies; wire it here when
    a corpus actually trips the limit)."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def windows_block(batch: pa.Table) -> pa.Table:
        flat, doc_of, ids = _explode_doc_tokens(batch)
        n = len(flat)
        empty = pa.table(
            {
                "gram": pa.array([], type=pa.string()),
                "doc_id": pa.array([], type=pa.int64()),
            }
        )
        if n < DUPWIN_W:
            return empty
        m = n - DUPWIN_W + 1
        shifted = [flat.slice(k, m) for k in range(DUPWIN_W)]
        grams = pc.binary_join_element_wise(*shifted, pa.scalar(" "))
        same_doc = pa.array(doc_of[:m] == doc_of[DUPWIN_W - 1 :])
        t = pa.table(
            {"gram": grams, "doc_id": pa.array(ids[doc_of[:m]], type=pa.int64())}
        ).filter(same_doc)
        return t.group_by(["gram", "doc_id"]).aggregate([]).select(["gram", "doc_id"])

    per_doc = ds.map_batches(windows_block, batch_format="pyarrow")
    folded = grouped_aggregate(per_doc, ["gram"], [("doc_id", "count", "n_docs")])

    def repeated_only(b: pa.Table) -> pa.Table:
        keep = pc.greater_equal(
            b.column("n_docs").cast(pa.int64()), pa.scalar(DUPWIN_MIN_DOCS)
        )
        return b.filter(keep).select(["gram"])

    rep = folded.map_batches(repeated_only, batch_format="pyarrow").materialize()
    n_rep = rep.count()
    if n_rep > DUPWIN_BROADCAST_LIMIT:
        raise ValueError(
            f"repeated-gram set ({n_rep} rows) exceeds the broadcast budget "
            f"({DUPWIN_BROADCAST_LIMIT}); use the keyed-join membership path"
        )
    if n_rep:
        gt = pa.concat_tables(ray.get(rep.to_arrow_refs())).combine_chunks()
        grams_sorted = np.sort(np.asarray(gt.column("gram"), dtype=object))
    else:
        grams_sorted = np.array([], dtype=object)
    rep_ref = ray.put(grams_sorted)

    def coverage_block(batch: pa.Table) -> pa.Table:
        rep_grams = ray.get(rep_ref)
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets)
        doc_of = (
            np.searchsorted(offsets, np.arange(len(flat), dtype=np.int64), side="right")
            - 1
        )
        keep = pc.not_equal(flat, pa.scalar(""))
        flat = flat.filter(keep)
        keep_np = np.asarray(keep)
        doc_of = doc_of[keep_np]
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        n_tokens = np.bincount(doc_of, minlength=len(ids)).astype(np.int64)
        covered = np.zeros(len(ids), dtype=np.int64)
        n = len(flat)
        if n >= DUPWIN_W and len(rep_grams):
            m = n - DUPWIN_W + 1
            shifted = [flat.slice(k, m) for k in range(DUPWIN_W)]
            grams = pc.binary_join_element_wise(*shifted, pa.scalar(" "))
            same_doc = doc_of[:m] == doc_of[DUPWIN_W - 1 :]
            g = np.asarray(grams, dtype=object)
            pos = np.searchsorted(rep_grams, g)
            pos = np.clip(pos, 0, len(rep_grams) - 1)
            hit = same_doc & (rep_grams[pos] == g)
            # interval union per doc: starts are already ascending
            # within each doc; covered = sum(min(next_start - start, W))
            # with W for each doc's last hit
            starts = np.flatnonzero(hit)
            if len(starts):
                d = doc_of[starts]
                gap = np.empty(len(starts), dtype=np.int64)
                gap[:-1] = np.minimum(starts[1:] - starts[:-1], DUPWIN_W)
                gap[-1] = DUPWIN_W
                # last hit of each doc contributes the full window
                last_of_doc = np.r_[d[1:] != d[:-1], True]
                gap[last_of_doc] = DUPWIN_W
                np.add.at(covered, d, gap)
        ratio = np.divide(
            covered, n_tokens, out=np.zeros(len(ids), dtype=np.float64),
            where=n_tokens > 0,
        )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_tokens": pa.array(n_tokens, type=pa.int64()),
                "covered": pa.array(covered, type=pa.int64()),
                "dup_ratio": pa.array(ratio, type=pa.float64()),
            }
        )

    return ds.map_batches(coverage_block, batch_format="pyarrow")


def q_lang_token_quantiles(sf_dir: str):
    """GROUPED exact quantiles: per-language percentile_disc of per-doc
    whitespace token counts — the per-subcorpus sequence-length
    profile. Unlike the global ``q_token_quantiles`` (whose histogram
    merges in one block), the grouped form stays fully distributed:
    in-block (lang, value) histogram partials, ONE keyed exchange on
    lang, then each partition walks its own languages' cumulative
    histograms — the driver never sees a histogram. Payload is
    distinct (lang, value) pairs x blocks, independent of corpus rows;
    the per-language walk is per-GROUP work (#langs per block), not
    per-row."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def measure(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(batch.column("text"), pa.scalar("")), pattern=r"\S+"
        ).cast(pa.int64())
        t = pa.table({"lang": batch.column("lang"), "n_tokens": n})
        out = t.group_by(["lang", "n_tokens"]).aggregate([([], "count_all")])
        return out.rename_columns(["lang", "n_tokens", "cnt"])

    partial = ds.map_batches(measure, batch_format="pyarrow")
    shuffled = _keyed_repartition(partial, _shuffle_width(), ["lang"])

    def quantile_kernel(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], type=pa.string()),
                "p": pa.array([], type=pa.float64()),
                "n_tokens": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        merged = block.group_by(["lang", "n_tokens"]).aggregate([("cnt", "sum")])
        merged = merged.rename_columns(["lang", "n_tokens", "cnt"])
        order = pc.sort_indices(
            merged,
            sort_keys=[("lang", "ascending"), ("n_tokens", "ascending")],
        )
        t = merged.take(order)
        lang = np.asarray(t.column("lang"), dtype=object)
        vals = np.asarray(t.column("n_tokens"), dtype=np.int64)
        cnts = np.asarray(t.column("cnt"), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, lang[1:] != lang[:-1]])
        bounds = np.r_[starts, len(lang)]
        out_lang, out_p, out_v = [], [], []
        for a, b in zip(bounds[:-1], bounds[1:]):  # per-GROUP, not per-row
            cum = np.cumsum(cnts[a:b])
            total = int(cum[-1])
            for p in TOKEN_QUANTILE_PS:
                k = max(int(np.ceil(p * total)), 1)
                out_lang.append(lang[a])
                out_p.append(p)
                out_v.append(int(vals[a:b][np.searchsorted(cum, k)]))
        return pa.table(
            {
                "lang": pa.array(out_lang, type=pa.string()),
                "p": pa.array(out_p, type=pa.float64()),
                "n_tokens": pa.array(out_v, type=pa.int64()),
            }
        )

    return shuffled.map_batches(
        quantile_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


PACK_SEQ_LEN = 2048  # tokens per packed training sequence


def q_token_packing(sf_dir: str):
    """Document -> packed-training-sequence mapping: concatenate each
    language's documents in doc_id order and chunk the stream into
    2048-token sequences (the standard packed-pretraining layout).
    Per document: its token count, its start offset in the language
    stream, and the first/last sequence index it lands in — the
    metadata a packing loader needs to slice sequences without ever
    materializing the concatenation.

    Shape: token counts compute in the fused read pass; ONE keyed
    exchange on lang; the running offset is a per-block vectorized
    cumsum over the (lang, doc_id)-sorted run — ``sum() OVER
    (PARTITION BY lang ORDER BY doc_id)`` without a global sort. The
    partitioning assumption (each language wholly in one partition) is
    the operator's semantic requirement, not a convenience: offsets
    are defined by the language-stream order. A corpus where ONE
    language outgrows a partition would shard the stream by doc_id
    range and prefix-sum the shard totals — one extra tiny exchange."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def measure(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": batch.column("lang"),
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": pc.count_substring_regex(
                    pc.coalesce(batch.column("text"), pa.scalar("")), pattern=r"\S+"
                ).cast(pa.int64()),
            }
        )

    measured = ds.map_batches(measure, batch_format="pyarrow")
    shuffled = _keyed_repartition(measured, _shuffle_width(), ["lang"])

    def pack_kernel(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "lang": pa.array([], type=pa.string()),
                "n_tokens": pa.array([], type=pa.int64()),
                "start_off": pa.array([], type=pa.int64()),
                "first_seq": pa.array([], type=pa.int64()),
                "last_seq": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block, sort_keys=[("lang", "ascending"), ("doc_id", "ascending")]
        )
        t = block.take(order)
        lang = np.asarray(t.column("lang"), dtype=object)
        n = np.asarray(t.column("n_tokens"), dtype=np.int64)
        cum = np.cumsum(n)
        starts = np.flatnonzero(np.r_[True, lang[1:] != lang[:-1]])
        base = np.repeat(cum[starts] - n[starts], np.diff(np.r_[starts, len(n)]))
        start_off = cum - n - base
        end_off = start_off + n  # exclusive
        first_seq = start_off // PACK_SEQ_LEN
        # an empty doc occupies no sequence: pin last == first
        last_seq = np.where(n > 0, (end_off - 1) // PACK_SEQ_LEN, first_seq)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "lang": t.column("lang"),
                "n_tokens": pa.array(n, type=pa.int64()),
                "start_off": pa.array(start_off, type=pa.int64()),
                "first_seq": pa.array(first_seq, type=pa.int64()),
                "last_seq": pa.array(last_seq, type=pa.int64()),
            }
        )

    return shuffled.map_batches(
        pack_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# data-recipe mixing sampler
# ---------------------------------------------------------------------------

# The training-mix recipe: per-mille share of the OUTPUT corpus each
# language should occupy (a Pile/Dolma-style data recipe), and the
# output budget as a per-mille fraction of the input corpus. Languages
# absent from the recipe are excluded (weight 0). All integer math so
# the DuckDB oracle replicates the decision bit-for-bit.
MIX_WEIGHTS_PER_MILLE = {"en": 400, "zh": 150, "es": 150, "de": 150, "fr": 150}
MIX_BUDGET_PER_MILLE = 500


def q_doc_mix_sample(sf_dir: str):
    """Data-recipe mixing sampler: downsample each language so the
    output approximates the configured mixture weights within an
    output budget (``budget = N * MIX_BUDGET_PER_MILLE // 1000`` docs;
    language ``l`` targets ``budget * weight_l // 1000`` of them).

    Shape: pass 1 reads ONLY the ``lang`` column and shrinks each block
    to a per-language histogram in-block — the merged histogram is
    bounded by the language domain, never by corpus rows, so a
    ``repartition(1)`` + one merge block beats a keyed exchange at any
    scale. The driver turns it into per-language accept rates (tiny:
    #langs entries) broadcast via ``ray.put`` once; pass 2 fuses the
    keep decision with the read — the same multiplicative doc_id hash
    as ``q_doc_split``/``q_doc_sample_stratified``, so mixing composes
    deterministically with splitting and is stable under
    re-partitioning and resume (same doc_id -> same decision). A
    language whose corpus share is below its recipe share saturates at
    rate 1000 (keep all) — rate-based sampling cannot upsample; the
    realized mix is the closest achievable under the budget."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["lang"])

    def lang_hist(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["lang"]).aggregate([([], "count_all")])
        return out.rename_columns(["lang", "cnt"])

    def lang_hist_merge(block: pa.Table) -> pa.Table:
        out = block.group_by(["lang"]).aggregate([("cnt", "sum")])
        return out.rename_columns(["lang", "cnt"])

    hist = (
        ds.map_batches(lang_hist, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lang_hist_merge,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )
    rows = hist.take_all()
    n_total = sum(int(r["cnt"]) for r in rows)
    budget = n_total * MIX_BUDGET_PER_MILLE // 1000
    rates = {}
    for r in rows:
        lang, n_lang = r["lang"], int(r["cnt"])
        want = budget * MIX_WEIGHTS_PER_MILLE.get(lang, 0) // 1000
        rates[lang] = min(1000, 1000 * want // n_lang) if n_lang else 0
    rates_ref = ray.put(rates)

    full = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def sample(batch: pa.Table) -> pa.Table:
        rate_by_lang = ray.get(rates_ref)
        ids = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = ((ids % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD
        lang = np.asarray(batch.column("lang"), dtype=object)
        rate = np.array([rate_by_lang.get(l, 0) for l in lang], dtype=np.uint64)
        keep = pa.array((h % 1000) < rate)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(keep),
                "lang": batch.column("lang").filter(keep),
            }
        )

    return full.map_batches(sample, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# distributed heavy hitters (frequent-items sketch, exact final answer)
# ---------------------------------------------------------------------------

# phi = 1/HH_K: report every token whose corpus frequency strictly
# exceeds total_tokens / HH_K
HH_K = 100


def q_doc_heavy_hitters(sf_dir: str):
    """Heavy hitters: every token with corpus frequency > N/``HH_K``
    — the frequent-items primitive (stopword discovery, boilerplate
    token detection) at a scale where the full vocabulary must never
    shuffle.

    Two streaming passes, sketch-then-verify:

    Pass 1 (candidates): each block reduces to its in-block token
    counts (a groupby — the vectorized equivalent of a Misra-Gries
    summary with exact in-block counts) and keeps only tokens with
    ``block_count * HH_K > block_tokens``. Pigeonhole guarantee: a
    token with global frequency > N/K must exceed B_i/K in at least
    one block (if f_i <= B_i/K everywhere, summing gives f <= N/K),
    so the union of per-block survivors is a SUPERSET of the true
    heavy hitters — at most K-1 candidates per block, independent of
    vocabulary size. Each block also emits one null-token row carrying
    its token total, so N folds out of the same pass.

    Pass 2 (exact verify): the candidate set (<= (K-1) x blocks rows)
    broadcasts once via ``ray.put``; each block counts ONLY candidate
    occurrences (vectorized ``is_in`` probe), the per-candidate
    partials merge through one tiny exchange, and the driver applies
    the exact threshold ``n * HH_K > N``. The corpus never shuffles;
    the only moved payload is candidate counts. False candidates cost
    one is_in probe and are dropped by the exact filter."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["text"])

    def _block_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pa.table({"token": toks.flatten()})
        return flat.filter(pc.not_equal(flat.column("token"), pa.scalar("")))

    def block_candidates(batch: pa.Table) -> pa.Table:
        flat = _block_tokens(batch)
        out = flat.group_by(["token"]).aggregate([([], "count_all")])
        out = out.rename_columns(["token", "cnt"])
        b_total = flat.num_rows
        keep = pc.greater(pc.multiply(out.column("cnt"), pa.scalar(HH_K)), pa.scalar(b_total))
        cand = out.filter(keep)
        total_row = pa.table(
            {
                "token": pa.array([None], type=pa.string()),
                "cnt": pa.array([b_total], type=pa.int64()),
            }
        )
        return pa.concat_tables([cand.set_column(1, "cnt", cand.column("cnt").cast(pa.int64())), total_row])

    def merge_summaries(block: pa.Table) -> pa.Table:
        # distinct candidates + the summed token total: the driver
        # payload is bounded by DISTINCT frequent-ish tokens, not by
        # (K-1) x blocks
        out = block.group_by(["token"]).aggregate([("cnt", "sum")])
        return out.rename_columns(["token", "cnt"])

    summaries = (
        ds.map_batches(block_candidates, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            merge_summaries, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .take_all()
    )
    n_total = sum(int(r["cnt"]) for r in summaries if r["token"] is None)
    cand_tokens = sorted({r["token"] for r in summaries if r["token"] is not None})
    empty = pa.table(
        {"token": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
    )
    if not cand_tokens or n_total == 0:
        return empty
    cand_ref = ray.put(pa.array(cand_tokens, type=pa.string()))

    def count_candidates(batch: pa.Table) -> pa.Table:
        flat = _block_tokens(batch)
        hits = flat.filter(pc.is_in(flat.column("token"), value_set=ray.get(cand_ref)))
        out = hits.group_by(["token"]).aggregate([([], "count_all")])
        return out.rename_columns(["token", "n"])

    merged = (
        ds.map_batches(count_candidates, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda block: block.group_by(["token"])
            .aggregate([("n", "sum")])
            .rename_columns(["token", "n"]),
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .take_all()
    )
    rows = [r for r in merged if int(r["n"]) * HH_K > n_total]
    if not rows:
        return empty
    t = pa.Table.from_pylist(rows)
    return pa.table(
        {
            "token": t.column("token").cast(pa.string()),
            "n": t.column("n").cast(pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# bloom-prefiltered decontamination (fixed-size broadcast at any bench size)
# ---------------------------------------------------------------------------

# 4M bits = a 512 KiB broadcast regardless of benchmark gram count;
# sized for ~10 bits/key at the benchmark scale this config targets —
# at a larger benchmark, raise it with the suite (it is the ONLY
# benchmark-proportional state, and it grows as bits, not strings)
DECONTAM_BLOOM_BITS = 1 << 22


def q_doc_decontaminate_bloom(sf_dir: str):
    """Benchmark decontamination with a BLOOM prefilter — the shape
    that survives a benchmark suite too big to broadcast as strings.

    ``q_doc_decontaminate`` broadcasts the exact gram set (~30+ bytes
    per gram); here the broadcast is a fixed 512 KiB bitarray. Bench
    pass: per-block distinct grams fold into the driver's bit table
    (only the table persists — gram strings are never collected).
    Corpus pass: each block dedupes its (doc_id, gram) pairs and keeps
    bloom-positive grams — the surviving stream is sized by true
    contamination + the fp rate, never the corpus. Exact verify: the
    survivors union the (re-streamed) bench grams through ONE
    gram-keyed exchange; within a partition a vectorized ``is_in``
    confirms true hits, cross-block duplicate pairs collapse (gram
    partitioning makes pair-dedup local), and per-doc distinct-hit
    counts fold through the standard two-phase aggregate. The final
    answer is EXACT (bloom false positives die in the verify); output
    is the contaminated-doc audit (``n_hits >= 1``) — the kill list a
    pipeline feeds an anti-join, not the full per-doc table."""
    from embulk_input_marketo_ray.stages.text import (
        bloom_fold,
        bloom_positions,
        doc_grams,
        BloomGramProber,
    )

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def bench_gram_block(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        bench = batch.filter(pa.array(ids % DECONTAM_BENCH_MOD == 0))
        grams = doc_grams(bench, n=DECONTAM_NGRAM)
        return grams.group_by(["gram"]).aggregate([]).select(["gram"])

    # the bench gram stream is small (bounded by the benchmark, not the
    # corpus): materialize it once and reuse for BOTH the bloom fold and
    # the verify union — one corpus read saved
    bench_grams = ds.map_batches(bench_gram_block, batch_format="pyarrow").materialize()
    bits = np.zeros(DECONTAM_BLOOM_BITS // 8, dtype=np.uint8)
    for ref in bench_grams.to_arrow_refs():
        block = ray.get(ref)
        if block.num_rows:
            col = block.column("gram")
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            bloom_fold(bits, bloom_positions(col, DECONTAM_BLOOM_BITS))
    bits_ref = ray.put(bits.tobytes())

    def corpus_only(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        return batch.filter(pa.array(ids % DECONTAM_BENCH_MOD != 0))

    prober = _task_stage(
        BloomGramProber, bits_ref=bits_ref, m_bits=DECONTAM_BLOOM_BITS, n=DECONTAM_NGRAM
    )
    survivors = (
        ds.map_batches(corpus_only, batch_format="pyarrow")
        .map_batches(prober, batch_format="pyarrow")
    )

    def bench_tagged(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([None] * batch.num_rows, type=pa.int64()),
                "gram": batch.column("gram"),
            }
        )

    tagged = survivors.union(
        bench_grams.map_batches(bench_tagged, batch_format="pyarrow")
    )
    def verify_block(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_hits": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        is_bench = pc.is_null(block.column("doc_id"))
        bench_grams = block.filter(is_bench).column("gram")
        cand = block.filter(pc.invert(is_bench))
        if not len(bench_grams) or not cand.num_rows:
            return empty
        if isinstance(bench_grams, pa.ChunkedArray):
            bench_grams = bench_grams.combine_chunks()
        hit = cand.filter(pc.is_in(cand.column("gram"), value_set=bench_grams))
        if not hit.num_rows:
            return empty
        # cross-block duplicate (doc_id, gram) pairs are co-partitioned
        # by gram: collapse them here so the downstream sum counts
        # DISTINCT grams per doc
        hit = hit.group_by(["doc_id", "gram"]).aggregate([])
        out = hit.group_by(["doc_id"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "doc_id": out.column("doc_id").cast(pa.int64()),
                "n_hits": out.column("count_all").cast(pa.int64()),
            }
        )

    verified = _keyed_exchange_apply(
        tagged,
        ["gram"],
        verify_block,
        pa.schema([("doc_id", pa.int64()), ("n_hits", pa.int64())]),
    )
    return grouped_aggregate(verified, ["doc_id"], [("n_hits", "sum", "n_hits")])


# ---------------------------------------------------------------------------
# incremental near-dup against a persisted signature index (CDC x dedup)
# ---------------------------------------------------------------------------


def q_doc_incremental_dedup(sf_dir: str):
    """Two-wave incremental dedup through the persisted LSH signature
    index (``stages/sig_index.py``): wave 1 (even doc_ids) builds the
    index; wave 2 (odd) is checked against wave 1's ADMITTED docs and
    itself — the CDC-shaped dedup where each arriving batch probes
    committed state instead of re-shuffling the corpus. Output is the
    full audit: (doc_id, wave, status, dup_of).

    Scale shape: per ingest the historical corpus never moves — the
    index probe reads only the band-hash buckets the batch touches,
    the verify fetches only the doc-id buckets holding candidate old
    ids, and the only broadcast is the batch's own dup id set. See the
    module docstring for the exactly-once commit protocol."""
    import shutil
    import tempfile

    from embulk_input_marketo_ray.stages.sig_index import init_index, ingest

    _ensure_hash_shuffle()
    index_dir = tempfile.mkdtemp(prefix="graft_sigidx_")
    try:
        init_index(index_dir)
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

        def wave_filter(parity: int):
            def fn(batch: pa.Table) -> pa.Table:
                ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
                return batch.filter(pa.array(ids % 2 == parity))

            return fn

        parts = []
        for wave_no, parity in ((1, 0), (2, 1)):
            res = ingest(
                index_dir,
                docs.map_batches(wave_filter(parity), batch_format="pyarrow"),
                f"wave{wave_no}",
            )
            parts.append(
                res.add_column(
                    1, "wave", pa.array([wave_no] * res.num_rows, type=pa.int64())
                )
            )
        out = pa.concat_tables(parts)
        return out.take(
            pc.sort_indices(out, sort_keys=[("doc_id", "ascending")])
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


def q_doc_cross_probe(sf_dir: str):
    """READ-ONLY cross-corpus dedup check through ``probe_docs``: the
    even-doc corpus builds the index, the odd-doc corpus is PROBED
    without mutating anything — 'would these be duplicates?' before
    paying to store/crawl them. Verdicts are identical to what a real
    ingest would record (the probe is ingest minus its write steps, by
    construction), which is exactly what the oracle asserts."""
    import shutil
    import tempfile

    from embulk_input_marketo_ray.stages.sig_index import (
        init_index,
        ingest,
        probe_docs,
    )

    _ensure_hash_shuffle()
    index_dir = tempfile.mkdtemp(prefix="graft_sigidx_probe_")
    try:
        init_index(index_dir)
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

        def wave_filter(parity: int):
            def fn(batch: pa.Table) -> pa.Table:
                ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
                return batch.filter(pa.array(ids % 2 == parity))

            return fn

        ingest(
            index_dir, docs.map_batches(wave_filter(0), batch_format="pyarrow"), "base"
        )
        res = probe_docs(
            index_dir, docs.map_batches(wave_filter(1), batch_format="pyarrow")
        )
        return res.take(pc.sort_indices(res, sort_keys=[("doc_id", "ascending")]))
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


DELETE_EVERY = 10  # tombstone wave-1 admitted docs with doc_id % 10 == 0


def q_doc_incremental_dedup_deletes(sf_dir: str):
    """Incremental dedup WITH RETRACTIONS: wave 1 (even doc_ids) builds
    the index, a tombstone DELETE retracts every admitted wave-1 doc
    with ``doc_id % DELETE_EVERY == 0`` (the GDPR-erasure / re-crawl
    story), then wave 2 (odd ids) probes the SURVIVING state — a wave-2
    doc whose only near-match was deleted is ADMITTED, exactly what an
    erasure must mean for dedup state. Output shape matches
    ``doc_incremental_dedup``: (doc_id, wave, status, dup_of).

    Scale shape: the delete is one id-list tombstone file + manifest
    commit; probes exclude tombstoned ids AT THE INDEX READ (broadcast
    of the unfolded tombstone set, budgeted with the compaction
    remedy); nothing is rewritten until ``compact_index`` folds the
    tombstones into the bases."""
    import shutil
    import tempfile

    from embulk_input_marketo_ray.stages.sig_index import (
        delete_docs,
        init_index,
        ingest,
    )

    _ensure_hash_shuffle()
    index_dir = tempfile.mkdtemp(prefix="graft_sigidx_del_")
    try:
        init_index(index_dir)
        docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

        def wave_filter(parity: int):
            def fn(batch: pa.Table) -> pa.Table:
                ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
                return batch.filter(pa.array(ids % 2 == parity))

            return fn

        parts = []
        res1 = ingest(
            index_dir, docs.map_batches(wave_filter(0), batch_format="pyarrow"), "wave1"
        )
        parts.append(
            res1.add_column(1, "wave", pa.array([1] * res1.num_rows, type=pa.int64()))
        )
        admitted = res1.filter(pc.equal(res1.column("status"), pa.scalar("admitted")))
        adm_ids = np.asarray(admitted.column("doc_id"), dtype=np.int64)
        delete_docs(index_dir, adm_ids[adm_ids % DELETE_EVERY == 0], "retract1")
        res2 = ingest(
            index_dir, docs.map_batches(wave_filter(1), batch_format="pyarrow"), "wave2"
        )
        parts.append(
            res2.add_column(1, "wave", pa.array([2] * res2.num_rows, type=pa.int64()))
        )
        out = pa.concat_tables(parts)
        return out.take(
            pc.sort_indices(out, sort_keys=[("doc_id", "ascending")])
        )
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# deterministic global training shuffle (shard + position, no RNG state)
# ---------------------------------------------------------------------------

SHUFFLE_N_SHARDS = 64
# a second multiplicative scramble constant (Knuth 2^32 golden ratio is
# SPLIT_HASH_MULT; this one keeps shuffle order independent of split
# assignment so train/val membership doesn't correlate with position)
SHUFFLE_HASH_MULT = 2246822519


def q_doc_global_shuffle(sf_dir: str):
    """Training-order assignment: give every doc a pseudo-random but
    DETERMINISTIC (shard, pos) — the global shuffle a training run
    needs, without ``random_shuffle``'s all-to-all of the payload or
    any RNG state. A loader streams shard files in pos order; the same
    corpus yields the same order on every run/resume, and admission of
    new docs perturbs only their own shard.

    Shape: the scramble hash and shard fuse with the read; ONE keyed
    exchange on shard (the payload is ids + hashes, never text); ranks
    come from a per-block vectorized sort + run-local arange (the
    ``row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)``
    semantics with no global sort). Each shard lives wholly in one
    partition — at 10^10 docs a shard is ~10^8 rows of 16 bytes,
    within a block; more shards, not bigger blocks, is the scale
    knob."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id"])

    def scramble(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.uint64)
        h = ((ids % SPLIT_HASH_MOD) * SHUFFLE_HASH_MULT) % SPLIT_HASH_MOD
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "h": pa.array(h.astype(np.int64), type=pa.int64()),
                "shard": pa.array((h % SHUFFLE_N_SHARDS).astype(np.int64), type=pa.int64()),
            }
        )

    hashed = ds.map_batches(scramble, batch_format="pyarrow")
    by_shard = _keyed_repartition(hashed, _shuffle_width(), ["shard"])

    def rank_kernel(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "shard": pa.array([], type=pa.int64()),
                "pos": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block,
            sort_keys=[("shard", "ascending"), ("h", "ascending"), ("doc_id", "ascending")],
        )
        t = block.take(order)
        shard = np.asarray(t.column("shard"), dtype=np.int64)
        n = len(shard)
        starts = np.flatnonzero(np.r_[True, shard[1:] != shard[:-1]])
        base = np.repeat(starts, np.diff(np.r_[starts, n]))
        pos = np.arange(n, dtype=np.int64) - base
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shard": t.column("shard"),
                "pos": pa.array(pos, type=pa.int64()),
            }
        )

    return by_shard.map_batches(
        rank_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# quantile-gated curation (per-language data-driven length cutoff)
# ---------------------------------------------------------------------------

CURATION_QUANTILE_P = 0.25


def q_doc_curation_quantile(sf_dir: str):
    """Data-driven curation: keep a doc iff its whitespace token count
    reaches its OWN language's p25 — the adaptive variant of a fixed
    length floor (a fixed floor tuned on English silently guts a
    shorter-typical-length language; the quantile gate is
    distribution-relative per subcorpus).

    Shape: pass 1 folds the corpus to a (lang, n_tokens) histogram —
    bounded by the token-count domain x languages, never by rows — via
    in-block partials + one merge block; the driver walks each
    language's tiny cumulative histogram with the same
    ``quantile_disc`` rule as DuckDB (first value whose cumulative
    count >= ceil(p*N)) and broadcasts the #langs-entry cutoff dict
    once. Pass 2 fuses the keep decision with the read. The corpus
    never shuffles in either pass."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["text", "lang"])

    def measure_hist(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(batch.column("text"), pa.scalar("")), pattern=r"\S+"
        ).cast(pa.int64())
        t = pa.table({"lang": batch.column("lang"), "n_tokens": n})
        out = t.group_by(["lang", "n_tokens"]).aggregate([([], "count_all")])
        return out.rename_columns(["lang", "n_tokens", "cnt"])

    def merge_hist(block: pa.Table) -> pa.Table:
        out = block.group_by(["lang", "n_tokens"]).aggregate([("cnt", "sum")])
        return out.rename_columns(["lang", "n_tokens", "cnt"])

    rows = (
        ds.map_batches(measure_hist, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            merge_hist, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        .take_all()
    )
    by_lang: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append((int(r["n_tokens"]), int(r["cnt"])))
    cutoffs: dict[str, int] = {}
    for lang, pairs in by_lang.items():
        pairs.sort()
        vals = np.array([v for v, _ in pairs], dtype=np.int64)
        cum = np.cumsum(np.array([c for _, c in pairs], dtype=np.int64))
        k = max(int(np.ceil(CURATION_QUANTILE_P * int(cum[-1]))), 1)
        cutoffs[lang] = int(vals[np.searchsorted(cum, k)])
    cut_ref = ray.put(cutoffs)

    full = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def gate(batch: pa.Table) -> pa.Table:
        cuts = ray.get(cut_ref)
        n = np.asarray(
            pc.count_substring_regex(
                pc.coalesce(batch.column("text"), pa.scalar("")), pattern=r"\S+"
            ).cast(pa.int64())
        )
        lang = np.asarray(batch.column("lang"), dtype=object)
        cut = np.array([cuts.get(l, 0) for l in lang], dtype=np.int64)
        keep = pa.array(n >= cut)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").filter(keep),
                "lang": batch.column("lang").filter(keep),
                "n_tokens": pa.array(n, type=pa.int64()).filter(keep),
            }
        )

    return full.map_batches(gate, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# incremental ANN via the persisted IVF index (embeddings x CDC)
# ---------------------------------------------------------------------------


def q_ann_incremental_topk(sf_dir: str):
    """Two-wave incremental ANN through the persisted IVF index
    (``stages/vec_index.py``): wave 1 (even vec_ids) trains the coarse
    quantizer and seeds the inverted lists; wave 2 (odd) is assigned
    against the FROZEN quantizer and appended — the add-after-train
    contract of every production IVF store. Queries then probe the
    union: top-5 exact-cosine neighbors of the first 3 vectors from
    only the probed clusters' committed files.

    Scale shape: the query pass reads ~n_probe/n_centroids of the
    corpus (the cluster files carry their embeddings, so NO attach
    exchange exists); each ingest touches only its own batch plus one
    file per written cluster; the driver merge is (queries x k x
    blocks) rows."""
    import shutil
    import tempfile

    from embulk_input_marketo_ray.stages.similarity import read_query_vectors
    from embulk_input_marketo_ray.stages.vec_index import (
        ann_topk_index,
        ingest_vectors,
        init_vec_index,
    )

    _ensure_hash_shuffle()
    index_dir = tempfile.mkdtemp(prefix="graft_vecidx_")
    try:
        init_vec_index(index_dir)

        def wave_filter(parity: int):
            def fn(batch: pa.Table) -> pa.Table:
                ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
                return batch.filter(pa.array(ids % 2 == parity))

            return fn

        for wave_no, parity in ((1, 0), (2, 1)):
            vecs = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
                wave_filter(parity), batch_format="pyarrow"
            )
            ingest_vectors(index_dir, vecs, f"wave{wave_no}")
        queries = read_query_vectors(_t(sf_dir, "embeddings"), ANN_NUM_QUERIES)
        return ann_topk_index(index_dir, queries, k=ANN_TOP_K, n_probe=8)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


VEC_DELETE_EVERY = 8  # tombstone indexed vectors with vec_id % 8 == 0


def q_ann_incremental_topk_deletes(sf_dir: str):
    """Incremental ANN WITH RETRACTIONS: wave 1 (even vec_ids) trains
    and seeds the lists, a tombstone DELETE retracts every indexed
    vector with ``vec_id % VEC_DELETE_EVERY == 0``, wave 2 (odd)
    appends, and the query probes the SURVIVING union — erased vectors
    can never be returned as neighbors (the vector-store deletion
    contract). Output shape matches ``ann_incremental_topk``.

    Scale shape: the delete is one id-list tombstone + manifest
    commit; the query excludes tombstoned ids at scoring via a
    budgeted broadcast; ``compact_vec_index`` folds tombstones into
    the bases."""
    import shutil
    import tempfile

    from embulk_input_marketo_ray.stages.similarity import read_query_vectors
    from embulk_input_marketo_ray.stages.vec_index import (
        ann_topk_index,
        delete_vectors,
        ingest_vectors,
        init_vec_index,
    )

    _ensure_hash_shuffle()
    index_dir = tempfile.mkdtemp(prefix="graft_vecidx_del_")
    try:
        init_vec_index(index_dir)

        def wave_filter(parity: int):
            def fn(batch: pa.Table) -> pa.Table:
                ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
                return batch.filter(pa.array(ids % 2 == parity))

            return fn

        vecs1 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
            wave_filter(0), batch_format="pyarrow"
        )
        ingest_vectors(index_dir, vecs1, "wave1")
        all_ids = np.asarray(
            pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id"]).column("vec_id"),
            dtype=np.int64,
        )
        dead = all_ids[(all_ids % 2 == 0) & (all_ids % VEC_DELETE_EVERY == 0)]
        delete_vectors(index_dir, dead, "retract1")
        vecs2 = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
            wave_filter(1), batch_format="pyarrow"
        )
        ingest_vectors(index_dir, vecs2, "wave2")
        queries = read_query_vectors(_t(sf_dir, "embeddings"), ANN_NUM_QUERIES)
        return ann_topk_index(index_dir, queries, k=ANN_TOP_K, n_probe=8)
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)


# ---------------------------------------------------------------------------
# corpus composition report (per-source/lang accounting)
# ---------------------------------------------------------------------------


def q_doc_source_report(sf_dir: str):
    """Corpus composition accounting: per (source, lang) — docs,
    whitespace tokens, utf8 bytes. The table every mixing/curation
    decision starts from. Token/byte measures fuse with the read; the
    two-phase grouped aggregate ships one partial row per (source,
    lang) per block — payload bounded by the group domain, never
    rows."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["source", "lang", "text"])

    def measure(batch: pa.Table) -> pa.Table:
        text = pc.coalesce(batch.column("text"), pa.scalar(""))
        t = pa.table(
            {
                "source": batch.column("source"),
                "lang": batch.column("lang"),
                "n_tokens": pc.count_substring_regex(text, pattern=r"\S+").cast(
                    pa.int64()
                ),
                "n_bytes": pc.binary_length(text).cast(pa.int64()),
            }
        )
        out = t.group_by(["source", "lang"]).aggregate(
            [([], "count_all"), ("n_tokens", "sum"), ("n_bytes", "sum")]
        )
        return out.rename_columns(["source", "lang", "n_docs", "n_tokens", "n_bytes"])

    partial = ds.map_batches(measure, batch_format="pyarrow")
    return grouped_aggregate(
        partial,
        ["source", "lang"],
        [("n_docs", "sum", "n_docs"), ("n_tokens", "sum", "n_tokens"), ("n_bytes", "sum", "n_bytes")],
    )


# ---------------------------------------------------------------------------
# relational rollup + broadcast-dim join (the warehouse shapes)
# ---------------------------------------------------------------------------


def q_lineitem_rollup(sf_dir: str):
    """TPC-H Q1-shaped pricing rollup (integer measures): per
    (l_returnflag, l_linestatus) — row count and quantity sum. Reads
    ONLY the three needed columns of the widest table; in-block
    partials shrink every batch to <= |flag x status| rows before the
    keyed exchange (two-phase aggregate — the shuffle payload is the
    group domain x blocks, never lineitem rows)."""
    _ensure_hash_shuffle()
    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "l_quantity": batch.column("l_quantity").cast(pa.int64()),
            }
        )
        out = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [([], "count_all"), ("l_quantity", "sum")]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "n_items", "sum_qty"]
        )

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("n_items", "sum", "n_items"), ("sum_qty", "sum", "sum_qty")],
    )


def q_customer_nation_report(sf_dir: str):
    """Broadcast-dimension join: customers per nation NAME. The nation
    dim (25 rows at any scale — dimensions don't grow with the fact
    side) is ``ray.put`` once and mapped into every customer batch as
    a searchsorted lookup; the fact table never shuffles for the join,
    only the tiny per-name partials do."""
    _ensure_hash_shuffle()
    nation = pq.read_table(
        _t(sf_dir, "nation"), columns=["n_nationkey", "n_name"]
    ).combine_chunks()
    order = pc.sort_indices(nation, sort_keys=[("n_nationkey", "ascending")])
    nation = nation.take(order)
    dim_ref = ray.put(
        (
            np.asarray(nation.column("n_nationkey"), dtype=np.int64),
            np.asarray(nation.column("n_name"), dtype=object),
        )
    )

    ds = _read(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])

    def attach_and_partial(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(dim_ref)
        nk = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
        pos = np.searchsorted(keys, nk)
        pos[pos >= len(keys)] = len(keys) - 1
        name = np.where(keys[pos] == nk, names[pos], None)
        t = pa.table(
            {
                "n_name": pa.array(name, type=pa.string()),
                "pos_bal": pa.array(
                    (np.asarray(batch.column("c_acctbal"), dtype=np.float64) > 0).astype(
                        np.int64
                    ),
                    type=pa.int64(),
                ),
            }
        )
        # inner-join semantics: a fact row with no dim match drops
        # (mirrors the oracle's JOIN; none exist in valid data)
        t = t.filter(pc.is_valid(t.column("n_name")))
        out = t.group_by(["n_name"]).aggregate([([], "count_all"), ("pos_bal", "sum")])
        return out.rename_columns(["n_name", "n_customers", "n_positive_bal"])

    return grouped_aggregate(
        ds.map_batches(attach_and_partial, batch_format="pyarrow"),
        ["n_name"],
        [("n_customers", "sum", "n_customers"), ("n_positive_bal", "sum", "n_positive_bal")],
    )


# ---------------------------------------------------------------------------
# per-doc boilerplate share (corpus-common gram fraction)
# ---------------------------------------------------------------------------

BOILERPLATE_MIN_DF = 2


def q_doc_boilerplate(sf_dir: str):
    """Boilerplate signal: per doc, how many of its DISTINCT word
    3-grams appear in at least ``BOILERPLATE_MIN_DF`` documents —
    headers/footers/templates score high, original prose scores low.
    Complements ``doc_repetition`` (within-doc duplication) and
    ``doc_decontaminate`` (vs a held-out set): this one is
    corpus-relative.

    Shape: distinct (doc_id, gram) rows explode in-block; ONE
    gram-keyed exchange serves both the document-frequency count and
    the common-flag attach (each gram's postings are co-resident, so
    the per-gram df and the per-(doc, gram) commonness fold in the
    same kernel — no second join); per-doc sums return through the
    standard two-phase aggregate. Integer output columns only."""
    from embulk_input_marketo_ray.stages.text import doc_grams

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_distinct(batch: pa.Table) -> pa.Table:
        g = doc_grams(batch, n=3)
        if g.num_rows:
            g = g.group_by(["doc_id", "gram"]).aggregate([])
        return g

    grams = ds.map_batches(explode_distinct, batch_format="pyarrow")
    by_gram = _keyed_repartition(grams, _shuffle_width(), ["gram"])

    def common_partial(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_grams": pa.array([], type=pa.int64()),
                "n_common": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(block, sort_keys=[("gram", "ascending")])
        t = block.take(order)
        gram = np.asarray(t.column("gram"), dtype=object)
        new_run = np.r_[True, gram[1:] != gram[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        df = np.diff(np.r_[starts, len(gram)])  # postings co-resident: exact df
        common = (df >= BOILERPLATE_MIN_DF)[run_idx]
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(np.ones(len(gram), dtype=np.int64), type=pa.int64()),
                "n_common": pa.array(common.astype(np.int64), type=pa.int64()),
            }
        )
        agg = out.group_by(["doc_id"]).aggregate([("n_grams", "sum"), ("n_common", "sum")])
        return agg.rename_columns(["doc_id", "n_grams", "n_common"])

    partial = by_gram.map_batches(
        common_partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_aggregate(
        partial,
        ["doc_id"],
        [("n_grams", "sum", "n_grams"), ("n_common", "sum", "n_common")],
    )


# ---------------------------------------------------------------------------
# length-bucketed batch assignment (dynamic batching for training/inference)
# ---------------------------------------------------------------------------

LENBATCH_BUCKET_TOKENS = 128  # bucket width in tokens
LENBATCH_DOCS_PER_BATCH = 8


def q_doc_length_batches(sf_dir: str):
    """Dynamic-batching assignment: docs grouped into token-length
    buckets (width ``LENBATCH_BUCKET_TOKENS``), then packed into
    fixed-size batches of ``LENBATCH_DOCS_PER_BATCH`` docs WITHIN each
    bucket, in doc_id order — the padding-efficient loader layout
    (batching similar lengths together bounds pad waste to one bucket
    width per row).

    Shape: token counts + bucket fuse with the read; ONE keyed
    exchange on the bucket; batch ids come from the same run-rank
    kernel as ``q_doc_global_shuffle`` (``row_number() OVER (PARTITION
    BY bucket ORDER BY doc_id)`` without a global sort). A bucket
    lives wholly in one partition — the length distribution bounds any
    bucket at a corpus share, and more/narrower buckets is the scale
    knob."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def measure(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(
            pc.coalesce(batch.column("text"), pa.scalar("")), pattern=r"\S+"
        ).cast(pa.int64())
        nv = np.asarray(n)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tokens": n,
                "bucket": pa.array(nv // LENBATCH_BUCKET_TOKENS, type=pa.int64()),
            }
        )

    measured = ds.map_batches(measure, batch_format="pyarrow")
    by_bucket = _keyed_repartition(measured, _shuffle_width(), ["bucket"])

    def rank_kernel(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_tokens": pa.array([], type=pa.int64()),
                "bucket": pa.array([], type=pa.int64()),
                "batch_id": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block, sort_keys=[("bucket", "ascending"), ("doc_id", "ascending")]
        )
        t = block.take(order)
        bucket = np.asarray(t.column("bucket"), dtype=np.int64)
        n = len(bucket)
        starts = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        base = np.repeat(starts, np.diff(np.r_[starts, n]))
        pos = np.arange(n, dtype=np.int64) - base
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": t.column("n_tokens"),
                "bucket": t.column("bucket"),
                "batch_id": pa.array(pos // LENBATCH_DOCS_PER_BATCH, type=pa.int64()),
            }
        )

    return by_bucket.map_batches(
        rank_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# ordered event funnel / RAG chunk layout (round-4 additions)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "click", "purchase")


def funnel_stage_counts(
    user: np.ndarray, ts_us: np.ndarray, stage_of: np.ndarray, n_stages: int
) -> list[int]:
    """Pure funnel kernel over (user, ts)-SORTED arrays: per-user
    sequential stage mins (stage k's first time at-or-after the user's
    stage-(k-1) time, ``>=`` inclusive) via masked
    ``np.minimum.reduceat`` — returns the per-stage converted-user
    counts. Extracted module-level so the property suite can drive it
    against a brute-force reference."""
    if len(user) == 0:
        return [0] * n_stages
    _imax = np.iinfo(np.int64).max
    new_run = np.r_[True, user[1:] != user[:-1]]
    starts = np.flatnonzero(new_run)
    run_idx = np.cumsum(new_run) - 1
    # floor starts open, then each stage's per-run first-qualifying
    # time becomes the next floor (a run with no qualifying row folds
    # to I64_MAX, which no later ts can be >= — conversion stops there)
    floor = np.full(len(starts), np.iinfo(np.int64).min, dtype=np.int64)
    counts = []
    for k in range(n_stages):
        qual = (stage_of == k) & (ts_us >= floor[run_idx])
        vals = np.where(qual, ts_us, _imax)
        floor = np.minimum.reduceat(vals, starts)
        counts.append(int((floor < _imax).sum()))
    return counts


def q_event_funnel(sf_dir: str):
    """Ordered funnel conversion over the event stream: how many users
    reach each stage of ``signup -> click -> purchase`` IN TIME ORDER
    (stage k counts a user iff some stage-k event is at-or-after the
    user's earliest qualifying stage-(k-1) time; ``>=`` so same-instant
    events chain, mirroring the asof join's inclusive bound).

    The reference's analog is the per-object dedup + watermark ordering
    discipline (per-key ordering only, never a global sort — SURVEY.md
    §2.9); the funnel is the classic event-analytics op built on the
    same shape: filter to the funnel's event types AT THE SCAN (the
    other ~40% of rows never enter the exchange), ONE keyed exchange
    on user_id, then a per-block vectorized kernel — sort (user, ts),
    per-run sequential stage mins via masked ``np.minimum.reduceat``
    (no per-row loop, no driver state) — emitting <= 3 partial rows per
    block that a tiny two-phase aggregate folds. Payload = funnel rows
    moving once; result = 3 rows. Partitioning assumption: each user's
    rows co-reside (the catalog's standard per-key locality)."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    stage_arr = pa.array(list(FUNNEL_STAGES))

    def keep_funnel(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("event_type"), value_set=stage_arr))

    shuffled = _keyed_repartition(
        ds.map_batches(keep_funnel, batch_format="pyarrow"),
        _shuffle_width(),
        ["user_id"],
    )
    partial_schema = pa.schema(
        [("stage", pa.string()), ("stage_idx", pa.int64()), ("users", pa.int64())]
    )

    def funnel_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        ts_us = np.asarray(t.column("ts")).astype("datetime64[us]").view(np.int64)
        et = t.column("event_type")
        stage_of = np.full(len(user), -1, dtype=np.int8)
        for k, name in enumerate(FUNNEL_STAGES):
            stage_of[np.asarray(pc.equal(et, pa.scalar(name)))] = k
        counts = funnel_stage_counts(user, ts_us, stage_of, len(FUNNEL_STAGES))
        return pa.table(
            {
                "stage": stage_arr,
                "stage_idx": pa.array(
                    np.arange(1, len(FUNNEL_STAGES) + 1, dtype=np.int64)
                ),
                "users": pa.array(np.array(counts, dtype=np.int64)),
            }
        )

    partial = shuffled.map_batches(
        funnel_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_aggregate(partial, ["stage", "stage_idx"], [("users", "sum", "users")])


CHUNK_TOKENS = 64    # chunk width in tokens
CHUNK_OVERLAP = 16   # tokens shared between adjacent chunks
CHUNK_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP


def q_doc_chunks(sf_dir: str):
    """RAG-style chunk layout: every document split into overlapping
    ``CHUNK_TOKENS``-token windows on a ``CHUNK_STRIDE`` grid — the
    retrieval-corpus preparation step (each chunk is the unit that gets
    embedded/indexed downstream). Emits ``(doc_id, chunk_idx,
    start_tok, chunk_tokens)``; chunk starts advance by the stride
    while ``start < max(n_tok - overlap, 1)`` so the final chunk always
    covers the tail and every doc (even an empty one) yields >= 1 row
    — all-integer arithmetic, exact vs the SQL replica.

    Shape: embarrassingly parallel — one streaming ``map_batches`` over
    a 2-column pruned read, token counts via one RE2 scan
    (``count_substring_regex``), the explode via ``np.repeat`` /
    prefix-sum arithmetic. No exchange, no driver state; at 100 TB this
    is a pure pass-through stage whose output partitioning inherits the
    input's (resume = re-run a shard)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("chunk_idx", pa.int64()),
            ("start_tok", pa.int64()),
            ("chunk_tokens", pa.int64()),
        ]
    )

    def chunk_map(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        n_tok = np.asarray(
            pc.count_substring_regex(
                pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
                pattern="[a-z]+",
            ),
            dtype=np.int64,
        )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        n_chunks = (np.maximum(n_tok - CHUNK_OVERLAP, 1) + CHUNK_STRIDE - 1) // CHUNK_STRIDE
        total = int(n_chunks.sum())
        doc_rep = np.repeat(ids, n_chunks)
        # per-doc chunk ordinal: global position minus each doc's start
        first = np.r_[0, np.cumsum(n_chunks)[:-1]]
        chunk_idx = np.arange(total, dtype=np.int64) - np.repeat(first, n_chunks)
        start = chunk_idx * CHUNK_STRIDE
        width = np.minimum(CHUNK_TOKENS, np.repeat(n_tok, n_chunks) - start)
        return pa.table(
            {
                "doc_id": pa.array(doc_rep),
                "chunk_idx": pa.array(chunk_idx),
                "start_tok": pa.array(start),
                "chunk_tokens": pa.array(width),
            }
        )

    return ds.map_batches(chunk_map, batch_format="pyarrow", zero_copy_batch=True)


_DAY_US = 86_400_000_000


def retention_cells(
    user: np.ndarray, day_us: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Pure retention kernel over (user, day)-SORTED arrays: one
    ``(cohort_day_us, day_offset)`` row per DISTINCT (user, day) pair,
    cohort = the user's first day (run start in sorted order), via a
    shift-compare mask — no per-row loop. Extracted module-level for
    the property suite."""
    if len(user) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e
    new_run = np.r_[True, user[1:] != user[:-1]]
    starts = np.flatnonzero(new_run)
    run_idx = np.cumsum(new_run) - 1
    cohort = day_us[starts][run_idx]  # run's first (= min) day per row
    first_of_day = new_run | np.r_[False, day_us[1:] != day_us[:-1]]
    coh = cohort[first_of_day]
    off = (day_us[first_of_day] - coh) // _DAY_US
    return coh, off


def q_user_retention(sf_dir: str):
    """Cohort retention matrix: users grouped by the DAY of their first
    event (any type), counted once per (cohort_day, day_offset) they
    were active — the product-analytics companion to the funnel, and
    another instance of the catalog's per-key-ordering discipline
    (SURVEY.md §2.9: per-key state, never a global sort).

    Shape: 3-column pruned read (user_id is the only key; event_id and
    payload never load), ONE keyed exchange on user_id, then a
    per-block kernel — sort (user, ts), the run's FIRST row is the
    cohort day, unique (user, day) pairs via a shift-compare mask,
    integer day offsets — emitting one row per distinct (cohort,
    offset, user) which an in-block group-count folds before the tiny
    two-phase aggregate. Payload after the kernel is bounded by the
    cohort x offset domain (days^2), never users or events."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    partial_schema = pa.schema(
        [
            ("cohort_day", pa.timestamp("us")),
            ("day_offset", pa.int64()),
            ("users", pa.int64()),
        ]
    )

    def retention_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("user_id", "ascending"), ("ts", "ascending")]
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        day_us = (
            np.asarray(t.column("ts")).astype("datetime64[us]").view(np.int64)
            // _DAY_US
        ) * _DAY_US
        coh, off = retention_cells(user, day_us)
        out = pa.table(
            {
                "cohort_day": pa.array(coh, type=pa.int64()).cast(pa.timestamp("us")),
                "day_offset": pa.array(off, type=pa.int64()),
                "users": pa.array(np.ones(len(coh), dtype=np.int64)),
            }
        )
        agg = out.group_by(["cohort_day", "day_offset"]).aggregate([("users", "sum")])
        return agg.rename_columns(["cohort_day", "day_offset", "users"])

    partial = _keyed_exchange_apply(ds, ["user_id"], retention_kernel, partial_schema)
    return grouped_aggregate(
        partial, ["cohort_day", "day_offset"], [("users", "sum", "users")]
    )


EMB_OUTLIER_TOP_K = 5


def q_embedding_outliers(sf_dir: str):
    """SemDeDup-style within-cluster outlier surfacing: for every
    label (the semantic cluster), the ``EMB_OUTLIER_TOP_K`` vectors
    FARTHEST from the label centroid (lowest cosine to the mean of the
    label's unit vectors) — the curation pass that prunes mislabeled /
    low-quality points from each semantic cluster before training.
    Output is integer-only ``(vec_id, label, rank)`` (rank 1 = most
    outlying; ties by vec_id) so the driver's value-hash compare never
    touches a float.

    Shape: pass 1 folds per-block ``(label, count, sum_vec)`` partials
    (sorted-run ``np.add.reduceat`` over the unit-vector matrix — rows
    out are bounded by labels x blocks, the bounded-domain stat the
    repo's other histogram collections use); the driver merges the tiny
    partials and broadcasts the per-label centroid-sum matrix ONCE
    (``ray.put``). Pass 2 re-streams the corpus, scores each vector
    against its own label's sum (within-label ranking is invariant to
    the skipped /count and /norm — positive scalars per label), and a
    keyed exchange on label + the catalog's run-rank kernel keeps the
    bottom-k. The corpus crosses the wire once; the centroid matrix is
    labels x dim floats — the small side at any corpus size."""
    from embulk_input_marketo_ray.stages.similarity import list_column_matrix

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "label", "embedding"])

    def partial_sums(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "count": pa.array([], type=pa.int64()),
                    "vsum": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        x = list_column_matrix(batch.column("embedding")).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        order = np.argsort(lab, kind="stable")
        lab_s, x_s = lab[order], x[order]
        starts = np.flatnonzero(np.r_[True, lab_s[1:] != lab_s[:-1]])
        sums = np.add.reduceat(x_s, starts, axis=0)
        counts = np.diff(np.r_[starts, len(lab_s)])
        return pa.table(
            {
                "label": pa.array(lab_s[starts], type=pa.int64()),
                "count": pa.array(counts, type=pa.int64()),
                "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
            }
        )

    # bounded-domain collection: labels x blocks rows, dim floats each
    parts = [
        t
        for t in ds.map_batches(partial_sums, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "label": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    pt = pa.concat_tables(parts)
    lab_p = np.asarray(pt.column("label"), dtype=np.int64)
    sums_p = np.stack(pt.column("vsum").to_pylist()).astype(np.float64)
    order = np.argsort(lab_p, kind="stable")
    lab_o, sums_o = lab_p[order], sums_p[order]
    starts = np.flatnonzero(np.r_[True, lab_o[1:] != lab_o[:-1]])
    labels = lab_o[starts]
    centroid_sums = np.add.reduceat(sums_o, starts, axis=0)
    cref = ray.put((labels, centroid_sums))

    def score(batch: pa.Table) -> pa.Table:
        labels, csums = ray.get(cref)
        lab = np.asarray(batch.column("label"), dtype=np.int64)
        x = list_column_matrix(batch.column("embedding")).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        row = np.searchsorted(labels, lab)
        s = np.einsum("ij,ij->i", x, csums[row])
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "label": pa.array(lab, type=pa.int64()),
                "score": pa.array(s, type=pa.float64()),
            }
        )

    scored = ds.map_batches(score, batch_format="pyarrow")
    by_label = _keyed_repartition(scored, _shuffle_width(), ["label"])

    def bottomk(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "label": pa.array([], type=pa.int64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("label", "ascending"),
                ("score", "ascending"),  # farthest from centroid first
                ("vec_id", "ascending"),
            ],
        )
        t = block.take(order)
        lab = np.asarray(t.column("label"), dtype=np.int64)
        pos = np.arange(len(lab), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, lab[1:] != lab[:-1]])
        rank = pos - np.repeat(pos[starts], np.diff(np.r_[starts, len(lab)])) + 1
        keep = rank <= EMB_OUTLIER_TOP_K
        return pa.table(
            {
                "vec_id": t.column("vec_id").filter(pa.array(keep)),
                "label": t.column("label").filter(pa.array(keep)),
                "rank": pa.array(rank[keep], type=pa.int64()),
            }
        )

    return by_label.map_batches(
        bottomk, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q_order_priority_report(sf_dir: str):
    """TPC-H Q12-shaped LARGE x LARGE distributed equi-join: every
    lineitem joined to its order's priority class, counted high/low per
    return flag. This is the catalog's canonical big-big join shape —
    neither side fits a broadcast at 100 TB, so both ride ONE
    tagged-union keyed exchange co-partitioned on the order key (the
    same tagged-union idiom as the asof join and sig-index verify),
    and the per-block kernel resolves each key run locally: the order
    row sorts first in its run, its precomputed ``is_high`` bit gathers
    onto the run's lineitem rows, and an in-block group-by folds to
    <= |returnflag| rows before the tiny final aggregate.

    Scale notes: the priority STRING never crosses the exchange (it
    collapses to one int8 at the scan — column pruned to 2 columns per
    side); post-kernel payload is bounded by the flag domain x blocks.
    A hot order key splits fine: only its single order row must
    co-reside with each fragment for the gather, which the exchange's
    key hashing guarantees."""
    _ensure_hash_shuffle()
    union_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("is_high", pa.int8()),
            ("flag", pa.string()),
        ]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        is_high = pc.is_in(
            batch.column("o_orderpriority"),
            value_set=pa.array(list(HIGH_PRIORITIES)),
        ).cast(pa.int8())
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "is_high": is_high,
                "flag": pa.nulls(n, type=pa.string()),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "is_high": pa.nulls(n, type=pa.int8()),
                "flag": batch.column("l_returnflag"),
            }
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])
    tagged = orders.map_batches(order_rows, batch_format="pyarrow").union(
        lineitem.map_batches(line_rows, batch_format="pyarrow")
    )
    partial_schema = pa.schema(
        [
            ("l_returnflag", pa.string()),
            ("high_line_count", pa.int64()),
            ("low_line_count", pa.int64()),
        ]
    )

    def join_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return partial_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        # is_high is null on lineitem rows; fill for the numpy gather
        ih = np.asarray(pc.fill_null(t.column("is_high"), -1), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        # inner join: a run participates iff its first row is an order
        run_has_order = side[starts] == 0
        run_high = np.where(run_has_order, ih[starts], -1)
        row_high = run_high[run_idx]
        keep = (side == 1) & (row_high >= 0)
        if not keep.any():
            return partial_schema.empty_table()
        flags = t.column("flag").filter(pa.array(keep))
        high = row_high[keep].astype(np.int64)
        out = pa.table(
            {
                "l_returnflag": flags,
                "high_line_count": pa.array(high),
                "low_line_count": pa.array(1 - high),
            }
        )
        agg = out.group_by(["l_returnflag"]).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")]
        )
        return agg.rename_columns(
            ["l_returnflag", "high_line_count", "low_line_count"]
        )

    partial = _keyed_exchange_apply(tagged, ["okey"], join_kernel, partial_schema)
    return grouped_aggregate(
        partial,
        ["l_returnflag"],
        [
            ("high_line_count", "sum", "high_line_count"),
            ("low_line_count", "sum", "low_line_count"),
        ],
    )


ROLLING_WINDOW_ROWS = 5  # current row + 4 preceding


def q_event_rolling_stats(sf_dir: str):
    """Per-user ROWS-frame rolling window (``ROWS BETWEEN 4 PRECEDING
    AND CURRENT ROW`` over (ts, event_id) order): each event's ordinal
    within its user stream, the realized frame width, and the frame's
    max value — the streaming-feature shape (rolling engagement /
    anomaly features) the batch engines compute with window functions.
    ``max`` is a SELECTION (never float arithmetic), so the result is
    bit-exact vs the SQL replica — rolling SUMS of floats would differ
    in the last ulp between prefix-sum and direct evaluation.

    Shape: 4-column pruned read, ONE keyed exchange on user_id, then a
    per-block kernel: sort (user, ts, event_id), in-run ordinals by
    run-start subtraction, and the K-row frame max as K-1 shifted
    ``np.maximum`` passes gated on the ordinal (window never crosses a
    run boundary) — K is a small constant, so the kernel is K vector
    ops regardless of block size, no per-row loop."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("row_in_user", pa.int64()),
            ("win_rows", pa.int64()),
            ("win_max", pa.float64()),
        ]
    )

    def rolling_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        val = np.asarray(t.column("value"), dtype=np.float64)
        n = len(user)
        new_run = np.r_[True, user[1:] != user[:-1]]
        starts = np.flatnonzero(new_run)
        pos = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        win_max = val.copy()
        for j in range(1, ROLLING_WINDOW_ROWS):
            ok = pos >= j
            shifted = np.empty_like(val)
            shifted[j:] = val[:-j]
            np.maximum(win_max, shifted, out=win_max, where=ok)
        return pa.table(
            {
                "event_id": t.column("event_id").cast(pa.int64()),
                "user_id": t.column("user_id").cast(pa.int64()),
                "ts": t.column("ts"),
                "row_in_user": pa.array(pos + 1, type=pa.int64()),
                "win_rows": pa.array(
                    np.minimum(pos + 1, ROLLING_WINDOW_ROWS), type=pa.int64()
                ),
                "win_max": pa.array(win_max, type=pa.float64()),
            }
        )

    return _keyed_exchange_apply(ds, ["user_id"], rolling_kernel, out_schema)


ANTI_JOIN_PRICE = 400_000.0  # "big order" threshold


def q_customer_anti_join(sf_dir: str):
    """Distributed LARGE x LARGE ANTI-join (``NOT EXISTS``): customers
    with NO order above ``ANTI_JOIN_PRICE`` — the set-difference shape
    (D-family) at a scale where neither side broadcasts. The probe side
    is filtered AT THE SCAN (only qualifying orders' custkeys ever
    leave the read — at 100 TB the predicate prunes the probe stream
    before it touches the exchange), both sides ride ONE tagged-union
    keyed exchange on custkey, and the per-block kernel keeps exactly
    the customer rows whose key run contains no probe row. Compare
    ``q_semi_join`` (broadcast key set): that shape needs the probe
    side's distinct keys to fit a broadcast; this one never does."""
    _ensure_hash_shuffle()
    customers = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    union_schema = pa.schema(
        [("ckey", pa.int64()), ("side", pa.int8()), ("c_mktsegment", pa.string())]
    )

    def customer_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "c_mktsegment": batch.column("c_mktsegment"),
            }
        )

    def probe_rows(batch: pa.Table) -> pa.Table:
        hit = batch.filter(
            pc.greater(batch.column("o_totalprice"), pa.scalar(ANTI_JOIN_PRICE))
        )
        n = hit.num_rows
        return pa.table(
            {
                "ckey": hit.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "c_mktsegment": pa.nulls(n, type=pa.string()),
            }
        )

    tagged = customers.map_batches(customer_rows, batch_format="pyarrow").union(
        orders.map_batches(probe_rows, batch_format="pyarrow")
    )
    out_schema = pa.schema([("c_custkey", pa.int64()), ("c_mktsegment", pa.string())])

    def anti_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "descending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        # probe rows sort FIRST (side desc): a run whose first row is a
        # customer row has no probe hit — keep its customer rows
        run_clean = side[starts] == 0
        keep = (side == 0) & run_clean[run_idx]
        return pa.table(
            {
                "c_custkey": t.column("ckey").filter(pa.array(keep)),
                "c_mktsegment": t.column("c_mktsegment").filter(pa.array(keep)),
            }
        )

    return _keyed_exchange_apply(tagged, ["ckey"], anti_kernel, out_schema)


HLL_P = 12                      # 2^12 = 4096 registers per sketch
HLL_M = 1 << HLL_P


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized SplitMix64 finalizer — the deterministic 64-bit
    scramble the HLL sketch hashes with (numpy uint64 arithmetic wraps
    mod 2^64 by definition, which IS the algorithm)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_fold(values: np.ndarray, registers: np.ndarray) -> None:
    """Fold int64 values into a 2^HLL_P-register HLL sketch IN PLACE:
    register index = top HLL_P hash bits, rank = 1 + leading zeros of
    the remaining 64-HLL_P bits (capped at 64-HLL_P+1). Vectorized:
    one scramble + one shift pair + np.maximum.at."""
    if len(values) == 0:
        return
    h = splitmix64(values.view(np.uint64) if values.dtype == np.int64 else values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # leading zeros of `rest` via float64 exponent would lose precision
    # >2^53; use the bit-length identity on the uint64 directly
    lz = np.uint64(64) - _bit_length_u64(rest)
    rank = (lz + np.uint64(1)).astype(np.uint8)
    np.maximum.at(registers, idx, rank)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0): binary-search shifts,
    6 vector ops — no Python loop over rows, exact at all 64 bits."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        big = x >= (np.uint64(1) << s)
        n[big] += s
        x[big] >>= s
    n[x > 0] += np.uint64(1)
    return n


def hll_estimate(registers: np.ndarray, m_regs: int = HLL_M) -> int:
    """Standard HLL estimate with the small-range (linear counting)
    correction. The harmonic sum folds over the REGISTER-VALUE
    HISTOGRAM in ascending value order — a fixed <= 65-term float sum
    whose order is identical in any implementation, so the estimate is
    bit-deterministic for identical registers (a direct 4096-term sum
    would depend on summation order)."""
    m = float(m_regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    counts = np.bincount(registers.astype(np.int64), minlength=65)
    harm = 0.0
    for v in range(65):
        if counts[v]:
            harm += float(counts[v]) * 2.0 ** -v
    est = alpha * m * m / harm
    zeros = int(counts[0])
    if est <= 2.5 * m and zeros > 0:
        import math

        est = m * math.log(m / zeros)
    return int(round(est))


def q_approx_distinct_users(sf_dir: str):
    """Approximate distinct-user count per event type via a MERGEABLE
    HyperLogLog sketch — the 100-TB cardinality path: exact distinct
    (``q_distinct_values`` / the hop windows' two-phase distinct) moves
    one row per distinct key through the exchange, which at billions of
    keys is itself the bottleneck; the sketch caps the per-group
    exchange payload at 4 KiB (2^12 uint8 registers) REGARDLESS of
    cardinality, and register-wise max is associative/commutative so
    partials fold in any order. Deterministic by construction (SplitMix64
    hash, no RNG), so the independent single-process recompute oracle
    matches exactly; accuracy vs exact is property-tested (~1.6%
    typical at p=12).

    Shape: per-block partial sketches per event_type (bounded by types
    x blocks, each 4 KiB), ONE tiny keyed exchange on event_type, a
    register-max merge per group, then the closed-form estimate."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    partial_schema = pa.schema(
        [("event_type", pa.string()), ("registers", pa.binary())]
    )

    def partial_sketches(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        et = batch.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        idx = np.asarray(codes.indices, dtype=np.int64)
        users = np.asarray(batch.column("user_id"), dtype=np.int64)
        types = codes.dictionary.to_pylist()
        # ONE pass for every type: a (types, M) register bank folded
        # through a flattened scatter-max — no per-type batch rescan,
        # so the kernel cost is independent of the type domain's width
        h = splitmix64(users)
        reg_idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
        rank = (np.uint64(64) - _bit_length_u64(rest) + np.uint64(1)).astype(
            np.uint8
        )
        bank = np.zeros((len(types), HLL_M), dtype=np.uint8)
        np.maximum.at(bank.reshape(-1), idx * HLL_M + reg_idx, rank)
        return pa.table(
            {
                "event_type": pa.array(types, type=pa.string()),
                "registers": pa.array([b.tobytes() for b in bank], type=pa.binary()),
            }
        )

    partial = ds.map_batches(partial_sketches, batch_format="pyarrow")
    by_type = _keyed_repartition(partial, _shuffle_width(), ["event_type"])
    out_schema = pa.schema(
        [("event_type", pa.string()), ("approx_users", pa.int64())]
    )

    def merge_estimate(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        et = block.column("event_type")
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        codes = et.dictionary_encode()
        idx = np.asarray(codes.indices, dtype=np.int64)
        blobs = block.column("registers")
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        types = codes.dictionary.to_pylist()
        out_t, out_n = [], []
        for k, name in enumerate(types):
            rows = np.flatnonzero(idx == k)
            merged = np.zeros(HLL_M, dtype=np.uint8)
            for r in rows:  # partials per (type): bounded by input blocks
                np.maximum(
                    merged,
                    np.frombuffer(blobs[int(r)].as_py(), dtype=np.uint8),
                    out=merged,
                )
            out_t.append(name)
            out_n.append(hll_estimate(merged))
        return pa.table(
            {
                "event_type": pa.array(out_t, type=pa.string()),
                "approx_users": pa.array(out_n, type=pa.int64()),
            }
        )

    return by_type.map_batches(
        merge_estimate, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# SCD Type-2 interval history (CDC dimension-history form)
# ---------------------------------------------------------------------------


def q_scd2_history(sf_dir: str):
    """SCD Type-2 interval build over the change stream: every change
    event becomes a VERSION row with its validity interval in commit
    space — ``version_no`` (1-based per key), ``valid_to_seq`` = the
    next change's commit_seq (-1 while open), ``is_current`` = open AND
    not a tombstone. This is the dimension-history table a warehouse
    keeps next to the LWW head (the reference replays only the head,
    MarketoUtils incremental-import ordering; the interval form is the
    standard CDC consumer of the same per-key order).

    Shape: 4-column pruned read, ONE keyed exchange on (repo, path),
    then a single vectorized kernel per block — sort, run detection,
    shifted-by-one lead, run-relative ordinals. A key's history is
    contiguous after the in-block sort, so lead() is "next row unless a
    new key starts there"; no window library, no global sort, no
    per-key Python."""
    ds = _read_events(columns=["repo", "path", "commit_seq", "op"])
    out_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit_seq", pa.int64()),
            ("op", pa.string()),
            ("version_no", pa.int64()),
            ("valid_to_seq", pa.int64()),
            ("is_current", pa.int64()),
        ]
    )

    def intervals(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit_seq", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        path = np.asarray(t.column("path"), dtype=object)
        seq = np.asarray(t.column("commit_seq"), dtype=np.int64)
        op = np.asarray(t.column("op"), dtype=object)
        n = len(seq)
        new_key = np.r_[True, (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])]
        starts = np.flatnonzero(new_key)
        version_no = (
            np.arange(n, dtype=np.int64)
            - np.repeat(starts, np.diff(np.r_[starts, n]))
            + 1
        )
        run_end = np.r_[new_key[1:], True]
        lead_seq = np.empty(n, dtype=np.int64)
        lead_seq[:-1] = seq[1:]
        lead_seq[-1] = -1
        valid_to = np.where(run_end, np.int64(-1), lead_seq)
        is_current = (run_end & (op != "delete")).astype(np.int64)
        return pa.table(
            {
                "repo": t.column("repo"),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                "op": t.column("op"),
                "version_no": pa.array(version_no, type=pa.int64()),
                "valid_to_seq": pa.array(valid_to, type=pa.int64()),
                "is_current": pa.array(is_current, type=pa.int64()),
            }
        )

    return _keyed_exchange_apply(ds, ["repo", "path"], intervals, out_schema)


RETENTION_KEEP_N = 3  # newest versions kept per key (lake cleaner policy)


def q_version_retention(sf_dir: str):
    """Changelog retention (the Hudi/Iceberg "cleaner" policy): keep
    only the newest ``RETENTION_KEEP_N`` versions per (repo, path) —
    ``rn`` = 1 for the head, 2 for its parent, ... This generalizes
    LWW (which is the K=1 case, stages/lww.py) to K-version retention:
    the pruning a lake applies to bound time-travel history.

    Same single-exchange shape as q_scd2_history, but the kernel sorts
    commit_seq DESCENDING so the run-relative ordinal IS the
    newest-first rank, then filters rank <= K in-block — rows beyond
    the retention window never leave the kernel."""
    ds = _read_events(columns=["repo", "path", "commit_seq"])
    out_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit_seq", pa.int64()),
            ("rn", pa.int64()),
        ]
    )

    def newest_k(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit_seq", "descending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        path = np.asarray(t.column("path"), dtype=object)
        n = t.num_rows
        new_key = np.r_[True, (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])]
        starts = np.flatnonzero(new_key)
        rn = (
            np.arange(n, dtype=np.int64)
            - np.repeat(starts, np.diff(np.r_[starts, n]))
            + 1
        )
        keep = rn <= RETENTION_KEEP_N
        kept = t.filter(pa.array(keep))
        return pa.table(
            {
                "repo": kept.column("repo"),
                "path": kept.column("path"),
                "commit_seq": kept.column("commit_seq"),
                "rn": pa.array(rn[keep], type=pa.int64()),
            }
        )

    return _keyed_exchange_apply(ds, ["repo", "path"], newest_k, out_schema)


# ---------------------------------------------------------------------------
# Data-quality audit (write-audit-publish constraint report)
# ---------------------------------------------------------------------------


def q_dq_audit(sf_dir: str):
    """Constraint audit over the warehouse tables — the "audit" half of
    write-audit-publish: per named check, the count of violating rows.
    Checks: null key attribute (customer.c_name), domain violation
    (lineitem.l_quantity <= 0), key-uniqueness violation (duplicate
    orders.o_orderkey values), and referential orphans (orders whose
    o_custkey has no customer row).

    Shape: every check folds to (check_name, bad_rows) partial rows
    IN-BLOCK — one row per block per check — so the only data that
    moves is the per-block counters; the final merge is one tiny keyed
    sum. The orphan check broadcasts the dimension's sorted key array
    (``ray.put`` once, worker-local zero-copy views — the small side
    never re-ships per batch); the uniqueness check is the only keyed
    exchange, two-phase on o_orderkey so the shuffle payload is
    distinct keys x blocks, then its dup count folds to partial rows
    like the rest. No check materializes data on the driver."""
    _ensure_hash_shuffle()

    def partial_rows(name: str):
        def wrap(count_fn):
            def fn(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "check_name": pa.array([name], type=pa.string()),
                        "bad_rows": pa.array([int(count_fn(batch))], type=pa.int64()),
                    }
                )

            return fn

        return wrap

    null_name = _read(sf_dir, "customer", columns=["c_name"]).map_batches(
        partial_rows("customer_null_name")(
            lambda b: b.column("c_name").null_count
        ),
        batch_format="pyarrow",
    )
    bad_qty = _read(sf_dir, "lineitem", columns=["l_quantity"]).map_batches(
        partial_rows("lineitem_nonpositive_qty")(
            lambda b: pc.sum(
                pc.less_equal(b.column("l_quantity"), pa.scalar(0.0)).cast(pa.int64())
            ).as_py()
            or 0
        ),
        batch_format="pyarrow",
    )

    cust_keys = np.sort(
        np.asarray(
            pq.read_table(_t(sf_dir, "customer"), columns=["c_custkey"]).column(
                "c_custkey"
            )
        )
    )
    keys_ref = ray.put(cust_keys)

    def orphan_count(batch: pa.Table) -> int:
        keys = ray.get(keys_ref)
        ck = np.asarray(batch.column("o_custkey"), dtype=np.int64)
        pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        return int(np.count_nonzero(keys[pos] != ck))

    orphans = _read(sf_dir, "orders", columns=["o_custkey"]).map_batches(
        partial_rows("orders_orphan_custkey")(orphan_count),
        batch_format="pyarrow",
    )

    key_counts = grouped_aggregate(
        _read(sf_dir, "orders", columns=["o_orderkey"]),
        ["o_orderkey"],
        [("o_orderkey", "count", "cnt")],
    )
    dup_keys = key_counts.map_batches(
        partial_rows("orders_dup_orderkey")(
            lambda b: pc.sum(
                pc.greater(b.column("cnt"), pa.scalar(1)).cast(pa.int64())
            ).as_py()
            or 0
        ),
        batch_format="pyarrow",
    )

    # the partial stream is bounded by checks x blocks (one row per
    # block per check), so the merge is a driver fold — the bounded-
    # domain histogram idiom, not an exchange. Each check executes as
    # its own dataset: Dataset.union costs ~0.5 s of non-streaming
    # per-input overhead in Ray 2.49, which dominated these four tiny
    # counter streams (measured 2.1 s -> 0.6 s for the whole audit)
    totals: dict[str, int] = {}
    for branch in (null_name, bad_qty, orphans, dup_keys):
        for r in branch.take_all():
            totals[r["check_name"]] = totals.get(r["check_name"], 0) + int(r["bad_rows"])
    names = sorted(totals)
    return pa.table(
        {
            "check_name": pa.array(names, type=pa.string()),
            "bad_rows": pa.array([totals[n] for n in names], type=pa.int64()),
        }
    )


ROLLUP_ALL = "(all)"  # rollup-level marker (oracle coalesces NULL to it)


def q_lineitem_rollup_levels(sf_dir: str):
    """GROUP BY ROLLUP (multi-level aggregate): per (l_returnflag,
    l_linestatus), per l_returnflag, and grand total — count and exact
    integer quantity sum, subtotal rows marked ``(all)``. The rollup
    levels are DERIVED FROM THE LEAF GRID, never by rescanning: one
    two-phase aggregate produces the |flag x status| leaf (shuffle
    payload = group domain x blocks), then a single-block kernel folds
    the leaf upward — at any scale the fold input is the leaf domain,
    a few dozen rows."""
    _ensure_hash_shuffle()
    ds = _read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "l_returnflag": batch.column("l_returnflag"),
                "l_linestatus": batch.column("l_linestatus"),
                "l_quantity": batch.column("l_quantity").cast(pa.int64()),
            }
        )
        out = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [([], "count_all"), ("l_quantity", "sum")]
        )
        return out.rename_columns(
            ["l_returnflag", "l_linestatus", "n_rows", "sum_qty"]
        )

    leaf = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        [("n_rows", "sum", "n_rows"), ("sum_qty", "sum", "sum_qty")],
    )

    def fold_levels(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        flag_level = (
            block.group_by(["l_returnflag"])
            .aggregate([("n_rows", "sum"), ("sum_qty", "sum")])
            .rename_columns(["l_returnflag", "n_rows", "sum_qty"])
        )
        flag_level = flag_level.add_column(
            1,
            "l_linestatus",
            pa.array([ROLLUP_ALL] * flag_level.num_rows, type=pa.string()),
        )
        total = pa.table(
            {
                "l_returnflag": pa.array([ROLLUP_ALL], type=pa.string()),
                "l_linestatus": pa.array([ROLLUP_ALL], type=pa.string()),
                "n_rows": pa.array(
                    [pc.sum(block.column("n_rows")).as_py()], type=pa.int64()
                ),
                "sum_qty": pa.array(
                    [pc.sum(block.column("sum_qty")).as_py()], type=pa.int64()
                ),
            }
        )
        cols = ["l_returnflag", "l_linestatus", "n_rows", "sum_qty"]
        return pa.concat_tables(
            [block.select(cols), flag_level.select(cols), total.select(cols)]
        )

    return leaf.repartition(1).map_batches(
        fold_levels, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# TPC-H Q3 shape: broadcast semi-filter + large-large join + global top-k
# ---------------------------------------------------------------------------

Q3_SEGMENT = "BUILDING"
Q3_CUT = np.datetime64("1998-06-01", "us")
Q3_TOP_K = 10


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority report): top-k open orders of
    one market segment by outstanding revenue — a THREE-table pipeline
    composing the catalog's join strategies by side size:

    - customer (small side) collapses to a sorted ``c_custkey`` array
      broadcast once via ``ray.put`` — the orders scan semi-filters
      against it with ``np.searchsorted``; no exchange for this join
      (the J3 idiom, sized like every budgeted small-side attach).
    - orders x lineitem (neither side broadcastable at 100 TB) rides
      ONE tagged-union keyed exchange co-partitioned on the order key —
      the Q12 idiom (q_order_priority_report) — with both sides
      predicate-filtered AT THE SCAN (orders before the cut date,
      lineitems shipped after it) so only qualifying rows move.
    - revenue folds per order INSIDE the join kernel (each key's run is
      whole in its block), then the global top-k is per-block top-k +
      one driver merge of <= k x blocks rows — never a global sort
      (the vocab_topk idiom, O1/O2).

    Revenue stays INTEGER-EXACT for the value-hash gate: cents x
    (100 - discount%), both factors rounded from the double columns at
    the scan, summed as int64 (`revenue_c100`).
    """
    _ensure_hash_shuffle()
    cust = pq.read_table(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_mktsegment"]
    )
    seg_keys = np.sort(
        np.asarray(
            pc.filter(
                cust.column("c_custkey"),
                pc.equal(cust.column("c_mktsegment"), pa.scalar(Q3_SEGMENT)),
            )
        )
    )
    keys_ref = ray.put(seg_keys)

    union_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("o_orderdate", pa.timestamp("us")),
            ("rev_c", pa.int64()),
        ]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate")
        keep = pc.less(odate, pa.scalar(Q3_CUT.item(), type=pa.timestamp("us")))
        t = batch.filter(keep)
        ck = np.asarray(t.column("o_custkey"), dtype=np.int64)
        keys = ray.get(keys_ref)  # worker-local zero-copy view
        if len(keys):
            pos = np.minimum(np.searchsorted(keys, ck), len(keys) - 1)
            hit = keys[pos] == ck
        else:
            hit = np.zeros(len(ck), dtype=bool)
        t = t.filter(pa.array(hit))
        n = t.num_rows
        return pa.table(
            {
                "okey": t.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "o_orderdate": t.column("o_orderdate"),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=union_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        keep = pc.greater(
            batch.column("l_shipdate"),
            pa.scalar(Q3_CUT.item(), type=pa.timestamp("us")),
        )
        t = batch.filter(keep)
        n = t.num_rows
        cents = np.rint(
            np.asarray(t.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(t.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "okey": t.column("l_orderkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "o_orderdate": pa.nulls(n, type=pa.timestamp("us")),
                "rev_c": pa.array(cents * (100 - disc)),
            },
            schema=union_schema,
        )

    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    lineitem = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    tagged = orders.map_batches(order_rows, batch_format="pyarrow").union(
        lineitem.map_batches(line_rows, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("l_orderkey", pa.int64()),
            ("revenue_c100", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
        ]
    )

    def join_topk(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        rev = np.asarray(pc.fill_null(t.column("rev_c"), 0), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        # inner join: a run qualifies iff its first row is an order row
        # (order rows sort first via side) AND it has >= 1 lineitem row
        has_order = side[starts] == 0
        # revenue per run = sum of lineitem rev (order rows carry 0)
        run_rev = np.add.reduceat(rev, starts)
        keep = has_order & (run_rev > 0)
        if not keep.any():
            return out_schema.empty_table()
        okeys = key[starts][keep]
        revs = run_rev[keep]
        odates = t.column("o_orderdate").take(pa.array(starts[keep]))
        part = pa.table(
            {
                "l_orderkey": pa.array(okeys),
                "revenue_c100": pa.array(revs),
                "o_orderdate": odates,
            },
            schema=out_schema,
        )
        if part.num_rows <= Q3_TOP_K:
            return part
        top = pc.sort_indices(
            part,
            sort_keys=[("revenue_c100", "descending"), ("l_orderkey", "ascending")],
        )
        return part.take(top.slice(0, Q3_TOP_K))

    parts = _keyed_exchange_apply(
        tagged, ["okey"], join_topk, out_schema
    ).take_all()  # bounded: <= Q3_TOP_K rows per block
    if not parts:
        return out_schema.empty_table()
    merged = pa.Table.from_pylist(parts, schema=out_schema)
    order = pc.sort_indices(
        merged,
        sort_keys=[("revenue_c100", "descending"), ("l_orderkey", "ascending")],
    )
    return merged.take(order.slice(0, Q3_TOP_K))


def q_cdc_before_image(sf_dir: str):
    """Debezium-style BEFORE-IMAGE change feed: every change event
    annotated with the version it replaced — ``prev_commit`` (the prior
    version's commit id, '' for a key's first event) and ``prev_seq``
    (-1 for the first). Downstream CDC consumers need the before image
    to invert updates (build reverse deltas, maintain subtractable
    aggregates); the reference's incremental import emits only the
    after image (MarketoUtils ordering), so this is the standard
    consumer-side derivation over the same per-key order.

    Same single-exchange shape as q_scd2_history: 5-column pruned read,
    ONE keyed (repo, path) exchange, then a sort + run-detect +
    shift-by-one kernel per block — lag() semantics with no window
    library, no global sort, no per-row Python."""
    ds = _read_events(columns=["repo", "path", "commit_seq", "op", "commit"])
    out_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit_seq", pa.int64()),
            ("op", pa.string()),
            ("commit", pa.string()),
            ("prev_commit", pa.string()),
            ("prev_seq", pa.int64()),
        ]
    )

    def lag_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit_seq", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        path = np.asarray(t.column("path"), dtype=object)
        seq = np.asarray(t.column("commit_seq"), dtype=np.int64)
        commit = np.asarray(t.column("commit"), dtype=object)
        n = len(seq)
        new_key = np.r_[True, (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])]
        prev_commit = np.empty(n, dtype=object)
        prev_commit[0] = ""
        prev_commit[1:] = commit[:-1]
        prev_commit[new_key] = ""
        prev_seq = np.empty(n, dtype=np.int64)
        prev_seq[0] = -1
        prev_seq[1:] = seq[:-1]
        prev_seq[new_key] = -1
        return pa.table(
            {
                "repo": t.column("repo"),
                "path": t.column("path"),
                "commit_seq": t.column("commit_seq"),
                "op": t.column("op"),
                "commit": t.column("commit"),
                "prev_commit": pa.array(prev_commit, type=pa.string()),
                "prev_seq": pa.array(prev_seq, type=pa.int64()),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(ds, ["repo", "path"], lag_kernel, out_schema)


def q_incremental_view(sf_dir: str):
    """Incremental MATERIALIZED-VIEW maintenance (the Materialize /
    Delta Live Tables contract on top of the exactly-once lake): a
    per-repo aggregate view — live-file count ``n_live`` + the
    SUBTRACTABLE checksum ``sum_head_seq`` (sum of live heads'
    commit_seq) — built once from window 1's snapshot and then
    MAINTAINED through window 2 from the state diff alone. Window 2
    never rescans the lake: ``snapshot_diff`` (zero shuffle, one task
    per bucket, pruned to key + commit_seq) yields exactly the changed
    keys with old/new versions, each diff block folds in-block to
    per-repo deltas (added +1/+new, deleted -1/-old, modified
    +new-old), and one tiny keyed aggregate merges base + deltas —
    payload bounded by #repos x blocks, never rows.

    The oracle recomputes the view FULLY from the raw event stream, so
    a green row proves the incremental algebra (the hard part of view
    maintenance) end-to-end through two watermark windows, the delta
    lake layout, and the diff classification."""
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake, snapshot_diff

    n = CDC_QUERY_EVENTS
    lake, (r1, r2) = _replay_windows([n // 2, n + 50])

    part_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("n_live", pa.int64()),
            ("sum_head_seq", pa.int64()),
        ]
    )

    def base_fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        agg = block.group_by(["repo"]).aggregate(
            [([], "count_all"), ("commit_seq", "sum")]
        )
        return pa.table(
            {
                "repo": agg.column("repo"),
                "n_live": agg.column("count_all").cast(pa.int64()),
                "sum_head_seq": agg.column("commit_seq_sum").cast(pa.int64()),
            },
            schema=part_schema,
        )

    base = read_lake(lake, columns=["repo", "commit_seq"], as_of=r1["to"]).map_batches(
        base_fold, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def delta_fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        old = np.asarray(
            pc.fill_null(block.column("old_seq"), 0), dtype=np.int64
        )
        new = np.asarray(
            pc.fill_null(block.column("new_seq"), 0), dtype=np.int64
        )
        kind = np.asarray(block.column("change_kind"), dtype=object)
        dn = np.where(kind == "added", 1, np.where(kind == "deleted", -1, 0))
        t = pa.table(
            {
                "repo": block.column("repo"),
                "n_live": pa.array(dn.astype(np.int64)),
                "sum_head_seq": pa.array(new - old),
            },
            schema=part_schema,
        )
        agg = t.group_by(["repo"]).aggregate(
            [("n_live", "sum"), ("sum_head_seq", "sum")]
        )
        return agg.rename_columns(["repo", "n_live", "sum_head_seq"])

    deltas = snapshot_diff(lake, v1=r1["to"], v2=r2["to"]).map_batches(
        delta_fold, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    merged = grouped_aggregate(
        base.union(deltas),
        ["repo"],
        [("n_live", "sum", "n_live"), ("sum_head_seq", "sum", "sum_head_seq")],
    )
    # a repo whose last live file was deleted in window 2 folds to
    # n_live == 0 — it has left the view (the full recompute never
    # emits it)
    return merged.map_batches(
        lambda t: t.filter(pc.greater(t.column("n_live"), pa.scalar(0))),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: chained LARGE x LARGE joins (customer -> orders ->
# lineitem) with dimension broadcasts
# ---------------------------------------------------------------------------

Q5_REGION = "ASIA"
Q5_FROM = np.datetime64("1996-01-01", "us")
Q5_TO = np.datetime64("1998-01-01", "us")
# supplier -> nation map broadcast budget: the map is two int arrays
# (8 B key + 4 B nation per supplier). TPC-H supplier is 1/15th of
# customer and 1/600th of lineitem, so it broadcasts comfortably at
# any realistic scale (1e8 suppliers ~= 1.2 GB); past the budget the
# query refuses loudly rather than silently OOMing the workers - the
# remedy (a third tagged-union exchange keyed on l_suppkey) is noted
# in the raise.
Q5_SUPPLIER_BROADCAST_BUDGET = 512 << 20


def _attach_supplier_nation(sf_dir: str, line_payload, payload_schema: pa.Schema):
    """Attach the supplier's nation to a prepared lineitem-side stream —
    the shared supplier-dimension join of the Q5/Q7/Q8 shapes, chosen
    budget-adaptively (the keep_best anti-join idiom):

    - ``line_payload``: Dataset with schema ``(skey:int64, <payload>)``
      (skey = l_suppkey; payload = the narrowest carry-through columns).
    - returns: Dataset with schema ``(supp_nation:int64, <payload>)``;
      rows whose skey misses the supplier dimension are DROPPED
      (inner-join semantics, matching the SQL oracles).

    Under ``Q5_SUPPLIER_BROADCAST_BUDGET`` the sorted (s_suppkey ->
    s_nationkey) arrays ship ONCE via ray.put and attach in-block.
    Past it — at 100x TPC-H scale supplier stops being a broadcastable
    dimension — the attach rides a THIRD tagged-union keyed exchange
    on the supplier key: supplier rows (side 0) union lineitem payload
    rows (side 1), co-partitioned on skey, and a run-gather kernel
    stamps each payload row with its run's supplier nation. Payload
    stays the narrowest projection, so exchange traffic is ∝ the
    already-pruned lineitem stream, never the raw fact table."""
    out_schema = pa.schema(
        [("supp_nation", pa.int64())]
        + [payload_schema.field(i) for i in range(len(payload_schema))]
    )
    sup_path = _t(sf_dir, "supplier")
    if os.path.getsize(sup_path) <= Q5_SUPPLIER_BROADCAST_BUDGET:
        sup = pq.read_table(sup_path, columns=["s_suppkey", "s_nationkey"])
        sup = sup.take(pc.sort_indices(sup, sort_keys=[("s_suppkey", "ascending")]))
        sup_ref = ray.put(
            (
                np.asarray(sup.column("s_suppkey"), dtype=np.int64),
                np.asarray(sup.column("s_nationkey"), dtype=np.int64),
            )
        )

        def attach(batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return out_schema.empty_table()
            sk = np.asarray(batch.column("skey"), dtype=np.int64)
            skeys, snats = ray.get(sup_ref)
            if len(skeys):
                pos = np.minimum(np.searchsorted(skeys, sk), len(skeys) - 1)
                hit = skeys[pos] == sk
                nat = snats[pos]
            else:
                hit = np.zeros(len(sk), dtype=bool)
                nat = np.zeros(len(sk), dtype=np.int64)
            t = batch.filter(pa.array(hit))
            cols = {"supp_nation": pa.array(nat[hit], type=pa.int64())}
            for name in payload_schema.names:
                cols[name] = t.column(name)
            return pa.table(cols, schema=out_schema)

        return line_payload.map_batches(attach, batch_format="pyarrow")

    u_schema = pa.schema(
        [("skey", pa.int64()), ("side", pa.int8()), ("nation", pa.int64())]
        + [payload_schema.field(i) for i in range(len(payload_schema))]
    )

    def supplier_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "skey": batch.column("s_suppkey").cast(pa.int64()),
            "side": pa.array(np.zeros(n, dtype=np.int8)),
            "nation": batch.column("s_nationkey").cast(pa.int64()),
        }
        for i, name in enumerate(payload_schema.names):
            cols[name] = pa.nulls(n, type=payload_schema.types[i])
        return pa.table(cols, schema=u_schema)

    def payload_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {
            "skey": batch.column("skey").cast(pa.int64()),
            "side": pa.array(np.ones(n, dtype=np.int8)),
            "nation": pa.nulls(n, type=pa.int64()),
        }
        for name in payload_schema.names:
            cols[name] = batch.column(name)
        return pa.table(cols, schema=u_schema)

    sup_ds = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    tagged = sup_ds.map_batches(supplier_rows, batch_format="pyarrow").union(
        line_payload.map_batches(payload_rows, batch_format="pyarrow")
    )

    def gather_supp(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("skey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("skey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        nat_v = np.asarray(pc.fill_null(t.column("nation"), -1), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        has_sup = side[starts] == 0
        run_nat = np.where(has_sup, nat_v[starts], -1)
        row_nat = run_nat[run_idx]
        keep = (side == 1) & (row_nat >= 0)
        if not keep.any():
            return out_schema.empty_table()
        sel = t.filter(pa.array(keep))
        cols = {"supp_nation": pa.array(row_nat[keep], type=pa.int64())}
        for name in payload_schema.names:
            cols[name] = sel.column(name)
        return pa.table(cols, schema=out_schema)

    return _keyed_exchange_apply(tagged, ["skey"], gather_supp, out_schema)


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 shape (local-supplier volume): revenue per nation of one
    region from lineitems where the SUPPLIER's nation equals the
    CUSTOMER's nation - the catalog's deepest join pipeline, composing
    every join strategy by side size across TWO chained big-big
    exchanges (no single-exchange trick exists: the customer attribute
    must travel customer -> orders -> lineitem across two different
    keys).

    - region/nation (25 rows) resolve driver-side to a nation-key set;
      customers are filtered to it AT THE SCAN.
    - customer x orders (neither broadcastable at 100 TB) ride
      tagged-union exchange #1 co-partitioned on the CUSTOMER key; the
      run-gather kernel stamps each order with its customer's nation
      and emits only (okey, cust_nation) - the narrowest possible
      carry-through.
    - that stream x lineitem ride tagged-union exchange #2 on the
      ORDER key; supplier nations attach via ``_attach_supplier_nation``
      (broadcast under Q5_SUPPLIER_BROADCAST_BUDGET, a third keyed
      exchange on l_suppkey past it), so the local-supplier filter
      (supp_nation == cust_nation) and the revenue fold happen inside
      the join kernel - each block leaves <= |nations| partial rows.
    - the final aggregate is a tiny keyed merge; nation names attach
      driver-side to the <= 25-row result.

    Revenue is INTEGER-EXACT (cents x (100 - discount%), summed int64;
    the Q3 idiom) so the value-hash gate is bit-stable. Ref: the
    reference's fetch-join composes only one parent level
    (MarketoService.java getListsByIds -> per-parent streams); this is
    the two-level generalization its users hand-roll downstream.
    """
    _ensure_hash_shuffle()
    nation = pq.read_table(_t(sf_dir, "nation"))
    region = pq.read_table(_t(sf_dir, "region"))
    rkey = pc.filter(
        region.column("r_regionkey"),
        pc.equal(region.column("r_name"), pa.scalar(Q5_REGION)),
    )
    rkeys = set(np.asarray(rkey).tolist())
    in_region = pa.array(
        [int(k) in rkeys for k in np.asarray(nation.column("n_regionkey"))]
    )
    nat = nation.filter(in_region)
    nation_keys = np.sort(np.asarray(nat.column("n_nationkey"), dtype=np.int64))
    nation_names = {
        int(k): str(v)
        for k, v in zip(
            np.asarray(nat.column("n_nationkey")), nat.column("n_name").to_pylist()
        )
    }
    nation_keys_ref = ray.put(nation_keys)

    # ---- exchange #1: customer x orders on the customer key ----------
    u1_schema = pa.schema(
        [
            ("ckey", pa.int64()),
            ("side", pa.int8()),
            ("nation", pa.int64()),
            ("okey", pa.int64()),
        ]
    )

    def customer_rows(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
        keys = ray.get(nation_keys_ref)
        if len(keys):
            pos = np.minimum(np.searchsorted(keys, nk), len(keys) - 1)
            hit = keys[pos] == nk
        else:
            hit = np.zeros(len(nk), dtype=bool)
        t = batch.filter(pa.array(hit))
        n = t.num_rows
        return pa.table(
            {
                "ckey": t.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nation": t.column("c_nationkey").cast(pa.int64()),
                "okey": pa.nulls(n, type=pa.int64()),
            },
            schema=u1_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        odate = batch.column("o_orderdate")
        keep = pc.and_(
            pc.greater_equal(odate, pa.scalar(Q5_FROM.item(), type=pa.timestamp("us"))),
            pc.less(odate, pa.scalar(Q5_TO.item(), type=pa.timestamp("us"))),
        )
        t = batch.filter(keep)
        n = t.num_rows
        return pa.table(
            {
                "ckey": t.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "nation": pa.nulls(n, type=pa.int64()),
                "okey": t.column("o_orderkey").cast(pa.int64()),
            },
            schema=u1_schema,
        )

    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    tagged1 = customer.map_batches(customer_rows, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    s1_schema = pa.schema([("okey", pa.int64()), ("cust_nation", pa.int64())])

    def gather_nation(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return s1_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        nat_v = np.asarray(pc.fill_null(t.column("nation"), -1), dtype=np.int64)
        okey_v = np.asarray(pc.fill_null(t.column("okey"), -1), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_has_cust = side[starts] == 0
        run_nation = np.where(run_has_cust, nat_v[starts], -1)
        row_nation = run_nation[run_idx]
        keep = (side == 1) & (row_nation >= 0)
        if not keep.any():
            return s1_schema.empty_table()
        return pa.table(
            {
                "okey": pa.array(okey_v[keep]),
                "cust_nation": pa.array(row_nation[keep]),
            },
            schema=s1_schema,
        )

    # exchange #1 rides the adaptive path: the fragment exchange past
    # 128 MiB of orders (the hash-shuffle operator floor), the hash
    # exchange mid-size, one block when small
    stage1 = _keyed_exchange_apply(tagged1, ["ckey"], gather_nation, s1_schema)

    # ---- exchange #2: stage1 x lineitem on the order key --------------
    u2_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("cust_nation", pa.int64()),
            ("supp_nation", pa.int64()),
            ("rev_c", pa.int64()),
        ]
    )

    def stage1_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "cust_nation": batch.column("cust_nation"),
                "supp_nation": pa.nulls(n, type=pa.int64()),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u2_schema,
        )

    line_pay_schema = pa.schema([("okey", pa.int64()), ("rev_c", pa.int64())])

    def line_payload(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "skey": batch.column("l_suppkey").cast(pa.int64()),
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "rev_c": pa.array(cents * (100 - disc)),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "cust_nation": pa.nulls(n, type=pa.int64()),
                "supp_nation": batch.column("supp_nation"),
                "rev_c": batch.column("rev_c"),
            },
            schema=u2_schema,
        )

    lineitem = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    attached = _attach_supplier_nation(
        sf_dir,
        lineitem.map_batches(line_payload, batch_format="pyarrow"),
        line_pay_schema,
    )
    tagged2 = stage1.map_batches(stage1_rows, batch_format="pyarrow").union(
        attached.map_batches(line_rows, batch_format="pyarrow")
    )

    part_schema = pa.schema([("nation", pa.int64()), ("revenue_c100", pa.int64())])

    def local_volume(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        cn = np.asarray(pc.fill_null(t.column("cust_nation"), -1), dtype=np.int64)
        sn = np.asarray(pc.fill_null(t.column("supp_nation"), -2), dtype=np.int64)
        rev = np.asarray(pc.fill_null(t.column("rev_c"), 0), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_has_order = side[starts] == 0
        run_nation = np.where(run_has_order, cn[starts], -1)
        row_cnation = run_nation[run_idx]
        keep = (side == 1) & (row_cnation >= 0) & (sn == row_cnation)
        if not keep.any():
            return part_schema.empty_table()
        part = pa.table(
            {
                "nation": pa.array(row_cnation[keep]),
                "revenue_c100": pa.array(rev[keep]),
            },
            schema=part_schema,
        )
        agg = part.group_by(["nation"]).aggregate([("revenue_c100", "sum")])
        return agg.rename_columns(["nation", "revenue_c100"])

    partial = _keyed_exchange_apply(tagged2, ["okey"], local_volume, part_schema)
    merged = grouped_aggregate(
        partial, ["nation"], [("revenue_c100", "sum", "revenue_c100")]
    )
    final = pa.Table.from_pylist(merged.take_all(), schema=part_schema)
    names = pa.array(
        [nation_names.get(int(k), "") for k in np.asarray(final.column("nation"))],
        type=pa.string(),
    )
    return pa.table(
        {"n_name": names, "revenue_c100": final.column("revenue_c100")}
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: aggregate -> HAVING filter -> join back to the fact
# ---------------------------------------------------------------------------

Q18_MIN_QTY = 300  # "large order" total-quantity threshold


def q_large_orders(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): orders whose lineitems sum
    to more than ``Q18_MIN_QTY`` units, annotated with the order header
    - the aggregate -> HAVING -> join-back-to-fact composition every
    warehouse runs (find heavy entities, then re-attach their
    attributes).

    Plan: (1) two-phase grouped aggregate over lineitem (in-block fold
    to one row per order BEFORE the exchange - the exchange moves
    partials, not lineitems); (2) the HAVING filter cuts the stream to
    the few qualifying orders; (3) the join back to orders rides ONE
    tagged-union keyed exchange on the order key (the Q12 idiom) - at
    100 TB the qualifying set is unbounded (a fixed FRACTION of
    orders), so no broadcast is assumed in either direction. Quantity
    sums are integer-exact (l_quantity is integral; rounded to int64 at
    the scan), and the order's total price rides as integer cents
    ``o_totalprice_c`` - no float ever crosses an exchange or reaches
    the value-hash gate."""
    _ensure_hash_shuffle()

    qty_schema = pa.schema([("okey", pa.int64()), ("qty", pa.int64())])

    def qty_rows(batch: pa.Table) -> pa.Table:
        q = np.rint(np.asarray(batch.column("l_quantity"), dtype=np.float64)).astype(
            np.int64
        )
        return pa.table(
            {"okey": batch.column("l_orderkey").cast(pa.int64()), "qty": pa.array(q)},
            schema=qty_schema,
        )

    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    totals = grouped_aggregate(
        lineitem.map_batches(qty_rows, batch_format="pyarrow"),
        ["okey"],
        [("qty", "sum", "total_qty")],
    )
    heavy = totals.map_batches(
        lambda t: t.filter(pc.greater(t.column("total_qty"), pa.scalar(Q18_MIN_QTY))),
        batch_format="pyarrow",
    )

    u_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("total_qty", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice_c", pa.int64()),
        ]
    )

    def heavy_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "total_qty": batch.column("total_qty"),
                "o_custkey": pa.nulls(n, type=pa.int64()),
                "o_orderdate": pa.nulls(n, type=pa.timestamp("us")),
                "o_totalprice_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cents = np.rint(
            np.asarray(batch.column("o_totalprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "total_qty": pa.nulls(n, type=pa.int64()),
                "o_custkey": batch.column("o_custkey").cast(pa.int64()),
                "o_orderdate": batch.column("o_orderdate"),
                "o_totalprice_c": pa.array(cents),
            },
            schema=u_schema,
        )

    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    tagged = heavy.map_batches(heavy_rows, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    out_schema = pa.schema(
        [
            ("o_orderkey", pa.int64()),
            ("o_custkey", pa.int64()),
            ("o_orderdate", pa.timestamp("us")),
            ("o_totalprice_c", pa.int64()),
            ("total_qty", pa.int64()),
        ]
    )

    def join_back(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        qty = np.asarray(pc.fill_null(t.column("total_qty"), -1), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_is_heavy = side[starts] == 0
        run_qty = np.where(run_is_heavy, qty[starts], -1)
        row_qty = run_qty[run_idx]
        keep = (side == 1) & (row_qty >= 0)
        if not keep.any():
            return out_schema.empty_table()
        mask = pa.array(keep)
        return pa.table(
            {
                "o_orderkey": pa.array(key[keep]),
                "o_custkey": t.column("o_custkey").filter(mask),
                "o_orderdate": t.column("o_orderdate").filter(mask),
                "o_totalprice_c": t.column("o_totalprice_c").filter(mask),
                "total_qty": pa.array(row_qty[keep]),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(tagged, ["okey"], join_back, out_schema)


# ---------------------------------------------------------------------------
# k-means assignment over embeddings (integer-exact, SQL-replicable)
# ---------------------------------------------------------------------------

KMEANS_K = 8
# quantization scale: a POWER OF TWO so float32 * scale is exact in
# float64 on BOTH sides (numpy here, DuckDB's DOUBLE promotion in the
# oracle) and floor() of the identical double is identical - no
# rounding-mode or tie ambiguity can split the implementations.
KMEANS_SCALE = 8192.0


def _kmeans_seed_centroids(sf_dir: str) -> np.ndarray:
    """Deterministic seed-centroid matrix (K x dim int64, quantized):
    the K lowest-vec_id vectors, found WITHOUT materializing the
    corpus - a vec_id-only pruned read folds per-block bottom-K, the
    driver merges <= K x blocks ids, and one row-group-pruned point
    read fetches the K vectors."""
    ids = _read(sf_dir, "embeddings", columns=["vec_id"])

    def bottom_k(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[("vec_id", "ascending")])
        return batch.take(order.slice(0, KMEANS_K))

    parts = ids.map_batches(bottom_k, batch_format="pyarrow").take_all()
    seed_ids = sorted(int(r["vec_id"]) for r in parts)[:KMEANS_K]

    cent_tbl = (
        pads.dataset(_t(sf_dir, "embeddings"))
        .to_table(
            columns=["vec_id", "embedding"],
            filter=pc.field("vec_id").isin(seed_ids),
        )
        .sort_by([("vec_id", "ascending")])
    )
    return np.floor(
        list_column_matrix(cent_tbl.column("embedding")) * KMEANS_SCALE
    ).astype(np.int64)


def q_embedding_kmeans(sf_dir: str):
    """Nearest-centroid (one k-means assignment step) over the embedding
    corpus, INTEGER-EXACT end to end: vectors quantize to an int64 grid
    (floor(x * 8192); see KMEANS_SCALE for why the result is bit-
    identical to the SQL replica), centroids are the K lowest-vec_id
    vectors (the deterministic seeding k-means++ implementations use
    for their first pass), and each vector's cluster is the argmin of
    exact integer squared Euclidean distance, ties to the lower
    centroid rank.

    Scale shape: centroid SELECTION never materializes the corpus -
    a vec_id-only pruned read folds per-block bottom-K, the driver
    merges <= K x blocks ids (the vocab-topk idiom), and ONE
    row-group-pruned point read fetches the K centroid vectors. The
    K x dim int64 centroid matrix broadcasts once (``ray.put``); the
    corpus then STREAMS through a task map whose kernel is one integer
    matmul per batch (distances via |x|^2 - 2x.c + |c|^2; numpy routes
    int64 matmul through exact non-BLAS loops). No exchange at all -
    assignment is embarrassingly parallel; the iterative-refinement
    extension folds per-cluster int sums per block and merges K rows
    driver-side per round. Ref parity: the reference has no vector
    ops; this extends the ANN family (SURVEY.md 'beyond-reference')."""
    _ensure_hash_shuffle()
    cmat = _kmeans_seed_centroids(sf_dir)
    cent_ref = ray.put((cmat, (cmat * cmat).sum(axis=1)))

    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("cluster", pa.int64()),
            ("sq_dist", pa.int64()),
        ]
    )

    def assign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        C, c_sq = ray.get(cent_ref)
        X = np.floor(list_column_matrix(batch.column("embedding")) * KMEANS_SCALE).astype(
            np.int64
        )
        x_sq = (X * X).sum(axis=1)
        # exact int64 distances; argmin's first-occurrence rule = ties
        # to the lower centroid rank, matching the oracle's row_number
        d = x_sq[:, None] - 2 * (X @ C.T) + c_sq[None, :]
        cluster = np.argmin(d, axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cluster": pa.array(cluster.astype(np.int64)),
                "sq_dist": pa.array(d[np.arange(len(cluster)), cluster]),
            },
            schema=out_schema,
        )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return emb.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# graph analytics: triangle counting over the co-change graph
# ---------------------------------------------------------------------------


def q_cochange_triangles(sf_dir: str):
    """Per-node TRIANGLE COUNTS over the co-change graph (nodes =
    (repo, path), edges = pairs with >= CO_CHANGE_MIN_WINDOWS shared
    change windows): how many tightly-coupled file TRIPLES each file
    participates in — the classic graph-analytics kernel (clustering
    coefficient numerator, community seeding).

    Distributed node-iterator shape, deliberately NOT relying on "all
    of a repo's edges fit one block" (q_co_change_pairs' repo exchange
    guarantees co-residence at testdata scale, but a monorepo breaks
    it):

    - wedges form on exchange #1 keyed by the edge's LEXICOGRAPHIC-LOW
      endpoint: each triangle {a<b<c} is generated exactly once, as
      the wedge (b,c) at apex a, so no triangle is double-counted and
      apex fan-out is O(d_low^2) (the degree-ordering refinement -
      emit at the lower-DEGREE endpoint - drops in here if hubs skew;
      noted, not needed at fixture scale);
    - exchange #2 is the tagged-union edge-existence probe keyed on
      the wedge pair (repo, v, w) - the Q12 run-gather idiom: a run
      whose first row is an edge row confirms every wedge row behind
      it as a triangle;
    - each confirmed triangle folds +1 onto all THREE corners in-block
      (arrow group_by), and one tiny keyed aggregate merges partials -
      the exchange payload is (repo, path, count) partials, bounded by
      nodes x blocks, never triangles.

    Oracle: the 3-way self-join of the co-change pair CTE in SQL."""
    _ensure_hash_shuffle()
    edges = q_co_change_pairs(sf_dir).select_columns(["repo", "path_a", "path_b"])

    wedge_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("v", pa.string()),
            ("w", pa.string()),
            ("apex", pa.string()),
        ]
    )

    def wedges(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return wedge_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path_a", "ascending"),
                ("path_b", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        a = np.asarray(t.column("path_a"), dtype=object)
        b = np.asarray(t.column("path_b"), dtype=object)
        new_run = np.r_[True, (repo[1:] != repo[:-1]) | (a[1:] != a[:-1])]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], len(repo)]
        rr, vv, ww, aa = [], [], [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            # neighbors of apex a[s] that sort after it; b[s:e] is
            # sorted, so i<j gives v<w directly
            i, j = np.triu_indices(g, k=1)
            rr.append(np.repeat(repo[s], len(i)))
            vv.append(b[s:e][i])
            ww.append(b[s:e][j])
            aa.append(np.repeat(a[s], len(i)))
        if not rr:
            return wedge_schema.empty_table()
        return pa.table(
            {
                "repo": pa.array(np.concatenate(rr), type=pa.string()),
                "v": pa.array(np.concatenate(vv), type=pa.string()),
                "w": pa.array(np.concatenate(ww), type=pa.string()),
                "apex": pa.array(np.concatenate(aa), type=pa.string()),
            },
            schema=wedge_schema,
        )

    by_low = _keyed_repartition(edges, _shuffle_width(), ["repo", "path_a"])
    wedge_ds = by_low.map_batches(
        wedges, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    u_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("v", pa.string()),
            ("w", pa.string()),
            ("side", pa.int8()),
            ("apex", pa.string()),
        ]
    )

    def edge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "repo": batch.column("repo"),
                "v": batch.column("path_a"),
                "w": batch.column("path_b"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "apex": pa.nulls(n, type=pa.string()),
            },
            schema=u_schema,
        )

    def wedge_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "repo": batch.column("repo"),
                "v": batch.column("v"),
                "w": batch.column("w"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "apex": batch.column("apex"),
            },
            schema=u_schema,
        )

    tagged = edges.map_batches(edge_rows, batch_format="pyarrow").union(
        wedge_ds.map_batches(wedge_rows, batch_format="pyarrow")
    )

    part_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("n_triangles", pa.int64()),
        ]
    )

    def confirm(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("v", "ascending"),
                ("w", "ascending"),
                ("side", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        v = np.asarray(t.column("v"), dtype=object)
        w = np.asarray(t.column("w"), dtype=object)
        side = np.asarray(t.column("side"), dtype=np.int8)
        new_run = np.r_[
            True,
            (repo[1:] != repo[:-1]) | (v[1:] != v[:-1]) | (w[1:] != w[:-1]),
        ]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_has_edge = side[starts] == 0
        tri = (side == 1) & run_has_edge[run_idx]
        if not tri.any():
            return part_schema.empty_table()
        apex = np.asarray(t.column("apex"), dtype=object)[tri]
        corners = pa.table(
            {
                "repo": pa.array(
                    np.concatenate([repo[tri]] * 3), type=pa.string()
                ),
                "path": pa.array(
                    np.concatenate([apex, v[tri], w[tri]]), type=pa.string()
                ),
            }
        )
        agg = corners.group_by(["repo", "path"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "repo": agg.column("repo"),
                "path": agg.column("path"),
                "n_triangles": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    partial = _keyed_exchange_apply(tagged, ["repo", "v", "w"], confirm, part_schema)
    return grouped_aggregate(
        partial, ["repo", "path"], [("n_triangles", "sum", "n_triangles")]
    )


# ---------------------------------------------------------------------------
# BPE vocabulary induction, step 1: adjacent character-pair statistics
# ---------------------------------------------------------------------------

BPE_TOP_K = 50
_BPE_A, _BPE_Z = 97, 122  # ascii 'a'..'z'


def q_bpe_pair_stats(sf_dir: str):
    """Corpus-wide adjacent CHARACTER-pair frequencies, top-K — the
    first merge-candidate scoring pass of BPE tokenizer training (the
    pair with the max count is the merge; iterating re-runs this scan
    over the re-paired corpus). Counted over lowercased ascii-alpha
    byte pairs; token boundaries need no special casing because any
    non-alpha byte (space, punctuation, utf-8 continuation) breaks
    adjacency by failing the alpha test.

    Scale shape: the per-batch kernel is three numpy passes over the
    RAW utf-8 byte stream of the batch's concatenated text (frombuffer
    -> range masks -> bincount on the 26x26 pair code) — no
    tokenization, no per-token loop, no string allocation beyond the
    one lowercase+join; each block folds to <= 676 partial rows, so
    the 'exchange' degenerates to a driver merge of a FIXED-DOMAIN
    histogram (the HH/quantile idiom — payload is the domain, never
    the corpus). Byte-level BPE over the full 256x256 domain is the
    same kernel with a 65,536-bin bincount."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["text"])

    part_schema = pa.schema([("code", pa.int64()), ("n", pa.int64())])

    def pair_hist(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(pc.fill_null(batch.column("text"), ""))
        joined = " ".join(texts.to_pylist())
        b = np.frombuffer(joined.encode("utf-8"), dtype=np.uint8)
        if len(b) < 2:
            return part_schema.empty_table()
        alpha = (b >= _BPE_A) & (b <= _BPE_Z)
        ok = alpha[:-1] & alpha[1:]
        if not ok.any():
            return part_schema.empty_table()
        code = (b[:-1][ok].astype(np.int64) - _BPE_A) * 26 + (
            b[1:][ok].astype(np.int64) - _BPE_A
        )
        hist = np.bincount(code, minlength=676)
        nz = np.flatnonzero(hist)
        return pa.table(
            {"code": pa.array(nz.astype(np.int64)), "n": pa.array(hist[nz])},
            schema=part_schema,
        )

    parts = ds.map_batches(pair_hist, batch_format="pyarrow").take_all()
    total = np.zeros(676, dtype=np.int64)
    for r in parts:
        total[r["code"]] += r["n"]
    nz = np.flatnonzero(total)
    if not len(nz):
        return pa.table(
            {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    order = np.lexsort((nz, -total[nz]))[:BPE_TOP_K]
    codes = nz[order]
    pairs = [chr(_BPE_A + c // 26) + chr(_BPE_A + c % 26) for c in codes]
    return pa.table(
        {"pair": pa.array(pairs, type=pa.string()), "n": pa.array(total[codes])}
    )


def q_embedding_kmeans_refine(sf_dir: str):
    """ONE full k-means refinement round on top of the assignment step
    (q_embedding_kmeans), integer-exact end to end — the iterative-
    algorithm template at 100 TB: each round is one STREAMING pass
    (no exchange) whose per-block partial is a K x dim int64 sum
    matrix + K counts (a few KiB regardless of corpus size), a driver
    merge of K x blocks partials, and a broadcast of the K x dim
    result for the next pass. Centroid update is elementwise
    floor(sum / count) on the quantized grid (empty clusters keep
    their seed), so the update — like the distances — has one exact
    answer both numpy and the SQL replica compute bit-identically
    (floor of a correctly-rounded double quotient is exact while
    |sum| < 2^53 and the quotient isn't within 1/count of an integer
    crossing; |sum| <= corpus x 8192 keeps that true by orders of
    magnitude).

    Output: each vector's round-2 cluster and whether it MOVED vs the
    seed assignment — the convergence signal a driver loop would test
    (iterate-until-moved==0)."""
    _ensure_hash_shuffle()
    seeds = _kmeans_seed_centroids(sf_dir)
    k, dim = seeds.shape
    seed_ref = ray.put((seeds, (seeds * seeds).sum(axis=1)))

    part_schema = pa.schema(
        [
            ("cluster", pa.int64()),
            ("cnt", pa.int64()),
            ("sums", pa.list_(pa.int64())),
        ]
    )

    def fold_sums(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        C, c_sq = ray.get(seed_ref)
        X = np.floor(
            list_column_matrix(batch.column("embedding")) * KMEANS_SCALE
        ).astype(np.int64)
        x_sq = (X * X).sum(axis=1)
        d = x_sq[:, None] - 2 * (X @ C.T) + c_sq[None, :]
        c = np.argmin(d, axis=1)
        onehot = (c[:, None] == np.arange(k)[None, :]).astype(np.int64)
        sums = onehot.T @ X  # (k, dim) int64, exact
        cnts = onehot.sum(axis=0)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnts.astype(np.int64)),
                "sums": pa.array(list(sums), type=pa.list_(pa.int64())),
            },
            schema=part_schema,
        )

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    parts = emb.map_batches(fold_sums, batch_format="pyarrow").take_all()
    tot = np.zeros((k, dim), dtype=np.int64)
    cnt = np.zeros(k, dtype=np.int64)
    for r in parts:
        tot[r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
        cnt[r["cluster"]] += r["cnt"]
    new_c = seeds.copy()
    nz = cnt > 0
    # floor(sum/count) == np.floor_divide for int64; see docstring for
    # why the SQL floor(double quotient) replica is bit-identical
    new_c[nz] = np.floor_divide(tot[nz], cnt[nz][:, None])
    ref2 = ray.put((seeds, (seeds * seeds).sum(axis=1), new_c, (new_c * new_c).sum(axis=1)))

    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("cluster", pa.int64()),
            ("moved", pa.int64()),
        ]
    )

    def reassign(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        C1, c1_sq, C2, c2_sq = ray.get(ref2)
        X = np.floor(
            list_column_matrix(batch.column("embedding")) * KMEANS_SCALE
        ).astype(np.int64)
        x_sq = (X * X).sum(axis=1)
        c1 = np.argmin(x_sq[:, None] - 2 * (X @ C1.T) + c1_sq[None, :], axis=1)
        c2 = np.argmin(x_sq[:, None] - 2 * (X @ C2.T) + c2_sq[None, :], axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "cluster": pa.array(c2.astype(np.int64)),
                "moved": pa.array((c1 != c2).astype(np.int64)),
            },
            schema=out_schema,
        )

    return emb.map_batches(reassign, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# mergeable quantile sketch (DDSketch-style float-bit buckets)
# ---------------------------------------------------------------------------

VQS_PS = (50, 90, 99)


def _vqs_codes(vals: np.ndarray) -> np.ndarray:
    """DDSketch-style bucket code per float64 value: the top 16 bits of
    the IEEE-754 pattern (sign + 11 exponent + 4 mantissa bits), zeros
    canonicalized to code 0. Buckets are RELATIVE-ERROR bounded (width
    <= 1/16 of the bucket's magnitude), the code space is bounded
    (<= 65,536 regardless of data), and the map is a pure function of
    the value — so per-block histograms merge by SUM in any order
    (HLL-style order independence, no compaction schedule).
    Ref: Masson, Lee, Rim — "DDSketch: a fast and fully-mergeable
    quantile sketch with relative-error guarantees", VLDB 2019 (bucket
    family swapped from log-gamma indexing to raw float bits, which
    keeps the index integer-exact and SQL/oracle-replicable)."""
    v = np.ascontiguousarray(vals, dtype=np.float64)
    code = (v.view(np.uint64) >> np.uint64(48)).astype(np.int64)
    code[v == 0.0] = 0
    return code


def _vqs_reps(codes: np.ndarray) -> np.ndarray:
    """Bucket representative: the float64 whose bit pattern is
    code << 48 — the bucket's closest-to-zero endpoint. Sorting by it
    ascending sorts buckets in VALUE order for negatives, zero and
    positives alike."""
    return (codes.astype(np.uint64) << np.uint64(48)).view(np.float64)


def q_value_quantile_sketch(sf_dir: str):
    """Approximate per-event-type value quantiles (p50/p90/p99) from a
    mergeable DDSketch-style sketch — the UNBOUNDED-domain counterpart
    of the exact bounded-histogram quantiles (token_quantiles): when
    the domain is arbitrary doubles, the exact path needs a global
    sort; the sketch path is one streaming histogram fold with a
    <= 65k-bucket payload and a relative-error (not rank-error)
    guarantee of 1/16 on the reported value.

    Shape: per-block (event_type, code) counts fold in-block (arrow
    group_by over the int bucket code), ONE keyed exchange on
    event_type moves only those bounded partials, and the per-run
    kernel merges histograms by sum, sorts the <= 65k codes by
    representative, and reads each target rank off the cumulative
    count — integer rank arithmetic (ceil via -(-p*n//100)) and a
    bit-reconstructed double representative, so the independent
    oracle recompute is bit-identical."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_type", "value"])

    part_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("code", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def fold(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        codes = _vqs_codes(np.asarray(batch.column("value"), dtype=np.float64))
        t = pa.table(
            {"event_type": batch.column("event_type"), "code": pa.array(codes)}
        )
        agg = t.group_by(["event_type", "code"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "code": agg.column("code"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    partials = ds.map_batches(fold, batch_format="pyarrow")
    by_type = _keyed_repartition(partials, _shuffle_width(), ["event_type"])

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("p", pa.int64()),
            ("q_approx", pa.float64()),
            ("n_events", pa.int64()),
        ]
    )

    def quantiles(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        merged = block.group_by(["event_type", "code"]).aggregate([("n", "sum")])
        et = np.asarray(merged.column("event_type"), dtype=object)
        code = np.asarray(merged.column("code"), dtype=np.int64)
        cnt = np.asarray(merged.column("n_sum"), dtype=np.int64)
        rep = _vqs_reps(code)
        order = np.lexsort((code, rep, et))
        et, code, cnt, rep = et[order], code[order], cnt[order], rep[order]
        new_run = np.r_[True, et[1:] != et[:-1]]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], len(et)]
        o_et, o_p, o_q, o_n = [], [], [], []
        for s, e in zip(starts, ends):
            cum = np.cumsum(cnt[s:e])
            n = int(cum[-1])
            for p in VQS_PS:
                rank = -(-p * n // 100)  # integer ceil
                idx = int(np.searchsorted(cum, rank, side="left"))
                o_et.append(et[s])
                o_p.append(p)
                o_q.append(rep[s:e][idx])
                o_n.append(n)
        return pa.table(
            {
                "event_type": pa.array(o_et, type=pa.string()),
                "p": pa.array(o_p, type=pa.int64()),
                "q_approx": pa.array(o_q, type=pa.float64()),
                "n_events": pa.array(o_n, type=pa.int64()),
            },
            schema=out_schema,
        )

    return by_type.map_batches(
        quantiles, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def q_event_transitions(sf_dir: str):
    """User-journey TRANSITION MATRIX: global counts of consecutive
    (prev event_type -> event_type) steps within each user's
    (ts, event_id)-ordered stream — the Markov-chain estimation pass
    behind session-path mining and next-action models.

    Shape: 4-column pruned read, ONE keyed exchange on user_id, then
    the catalog's sort + run-detect + shift kernel (lag() semantics,
    no window library) with the run's FIRST event masked out; the
    (from, to) pair counts fold in-block to <= |types|^2 partial rows
    and one tiny keyed aggregate merges them — the exchange payload
    after the kernel is the type-pair domain x blocks, never events."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    part_schema = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def transitions(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type"), dtype=object)
        n = len(user)
        if n < 2:
            return part_schema.empty_table()
        same_user = user[1:] == user[:-1]
        if not same_user.any():
            return part_schema.empty_table()
        pairs = pa.table(
            {
                "from_type": pa.array(et[:-1][same_user], type=pa.string()),
                "to_type": pa.array(et[1:][same_user], type=pa.string()),
            }
        )
        agg = pairs.group_by(["from_type", "to_type"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "from_type": agg.column("from_type"),
                "to_type": agg.column("to_type"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    partial = _keyed_exchange_apply(ds, ["user_id"], transitions, part_schema)
    # the partial stream is bounded by the type-pair domain x blocks —
    # driver fold (the dq_audit idiom), not another exchange
    totals: dict[tuple[str, str], int] = {}
    for r in partial.take_all():
        k = (r["from_type"], r["to_type"])
        totals[k] = totals.get(k, 0) + int(r["n"])
    keys = sorted(totals)
    return pa.table(
        {
            "from_type": pa.array([k[0] for k in keys], type=pa.string()),
            "to_type": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array([totals[k] for k in keys], type=pa.int64()),
        }
    )


TRIGRAM_TOP_K = 20


def q_event_trigram_paths(sf_dir: str):
    """Top 3-STEP user journeys: counts of consecutive event-type
    triples per user's (ts, event_id)-ordered stream, global top-K by
    (count desc, path asc) — the second-order extension of
    ``event_transitions`` (path analysis asks 'what leads INTO
    checkout', which pairs cannot answer).

    Shape: same single keyed exchange; the kernel shifts TWICE and
    folds triple counts in-block (payload bounded by the type-domain
    CUBED x blocks — still tiny); a driver fold + top-K finishes, no
    global sort."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts", "event_id"])
    part_schema = pa.schema(
        [
            ("t1", pa.string()),
            ("t2", pa.string()),
            ("t3", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def trigrams(block: pa.Table) -> pa.Table:
        if block.num_rows < 3:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type"), dtype=object)
        same3 = (user[2:] == user[1:-1]) & (user[1:-1] == user[:-2])
        if not same3.any():
            return part_schema.empty_table()
        triples = pa.table(
            {
                "t1": pa.array(et[:-2][same3], type=pa.string()),
                "t2": pa.array(et[1:-1][same3], type=pa.string()),
                "t3": pa.array(et[2:][same3], type=pa.string()),
            }
        )
        agg = triples.group_by(["t1", "t2", "t3"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "t1": agg.column("t1"),
                "t2": agg.column("t2"),
                "t3": agg.column("t3"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    totals: dict[tuple[str, str, str], int] = {}
    for r in _keyed_exchange_apply(ds, ["user_id"], trigrams, part_schema).take_all():
        k = (r["t1"], r["t2"], r["t3"])
        totals[k] = totals.get(k, 0) + int(r["n"])
    top = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:TRIGRAM_TOP_K]
    return pa.table(
        {
            "t1": pa.array([k[0] for k, _ in top], type=pa.string()),
            "t2": pa.array([k[1] for k, _ in top], type=pa.string()),
            "t3": pa.array([k[2] for k, _ in top], type=pa.string()),
            "n": pa.array([v for _, v in top], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# distributed global rank / NTILE without a global sort
# ---------------------------------------------------------------------------

NTILE_K = 4
# distinct-length histogram broadcast budget (rows): the cum-offset
# table is bounded by DISTINCT key values, not docs — document lengths
# cluster heavily, but a pathological corpus could exceed it, and the
# remedy (range-partition the key space and rank per range) is noted
# in the raise.
NTILE_HIST_BUDGET = 1 << 22


def q_doc_length_ntiles(sf_dir: str):
    """GLOBAL rank + NTILE over (n_chars, doc_id) — the order-statistic
    operator (equi-depth bucketing, percentile-rank features) computed
    WITHOUT a global sort: ranking only needs (a) how many rows precede
    my KEY GROUP — a cumulative histogram over distinct lengths, built
    by the two-phase count and broadcast once — and (b) my position
    WITHIN the group — local to the group after one keyed exchange on
    n_chars. rank = cum_offset[length] + in-group position; NTILE
    follows from rank with the exact SQL fill rule (first n%k tiles get
    one extra row). The broadcast is bounded by DISTINCT lengths
    (budgeted, raises with the range-partition remedy), so no stage
    ever sees a global order and the corpus never moves twice."""
    _ensure_hash_shuffle()
    counts = grouped_aggregate(
        _read(sf_dir, "documents", columns=["n_chars"]),
        ["n_chars"],
        [("n_chars", "count", "cnt")],
    ).take_all()
    if len(counts) > NTILE_HIST_BUDGET:
        raise RuntimeError(
            f"distinct-length histogram ({len(counts)} rows) exceeds the "
            "broadcast budget; range-partition the key space and rank "
            "per range instead"
        )
    out_empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_chars": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "ntile": pa.array([], pa.int64()),
        }
    )
    if not counts:
        return out_empty
    lens = np.array([r["n_chars"] for r in counts], dtype=np.int64)
    cnt = np.array([r["cnt"] for r in counts], dtype=np.int64)
    order = np.argsort(lens)
    lens, cnt = lens[order], cnt[order]
    offsets = np.r_[0, np.cumsum(cnt)[:-1]]
    total = int(cnt.sum())
    hist_ref = ray.put((lens, offsets))

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_chars", pa.int64()),
            ("rank", pa.int64()),
            ("ntile", pa.int64()),
        ]
    )
    k = NTILE_K
    r_big = total % k
    big = total // k + 1
    small = total // k

    def rank_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("n_chars", "ascending"), ("doc_id", "ascending")]
        )
        t = block.take(order)
        ln = np.asarray(t.column("n_chars"), dtype=np.int64)
        n = len(ln)
        new_run = np.r_[True, ln[1:] != ln[:-1]]
        starts = np.flatnonzero(new_run)
        pos = np.arange(n, dtype=np.int64) - np.repeat(
            starts, np.diff(np.r_[starts, n])
        )
        L, O = ray.get(hist_ref)
        off = O[np.searchsorted(L, ln)]
        rank0 = off + pos
        if small == 0:
            tile = rank0 + 1
        else:
            in_big = rank0 < r_big * big
            tile = np.where(
                in_big,
                rank0 // max(big, 1) + 1,
                r_big + (rank0 - r_big * big) // small + 1,
            )
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_chars": t.column("n_chars").cast(pa.int64()),
                "rank": pa.array(rank0 + 1),
                "ntile": pa.array(tile.astype(np.int64)),
            },
            schema=out_schema,
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    by_len = _keyed_repartition(ds, _shuffle_width(), ["n_chars"])
    return by_len.map_batches(
        rank_kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


def q_doc_compression_ratio(sf_dir: str):
    """Per-document COMPRESSION-RATIO quality signal (the
    Gopher/RefinedWeb repetitiveness proxy: highly compressible text is
    boilerplate/templated; incompressible is noise): zlib-6 size over
    raw utf-8 size, reported as integer per-mille so the value-hash
    gate is exact. Deterministic given one zlib build — the engine and
    oracle share this container's zlib; a cross-version cluster pins
    the codec wheel (documented, same caveat class as the multimodal
    stubs).

    Shape: pure streaming task map, no exchange; the per-doc zlib call
    is a C-extension compress on kilobytes (the per-row loop is
    release-the-GIL C time, the same contract as the multimodal codec
    stages — not a Python hot loop)."""
    import zlib

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("raw_bytes", pa.int64()),
            ("gz_bytes", pa.int64()),
            ("ratio_permille", pa.int64()),
        ]
    )

    def ratios(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        texts = pc.fill_null(batch.column("text"), "").to_pylist()
        raw = np.empty(len(texts), dtype=np.int64)
        gz = np.empty(len(texts), dtype=np.int64)
        for i, s in enumerate(texts):
            b = s.encode("utf-8")
            raw[i] = len(b)
            gz[i] = len(zlib.compress(b, 6))
        ratio = np.where(raw > 0, gz * 1000 // np.maximum(raw, 1), 0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "raw_bytes": pa.array(raw),
                "gz_bytes": pa.array(gz),
                "ratio_permille": pa.array(ratio.astype(np.int64)),
            },
            schema=out_schema,
        )

    return ds.map_batches(ratios, batch_format="pyarrow", zero_copy_batch=True)



EVENT_DEDUP_SECONDS = 600  # suppression window per (user, event_type)


def q_event_dedup_window(sf_dir: str):
    """Windowed event DEDUPLICATION (the streaming dedup-with-TTL
    contract: drop repeats of the same (user, event_type) arriving
    within EVENT_DEDUP_SECONDS of the last KEPT one) — the
    at-least-once-delivery cleanup every event pipeline runs before
    counting. Keep/drop is a per-key CHAIN (an event is kept iff its
    gap to the previously KEPT event exceeds the window) — note this
    differs from a lag-gap filter, which compares against the previous
    RAW event and over-drops after a suppressed one.

    Kernel contract: the chain is inherently sequential WITHIN a key
    run, but the walk advances by ``searchsorted`` JUMP to the next
    survivor — iterations are bounded by the OUTPUT (kept events), the
    same "loop over groups/results, never rows" bound as the catalog's
    pair kernels; a fully-duplicated stream costs one jump per window,
    a fully-sparse one degenerates to one jump per row only because
    every row survives. One keyed exchange on (user_id, event_type).

    Oracle: an independent pure-Python chain walk (the greedy kept-set
    is not expressible in one SQL window pass — running max over kept
    rows is self-referential), recorded as a parquet oracle."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    win_us = EVENT_DEDUP_SECONDS * 1_000_000

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
        ]
    )

    def dedup_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("event_type", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type"), dtype=object)
        ts = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        n = len(user)
        new_run = np.r_[True, (user[1:] != user[:-1]) | (et[1:] != et[:-1])]
        starts = np.flatnonzero(new_run)
        ends = np.r_[starts[1:], n]
        keep_idx: list[int] = []
        for s, e in zip(starts, ends):
            i = s
            while i < e:
                keep_idx.append(i)
                # jump to the first event past the suppression window
                i = s + int(
                    np.searchsorted(ts[s:e], ts[i] + win_us, side="right")
                )
        idx = pa.array(np.asarray(keep_idx, dtype=np.int64))
        return pa.table(
            {
                "event_id": t.column("event_id").take(idx).cast(pa.int64()),
                "user_id": t.column("user_id").take(idx).cast(pa.int64()),
                "ts": t.column("ts").take(idx),
                "event_type": t.column("event_type").take(idx),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(
        ds, ["user_id", "event_type"], dedup_kernel, out_schema
    )


# ---------------------------------------------------------------------------
# disk-backed keyed exchange for heavy analytics (the flagship's
# fragment shuffle, generalized)
# ---------------------------------------------------------------------------

# above this input size the catalog's per-event keyed analytics leave
# Ray's hash-shuffle operator (measured floor ~0.8M rows/s at 32 CPUs:
# a naked 10M-row repartition(keys=...) costs 12-13 s at EVERY
# aggregator x partition setting tried — the aggregator concat path)
# and ride the engine's own two-phase fragment exchange instead (the
# flagship's disk shuffle: ~1M events/s end-to-end INCLUDING ingest +
# LWW merge + lake write at the 38.4M-event probe).
FRAG_EXCHANGE_BYTES = 128 << 20


def _frag_scratch_root() -> str:
    import tempfile

    root = os.environ.get("GRAFT_FRAG_DIR")
    if root:
        return root
    # /dev/shm on a single node (fragment IO becomes memcpy); a
    # multi-node cluster must point GRAFT_FRAG_DIR at a shared
    # filesystem or per-node spill volume — same contract as the lake
    # scratch (sinks/exactly_once.py FragmentWriter docstring). Fail
    # FAST on a multi-node cluster instead of surfacing later as
    # confusing missing-fragment reads on the merge side.
    if _multi_node_cluster():
        raise RuntimeError(
            "fragment exchange scratch defaults to node-local /dev/shm, "
            "but this Ray cluster has multiple alive nodes — phase-B "
            "merge tasks would not see phase-A fragments written on "
            "other nodes. Set GRAFT_FRAG_DIR to a filesystem shared by "
            "every node (or a per-node spill volume with node-affinity "
            "scheduling)."
        )
    return "/dev/shm" if os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()


def _multi_node_cluster() -> bool:
    """True when the connected Ray cluster has >1 ALIVE node."""
    try:
        if not ray.is_initialized():
            return False
        return sum(1 for n in ray.nodes() if n.get("Alive")) > 1
    except Exception:
        return False


def fragment_keyed_exchange(
    ds: "ray.data.Dataset",
    key_columns: list[str],
    kernel,
    out_schema: pa.Schema,
    num_buckets: int | None = None,
    fragment_format: str = "ipc",
) -> "ray.data.Dataset":
    """Two-phase DISK-BACKED keyed exchange + per-bucket kernel — the
    flagship's fragment shuffle (sinks/exactly_once.py FragmentWriter)
    generalized to any analytics kernel. Phase A splits every block by
    ``stable_key_hash(key_columns) % num_buckets`` and appends one
    fragment file per (block, bucket); phase B runs ONE task per
    touched bucket over the concatenation of its fragments — every key
    wholly in one kernel call, the same contract ``_keyed_repartition``
    gives, without the hash-shuffle operator's aggregator concat wall.

    Returns the MATERIALIZED kernel output (analytics results; the
    scratch directory is deleted before returning). Retried phase-A
    tasks may duplicate fragments; callers needing exactly-once
    analytics should route through the lake's manifest commit instead
    — for the pure-aggregate catalog entries a retry re-runs the whole
    query, so duplicates never survive to a result."""
    import shutil
    import tempfile
    import uuid

    from embulk_input_marketo_ray.sinks.exactly_once import (
        FragmentWriter,
        read_fragment,
    )
    from embulk_input_marketo_ray.stages.lww import add_bucket

    if num_buckets is None:
        total_cpus = (
            int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        )
        # phase B holds ONE bucket's fragments in memory at once, so
        # buckets must scale with the INPUT, not just the cluster:
        # target ~256 MiB of source bytes per bucket (a few hundred MB
        # of heap after decode), floor 2/CPU for parallelism. _read
        # recorded the driving table's bytes; an unknown input keeps
        # the cluster floor.
        by_bytes = (
            int(_TUNED_BYTES // (256 << 20)) + 1 if _TUNED_BYTES is not None else 1
        )
        num_buckets = max(16, total_cpus * 2, min(by_bytes, 1 << 16))
    scratch = os.path.join(
        _frag_scratch_root(), f"graft_xchg_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    )
    writer = FragmentWriter(scratch, num_buckets, fragment_format)

    def phase_a(batch: pa.Table) -> pa.Table:
        return writer(add_bucket(batch, num_buckets, key_columns))

    try:
        frag_stats = ds.map_batches(phase_a, batch_format="pyarrow").take_all()
        # RETRY SAFETY: phase B reads exactly the fragments the
        # SUCCESSFUL phase-A attempts reported — a retried task's
        # orphaned duplicates on disk are never read, so counting
        # kernels stay exact under task retry (the lake's manifest
        # trick, applied to the scratch exchange)
        by_bucket: dict[int, list[str]] = {}
        for r in frag_stats:
            by_bucket.setdefault(int(r["bucket"]), []).append(r["frag_path"])
        if not by_bucket:
            return ray.data.from_arrow(out_schema.empty_table())
        specs = ray.data.from_items(
            [
                {"bucket": b, "files": sorted(fs)}
                for b, fs in sorted(by_bucket.items())
            ],
            override_num_blocks=len(by_bucket),
        )

        def phase_b(batch: pa.Table) -> pa.Table:
            from concurrent.futures import ThreadPoolExecutor

            outs = []
            for files in batch.column("files").to_pylist():
                files = list(files)
                if not files:
                    continue
                if len(files) > 8:
                    with ThreadPoolExecutor(max_workers=8) as ex:
                        frags = list(ex.map(read_fragment, files))
                else:
                    frags = [read_fragment(f) for f in files]
                outs.append(kernel(pa.concat_tables(frags)))
            if not outs:
                return out_schema.empty_table()
            return pa.concat_tables(outs)

        return specs.map_batches(
            phase_b, batch_size=None, batch_format="pyarrow"
        ).materialize()
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def _keyed_exchange_apply(
    ds: "ray.data.Dataset",
    key_columns: list[str],
    kernel,
    out_schema: pa.Schema,
) -> "ray.data.Dataset":
    """Keyed exchange + whole-partition kernel, strategy picked by the
    INPUT SIZE the driving ``_read`` recorded: small inputs collapse to
    one block (no exchange at all), mid-size inputs take Ray's hash
    shuffle, and inputs past FRAG_EXCHANGE_BYTES ride the fragment
    exchange (see the measured floor above)."""
    if (
        _TUNED_BYTES is not None
        and _TUNED_BYTES > FRAG_EXCHANGE_BYTES
        and not _small_input()
    ):
        return fragment_keyed_exchange(ds, key_columns, kernel, out_schema)
    shuffled = _keyed_repartition(ds, _shuffle_width(), key_columns)
    return shuffled.map_batches(
        kernel, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# CDC stream-health operators (late data, lifecycle, skew, freshness)
# ---------------------------------------------------------------------------


def q_cdc_late_arrivals(sf_dir: str):
    """LATE-ARRIVAL audit per (repo, path): how many change events
    carried an ``updated_ts`` OLDER than an earlier (by commit order)
    event of the same key, and the worst clock regression observed —
    the updatedAt-vs-import-order disagreement that makes the
    reference reject ``incremental`` + ``use_updated_at``
    (MarketoInputPluginDelegate's config rule) and that this engine's
    LWW replay absorbs (W6). The operator quantifies it per key so an
    operator can size watermark lag / grace windows.

    Shape: 4-column pruned read, ONE keyed (repo, path) exchange, then
    a whole-block kernel: per-run running max of updated_ts computed
    EXACTLY via dense value ranks + the run-offset trick (rank +
    run_id * n_distinct makes np.maximum.accumulate reset at run
    boundaries with no overflow and no float), late = rank below the
    prior running max; folds to one row per key inside the kernel."""
    _ensure_hash_shuffle()
    ds = _read_events(columns=["repo", "path", "commit_seq", "updated_ts"])
    out_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("n_events", pa.int64()),
            ("n_late", pa.int64()),
            ("max_regression_us", pa.int64()),
        ]
    )

    def late_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit_seq", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        path = np.asarray(t.column("path"), dtype=object)
        uts = np.asarray(t.column("updated_ts").cast(pa.int64()), dtype=np.int64)
        n = len(uts)
        new_key = np.r_[True, (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])]
        run_id = np.cumsum(new_key) - 1
        # dense ranks keep the segmented-cummax offsets within
        # run_id * n_distinct + rank < n^2 — exact int64, no overflow
        uniq, rank = np.unique(uts, return_inverse=True)
        keyed = run_id.astype(np.int64) * np.int64(len(uniq)) + rank
        cummax = np.maximum.accumulate(keyed)
        prev_rank = np.empty(n, dtype=np.int64)
        prev_rank[0] = 0
        prev_rank[1:] = cummax[:-1] - run_id[1:] * np.int64(len(uniq))
        late = (~new_key) & (rank < prev_rank)
        regression = np.zeros(n, dtype=np.int64)
        regression[late] = uniq[prev_rank[late]] - uts[late]
        starts = np.flatnonzero(new_key)
        return pa.table(
            {
                "repo": pa.array(repo[starts], type=pa.string()),
                "path": pa.array(path[starts], type=pa.string()),
                "n_events": pa.array(np.diff(np.r_[starts, n]), type=pa.int64()),
                "n_late": pa.array(
                    np.add.reduceat(late.astype(np.int64), starts), type=pa.int64()
                ),
                "max_regression_us": pa.array(
                    np.maximum.reduceat(regression, starts), type=pa.int64()
                ),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(ds, ["repo", "path"], late_kernel, out_schema)


def q_path_lifecycle(sf_dir: str):
    """Per-key FILE LIFECYCLE report: upsert / delete counts, RE-CREATE
    count (an upsert whose immediately preceding event of the same key
    was a delete — tombstone resurrection, the case LWW must order
    correctly), and whether the key is live at the head. The
    per-partition metadata a lake compactor uses to pick rewrite
    candidates (hot churners, tombstone-heavy keys).

    Same single-exchange shape as q_cdc_before_image: 4-column pruned
    read, ONE keyed (repo, path) exchange, lag semantics via the
    sort + run-detect + shift kernel, all folds reduceat — one output
    row per key, no per-row Python."""
    _ensure_hash_shuffle()
    ds = _read_events(columns=["repo", "path", "commit_seq", "op"])
    out_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("n_upserts", pa.int64()),
            ("n_deletes", pa.int64()),
            ("n_recreates", pa.int64()),
            ("live", pa.int64()),
        ]
    )

    def lifecycle_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("repo", "ascending"),
                ("path", "ascending"),
                ("commit_seq", "ascending"),
            ],
        )
        t = block.take(order)
        repo = np.asarray(t.column("repo"), dtype=object)
        path = np.asarray(t.column("path"), dtype=object)
        is_upsert = np.asarray(pc.equal(t.column("op"), pa.scalar("upsert")))
        n = len(repo)
        new_key = np.r_[True, (repo[1:] != repo[:-1]) | (path[1:] != path[:-1])]
        prev_delete = np.r_[False, ~is_upsert[:-1]]
        recreate = (~new_key) & is_upsert & prev_delete
        starts = np.flatnonzero(new_key)
        ends = np.r_[starts[1:], n] - 1
        ups = np.add.reduceat(is_upsert.astype(np.int64), starts)
        total = np.diff(np.r_[starts, n])
        return pa.table(
            {
                "repo": pa.array(repo[starts], type=pa.string()),
                "path": pa.array(path[starts], type=pa.string()),
                "n_upserts": pa.array(ups, type=pa.int64()),
                "n_deletes": pa.array(total - ups, type=pa.int64()),
                "n_recreates": pa.array(
                    np.add.reduceat(recreate.astype(np.int64), starts),
                    type=pa.int64(),
                ),
                "live": pa.array(is_upsert[ends].astype(np.int64), type=pa.int64()),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(ds, ["repo", "path"], lifecycle_kernel, out_schema)


def q_repo_churn_concentration(sf_dir: str):
    """Churn-SKEW report per repo: what per-mille share of a repo's
    change events hits its top decile of most-changed paths — the
    hot-key diagnosis an operator reads before picking bucket counts /
    salting (this engine's own skew lever, BASELINE.md skew probes).
    Integer-exact: share_pm = floor(1000 * top_decile_changes / total).

    Shape: (repo, path) counts fold IN-BLOCK first (payload = distinct
    paths x blocks, never events), ONE keyed exchange on repo, then a
    whole-block kernel: merge partials with arrow group_by, ONE
    lexsort (repo asc, count desc, path asc), per-run decile cut via
    cumsum differences — no per-repo Python loop."""
    _ensure_hash_shuffle()
    ds = _read_events(columns=["repo", "path"])
    part_schema = pa.schema(
        [("repo", pa.string()), ("path", pa.string()), ("n", pa.int64())]
    )

    def fold_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        agg = batch.group_by(["repo", "path"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "repo": agg.column("repo"),
                "path": agg.column("path"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    out_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("n_paths", pa.int64()),
            ("n_changes", pa.int64()),
            ("top_paths", pa.int64()),
            ("top_share_pm", pa.int64()),
        ]
    )

    def concentration_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        merged = block.group_by(["repo", "path"]).aggregate([("n", "sum")])
        repo = np.asarray(merged.column("repo"), dtype=object)
        path = np.asarray(merged.column("path"), dtype=object)
        cnt = np.asarray(merged.column("n_sum"), dtype=np.int64)
        order = np.lexsort((path, -cnt, repo))
        repo, path, cnt = repo[order], path[order], cnt[order]
        n = len(repo)
        new_run = np.r_[True, repo[1:] != repo[:-1]]
        starts = np.flatnonzero(new_run)
        n_paths = np.diff(np.r_[starts, n])
        totals = np.add.reduceat(cnt, starts)
        top_k = (n_paths + 9) // 10
        cum = np.cumsum(cnt)
        base = np.r_[0, cum[:-1]]
        top_sum = cum[starts + top_k - 1] - base[starts]
        return pa.table(
            {
                "repo": pa.array(repo[starts], type=pa.string()),
                "n_paths": pa.array(n_paths, type=pa.int64()),
                "n_changes": pa.array(totals, type=pa.int64()),
                "top_paths": pa.array(top_k, type=pa.int64()),
                "top_share_pm": pa.array(1000 * top_sum // totals, type=pa.int64()),
            },
            schema=out_schema,
        )

    partial = ds.map_batches(fold_counts, batch_format="pyarrow")
    return _keyed_exchange_apply(partial, ["repo"], concentration_kernel, out_schema)


def q_repo_freshness(sf_dir: str):
    """Per-repo FRESHNESS / watermark-lag report: event count, last
    event time, and the lag (microseconds) behind the stream's global
    head — the per-source staleness dashboard a CDC operator watches
    to spot a stalled extractor. Integer-exact epoch-us arithmetic.

    Shape: per-block (repo, count, max_us) partials via arrow
    group_by — payload bounded by repos x blocks — then a driver fold
    (the dq_audit/event_transitions idiom: the repo domain is small by
    construction) computes the global head and per-repo lag; the event
    stream itself never shuffles."""
    _ensure_hash_shuffle()
    ds = _read_events(columns=["repo", "event_ts"])
    part_schema = pa.schema(
        [("repo", pa.string()), ("n", pa.int64()), ("max_us", pa.int64())]
    )

    def fold_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        t = pa.table(
            {
                "repo": batch.column("repo"),
                "us": batch.column("event_ts").cast(pa.int64()),
            }
        )
        agg = t.group_by(["repo"]).aggregate([([], "count_all"), ("us", "max")])
        return pa.table(
            {
                "repo": agg.column("repo"),
                "n": agg.column("count_all").cast(pa.int64()),
                "max_us": agg.column("us_max"),
            },
            schema=part_schema,
        )

    totals: dict[str, list[int]] = {}
    for r in ds.map_batches(fold_block, batch_format="pyarrow").take_all():
        cur = totals.setdefault(r["repo"], [0, -(1 << 62)])
        cur[0] += int(r["n"])
        cur[1] = max(cur[1], int(r["max_us"]))
    if not totals:
        return pa.table(
            {
                "repo": pa.array([], type=pa.string()),
                "n_events": pa.array([], type=pa.int64()),
                "last_event_us": pa.array([], type=pa.int64()),
                "lag_us": pa.array([], type=pa.int64()),
            }
        )
    head = max(v[1] for v in totals.values())
    repos = sorted(totals)
    return pa.table(
        {
            "repo": pa.array(repos, type=pa.string()),
            "n_events": pa.array([totals[r][0] for r in repos], type=pa.int64()),
            "last_event_us": pa.array([totals[r][1] for r in repos], type=pa.int64()),
            "lag_us": pa.array([head - totals[r][1] for r in repos], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# distributed EXISTS semi-join (TPC-H Q4 shape)
# ---------------------------------------------------------------------------

EXISTS_LATE_DAYS = 30
_EXISTS_LATE_US = EXISTS_LATE_DAYS * 86_400 * 1_000_000


def q_order_exists_join(sf_dir: str):
    """Distributed LARGE x LARGE EXISTS semi-join (TPC-H Q4 shape):
    count orders per priority that have AT LEAST ONE line item shipped
    more than EXISTS_LATE_DAYS after the order date. The predicate
    spans both sides (shipdate vs orderdate), so neither a scan filter
    nor a broadcast key set (q_semi_join) can decide it — the EXISTS
    dual of q_customer_anti_join's NOT EXISTS.

    Shape: both sides ride ONE tagged-union keyed exchange on
    orderkey, dates collapse to epoch-us int64 AT THE SCAN; the
    per-block kernel sorts (key, side), takes the per-run MAX line
    shipdate via maximum.reduceat (EXISTS <=> max exceeds the
    threshold), and folds qualifying orders to <= |priorities| partial
    rows per block; a driver fold merges the bounded partial stream."""
    _ensure_hash_shuffle()
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )
    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    union_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("prio", pa.string()),
            ("date_us", pa.int64()),
        ]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "prio": batch.column("o_orderpriority"),
                "date_us": batch.column("o_orderdate").cast(pa.int64()),
            },
            schema=union_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "prio": pa.nulls(n, type=pa.string()),
                "date_us": batch.column("l_shipdate").cast(pa.int64()),
            },
            schema=union_schema,
        )

    tagged = orders.map_batches(order_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    part_schema = pa.schema([("o_orderpriority", pa.string()), ("n", pa.int64())])

    def exists_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        date_us = np.asarray(t.column("date_us"), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        # order row sorts first in its run (side asc, orderkey unique);
        # a run with no order row (untouched partition slice) is skipped
        has_order = side[starts] == 0
        ship = np.where(side == 1, date_us, np.int64(-(1 << 62)))
        max_ship = np.maximum.reduceat(ship, starts)
        hit = has_order & (max_ship > date_us[starts] + _EXISTS_LATE_US)
        if not hit.any():
            return part_schema.empty_table()
        prio = np.asarray(t.column("prio"), dtype=object)[starts[hit]]
        agg = pa.table({"o_orderpriority": pa.array(prio, type=pa.string())}).group_by(
            ["o_orderpriority"]
        ).aggregate([([], "count_all")])
        return pa.table(
            {
                "o_orderpriority": agg.column("o_orderpriority"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    partial = _keyed_exchange_apply(tagged, ["okey"], exists_kernel, part_schema)
    totals: dict[str, int] = {}
    for r in partial.take_all():
        totals[r["o_orderpriority"]] = totals.get(r["o_orderpriority"], 0) + int(r["n"])
    prios = sorted(totals)
    return pa.table(
        {
            "o_orderpriority": pa.array(prios, type=pa.string()),
            "order_count": pa.array([totals[p] for p in prios], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# vocabulary coverage curve (no global vocab sort)
# ---------------------------------------------------------------------------

VOCAB_COVERAGE_PM = (500, 900, 990)


def q_vocab_coverage(sf_dir: str):
    """Vocabulary COVERAGE CURVE: the smallest top-k vocabulary whose
    occurrences cover >= 50% / 90% / 99% of all token occurrences —
    the tokenizer-budget planning number (how big must a vocab be).

    The trick: k depends only on the HISTOGRAM of token frequencies,
    never on token identities — so after the two-phase (token, n)
    count (exchange payload = distinct tokens x blocks), the counts
    fold AGAIN per block to (frequency, n_tokens) pairs whose domain
    is bounded by distinct frequency VALUES (<= a few thousand at any
    corpus size, Zipf guarantees collisions); the driver walks that
    tiny histogram in descending-frequency order with all-integer
    ceil arithmetic (covered * 1000 >= pct * total). No global vocab
    sort, no vocab broadcast, nothing driver-side grows with the
    vocabulary."""
    ds = _read(sf_dir, "documents", columns=["text"])

    def token_counts_block(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), pattern="[^a-z]+"
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pa.table({"token": toks.flatten()})
        flat = flat.filter(pc.not_equal(flat.column("token"), pa.scalar("")))
        out = flat.group_by(["token"]).aggregate([([], "count_all")])
        out = out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        )
        return out.select(["token", "n"])

    partial = ds.map_batches(token_counts_block, batch_format="pyarrow")
    counts = grouped_aggregate(partial, ["token"], [("n", "sum", "n")])
    hist_schema = pa.schema([("freq", pa.int64()), ("n_tokens", pa.int64())])

    def hist_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return hist_schema.empty_table()
        agg = batch.group_by(["n"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "freq": agg.column("n").cast(pa.int64()),
                "n_tokens": agg.column("count_all").cast(pa.int64()),
            },
            schema=hist_schema,
        )

    hist: dict[int, int] = {}
    for r in counts.map_batches(hist_block, batch_format="pyarrow").take_all():
        hist[int(r["freq"])] = hist.get(int(r["freq"]), 0) + int(r["n_tokens"])
    out_schema = pa.schema(
        [
            ("pct_pm", pa.int64()),
            ("k_tokens", pa.int64()),
            ("covered", pa.int64()),
            ("total", pa.int64()),
        ]
    )
    if not hist:
        return out_schema.empty_table()
    total = sum(f * m for f, m in hist.items())
    rows = []
    for pct in VOCAB_COVERAGE_PM:
        target = pct * total  # compare covered * 1000 >= pct * total
        cum = 0  # occurrences covered by full tiers so far
        k = 0  # tokens taken so far
        for freq in sorted(hist, reverse=True):
            m = hist[freq]
            if (cum + m * freq) * 1000 >= target:
                t = -((1000 * cum - target) // (1000 * freq))  # ceil
                t = max(t, 1)
                rows.append((pct, k + t, cum + t * freq, total))
                break
            cum += m * freq
            k += m
        else:
            rows.append((pct, k, cum, total))
    return pa.table(
        {
            "pct_pm": pa.array([r[0] for r in rows], type=pa.int64()),
            "k_tokens": pa.array([r[1] for r in rows], type=pa.int64()),
            "covered": pa.array([r[2] for r in rows], type=pa.int64()),
            "total": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# per-user inter-arrival statistics (lag-gap fold)
# ---------------------------------------------------------------------------


def q_user_interarrival(sf_dir: str):
    """Per-user INTER-ARRIVAL statistics: event count, gap count, and
    the exact sum / max of consecutive-event gaps (microseconds) in
    each user's (ts, event_id)-ordered stream — the burstiness /
    engagement-cadence fold behind session-timeout calibration (the
    gap distribution picks q_session_windows' threshold).

    Shape: 3-column pruned read, ONE keyed exchange on user_id, then
    the sort + run-detect + shift kernel; gaps fold per run with
    add/maximum.reduceat — one row per user, integers end to end."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("n_gaps", pa.int64()),
            ("sum_gap_us", pa.int64()),
            ("max_gap_us", pa.int64()),
        ]
    )

    def gap_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        us = np.asarray(t.column("ts").cast(pa.int64()), dtype=np.int64)
        n = len(user)
        new_key = np.r_[True, user[1:] != user[:-1]]
        gap = np.zeros(n, dtype=np.int64)
        gap[1:] = us[1:] - us[:-1]
        gap[new_key] = 0
        starts = np.flatnonzero(new_key)
        n_events = np.diff(np.r_[starts, n])
        return pa.table(
            {
                "user_id": pa.array(user[starts], type=pa.int64()),
                "n_events": pa.array(n_events, type=pa.int64()),
                "n_gaps": pa.array(n_events - 1, type=pa.int64()),
                "sum_gap_us": pa.array(np.add.reduceat(gap, starts), type=pa.int64()),
                "max_gap_us": pa.array(
                    np.maximum.reduceat(gap, starts), type=pa.int64()
                ),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(ds, ["user_id"], gap_kernel, out_schema)


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item revenue top-k (two chained exchanges)
# ---------------------------------------------------------------------------

Q10_FROM = np.datetime64("1997-01-01", "us")
Q10_TO = np.datetime64("1997-07-01", "us")  # half-open
Q10_TOP_K = 20


def q_returned_revenue_topk(sf_dir: str):
    """TPC-H Q10 shape (returned-item reporting): the top-k customers
    by revenue LOST to returned line items for orders placed in one
    half-year window. Composes the catalog's join strategies across
    THREE large tables with two chained tagged-union exchanges (the
    Q5 pattern) — neither orders x lineitem nor customer x orders has
    a broadcastable side at 100 TB:

    - lineitem filters to returnflag='R' AT THE SCAN; orders filter to
      the date window AT THE SCAN — only qualifying rows ever move;
    - exchange 1 (orderkey): revenue folds per order inside the join
      kernel, re-keyed to the order's customer;
    - exchange 2 (custkey): per-customer revenue fold + name attach;
    - global top-k = per-block top-k + one <= k x blocks driver merge
      (the vocab_topk idiom — never a global sort).

    Revenue is INTEGER-EXACT (cents x (100 - discount%), int64)."""
    _ensure_hash_shuffle()
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    line = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    u1_schema = pa.schema(
        [("okey", pa.int64()), ("side", pa.int8()), ("ckey", pa.int64()),
         ("rev_c", pa.int64())]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(
                batch.column("o_orderdate"), pa.scalar(Q10_FROM.item(), type=pa.timestamp("us"))
            ),
            pc.less(
                batch.column("o_orderdate"), pa.scalar(Q10_TO.item(), type=pa.timestamp("us"))
            ),
        )
        t = batch.filter(keep)
        n = t.num_rows
        return pa.table(
            {
                "okey": t.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "ckey": t.column("o_custkey").cast(pa.int64()),
                "rev_c": pa.array(np.zeros(n, dtype=np.int64)),
            },
            schema=u1_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), pa.scalar("R")))
        n = t.num_rows
        cents = np.rint(
            np.asarray(t.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(t.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "okey": t.column("l_orderkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "ckey": pa.array(np.zeros(n, dtype=np.int64)),
                "rev_c": pa.array(cents * (100 - disc)),
            },
            schema=u1_schema,
        )

    tagged1 = orders.map_batches(order_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    cust_rev_schema = pa.schema([("ckey", pa.int64()), ("rev_c", pa.int64())])

    def order_join_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return cust_rev_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        rev = np.asarray(t.column("rev_c"), dtype=np.int64)
        ckey = np.asarray(t.column("ckey"), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        has_order = side[starts] == 0
        run_rev = np.add.reduceat(rev, starts)  # order rows carry rev 0
        keep = has_order & (run_rev > 0)
        if not keep.any():
            return cust_rev_schema.empty_table()
        out = pa.table(
            {
                "ckey": pa.array(ckey[starts[keep]], type=pa.int64()),
                "rev_c": pa.array(run_rev[keep], type=pa.int64()),
            },
            schema=cust_rev_schema,
        )
        # pre-fold per customer inside the block before exchange 2
        agg = out.group_by(["ckey"]).aggregate([("rev_c", "sum")])
        return pa.table(
            {"ckey": agg.column("ckey"), "rev_c": agg.column("rev_c_sum")},
            schema=cust_rev_schema,
        )

    cust_rev = _keyed_exchange_apply(tagged1, ["okey"], order_join_kernel, cust_rev_schema)

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    u2_schema = pa.schema(
        [("ckey", pa.int64()), ("side", pa.int8()), ("c_name", pa.string()),
         ("rev_c", pa.int64())]
    )

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "c_name": batch.column("c_name"),
                "rev_c": pa.array(np.zeros(n, dtype=np.int64)),
            },
            schema=u2_schema,
        )

    def rev_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("ckey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "c_name": pa.nulls(n, type=pa.string()),
                "rev_c": batch.column("rev_c"),
            },
            schema=u2_schema,
        )

    tagged2 = cust.map_batches(cust_rows, batch_format="pyarrow").union(
        cust_rev.map_batches(rev_rows, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [("c_custkey", pa.int64()), ("c_name", pa.string()), ("revenue_c100", pa.int64())]
    )

    def cust_join_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        rev = np.asarray(t.column("rev_c"), dtype=np.int64)
        name = np.asarray(t.column("c_name"), dtype=object)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        has_cust = side[starts] == 0
        run_rev = np.add.reduceat(rev, starts)
        keep = has_cust & (run_rev > 0)
        if not keep.any():
            return out_schema.empty_table()
        merged = pa.table(
            {
                "c_custkey": pa.array(key[starts[keep]], type=pa.int64()),
                "c_name": pa.array(name[starts[keep]], type=pa.string()),
                "revenue_c100": pa.array(run_rev[keep], type=pa.int64()),
            },
            schema=out_schema,
        )
        if merged.num_rows <= Q10_TOP_K:
            return merged
        topk = pc.sort_indices(
            merged,
            sort_keys=[("revenue_c100", "descending"), ("c_custkey", "ascending")],
        )
        return merged.take(topk.slice(0, Q10_TOP_K))

    parts = _keyed_exchange_apply(tagged2, ["ckey"], cust_join_kernel, out_schema).take_all()
    if not parts:
        return out_schema.empty_table()
    merged = pa.Table.from_pylist(parts, schema=out_schema)
    order = pc.sort_indices(
        merged, sort_keys=[("revenue_c100", "descending"), ("c_custkey", "ascending")]
    )
    return merged.take(order.slice(0, Q10_TOP_K))


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: predicate-pushdown scan aggregate
# ---------------------------------------------------------------------------

Q6_FROM = np.datetime64("1997-01-01", "us")
Q6_TO = np.datetime64("1998-01-01", "us")  # half-open
Q6_DISC_LO, Q6_DISC_HI = 5, 7  # rounded discount %
Q6_MAX_QTY = 24.0


def q_lineitem_discount_revenue(sf_dir: str):
    """TPC-H Q6 shape (forecast-revenue-change): the would-be revenue
    of discounts in a band, one ship-year, small quantities — the
    canonical PREDICATE-PUSHDOWN aggregate. The date band is pushed
    INTO the parquet scan as a dataset filter expression (row groups
    outside the ship-year never decode — at 100 TB this is the
    difference between reading a year and reading everything); the
    residual discount/quantity predicates evaluate vectorized
    per batch, and the whole query folds to ONE (revenue, count)
    partial per block — a driver sum, no exchange of any kind.

    Revenue is INTEGER-EXACT: cents x discount%, summed as int64."""
    import pyarrow.dataset as pds

    _ensure_hash_shuffle()
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        filter=(
            (pds.field("l_shipdate") >= pa.scalar(Q6_FROM.item(), type=pa.timestamp("us")))
            & (pds.field("l_shipdate") < pa.scalar(Q6_TO.item(), type=pa.timestamp("us")))
        ),
    )
    part_schema = pa.schema([("revenue_c100", pa.int64()), ("n_items", pa.int64())])

    def fold_block(batch: pa.Table) -> pa.Table:
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        qty = np.asarray(batch.column("l_quantity"), dtype=np.float64)
        keep = (disc >= Q6_DISC_LO) & (disc <= Q6_DISC_HI) & (qty < Q6_MAX_QTY)
        if not keep.any():
            return part_schema.empty_table()
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64)[keep] * 100.0
        ).astype(np.int64)
        rev = int((cents * disc[keep]).sum())
        return pa.table(
            {
                "revenue_c100": pa.array([rev], type=pa.int64()),
                "n_items": pa.array([int(keep.sum())], type=pa.int64()),
            },
            schema=part_schema,
        )

    rev = n = 0
    for r in ds.map_batches(fold_block, batch_format="pyarrow").take_all():
        rev += int(r["revenue_c100"])
        n += int(r["n_items"])
    return pa.table(
        {
            "revenue_c100": pa.array([rev], type=pa.int64()),
            "n_items": pa.array([n], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# window-over-window trending, weighted sampling, embedding quantization
# ---------------------------------------------------------------------------

TREND_WINDOW_US = 3_600 * 1_000_000  # 1-hour tumbling windows


def q_event_trending(sf_dir: str):
    """Window-over-window TRENDING: event count per (event_type,
    1-hour tumbling window) plus the immediately preceding calendar
    window's count and the delta — the dashboard feed behind spike /
    drop alerting. A window with no predecessor (or a gap) compares
    against 0, the streaming-correct convention.

    Shape: window ids fuse with the scan (integer floor-divide), the
    (type, window) counts fold two-phase (payload = bounded domain x
    blocks, never events), then ONE tiny keyed exchange on event_type
    and a sort + shift kernel computes the lag within each type's
    window sequence — the whole lag stage runs on groups, not rows."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["ts", "event_type"])
    part_schema = pa.schema(
        [("event_type", pa.string()), ("window_us", pa.int64()), ("n", pa.int64())]
    )

    def window_counts(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        us = np.asarray(batch.column("ts").cast(pa.int64()), dtype=np.int64)
        win = (us // TREND_WINDOW_US) * TREND_WINDOW_US
        t = pa.table(
            {"event_type": batch.column("event_type"), "window_us": pa.array(win)}
        )
        agg = t.group_by(["event_type", "window_us"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "event_type": agg.column("event_type"),
                "window_us": agg.column("window_us"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    partial = ds.map_batches(window_counts, batch_format="pyarrow")
    counts = grouped_aggregate(
        partial, ["event_type", "window_us"], [("n", "sum", "n")]
    )
    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("window_us", pa.int64()),
            ("n", pa.int64()),
            ("prev_n", pa.int64()),
            ("delta", pa.int64()),
        ]
    )

    def trend_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block,
            sort_keys=[("event_type", "ascending"), ("window_us", "ascending")],
        )
        t = block.take(order)
        et = np.asarray(t.column("event_type"), dtype=object)
        win = np.asarray(t.column("window_us"), dtype=np.int64)
        n = np.asarray(t.column("n"), dtype=np.int64)
        m = len(et)
        new_key = np.r_[True, et[1:] != et[:-1]]
        prev_n = np.zeros(m, dtype=np.int64)
        adjacent = np.zeros(m, dtype=bool)
        adjacent[1:] = (~new_key[1:]) & (win[1:] == win[:-1] + TREND_WINDOW_US)
        prev_n[1:][adjacent[1:]] = n[:-1][adjacent[1:]]
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "window_us": t.column("window_us"),
                "n": t.column("n"),
                "prev_n": pa.array(prev_n, type=pa.int64()),
                "delta": pa.array(n - prev_n, type=pa.int64()),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(counts, ["event_type"], trend_kernel, out_schema)


WEIGHTED_RATE_NUM = 1000  # keep iff hash % 1e6 < n_chars * RATE


def q_doc_weighted_sample(sf_dir: str):
    """LENGTH-WEIGHTED deterministic sampling: each document is kept
    with probability proportional to its size (n_chars / 1000, capped
    at 1) — the token-budget-aware downsampler (longer docs carry more
    training signal per row, so uniform row sampling under-weights
    them). Same contract as the stratified sampler: a pure integer
    function of doc_id (multiplicative hash), so the sample is
    deterministic, re-partition-stable, and resumable — no RNG state
    anywhere. One fused map+filter, no exchange."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def keep_block(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
        chars = np.asarray(batch.column("n_chars"), dtype=np.int64)
        h = (ids % SPLIT_HASH_MOD).astype(np.uint64) * np.uint64(SPLIT_HASH_MULT)
        h = (h % np.uint64(SPLIT_HASH_MOD)) % np.uint64(1_000_000)
        keep = h.astype(np.int64) < chars * WEIGHTED_RATE_NUM
        return batch.filter(pa.array(keep))

    return ds.map_batches(keep_block, batch_format="pyarrow", zero_copy_batch=True)


def q_embedding_quantize(sf_dir: str):
    """Symmetric INT8 quantization statistics per embedding — the
    export layout ANN serving engines (FAISS SQ8 and friends) consume:
    per-vector absmax scale and the min / max / sum of the quantized
    codes floor(x * 127 / absmax). A pure streaming map (no exchange,
    resume = re-run a shard); the fold reports integers plus the
    floor-scaled scale so the driver compare is bit-exact (absmax is
    an EXACT float32 — abs and max are rounding-free — and the code
    arithmetic is IEEE double on both engines, so floor agrees).

    Kernel: offsets-aware numpy over the arrow list column — absmax
    via maximum.reduceat on |values|, codes in one vectorized double
    pass, per-row folds via reduceat; no per-vector Python."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out_schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("scale_ppm", pa.int64()),
            ("q_min", pa.int64()),
            ("q_max", pa.int64()),
            ("q_sum", pa.int64()),
        ]
    )

    def quant_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        col = batch.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vals32 = np.asarray(col.values, dtype=np.float32)
        offsets = np.asarray(col.offsets, dtype=np.int64)
        starts = offsets[:-1]
        absmax32 = np.maximum.reduceat(np.abs(vals32), starts)
        m = absmax32.astype(np.float64)
        widths = np.diff(offsets)
        m_rep = np.repeat(m, widths)
        with np.errstate(divide="ignore", invalid="ignore"):
            codes = np.floor(vals32.astype(np.float64) * 127.0 / m_rep)
        codes = np.where(m_rep == 0.0, 0.0, codes).astype(np.int64)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "scale_ppm": pa.array(
                    np.floor(m * 1_000_000.0).astype(np.int64), type=pa.int64()
                ),
                "q_min": pa.array(np.minimum.reduceat(codes, starts), type=pa.int64()),
                "q_max": pa.array(np.maximum.reduceat(codes, starts), type=pa.int64()),
                "q_sum": pa.array(np.add.reduceat(codes, starts), type=pa.int64()),
            },
            schema=out_schema,
        )

    return ds.map_batches(quant_block, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# hopping-window approximate distinct users (window x sketch composition)
# ---------------------------------------------------------------------------


HOP_HLL_P = 10  # windowed tiles: 2^10 registers (1 KiB, ~3.2% error)
HOP_HLL_M = 1 << HOP_HLL_P


def q_hop_distinct_users_hll(sf_dir: str):
    """Approximate DISTINCT USERS PER HOPPING WINDOW — the streaming
    dashboard's 'active users in the last 10 minutes, every 5' tile at
    a cardinality where exact per-window sets are unaffordable. This
    composes the catalog's two streaming primitives: the hop-window
    replication of q_event_hop_windows (every event lands in exactly
    W/hop windows, integer arithmetic at the scan) and the MERGEABLE
    HLL sketch of q_approx_distinct_users (register-max is
    order/partition-independent, so overlapping windows cost one
    sketch each, never a distinct-set shuffle).

    Shape: per-block (window, registers) partials — payload bounded by
    windows x blocks x 1 KiB at ANY event cardinality — one tiny keyed
    exchange on window_us, register-max merge + closed-form estimate
    per group. The scatter-max bank folds every window in ONE pass
    (the q_approx_distinct_users kernel, keyed by window instead of
    type)."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    hop_us = HOP_SECONDS * 1_000_000
    n_hops = HOP_WINDOW_SECONDS // HOP_SECONDS
    partial_schema = pa.schema(
        [("window_us", pa.int64()), ("registers", pa.binary())]
    )

    def partial_sketches(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        t_us = np.asarray(batch.column("ts")).astype("datetime64[us]").view(np.int64)
        ws0 = (t_us // hop_us) * hop_us
        users = np.asarray(batch.column("user_id"), dtype=np.int64)
        # hash ONCE per event (the n_hops replicas share user and rank,
        # only the window key differs), then ONE lexsort of the
        # replicated (window, register) pairs drives both groupings —
        # grouped max via reduceat, then a collision-free scatter (an
        # order of magnitude faster than np.maximum.at at this density)
        h = splitmix64(users)
        reg1 = (h >> np.uint64(64 - HOP_HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HOP_HLL_P)) | np.uint64((1 << HOP_HLL_P) - 1)
        rank1 = (np.uint64(64) - _bit_length_u64(rest) + np.uint64(1)).astype(
            np.uint8
        )
        win = np.concatenate([ws0 - k * hop_us for k in range(n_hops)])
        comb = win * np.int64(HOP_HLL_M) + np.tile(reg1, n_hops)
        rank = np.tile(rank1, n_hops)
        order = np.argsort(comb, kind="stable")
        comb_s = comb[order]
        new_pair = np.r_[True, comb_s[1:] != comb_s[:-1]]
        pstarts = np.flatnonzero(new_pair)
        pmax = np.maximum.reduceat(rank[order], pstarts)
        pwin = comb_s[pstarts] // np.int64(HOP_HLL_M)
        preg = comb_s[pstarts] % np.int64(HOP_HLL_M)
        new_win = np.r_[True, pwin[1:] != pwin[:-1]]
        uniq = pwin[new_win]  # window_us values (epoch-us * 2^10 fits int64)
        widx = np.cumsum(new_win) - 1
        bank = np.zeros((len(uniq), HOP_HLL_M), dtype=np.uint8)
        bank[widx, preg] = pmax
        return pa.table(
            {
                "window_us": pa.array(uniq, type=pa.int64()),
                "registers": pa.array([b.tobytes() for b in bank], type=pa.binary()),
            },
            schema=partial_schema,
        )

    partial = ds.map_batches(partial_sketches, batch_format="pyarrow")
    out_schema = pa.schema([("window_us", pa.int64()), ("approx_users", pa.int64())])

    def merge_estimate(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        win = np.asarray(block.column("window_us"), dtype=np.int64)
        blobs = block.column("registers")
        if isinstance(blobs, pa.ChunkedArray):
            blobs = blobs.combine_chunks()
        # every blob is exactly HLL_M bytes, so the binary column's data
        # buffer IS the (rows, HLL_M) register matrix — zero-copy view,
        # then ONE grouped max via maximum.reduceat(axis=0); the only
        # Python loop left is the per-window estimate (domain-bounded)
        boff = np.frombuffer(blobs.buffers()[1], dtype=np.int32)
        lo = int(boff[blobs.offset])
        hi = int(boff[blobs.offset + len(blobs)])
        mat = np.frombuffer(blobs.buffers()[2], dtype=np.uint8)[lo:hi].reshape(
            -1, HOP_HLL_M
        )
        order = np.argsort(win, kind="stable")
        win_s = win[order]
        new_run = np.r_[True, win_s[1:] != win_s[:-1]]
        starts = np.flatnonzero(new_run)
        merged = np.maximum.reduceat(mat[order], starts, axis=0)
        out_n = [hll_estimate(merged[k], HOP_HLL_M) for k in range(len(starts))]
        return pa.table(
            {
                "window_us": pa.array(win_s[starts], type=pa.int64()),
                "approx_users": pa.array(out_n, type=pa.int64()),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(partial, ["window_us"], merge_estimate, out_schema)


# ---------------------------------------------------------------------------
# content-defined chunking dedup (storage-level dedup ratio)
# ---------------------------------------------------------------------------

CDC_CHUNK_Q = 0x100000001B3  # FNV-64 prime (odd -> invertible mod 2^64)
CDC_CHUNK_QINV = pow(CDC_CHUNK_Q, -1, 1 << 64)
CDC_CHUNK_WIN = 8     # rolling-hash window bytes
CDC_CHUNK_DIV = 64    # boundary where window hash % DIV == 0 (~64 B chunks)


def q_doc_chunk_dedup(sf_dir: str):
    """CONTENT-DEFINED CHUNKING dedup ratio — the storage-level dedup
    a 100 TB lake runs under the row-level kinds: split every document
    at positions where an 8-byte rolling polynomial hash lands on a
    fixed residue (so boundaries survive insertions — the rsync/LBFS
    trick), identify chunks by (length, position-normalized polynomial
    hash), and report how much of the byte stream is duplicate chunks.

    Kernel (all vectorized over the block's FLAT utf-8 buffer —
    zero-copy from arrow, no per-doc Python): the rolling window hash
    is 8 shifted multiply-adds in wrapping uint64; chunk hashes come
    from ONE prefix-sum of byte*Q^pos re-based to each chunk start by
    multiplying with the PRECOMPUTED modular-inverse power (Q is odd,
    so Q^-1 mod 2^64 exists) — no per-chunk rehash. Memory is ~24x the
    batch's text bytes (three uint64 arrays), which is the documented
    batch-size knob at scale.

    Distribution: per-block (chunk_hash, len) counts fold in-block,
    ONE keyed exchange merges them (payload = distinct chunks x
    blocks), each output partition folds to a single stats row and the
    driver adds <= blocks rows. Identity is exact-by-construction for
    the oracle (same hash both sides); 64-bit collisions are the
    documented approximation for real corpora."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["text"])
    part_schema = pa.schema(
        [("chash", pa.int64()), ("clen", pa.int64()), ("n", pa.int64())]
    )
    win, div = CDC_CHUNK_WIN, CDC_CHUNK_DIV

    def chunk_block(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        # string arrays carry offsets as buffer 1 (int32 / int64 for
        # large_string) and the flat utf-8 bytes as buffer 2 — zero-copy
        odt = np.int64 if pa.types.is_large_string(col.type) else np.int32
        off32 = np.frombuffer(col.buffers()[1], dtype=odt)
        off = off32[col.offset : col.offset + len(col) + 1].astype(np.int64)
        L = int(off[-1] - off[0])
        if L == 0:
            return part_schema.empty_table()
        data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        b = data[off[0] : off[-1]].astype(np.uint64)
        offs = off - off[0]  # per-doc byte offsets into the flat stream
        q = np.uint64(CDC_CHUNK_Q)
        qp = np.empty(L + 1, dtype=np.uint64)
        qp[0] = 1
        np.cumprod(np.full(L, q, dtype=np.uint64), out=qp[1:])
        qinv = np.uint64(CDC_CHUNK_QINV)
        qip = np.empty(L, dtype=np.uint64)
        qip[0] = 1
        if L > 1:
            np.cumprod(np.full(L - 1, qinv, dtype=np.uint64), out=qip[1:])
        s0 = np.zeros(L + 1, dtype=np.uint64)
        np.cumsum(b * qp[:L], out=s0[1:])
        # rolling window hash ending at i (i >= win-1), g[i] = sum b[i-k]*Q^k
        if L >= win:
            g = np.zeros(L - win + 1, dtype=np.uint64)
            for k in range(win):
                g += b[win - 1 - k : L - k] * qp[k]
            cand = np.flatnonzero(g % np.uint64(div) == 0) + (win - 1)
            # the window must sit inside ONE doc, and a boundary at a
            # doc's last byte is the forced end anyway
            di = np.searchsorted(offs, cand, side="right") - 1
            ok = (cand >= offs[di] + win - 1) & (cand <= offs[di + 1] - 2)
            cand = cand[ok]
        else:
            cand = np.empty(0, dtype=np.int64)
        doc_ends = offs[1:][np.diff(offs) > 0] - 1
        ends = np.sort(np.concatenate([cand, doc_ends]))
        starts = np.r_[0, ends[:-1] + 1]
        clen = ends - starts + 1
        chash = (s0[ends + 1] - s0[starts]) * qip[starts]
        t = pa.table(
            {
                "chash": pa.array(chash.view(np.int64)),
                "clen": pa.array(clen, type=pa.int64()),
            }
        )
        agg = t.group_by(["chash", "clen"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "chash": agg.column("chash"),
                "clen": agg.column("clen"),
                "n": agg.column("count_all").cast(pa.int64()),
            },
            schema=part_schema,
        )

    partial = ds.map_batches(chunk_block, batch_format="pyarrow")
    distinct = grouped_aggregate(partial, ["chash", "clen"], [("n", "sum", "n")])
    stats_schema = pa.schema(
        [
            ("n_chunks", pa.int64()),
            ("n_distinct", pa.int64()),
            ("bytes_total", pa.int64()),
            ("bytes_saved", pa.int64()),
        ]
    )

    def stats_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return stats_schema.empty_table()
        n = np.asarray(block.column("n"), dtype=np.int64)
        clen = np.asarray(block.column("clen"), dtype=np.int64)
        return pa.table(
            {
                "n_chunks": pa.array([int(n.sum())], type=pa.int64()),
                "n_distinct": pa.array([block.num_rows], type=pa.int64()),
                "bytes_total": pa.array([int((n * clen).sum())], type=pa.int64()),
                "bytes_saved": pa.array([int(((n - 1) * clen).sum())], type=pa.int64()),
            },
            schema=stats_schema,
        )

    tot = {"n_chunks": 0, "n_distinct": 0, "bytes_total": 0, "bytes_saved": 0}
    for r in distinct.map_batches(stats_block, batch_format="pyarrow").take_all():
        for k in tot:
            tot[k] += int(r[k])
    dup_pm = (
        1000 * (tot["n_chunks"] - tot["n_distinct"]) // tot["n_chunks"]
        if tot["n_chunks"]
        else 0
    )
    saved_pm = (
        1000 * tot["bytes_saved"] // tot["bytes_total"] if tot["bytes_total"] else 0
    )
    return pa.table(
        {
            "n_chunks": pa.array([tot["n_chunks"]], type=pa.int64()),
            "n_distinct": pa.array([tot["n_distinct"]], type=pa.int64()),
            "dup_chunks_pm": pa.array([dup_pm], type=pa.int64()),
            "bytes_total": pa.array([tot["bytes_total"]], type=pa.int64()),
            "bytes_saved_pm": pa.array([saved_pm], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 / Q14 shapes: left-join distribution, promo revenue share
# ---------------------------------------------------------------------------


def q_customer_order_dist(sf_dir: str):
    """TPC-H Q13 shape (customer distribution): the histogram of
    orders-per-customer INCLUDING zero-order customers — the LEFT-join
    count whose empty side is exactly what an inner join loses. Both
    sides ride ONE tagged-union keyed exchange on custkey; a run with
    a customer row and no order rows counts 0 (the kernel's per-run
    count, not a join result, carries the zero). The (count ->
    customers) histogram folds IN-BLOCK — payload bounded by the
    max-orders-per-customer domain x blocks — and a driver fold merges
    the bounded partials."""
    _ensure_hash_shuffle()
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    union_schema = pa.schema([("ckey", pa.int64()), ("side", pa.int8())])

    def cust_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
            },
            schema=union_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
            },
            schema=union_schema,
        )

    tagged = cust.map_batches(cust_rows, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )
    part_schema = pa.schema([("c_count", pa.int64()), ("custdist", pa.int64())])

    def dist_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        has_cust = side[starts] == 0
        n_orders = np.add.reduceat(side.astype(np.int64), starts)[has_cust]
        if len(n_orders) == 0:
            return part_schema.empty_table()
        hist = np.bincount(n_orders)
        nz = np.flatnonzero(hist >= 1)
        return pa.table(
            {
                "c_count": pa.array(nz.astype(np.int64)),
                "custdist": pa.array(hist[nz].astype(np.int64)),
            },
            schema=part_schema,
        )

    totals: dict[int, int] = {}
    for r in _keyed_exchange_apply(tagged, ["ckey"], dist_kernel, part_schema).take_all():
        totals[int(r["c_count"])] = totals.get(int(r["c_count"]), 0) + int(r["custdist"])
    keys = sorted(totals)
    return pa.table(
        {
            "c_count": pa.array(keys, type=pa.int64()),
            "custdist": pa.array([totals[k] for k in keys], type=pa.int64()),
        }
    )


Q14_FROM = np.datetime64("1997-09-01", "us")
Q14_TO = np.datetime64("1997-10-01", "us")  # half-open ship month


def q_part_promo_share(sf_dir: str):
    """TPC-H Q14 shape (promotion effect): the per-mille share of one
    ship-month's revenue earned by PROMO-type parts. lineitem x part
    is a LARGE x LARGE join at warehouse scale, so both sides ride ONE
    tagged-union keyed exchange on partkey (the Q12 idiom) with the
    ship-month pushed into the lineitem scan; the part side collapses
    to a single int8 is-promo flag AT THE SCAN (the string never
    moves). The kernel folds (promo, total) revenue to ONE partial row
    per block and a driver sum finishes — integer cents end to end,
    the share an exact integer floor(1000 * promo / total)."""
    _ensure_hash_shuffle()
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    line = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    union_schema = pa.schema(
        [("pkey", pa.int64()), ("side", pa.int8()), ("promo", pa.int8()),
         ("rev_c", pa.int64())]
    )

    def part_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "pkey": batch.column("p_partkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "promo": pc.equal(batch.column("p_type"), pa.scalar("PROMO"))
                .cast(pa.int8()),
                "rev_c": pa.array(np.zeros(n, dtype=np.int64)),
            },
            schema=union_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(
                batch.column("l_shipdate"),
                pa.scalar(Q14_FROM.item(), type=pa.timestamp("us")),
            ),
            pc.less(
                batch.column("l_shipdate"),
                pa.scalar(Q14_TO.item(), type=pa.timestamp("us")),
            ),
        )
        t = batch.filter(keep)
        n = t.num_rows
        cents = np.rint(
            np.asarray(t.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(t.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "pkey": t.column("l_partkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "promo": pa.array(np.zeros(n, dtype=np.int8)),
                "rev_c": pa.array(cents * (100 - disc)),
            },
            schema=union_schema,
        )

    tagged = part.map_batches(part_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    part_schema = pa.schema(
        [("promo_rev_c100", pa.int64()), ("total_rev_c100", pa.int64())]
    )

    def share_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("pkey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("pkey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        promo = np.asarray(t.column("promo"), dtype=np.int8)
        rev = np.asarray(t.column("rev_c"), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        has_part = side[starts] == 0
        run_rev = np.add.reduceat(rev, starts)[has_part]
        run_promo = promo[starts][has_part]
        total = int(run_rev.sum())
        if total == 0:
            return part_schema.empty_table()
        return pa.table(
            {
                "promo_rev_c100": pa.array(
                    [int(run_rev[run_promo == 1].sum())], type=pa.int64()
                ),
                "total_rev_c100": pa.array([total], type=pa.int64()),
            },
            schema=part_schema,
        )

    promo_rev = total_rev = 0
    for r in _keyed_exchange_apply(tagged, ["pkey"], share_kernel, part_schema).take_all():
        promo_rev += int(r["promo_rev_c100"])
        total_rev += int(r["total_rev_c100"])
    return pa.table(
        {
            "promo_rev_c100": pa.array([promo_rev], type=pa.int64()),
            "total_rev_c100": pa.array([total_rev], type=pa.int64()),
            "promo_share_pm": pa.array(
                [1000 * promo_rev // total_rev if total_rev else 0], type=pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# first-occurrence novelty, event-type audience affinity
# ---------------------------------------------------------------------------


def q_doc_novelty(sf_dir: str):
    """FIRST-OCCURRENCE novelty: per doc, how many of its distinct
    word 3-grams appear FIRST in this doc (global min doc_id owns the
    gram) — the curriculum/dedup-adjacent signal that separates
    originators from echoes in crawl order. Complements
    ``doc_boilerplate`` (df-based commonness) with attribution.

    Shape: the boilerplate idiom — distinct (doc_id, gram) rows
    explode in-block, ONE gram-keyed exchange makes each gram's
    postings co-resident so min-doc attribution folds in the same
    kernel as the per-doc counts; per-doc sums return through the
    two-phase aggregate and the per-mille is a final streaming map."""
    from embulk_input_marketo_ray.stages.text import doc_grams

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_distinct(batch: pa.Table) -> pa.Table:
        g = doc_grams(batch, n=3)
        if g.num_rows:
            g = g.group_by(["doc_id", "gram"]).aggregate([])
        return g

    grams = ds.map_batches(explode_distinct, batch_format="pyarrow")
    by_gram = _keyed_repartition(grams, _shuffle_width(), ["gram"])
    part_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_novel", pa.int64())]
    )

    def novelty_partial(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(block, sort_keys=[("gram", "ascending")])
        t = block.take(order)
        gram = np.asarray(t.column("gram"), dtype=object)
        doc = np.asarray(t.column("doc_id"), dtype=np.int64)
        new_run = np.r_[True, gram[1:] != gram[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        first_doc = np.minimum.reduceat(doc, starts)  # postings co-resident
        novel = doc == first_doc[run_idx]
        out = pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_grams": pa.array(np.ones(len(doc), dtype=np.int64)),
                "n_novel": pa.array(novel.astype(np.int64)),
            }
        )
        agg = out.group_by(["doc_id"]).aggregate(
            [("n_grams", "sum"), ("n_novel", "sum")]
        )
        return pa.table(
            {
                "doc_id": agg.column("doc_id"),
                "n_grams": agg.column("n_grams_sum"),
                "n_novel": agg.column("n_novel_sum"),
            },
            schema=part_schema,
        )

    partial = by_gram.map_batches(
        novelty_partial, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    per_doc = grouped_aggregate(
        partial,
        ["doc_id"],
        [("n_grams", "sum", "n_grams"), ("n_novel", "sum", "n_novel")],
    )

    def add_pm(batch: pa.Table) -> pa.Table:
        ng = np.asarray(batch.column("n_grams"), dtype=np.int64)
        nv = np.asarray(batch.column("n_novel"), dtype=np.int64)
        return batch.append_column(
            "novelty_pm", pa.array(1000 * nv // np.maximum(ng, 1), type=pa.int64())
        )

    return per_doc.map_batches(add_pm, batch_format="pyarrow", zero_copy_batch=True)


def q_event_type_affinity(sf_dir: str):
    """Audience AFFINITY matrix: for every unordered pair of event
    types, how many users did BOTH — the overlap grid behind
    cross-sell / funnel-design analytics (a set-similarity join whose
    sets are keyed by user). The type domain is small by construction,
    so pairs per user are bounded (|types| choose 2).

    Shape: distinct (user, type) pairs fold in-block FIRST (payload =
    users x their distinct types, never events), ONE keyed exchange on
    user_id co-locates each user's type set, the kernel emits its
    pairs via one triu fan-out per block (the co_change idiom) and
    folds them to <= |types|^2 partial rows; a driver fold merges the
    bounded partials."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def distinct_block(batch: pa.Table) -> pa.Table:
        return batch.group_by(["user_id", "event_type"]).aggregate([])

    pairs_schema = pa.schema(
        [("type_a", pa.string()), ("type_b", pa.string()), ("n_users", pa.int64())]
    )

    def affinity_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pairs_schema.empty_table()
        # the exchange may concatenate duplicate (user, type) rows from
        # different source blocks: dedup again, then sort by user/type
        block = block.group_by(["user_id", "event_type"]).aggregate([])
        order = pc.sort_indices(
            block,
            sort_keys=[("user_id", "ascending"), ("event_type", "ascending")],
        )
        t = block.take(order)
        user = np.asarray(t.column("user_id"), dtype=np.int64)
        et = np.asarray(t.column("event_type"), dtype=object)
        n = len(user)
        new_run = np.r_[True, user[1:] != user[:-1]]
        starts = np.flatnonzero(new_run)
        sizes = np.diff(np.r_[starts, n])
        # triu fan-out: for a run of k types, k*(k-1)/2 ordered pairs.
        # The loop runs over (i, j) OFFSET pairs — bounded by the type
        # domain squared, never by the number of users — and each
        # iteration selects every qualifying run at once.
        if int((sizes * (sizes - 1) // 2).sum()) == 0:
            return pairs_schema.empty_table()
        kmax = int(sizes.max())
        a_idx, b_idx = [], []
        for i in range(kmax - 1):
            for j in range(i + 1, kmax):
                m = sizes > j
                a_idx.append(starts[m] + i)
                b_idx.append(starts[m] + j)
        a = np.concatenate(a_idx)
        b = np.concatenate(b_idx)
        out = pa.table(
            {
                "type_a": pa.array(et[a], type=pa.string()),
                "type_b": pa.array(et[b], type=pa.string()),
            }
        )
        agg = out.group_by(["type_a", "type_b"]).aggregate([([], "count_all")])
        return pa.table(
            {
                "type_a": agg.column("type_a"),
                "type_b": agg.column("type_b"),
                "n_users": agg.column("count_all").cast(pa.int64()),
            },
            schema=pairs_schema,
        )

    distinct = ds.map_batches(distinct_block, batch_format="pyarrow")
    partial = _keyed_exchange_apply(distinct, ["user_id"], affinity_kernel, pairs_schema)
    totals: dict[tuple[str, str], int] = {}
    for r in partial.take_all():
        k = (r["type_a"], r["type_b"])
        totals[k] = totals.get(k, 0) + int(r["n_users"])
    keys = sorted(totals)
    return pa.table(
        {
            "type_a": pa.array([k[0] for k in keys], type=pa.string()),
            "type_b": pa.array([k[1] for k in keys], type=pa.string()),
            "n_users": pa.array([totals[k] for k in keys], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# remaining TPC-H join/aggregate shapes: Q15 argmax-with-ties, Q16 grouped
# count-distinct, Q17 per-key scalar-subquery filter, Q22 global-scalar +
# anti-join composition
# ---------------------------------------------------------------------------

Q15_FROM = np.datetime64("1996-01-01", "us")
Q15_TO = np.datetime64("1996-04-01", "us")  # half-open ship quarter


def q_top_supplier_revenue(sf_dir: str):
    """TPC-H Q15 shape (top supplier): the supplier(s) with MAXIMUM
    revenue in one ship-quarter, ties kept — the argmax-over-aggregate
    shape (the reference view + WHERE total = (SELECT max ...)).

    Shape: the quarter is pushed INTO the lineitem scan; revenue folds
    per supplier IN-BLOCK first (payload = suppliers x blocks, never
    lineitems), the two-phase grouped aggregate merges partials, and
    the argmax-with-ties runs on the driver over the per-supplier
    result — bounded by the SUPPLIER DIMENSION, which at 100 TB is
    still a dimension table (the same contract as every driver fold in
    this catalog). Supplier names attach driver-side from the
    dimension read. Revenue is INTEGER-EXACT cents x (100 - disc%).

    Ref: the reference exposes only per-entity streams
    (MarketoService.java); this is the downstream "who won the
    quarter" report its users build."""
    import pyarrow.dataset as pds

    _ensure_hash_shuffle()
    line = _read(
        sf_dir,
        "lineitem",
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        filter=(
            (pds.field("l_shipdate") >= pa.scalar(Q15_FROM.item(), type=pa.timestamp("us")))
            & (pds.field("l_shipdate") < pa.scalar(Q15_TO.item(), type=pa.timestamp("us")))
        ),
    )
    part_schema = pa.schema([("s_suppkey", pa.int64()), ("revenue_c10k", pa.int64())])

    def rev_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "s_suppkey": batch.column("l_suppkey").cast(pa.int64()),
                "revenue_c10k": pa.array(cents * (100 - disc), type=pa.int64()),
            }
        )
        agg = t.group_by(["s_suppkey"]).aggregate([("revenue_c10k", "sum")])
        return agg.rename_columns(["s_suppkey", "revenue_c10k"])

    per_supp = grouped_aggregate(
        line.map_batches(rev_partial, batch_format="pyarrow"),
        ["s_suppkey"],
        [("revenue_c10k", "sum", "revenue_c10k")],
    )
    rows = per_supp.take_all()  # bounded by the supplier dimension
    if not rows:
        return pa.table(
            {
                "s_suppkey": pa.array([], type=pa.int64()),
                "s_name": pa.array([], type=pa.string()),
                "revenue_c10k": pa.array([], type=pa.int64()),
            }
        )
    best = max(int(r["revenue_c10k"]) for r in rows)
    winners = sorted(
        int(r["s_suppkey"]) for r in rows if int(r["revenue_c10k"]) == best
    )
    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    names = {
        int(k): str(v)
        for k, v in zip(
            np.asarray(sup.column("s_suppkey"), dtype=np.int64),
            sup.column("s_name").to_pylist(),
        )
    }
    # inner-join semantics (matching the SQL oracle): a winning suppkey
    # absent from the supplier dimension is DROPPED, not a KeyError — a
    # referential-integrity gap must not diverge Ray vs oracle behavior
    winners = [k for k in winners if k in names]
    return pa.table(
        {
            "s_suppkey": pa.array(winners, type=pa.int64()),
            "s_name": pa.array([names[k] for k in winners], type=pa.string()),
            "revenue_c10k": pa.array([best] * len(winners), type=pa.int64()),
        }
    )


Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 4, 7, 10)


def q_supplier_part_counts(sf_dir: str):
    """TPC-H Q16 shape (parts/supplier relationship): how many DISTINCT
    suppliers ship each (brand, type, size) combination, excluding one
    brand and one type and restricted to a size set — grouped COUNT
    DISTINCT where the distinct key (the supplier) is NOT the grouping
    key. The part-supplier relation derives from lineitem (this
    dataset's partsupp analog).

    Shape: (partkey, suppkey) pairs dedup IN-BLOCK first, then part
    attrs attach via ONE tagged-union keyed exchange on partkey (the
    Q12/Q14 idiom — parts are filtered AT THE SCAN so excluded rows
    never ride); the kernel emits distinct (brand, type, size, skey)
    rows; the global distinct + per-group count run through the
    two-phase aggregate twice, both bounded by the attribute x supplier
    DOMAIN, never by lineitem rows."""
    _ensure_hash_shuffle()
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_type", "p_size"])
    line = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])
    union_schema = pa.schema(
        [
            ("pkey", pa.int64()),
            ("side", pa.int8()),
            ("brand", pa.string()),
            ("ptype", pa.string()),
            ("size", pa.int64()),
            ("skey", pa.int64()),
        ]
    )

    def part_rows(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.not_equal(batch.column("p_brand"), pa.scalar(Q16_EXCL_BRAND)),
                pc.not_equal(batch.column("p_type"), pa.scalar(Q16_EXCL_TYPE)),
            ),
            pc.is_in(
                batch.column("p_size").cast(pa.int64()),
                value_set=pa.array(list(Q16_SIZES), type=pa.int64()),
            ),
        )
        t = batch.filter(keep)
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("p_partkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "brand": t.column("p_brand"),
                "ptype": t.column("p_type"),
                "size": t.column("p_size").cast(pa.int64()),
                "skey": pa.nulls(n, type=pa.int64()),
            },
            schema=union_schema,
        )

    def pair_rows(batch: pa.Table) -> pa.Table:
        t = batch.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("l_partkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "brand": pa.nulls(n, type=pa.string()),
                "ptype": pa.nulls(n, type=pa.string()),
                "size": pa.nulls(n, type=pa.int64()),
                "skey": t.column("l_suppkey").cast(pa.int64()),
            },
            schema=union_schema,
        )

    tagged = part.map_batches(part_rows, batch_format="pyarrow").union(
        line.map_batches(pair_rows, batch_format="pyarrow")
    )
    quad_schema = pa.schema(
        [
            ("brand", pa.string()),
            ("ptype", pa.string()),
            ("size", pa.int64()),
            ("skey", pa.int64()),
        ]
    )

    def attach_attrs(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return quad_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("pkey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("pkey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        # a qualifying part row (side 0) sorts first in its run; runs
        # without one (filtered part or partkey gap) drop entirely
        has_part = side[starts] == 0
        is_pair = (side == 1) & has_part[run_idx]
        if not is_pair.any():
            return quad_schema.empty_table()
        src = starts[run_idx[is_pair]]  # the run's part row
        sel = t.filter(pa.array(is_pair))
        take = pa.array(src.astype(np.int64))
        return pa.table(
            {
                "brand": t.column("brand").take(take),
                "ptype": t.column("ptype").take(take),
                "size": t.column("size").take(take),
                "skey": sel.column("skey"),
            },
            schema=quad_schema,
        )

    quads = _keyed_exchange_apply(tagged, ["pkey"], attach_attrs, quad_schema)
    distinct = grouped_aggregate(quads, ["brand", "ptype", "size", "skey"], [])
    return grouped_aggregate(
        distinct,
        ["brand", "ptype", "size"],
        [("skey", "count", "supplier_cnt")],
    )


Q17_BRAND = "Brand#13"


def q_part_small_qty(sf_dir: str):
    """TPC-H Q17 shape (small-quantity-order revenue): total revenue of
    lineitems of one brand's parts whose quantity is below 20% of that
    PART's average quantity — the correlated-scalar-subquery filter
    (each row compared against ITS OWN group's aggregate).

    Shape: ONE tagged-union keyed exchange on partkey (parts filtered
    to the brand AT THE SCAN) makes each part's lineitems co-resident;
    the kernel folds the per-part mean and applies the 20% test in the
    SAME pass — the comparison ``qty < sum/(5*n)`` evaluates as the
    INTEGER cross-product ``5*qty*n < sum`` (quantities are integral),
    so no float division touches the gate. Each block leaves ONE
    partial row; a driver sum finishes. avg_yearly is the TPC-H /7.0,
    kept integer as floor(total/7)."""
    _ensure_hash_shuffle()
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    line = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    union_schema = pa.schema(
        [
            ("pkey", pa.int64()),
            ("side", pa.int8()),
            ("qty", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def part_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("p_brand"), pa.scalar(Q17_BRAND)))
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("p_partkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "qty": pa.nulls(n, type=pa.int64()),
                "cents": pa.nulls(n, type=pa.int64()),
            },
            schema=union_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        qty = np.rint(np.asarray(batch.column("l_quantity"), dtype=np.float64)).astype(
            np.int64
        )
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "pkey": batch.column("l_partkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "qty": pa.array(qty),
                "cents": pa.array(cents),
            },
            schema=union_schema,
        )

    tagged = part.map_batches(part_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    part_schema = pa.schema([("total_c100", pa.int64()), ("n_small", pa.int64())])

    def small_qty_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("pkey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        side = np.asarray(t.column("side"), dtype=np.int8)
        key = np.asarray(t.column("pkey"), dtype=np.int64)
        qty = np.asarray(
            t.column("qty").fill_null(0), dtype=np.int64
        )
        cents = np.asarray(t.column("cents").fill_null(0), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        has_part = side[starts] == 0
        is_line = side == 1
        n_per = np.add.reduceat(is_line.astype(np.int64), starts)
        sq_per = np.add.reduceat(np.where(is_line, qty, 0), starts)
        # qty < 0.2 * (sum/n)  <=>  5*qty*n < sum   (exact int64)
        small = (
            is_line
            & has_part[run_idx]
            & (5 * qty * n_per[run_idx] < sq_per[run_idx])
        )
        if not small.any():
            return part_schema.empty_table()
        return pa.table(
            {
                "total_c100": pa.array([int(cents[small].sum())], type=pa.int64()),
                "n_small": pa.array([int(small.sum())], type=pa.int64()),
            },
            schema=part_schema,
        )

    total = n = 0
    for r in _keyed_exchange_apply(tagged, ["pkey"], small_qty_kernel, part_schema).take_all():
        total += int(r["total_c100"])
        n += int(r["n_small"])
    return pa.table(
        {
            "total_c100": pa.array([total], type=pa.int64()),
            "n_small": pa.array([n], type=pa.int64()),
            "avg_yearly_c100": pa.array([total // 7], type=pa.int64()),
        }
    )


Q22_RECENT = np.datetime64("2001-01-01", "us")


def q_idle_customer_balance(sf_dir: str):
    """TPC-H Q22 shape (global-opportunity): per nation, the count and
    total balance of customers whose balance exceeds the GLOBAL mean of
    positive balances AND who placed no RECENT order (no order on/after
    ``Q22_RECENT``; in this dataset every customer has SOME order, so
    the recency window is what makes the anti-join discriminating) —
    the uncorrelated scalar subquery composed with NOT EXISTS.

    Shape: pass 1 folds (sum, count) of positive balances to one
    partial per block (a driver sum — no exchange); the mean comparison
    evaluates as the INTEGER cross-product ``bal*count > sum`` so the
    scalar gate is exact. Pass 2 is the anti-join idiom: qualifying
    customers and recent-order custkeys ride ONE tagged-union exchange
    (the probe side filtered AT THE SCAN), the kernel keeps customer
    runs with no probe row and folds per-nation (count, balance)
    partials IN-BLOCK — the final fold moves only nation-domain rows,
    assembled driver-side into a schema-stable table (empty results
    keep their columns)."""
    _ensure_hash_shuffle()
    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    scan = _read(sf_dir, "customer", columns=["c_acctbal"])
    stat_schema = pa.schema([("s", pa.int64()), ("n", pa.int64())])

    def bal_partial(batch: pa.Table) -> pa.Table:
        bal = np.rint(
            np.asarray(batch.column("c_acctbal"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        pos = bal > 0
        if not pos.any():
            return stat_schema.empty_table()
        return pa.table(
            {
                "s": pa.array([int(bal[pos].sum())], type=pa.int64()),
                "n": pa.array([int(pos.sum())], type=pa.int64()),
            },
            schema=stat_schema,
        )

    S = N = 0
    for r in scan.map_batches(bal_partial, batch_format="pyarrow").take_all():
        S += int(r["s"])
        N += int(r["n"])

    union_schema = pa.schema(
        [
            ("ckey", pa.int64()),
            ("side", pa.int8()),
            ("nation", pa.int64()),
            ("bal_c100", pa.int64()),
        ]
    )

    def customer_rows(batch: pa.Table) -> pa.Table:
        bal = np.rint(
            np.asarray(batch.column("c_acctbal"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        keep = bal * N > S  # bal > S/N, exact in int64
        t = batch.filter(pa.array(keep))
        n = t.num_rows
        return pa.table(
            {
                "ckey": t.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nation": t.column("c_nationkey").cast(pa.int64()),
                "bal_c100": pa.array(bal[keep]),
            },
            schema=union_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        recent = batch.filter(
            pc.greater_equal(
                batch.column("o_orderdate"),
                pa.scalar(Q22_RECENT.item(), type=pa.timestamp("us")),
            )
        )
        t = recent.group_by(["o_custkey"]).aggregate([])
        n = t.num_rows
        return pa.table(
            {
                "ckey": t.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "nation": pa.nulls(n, type=pa.int64()),
                "bal_c100": pa.nulls(n, type=pa.int64()),
            },
            schema=union_schema,
        )

    customer = _read(sf_dir, "customer", columns=cust_cols)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    tagged = customer.map_batches(customer_rows, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )
    part_schema = pa.schema(
        [
            ("nationkey", pa.int64()),
            ("numcust", pa.int64()),
            ("totacctbal_c100", pa.int64()),
        ]
    )

    def idle_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        run_idx = np.cumsum(new_run) - 1
        starts = np.flatnonzero(new_run)
        has_order = np.logical_or.reduceat(side == 1, starts)
        keep = (side == 0) & ~has_order[run_idx]
        if not keep.any():
            return part_schema.empty_table()
        sel = t.filter(pa.array(keep))
        agg = (
            pa.table(
                {
                    "nationkey": sel.column("nation"),
                    "numcust": pa.array(np.ones(sel.num_rows, dtype=np.int64)),
                    "totacctbal_c100": sel.column("bal_c100"),
                }
            )
            .group_by(["nationkey"])
            .aggregate([("numcust", "sum"), ("totacctbal_c100", "sum")])
        )
        return agg.rename_columns(["nationkey", "numcust", "totacctbal_c100"]).cast(
            part_schema
        )

    partial = _keyed_exchange_apply(tagged, ["ckey"], idle_kernel, part_schema)
    counts: dict[int, int] = {}
    bals: dict[int, int] = {}
    for r in partial.take_all():  # bounded by the nation domain x blocks
        k = int(r["nationkey"])
        counts[k] = counts.get(k, 0) + int(r["numcust"])
        bals[k] = bals.get(k, 0) + int(r["totacctbal_c100"])
    keys = sorted(counts)
    return pa.table(
        {
            "nationkey": pa.array(keys, type=pa.int64()),
            "numcust": pa.array([counts[k] for k in keys], type=pa.int64()),
            "totacctbal_c100": pa.array([bals[k] for k in keys], type=pa.int64()),
        }
    )


Q7_NATION_A = "NATION_3"
Q7_NATION_B = "NATION_7"
Q7_FROM = np.datetime64("1996-01-01", "us")
Q7_TO = np.datetime64("1998-01-01", "us")  # half-open two ship-years


def q_nation_pair_volume(sf_dir: str):
    """TPC-H Q7 shape (volume shipping): revenue between TWO specific
    nations per direction per ship-year — supplier nation from the
    selling side, customer nation via orders. The Q5 pipeline's
    two-chained-exchange backbone with a PAIR filter instead of the
    equality filter and a (pair x year) output grid.

    - customers are filtered to the two nations AT THE SCAN (driver
      resolves names -> keys from the 25-row dimension);
    - exchange #1 (customer x orders on custkey) stamps each order
      with its customer's nation and ships only (okey, cust_nation);
    - exchange #2 (that stream x lineitem on orderkey): the ship-year
      window prunes the lineitem SCAN, supplier nations attach via
      ``_attach_supplier_nation`` (budget-adaptive broadcast / third
      keyed exchange), and the kernel keeps only the two cross pairs,
      folding (supp, cust, year) partials IN-BLOCK — each block leaves
      <= 2 x years rows; a driver fold + name attach finish. Revenue
      integer-exact cents x (100 - disc%)."""
    _ensure_hash_shuffle()
    import pyarrow.dataset as pds

    nation = pq.read_table(_t(sf_dir, "nation"))
    key_of = {
        str(n): int(k)
        for n, k in zip(
            nation.column("n_name").to_pylist(),
            np.asarray(nation.column("n_nationkey")),
        )
    }
    ka, kb = key_of[Q7_NATION_A], key_of[Q7_NATION_B]
    name_of = {ka: Q7_NATION_A, kb: Q7_NATION_B}

    # ---- exchange #1: customer x orders on the customer key ----------
    u1_schema = pa.schema(
        [
            ("ckey", pa.int64()),
            ("side", pa.int8()),
            ("nation", pa.int64()),
            ("okey", pa.int64()),
        ]
    )

    def customer_rows(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
        t = batch.filter(pa.array((nk == ka) | (nk == kb)))
        n = t.num_rows
        return pa.table(
            {
                "ckey": t.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "nation": t.column("c_nationkey").cast(pa.int64()),
                "okey": pa.nulls(n, type=pa.int64()),
            },
            schema=u1_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "nation": pa.nulls(n, type=pa.int64()),
                "okey": batch.column("o_orderkey").cast(pa.int64()),
            },
            schema=u1_schema,
        )

    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    tagged1 = customer.map_batches(customer_rows, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    s1_schema = pa.schema([("okey", pa.int64()), ("cust_nation", pa.int64())])

    def gather_nation(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return s1_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        nat_v = np.asarray(pc.fill_null(t.column("nation"), -1), dtype=np.int64)
        okey_v = np.asarray(pc.fill_null(t.column("okey"), -1), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_has_cust = side[starts] == 0
        run_nation = np.where(run_has_cust, nat_v[starts], -1)
        row_nation = run_nation[run_idx]
        keep = (side == 1) & (row_nation >= 0)
        if not keep.any():
            return s1_schema.empty_table()
        return pa.table(
            {
                "okey": pa.array(okey_v[keep]),
                "cust_nation": pa.array(row_nation[keep]),
            },
            schema=s1_schema,
        )

    stage1 = _keyed_exchange_apply(tagged1, ["ckey"], gather_nation, s1_schema)

    # ---- exchange #2: stage1 x lineitem on the order key --------------
    u2_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("cust_nation", pa.int64()),
            ("supp_nation", pa.int64()),
            ("l_year", pa.int64()),
            ("rev_c", pa.int64()),
        ]
    )

    def stage1_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "cust_nation": batch.column("cust_nation"),
                "supp_nation": pa.nulls(n, type=pa.int64()),
                "l_year": pa.nulls(n, type=pa.int64()),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u2_schema,
        )

    line_pay_schema = pa.schema(
        [("okey", pa.int64()), ("l_year", pa.int64()), ("rev_c", pa.int64())]
    )

    def line_payload(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "skey": batch.column("l_suppkey").cast(pa.int64()),
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "l_year": pc.year(batch.column("l_shipdate")).cast(pa.int64()),
                "rev_c": pa.array(cents * (100 - disc)),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        # only the two nations' suppliers can contribute: prune before
        # exchange #2 (post-attach, pre-orderkey-exchange)
        sn = np.asarray(batch.column("supp_nation"), dtype=np.int64)
        t = batch.filter(pa.array((sn == ka) | (sn == kb)))
        n = t.num_rows
        return pa.table(
            {
                "okey": t.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "cust_nation": pa.nulls(n, type=pa.int64()),
                "supp_nation": t.column("supp_nation"),
                "l_year": t.column("l_year"),
                "rev_c": t.column("rev_c"),
            },
            schema=u2_schema,
        )

    lineitem = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_orderkey",
            "l_suppkey",
            "l_shipdate",
            "l_extendedprice",
            "l_discount",
        ],
        filter=(
            (pds.field("l_shipdate") >= pa.scalar(Q7_FROM.item(), type=pa.timestamp("us")))
            & (pds.field("l_shipdate") < pa.scalar(Q7_TO.item(), type=pa.timestamp("us")))
        ),
    )
    attached = _attach_supplier_nation(
        sf_dir,
        lineitem.map_batches(line_payload, batch_format="pyarrow"),
        line_pay_schema,
    )
    tagged2 = stage1.map_batches(stage1_rows, batch_format="pyarrow").union(
        attached.map_batches(line_rows, batch_format="pyarrow")
    )

    part_schema = pa.schema(
        [
            ("supp_nation", pa.int64()),
            ("cust_nation", pa.int64()),
            ("l_year", pa.int64()),
            ("revenue_c10k", pa.int64()),
        ]
    )

    def pair_volume(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        cn = np.asarray(pc.fill_null(t.column("cust_nation"), -1), dtype=np.int64)
        sn = np.asarray(pc.fill_null(t.column("supp_nation"), -2), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_has_order = side[starts] == 0
        run_cn = np.where(run_has_order, cn[starts], -1)
        row_cn = run_cn[run_idx]
        keep = (side == 1) & (((sn == ka) & (row_cn == kb)) | ((sn == kb) & (row_cn == ka)))
        if not keep.any():
            return part_schema.empty_table()
        part = pa.table(
            {
                "supp_nation": pa.array(sn[keep]),
                "cust_nation": pa.array(row_cn[keep]),
                "l_year": t.column("l_year").filter(pa.array(keep)),
                "revenue_c10k": t.column("rev_c").filter(pa.array(keep)),
            },
            schema=part_schema,
        )
        agg = part.group_by(["supp_nation", "cust_nation", "l_year"]).aggregate(
            [("revenue_c10k", "sum")]
        )
        return agg.rename_columns(
            ["supp_nation", "cust_nation", "l_year", "revenue_c10k"]
        ).cast(part_schema)

    partial = _keyed_exchange_apply(tagged2, ["okey"], pair_volume, part_schema)
    totals: dict[tuple[int, int, int], int] = {}
    for r in partial.take_all():  # <= 2 pairs x years x blocks
        k = (int(r["supp_nation"]), int(r["cust_nation"]), int(r["l_year"]))
        totals[k] = totals.get(k, 0) + int(r["revenue_c10k"])
    keys = sorted(totals)
    return pa.table(
        {
            "supp_nation": pa.array([name_of[k[0]] for k in keys], type=pa.string()),
            "cust_nation": pa.array([name_of[k[1]] for k in keys], type=pa.string()),
            "l_year": pa.array([k[2] for k in keys], type=pa.int64()),
            "revenue_c10k": pa.array([totals[k] for k in keys], type=pa.int64()),
        }
    )


# TPC-H Q19 disjunctive clauses: (brand, max size, qty range) triples.
Q19_CLAUSES = (
    ("Brand#1", 5, 1, 11),
    ("Brand#2", 10, 10, 20),
    ("Brand#3", 15, 20, 30),
)


def q_disjunctive_part_revenue(sf_dir: str):
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    revenue of lineitems matching ANY of three (brand, size-range,
    quantity-range) clause conjunctions — the OR-of-ANDs join predicate
    that defeats naive pushdown because each clause constrains BOTH
    sides of the join.

    Shape: each part collapses AT THE SCAN to an int8 CLAUSE BITMASK
    (bit i set = this part satisfies clause i's brand+size conjunct;
    parts matching no clause never ride); each lineitem computes its
    quantity bitmask the same way; both sides share ONE tagged-union
    exchange on partkey and the kernel's disjunction is a single
    ``part_mask & qty_mask != 0`` — no string ever crosses the
    exchange, and the OR costs one AND per row. One partial row per
    block, driver sum."""
    _ensure_hash_shuffle()
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])
    line = _read(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    union_schema = pa.schema(
        [
            ("pkey", pa.int64()),
            ("side", pa.int8()),
            ("mask", pa.int8()),
            ("rev_c", pa.int64()),
        ]
    )

    def part_rows(batch: pa.Table) -> pa.Table:
        brand = np.asarray(batch.column("p_brand"), dtype=object)
        size = np.asarray(batch.column("p_size"), dtype=np.int64)
        mask = np.zeros(len(brand), dtype=np.int8)
        for i, (b, smax, _, _) in enumerate(Q19_CLAUSES):
            mask |= ((brand == b) & (size >= 1) & (size <= smax)).astype(np.int8) << i
        t = batch.filter(pa.array(mask != 0))
        m = mask[mask != 0]
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("p_partkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "mask": pa.array(m),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=union_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        qty = np.rint(np.asarray(batch.column("l_quantity"), dtype=np.float64)).astype(
            np.int64
        )
        mask = np.zeros(len(qty), dtype=np.int8)
        for i, (_, _, qlo, qhi) in enumerate(Q19_CLAUSES):
            mask |= ((qty >= qlo) & (qty <= qhi)).astype(np.int8) << i
        t = batch.filter(pa.array(mask != 0))
        m = mask[mask != 0]
        cents = np.rint(
            np.asarray(t.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(t.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("l_partkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "mask": pa.array(m),
                "rev_c": pa.array(cents * (100 - disc)),
            },
            schema=union_schema,
        )

    tagged = part.map_batches(part_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    part_schema = pa.schema([("revenue_c10k", pa.int64()), ("n_items", pa.int64())])

    def disjunction_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("pkey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("pkey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        mask = np.asarray(t.column("mask"), dtype=np.int8)
        rev = np.asarray(pc.fill_null(t.column("rev_c"), 0), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        has_part = side[starts] == 0
        part_mask = np.where(has_part, mask[starts], 0).astype(np.int8)
        keep = (side == 1) & ((part_mask[run_idx] & mask) != 0)
        if not keep.any():
            return part_schema.empty_table()
        return pa.table(
            {
                "revenue_c10k": pa.array([int(rev[keep].sum())], type=pa.int64()),
                "n_items": pa.array([int(keep.sum())], type=pa.int64()),
            },
            schema=part_schema,
        )

    rev = n = 0
    for r in _keyed_exchange_apply(
        tagged, ["pkey"], disjunction_kernel, part_schema
    ).take_all():
        rev += int(r["revenue_c10k"])
        n += int(r["n_items"])
    return pa.table(
        {
            "revenue_c10k": pa.array([rev], type=pa.int64()),
            "n_items": pa.array([n], type=pa.int64()),
        }
    )


def q_doc_surprisal(sf_dir: str):
    """Unigram SURPRISAL score (perplexity proxy): per document, the
    summed information content of its token occurrences against the
    corpus unigram model, measured in INTEGER BITS —
    ``bits(total_tokens) - bits(count(token))`` per occurrence, where
    ``bits(v)`` is the bit length of v (floor(log2)+1). High mean =
    rare-token-heavy documents (OOV junk or genuinely novel text), low
    mean = boilerplate; the exact-integer stand-in for the LM
    perplexity filters of web-corpus pipelines, bit-stable against the
    SQL oracle (no float log ever computed).

    Shape: (1) global token counts via the two-phase grouped aggregate;
    (2) the corpus total folds driver-side from per-block partial sums
    of that SMALL count table; (3) docs explode to distinct
    (doc_id, token, k) rows in-block and the count attach is BUDGETED —
    a vocab at or under the broadcast limit ships once as sorted arrays
    and the per-doc fold happens in the SAME streaming pass (one doc's
    pairs never leave their block), a web-scale vocab falls back to one
    keyed hash join + grouped aggregate. bits() is np.frexp's exponent
    — exact for int64 counts (< 2^53). Zero-token docs drop
    (inner-join semantics, matching the oracle)."""
    from embulk_input_marketo_ray.stages.dedup import drop_schemaless_blocks

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets)
        doc_of = (
            np.searchsorted(offsets, np.arange(len(flat), dtype=np.int64), side="right")
            - 1
        )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)[doc_of]
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "token": flat}).filter(
            pc.not_equal(flat, pa.scalar(""))
        )
        out = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["k" if c == "count_all" else c for c in out.column_names]
        ).select(["doc_id", "token", "k"])

    def token_counts_block(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = pa.table({"token": toks.flatten()})
        flat = flat.filter(pc.not_equal(flat.column("token"), pa.scalar("")))
        out = flat.group_by(["token"]).aggregate([([], "count_all")])
        return out.rename_columns(
            ["n" if c == "count_all" else c for c in out.column_names]
        ).select(["token", "n"])

    counts = grouped_aggregate(
        ds.map_batches(token_counts_block, batch_format="pyarrow"),
        ["token"],
        [("n", "sum", "n")],
    )
    counts = drop_schemaless_blocks(
        counts.materialize(), pa.schema([("token", pa.string()), ("n", pa.int64())])
    )

    def total_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {"t": pa.array([int(pc.sum(b.column("n")).as_py() or 0)], type=pa.int64())}
        )

    total = 0
    for r in counts.map_batches(total_partial, batch_format="pyarrow").take_all():
        total += int(r["t"])
    total_bits = int(total).bit_length()

    def _bits(v: np.ndarray) -> np.ndarray:
        # frexp: v = m * 2^e with m in [0.5, 1) -> e == bit_length(v),
        # exact for every int64 count below 2^53
        return np.frexp(v.astype(np.float64))[1].astype(np.int64)

    pairs = ds.map_batches(explode_tokens, batch_format="pyarrow")
    out_names = ["doc_id", "n_tokens", "sum_bits", "mean_millibits"]

    vocab_ref = _budgeted_vocab_broadcast(counts, "token", "n", COLLOC_BROADCAST_VOCAB)
    if vocab_ref is not None:

        def fold_block(b: pa.Table) -> pa.Table:
            empty = pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_tokens": pa.array([], type=pa.int64()),
                    "sum_bits": pa.array([], type=pa.int64()),
                    "mean_millibits": pa.array([], type=pa.int64()),
                }
            )
            if b.num_rows == 0:
                return empty
            tokens, ns = ray.get(vocab_ref)
            tok = np.asarray(b.column("token"), dtype=object)
            n = ns[np.searchsorted(tokens, tok)]
            k = np.asarray(b.column("k"), dtype=np.int64)
            t = pa.table(
                {
                    "doc_id": b.column("doc_id").cast(pa.int64()),
                    "w": pa.array(k * (total_bits - _bits(n)), type=pa.int64()),
                    "k": pa.array(k, type=pa.int64()),
                }
            )
            g = t.group_by(["doc_id"]).aggregate([("w", "sum"), ("k", "sum")])
            sum_bits = np.asarray(g.column("w_sum"), dtype=np.int64)
            n_tokens = np.asarray(g.column("k_sum"), dtype=np.int64)
            return pa.table(
                {
                    "doc_id": g.column("doc_id"),
                    "n_tokens": pa.array(n_tokens),
                    "sum_bits": pa.array(sum_bits),
                    "mean_millibits": pa.array(
                        1000 * sum_bits // np.maximum(n_tokens, 1), type=pa.int64()
                    ),
                }
            )

        return pairs.map_batches(fold_block, batch_format="pyarrow")

    joined = pairs.join(
        counts,
        "inner",
        num_partitions=max(8, _shuffle_width() // 2),
        on=("token",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def weight(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch.column("k"), dtype=np.int64)
        n = np.asarray(batch.column("n"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "w": pa.array(k * (total_bits - _bits(n)), type=pa.int64()),
                "k": pa.array(k, type=pa.int64()),
            }
        )

    folded = grouped_aggregate(
        joined.map_batches(weight, batch_format="pyarrow"),
        ["doc_id"],
        [("w", "sum", "sum_bits"), ("k", "sum", "n_tokens")],
    )

    def finish(batch: pa.Table) -> pa.Table:
        sum_bits = np.asarray(batch.column("sum_bits"), dtype=np.int64)
        n_tokens = np.asarray(batch.column("n_tokens"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_tokens": pa.array(n_tokens),
                "sum_bits": pa.array(sum_bits),
                "mean_millibits": pa.array(
                    1000 * sum_bits // np.maximum(n_tokens, 1), type=pa.int64()
                ),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow").select_columns(out_names)


PART_MIN_PRICE_TYPE = "LARGE"


def q_part_min_price_supplier(sf_dir: str):
    """TPC-H Q2 shape (minimum-cost supplier): for every part of one
    type, the supplier(s) whose lineitem price achieves that part's
    MINIMUM — the per-group argmin JOIN-BACK (correlated min subquery),
    ties kept. The part-supplier-price relation derives from lineitem
    (this dataset's partsupp analog).

    Shape: ONE tagged-union keyed exchange on partkey (parts filtered
    to the type AT THE SCAN) co-locates each part's offers; the kernel
    computes the run min and keeps the DISTINCT (part, supplier) pairs
    achieving it in the same pass — no second join back to the fact,
    because the argmin rows are already co-resident. Integer cents end
    to end."""
    _ensure_hash_shuffle()
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    line = _read(
        sf_dir, "lineitem", columns=["l_partkey", "l_suppkey", "l_extendedprice"]
    )
    union_schema = pa.schema(
        [
            ("pkey", pa.int64()),
            ("side", pa.int8()),
            ("skey", pa.int64()),
            ("cents", pa.int64()),
        ]
    )

    def part_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.equal(batch.column("p_type"), pa.scalar(PART_MIN_PRICE_TYPE))
        )
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("p_partkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "skey": pa.nulls(n, type=pa.int64()),
                "cents": pa.nulls(n, type=pa.int64()),
            },
            schema=union_schema,
        )

    def offer_rows(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        # in-block partial argmin: one row per (part, supplier) at its
        # local min shrinks the exchange without changing the answer
        t = (
            pa.table(
                {
                    "pkey": batch.column("l_partkey").cast(pa.int64()),
                    "skey": batch.column("l_suppkey").cast(pa.int64()),
                    "cents": pa.array(cents),
                }
            )
            .group_by(["pkey", "skey"])
            .aggregate([("cents", "min")])
        )
        n = t.num_rows
        return pa.table(
            {
                "pkey": t.column("pkey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "skey": t.column("skey"),
                "cents": t.column("cents_min"),
            },
            schema=union_schema,
        )

    tagged = part.map_batches(part_rows, batch_format="pyarrow").union(
        line.map_batches(offer_rows, batch_format="pyarrow")
    )
    out_schema = pa.schema(
        [
            ("p_partkey", pa.int64()),
            ("s_suppkey", pa.int64()),
            ("min_price_c100", pa.int64()),
        ]
    )

    def argmin_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("pkey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("pkey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        cents = np.asarray(
            pc.fill_null(t.column("cents"), np.iinfo(np.int64).max), dtype=np.int64
        )
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        has_part = side[starts] == 0
        run_min = np.minimum.reduceat(cents, starts)
        keep = (side == 1) & has_part[run_idx] & (cents == run_min[run_idx])
        if not keep.any():
            return out_schema.empty_table()
        sel = t.filter(pa.array(keep))
        out = pa.table(
            {
                "p_partkey": sel.column("pkey"),
                "s_suppkey": sel.column("skey"),
                "min_price_c100": sel.column("cents"),
            },
            schema=out_schema,
        )
        # the in-block pre-dedup is per SOURCE block; the same (part,
        # supp) min can arrive from several blocks — exact-distinct now
        # that the key is co-resident
        return (
            out.group_by(["p_partkey", "s_suppkey", "min_price_c100"])
            .aggregate([])
            .select(["p_partkey", "s_suppkey", "min_price_c100"])
            .cast(out_schema)
        )

    return _keyed_exchange_apply(tagged, ["pkey"], argmin_kernel, out_schema)


def q_customer_rfm(sf_dir: str):
    """RFM segmentation base table: per customer, Recency (days since
    their latest order, anchored at the dataset's max order date),
    Frequency (order count) and Monetary (total cents) — the canonical
    CRM/LTV feature block (the reference's users feed Marketo leads
    into exactly this kind of downstream scoring).

    Shape: the global anchor folds from per-block max partials (driver
    fold, no exchange); the per-customer triple is ONE two-phase
    grouped aggregate; recency converts to whole days in a final
    streaming map (pure int64 microsecond arithmetic — bit-stable)."""
    _ensure_hash_shuffle()
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])
    anchor_schema = pa.schema([("m", pa.timestamp("us"))])

    def max_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return anchor_schema.empty_table()
        return pa.table({"m": [pc.max(b.column("o_orderdate")).as_py()]}, schema=anchor_schema)

    anchors = [
        r["m"]
        for r in _read(sf_dir, "orders", columns=["o_orderdate"])
        .map_batches(max_partial, batch_format="pyarrow")
        .take_all()
    ]
    if not anchors:
        return pa.table(
            {
                "c_custkey": pa.array([], type=pa.int64()),
                "frequency": pa.array([], type=pa.int64()),
                "monetary_c100": pa.array([], type=pa.int64()),
                "recency_days": pa.array([], type=pa.int64()),
            }
        )
    anchor_us = max(int(np.datetime64(a, "us").astype(np.int64)) for a in anchors)

    def to_partial(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("o_totalprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "c_custkey": batch.column("o_custkey").cast(pa.int64()),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "cents": pa.array(cents),
                "last_us": batch.column("o_orderdate").cast(pa.int64()),
            }
        )

    agg = grouped_aggregate(
        orders.map_batches(to_partial, batch_format="pyarrow"),
        ["c_custkey"],
        [
            ("n", "sum", "frequency"),
            ("cents", "sum", "monetary_c100"),
            ("last_us", "max", "last_us"),
        ],
    )

    def finish(batch: pa.Table) -> pa.Table:
        last = np.asarray(batch.column("last_us"), dtype=np.int64)
        days = (anchor_us - last) // 86_400_000_000
        return pa.table(
            {
                "c_custkey": batch.column("c_custkey"),
                "frequency": batch.column("frequency"),
                "monetary_c100": batch.column("monetary_c100"),
                "recency_days": pa.array(days, type=pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


WALK_RANK_INIT = 1_000_000  # integer mass per node at step 0


def q_cochange_walk_rank(sf_dir: str):
    """Two-step integer RANDOM-WALK rank over the co-change graph — the
    ITERATIVE distributed-graph shape (PageRank's inner loop, made
    bit-exact): every path starts with 1e6 mass; each step every node
    splits its mass equally over its neighbors (integer floor division,
    so the result is deterministic and SQL-comparable). High rank2 =
    paths central to the repo's coupling structure.

    Shape: the pair miner's output (bounded: support >= 5 pairs)
    materializes ONCE and explodes to directed edges; each step is ONE
    keyed exchange on (repo, src) — edge rows union'd with the previous
    step's rank rows — whose kernel derives the degree from the run's
    own edge count (no separate degree table ever ships) and emits
    in-block-summed (repo, dst, contrib) partials; a two-phase grouped
    aggregate closes the step. Iterations are a FIXED count (2), each a
    full-graph exchange: the 100-TB contract is edges x steps traffic,
    no driver state beyond plan assembly."""
    _ensure_hash_shuffle()
    pairs = q_co_change_pairs(sf_dir).materialize()  # reused by both steps
    edge_schema = pa.schema(
        [
            ("repo", pa.string()),
            ("node", pa.string()),
            ("side", pa.int8()),
            ("dst", pa.string()),
            ("rank", pa.int64()),
        ]
    )

    def explode_edges(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("path_a"), dtype=object)
        b = np.asarray(batch.column("path_b"), dtype=object)
        repo = np.asarray(batch.column("repo"), dtype=object)
        n = len(a)
        return pa.table(
            {
                "repo": pa.array(np.concatenate([repo, repo]), type=pa.string()),
                "node": pa.array(np.concatenate([a, b]), type=pa.string()),
                "side": pa.array(np.ones(2 * n, dtype=np.int8)),
                "dst": pa.array(np.concatenate([b, a]), type=pa.string()),
                "rank": pa.nulls(2 * n, type=pa.int64()),
            },
            schema=edge_schema,
        )

    edges = pairs.map_batches(explode_edges, batch_format="pyarrow").materialize()

    contrib_schema = pa.schema(
        [("repo", pa.string()), ("node", pa.string()), ("rank", pa.int64())]
    )

    def make_walk_kernel(first_step: bool):
        def walk_kernel(block: pa.Table) -> pa.Table:
            if block.num_rows == 0:
                return contrib_schema.empty_table()
            order = pc.sort_indices(
                block,
                sort_keys=[
                    ("repo", "ascending"),
                    ("node", "ascending"),
                    ("side", "ascending"),
                ],
            )
            t = block.take(order)
            repo = np.asarray(t.column("repo"), dtype=object)
            node = np.asarray(t.column("node"), dtype=object)
            side = np.asarray(t.column("side"), dtype=np.int8)
            rank = np.asarray(pc.fill_null(t.column("rank"), 0), dtype=np.int64)
            new_run = np.r_[True, (repo[1:] != repo[:-1]) | (node[1:] != node[:-1])]
            starts = np.flatnonzero(new_run)
            run_idx = np.cumsum(new_run) - 1
            is_edge = side == 1
            deg = np.add.reduceat(is_edge.astype(np.int64), starts)
            has_rank = side[starts] == 0
            # step 1 ships no rank rows: every run starts at
            # WALK_RANK_INIT. LATER steps must NOT re-seed a run whose
            # rank row is absent (the SQL oracle's inner join contributes
            # nothing for absent nodes) — such runs are dropped, which
            # only matters for directed/pruned edge sets (the symmetric
            # explode guarantees a step-1 row for every node today)
            run_rank = np.where(has_rank, rank[starts], WALK_RANK_INIT)
            contrib = run_rank[run_idx] // np.maximum(deg[run_idx], 1)
            keep = is_edge & (deg[run_idx] > 0)
            if not first_step:
                keep &= has_rank[run_idx]
            if not keep.any():
                return contrib_schema.empty_table()
            out = pa.table(
                {
                    "repo": t.column("repo").filter(pa.array(keep)),
                    "node": t.column("dst").filter(pa.array(keep)),
                    "rank": pa.array(contrib[keep]),
                },
                schema=contrib_schema,
            )
            agg = out.group_by(["repo", "node"]).aggregate([("rank", "sum")])
            return agg.rename_columns(["repo", "node", "rank"]).cast(contrib_schema)

        return walk_kernel

    def step(ranks):
        if ranks is None:
            stream = edges
        else:
            def rank_rows(batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                return pa.table(
                    {
                        "repo": batch.column("repo"),
                        "node": batch.column("node"),
                        "side": pa.array(np.zeros(n, dtype=np.int8)),
                        "dst": pa.nulls(n, type=pa.string()),
                        "rank": batch.column("rank").cast(pa.int64()),
                    },
                    schema=edge_schema,
                )

            stream = edges.union(
                ranks.map_batches(rank_rows, batch_format="pyarrow")
            )
        partial = _keyed_exchange_apply(
            stream, ["repo", "node"], make_walk_kernel(ranks is None), contrib_schema
        )
        return grouped_aggregate(
            partial, ["repo", "node"], [("rank", "sum", "rank")]
        )

    rank1 = step(None).materialize()
    rank2 = step(rank1)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch.column("repo"),
                "path": batch.column("node"),
                "rank2": batch.column("rank").cast(pa.int64()),
            }
        )

    return rank2.map_batches(rename, batch_format="pyarrow")


Q8_REGION = "ASIA"
Q8_TARGET_NATION = "NATION_3"
Q8_FROM = np.datetime64("1996-01-01", "us")
Q8_TO = np.datetime64("1998-01-01", "us")  # half-open two ORDER years


def q_nation_market_share(sf_dir: str):
    """TPC-H Q8 shape (national market share): within one REGION's
    customers, the per-mille share of each order-year's revenue
    supplied by ONE target nation — the numerator/denominator aggregate
    whose filter lives on a different dimension than its grouping.

    Shape: the Q5 two-chained-exchange backbone. Region customers
    filter at the scan (driver resolves the 25-row dimension); orders
    carry their YEAR through exchange #1; exchange #2 attaches the
    supplier's is-target flag from the budgeted broadcast at the
    lineitem scan and folds (year, target_rev, total_rev) partials
    in-kernel — bounded by the year domain; the driver computes the
    exact integer per-mille."""
    _ensure_hash_shuffle()

    nation = pq.read_table(_t(sf_dir, "nation"))
    region = pq.read_table(_t(sf_dir, "region"))
    rkey = pc.filter(
        region.column("r_regionkey"),
        pc.equal(region.column("r_name"), pa.scalar(Q8_REGION)),
    )
    rkeys = set(np.asarray(rkey).tolist())
    in_region = pa.array(
        [int(k) in rkeys for k in np.asarray(nation.column("n_regionkey"))]
    )
    region_nations = np.sort(
        np.asarray(nation.filter(in_region).column("n_nationkey"), dtype=np.int64)
    )
    target_key = int(
        np.asarray(
            nation.filter(
                pc.equal(nation.column("n_name"), pa.scalar(Q8_TARGET_NATION))
            ).column("n_nationkey")
        )[0]
    )
    region_ref = ray.put(region_nations)

    u1_schema = pa.schema(
        [
            ("ckey", pa.int64()),
            ("side", pa.int8()),
            ("okey", pa.int64()),
            ("o_year", pa.int64()),
        ]
    )

    def customer_rows(batch: pa.Table) -> pa.Table:
        nk = np.asarray(batch.column("c_nationkey"), dtype=np.int64)
        keys = ray.get(region_ref)
        if len(keys):
            pos = np.minimum(np.searchsorted(keys, nk), len(keys) - 1)
            hit = keys[pos] == nk
        else:
            hit = np.zeros(len(nk), dtype=bool)
        t = batch.filter(pa.array(hit))
        n = t.num_rows
        return pa.table(
            {
                "ckey": t.column("c_custkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "okey": pa.nulls(n, type=pa.int64()),
                "o_year": pa.nulls(n, type=pa.int64()),
            },
            schema=u1_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "ckey": batch.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "o_year": pc.year(batch.column("o_orderdate")).cast(pa.int64()),
            },
            schema=u1_schema,
        )

    import pyarrow.dataset as pds

    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    orders = _read(
        sf_dir,
        "orders",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pds.field("o_orderdate") >= pa.scalar(Q8_FROM.item(), type=pa.timestamp("us")))
            & (pds.field("o_orderdate") < pa.scalar(Q8_TO.item(), type=pa.timestamp("us")))
        ),
    )
    tagged1 = customer.map_batches(customer_rows, batch_format="pyarrow").union(
        orders.map_batches(order_rows, batch_format="pyarrow")
    )

    s1_schema = pa.schema([("okey", pa.int64()), ("o_year", pa.int64())])

    def keep_region_orders(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return s1_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("ckey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        has_cust = side[starts] == 0
        keep = (side == 1) & has_cust[run_idx]
        if not keep.any():
            return s1_schema.empty_table()
        sel = t.filter(pa.array(keep))
        return pa.table(
            {"okey": sel.column("okey"), "o_year": sel.column("o_year")},
            schema=s1_schema,
        )

    stage1 = _keyed_exchange_apply(tagged1, ["ckey"], keep_region_orders, s1_schema)

    u2_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("o_year", pa.int64()),
            ("is_target", pa.int8()),
            ("rev_c", pa.int64()),
        ]
    )

    def stage1_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "o_year": batch.column("o_year"),
                "is_target": pa.nulls(n, type=pa.int8()),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u2_schema,
        )

    line_pay_schema = pa.schema([("okey", pa.int64()), ("rev_c", pa.int64())])

    def line_payload(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "skey": batch.column("l_suppkey").cast(pa.int64()),
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "rev_c": pa.array(cents * (100 - disc)),
            }
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        nat = np.asarray(batch.column("supp_nation"), dtype=np.int64)
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "o_year": pa.nulls(n, type=pa.int64()),
                "is_target": pa.array((nat == target_key).astype(np.int8)),
                "rev_c": batch.column("rev_c"),
            },
            schema=u2_schema,
        )

    lineitem = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    attached = _attach_supplier_nation(
        sf_dir,
        lineitem.map_batches(line_payload, batch_format="pyarrow"),
        line_pay_schema,
    )
    tagged2 = stage1.map_batches(stage1_rows, batch_format="pyarrow").union(
        attached.map_batches(line_rows, batch_format="pyarrow")
    )

    part_schema = pa.schema(
        [
            ("o_year", pa.int64()),
            ("target_rev_c10k", pa.int64()),
            ("total_rev_c10k", pa.int64()),
        ]
    )

    def share_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        year = np.asarray(pc.fill_null(t.column("o_year"), -1), dtype=np.int64)
        tgt = np.asarray(pc.fill_null(t.column("is_target"), 0), dtype=np.int8)
        rev = np.asarray(pc.fill_null(t.column("rev_c"), 0), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        has_order = side[starts] == 0
        run_year = np.where(has_order, year[starts], -1)
        row_year = run_year[run_idx]
        keep = (side == 1) & (row_year >= 0)
        if not keep.any():
            return part_schema.empty_table()
        out = pa.table(
            {
                "o_year": pa.array(row_year[keep]),
                "target_rev_c10k": pa.array(rev[keep] * tgt[keep]),
                "total_rev_c10k": pa.array(rev[keep]),
            },
            schema=part_schema,
        )
        agg = out.group_by(["o_year"]).aggregate(
            [("target_rev_c10k", "sum"), ("total_rev_c10k", "sum")]
        )
        return agg.rename_columns(
            ["o_year", "target_rev_c10k", "total_rev_c10k"]
        ).cast(part_schema)

    partial = _keyed_exchange_apply(tagged2, ["okey"], share_kernel, part_schema)
    tgt_tot: dict[int, list[int]] = {}
    for r in partial.take_all():  # bounded by the year domain x blocks
        e = tgt_tot.setdefault(int(r["o_year"]), [0, 0])
        e[0] += int(r["target_rev_c10k"])
        e[1] += int(r["total_rev_c10k"])
    years = sorted(tgt_tot)
    return pa.table(
        {
            "o_year": pa.array(years, type=pa.int64()),
            "target_rev_c10k": pa.array([tgt_tot[y][0] for y in years], type=pa.int64()),
            "total_rev_c10k": pa.array([tgt_tot[y][1] for y in years], type=pa.int64()),
            "share_pm": pa.array(
                [1000 * tgt_tot[y][0] // max(tgt_tot[y][1], 1) for y in years],
                type=pa.int64(),
            ),
        }
    )


def q_cohort_revenue(sf_dir: str):
    """Cohort LTV matrix: revenue and order counts by (acquisition
    month, months-since-acquisition) — the revenue-weighted companion
    of ``user_retention`` (which counts distinct users); the growth
    analytics grid behind payback-period dashboards.

    Shape: ONE keyed exchange on custkey co-locates each customer's
    orders; the kernel derives the cohort (run min month) and emits
    (cohort, age, cents) partials folded IN-BLOCK — payload bounded by
    the months^2 grid x blocks, never orders; a two-phase aggregate
    merges. Months are exact integer year*12+month indexes."""
    _ensure_hash_shuffle()
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def to_rows(batch: pa.Table) -> pa.Table:
        m = (
            np.asarray(pc.year(batch.column("o_orderdate")), dtype=np.int64) * 12
            + np.asarray(pc.month(batch.column("o_orderdate")), dtype=np.int64)
            - 1
        )
        cents = np.rint(
            np.asarray(batch.column("o_totalprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "ckey": batch.column("o_custkey").cast(pa.int64()),
                "m": pa.array(m),
                "cents": pa.array(cents),
            }
        )

    part_schema = pa.schema(
        [
            ("cohort_month", pa.int64()),
            ("age_months", pa.int64()),
            ("n_orders", pa.int64()),
            ("revenue_c100", pa.int64()),
        ]
    )

    def cohort_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(block, sort_keys=[("ckey", "ascending")])
        t = block.take(order)
        key = np.asarray(t.column("ckey"), dtype=np.int64)
        m = np.asarray(t.column("m"), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        cohort = np.minimum.reduceat(m, starts)[run_idx]
        out = pa.table(
            {
                "cohort_month": pa.array(cohort),
                "age_months": pa.array(m - cohort),
                "n_orders": pa.array(np.ones(len(m), dtype=np.int64)),
                "revenue_c100": t.column("cents"),
            },
            schema=part_schema,
        )
        agg = out.group_by(["cohort_month", "age_months"]).aggregate(
            [("n_orders", "sum"), ("revenue_c100", "sum")]
        )
        return agg.rename_columns(
            ["cohort_month", "age_months", "n_orders", "revenue_c100"]
        ).cast(part_schema)

    partial = _keyed_exchange_apply(
        orders.map_batches(to_rows, batch_format="pyarrow"),
        ["ckey"],
        cohort_kernel,
        part_schema,
    )
    return grouped_aggregate(
        partial,
        ["cohort_month", "age_months"],
        [("n_orders", "sum", "n_orders"), ("revenue_c100", "sum", "revenue_c100")],
    )


def q_embedding_power_iteration(sf_dir: str):
    """One POWER-ITERATION step for the dominant direction of the
    un-centered Gram matrix: w = A_q^T (A_q @ 1) on the same
    floor(x*8192) integer grid as the k-means family — the distributed
    MATVEC building block (PCA / spectral methods' inner loop), made
    bit-exact so the SQL oracle can replicate it.

    Shape: one streaming pass — each block flattens its list column
    zero-copy, computes row sums u = A_q @ 1 and folds u^T A_q into a
    SINGLE d-vector int64 partial (per-block magnitude <=
    rows_per_block x (d x scale x |x|max)^2 ~ 2^56 at 131k-row blocks,
    inside int64); the driver merges partials in unbounded Python ints.
    No exchange at any corpus size; driver state is d numbers. A full
    power method iterates this pattern with w broadcast back via
    ray.put (the k-means-refine template)."""
    from embulk_input_marketo_ray.stages.similarity import list_column_matrix

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    part_schema = pa.schema([("dim", pa.int64()), ("w", pa.int64())])

    def matvec_partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        emb = list_column_matrix(batch.column("embedding"))
        q = np.floor(emb * KMEANS_SCALE).astype(np.int64)
        u = q.sum(axis=1)
        w = u @ q  # int64 matvec: u^T A_q
        return pa.table(
            {
                "dim": pa.array(np.arange(len(w), dtype=np.int64)),
                "w": pa.array(w),
            },
            schema=part_schema,
        )

    totals: dict[int, int] = {}
    for r in ds.map_batches(matvec_partial, batch_format="pyarrow").take_all():
        totals[int(r["dim"])] = totals.get(int(r["dim"]), 0) + int(r["w"])
    dims = sorted(totals)
    return pa.table(
        {
            "dim": pa.array(dims, type=pa.int64()),
            "w": pa.array([totals[d] for d in dims], type=pa.int64()),
        }
    )


SPAN_MASK_PER_MILLE = 150  # ~15% token mask rate (T5 default)


def q_doc_span_corruption(sf_dir: str):
    """T5-style SPAN-CORRUPTION layout: per document, the deterministic
    masked spans (start token index, length) a denoising objective
    would train on — each token masks iff the catalog's multiplicative
    hash of (doc_id, token index) lands under the rate, and maximal
    RUNS of masked tokens fuse into spans. Deterministic (no RNG
    state), repartition-stable, resumable — the same contract as the
    split/sample/shuffle family; bit-identical to the SQL oracle.

    Shape: pure streaming map — tokens never leave their block (a
    doc's tokens are contiguous after the in-block explode), spans
    derive from one run-detect pass, no exchange at any corpus size."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("span_start", pa.int64()),
            ("span_len", pa.int64()),
        ]
    )

    def spans_block(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pattern="[^a-z]+",
        )
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        offsets = np.asarray(toks.offsets)
        n_flat = len(flat)
        if n_flat == 0:
            return out_schema.empty_table()
        doc_of = (
            np.searchsorted(offsets, np.arange(n_flat, dtype=np.int64), side="right")
            - 1
        )
        ids = np.asarray(batch.column("doc_id"), dtype=np.int64)[doc_of]
        nonempty = np.asarray(pc.not_equal(flat, pa.scalar("")))
        ids = ids[nonempty]
        if len(ids) == 0:
            return out_schema.empty_table()
        # a doc's real tokens are contiguous in flat order: the token
        # index is the offset within the doc's run
        new_doc = np.r_[True, ids[1:] != ids[:-1]]
        run_starts = np.flatnonzero(new_doc)
        run_idx = np.cumsum(new_doc) - 1
        tok_idx = np.arange(len(ids), dtype=np.int64) - run_starts[run_idx]
        # uint64 with a mod-reduce between the two multiplies: every
        # intermediate stays < 2^64, so the math matches the oracle's
        # HUGEINT arithmetic bit for bit
        u = ids.astype(np.uint64)
        mix = ((u % SPLIT_HASH_MOD) * np.uint64(1_000_003) + tok_idx.astype(np.uint64)) % SPLIT_HASH_MOD
        h = (mix * np.uint64(SPLIT_HASH_MULT)) % SPLIT_HASH_MOD
        masked = (h % 1000) < SPAN_MASK_PER_MILLE
        if not masked.any():
            return out_schema.empty_table()
        mid, mtok = ids[masked], tok_idx[masked]
        # run detection over the masked (doc, idx) stream: a new span
        # starts at a doc change or a non-consecutive index
        new_span = np.r_[
            True, (mid[1:] != mid[:-1]) | (mtok[1:] != mtok[:-1] + 1)
        ]
        starts = np.flatnonzero(new_span)
        lens = np.diff(np.r_[starts, len(mid)])
        return pa.table(
            {
                "doc_id": pa.array(mid[starts]),
                "span_start": pa.array(mtok[starts]),
                "span_len": pa.array(lens.astype(np.int64)),
            },
            schema=out_schema,
        )

    return ds.map_batches(spans_block, batch_format="pyarrow")


MATRYOSHKA_K = 16  # truncation prefix length


def q_embedding_truncation_error(sf_dir: str):
    """Matryoshka truncation diagnostic: per vector, the exact integer
    energy (sum of squares on the floor(x*8192) grid) of the full
    embedding vs its first-K prefix, and the retained-energy per-mille
    — the measurement behind choosing a truncated serving dimension.

    Shape: one streaming map over the zero-copy flat buffer (two
    squared-sum reductions per row), no exchange; integers end to end
    so the SQL list_slice oracle is bit-exact."""
    from embulk_input_marketo_ray.stages.similarity import list_column_matrix

    _ensure_hash_shuffle()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def trunc_block(batch: pa.Table) -> pa.Table:
        emb = list_column_matrix(batch.column("embedding"))
        qm = np.floor(emb * KMEANS_SCALE).astype(np.int64)
        full = (qm * qm).sum(axis=1)
        head = (qm[:, :MATRYOSHKA_K] * qm[:, :MATRYOSHKA_K]).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch.column("vec_id").cast(pa.int64()),
                "energy_full": pa.array(full),
                "energy_head": pa.array(head),
                "retained_pm": pa.array(1000 * head // np.maximum(full, 1)),
            }
        )

    return ds.map_batches(trunc_block, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: supplier-side dimension chain (part filter -> supplier
# nation -> order year) — the mirror of the Q5/Q7/Q8 customer-side chain
# ---------------------------------------------------------------------------

Q9_PART_SUBSTR = "red"  # product line: parts whose name contains this


def q_part_revenue_by_nation(sf_dir: str):
    """TPC-H Q9 shape (product-line volume by nation x year; the
    supplycost term is absent from this schema, so the measure is
    revenue): for lineitems of parts whose name contains
    ``Q9_PART_SUBSTR``, integer-exact revenue per (supplier nation,
    order year) — the SUPPLIER-side dimension chain, mirroring the
    customer-side Q5/Q7/Q8 backbone with three different keys.

    - part filter rides tagged-union exchange #1 on the PART key (the
      Q14 idiom): the contains-flag collapses to int8 AT THE PART SCAN,
      the run-gather kernel drops non-matching lineitems before
      anything else ships — at 100 TB neither part nor lineitem is
      broadcastable, so the filter is an exchange, not a lookup;
    - supplier nations attach via ``_attach_supplier_nation``
      (budget-adaptive broadcast / third keyed exchange);
    - order years ride tagged-union exchange #2 on the ORDER key; the
      kernel folds (nation, year, revenue) partials IN-BLOCK, so each
      block leaves <= |nations| x |years| rows;
    - the final two-phase aggregate and the 25-row name attach finish
      driver-side. Revenue is integer cents x (100 - disc%).

    Ref: the reference joins one parent level per fetch
    (MarketoService getListsByIds / getProgramsByIds); this is the
    three-level generalization its users hand-roll downstream."""
    _ensure_hash_shuffle()
    nation = pq.read_table(_t(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    name_of = {
        int(k): str(v)
        for k, v in zip(
            np.asarray(nation.column("n_nationkey")), nation.column("n_name").to_pylist()
        )
    }

    # ---- exchange #1: part-filter on the part key ---------------------
    u1_schema = pa.schema(
        [
            ("pkey", pa.int64()),
            ("side", pa.int8()),
            ("flag", pa.int8()),
            ("okey", pa.int64()),
            ("skey", pa.int64()),
            ("rev_c", pa.int64()),
        ]
    )

    def part_rows(batch: pa.Table) -> pa.Table:
        flag = pc.match_substring(batch.column("p_name"), Q9_PART_SUBSTR)
        n = batch.num_rows
        return pa.table(
            {
                "pkey": batch.column("p_partkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "flag": flag.cast(pa.int8()),
                "okey": pa.nulls(n, type=pa.int64()),
                "skey": pa.nulls(n, type=pa.int64()),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u1_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        n = batch.num_rows
        return pa.table(
            {
                "pkey": batch.column("l_partkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "flag": pa.nulls(n, type=pa.int8()),
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "skey": batch.column("l_suppkey").cast(pa.int64()),
                "rev_c": pa.array(cents * (100 - disc)),
            },
            schema=u1_schema,
        )

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])
    lineitem = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    tagged1 = part.map_batches(part_rows, batch_format="pyarrow").union(
        lineitem.map_batches(line_rows, batch_format="pyarrow")
    )

    s1_schema = pa.schema(
        [("skey", pa.int64()), ("okey", pa.int64()), ("rev_c", pa.int64())]
    )

    def keep_flagged(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return s1_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("pkey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("pkey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        flag = np.asarray(pc.fill_null(t.column("flag"), 0), dtype=np.int8)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_flag = np.where(side[starts] == 0, flag[starts], 0)
        keep = (side == 1) & (run_flag[run_idx] == 1)
        if not keep.any():
            return s1_schema.empty_table()
        sel = t.filter(pa.array(keep))
        return pa.table(
            {
                "skey": sel.column("skey"),
                "okey": sel.column("okey"),
                "rev_c": sel.column("rev_c"),
            },
            schema=s1_schema,
        )

    stage1 = _keyed_exchange_apply(tagged1, ["pkey"], keep_flagged, s1_schema)

    # ---- supplier-nation attach (budget-adaptive) ---------------------
    attached = _attach_supplier_nation(
        sf_dir, stage1, pa.schema([("okey", pa.int64()), ("rev_c", pa.int64())])
    )

    # ---- exchange #2: order year on the order key ---------------------
    u2_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("o_year", pa.int64()),
            ("nation", pa.int64()),
            ("rev_c", pa.int64()),
        ]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "o_year": pc.year(batch.column("o_orderdate")).cast(pa.int64()),
                "nation": pa.nulls(n, type=pa.int64()),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u2_schema,
        )

    def attached_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "o_year": pa.nulls(n, type=pa.int64()),
                "nation": batch.column("supp_nation"),
                "rev_c": batch.column("rev_c"),
            },
            schema=u2_schema,
        )

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    tagged2 = orders.map_batches(order_rows, batch_format="pyarrow").union(
        attached.map_batches(attached_rows, batch_format="pyarrow")
    )

    part_schema = pa.schema(
        [("nation", pa.int64()), ("o_year", pa.int64()), ("revenue_c10k", pa.int64())]
    )

    def year_fold(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return part_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        yr = np.asarray(pc.fill_null(t.column("o_year"), -1), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_year = np.where(side[starts] == 0, yr[starts], -1)
        row_year = run_year[run_idx]
        keep = (side == 1) & (row_year >= 0)
        if not keep.any():
            return part_schema.empty_table()
        sel = t.filter(pa.array(keep))
        part = pa.table(
            {
                "nation": sel.column("nation"),
                "o_year": pa.array(row_year[keep]),
                "revenue_c10k": sel.column("rev_c"),
            },
            schema=part_schema,
        )
        agg = part.group_by(["nation", "o_year"]).aggregate([("revenue_c10k", "sum")])
        return agg.rename_columns(["nation", "o_year", "revenue_c10k"]).cast(part_schema)

    partial = _keyed_exchange_apply(tagged2, ["okey"], year_fold, part_schema)
    merged = grouped_aggregate(
        partial, ["nation", "o_year"], [("revenue_c10k", "sum", "revenue_c10k")]
    )
    final = pa.Table.from_pylist(merged.take_all(), schema=part_schema)
    names = pa.array(
        [name_of.get(int(k), "") for k in np.asarray(final.column("nation"))],
        type=pa.string(),
    )
    return pa.table(
        {
            "n_name": names,
            "o_year": final.column("o_year"),
            "revenue_c10k": final.column("revenue_c10k"),
        }
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: per-order EXISTS over sibling rows (unique laggard)
# ---------------------------------------------------------------------------

LAGGARD_TOP_K = 10


def q_order_laggard_suppliers(sf_dir: str):
    """TPC-H Q21 shape (suppliers who kept orders waiting), adapted to
    this schema (no commit/receipt dates): for every order served by
    >= 2 distinct suppliers, the UNIQUE supplier whose latest shipment
    is the order's latest shipment (ties disqualify — some other
    supplier was just as late) is the order's laggard; report the
    ``LAGGARD_TOP_K`` suppliers by laggard-order count.

    Shape: (okey, skey, max shipdate) pre-folds IN-BLOCK (payload =
    distinct (order, supplier) pairs x blocks, never lineitems), ONE
    keyed exchange on the ORDER key co-locates each order's suppliers,
    and the run kernel derives the order max + uniqueness test in the
    same pass — the per-order EXISTS/NOT-EXISTS over sibling rows that
    Q21 is famous for, as a run-slice rather than a self-join. Laggard
    counts close through the two-phase aggregate; the driver takes the
    top-K (count desc, suppkey asc — a total order) and attaches names
    from the supplier dimension read."""
    _ensure_hash_shuffle()
    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    pair_schema = pa.schema(
        [("okey", pa.int64()), ("skey", pa.int64()), ("ship_us", pa.int64())]
    )

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "skey": batch.column("l_suppkey").cast(pa.int64()),
                "ship_us": batch.column("l_shipdate").cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )
        agg = t.group_by(["okey", "skey"]).aggregate([("ship_us", "max")])
        return agg.rename_columns(["okey", "skey", "ship_us"]).cast(pair_schema)

    lag_schema = pa.schema([("skey", pa.int64()), ("n_orders", pa.int64())])

    def laggard_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return lag_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("skey", "ascending")]
        )
        t = block.take(order)
        okey = np.asarray(t.column("okey"), dtype=np.int64)
        skey = np.asarray(t.column("skey"), dtype=np.int64)
        ship = np.asarray(t.column("ship_us"), dtype=np.int64)
        # per (okey, skey) max again: partials from different blocks meet here
        pk = np.r_[True, (okey[1:] != okey[:-1]) | (skey[1:] != skey[:-1])]
        pstart = np.flatnonzero(pk)
        pidx = np.cumsum(pk) - 1
        pmax = np.full(len(pstart), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(pmax, pidx, ship)
        pokey = okey[pstart]
        pskey = skey[pstart]
        # per-order runs over the distinct-supplier rows
        ok = np.r_[True, pokey[1:] != pokey[:-1]]
        ostart = np.flatnonzero(ok)
        oidx = np.cumsum(ok) - 1
        ns = np.diff(np.r_[ostart, len(pokey)])
        omax = np.full(len(ostart), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(omax, oidx, pmax)
        at_max = pmax == omax[oidx]
        n_at_max = np.zeros(len(ostart), dtype=np.int64)
        np.add.at(n_at_max, oidx, at_max.astype(np.int64))
        win = at_max & (ns[oidx] >= 2) & (n_at_max[oidx] == 1)
        if not win.any():
            return lag_schema.empty_table()
        out = pa.table(
            {
                "skey": pa.array(pskey[win]),
                "n_orders": pa.array(np.ones(int(win.sum()), dtype=np.int64)),
            },
            schema=lag_schema,
        )
        agg = out.group_by(["skey"]).aggregate([("n_orders", "sum")])
        return agg.rename_columns(["skey", "n_orders"]).cast(lag_schema)

    pairs = line.map_batches(pair_partial, batch_format="pyarrow")
    partial = _keyed_exchange_apply(pairs, ["okey"], laggard_kernel, lag_schema)
    merged = grouped_aggregate(partial, ["skey"], [("n_orders", "sum", "n_orders")])
    rows = merged.take_all()  # bounded by the supplier dimension
    rows.sort(key=lambda r: (-int(r["n_orders"]), int(r["skey"])))
    top = rows[:LAGGARD_TOP_K]
    sup = pq.read_table(_t(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    names = {
        int(k): str(v)
        for k, v in zip(
            np.asarray(sup.column("s_suppkey"), dtype=np.int64),
            sup.column("s_name").to_pylist(),
        )
    }
    keep = [r for r in top if int(r["skey"]) in names]  # inner-join semantics
    return pa.table(
        {
            "s_suppkey": pa.array([int(r["skey"]) for r in keep], type=pa.int64()),
            "s_name": pa.array([names[int(r["skey"])] for r in keep], type=pa.string()),
            "n_orders": pa.array([int(r["n_orders"]) for r in keep], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# containment (asymmetric Jaccard): quote / subset detection
# ---------------------------------------------------------------------------

# keep directed pairs with |A ∩ B| / |A| >= 1/2 — integer-exact as
# 2*i >= nA. Containment catches a SHORT doc embedded in a long one
# (a quote, an excerpt, a boilerplate wrapper), which symmetric
# Jaccard misses: J = i/(nA+nB-i) stays tiny when nB >> nA even at
# full containment.
CONTAIN_NUM = 1
CONTAIN_DEN = 2


def _gram_pair_counts(sf_dir: str, max_df: int):
    """Shared counting backbone of the exact gram-overlap family
    (containment / max-overlap; q_doc_jaccard_pairs keeps its own copy
    for the logged df-cap counter): distinct-3-gram inverted index ->
    keyed gram exchange -> per-block pair multiplicity -> grouped sum.
    Returns the undirected pair dataset ``(a, b, i, na, nb)`` with
    a < b, i = |A ∩ B|, na/nb = the endpoint gram-set sizes."""
    from embulk_input_marketo_ray.stages.dedup import _ngram_set

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode_grams(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_id: list[int] = []
        out_g: list[str] = []
        out_n: list[int] = []
        for i, t in zip(ids, texts):
            gs = _ngram_set(t or "")
            out_id.extend([i] * len(gs))
            out_g.extend(gs)
            out_n.extend([len(gs)] * len(gs))
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "gram": pa.array(out_g, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    grams = ds.map_batches(explode_grams, batch_format="pyarrow")

    pair_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("i", pa.int64()), ("na", pa.int64()), ("nb", pa.int64())]
    )

    def postings_to_pairs(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pair_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("gram", "ascending"), ("doc_id", "ascending")]
        )
        t = block.take(order)
        gram = np.asarray(t.column("gram"), dtype=object)
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        ns = np.asarray(t.column("n"), dtype=np.int64)
        starts = np.flatnonzero(np.r_[True, gram[1:] != gram[:-1]])
        ends = np.r_[starts[1:], len(gram)]
        out_a, out_b, out_na, out_nb = [], [], [], []
        for s, e in zip(starts, ends):
            g = e - s
            if g < 2:
                continue
            if max_df and g > max_df:
                continue  # stop-gram guard, same rule as the Jaccard path
            i, j = np.triu_indices(g, k=1)
            out_a.append(ids[s:e][i])
            out_b.append(ids[s:e][j])
            out_na.append(ns[s:e][i])
            out_nb.append(ns[s:e][j])
        if not out_a:
            return pair_schema.empty_table()
        pt = pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "na": pa.array(np.concatenate(out_na), type=pa.int64()),
                "nb": pa.array(np.concatenate(out_nb), type=pa.int64()),
            }
        )
        out = pt.group_by(["a", "b"]).aggregate(
            [([], "count_all"), ("na", "max"), ("nb", "max")]
        )
        return pa.table(
            {
                "a": out.column("a"),
                "b": out.column("b"),
                "i": out.column("count_all").cast(pa.int64()),
                "na": out.column("na_max").cast(pa.int64()),
                "nb": out.column("nb_max").cast(pa.int64()),
            }
        )

    cands = _keyed_repartition(grams, _shuffle_width(), ["gram"]).map_batches(
        postings_to_pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    return grouped_aggregate(
        cands,
        ["a", "b"],
        [("i", "sum", "i"), ("na", "max", "na"), ("nb", "max", "nb")],
    )


def q_doc_containment_pairs(sf_dir: str, max_df: int | None = None):
    """EXACT n-gram CONTAINMENT pairs via the gram inverted index —
    the directed counterpart of ``q_doc_jaccard_pairs`` (Broder's
    containment score): emit (doc_id, contained_in) whenever at least
    ``CONTAIN_NUM/CONTAIN_DEN`` of doc_id's distinct grams also occur
    in the other doc. The dedup story for quotes/excerpts/wrapped
    boilerplate, where symmetric Jaccard is blind by construction.

    Counting backbone shared with ``q_doc_max_overlap``
    (``_gram_pair_counts``): gram exchange, per-block pair
    multiplicity, grouped sum; the pure-int64 judge
    ``DEN*i >= NUM*nA`` evaluates BOTH directions from one undirected
    pair row, so pair traffic does not double. Same optional
    stop-gram ``max_df`` guard as the Jaccard path."""
    inter = _gram_pair_counts(
        sf_dir, JACCARD_MAX_DF if max_df is None else int(max_df)
    )

    def judge(batch: pa.Table) -> pa.Table:
        iv = np.asarray(batch.column("i"), dtype=np.int64)
        na = np.asarray(batch.column("na"), dtype=np.int64)
        nb = np.asarray(batch.column("nb"), dtype=np.int64)
        av = np.asarray(batch.column("a"), dtype=np.int64)
        bv = np.asarray(batch.column("b"), dtype=np.int64)
        # direction a -> b: |A∩B|/|A| >= NUM/DEN  <=>  DEN*i >= NUM*nA
        fwd = CONTAIN_DEN * iv >= CONTAIN_NUM * na
        rev = CONTAIN_DEN * iv >= CONTAIN_NUM * nb
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([av[fwd], bv[rev]]), type=pa.int64()),
                "contained_in": pa.array(
                    np.concatenate([bv[fwd], av[rev]]), type=pa.int64()
                ),
            }
        )

    return inter.map_batches(judge, batch_format="pyarrow")


def q_multimodal_thumbnails(sf_dir: str):
    """Genuine image PROCESSING on genuinely decoded containers: the
    real-media corpus's BMP/PNG rows decode (magic-dispatched,
    CRC-verified for PNG) and pool through a 2x2 integer box filter —
    decode -> numpy kernel -> integer-exact thumbnail facts, the
    resize step of a real multimodal ingest with zero stub left in
    the image path. Actor-pool stage, small batches (the multimodal
    wide-row memory contract); audio rows pass through with
    decode_ok=False (not an image op)."""
    import ray.data as rd

    from embulk_input_marketo_ray.stages.multimodal import (
        DEFAULT_MEDIA_BATCH_SIZE,
        RealThumbnailer,
    )
    from embulk_input_marketo_ray.synth import synth_real_media_table

    _ensure_hash_shuffle()
    ds = rd.from_arrow(synth_real_media_table(256))
    return ds.map_batches(
        RealThumbnailer,
        batch_format="pyarrow",
        batch_size=DEFAULT_MEDIA_BATCH_SIZE,
        concurrency=(1, 4),
    )


ROLLMED_WINDOW = 7  # trailing days in the rolling-median frame


def q_event_rolling_median(sf_dir: str):
    """Per-type rolling MEDIAN of daily event counts over a trailing
    ``ROLLMED_WINDOW``-day ROWS frame — the order-statistic sibling of
    ``event_rolling_stats``'s rolling max (robust anomaly baselines
    use the median precisely because a single spike day drags a mean
    but not a middle). Emitted as ``median7_x2`` (twice the median):
    an even-width frame's median is the MEAN OF TWO INTEGERS, so the
    doubled value stays integer-exact and bit-comparable to SQL.

    Shape: the day-count grid folds through the two-phase aggregate
    (payload = day-domain x blocks, never events), then ONE keyed
    exchange on event_type gives each kernel its type's full day
    series; the frame walk is over the BOUNDED day domain (a window
    of <= W sorted ints per day), so kernel cost is days x W log W —
    independent of event count at any scale."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    day_schema = pa.schema(
        [("event_type", pa.string()), ("day", pa.timestamp("us")), ("n", pa.int64())]
    )

    def day_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            }
        )
        out = t.group_by(["event_type", "day"]).aggregate([([], "count_all")])
        return out.rename_columns(["event_type", "day", "n"]).cast(day_schema)

    days = grouped_aggregate(
        ds.map_batches(day_partial, batch_format="pyarrow"),
        ["event_type", "day"],
        [("n", "sum", "n")],
    )

    out_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("day", pa.timestamp("us")),
            ("n", pa.int64()),
            ("median7_x2", pa.int64()),
        ]
    )

    def median_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("event_type", "ascending"), ("day", "ascending")]
        )
        t = block.take(order)
        et = np.asarray(t.column("event_type"), dtype=object)
        n = np.asarray(t.column("n"), dtype=np.int64)
        new_run = np.r_[True, et[1:] != et[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        pos = np.arange(len(n)) - starts[run_idx]
        med = np.empty(len(n), dtype=np.int64)
        for i in range(len(n)):
            lo = i - min(int(pos[i]), ROLLMED_WINDOW - 1)
            w = np.sort(n[lo : i + 1])
            m = len(w)
            if m % 2:
                med[i] = 2 * int(w[m // 2])
            else:
                med[i] = int(w[m // 2 - 1]) + int(w[m // 2])
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "day": t.column("day"),
                "n": t.column("n"),
                "median7_x2": pa.array(med),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(days, ["event_type"], median_kernel, out_schema)


def q_doc_global_rank(sf_dir: str):
    """EXACT GLOBAL RANK of every document by (n_chars, doc_id) — the
    distributed ORDER-BY/TeraSort shape, done WITHOUT a global sort:

    1. the n_chars value histogram folds through the two-phase
       aggregate (payload = the bounded length domain x blocks, never
       docs) and its cumulative counts broadcast once (``ray.put``) —
       rank base = #docs with a strictly smaller length;
    2. ONE keyed exchange on n_chars co-locates each length's docs;
       the kernel sorts each value run by doc_id (the tiebreak) and
       adds the broadcast base — rank = base + within-value ordinal.

    Partitioning assumption (documented): a value group = all docs of
    one length. The length domain is bounded and lengths spread web
    corpora well; a degenerate corpus (every doc the same length)
    concentrates one key — the remedy is the extra tiebreak-sampling
    round of a full range-partition sort, deliberately out of scope
    for the exact-histogram path. Equivalent to ``row_number() OVER
    (ORDER BY n_chars, doc_id)`` and bit-exact against it."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    hist_schema = pa.schema([("n_chars", pa.int64()), ("cnt", pa.int64())])

    def hist_partial(batch: pa.Table) -> pa.Table:
        out = (
            pa.table({"n_chars": batch.column("n_chars").cast(pa.int64())})
            .group_by(["n_chars"])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["n_chars", "cnt"]).cast(hist_schema)

    hist_rows = grouped_aggregate(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        ["n_chars"],
        [("cnt", "sum", "cnt")],
    ).take_all()  # bounded by the length DOMAIN, not the corpus
    vals = np.array(sorted(int(r["n_chars"]) for r in hist_rows), dtype=np.int64)
    cnt_of = {int(r["n_chars"]): int(r["cnt"]) for r in hist_rows}
    bases = np.zeros(len(vals), dtype=np.int64)
    acc = 0
    for i, v in enumerate(vals):
        bases[i] = acc
        acc += cnt_of[int(v)]
    base_ref = ray.put((vals, bases))

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_chars", pa.int64()), ("global_rank", pa.int64())]
    )

    def rank_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("n_chars", "ascending"), ("doc_id", "ascending")]
        )
        t = block.take(order)
        nc = np.asarray(t.column("n_chars"), dtype=np.int64)
        new_run = np.r_[True, nc[1:] != nc[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        ordinal = np.arange(len(nc)) - starts[run_idx]
        v, b = ray.get(base_ref)
        pos = np.searchsorted(v, nc)
        rank = b[pos] + ordinal + 1
        return pa.table(
            {
                "doc_id": t.column("doc_id").cast(pa.int64()),
                "n_chars": pa.array(nc),
                "global_rank": pa.array(rank),
            },
            schema=out_schema,
        )

    return _keyed_exchange_apply(ds, ["n_chars"], rank_kernel, out_schema)


SPLIT_CLUSTER_BROADCAST_LIMIT = 256 << 20  # bytes of (doc_id, cluster_id) pairs


def q_doc_split_leakage_safe(sf_dir: str, cluster_broadcast_limit: int | None = None):
    """Cluster-aware train/val/test split — the LEAKAGE GUARD a plain
    per-doc hash split cannot give: near-duplicate cluster members
    always land in the SAME split (a test doc whose near-twin sits in
    train silently inflates eval scores; Lee et al.'s dedup paper's
    central warning). Split key = near-dup ``cluster_id`` for
    clustered docs, own ``doc_id`` otherwise; the assignment rule is
    the SAME multiplicative hash + cuts as ``q_doc_split``, so the
    two splits agree everywhere except inside dup clusters.

    Budget-adaptive key attach (the doc_dedup_near idiom): cluster
    membership is ∝ the DUPLICATE count — the small side by nature —
    so within ``SPLIT_CLUSTER_BROADCAST_LIMIT`` the sorted
    (doc_id, cluster_id) arrays broadcast once and the split is a
    fused streaming map (the 10^10-row corpus never shuffles); above
    it (a 50%-duplicate crawl) the attach rides one tagged-union
    keyed exchange on doc_id with a run-gather kernel."""
    budget = (
        SPLIT_CLUSTER_BROADCAST_LIMIT
        if cluster_broadcast_limit is None
        else int(cluster_broadcast_limit)
    )
    _ensure_hash_shuffle()
    clusters_ds = q_doc_dup_clusters(sf_dir).materialize()
    ds = _read(sf_dir, "documents", columns=["doc_id"])
    n_members = clusters_ds.count()

    def assign_from_key(ids: np.ndarray, keys: np.ndarray) -> pa.Table:
        h = ((keys.astype(np.uint64) % SPLIT_HASH_MOD) * SPLIT_HASH_MULT) % SPLIT_HASH_MOD
        split = np.where(
            h < SPLIT_TRAIN_CUT, "train", np.where(h < SPLIT_VAL_CUT, "val", "test")
        )
        return pa.table(
            {
                "doc_id": pa.array(ids.astype(np.int64)),
                "split": pa.array(split, type=pa.string()),
            }
        )

    if 16 * n_members <= budget:
        if n_members:
            t = pa.concat_tables(ray.get(clusters_ds.to_arrow_refs())).combine_chunks()
            order = pc.sort_indices(t, sort_keys=[("doc_id", "ascending")])
            t = t.take(order)
            member_ids = np.asarray(t.column("doc_id"), dtype=np.int64)
            member_clusters = np.asarray(t.column("cluster_id"), dtype=np.int64)
        else:
            member_ids = np.empty(0, dtype=np.int64)
            member_clusters = np.empty(0, dtype=np.int64)
        members_ref = ray.put((member_ids, member_clusters))

        def assign(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch.column("doc_id"), dtype=np.int64)
            mids, mcl = ray.get(members_ref)
            keys = ids.copy()
            if len(mids):
                pos = np.minimum(np.searchsorted(mids, ids), len(mids) - 1)
                hit = mids[pos] == ids
                keys[hit] = mcl[pos][hit]
            return assign_from_key(ids, keys)

        return ds.map_batches(assign, batch_format="pyarrow")

    # over budget: tagged-union keyed LEFT attach on doc_id
    u_schema = pa.schema(
        [("doc_id", pa.int64()), ("side", pa.int8()), ("cluster_id", pa.int64())]
    )

    def member_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "cluster_id": batch.column("cluster_id").cast(pa.int64()),
            },
            schema=u_schema,
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "cluster_id": pa.nulls(n, type=pa.int64()),
            },
            schema=u_schema,
        )

    tagged = clusters_ds.map_batches(member_rows, batch_format="pyarrow").union(
        ds.map_batches(doc_rows, batch_format="pyarrow")
    )
    out_schema = pa.schema([("doc_id", pa.int64()), ("split", pa.string())])

    def gather_split(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return out_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("doc_id", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        cl = np.asarray(pc.fill_null(t.column("cluster_id"), -1), dtype=np.int64)
        new_run = np.r_[True, ids[1:] != ids[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_cluster = np.where(side[starts] == 0, cl[starts], -1)
        row_cluster = run_cluster[run_idx]
        keep = side == 1
        out_ids = ids[keep]
        keys = np.where(row_cluster[keep] >= 0, row_cluster[keep], out_ids)
        return assign_from_key(out_ids, keys).cast(out_schema)

    return _keyed_exchange_apply(tagged, ["doc_id"], gather_split, out_schema)


# flag days with count > (ANOMALY_T_NUM / ANOMALY_T_DEN) x trailing
# median (6/5 = 1.2x — tuned so the smooth synthetic stream still
# surfaces its heaviest days; production spikes use a higher ratio)
ANOMALY_T_NUM = 6
ANOMALY_T_DEN = 5


def q_event_anomaly_days(sf_dir: str):
    """Burst detection on the rolling-median baseline: days whose count
    exceeds ``ANOMALY_T_NUM/ANOMALY_T_DEN`` x the trailing 7-day
    median — the robust spike alarm (a mean baseline self-inflates
    during the spike; the median does not). Pure integer gate on the
    doubled median: ``n > (N/D) * median  <=>  2*D*n > N *
    median7_x2``. Composes the ``event_rolling_median`` pipeline with
    a streaming filter — same exchange count, bounded-domain kernel."""
    med = q_event_rolling_median(sf_dir)

    def gate(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch.column("n"), dtype=np.int64)
        m2 = np.asarray(batch.column("median7_x2"), dtype=np.int64)
        keep = pa.array(2 * ANOMALY_T_DEN * n > ANOMALY_T_NUM * m2)
        return pa.table(
            {
                "event_type": batch.column("event_type").filter(keep),
                "day": batch.column("day").filter(keep),
                "n": batch.column("n").filter(keep),
                "median7_x2": batch.column("median7_x2").filter(keep),
            }
        )

    return med.map_batches(gate, batch_format="pyarrow")


def q_source_lang_drift(sf_dir: str):
    """Distribution-drift report: per source, the L1 distance between
    its language mix and the corpus-wide mix, kept INTEGER-EXACT via
    cross-products — ``sum_l | n_sl * N - n_l * N_s |`` (which equals
    ``N * N_s`` times the usual total-variation distance x2). The
    data-quality monitor for ingest feeds whose composition shifts.

    Shape: the (source, lang) grid folds through the two-phase
    aggregate (payload = domain x blocks); the grid is BOUNDED
    (sources x langs), so the driver folds marginals and the distance
    with numpy — the bounded-domain histogram idiom, no extra
    exchange at any corpus size."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["source", "lang"])

    grid_schema = pa.schema(
        [("source", pa.string()), ("lang", pa.string()), ("n", pa.int64())]
    )

    def grid_partial(batch: pa.Table) -> pa.Table:
        out = batch.group_by(["source", "lang"]).aggregate([([], "count_all")])
        return out.rename_columns(["source", "lang", "n"]).cast(grid_schema)

    rows = grouped_aggregate(
        ds.map_batches(grid_partial, batch_format="pyarrow"),
        ["source", "lang"],
        [("n", "sum", "n")],
    ).take_all()  # bounded by sources x langs
    if not rows:
        return pa.table(
            {
                "source": pa.array([], type=pa.string()),
                "n_docs": pa.array([], type=pa.int64()),
                "l1_cross": pa.array([], type=pa.int64()),
            }
        )
    sources = sorted({r["source"] for r in rows})
    langs = sorted({r["lang"] for r in rows})
    grid = np.zeros((len(sources), len(langs)), dtype=np.int64)
    s_ix = {s: i for i, s in enumerate(sources)}
    l_ix = {v: i for i, v in enumerate(langs)}
    for r in rows:
        grid[s_ix[r["source"]], l_ix[r["lang"]]] = int(r["n"])
    n_s = grid.sum(axis=1)
    n_l = grid.sum(axis=0)
    total = int(grid.sum())
    l1 = np.abs(grid * total - np.outer(n_s, n_l)).sum(axis=1)
    return pa.table(
        {
            "source": pa.array(sources, type=pa.string()),
            "n_docs": pa.array(n_s),
            "l1_cross": pa.array(l1),
        }
    )


PARETO_TARGET_PM = 800  # the "80" of the 80/20 rule, in per-mille


def q_customer_pareto(sf_dir: str):
    """Pareto concentration report (the 80/20 rule, exact): the
    SMALLEST number of customers whose summed revenue reaches
    ``PARETO_TARGET_PM`` per-mille of total revenue, plus their exact
    share — revenue-concentration analytics every warehouse runs.

    Shape: per-customer revenue folds through the two-phase aggregate
    (in-block partials first — the exchange moves customer-domain
    rows, never lineitems); the cumulative walk runs driver-side over
    the CUSTOMER-DIMENSION-bounded result sorted by (revenue desc,
    custkey asc — a total order, so the count is deterministic);
    integer cents everywhere, the threshold test is the cross-product
    ``cum * 1000 >= target * total``."""
    _ensure_hash_shuffle()
    line = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # lineitem revenue -> per-order partials, then the order->customer
    # attach rides ONE tagged-union keyed exchange on the order key
    u_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("ckey", pa.int64()),
            ("rev_c", pa.int64()),
        ]
    )

    def line_rows(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            np.asarray(batch.column("l_extendedprice"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        disc = np.rint(
            np.asarray(batch.column("l_discount"), dtype=np.float64) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "rev_c": pa.array(cents * (100 - disc)),
            }
        )
        agg = t.group_by(["okey"]).aggregate([("rev_c", "sum")])
        n = agg.num_rows
        return pa.table(
            {
                "okey": agg.column("okey"),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "ckey": pa.nulls(n, type=pa.int64()),
                "rev_c": agg.column("rev_c_sum").cast(pa.int64()),
            },
            schema=u_schema,
        )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "ckey": batch.column("o_custkey").cast(pa.int64()),
                "rev_c": pa.nulls(n, type=pa.int64()),
            },
            schema=u_schema,
        )

    tagged = orders.map_batches(order_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    cust_schema = pa.schema([("ckey", pa.int64()), ("rev_c", pa.int64())])

    def attach_customer(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return cust_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        ck = np.asarray(pc.fill_null(t.column("ckey"), -1), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_cust = np.where(side[starts] == 0, ck[starts], -1)
        row_cust = run_cust[run_idx]
        keep = (side == 1) & (row_cust >= 0)
        if not keep.any():
            return cust_schema.empty_table()
        sel = t.filter(pa.array(keep))
        part = pa.table(
            {"ckey": pa.array(row_cust[keep]), "rev_c": sel.column("rev_c")},
            schema=cust_schema,
        )
        agg = part.group_by(["ckey"]).aggregate([("rev_c", "sum")])
        return agg.rename_columns(["ckey", "rev_c"]).cast(cust_schema)

    partial = _keyed_exchange_apply(tagged, ["okey"], attach_customer, cust_schema)
    per_cust = grouped_aggregate(partial, ["ckey"], [("rev_c", "sum", "rev_c")])
    rows = per_cust.take_all()  # bounded by the customer dimension
    if not rows:
        return pa.table(
            {
                "n_customers": pa.array([], type=pa.int64()),
                "total_customers": pa.array([], type=pa.int64()),
                "share_pm": pa.array([], type=pa.int64()),
            }
        )
    rev = np.array([int(r["rev_c"]) for r in rows], dtype=np.int64)
    keys = np.array([int(r["ckey"]) for r in rows], dtype=np.int64)
    order = np.lexsort((keys, -rev))  # revenue desc, custkey asc
    rev = rev[order]
    total = int(rev.sum())
    cum = np.cumsum(rev)
    k = int(np.searchsorted(cum * 1000, PARETO_TARGET_PM * total, side="left")) + 1
    return pa.table(
        {
            "n_customers": pa.array([k], type=pa.int64()),
            "total_customers": pa.array([len(rev)], type=pa.int64()),
            "share_pm": pa.array([1000 * int(cum[k - 1]) // max(total, 1)], type=pa.int64()),
        }
    )


# argmax packing for (intersection, partner) pairs: max picks the larger
# intersection first, then the SMALLER partner id on ties (the 2^32
# complement). Sound while doc ids < 2^32 and i < 2^31 (gram counts).
OVERLAP_PACK = 1 << 32


def q_doc_max_overlap(sf_dir: str):
    """Corpus-diversity diagnostic (the self-BLEU proxy): for every doc
    that shares at least one 3-gram with another doc, its MOST-similar
    partner — (max shared-gram count, argmax partner, own gram count).
    Low max-overlap across the corpus = diverse data; a fat tail of
    high overlaps = templating the dedup thresholds are missing.

    The shared exact counting backbone (``_gram_pair_counts``) with an
    ARGMAX closing stage instead of a threshold: (i, partner) packs
    into one int64 (``i * 2^32 + (2^32-1-partner)``) so the two-phase
    MAX aggregate picks max-i-then-min-partner deterministically —
    both directions of each undirected pair emitted, so every doc
    sees its best partner. Same stop-gram caveat as the Jaccard
    path."""
    inter = _gram_pair_counts(sf_dir, JACCARD_MAX_DF)

    both_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("packed", pa.int64())]
    )

    def directions(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch.column("a"), dtype=np.int64)
        b = np.asarray(batch.column("b"), dtype=np.int64)
        iv = np.asarray(batch.column("i"), dtype=np.int64)
        na = np.asarray(batch.column("na"), dtype=np.int64)
        nb = np.asarray(batch.column("nb"), dtype=np.int64)
        pack_ab = iv * OVERLAP_PACK + (OVERLAP_PACK - 1 - b)
        pack_ba = iv * OVERLAP_PACK + (OVERLAP_PACK - 1 - a)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b])),
                "n_grams": pa.array(np.concatenate([na, nb])),
                "packed": pa.array(np.concatenate([pack_ab, pack_ba])),
            },
            schema=both_schema,
        )

    best = grouped_aggregate(
        inter.map_batches(directions, batch_format="pyarrow"),
        ["doc_id"],
        [("n_grams", "max", "n_grams"), ("packed", "max", "packed")],
    )

    def decode(batch: pa.Table) -> pa.Table:
        packed = np.asarray(batch.column("packed"), dtype=np.int64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_grams": batch.column("n_grams"),
                "max_shared": pa.array(packed // OVERLAP_PACK),
                "best_partner": pa.array(OVERLAP_PACK - 1 - packed % OVERLAP_PACK),
            }
        )

    return best.map_batches(decode, batch_format="pyarrow")


def q_vocab_gini(sf_dir: str):
    """Gini coefficient of the token-frequency distribution — the
    vocabulary-inequality diagnostic (natural language sits high;
    near-uniform token use signals synthetic/templated text), kept
    INTEGER-EXACT: with tokens sorted by count ascending, the Gini
    numerator is ``sum_i (2i + 1 - n) * c_i``; tied counts contribute
    a permutation-invariant block sum ``v * m * (2s + m - n)``
    (m tokens of count v starting at 0-based rank s), so the walk
    runs over the FREQUENCY-OF-FREQUENCIES histogram — bounded by the
    distinct count VALUES (harmonically small), never the vocabulary.

    Shape: two-phase token counts (payload = vocab x blocks), then a
    two-phase count-value histogram (payload = distinct values x
    blocks), then the closed-form driver walk. Reported as
    ``gini_pm = 1000 * num // (n * total)`` plus the exact integer
    pieces."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tok_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])

    def tok_partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _explode_doc_tokens(batch)
        out = pa.table({"token": flat}).group_by(["token"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["token", "n"]).cast(tok_schema)

    counts = grouped_aggregate(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["token"],
        [("n", "sum", "n")],
    )

    ff_schema = pa.schema([("cnt", pa.int64()), ("m", pa.int64())])

    def ff_partial(batch: pa.Table) -> pa.Table:
        out = (
            pa.table({"cnt": batch.column("n")})
            .group_by(["cnt"])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["cnt", "m"]).cast(ff_schema)

    ff_rows = grouped_aggregate(
        counts.map_batches(ff_partial, batch_format="pyarrow"),
        ["cnt"],
        [("m", "sum", "m")],
    ).take_all()  # bounded by distinct count VALUES
    if not ff_rows:
        return pa.table(
            {
                "n_tokens": pa.array([], type=pa.int64()),
                "total_count": pa.array([], type=pa.int64()),
                "gini_num": pa.array([], type=pa.int64()),
                "gini_pm": pa.array([], type=pa.int64()),
            }
        )
    vals = sorted((int(r["cnt"]), int(r["m"])) for r in ff_rows)
    n_tokens = sum(m for _, m in vals)
    total = sum(v * m for v, m in vals)
    num = 0
    s = 0
    for v, m in vals:
        num += v * m * (2 * s + m - n_tokens)
        s += m
    den = n_tokens * total
    return pa.table(
        {
            "n_tokens": pa.array([n_tokens], type=pa.int64()),
            "total_count": pa.array([total], type=pa.int64()),
            "gini_num": pa.array([num], type=pa.int64()),
            "gini_pm": pa.array([1000 * num // max(den, 1)], type=pa.int64()),
        }
    )


def q_minhash_precision_report(sf_dir: str):
    """ESTIMATOR-QUALITY audit: the MinHash+LSH near-dup pair set
    scored against the exact inverted-index Jaccard baseline —
    (true_positives, false_positives, false_negatives) and integer
    per-mille precision/recall. The health check every approximate
    dedup deployment needs before trusting its thresholds; composes
    two independently-verified catalog pipelines, so a drift in either
    estimator surfaces here as a moved score.

    Shape: both pair sets are DUPLICATE-bounded (tiny by nature);
    each materializes from its own distributed pipeline and the set
    algebra folds driver-side — the bounded-result idiom, no extra
    exchange."""
    _ensure_hash_shuffle()
    approx = {
        (int(r["doc_id"]), int(r["dup_of"]))
        for r in q_doc_minhash_dup_pairs(sf_dir).take_all()
    }
    exact = {
        (int(r["doc_id"]), int(r["dup_of"]))
        for r in q_doc_jaccard_pairs(sf_dir).take_all()
    }
    # normalize orientation: unordered pairs as (max, min) on both sides
    approx = {(max(a, b), min(a, b)) for a, b in approx}
    exact = {(max(a, b), min(a, b)) for a, b in exact}
    tp = len(approx & exact)
    fp = len(approx - exact)
    fn = len(exact - approx)
    return pa.table(
        {
            "tp": pa.array([tp], type=pa.int64()),
            "fp": pa.array([fp], type=pa.int64()),
            "fn": pa.array([fn], type=pa.int64()),
            "precision_pm": pa.array([1000 * tp // max(tp + fp, 1)], type=pa.int64()),
            "recall_pm": pa.array([1000 * tp // max(tp + fn, 1)], type=pa.int64()),
        }
    )


COVERAGE_KS = (100, 1000, 10000)  # vocabulary budgets to report


def q_token_coverage_curve(sf_dir: str):
    """Tokenizer-budget curve: for each vocabulary budget K, the exact
    per-mille of corpus TOKEN OCCURRENCES covered by the K most
    frequent types (ties broken toward the budget: a partially
    admitted tie value contributes exactly the remaining slots) — the
    'how big must the vocab be' design table.

    Shape: the vocab_gini backbone — two-phase token counts, two-phase
    frequency-of-frequencies histogram, then the top-down closed-form
    walk over distinct count VALUES driver-side (harmonically small).
    No sort of the vocabulary anywhere."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    tok_schema = pa.schema([("token", pa.string()), ("n", pa.int64())])

    def tok_partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _explode_doc_tokens(batch)
        out = pa.table({"token": flat}).group_by(["token"]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["token", "n"]).cast(tok_schema)

    counts = grouped_aggregate(
        ds.map_batches(tok_partial, batch_format="pyarrow"),
        ["token"],
        [("n", "sum", "n")],
    )

    ff_schema = pa.schema([("cnt", pa.int64()), ("m", pa.int64())])

    def ff_partial(batch: pa.Table) -> pa.Table:
        out = (
            pa.table({"cnt": batch.column("n")})
            .group_by(["cnt"])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns(["cnt", "m"]).cast(ff_schema)

    ff_rows = grouped_aggregate(
        counts.map_batches(ff_partial, batch_format="pyarrow"),
        ["cnt"],
        [("m", "sum", "m")],
    ).take_all()
    vals = sorted(
        ((int(r["cnt"]), int(r["m"])) for r in ff_rows), reverse=True
    )  # most frequent first
    total = sum(v * m for v, m in vals)
    n_types = sum(m for _, m in vals)
    out_k, out_cov = [], []
    for k in COVERAGE_KS:
        covered = 0
        left = k
        for v, m in vals:
            take = min(m, left)
            covered += v * take
            left -= take
            if left == 0:
                break
        out_k.append(min(k, n_types))
        out_cov.append(1000 * covered // max(total, 1))
    return pa.table(
        {
            "k": pa.array(out_k, type=pa.int64()),
            "covered_pm": pa.array(out_cov, type=pa.int64()),
        }
    )


def q_repo_tree_depth(sf_dir: str):
    """Directory-depth profile of the live lake state: per (repo,
    depth) file counts, where depth = path separator count + 1 — the
    repo-structure health check (monorepo flattening, runaway nesting)
    run against the MERGE-ON-READ head state, not the raw event
    stream. Vectorized arrow kernel (count_substring), projection
    pushed to the two key columns, two-phase grouped close."""
    from embulk_input_marketo_ray.sinks.exactly_once import read_lake

    n = CDC_QUERY_EVENTS
    lake, _ = _replay_windows([n + 50])
    ds = read_lake(lake, columns=["repo", "path"])

    def depth_rows(batch: pa.Table) -> pa.Table:
        depth = pc.add(
            pc.count_substring(batch.column("path").cast(pa.string()), "/"),
            pa.scalar(1, pa.int32()),
        )
        return pa.table(
            {"repo": batch.column("repo"), "depth": depth.cast(pa.int64())}
        )

    return grouped_aggregate(
        ds.map_batches(depth_rows, batch_format="pyarrow"),
        ["repo", "depth"],
        [("", "count", "n_files")],
    )


def q_event_seasonality(sf_dir: str):
    """Seasonality heatmap grid: event counts per (event_type, day of
    week, hour of day) — the ops-dashboard baseline behind anomaly
    thresholds (weekday mornings vs weekend nights are different
    normals). Bounded-domain two-phase aggregate: the exchange moves
    (type x 7 x 24) partial rows per block, never events; ISO day
    numbering (Monday=1) on both engines."""
    _ensure_hash_shuffle()
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    grid_schema = pa.schema(
        [
            ("event_type", pa.string()),
            ("dow", pa.int64()),
            ("hour", pa.int64()),
            ("n", pa.int64()),
        ]
    )

    def grid_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "event_type": batch.column("event_type"),
                "dow": pc.day_of_week(
                    batch.column("ts"), count_from_zero=False, week_start=1
                ).cast(pa.int64()),
                "hour": pc.hour(batch.column("ts")).cast(pa.int64()),
            }
        )
        out = t.group_by(["event_type", "dow", "hour"]).aggregate([([], "count_all")])
        return out.rename_columns(["event_type", "dow", "hour", "n"]).cast(grid_schema)

    return grouped_aggregate(
        ds.map_batches(grid_partial, batch_format="pyarrow"),
        ["event_type", "dow", "hour"],
        [("n", "sum", "n")],
    )


def q_cdc_op_mix(sf_dir: str):
    """CDC stream observability: per watermark window (7-day tumbling
    over event_ts), upsert/delete counts and the integer per-mille
    delete ratio — the feed-health gauge (a delete spike usually means
    an upstream purge or a bug, either way page someone). Bounded
    (window x op) two-phase aggregate over the change-event fixture;
    driver-side ratio fold on the window-bounded result."""
    _ensure_hash_shuffle()
    ds = _read_events(columns=["event_ts", "op"])

    grid_schema = pa.schema(
        [("window_start", pa.timestamp("us")), ("op", pa.string()), ("n", pa.int64())]
    )

    # explicit epoch anchor (BASE_TS) — floor_temporal and SQL
    # time_bucket disagree on multi-day bucket origins, so both
    # engines share one integer formula instead
    _W_US = 7 * 86_400_000_000
    _ORIGIN_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in epoch us

    def grid_partial(batch: pa.Table) -> pa.Table:
        us = np.asarray(
            batch.column("event_ts").cast(pa.timestamp("us")).cast(pa.int64())
        )
        w = (us - _ORIGIN_US) // _W_US * _W_US + _ORIGIN_US
        t = pa.table(
            {
                "window_start": pa.array(w).cast(pa.timestamp("us")),
                "op": batch.column("op"),
            }
        )
        out = t.group_by(["window_start", "op"]).aggregate([([], "count_all")])
        return out.rename_columns(["window_start", "op", "n"]).cast(grid_schema)

    rows = grouped_aggregate(
        ds.map_batches(grid_partial, batch_format="pyarrow"),
        ["window_start", "op"],
        [("n", "sum", "n")],
    ).take_all()  # bounded by windows x ops
    acc: dict = {}
    for r in rows:
        w = r["window_start"]
        acc.setdefault(w, {"upsert": 0, "delete": 0})[str(r["op"])] = int(r["n"])
    ws = sorted(acc)
    ups = [acc[w]["upsert"] for w in ws]
    dels = [acc[w]["delete"] for w in ws]
    return pa.table(
        {
            "window_start": pa.array(ws, type=pa.timestamp("us")),
            "n_upserts": pa.array(ups, type=pa.int64()),
            "n_deletes": pa.array(dels, type=pa.int64()),
            "delete_pm": pa.array(
                [1000 * d // max(u + d, 1) for u, d in zip(ups, dels)],
                type=pa.int64(),
            ),
        }
    )


def q_ship_lag_profile(sf_dir: str):
    """Order-to-ship latency histogram: lineitem count per whole-day
    lag (l_shipdate - o_orderdate) — the fulfillment-SLA profile. The
    order date attaches via ONE tagged-union keyed exchange on the
    order key (the Q12 idiom); the lag folds to bounded day-domain
    partials inside the join kernel, so the exchange moves order/line
    keys and the aggregate moves the day domain — never a row per
    lineitem past the kernel. Integer microsecond floor-division."""
    _ensure_hash_shuffle()
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    line = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    u_schema = pa.schema(
        [
            ("okey", pa.int64()),
            ("side", pa.int8()),
            ("odate_us", pa.int64()),
            ("ship_us", pa.int64()),
        ]
    )

    def order_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("o_orderkey").cast(pa.int64()),
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "odate_us": batch.column("o_orderdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
                "ship_us": pa.nulls(n, type=pa.int64()),
            },
            schema=u_schema,
        )

    def line_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "okey": batch.column("l_orderkey").cast(pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "odate_us": pa.nulls(n, type=pa.int64()),
                "ship_us": batch.column("l_shipdate")
                .cast(pa.timestamp("us"))
                .cast(pa.int64()),
            },
            schema=u_schema,
        )

    tagged = orders.map_batches(order_rows, batch_format="pyarrow").union(
        line.map_batches(line_rows, batch_format="pyarrow")
    )
    lag_schema = pa.schema([("lag_days", pa.int64()), ("n_items", pa.int64())])
    _DAY_US = 86_400_000_000

    def lag_kernel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return lag_schema.empty_table()
        order = pc.sort_indices(
            block, sort_keys=[("okey", "ascending"), ("side", "ascending")]
        )
        t = block.take(order)
        key = np.asarray(t.column("okey"), dtype=np.int64)
        side = np.asarray(t.column("side"), dtype=np.int8)
        od = np.asarray(pc.fill_null(t.column("odate_us"), -1), dtype=np.int64)
        sh = np.asarray(pc.fill_null(t.column("ship_us"), 0), dtype=np.int64)
        new_run = np.r_[True, key[1:] != key[:-1]]
        starts = np.flatnonzero(new_run)
        run_idx = np.cumsum(new_run) - 1
        run_od = np.where(side[starts] == 0, od[starts], -1)
        row_od = run_od[run_idx]
        keep = (side == 1) & (row_od >= 0)
        if not keep.any():
            return lag_schema.empty_table()
        lag = (sh[keep] - row_od[keep]) // _DAY_US
        part = pa.table({"lag_days": pa.array(lag)})
        agg = part.group_by(["lag_days"]).aggregate([([], "count_all")])
        return agg.rename_columns(["lag_days", "n_items"]).cast(lag_schema)

    partial = _keyed_exchange_apply(tagged, ["okey"], lag_kernel, lag_schema)
    return grouped_aggregate(partial, ["lag_days"], [("n_items", "sum", "n_items")])


KCORE_K = 3  # minimum degree retained by the peel


def q_cochange_kcore(sf_dir: str):
    """K-CORE decomposition of the co-change graph (K=3): iteratively
    peel nodes with fewer than K surviving neighbors until fixpoint —
    the maximal subgraph of genuinely entangled paths (a hub that only
    touches leaves dies with its leaves; triangles and walks keep it).
    The catalog's until-FIXPOINT iterative-graph template, past the
    fixed-step walk: rounds are data-dependent, each round is ONE
    two-phase degree aggregate plus a broadcast shrink of the edge
    stream.

    Scale shape: edges materialize once (bounded by the mined-pair
    domain — support >= 5 pairs, not events); per round, degrees fold
    through the two-phase aggregate and the surviving-node set ships
    once via ``ray.put`` (bounded by the same node domain). The loop
    terminates in at most node-count rounds; real graphs peel in a
    handful. Returns surviving (repo, path, degree)."""
    _ensure_hash_shuffle()
    pairs = q_co_change_pairs(sf_dir).materialize()

    edge_schema = pa.schema(
        [("repo", pa.string()), ("a", pa.string()), ("b", pa.string())]
    )

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch.column("repo"),
                "a": batch.column("path_a"),
                "b": batch.column("path_b"),
            },
            schema=edge_schema,
        )

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()

    deg_schema = pa.schema(
        [("repo", pa.string()), ("node", pa.string()), ("deg", pa.int64())]
    )

    def degree_partial(batch: pa.Table) -> pa.Table:
        both = pa.table(
            {
                "repo": pa.concat_arrays(
                    [batch.column("repo").combine_chunks(), batch.column("repo").combine_chunks()]
                ),
                "node": pa.concat_arrays(
                    [batch.column("a").combine_chunks(), batch.column("b").combine_chunks()]
                ),
            }
        )
        out = both.group_by(["repo", "node"]).aggregate([([], "count_all")])
        return out.rename_columns(["repo", "node", "deg"]).cast(deg_schema)

    def degrees(edge_ds):
        return grouped_aggregate(
            edge_ds.map_batches(degree_partial, batch_format="pyarrow"),
            ["repo", "node"],
            [("deg", "sum", "deg")],
        )

    alive_rows = degrees(edges).take_all()  # bounded by the mined node domain
    while True:
        keep = {(r["repo"], r["node"]) for r in alive_rows if int(r["deg"]) >= KCORE_K}
        dead = [r for r in alive_rows if (r["repo"], r["node"]) not in keep]
        if not dead:
            break
        if not keep:
            alive_rows = []
            break
        keep_key = sorted(f"{r}\x00{n}" for r, n in keep)
        keep_ref = ray.put(np.array(keep_key, dtype=object))

        def shrink(batch: pa.Table) -> pa.Table:
            kk = ray.get(keep_ref)
            ka = np.asarray(
                pc.binary_join_element_wise(
                    batch.column("repo"), batch.column("a"), "\x00"
                ),
                dtype=object,
            )
            kb = np.asarray(
                pc.binary_join_element_wise(
                    batch.column("repo"), batch.column("b"), "\x00"
                ),
                dtype=object,
            )
            from embulk_input_marketo_ray.stages.dedup import sorted_member_mask

            m = sorted_member_mask(kk, ka) & sorted_member_mask(kk, kb)
            return batch.filter(pa.array(m))

        edges = edges.map_batches(shrink, batch_format="pyarrow").materialize()
        alive_rows = degrees(edges).take_all()

    if not alive_rows:
        return pa.table(
            {
                "repo": pa.array([], type=pa.string()),
                "path": pa.array([], type=pa.string()),
                "deg": pa.array([], type=pa.int64()),
            }
        )
    alive_rows.sort(key=lambda r: (r["repo"], r["node"]))
    return pa.table(
        {
            "repo": pa.array([r["repo"] for r in alive_rows], type=pa.string()),
            "path": pa.array([r["node"] for r in alive_rows], type=pa.string()),
            "deg": pa.array([int(r["deg"]) for r in alive_rows], type=pa.int64()),
        }
    )
