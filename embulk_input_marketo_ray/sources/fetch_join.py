"""Parent-driven nested fetch-join (SURVEY.md §2.4 J1/J2, §2.1 S3).

The reference's lead-by-list / lead-by-program targets fetch each
parent's children and tag every child with the parent id — an index
nested-loop join with the parent list as the (small) driving side
(MarketoServiceImpl.java:135-153, flatMap at MarketoUtils.java:181-222,
column augmentation at delegate/LeadWithListInputPlugin.java:74-88).
Program-members bulk export caps concurrent export jobs at 2
(delegate/ProgramMembersBulkExtractInputPlugin.java:74-78).

Ray Data shape: ``from_items(parent_ids)`` -> actor-pool ``map_batches``
whose pool size enforces the API's concurrency cap; each actor streams
its parents' children as Arrow batches with the parent-id column
appended (M8: constant-value `Table.append_column` per parent).
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from embulk_input_marketo_ray.sources.paged import (
    FixtureServer,
    iter_token_pages,
)

PARENT_ID_COLUMN = "listId"  # MarketoUtils.java:58-60 (LIST_ID_COLUMN_NAME)


class ChildFetcher:
    """Actor: holds one protocol client; fetches children per parent.

    The actor-pool ``concurrency`` passed at the call site is the
    engine analog of ``number_concurrent_export_job <= 2``.

    Zero-record skip
    (delegate/ProgramMembersBulkExtractInputPlugin.java:196-206): the
    export-job STATUS reports ``numberOfRecords`` before any stream is
    opened; a 0-record parent is skipped without a single page fetch.
    Per-parent record counts are surfaced through the optional
    ``metrics`` actor (``parent_records.<id>``), the engine analog of
    the reference's per-task report; ``pages_fetched`` counts actual
    page calls, so a skipped parent provably fetches nothing."""

    def __init__(
        self,
        children_per_parent: int = 450,
        parent_column: str = PARENT_ID_COLUMN,
        children_counts: dict[int, int] | None = None,
        metrics=None,
    ):
        self.children_per_parent = children_per_parent
        self.parent_column = parent_column
        self.children_counts = children_counts or {}
        self.metrics = metrics

    def __call__(self, batch: pa.Table):
        # metric submissions are async actor calls; collect the refs
        # and barrier on them before this task completes — without the
        # barrier, cross-caller actor-task ordering gives a consumer
        # that finished the dataset no guarantee the counters landed
        pending: list = []
        for parent_id in batch.column("parent_id").to_pylist():
            n = self.children_counts.get(parent_id, self.children_per_parent)
            # export-job status first (partition metadata), then skip
            # 0-record parents before any child stream opens
            if self.metrics is not None:
                pending.append(
                    self.metrics.inc.remote(f"parent_records.{parent_id}", n)
                )
            if n == 0:
                continue
            server = FixtureServer(n_records=n)
            for page in iter_token_pages(server):
                if self.metrics is not None:
                    pending.append(self.metrics.inc.remote("pages_fetched", 1))
                # M8: annotate each child with its parent id
                tagged = page.append_column(
                    self.parent_column,
                    pa.array([parent_id] * page.num_rows, type=pa.int64()),
                )
                yield tagged
        if pending:
            ray.get(pending)


def read_children_of(
    parent_ids: list[int],
    children_per_parent: int = 450,
    max_concurrent_jobs: int = 2,
    parent_column: str = PARENT_ID_COLUMN,
    children_counts: dict[int, int] | None = None,
    metrics=None,
) -> "ray.data.Dataset":
    """All children of all parents, each row tagged with its parent id.

    ``children_counts`` overrides the per-parent record count (the
    fixture analog of the export-job status' ``numberOfRecords``);
    parents mapped to 0 are skipped without opening a child stream.
    ``metrics`` is an optional MetricsActor handle receiving per-parent
    counts + page-fetch counters."""
    specs = ray.data.from_items([{"parent_id": p} for p in parent_ids])
    # one parent per task so the pool cap = concurrent "export jobs"
    specs = specs.repartition(max(len(parent_ids), 1))
    return specs.map_batches(
        ChildFetcher,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=max_concurrent_jobs,
        fn_constructor_kwargs={
            "children_per_parent": children_per_parent,
            "parent_column": parent_column,
            "children_counts": children_counts,
            "metrics": metrics,
        },
    )


def sanitize_ids(raw_ids: list[str]) -> list[int]:
    """Id-list sanitation (M10, delegate/MarketoBaseInputPluginDelegate.java:110-161):
    trim, drop blanks, reject non-numeric with a clear error, dedupe
    preserving order; error if nothing valid remains."""
    seen: set[int] = set()
    out: list[int] = []
    for raw in raw_ids:
        s = raw.strip()
        if not s:
            continue
        if not s.lstrip("-").isdigit():
            raise ValueError(f"Invalid id: '{s}', id must be a number")
        v = int(s)
        if v not in seen:
            seen.add(v)
            out.append(v)
    if not out:
        raise ValueError("No valid ids in the id list")
    return out
