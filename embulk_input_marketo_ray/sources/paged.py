"""Token- and offset-paged REST sources (SURVEY.md §2.1 S4/S5/S6).

Re-expresses the reference's ``RecordPagingIterable`` protocol
(rest/RecordPagingIterable.java:13-179, rest/MarketoRestClient.java:397-466)
as Ray Data sources over a deterministic fixture server:

- **response envelope**: ``{requestId, success, nextPageToken?,
  moreResult?, errors[], result[]}`` (model/MarketoResponse.java:9-82);
- **token paging**: follow ``nextPageToken`` until ``moreResult`` is
  false; page size hard-capped at 300 (rest/MarketoRestClient.java:55,
  426-466). Inherently sequential (cursor chain) -> ONE streaming task
  that yields an Arrow batch per page (the Dataset downstream still
  pipelines);
- **offset paging**: ``offset += len(result)`` until a short page;
  ``max_return=200`` (rest/MarketoRestClient.java:397-425). Offsets are
  precomputable -> parallel fan-out over offset windows;
- **error semantics**: expired token (code 602) renews and retries,
  rate limit (606) waits and retries, invalid-JSON pages retry, per
  rest/MarketoBaseRestClient.java:246-300.

The fixture server mirrors the shape of the reference's JSON fixtures
(fixtures/lists_response.json etc., FIXTURES.md F6) and injects each
error class deterministically.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

import ray
import ray.data

TOKEN_PAGE_SIZE = 300  # MAX_BATCH_SIZE, rest/MarketoRestClient.java:55
OFFSET_PAGE_SIZE = 200  # MAX_RETURN, rest/MarketoRestClient.java:57


class MarketoApiError(RuntimeError):
    def __init__(self, code: int, message: str) -> None:
        super().__init__(f"[{code}] {message}")
        self.code = code


RETRYABLE_CODES = {502, 604, 606, 608, 611, 615, 713, 1029}
TOKEN_CODES = {601, 602}


@dataclass
class FixtureServer:
    """Deterministic in-memory 'Marketo': n_records campaign-like rows,
    served in envelope pages with injected protocol errors.

    ``fail_plan`` maps page-index -> one of '602', '606', 'badjson';
    each injected failure occurs once, then the retry succeeds
    (mirroring the transient classes the reference retries)."""

    n_records: int = 1000
    fail_plan: dict[int, str] = field(default_factory=dict)
    valid_token: str = "tok-0"
    calls: int = 0
    _fired: set = field(default_factory=set)
    # program-by-tag filter (rest/MarketoRestClient.java:373-391: the
    # SERVER filters; tagType/tagValue are query params). The fixture's
    # tag space is the record's own fields: tag_type names a field
    # ('type' or 'workspaceName'), tag_value its required value.
    tag_type: str | None = None
    tag_value: str | None = None
    # program date-range query (rest/MarketoRestClient.java:476-488:
    # earliestUpdatedAt/latestUpdatedAt are query params the SERVER
    # filters by). The fixture's virtual updatedAt is day index
    # ``i % 30``; the filter keeps records whose day falls in the
    # inclusive [earliest_day, latest_day] window.
    date_range: tuple[int, int] | None = None
    # optional date-range refinement (same endpoint): filterType names
    # a record field, filterValues its accepted values
    field_filter: tuple[str, frozenset] | None = None
    # payload shape served (U4 decoder seam): "json" = response
    # envelope (MarketoResponseJettyEntityReader), "csv" = raw CSV body
    # (MarketoInputStreamResponseEntityReader — the bulk-extract stream
    # shape; no envelope, so end-of-data is the empty page). Protocol
    # ERRORS arrive as JSON in both modes, as in the real API.
    payload_format: str = "json"

    def _id_space(self) -> range | list[int]:
        """Record ids this server serves: all of them, or — under a
        tag / date-range / field filter — only the matching ones
        (paging offsets then index the FILTERED stream, like the real
        API)."""
        if (
            self.tag_type is None
            and self.date_range is None
            and self.field_filter is None
        ):
            return range(self.n_records)
        if self.tag_type is not None and self.tag_type not in (
            "type",
            "workspaceName",
        ):
            raise MarketoApiError(
                610, f"Requested resource not found: tagType {self.tag_type!r}"
            )
        if self.field_filter is not None and self.field_filter[0] not in (
            "id",
            "type",
            "workspaceName",
        ):
            raise MarketoApiError(
                610,
                f"Requested resource not found: filterType {self.field_filter[0]!r}",
            )
        out = []
        for i in range(self.n_records):
            rec = self._record(i)
            if self.tag_type is not None and rec[self.tag_type] != self.tag_value:
                continue
            if self.date_range is not None:
                lo, hi = self.date_range
                if not (lo <= i % 30 <= hi):
                    continue
            if self.field_filter is not None:
                fname, fvals = self.field_filter
                if str(rec[fname]) not in fvals:
                    continue
            out.append(i)
        return out

    def issue_token(self) -> str:
        self.valid_token = f"tok-{self.calls}"
        return self.valid_token

    def _record(self, i: int) -> dict:
        return {
            "id": i,
            "name": f"Campaign_{i:05d}",
            "type": "batch" if i % 3 else "trigger",
            "workspaceName": f"ws{i % 7}",
        }

    def _maybe_fail(self, page_index: int, token: str) -> str | None:
        self.calls += 1
        if token != self.valid_token:
            raise MarketoApiError(602, "Access token expired")
        plan = self.fail_plan.get(page_index)
        if plan and (page_index, plan) not in self._fired:
            self._fired.add((page_index, plan))
            if plan == "602":
                self.valid_token = f"tok-renew-{self.calls}"  # invalidate
                raise MarketoApiError(602, "Access token expired")
            if plan == "606":
                raise MarketoApiError(606, "Max rate limit exceeded")
            if plan == "badjson":
                return "{not json"
        return None

    def token_page(self, token: str, next_page_token: str | None, batch_size: int) -> str:
        """One token-paged call; returns the raw JSON envelope."""
        start = int(next_page_token or 0)
        page_index = start // max(batch_size, 1)
        bad = self._maybe_fail(page_index, token)
        if bad is not None:
            return bad
        end = min(start + min(batch_size, TOKEN_PAGE_SIZE), self.n_records)
        more = end < self.n_records
        env = {
            "requestId": f"req{self.calls:x}",
            "success": True,
            "result": [self._record(i) for i in range(start, end)],
            "moreResult": more,
        }
        if more:
            env["nextPageToken"] = str(end)
        return json.dumps(env)

    def offset_page(self, token: str, offset: int, max_return: int) -> str:
        page_index = offset // max(max_return, 1)
        bad = self._maybe_fail(page_index, token)
        if bad is not None:
            return bad
        ids = self._id_space()
        end = min(offset + min(max_return, OFFSET_PAGE_SIZE), len(ids))
        records = [self._record(i) for i in ids[offset:end]]
        if self.payload_format == "csv":
            cols = ["id", "name", "type", "workspaceName"]
            lines = [",".join(cols)]
            lines.extend(",".join(str(r[c]) for c in cols) for r in records)
            return "\n".join(lines) + "\n"
        env = {
            "requestId": f"req{self.calls:x}",
            "success": True,
            "result": records,
        }
        return json.dumps(env)


RECORD_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("name", pa.string()),
        ("type", pa.string()),
        ("workspaceName", pa.string()),
    ]
)


def _records_to_table(records: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(records, schema=RECORD_SCHEMA)


class PayloadDecodeError(ValueError):
    """A decoder rejected the raw payload (retryable, like bad JSON)."""


def json_envelope_decoder(raw: str) -> dict:
    """Default decoder: the JSON response envelope
    (rest/MarketoResponseJettyEntityReader.java:66-80)."""
    try:
        return json.loads(raw)
    except json.JSONDecodeError as e:
        raise PayloadDecodeError(str(e)) from e


def csv_payload_decoder(raw: str) -> dict:
    """Alternate decoder strategy: a raw CSV body (the bulk-extract
    stream shape, rest/MarketoInputStreamResponseEntityReader.java:49-60)
    decoded into the same envelope dict the paging protocol consumes.
    The header row keys the records; integer-looking values are typed
    (the reference types CSV values downstream via the schema); parse
    errors are retryable."""
    from embulk_input_marketo_ray.sources.csv_source import CsvParseError, records_to_table

    if raw.lstrip().startswith("{"):  # protocol errors still arrive as JSON
        return json_envelope_decoder(raw)
    try:
        table = records_to_table(raw)
    except (CsvParseError, ValueError) as e:
        raise PayloadDecodeError(str(e)) from e
    records = [
        {
            k: (int(v) if isinstance(v, str) and v.lstrip("-").isdigit() else v)
            for k, v in r.items()
        }
        for r in table.to_pylist()
    ]
    return {"success": True, "result": records, "moreResult": False}


class _PagedClient:
    """Protocol state shared by both sources: token, retry, rate wait.

    Mirrors MarketoBaseRestClient: renew-then-retry on 601/602
    (:265-274), wait-then-retry on 606 (:276-283), retry invalid
    payloads (:246-300); bounded retries. The payload ``decoder`` is a
    pluggable strategy (U4): JSON envelope by default, raw-CSV body
    for the bulk-extract stream shape."""

    def __init__(self, server: FixtureServer, max_retries: int = 7, decoder=None) -> None:
        self.server = server
        self.max_retries = max_retries
        self.token = server.issue_token()
        self.retries = 0
        self.decoder = decoder or json_envelope_decoder

    def call(self, fn, *args) -> dict:
        attempt = 0
        while True:
            try:
                raw = fn(self.token, *args)
                env = self.decoder(raw)  # invalid payload -> retry
                if not env.get("success", False):
                    raise MarketoApiError(608, "API unavailable")
                return env
            except (MarketoApiError, PayloadDecodeError) as e:
                attempt += 1
                self.retries += 1
                if attempt > self.max_retries:
                    raise
                if isinstance(e, MarketoApiError):
                    if e.code in TOKEN_CODES:
                        self.token = self.server.issue_token()
                    elif e.code not in RETRYABLE_CODES:
                        raise


def iter_token_pages(server: FixtureServer, batch_size: int = TOKEN_PAGE_SIZE, decoder=None):
    """Sequential token-cursor stream; yields one Arrow table per page.
    Token paging requires the JSON envelope (the cursor rides in it),
    but ``decoder`` stays pluggable for envelope variants (U4)."""
    client = _PagedClient(server, decoder=decoder)
    next_token: str | None = None
    while True:
        env = client.call(server.token_page, next_token, batch_size)
        if env["result"]:
            yield _records_to_table(env["result"])
        if not env.get("moreResult", False):
            return
        next_token = env["nextPageToken"]


def read_token_paged(
    n_records: int,
    fail_plan: dict[int, str] | None = None,
    batch_size: int = TOKEN_PAGE_SIZE,
    decoder=None,
) -> "ray.data.Dataset":
    """Token-paged source as a Dataset: the cursor chain is sequential,
    so a single spec row fans into a generator task that streams pages;
    downstream stages pipeline on the per-page batches."""

    def gen(_batch):
        server = FixtureServer(n_records=n_records, fail_plan=fail_plan or {})
        yield from iter_token_pages(server, batch_size, decoder=decoder)

    return ray.data.range(1).map_batches(gen, batch_size=None)


CUSTOM_OBJECT_CHUNK = 300  # MAX_REQUEST_SIZE, rest/MarketoRestClient.java:67


def _serve_id_chunk(requested, existing, fail_plan, batch_size):
    """Token-paged pages for one chunk of requested custom-object ids:
    the chunk's record space is the requested ids that EXIST (the
    fixture universe), served in the CALLER'S requested order (the
    filter-values mode passes dedupeField values verbatim, and the
    oracle's local-index arithmetic depends on that order — do not
    sort), each page's local indices mapped back to the real ids.
    ``existing=None`` = every id exists (the dense-range fixture)."""
    import numpy as np

    present = [i for i in requested if existing is None or i in existing]
    if not present:
        return
    server = FixtureServer(n_records=len(present), fail_plan=fail_plan or {})
    arr = np.array(present, dtype=np.int64)
    for page in iter_token_pages(server, batch_size):
        idx = np.asarray(page.column("id"), dtype=np.int64)
        yield page.set_column(
            page.schema.get_field_index("id"),
            "id",
            pa.array(arr[idx], type=pa.int64()),
        )


def read_custom_objects(
    id_from: int = 1,
    id_to: int | None = None,
    fail_plan: dict[int, str] | None = None,
    chunk_size: int = CUSTOM_OBJECT_CHUNK,
    batch_size: int = TOKEN_PAGE_SIZE,
    filter_values: list[int] | None = None,
    existing_ids=None,
) -> "ray.data.Dataset":
    """S6: offset+token hybrid source (custom objects), all three
    reference query modes (delegate/CustomObjectInputPlugin.java:85-96,
    rest/MarketoRestClient.java:508-590):

    - **explicit filter_values**: the refined value list is queried in
      300-value chunks (``MAX_REQUEST_SIZE``) passed as filterValues;
      chunks are precomputable -> parallel fan-out with nested token
      pagination per chunk.
    - **bounded range** (``id_to`` given): the id range enumerated in
      300-id chunks, same parallel fan-out.
    - **open-ended range** (``id_to=None``): the reference walks
      consecutive 300-id chunks from ``id_from`` and STOPS at the
      first chunk whose response is empty
      (rest/MarketoRestClient.java:561-565 — ids past a >=300-id gap
      are never reached). Inherently sequential (each chunk's
      emptiness gates the next) -> one streaming generator task, like
      token paging.

    ``existing_ids`` is the fixture universe (which object ids exist);
    ``None`` = every requested id exists. The open-ended mode requires
    it (the walk must terminate)."""
    existing = None if existing_ids is None else frozenset(int(i) for i in existing_ids)

    if filter_values is not None:
        vals = list(dict.fromkeys(int(v) for v in filter_values))
        chunks = [vals[i : i + chunk_size] for i in range(0, len(vals), chunk_size)]
        specs = ray.data.from_items([{"chunk": i} for i in range(len(chunks))])

        def fetch_values(batch: pa.Table):
            for ci in batch.column("chunk").to_pylist():
                yield from _serve_id_chunk(chunks[ci], existing, fail_plan, batch_size)

        return specs.map_batches(fetch_values, batch_format="pyarrow", batch_size=None)

    if id_to is None:
        if existing is None:
            raise ValueError(
                "open-ended custom-object scan requires existing_ids "
                "(the walk stops at the first empty 300-id chunk)"
            )

        def walk(_batch):
            lo = id_from
            while True:
                requested = range(lo, lo + chunk_size)
                got = False
                for page in _serve_id_chunk(requested, existing, fail_plan, batch_size):
                    got = True
                    yield page
                if not got:
                    return  # empty chunk ends the scan (reference rule)
                lo += chunk_size

        return ray.data.range(1).map_batches(
            walk, batch_format="pyarrow", batch_size=None
        )

    chunks = [
        (lo, min(lo + chunk_size - 1, id_to))
        for lo in range(id_from, id_to + 1, chunk_size)
    ]
    specs = ray.data.from_items([{"lo": lo, "hi": hi} for lo, hi in chunks])

    def fetch(batch: pa.Table):
        for lo, hi in zip(batch.column("lo").to_pylist(), batch.column("hi").to_pylist()):
            yield from _serve_id_chunk(range(lo, hi + 1), existing, fail_plan, batch_size)

    return specs.map_batches(fetch, batch_format="pyarrow", batch_size=None)


def read_offset_paged(
    n_records: int,
    fail_plan: dict[int, str] | None = None,
    max_return: int = OFFSET_PAGE_SIZE,
    window_pages: int = 8,
    tag_type: str | None = None,
    tag_value: str | None = None,
    date_range: tuple[int, int] | None = None,
    field_filter: tuple[str, frozenset] | None = None,
    payload_format: str = "json",
    decoder=None,
) -> "ray.data.Dataset":
    """Offset-paged source: offsets are precomputable, so windows of
    ``window_pages`` pages fan out as parallel tasks (S5: 'offset
    windows are precomputable -> parallel'); each task walks its
    window with full retry/renew protocol state.

    ``tag_type``/``tag_value`` select the program-by-tag record set
    (server-side filter, rest/MarketoRestClient.java:373-391); windows
    past the end of the filtered stream return an empty first page and
    stop. ``date_range`` is the program date-range query's
    earliestUpdatedAt/latestUpdatedAt window (inclusive day indices
    against the fixture's virtual ``i % 30`` day,
    rest/MarketoRestClient.java:476-488), and ``field_filter`` its
    optional filterType/filterValues refinement — all applied
    SERVER-side, like the real endpoint.

    ``payload_format``/``decoder`` are the U4 strategy seam: the server
    serves JSON envelopes or raw CSV bodies, and the matching (or a
    caller-supplied) ``decoder`` turns each raw payload into the
    envelope dict the paging protocol consumes — a third format plugs
    in by passing its own callable, no source changes."""
    window = max_return * window_pages
    starts = list(range(0, n_records, window))
    specs = ray.data.from_items([{"start": s} for s in starts])
    if decoder is None and payload_format == "csv":
        decoder = csv_payload_decoder

    def fetch(batch: pa.Table):
        server = FixtureServer(
            n_records=n_records,
            fail_plan=fail_plan or {},
            tag_type=tag_type,
            tag_value=tag_value,
            date_range=date_range,
            field_filter=field_filter,
            payload_format=payload_format,
        )
        client = _PagedClient(server, decoder=decoder)
        for start in batch.column("start").to_pylist():
            offset = start
            stop = min(start + window, n_records)
            while offset < stop:
                env = client.call(server.offset_page, offset, max_return)
                got = len(env["result"])
                if not got:
                    break
                yield _records_to_table(env["result"])
                offset += got
                if got < max_return:  # short page = end of data
                    break

    return specs.map_batches(fetch, batch_format="pyarrow", batch_size=None)
