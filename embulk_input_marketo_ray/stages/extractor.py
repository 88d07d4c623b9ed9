"""Stateful paged-extractor actor pool.

The Ray-Data analog of the reference's REST extraction protocol state
(SURVEY.md §2.3 T1-T4): a callable CLASS passed to
``map_batches(PagedExtractor, concurrency=N, batch_format="pyarrow")``
so that per-worker state — access token, rate limiter, retry budget,
paging cursor — is built ONCE per actor in ``__init__`` and reused
across batches.

Protocol semantics reproduced (the "server" here is the Parquet
change-event table, so pages are zero-copy slices of the input block):

- token pages of at most 300 records (``batch_size=300`` hard max,
  rest/MarketoRestClient.java:55,114-117);
- lazy token acquisition, renewed when expired mid-stream
  (double-checked in the Java client, rest/MarketoBaseRestClient.java:87-103,
  renew-on-601/602 at :265-274 — per-actor here, so a plain check);
- bounded retry with exponential backoff on transient faults
  (7 retries, 20 s -> 120 s in the reference,
  rest/MarketoBaseRestClient.java:219-302; backoff times are
  configurable and default to ~0 so tests/benches don't sleep);
- token-bucket rate limiting (100 calls / 20 s API quota,
  reference README.md:51, sleep-on-606 at
  rest/MarketoBaseRestClient.java:276-283) — disabled by default.

Faults are injected deterministically (hash of page cursor + attempt)
for tests; production batches pass through zero-copy.
"""

from __future__ import annotations

import time
import zlib

import pyarrow as pa

MAX_BATCH_SIZE = 300  # rest/MarketoRestClient.java:55
DEFAULT_MAX_RETRIES = 7  # rest/MarketoRestClient.java:128-138
TOKEN_TTL_PAGES = 1000  # stand-in for wall-clock token expiry


class TransientPageError(RuntimeError):
    """A retryable fetch failure (analog of Marketo codes 604/606/608/...)."""


class PagedExtractor:
    """Actor-pool stage: page-structured fetch with per-actor protocol state.

    Pass to ``ds.map_batches(PagedExtractor, concurrency=(m, n),
    batch_format="pyarrow", fn_constructor_kwargs={...})``.
    """

    def __init__(
        self,
        page_size: int = MAX_BATCH_SIZE,
        max_retries: int = DEFAULT_MAX_RETRIES,
        backoff_initial_s: float = 0.0,
        backoff_max_s: float = 0.0,
        fault_rate: float = 0.0,
        rate_limit: tuple[int, float] | None = None,
        metrics=None,
    ) -> None:
        self.page_size = min(page_size, MAX_BATCH_SIZE)
        self.max_retries = max_retries
        self.backoff_initial_s = backoff_initial_s
        self.backoff_max_s = backoff_max_s
        self.fault_rate = fault_rate
        self.rate_limit = rate_limit  # (calls, per_seconds)
        self.metrics = metrics  # optional MetricsActor handle
        # once-per-actor init (T1): acquire token, reset counters
        self.token = self._acquire_token()
        self.token_pages = 0
        self.pages = 0
        self.records = 0
        self.retries = 0
        self._window_start = time.monotonic()
        self._window_calls = 0

    # --- protocol internals -------------------------------------------------

    def _acquire_token(self) -> str:
        return f"tok-{time.monotonic_ns():x}"

    def _ensure_token(self) -> None:
        """Renew on expiry (analog of 601/602 renew-then-retry)."""
        if self.token_pages >= TOKEN_TTL_PAGES:
            self.token = self._acquire_token()
            self.token_pages = 0

    def _throttle(self) -> None:
        if self.rate_limit is None:
            return
        calls, per_s = self.rate_limit
        now = time.monotonic()
        if now - self._window_start >= per_s:
            self._window_start, self._window_calls = now, 0
        if self._window_calls >= calls:
            time.sleep(max(0.0, per_s - (now - self._window_start)))
            self._window_start, self._window_calls = time.monotonic(), 0
        self._window_calls += 1

    def _fault_injected(self, cursor: int, attempt: int) -> bool:
        if self.fault_rate <= 0.0:
            return False
        # deterministic pseudo-random in [0,1): same page fails the same
        # way on every run, and succeeds after one retry
        h = zlib.crc32(f"{cursor}:{attempt}".encode()) / 0xFFFFFFFF
        return h < self.fault_rate

    def _fetch_page(self, cursor: int) -> None:
        """One simulated API call for the page at ``cursor`` with the
        reference's bounded-retry/backoff loop."""
        attempt = 0
        while True:
            self._ensure_token()
            self._throttle()
            if not self._fault_injected(cursor, attempt):
                self.token_pages += 1
                return
            attempt += 1
            self.retries += 1
            if attempt > self.max_retries:
                raise TransientPageError(
                    f"page at cursor {cursor} failed after {self.max_retries} retries"
                )
            backoff = min(self.backoff_initial_s * (2 ** (attempt - 1)), self.backoff_max_s)
            if backoff > 0:
                time.sleep(backoff)

    # --- batch entry point --------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Walk the batch in token-page windows; rows pass through zero-copy."""
        n = batch.num_rows
        for off in range(0, n, self.page_size):
            self._fetch_page(cursor=self.records + off)
            self.pages += 1
        self.records += n
        if self.metrics is not None:
            # one synchronous call per batch (~0.5 ms vs a >=32k-row
            # batch): the ray.get barrier guarantees the increment is
            # APPLIED before this task completes, so pipeline completion
            # implies exact counters — a fire-and-forget .remote() can
            # still be in flight when the driver reads the actor and
            # undercounts events_read
            import ray as _ray

            _ray.get(self.metrics.inc.remote("events_read", n))
        return batch
