"""Paged extractor protocol state: paging, retry, token renewal.

Mirrors the reference's pagination/retry tests
(rest/MarketoRestClientTest.java:327-372,
rest/MarketoBaseRestClientTest.java:66-335) against the simulated
page protocol.
"""

import pyarrow as pa
import pytest

from embulk_input_marketo_ray.stages.extractor import (
    PagedExtractor,
    TransientPageError,
)


def _batch(n):
    return pa.table({"x": list(range(n))})


def test_pages_of_at_most_300():
    ex = PagedExtractor()
    out = ex(_batch(650))
    assert out.num_rows == 650  # pass-through, zero-copy
    assert ex.pages == 3  # 300 + 300 + 50
    assert ex.records == 650


def test_page_size_capped_at_hard_max():
    assert PagedExtractor(page_size=5000).page_size == 300


def test_transient_faults_retried_then_succeed():
    ex = PagedExtractor(fault_rate=0.5, max_retries=7)
    out = ex(_batch(900))
    assert out.num_rows == 900
    assert ex.retries > 0  # some pages needed retries but all succeeded


def test_retry_budget_exhaustion_raises():
    ex = PagedExtractor(fault_rate=1.0, max_retries=3)
    with pytest.raises(TransientPageError):
        ex(_batch(10))
    assert ex.retries == 4  # initial + 3 retries counted as retry attempts


def test_state_survives_across_batches():
    ex = PagedExtractor()
    tok = ex.token
    ex(_batch(300))
    ex(_batch(300))
    assert ex.pages == 2 and ex.records == 600
    assert ex.token == tok  # acquired once per actor (T1)


def test_rate_limiter_enforces_quota():
    import time

    ex = PagedExtractor(rate_limit=(3, 0.2))  # 3 calls per 200 ms
    t0 = time.monotonic()
    ex(_batch(1500))  # 5 pages -> must cross at least one window boundary
    assert time.monotonic() - t0 >= 0.15
    assert ex.pages == 5


def test_token_renewed_after_ttl():
    import embulk_input_marketo_ray.stages.extractor as mod

    ex = PagedExtractor()
    tok = ex.token
    ex.token_pages = mod.TOKEN_TTL_PAGES  # force expiry
    ex(_batch(10))
    assert ex.token != tok
