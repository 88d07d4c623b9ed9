"""Pagination protocol tests, mirroring the reference's
rest/MarketoRestClientTest.java:327-372 (token pages post nextPageToken,
offset paging stops on short page) and
rest/MarketoBaseRestClientTest.java:66-335 (602 renew, 606 wait,
invalid-JSON retry)."""

import pytest

from embulk_input_marketo_ray.sources.paged import (
    FixtureServer,
    MarketoApiError,
    _PagedClient,
    iter_token_pages,
    read_offset_paged,
    read_token_paged,
)


def test_token_pages_follow_cursor_until_exhausted():
    server = FixtureServer(n_records=750)
    pages = list(iter_token_pages(server))
    assert [p.num_rows for p in pages] == [300, 300, 150]
    ids = [i for p in pages for i in p.column("id").to_pylist()]
    assert ids == list(range(750))


def test_token_page_size_capped_at_300():
    server = FixtureServer(n_records=500)
    pages = list(iter_token_pages(server, batch_size=1000))
    assert [p.num_rows for p in pages] == [300, 200]


def test_expired_token_renewed_mid_stream():
    server = FixtureServer(n_records=900, fail_plan={1: "602"})
    pages = list(iter_token_pages(server))
    assert sum(p.num_rows for p in pages) == 900


def test_rate_limit_and_bad_json_retried():
    server = FixtureServer(n_records=700, fail_plan={0: "606", 2: "badjson"})
    pages = list(iter_token_pages(server))
    assert sum(p.num_rows for p in pages) == 700


def test_retry_budget_exhausted_raises():
    server = FixtureServer(n_records=100)
    client = _PagedClient(server, max_retries=2)

    def always_rate_limited(token, *a):
        raise MarketoApiError(606, "rate limited")

    with pytest.raises(MarketoApiError):
        client.call(always_rate_limited)
    assert client.retries == 3


def test_non_retryable_error_propagates():
    server = FixtureServer(n_records=100)
    client = _PagedClient(server)

    def fatal(token, *a):
        raise MarketoApiError(603, "Access denied")

    with pytest.raises(MarketoApiError) as ei:
        client.call(fatal)
    assert ei.value.code == 603
    assert client.retries == 1  # counted, not retried


def test_token_paged_dataset_streams_all_records():
    ds = read_token_paged(1000, fail_plan={1: "602"})
    assert ds.count() == 1000
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(1000))


def test_offset_paged_dataset_parallel_windows():
    ds = read_offset_paged(3300, fail_plan={0: "606"})
    assert ds.count() == 3300
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(3300))


def test_offset_short_page_terminates():
    # 450 records with max_return 200 -> pages 200/200/50, stop
    ds = read_offset_paged(450)
    assert ds.count() == 450


def test_decoder_strategy_seam():
    """U4: the payload decoder is pluggable — the same paging protocol
    consumes a JSON envelope (default) or a raw CSV body
    (rest/MarketoResponseJettyEntityReader vs
    MarketoInputStreamResponseEntityReader)."""
    from embulk_input_marketo_ray.sources.paged import (
        FixtureServer,
        PayloadDecodeError,
        _PagedClient,
        csv_payload_decoder,
        json_envelope_decoder,
    )

    env = json_envelope_decoder('{"success": true, "result": [{"id": 1}]}')
    assert env["result"] == [{"id": 1}]
    with pytest.raises(PayloadDecodeError):
        json_envelope_decoder("{not json")

    env = csv_payload_decoder("id,name\n1,a\n2,null\n")
    assert env["success"] and env["result"] == [
        {"id": 1, "name": "a"},
        {"id": 2, "name": None},
    ]
    # protocol errors still arrive as JSON even in CSV mode
    env = csv_payload_decoder('{"success": true, "result": []}')
    assert env["result"] == []
    with pytest.raises(PayloadDecodeError):
        csv_payload_decoder('id,name\n"unterminated\n')

    # the client retries a bad payload then succeeds (fixture injects once)
    server = FixtureServer(n_records=5, fail_plan={0: "badjson"})
    client = _PagedClient(server, decoder=json_envelope_decoder)
    out = client.call(server.token_page, None, 300)
    assert len(out["result"]) == 5 and client.retries == 1


def test_offset_paged_csv_seam_matches_json():
    """The CSV-body decoder path returns the identical record set as
    the JSON-envelope path, through the same paging protocol."""
    from embulk_input_marketo_ray.sources.paged import read_offset_paged

    js = sorted(r["id"] for r in read_offset_paged(700).take_all())
    cs = read_offset_paged(700, payload_format="csv").take_all()
    assert sorted(r["id"] for r in cs) == js
    assert all(isinstance(r["id"], int) for r in cs[:5])
    assert cs[0]["name"].startswith("Campaign_")


def test_third_decoder_plugs_in_without_source_changes():
    """U4: a caller-supplied decoder strategy slots into the seam — no
    paged.py internals touched."""
    from embulk_input_marketo_ray.sources.paged import (
        json_envelope_decoder,
        read_offset_paged,
    )

    def shouting_decoder(raw: str) -> dict:
        env = json_envelope_decoder(raw)
        for r in env.get("result", []):
            r["name"] = r["name"].upper()
        return env

    out = read_offset_paged(250, decoder=shouting_decoder).take_all()
    assert len(out) == 250
    assert all(r["name"].startswith("CAMPAIGN_") for r in out)
