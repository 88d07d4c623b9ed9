"""Target dispatch registry: all 8 reference targets build and run."""

import pytest

from embulk_input_marketo_ray.registry import TARGETS, build_target


def test_all_eight_targets_present():
    assert sorted(TARGETS) == [
        "activity",
        "all_lead_with_list_id",
        "all_lead_with_program_id",
        "campaign",
        "custom_object",
        "lead",
        "program",
        "program_members",
    ]


def test_unknown_target_lists_valid():
    with pytest.raises(ValueError, match="valid:"):
        build_target("nope")


def test_campaign_and_program_targets_run():
    assert build_target("campaign", {"n_records": 450}).count() == 450
    assert build_target("program", {"n_records": 350}).count() == 350


def test_program_tag_validation():
    with pytest.raises(ValueError, match="tag_type"):
        build_target("program", {"query_by": "tag"})
    with pytest.raises(ValueError, match="query_by"):
        build_target("program", {"query_by": "bogus"})


CO_BASE = {"custom_object_api_name": "car_c", "custom_object_filter_type": "id"}


def test_custom_object_validation_mirrors_reference():
    """CustomObjectInputPluginTest:65-108: blank filter_type, blank
    api_name, inverted range, empty / all-blank filter_values each
    reject with the reference's error."""
    with pytest.raises(ValueError, match="custom_object_filter_type"):
        build_target("custom_object", {"custom_object_api_name": "car_c"})
    with pytest.raises(ValueError, match="custom_object_api_name"):
        build_target("custom_object", {"custom_object_filter_type": "id"})
    with pytest.raises(ValueError, match="cannot be less than"):
        build_target("custom_object", {**CO_BASE, "from_value": 10, "to_value": 5})
    with pytest.raises(ValueError, match="empty values only"):
        build_target("custom_object", {**CO_BASE, "custom_object_filter_values": ""})
    with pytest.raises(ValueError, match="empty values only"):
        build_target(
            "custom_object", {**CO_BASE, "custom_object_filter_values": ",, , "}
        )


def test_custom_object_covers_id_range():
    ds = build_target("custom_object", {**CO_BASE, "from_value": 1, "to_value": 650})
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(1, 651))


def test_custom_object_explicit_filter_values():
    """testRunStringFilterValues analog: the refined value list (trim,
    drop blanks, dedup) is queried directly; values absent from the
    object universe return no record."""
    ds = build_target(
        "custom_object",
        {
            **CO_BASE,
            "custom_object_filter_values": " 5 ,6,, 6 ,900,abc",
            "existing_ids": range(1, 701),
        },
    )
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == [5, 6]  # 900 outside the universe, abc non-numeric


def test_custom_object_open_ended_stops_at_empty_chunk():
    """testRunFromOnlyFilter + rest/MarketoRestClient.java:561-565: no
    to_value walks consecutive 300-id chunks and STOPS at the first
    empty one — ids past a >=300-id gap are never reached."""
    ds = build_target(
        "custom_object",
        {**CO_BASE, "from_value": 1, "existing_ids": list(range(1, 51)) + [1000]},
    )
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(1, 51))  # 1000 beyond the empty [301,600] chunk

    # dense default universe: from-only covers 1..n_objects
    ds2 = build_target("custom_object", {**CO_BASE, "n_objects": 420})
    assert sorted(r["id"] for r in ds2.take_all()) == list(range(1, 421))


def test_program_date_range_filters():
    """ProgramInputPlugin date_range parity: earliest/latest window
    (server-side), report_duration preferred over latest, filter_type
    requires filter_values, inverted range rejects."""
    with pytest.raises(ValueError, match="filter_value is required"):
        build_target("program", {"filter_type": "type"})
    with pytest.raises(ValueError, match="earliest_updated_at"):
        build_target("program", {"latest_day": 5})
    with pytest.raises(ValueError, match="Invalid date range"):
        build_target("program", {"earliest_day": 9, "latest_day": 3})

    # day window: fixture day = id % 30
    ds = build_target("program", {"n_records": 300, "earliest_day": 2, "latest_day": 4})
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == [i for i in range(300) if 2 <= i % 30 <= 4]

    # report_duration wins over latest_day
    ds2 = build_target(
        "program",
        {"n_records": 300, "earliest_day": 2, "latest_day": 20, "report_duration_days": 2},
    )
    assert sorted(r["id"] for r in ds2.take_all()) == ids

    # filter_type/filter_values refine the date-range set server-side
    ds3 = build_target(
        "program",
        {
            "n_records": 300,
            "earliest_day": 2,
            "latest_day": 4,
            "filter_type": "type",
            "filter_values": "trigger",
        },
    )
    got = {(r["id"], r["type"]) for r in ds3.take_all()}
    assert got and all(t == "trigger" for _, t in got)
    assert {i for i, _ in got} == {i for i in ids if i % 3 == 0}


def test_lead_with_list_and_program_members():
    ds = build_target("all_lead_with_list_id", {"list_ids": ["7", " 8 "]})
    assert "listId" in ds.schema().names
    ds2 = build_target("program_members", {"program_ids": ["5"]})
    assert "programId" in ds2.schema().names


def test_lead_target_builds_lake():
    ds = build_target("lead", {"n_events": 3000, "num_buckets": 8})
    names = ds.schema().names
    assert {"repo", "path", "content_sha256", "mk_score"} <= set(names)
    assert ds.count() > 0


def test_program_tag_filters_record_set():
    """query_by=tag must change the FETCHED data, not just validate
    config (MarketoRestClient.java:373-391): every row carries the tag
    value and the set differs from the unfiltered date_range fetch."""
    full = build_target("program", {"n_records": 900}).take_all()
    tagged = build_target(
        "program",
        {"query_by": "tag", "n_records": 900, "tag_type": "type", "tag_value": "trigger"},
    ).take_all()
    assert 0 < len(tagged) < len(full)
    assert all(r["type"] == "trigger" for r in tagged)
    expected_ids = sorted(r["id"] for r in full if r["type"] == "trigger")
    assert sorted(r["id"] for r in tagged) == expected_ids
    # workspace tag selects a different, disjoint-rule subset
    ws = build_target(
        "program",
        {"query_by": "tag", "n_records": 900, "tag_type": "workspaceName", "tag_value": "ws3"},
    ).take_all()
    assert sorted(r["id"] for r in ws) == sorted(
        r["id"] for r in full if r["workspaceName"] == "ws3"
    )
