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


def test_custom_object_requires_api_name_and_covers_id_range():
    with pytest.raises(ValueError, match="custom_object_api_name"):
        build_target("custom_object")
    ds = build_target(
        "custom_object",
        {"custom_object_api_name": "car_c", "from_value": 1, "to_value": 650},
    )
    ids = sorted(r["id"] for r in ds.take_all())
    assert ids == list(range(1, 651))


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
