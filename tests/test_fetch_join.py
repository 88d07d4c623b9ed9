"""Fetch-join + id sanitation tests (J1/M8/M10 analogs of
delegate/LeadWithListInputPluginTest and
MarketoBaseInputPluginDelegate.java:110-161)."""

import pytest

from embulk_input_marketo_ray.sources.fetch_join import read_children_of, sanitize_ids


def test_children_tagged_with_parent_id():
    ds = read_children_of([10, 20], children_per_parent=350)
    df = ds.to_pandas()
    assert len(df) == 700
    counts = df.groupby("listId").size().to_dict()
    assert counts == {10: 350, 20: 350}
    # children keep their own ids; same child set per parent in fixture
    assert sorted(df[df.listId == 10].id) == list(range(350))


def test_custom_parent_column_name():
    ds = read_children_of([1], children_per_parent=10, parent_column="programId")
    assert "programId" in ds.schema().names


def test_sanitize_ids_trims_dedupes_preserves_order():
    assert sanitize_ids([" 3 ", "1", "", "3", "2  "]) == [3, 1, 2]


def test_sanitize_ids_rejects_non_numeric():
    with pytest.raises(ValueError, match="must be a number"):
        sanitize_ids(["1", "abc"])


def test_sanitize_ids_rejects_all_blank():
    with pytest.raises(ValueError, match="No valid ids"):
        sanitize_ids(["", "  "])


def test_zero_record_parent_skipped_without_page_fetch(ray_session):
    """ProgramMembersBulkExtractInputPlugin.java:196-206: an export job
    whose status reports 0 records is skipped WITHOUT opening a child
    stream; the count still lands in the per-parent metadata."""
    import ray

    from embulk_input_marketo_ray.state.metrics import MetricsActor

    metrics = MetricsActor.remote()
    ds = read_children_of(
        [5, 6, 7],
        children_per_parent=450,
        parent_column="programId",
        children_counts={6: 0},
        metrics=metrics,
    )
    df = ds.to_pandas()
    assert sorted(df["programId"].unique()) == [5, 7]
    assert len(df) == 900
    got = ray.get(metrics.get.remote())
    # export-status metadata covers ALL parents, including the skipped one
    assert got["parent_records.5"] == 450
    assert got["parent_records.6"] == 0
    assert got["parent_records.7"] == 450
    # 450 children = 2 token pages (300 + 150) per fetched parent; the
    # zero-record parent contributed none
    assert got["pages_fetched"] == 4
