"""Embulk-style config front door: validation rules + end-to-end runs."""

import pytest

from embulk_input_marketo_ray.config import run_from_config, validate_config


def test_target_required():
    with pytest.raises(ValueError, match="target"):
        validate_config({})


def test_lead_requires_from_date():
    with pytest.raises(ValueError, match="from_date"):
        validate_config({"target": "lead"})


def test_future_from_date_rejected():
    with pytest.raises(ValueError, match="before the job start"):
        validate_config(
            {"target": "lead", "from_date": "2030-01-01", "job_start": "2024-01-01"}
        )


def test_fetch_days_positive_and_batch_size_capped():
    with pytest.raises(ValueError, match="fetch_days"):
        validate_config({"target": "campaign", "fetch_days": 0})
    cfg = validate_config({"target": "campaign", "batch_size": 5000})
    assert cfg["batch_size"] == 300


def test_date_formats_accepted():
    for v in ("2024-01-02", "2024-01-02T03:04:05", "2024-01-02 03:04:05"):
        assert validate_config({"target": "lead", "from_date": v})["from_date"].year == 2024
    with pytest.raises(ValueError, match="unparseable"):
        validate_config({"target": "lead", "from_date": "02/01/2024"})


def test_run_from_config_campaign():
    ds = run_from_config({"target": "campaign", "n_records": 350})
    assert ds.count() == 350


def test_run_from_config_lead_with_included_fields_and_prefix(tmp_path):
    ds = run_from_config(
        {
            "target": "lead",
            "from_date": "2024-01-01",
            "n_events": 2500,
            "num_buckets": 4,
            "included_fields": ["SCORE", "revenue"],  # case-insensitive (M6)
            "column_prefix": "mkt",
            "out_dir": str(tmp_path / "lake"),
        }
    )
    names = set(ds.schema().names)
    assert {"mkt_score", "mkt_revenue"} <= names
    # excluded dynamic fields are gone; base columns unaffected
    assert not any(n.endswith("_active") or n.endswith("_updated") for n in names)
    assert {"repo", "path", "content_sha256"} <= names


def test_use_updated_at_incremental_rejected():
    """Reference: MarketoBaseBulkExtractInputPluginTest.java:58-166 —
    incremental import over updatedAt is a ConfigException."""
    from embulk_input_marketo_ray.config import validate_config

    with pytest.raises(ValueError, match="Column 'updatedAt' cannot be incremental imported"):
        validate_config(
            {"target": "lead", "from_date": "2024-01-01", "use_updated_at": True}
        )
    # non-incremental + use_updated_at is allowed
    cfg = validate_config(
        {
            "target": "lead",
            "from_date": "2024-01-01",
            "use_updated_at": True,
            "incremental": False,
        }
    )
    assert cfg["use_updated_at"] is True


def test_activity_type_ids_sanitation():
    """ActivityBulkExtractInputPlugin.java:74-120: collect-all-invalid
    error, then unknown-id error listing available types."""
    from embulk_input_marketo_ray.registry import sanitize_activity_type_ids

    assert sanitize_activity_type_ids([" 1 ", "2", "11"]) == [1, 2, 11]
    with pytest.raises(ValueError, match=r"Invalid activity type id: \[x, , -3\]"):
        sanitize_activity_type_ids(["1", "x", "", "-3"])
    with pytest.raises(ValueError, match=r"Invalid activity type ids: \[99\], Available"):
        sanitize_activity_type_ids(["1", "99"])


def test_full_readme_key_surface_validates():
    """README.md:44-179: every documented config key is accepted and
    threaded; unknown keys reject like the reference's ConfigMapper."""
    from embulk_input_marketo_ray.config import validate_config

    cfg = validate_config(
        {
            "target": "lead",
            "account_id": "muchkin123",
            "client_id": "cid",
            "client_secret": "secret",
            "partner_api_key": "pk-123",
            "marketo_limit_interval_milis": 20,
            "batch_size": 900,
            "max_return": 500,
            "from_date": "2024-01-01",
            "fetch_days": 7,
            "polling_interval_second": 60,
            "bulk_job_timeout_second": 3600,
            "incremental": True,
            "incremental_column": "createdAt",
            "escape": '"',
            "quote": '"',
            "quotes_in_quoted_fields": "ACCEPT_ONLY_RFC4180_ESCAPED",
            "included_fields": ["score"],
        }
    )
    assert cfg["partner_api_key"] == "pk-123"
    assert cfg["batch_size"] == 300  # hard cap
    assert cfg["max_return"] == 200  # hard cap
    with pytest.raises(ValueError, match="unknown config keys"):
        validate_config({"target": "lead", "from_date": "2024-01-01", "bogus_key": 1})
    with pytest.raises(ValueError, match="quotes_in_quoted_fields"):
        validate_config(
            {"target": "campaign", "quotes_in_quoted_fields": "SOMETIMES"}
        )


def test_incremental_column_updated_at_maps_to_rejection():
    """incremental_column=updatedAt is the same rule as use_updated_at
    (MarketoBaseBulkExtractInputPlugin.java:102-106)."""
    from embulk_input_marketo_ray.config import validate_config

    with pytest.raises(ValueError, match="cannot be incremental imported"):
        validate_config(
            {
                "target": "lead",
                "from_date": "2024-01-01",
                "incremental_column": "updatedAt",
            }
        )
    cfg = validate_config(
        {
            "target": "lead",
            "from_date": "2024-01-01",
            "incremental_column": "updatedAt",
            "incremental": False,
        }
    )
    assert cfg["use_updated_at"] is True
