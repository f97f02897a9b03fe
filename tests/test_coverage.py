"""SURVEY.md SS2 completeness gate: every inventory operator id must be
covered by at least one named query (registry tag) or a pytest suite."""

from __future__ import annotations

from custom_python_etl_data_connector_rohitharumugams_spark.plans import coverage


def test_every_inventory_operator_is_covered():
    missing = coverage.uncovered()
    assert not missing, f"SURVEY SS2 operators with no coverage: {missing}"


def test_every_oracle_query_has_fn_and_every_tag_is_known():
    from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries

    known = set(coverage.INVENTORY)
    for name, qd in all_queries().items():
        unknown = [t for t in qd.tags if t not in known]
        assert not unknown, f"{name}: unknown SS2 tags {unknown}"
