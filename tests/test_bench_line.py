"""The driver-stdout contract: bench.py's ONE JSON line must fit the
driver's ~1.9 KB stdout tail WITH a complete per-query map at the LIVE
registry size — round 10 lost the map when 200 queries overflowed the
old fixed-precision form, which is exactly the regression this pins."""

from __future__ import annotations

import json

import bench
from custom_python_etl_data_connector_rohitharumugams_spark.plans import all_queries


def _fixture(t_sub: float, t_mid: float) -> tuple[dict, dict, float]:
    """Synthetic timings over the REAL registry names: alternate
    sub-second and multi-second values (the realistic worst case for
    line length — all-sub-second corpora encode shorter)."""
    names = sorted(all_queries())
    timings = {
        n: (t_sub if i % 2 == 0 else t_mid) for i, n in enumerate(names)
    }
    keymap = {f"{i:02x}": n for i, n in enumerate(names)}
    return timings, keymap, round(sum(timings.values()), 3)


def test_stdout_line_fits_budget_with_full_map_at_live_registry_size():
    timings, keymap, total = _fixture(0.4, 1.7)
    line = bench.build_stdout_line(timings, keymap, total, 0.1)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(timings), "per-query map was dropped"
    assert parsed["unit"] == "sec" and parsed["value"] == total


def test_stdout_line_coarse_tier_preserves_subsecond_precision():
    """When the fine tier overflows, >=1 s values round to integers but
    sub-second values keep their decimal (they are the ones where a
    0.1 s delta is signal)."""
    timings, keymap, total = _fixture(0.4, 11.74)  # 2-digit secs force coarse
    line = bench.build_stdout_line(timings, keymap, total, 0.1)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    parsed = json.loads(line)
    if parsed["queries"]:  # coarse tier, not the empty-map fallback
        vals = set(parsed["queries"].values())
        assert 0.4 in vals
        assert 12 in vals or 11.7 in vals


def test_stdout_line_never_exceeds_budget_even_degenerate():
    """1000 fake queries with ugly values must still emit a parseable
    line under budget (the empty-map fallback)."""
    names = [f"q{i:04d}" for i in range(1000)]
    timings = {n: 123.456 for n in names}
    keymap = {f"{i:03x}": n for i, n in enumerate(names)}
    line = bench.build_stdout_line(timings, keymap, 123456.0, 0.1)
    assert len(line) <= bench.STDOUT_LINE_BUDGET
    json.loads(line)
