"""Compare the latest BENCH_DETAIL.json against BASELINE.md's per-query
table: shared-subset ratio, regressions beyond the 2x acceptance bound, and
the biggest movers. Run after `python bench.py`.

Usage: python tools/bench_compare.py [--top N]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10, help="movers to show")
    args = ap.parse_args()

    cur = json.loads((REPO / "BENCH_DETAIL.json").read_text())["queries"]
    base: dict[str, float] = {}
    for line in (REPO / "BASELINE.md").read_text().splitlines():
        m = re.match(r"\| (\w+) \| ([\d.]+) \|", line)
        if m:
            base[m.group(1)] = float(m.group(2))

    shared = sorted(set(base) & set(cur))
    cur_s = sum(cur[k] for k in shared)
    base_s = sum(base[k] for k in shared)
    print(f"registered queries: {len(cur)} (total {sum(cur.values()):.1f} s)")
    print(
        f"shared with baseline: {len(shared)} — {cur_s:.1f} s vs {base_s:.1f} s"
        f" = {cur_s / base_s:.2f}x"
    )

    # Entries where BOTH samples sit under the noise floor measure this
    # host's fixed per-query overhead (JIT, planning, driver round-trips),
    # not the plan — a 0.12 s -> 0.25 s swing is hypervisor weather (the
    # same convention as tools/scaling_report.py's NOISE_SEC grade). They
    # are reported, separately, never silently dropped.
    NOISE_SEC = 0.3
    over, noise = [], []
    for k in shared:
        if cur[k] > 2 * max(base[k], 0.01):
            ratio = cur[k] / max(base[k], 0.01)
            (noise if cur[k] < NOISE_SEC and base[k] < NOISE_SEC else over).append(
                (ratio, k)
            )
    if over:
        print("OVER the 2x acceptance bound:")
        for r, k in sorted(over, reverse=True):
            print(f"  {r:5.2f}x  {base[k]:6.2f} -> {cur[k]:6.2f}  {k}")
    else:
        print("no shared query above the 2x acceptance bound")
    for r, k in sorted(noise, reverse=True):
        print(
            f"  (noise-floor, both samples < {NOISE_SEC}s, not graded: "
            f"{r:.2f}x {base[k]:.2f} -> {cur[k]:.2f}  {k})"
        )

    movers = sorted(
        ((cur[k] / max(base[k], 0.01), k) for k in shared), reverse=True
    )
    print(f"top {args.top} ratios (current/baseline):")
    for r, k in movers[: args.top]:
        print(f"  {r:5.2f}x  {base[k]:6.2f} -> {cur[k]:6.2f}  {k}")
    new = sorted((cur[k], k) for k in set(cur) - set(base))
    if new:
        print(f"queries not in baseline ({len(new)}), slowest 5:")
        for t, k in new[-5:]:
            print(f"  {t:6.2f}  {k}")


if __name__ == "__main__":
    main()
