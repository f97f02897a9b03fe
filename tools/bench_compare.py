"""Compare per-query bench timings.

Two modes:
- default: the latest BENCH_DETAIL.json against BASELINE.md's per-query
  table — shared-subset ratio, regressions beyond the 2x acceptance
  bound, the biggest movers. Run after `python bench.py`.
- two driver artifacts: ``python tools/bench_compare.py BENCH_r08.json
  BENCH_r09.json`` — self-contained round-over-round diff. Each
  artifact's 2-hex query keys resolve through its committed
  ``BENCH_KEYMAP_r{N}.json`` sidecar (written by bench.py each round;
  rounds 2-9 backfilled from history), so no git archaeology is needed.

Usage: python tools/bench_compare.py [--top N] [OLD.json NEW.json]
"""

from __future__ import annotations

import argparse
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def load_driver_artifact(path: Path) -> dict[str, float]:
    """name -> seconds from a driver BENCH_r{N}.json: parse the JSON line
    out of the recorded stdout tail, then resolve its 2-hex keys through
    the round's committed keymap sidecar."""
    art = json.loads(path.read_text())
    tail = art.get("tail", "")
    i = tail.rfind('{"metric"')
    if i < 0:
        raise SystemExit(f"{path}: no bench JSON line in tail")
    qmap = json.loads(tail[i:].strip())["queries"]
    m = re.search(r"BENCH_r(\d+)\.json$", str(path))
    if not m:
        raise SystemExit(f"{path}: not a BENCH_r{{N}}.json driver artifact")
    side = path.parent / f"BENCH_KEYMAP_r{int(m.group(1)):02d}.json"
    if not side.exists():
        raise SystemExit(f"{path}: missing keymap sidecar {side.name}")
    keymap = json.loads(side.read_text())["keymap"]
    missing = set(qmap) - set(keymap)
    if missing:
        raise SystemExit(
            f"{path}: {len(missing)} artifact keys absent from {side.name} "
            "(keymap drifted — regenerate the sidecar from that round's "
            "BENCH_DETAIL.json)"
        )
    return {keymap[k]: float(v) for k, v in qmap.items()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=10, help="movers to show")
    ap.add_argument(
        "artifacts",
        nargs="*",
        help="optional OLD NEW driver BENCH_r{N}.json pair",
    )
    args = ap.parse_args()

    if args.artifacts:
        if len(args.artifacts) != 2:
            raise SystemExit("artifact mode needs exactly OLD and NEW paths")
        base = load_driver_artifact(Path(args.artifacts[0]))
        cur = load_driver_artifact(Path(args.artifacts[1]))
    else:
        cur = json.loads((REPO / "BENCH_DETAIL.json").read_text())["queries"]
        base = {}
        for line in (REPO / "BASELINE.md").read_text().splitlines():
            m = re.match(r"\| (\w+) \| ([\d.]+) \|", line)
            if m:
                base[m.group(1)] = float(m.group(2))

    shared = sorted(set(base) & set(cur))
    cur_s = sum(cur[k] for k in shared)
    base_s = sum(base[k] for k in shared)
    if not shared or base_s == 0:
        # one artifact carried the empty-map fallback (queries={}) or the
        # keymaps are disjoint — a ratio is undefined; say so, don't crash
        raise SystemExit(
            f"no shared queries to compare ({len(base)} base / {len(cur)} "
            "current) — one artifact likely carries the empty-map stdout "
            "fallback; re-run bench or pass its BENCH_KEYMAP sidecar"
        )
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
