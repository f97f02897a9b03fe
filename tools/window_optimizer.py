"""Compose the 50-slot driver-priority window for a round.

The driver records CORRECTNESS rows for exactly the first 50 registered
queries, and the judge marks a SURVEY SS2 operator "pass" only if one of
its tags rides a green row in the CURRENT round. So each round's window
must (a) tag-cover all 73 operator ids and (b) rotate in as many
never-driver-checked queries as the cover constraint allows.

This solves that directly: exact set cover (DFS, provably minimal) over
the tags NOT carried by the chosen never-checked cohort, then a greedy
drop loop that ejects the never-checked query whose removal shrinks the
total window most, until the window fits in 50 slots.

MAX-AGE-FIRST RECERTIFICATION (round 11 onward): once every registered
query has at least one driver row, the rotation goal shifts from
first-certification to RE-certification — code keeps being refactored
while most rows age. So (a) among queries whose tag projections tie, the
cover picks the one whose newest CORRECTNESS row is OLDEST, and (b) any
slots left after never-checked + cover are filled with the oldest-
certified queries outright, so the staleness frontier advances every
round.

Usage: python tools/window_optimizer.py [--include name ...]
Prints the chosen window as a ready-to-paste tuple plus the deferred list.
"""
from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from custom_python_etl_data_connector_rohitharumugams_spark.plans import registry

WINDOW = 50


def exact_cover(
    tags: frozenset, cand: dict[str, frozenset], age_key=None
) -> list[str]:
    """Minimal set of candidate queries covering ``tags`` (exact DFS with
    a least-carriers branching heuristic; instances here are ~25 tags).

    Three reductions keep the DFS exact but tractable as the registry
    grows (the raw DFS blew past 5 minutes on the ~160-candidate round-8
    simulation; with these it is sub-second):
    - project every candidate onto the needed tags and keep ONE name per
      distinct projection (duplicates can never both be in a minimal
      cover);
    - drop candidates whose projection is a strict subset of another's
      (a dominated set can always be swapped for its dominator);
    - seed the branch-and-bound with the greedy cover's length, so the
      first descent already prunes at the greedy depth.
    """
    # project + dedupe + dominance-filter the candidate pool; the
    # representative per distinct projection is the OLDEST-certified
    # carrier when age_key is given (max-age-first recertification),
    # else the lexicographic first — deterministic either way
    key = age_key or (lambda n: n)
    proj: dict[frozenset, str] = {}
    for n in sorted(cand, key=lambda n: (key(n), n)):
        s = cand[n] & tags
        if s and s not in proj:
            proj[s] = n
    sets = sorted(proj, key=len, reverse=True)
    kept: list[frozenset] = []
    for s in sets:
        if not any(s < k for k in kept):
            kept.append(s)
    pool = {proj[s]: s for s in kept}

    # greedy upper bound (classic ln-n approximation, here just a seed)
    rem, greedy = set(tags), []
    while rem:
        if not pool or not any(s & rem for s in pool.values()):
            raise RuntimeError(f"tags {sorted(rem)} have no carriers")
        n, s = max(pool.items(), key=lambda kv: (len(kv[1] & rem), kv[0]))
        greedy.append(n)
        rem -= s
    best: list = [len(greedy), list(greedy)]

    def dfs(rem: frozenset, used: list[str]) -> None:
        if not rem:
            if len(used) < best[0]:
                best[0], best[1] = len(used), list(used)
            return
        if len(used) + 1 >= best[0]:
            return
        t = min(rem, key=lambda t: sum(1 for s in pool.values() if t in s))
        for n, s in pool.items():
            if t in s:
                dfs(rem - s, used + [n])

    dfs(frozenset(tags), [])
    return best[1]


def main() -> None:
    must_include = set()
    if "--include" in sys.argv:
        must_include = set(sys.argv[sys.argv.index("--include") + 1 :])
    qs = registry.all_queries()
    checked: set[str] = set()
    last_round: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        rnd = int(m.group(1)) if m else 0
        for n in json.load(open(f)):
            checked.add(n)
            last_round[n] = max(last_round.get(n, 0), rnd)
    never = [n for n in qs if n not in checked]
    alltags = frozenset(t for q in qs.values() for t in q.tags)
    cand = {n: frozenset(qs[n].tags) for n in qs if n in checked}

    def age_key(n: str) -> int:
        return last_round.get(n, 0)

    chosen = list(never)

    _cover_cache: dict[frozenset, list[str]] = {}

    def cover_for(sel: list[str]) -> list[str]:
        # cover depends only on the NEEDED tag set; many drop candidates
        # leave it unchanged (their tags are redundantly covered), so the
        # memo turns the drop loop's O(drops * candidates) DFS calls into
        # a handful of distinct solves
        need = alltags - frozenset(t for n in sel for t in qs[n].tags)
        if need not in _cover_cache:
            _cover_cache[need] = exact_cover(need, cand, age_key=age_key)
        return _cover_cache[need]

    cover = cover_for(chosen)
    while len(chosen) + len(cover) > WINDOW:
        # eject the never-checked query whose removal shrinks the window
        # most (ties: fewest tags, then name for determinism)
        scored = []
        for n in chosen:
            if n in must_include:
                continue
            rest = [m for m in chosen if m != n]
            c = cover_for(rest)
            scored.append((len(rest) + len(c), len(qs[n].tags), n, rest, c))
        if not scored:
            raise SystemExit(
                f"window cannot fit: {len(chosen)} --include queries + "
                f"{len(cover)} cover slots > {WINDOW}; drop an --include"
            )
        scored.sort()
        _, _, dropped, chosen, cover = scored[0]
        print(f"defer {dropped} (window would be {scored[0][0]})", file=sys.stderr)

    # fill any slack with the OLDEST-certified queries outright — the
    # recertification frontier advances even when few tags are missing
    taken = set(cover) | set(chosen)
    refresh = []
    for n in sorted((n for n in cand if n not in taken),
                    key=lambda n: (age_key(n), n)):
        if len(taken) + len(refresh) >= WINDOW:
            break
        refresh.append(n)

    window = sorted(cover) + sorted(chosen) + sorted(refresh)
    got = frozenset(t for n in window for t in qs[n].tags)
    assert got == alltags, f"cover broken: missing {sorted(alltags - got)}"
    assert len(window) <= WINDOW
    print(f"# window: {len(window)} slots = {len(cover)} cover + "
          f"{len(chosen)} first-time + {len(refresh)} refresh; "
          f"deferred {len(never) - len(chosen)}")
    print("_PRIORITY = (")
    for n in sorted(cover):
        print(f'    "{n}",  # cover (last r{age_key(n)}): {" ".join(qs[n].tags)}')
    for n in sorted(chosen):
        print(f'    "{n}",  # first-time: {" ".join(qs[n].tags)}')
    for n in sorted(refresh):
        print(f'    "{n}",  # refresh (last r{age_key(n)}): {" ".join(qs[n].tags)}')
    print(")")
    print("# deferred:", ", ".join(sorted(set(never) - set(chosen))))


if __name__ == "__main__":
    main()
