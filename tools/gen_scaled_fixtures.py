"""Generate synthetically scaled fixture tables for scaling-exponent runs.

The driver ships sf{0.001,0.01,0.1}; confirming the near-linear scaling
claims in DESIGN.md needs at least one point ~10x beyond the bench scale.
This tool replicates the sf0.1 tables ``--factor`` times with
referential-integrity-preserving key offsets (each replica's keys live in
a disjoint stride; region/nation stay fixed — they are constant-size dims
at every TPC-H scale), writing ``{out}/{table}.parquet`` dirs that
catalog.load_table reads exactly like driver fixtures.

Replicas are DECORRELATED so scaled runs measure plan scaling, not
planted-duplicate explosions:
- documents: replica r > 0 rotates the lowercase alphabet by r
  (``translate``) — token counts/lengths/structure preserved, but no
  shingle survives across replicas, so near-dup pair counts scale ~10x,
  not ~45x (every doc would otherwise gain 9 exact twins and the
  pair-emitting queries would measure the DATA, not the plan);
- embeddings: replica r > 0 rotates the dimension order by 5*r —
  norm-preserving, and cosines between replicas of the same base vector
  drop to ~0, so near-dup/semantic-dedup/decontamination queries see 10x
  the data, not 10 planted twins of everything;
- part: replica r > 0 alphabet-rotates p_name (same rationale: the
  blocked-ER query's (noun, brand) blocks must not collect 10 identical
  name copies).

Usage: python tools/gen_scaled_fixtures.py [--factor 10]
       [--base /root/testdata/sf0.1] [--out /tmp/sparkgraft_sf1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

#: id-ish columns per table and their replica stride. Strides must clear
#: BOTH any base key AND the planted-invariant id space: the planted
#: MinHash/SimHash/SemDeDup queries clone fixture rows at id +
#: PLANT_OFFSET (10_000_000, plans/llm.py), so a 10M doc_id/vec_id stride
#: would make replica r+1's real ids collide with replica r's clones —
#: duplicate ids, join fan-out, and corrupted invariant booleans at the
#: scaled tier. 1e9 strides keep every replica's [base, base + 10M + N)
#: planted span disjoint.
KEY_STRIDES: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 1_000_000_000},
    "supplier": {"s_suppkey": 1_000_000_000},
    "part": {"p_partkey": 1_000_000_000},
    "orders": {"o_orderkey": 1_000_000_000, "o_custkey": 1_000_000_000},
    "lineitem": {
        "l_orderkey": 1_000_000_000,
        "l_partkey": 1_000_000_000,
        "l_suppkey": 1_000_000_000,
    },
    "events": {"event_id": 1_000_000_000, "user_id": 1_000_000_000},
    "documents": {"doc_id": 1_000_000_000},
    "embeddings": {"vec_id": 1_000_000_000},
}
FIXED_DIMS = ("region", "nation")
ALPHA = "abcdefghijklmnopqrstuvwxyz"

#: multipliers coprime to 26 — with the 26 shifts they give 312 distinct
#: affine letter permutations, so text replicas stay pairwise-decorrelated
#: far beyond the 26-replica period where the plain Caesar rotation used
#: through round 5 silently repeated (r=0 and r=26 would share identical
#: text under different ids — a planted exact-dup explosion at factor 27+)
_MULTS = (1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)


def _alpha_perm(r: int) -> str:
    """Affine permutation of ALPHA for replica ``r``: idx -> (a*idx + b)
    mod 26 with a = coprime multiplier cycled every 26 replicas, b = r mod
    26. r=0 is the identity; permutations are pairwise distinct for
    r < 312."""
    a = _MULTS[(r // 26) % len(_MULTS)]
    b = r % 26
    return "".join(ALPHA[(a * i + b) % 26] for i in range(26))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sparkgraft_sf1")
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list restricting which tables to generate "
        "(e.g. 'embeddings' for the ANN-only sf10 tier); default all",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    from pyspark.sql import functions as F

    from custom_python_etl_data_connector_rohitharumugams_spark.catalog import (
        load_table,
    )
    from custom_python_etl_data_connector_rohitharumugams_spark.session import (
        get_spark,
    )

    spark = get_spark("gen-scaled-fixtures")
    spark.sparkContext.setLogLevel("ERROR")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    for t in FIXED_DIMS:
        if only is not None and t not in only:
            continue
        load_table(spark, args.base, t).write.mode("overwrite").parquet(
            str(out / f"{t}.parquet")
        )
        print(f"{t}: copied (fixed dim)")

    for t, strides in KEY_STRIDES.items():
        if only is not None and t not in only:
            continue
        base = load_table(spark, args.base, t)
        replicas = []
        for r in range(args.factor):
            rep = base
            for col, stride in strides.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(r * stride)).cast("long")
                )
            if r > 0 and t == "documents":
                rep = rep.withColumn(
                    "text", F.translate("text", ALPHA, _alpha_perm(r))
                )
            if r > 0 and t == "part":
                # decorrelate part names too: otherwise every ER block key
                # (noun token, brand) collects 10 identical name copies and
                # the blocked-edit-distance query measures a planted
                # pair explosion instead of plan scaling
                rep = rep.withColumn(
                    "p_name", F.translate("p_name", ALPHA, _alpha_perm(r))
                )
            if r > 0 and t == "embeddings":
                # per-replica DIMENSION ROTATION: norm-preserving, and the
                # cosine between any two replicas of the same base vector
                # drops to ~0 (random dims land on random dims). The
                # previous additive jitter (max ~0.6%/element) left
                # cross-replica cosines at ~0.9995 — ABOVE every
                # similarity threshold in the suite, so scaled runs
                # measured a planted 10-twin explosion, not plan scaling.
                # Rotation amounts differ per replica, so replica-vs-
                # replica pairs decorrelate too (rot_a(v) . rot_b(v) =
                # v . rot_{b-a}(v)).
                dim = 64
                # rotate by (r*5) % dim: beyond factor 13 the raw r*5
                # would exceed dim and F.slice would get a non-positive
                # length, silently writing empty/invalid embeddings into
                # the scaled tier. gcd(5, 64) = 1, so the 64 rotations are
                # pairwise distinct for r < 64 and the only identity is
                # r = 0 (guarded below: concat of empty slices would
                # corrupt the column). Replica 64 alone would repeat
                # replica 0's embeddings verbatim — the same
                # silent-period bug the affine text permutations fix — so
                # past the rotation period a SECOND norm-preserving
                # transform kicks in: a per-group SIGN PATTERN (group
                # g = r // 64; g = 0 keeps the historical identity so
                # factor <= 64 tiers reproduce bit-for-bit). Flipping a
                # balanced half of the dims preserves the norm exactly,
                # and same-rotation cross-group pairs (r, r + 64k) land
                # at cosine ~ 0 for generic vectors (a balanced +/- sum
                # of squares). Patterns depend on (2g+1) mod 64, which has
                # period 32 in g, so there are 32 distinct sign patterns
                # and the combined rotation x sign period is 64 * 32 =
                # 2048 replicas — the assert refuses factors past it.
                assert args.factor <= dim * dim // 2, (
                    f"embedding transforms repeat at replica {dim * dim // 2}: "
                    f"factor {args.factor} would plant cross-replica "
                    "exact dups — add a third norm-preserving transform "
                    "before generating this tier"
                )
                rot_by = (r * 5) % dim
                if rot_by:
                    rep = rep.withColumn(
                        "embedding",
                        F.concat(
                            F.slice("embedding", rot_by + 1, dim - rot_by),
                            F.slice("embedding", 1, rot_by),
                        ),
                    )
                g = r // dim
                if g:
                    # flip dim j iff ((j+1) * (2g+1)) % 64 < 32: balanced
                    # (exactly half the residues land under 32 for odd
                    # multipliers), deterministic, distinct per group
                    signs = [
                        -1.0 if ((j + 1) * (2 * g + 1)) % dim < dim // 2 else 1.0
                        for j in range(dim)
                    ]
                    rep = rep.withColumn(
                        "embedding",
                        F.zip_with(
                            "embedding",
                            F.array(*[F.lit(s) for s in signs]),
                            lambda x, s: x * s,
                        ),
                    )
            replicas.append(rep)
        scaled = replicas[0]
        for rep in replicas[1:]:
            scaled = scaled.unionByName(rep)
        scaled.write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
        print(f"{t}: x{args.factor} -> {out / t}.parquet")

    print(f"done: {out}")


if __name__ == "__main__":
    main()
