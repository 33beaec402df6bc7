"""Flake hunter: hash-stability gate for rounded-double queries.

The r7 driver flake (``curation_lr_calibration``) was a double-sum whose
partial-aggregation order is run-dependent: a boundary value flipped
under an in-query ``round()``, so the SAME query on the SAME data
hash-mismatched once and passed five re-runs.  Queries that are
integer-exact (CUSUM/EWMA/pareto's scaled-integer grids) or
DECIMAL-accumulated (pagerank, the fixed LR family) cannot flake this
way; any OTHER query that sums doubles and rounds could.

This gate re-runs each candidate query ``--reps`` times, each rep under
a DIFFERENT ``spark.sql.shuffle.partitions`` (forcing different partial
-aggregation trees and merge orders), canonicalizes exactly like
``check_correctness.normalize`` (the driver's compare), and flags any
query whose canonical hash is not identical across reps.

Candidates: by default, every registered query whose result contains a
float64 column (the superset where order-dependent rounding is even
possible — integer/string/date outputs cannot express the class).
Explicit names override the filter.

Usage:
    python tools/flake_hunter.py [--reps N] [--sf-dir PATH] [name ...]

Exit 0 = all stable; 1 = at least one unstable; 2 = usage error.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from check_correctness import normalize  # driver-faithful canonicalization

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# Distinct partition counts per rep: prime-ish spread so partial-agg
# tree shapes genuinely differ (1 forces a single-task global agg — the
# degenerate order; 32 matches the bench session).
_PARTITIONS = [16, 3, 32, 7, 5, 24, 11, 2]


def _hash(pdf: pd.DataFrame) -> str:
    canon = normalize(pdf.copy())
    return hashlib.md5(
        canon.to_csv(index=False).encode("utf-8", "surrogatepass")
    ).hexdigest()


def main() -> int:
    import __spark_entry__ as ent
    from phenoxtract_spark import get_spark

    global SF_DIR
    args = sys.argv[1:]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        if i + 1 >= len(args):
            print("ERROR: --reps requires a count")
            return 2
        reps = int(args[i + 1])
        del args[i : i + 2]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        if i + 1 >= len(args):
            print("ERROR: --sf-dir requires a path")
            return 2
        SF_DIR = args[i + 1]
        del args[i : i + 2]
    unknown = [a for a in args if a.startswith("--")]
    if unknown:
        print(f"ERROR: unknown flag(s): {unknown}")
        return 2
    qs = ent.queries()
    missing = set(args) - set(qs)
    if missing:
        print(f"ERROR: not registered queries: {sorted(missing)}")
        return 2
    only = set(args)

    spark = get_spark(shuffle_partitions=_PARTITIONS[0])
    spark.sparkContext.setLogLevel("ERROR")
    unstable, stable, skipped, errored = [], 0, 0, []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        hashes = []
        for rep in range(reps):
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(_PARTITIONS[rep % len(_PARTITIONS)]),
            )
            try:
                pdf = fn(spark, SF_DIR).toPandas()
            except Exception as e:  # noqa: BLE001 - report, keep sweeping
                print(f"ERR  {name} rep{rep}: {type(e).__name__}: {e}")
                errored.append(name)
                hashes = None
                break
            if rep == 0 and not only:
                has_double = any(
                    pd.api.types.is_float_dtype(pdf[c]) for c in pdf.columns
                )
                if not has_double:
                    print(f"SKIP {name}: no double output column")
                    skipped += 1
                    hashes = None
                    break
            hashes.append(_hash(pdf))
        if hashes is None:
            continue
        if len(set(hashes)) == 1:
            print(f"OK   {name}: {reps}/{reps} identical ({time.time()-t0:.1f}s)")
            stable += 1
        else:
            print(
                f"FLAKY {name}: {len(set(hashes))} distinct hashes over "
                f"{reps} reps {hashes} ({time.time()-t0:.1f}s)"
            )
            unstable.append(name)
    print(
        f"\n{stable} stable, {len(unstable)} flaky, {skipped} skipped "
        f"(no double col), {len(errored)} errored"
    )
    if unstable:
        print("FLAKY: " + " ".join(unstable))
    if errored:
        print("ERRORED: " + " ".join(errored))
    spark.stop()
    return 1 if (unstable or errored) else 0


if __name__ == "__main__":
    sys.exit(main())
