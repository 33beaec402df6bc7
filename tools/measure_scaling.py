"""Scale rehearsal: measure sf1 → sf3 → sf10 growth for the most
expensive queries (SCALING.md exponent table — r8 verdict ask #1).

One FRESH session per scale (never two concurrently); within a scale
each query runs once, plus a second rep when the first came in under
30 s (min-of-2 damps the one-shot noise that the repo's methodology
documents at up to 10×).  A query that exceeds the per-query budget at
one scale is SKIPPED at larger scales (recorded, never silent).

The synthesized fixture is deliberately dedup-hostile: every sf0.1 doc
is copied with a distinct trailing token, so near-dup CLUSTER SIZE
equals the copy count (10/30/100 at sf1/sf3/sf10) and candidate-pair
volume grows ~copies² while the corpus grows ~copies.  For
pair-bounded operators the honest scaling model is therefore time ∝
candidate pairs, not time ∝ rows — the harness records both row and
pair growth so SCALING.md can regress against the right denominator.

Usage:
  python tools/measure_scaling.py out.json q1 q2 ...        # default scales
  SCALES=sf1:/tmp/phenoxtract_sf1,sf3:/tmp/phenoxtract_sf3 ...
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BUDGET_S = float(os.environ.get("SCALE_BUDGET_S", "180"))
SECOND_REP_UNDER_S = 30.0

DEFAULT_SCALES = [
    ("sf1", "/tmp/phenoxtract_sf1"),
    ("sf3", "/tmp/phenoxtract_sf3"),
    ("sf10", "/tmp/phenoxtract_sf10"),
]


def main() -> int:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    scales = DEFAULT_SCALES
    if os.environ.get("SCALES"):
        scales = [tuple(s.split(":", 1)) for s in os.environ["SCALES"].split(",")]

    from phenoxtract_spark import get_spark

    import __spark_entry__ as ent

    reg = ent.queries()
    unknown = [n for n in names if n not in reg]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    results: dict[str, dict] = {n: {} for n in names}
    skipped: set[str] = set()
    for label, sf_dir in scales:
        spark = get_spark(app_name=f"scale-{label}")
        spark.sparkContext.setLogLevel("ERROR")
        for n in names:
            if n in skipped:
                results[n][label] = "SKIPPED(budget)"
                continue
            try:
                t0 = time.time()
                cnt = reg[n](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt
                if dt < SECOND_REP_UNDER_S:
                    t0 = time.time()
                    reg[n](spark, sf_dir).count()
                    best = min(best, time.time() - t0)
                results[n][label] = {"sec": round(best, 2),
                                     "one_shot": round(dt, 2), "rows": cnt}
                print(f"{label:5s} {n:40s} {best:7.2f}s rows={cnt}",
                      file=sys.stderr, flush=True)
                if dt > BUDGET_S:
                    skipped.add(n)
                    print(f"      -> over budget ({BUDGET_S}s); skipping "
                          f"at larger scales", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 — record, keep sweeping
                results[n][label] = f"ERR {type(exc).__name__}: {exc}"[:300]
                skipped.add(n)
                print(f"{label:5s} {n:40s} ERR {type(exc).__name__}",
                      file=sys.stderr, flush=True)
        spark.stop()
        time.sleep(2)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
