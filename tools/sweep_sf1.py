"""Full-registry sf1 timing sweep (r5 methodology — SCALING.md §sweep).

Runs EVERY registered query once at the synthesized sf1 scale (10×
sf0.1 via tools/gen_scale_data.py) in one fresh session and writes
{name: seconds | "ERR <type>"} JSON.  This is the net that catches what
the sf≤0.1 correctness gates cannot: scale-only crashes (r5 found an
ANSI empty-array throw that needs a zero-order customer to exist) and
quadratic-in-disguise or interpreted-hot-path grinds (r5 found a
>10-minute per-pair HOF cosine).

Caveats: one-shot single-session numbers — late-query spikes up to ~30×
were observed from accumulated JVM/GC state and always re-measured
clean in fresh sessions; treat the sweep as a CRASH/ORDER-OF-MAGNITUDE
detector and re-measure any outlier in isolation (and NEVER run a
second Spark session concurrently while timing).

Usage: python tools/sweep_sf1.py [out.json]   (default /tmp/sweep_sf1.json)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sweep_sf1.json"
    from phenoxtract_spark import get_spark
    from tools.gen_scale_data import generate

    import __spark_entry__ as ent

    sf1_dir = generate()
    spark = get_spark(app_name="sweep-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).count()
    times: dict[str, float | str] = {}
    n_err = 0
    for name, fn in ent.queries().items():
        t0 = time.time()
        try:
            fn(spark, sf1_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 2)
        except Exception as exc:
            times[name] = f"ERR {type(exc).__name__}"
            n_err += 1
        print(f"{name}: {times[name]}", flush=True)
    with open(out_path, "w") as fh:
        json.dump(times, fh)
    total = sum(v for v in times.values() if isinstance(v, float))
    print(f"\n{len(times)} ran, {n_err} errors, {total:.1f}s total -> {out_path}")
    spark.stop()
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
