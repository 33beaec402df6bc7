"""Per-query optimization profiler (r12).

For each named query: run via the noop sink (cold + N warm reps) in ONE
session, and report the per-JOB wall-time breakdown of the cold run via a
SparkListener — the local-mode stand-in for the Spark UI's job table
(spark.ui.enabled is false in the engine session).  This answers "where do
the seconds go" at job granularity: eager checkpoints, broadcast builds,
and the final noop write each show up as separate jobs.

Usage: python3 tools/profile_query.py [--sf-dir DIR] [--reps N] name ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = 2
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sf-dir":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from phenoxtract_spark import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="profile-query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    # same warmup as bench.py (r12: shared helper)
    import bench as _bench

    _bench._warm_session(spark, "/root/testdata/sf0.001")

    sc = spark.sparkContext
    jsc = sc._jsc.sc()

    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN")
            continue
        tracker = sc.statusTracker()
        before_ids = set(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t_build = time.time() - t0
        df.write.format("noop").mode("overwrite").save()
        t_cold = time.time() - t0
        # job breakdown via the REST-less status store
        store = jsc.statusStore()
        jobs = store.jobsList(None)
        rows = []
        n = jobs.size()
        for j in range(n):
            job = jobs.apply(j)
            jid = job.jobId()
            if jid in before_ids:
                continue
            try:
                dur = (job.completionTime().get().getTime()
                       - job.submissionTime().get().getTime()) / 1000.0
            except Exception:
                dur = float("nan")
            rows.append((jid, dur, job.numTasks(), str(job.name())[:90]))
        before_ids |= {r[0] for r in rows}
        warms = []
        for _ in range(reps):
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            warms.append(round(time.time() - t0, 3))
        print(f"\n=== {name}: cold={t_cold:.3f}s (build={t_build:.3f}s) "
              f"warm={warms} jobs={len(rows)}")
        for jid, dur, ntasks, jname in sorted(rows):
            print(f"  job {jid:4d}  {dur:7.3f}s  tasks={ntasks:4d}  {jname}")
    spark.stop()


if __name__ == "__main__":
    main()
