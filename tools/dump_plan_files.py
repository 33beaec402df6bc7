"""Write `.explain("formatted")` output for named queries to files —
the r12 optimization-round evidence artifacts (plans/r12/<q>_<tag>.txt).

Usage: python3 tools/dump_plan_files.py <outdir> <tag> name ...
       python3 tools/dump_plan_files.py <outdir> <tag> --headline
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    from phenoxtract_spark import get_spark

    import __spark_entry__ as ent
    import bench

    if names == ["--headline"]:
        names = list(bench.HEADLINE)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-plan-files")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:
            txt = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
