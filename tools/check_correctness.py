"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares against
``oracle_sql()`` via DuckDB: row count + schema (column names) + value
comparison (order-insensitive; columns sorted by name, rows sorted by all
columns).  Exact equality is the target — queries are written so both
engines produce bit-identical values (doubles rounded in-query).

Usage: python tools/check_correctness.py [--vanilla] [--sf-dir PATH]
       [--conf k=v ...] [query ...]

``--vanilla`` builds a PLAIN SparkSession exactly like the external driver
does (no engine confs) instead of ``get_spark`` — any query that silently
depends on a session conf (e.g. nanosAsLong for the NTZ events parquet)
fails here before it fails in the driver.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(v):
    """Canonical string for an object cell: engine-independent.  Arrays
    arrive as Python lists (vanilla Spark toPandas), numpy arrays (Arrow
    Spark / DuckDB), or tuples — all must stringify identically, and
    numpy scalars must render like Python scalars (np.float64 str differs
    inside ndarray reprs)."""
    import numpy as np

    if v is None or v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ", ".join(str(_canon(x)) for x in v) + "]"
    if isinstance(v, np.floating):
        return str(float(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # null dates must normalize like nulls everywhere else: a
            # datetime64 column renders them 'NaT' while an object column
            # (Spark toPandas with any null) holds None — same value,
            # different container (first seen on g10_packet_flat at sf0.1,
            # where the first zero-order customer appears)
            s = s.astype("datetime64[us]").astype(str)
            s = s.where(s != "NaT", None)
        elif s.dtype == object:
            s = s.map(_canon)
        out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count {len(spark_pdf)} vs {len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns {sc} vs {dc}")
        return problems
    # Driver-fatal shape (round-6 hardening): the external driver
    # canonicalizes with a raw pandas ``sort_values`` over cell values —
    # a list/array/dict-valued column cannot be factorized and CRASHES its
    # compare outright (the r5 ``multimodal_features`` red row:
    # "TypeError: unhashable type: 'list'").  Our ``_canon`` stringifies
    # lists, which is exactly how that query shipped green locally and red
    # in the driver — so flag the shape itself, on either side.
    import numpy as np

    import decimal

    for side, pdf in (("spark", spark_pdf), ("oracle", duck_pdf)):
        for c in pdf.columns:
            s = pdf[c]
            if s.dtype != object:
                continue
            sample = s.dropna().head(100)
            if any(
                isinstance(v, (list, tuple, dict, np.ndarray)) for v in sample
            ):
                problems.append(
                    f"col {c}: {side} result holds list/array values — the "
                    f"driver's sort_values canon cannot hash lists and "
                    f"CRASHES (r5 multimodal_features); posexplode or "
                    f"stringify the column"
                )
            # Round-10 hardening — the CLASS fix for render divergence
            # (third instance: r4 int-vs-float, r5 list canon, r9
            # Decimal-vs-float).  The driver hashes values AS RENDERED,
            # and a DECIMAL output column renders engine-dependently:
            # Spark toPandas yields decimal.Decimal('…4900') objects
            # (scale-padded str) while DuckDB fetchdf degrades DECIMAL
            # aggregates to float64 ('…49').  Any Decimal cell on either
            # side is therefore a driver hazard regardless of what the
            # other side holds — ban the type outright (the registry-wide
            # pytest pins the same rule at the schema level).
            if any(isinstance(v, decimal.Decimal) for v in sample):
                problems.append(
                    f"col {c}: {side} result holds decimal.Decimal objects "
                    f"— driver-render-unsafe (r9 grouping_sets_revenue/"
                    f"analytics_rfm_segments red rows); output integer "
                    f"cents (BIGINT) or round to DOUBLE instead"
                )
    # Generic rendered-dtype agreement (same round-10 class fix): a
    # column whose cells are NUMERIC OBJECTS on one side (Python
    # int/float/Decimal inside an object column) but a real numeric
    # dtype on the other renders through different str() paths — flag
    # the split itself instead of forgiving it via pd.to_numeric below.
    # (columns are already known to match on both sides here — a column-set
    # mismatch appended a problem and returned at the top of compare())
    for c in spark_pdf.columns:
        for s_obj, s_num, on, nn in (
            (spark_pdf[c], duck_pdf[c], "spark", "oracle"),
            (duck_pdf[c], spark_pdf[c], "oracle", "spark"),
        ):
            if s_obj.dtype != object or s_num.dtype == object:
                continue
            if not pd.api.types.is_numeric_dtype(s_num):
                continue
            sample = s_obj.dropna().head(100)
            if len(sample) and all(
                isinstance(v, (int, float, decimal.Decimal))
                and not isinstance(v, bool)
                for v in sample
            ):
                problems.append(
                    f"col {c}: {on} holds numeric OBJECTS (object dtype) vs "
                    f"{nn} numeric dtype {s_num.dtype} — rendered-value "
                    f"divergence the driver would hash-FAIL; cast both "
                    f"sides to the same concrete type"
                )
    if problems:
        return problems
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    if len(a) != len(b):
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        # Integer-exact path (round-4 hardening): when either engine
        # delivered an integer-typed column, NEVER compare through float64
        # — values above 2^53 silently round identically on both sides and
        # mask real mismatches (the r3 dedup_simhash HUGEINT bug).  If the
        # other side arrived as float (e.g. DuckDB HUGEINT via fetchdf),
        # the precision it already lost surfaces here as an exact FAIL.
        a_int = pd.api.types.is_integer_dtype(av)
        b_int = pd.api.types.is_integer_dtype(bv)
        # Representation-faithful path (round-5 hardening): the driver
        # hashes values AS RENDERED, so an int64 `99111` vs a float64
        # `99111.0` is a driver FAIL even when the values are integer-
        # identical (the r4 events_json_props red row: DuckDB HUGEINT →
        # fetchdf float64).  Coercing through Int64 here forgave exactly
        # that divergence — flag it instead.
        if (a_int and pd.api.types.is_float_dtype(bv)) or (
            b_int and pd.api.types.is_float_dtype(av)
        ):
            problems.append(
                f"col {c}: dtype divergence {av.dtype} vs {bv.dtype} — the "
                f"driver hashes rendered values (int repr vs float repr) and "
                f"would FAIL; cast the oracle (or query) so both sides agree"
            )
            continue
        if a_int or b_int:
            try:
                an, bn = av.astype("Int64"), bv.astype("Int64")
            except (ValueError, TypeError):
                an = bn = None  # non-integral strings: genuine value mismatch
            if an is not None:
                # fillna(False): with nullable Int64, null-vs-value yields
                # pd.NA which nullable-bool sum() would silently skip.
                eq = ((an == bn) | (an.isna() & bn.isna())).fillna(False)
                nbad = int((~eq).sum())
                if nbad:
                    idx = (~eq).idxmax()
                    problems.append(
                        f"col {c}: {nbad} integer-exact mismatches "
                        f"e.g. {an[idx]!r} vs {bn[idx]!r}"
                    )
                continue
        try:
            an = pd.to_numeric(av, errors="raise").astype("float64")
            bn = pd.to_numeric(bv, errors="raise").astype("float64")
        except (ValueError, TypeError):
            if not av.equals(bv):
                neq = av.fillna("\0") != bv.fillna("\0")
                nbad = int(neq.sum())
                idx = neq.idxmax()
                problems.append(
                    f"col {c}: {nbad} mismatches e.g. {av[idx]!r} vs {bv[idx]!r}"
                )
            continue
        eq = (an == bn) | (an.isna() & bn.isna())
        nbad = int((~eq).sum())
        if nbad:
            idx = (~eq).idxmax()
            close = ((an - bn).abs() < 1e-9) | (an.isna() & bn.isna())
            kind = "ulp-level" if bool(close.all()) else "value"
            problems.append(
                f"col {c}: {nbad} {kind} mismatches e.g. {an[idx]!r} vs {bn[idx]!r}"
            )
    return problems


def main():
    import __spark_entry__ as ent
    from phenoxtract_spark import get_spark

    global SF_DIR
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    if vanilla:
        args = [a for a in args if a != "--vanilla"]
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        if i + 1 >= len(args):
            print("ERROR: --sf-dir requires a path")
            sys.exit(2)
        SF_DIR = args[i + 1]
        del args[i : i + 2]
    # --conf k=v (repeatable): hostile-config gate — rerun the registry
    # under spark.sql.shuffle.partitions=3 / adaptive.enabled=false /
    # codegen.wholeStage=false etc. (runtime SQL confs only).  Values
    # must not depend on partitioning, AQE, or the codegen evaluator;
    # the r9 round ran this trio ad-hoc, this flag makes it a one-liner.
    hostile_confs: list[tuple[str, str]] = []
    while "--conf" in args:
        i = args.index("--conf")
        if i + 1 >= len(args) or "=" not in args[i + 1]:
            print("ERROR: --conf requires key=value")
            sys.exit(2)
        k, _, v = args[i + 1].partition("=")
        hostile_confs.append((k, v))
        del args[i : i + 2]
    # any remaining arg must name a registered query — an unrecognized
    # flag or a typo would otherwise filter everything out and print a
    # deceptively green "0 ok, 0 fail" (this silently no-op'd a round-6
    # session's per-query scale gates; never again)
    unknown = [a for a in args if a.startswith("--")]
    if unknown:
        print(f"ERROR: unknown flag(s): {unknown}")
        sys.exit(2)
    only = set(args)
    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[*]")
            .appName("check-correctness-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(shuffle_partitions=16)
    for k, v in hostile_confs:
        # validate the key: spark.conf.set happily stores arbitrary
        # unknown strings, so a typo'd key (shuffel.partitions) would run
        # the registry under the DEFAULT config and record a deceptively
        # green gate pass that varied nothing — the same deceptive-green
        # class the round-6 unknown-flag fix closed.  isModifiable is
        # True exactly for registered runtime SQL confs (what this flag
        # is for); static or unknown keys exit 2 with a clean message.
        if not spark.conf.isModifiable(k):
            print(f"ERROR: --conf key {k!r} is not a modifiable runtime "
                  f"SQL conf (typo, or a static conf this tool can't set)")
            sys.exit(2)
        spark.conf.set(k, v)
        got = spark.conf.get(k)
        if got != v:
            print(f"ERROR: --conf {k}={v} did not take (session reports "
                  f"{got!r})")
            sys.exit(2)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(SF_DIR)
    qs, oracles = ent.queries(), ent.oracle_sql()
    missing = only - set(qs)
    if missing:
        print(f"ERROR: not registered queries: {sorted(missing)}")
        sys.exit(2)
    ok = fail = no_oracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            fail += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            no_oracle += 1
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s): " + "; ".join(problems))
            fail += 1
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows, {time.time()-t0:.1f}s)")
            ok += 1
    print(f"\n{ok} ok, {fail} fail, {no_oracle} rows-only")
    spark.stop()
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
