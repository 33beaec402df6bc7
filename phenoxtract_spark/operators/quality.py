"""Declarative data-quality constraint suite (Deequ-style, single-pass).

A constraint contract is a list of checks over columns; the whole suite is
evaluated in ONE aggregation job — every check contributes conditional
aggregates to the same ``agg()`` — then unpivoted to a long report
(column, check, observed, n_violations, passed).

Scale notes: the pass is a full-scan partial aggregate (map-side combine,
one row out per check); ``unique`` checks add a ``count(DISTINCT col)``
which Spark plans via expand + two-phase aggregate — still one job, no
driver loop.  At 100 TB, prefer ``approx_unique`` (HLL sketch, no expand)
when exact uniqueness isn't contractual.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One constraint: ``kind`` ∈ {not_null, unique, approx_unique, min_ge,
    max_le, in_set, matches} with ``param`` as the bound / allowed values /
    regex."""

    column: str
    kind: str
    param: object = None


def _violations(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return F.count(F.when(col.isNull(), 1))
    if c.kind == "min_ge":
        return F.count(F.when(col < F.lit(c.param), 1))
    if c.kind == "max_le":
        return F.count(F.when(col > F.lit(c.param), 1))
    if c.kind == "in_set":
        return F.count(F.when(~col.isin(*c.param) & col.isNotNull(), 1))
    if c.kind == "matches":
        return F.count(
            F.when(col.isNotNull() & ~col.rlike(c.param), 1)
        )
    if c.kind in ("unique", "approx_unique"):
        # violations = rows - distinct non-null values - null rows
        distinct = (
            F.countDistinct(col)
            if c.kind == "unique"
            else F.approx_count_distinct(col)
        )
        return F.count(col) - distinct
    raise ValueError(f"unknown check kind: {c.kind}")


def constraint_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate the contract in one aggregation; returns
    (column, check, n_violations, passed) — one row per check, stable order
    by (column, check)."""
    aggs = [
        _violations(c).cast("bigint").alias(f"_v{i}") for i, c in enumerate(checks)
    ]
    row = df.agg(*aggs)
    pairs = []
    for i, c in enumerate(checks):
        pairs += [
            F.lit(c.column),
            F.lit(c.kind),
            F.col(f"_v{i}"),
        ]
    long = row.select(
        F.stack(F.lit(len(checks)), *pairs).alias("column", "check", "n_violations")
    )
    return long.select(
        "column",
        "check",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("column", "check")


def table_diff(left: DataFrame, right: DataFrame, key_cols: list[str],
               compare_cols: list[str]) -> DataFrame:
    """Snapshot reconciliation: row-level diff of two table versions —
    the data-regression check a pipeline runs after a backfill, a CDC
    replay, or an engine migration.

    Returns (*key_cols, status, n_changed_cols) where status is
    ``removed`` (key only in ``left``), ``added`` (only in ``right``),
    ``changed`` (present in both, >=1 compare col differs, null-safe),
    or ``unchanged``.  One full outer join on the key — same plan shape
    as :func:`~phenoxtract_spark.operators.cdc.cdc_apply`, and exactly
    the comparison semantics of ``IS DISTINCT FROM`` so the oracle
    replays it verbatim."""
    l = left.select(
        *key_cols, F.lit(1).alias("_in_l"),
        *[F.col(c).alias(f"_l_{c}") for c in compare_cols],
    )
    r = right.select(
        *key_cols, F.lit(1).alias("_in_r"),
        *[F.col(c).alias(f"_r_{c}") for c in compare_cols],
    )
    j = l.join(r, key_cols, "full_outer")
    diffs = [
        (~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))).cast("int")
        for c in compare_cols
    ]
    n_changed = sum(diffs[1:], diffs[0]) if diffs else F.lit(0)
    return j.select(
        *key_cols,
        F.when(F.col("_in_r").isNull(), F.lit("removed"))
        .when(F.col("_in_l").isNull(), F.lit("added"))
        .when(n_changed > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        F.when(
            F.col("_in_l").isNull() | F.col("_in_r").isNull(), F.lit(0)
        )
        .otherwise(n_changed)
        .cast("bigint")
        .alias("n_changed_cols"),
    )


def group_digest(df: DataFrame, group_col: str,
                 payload: list[Column | str],
                 sep: str = "\x1f") -> DataFrame:
    """Order-independent per-group content digest — the anti-entropy
    primitive for comparing two copies of a table (replica vs primary,
    pre- vs post-migration) WITHOUT sorting or shipping rows: each row
    hashes to a 60-bit integer (md5 of the separator-joined payload
    rendering) and a group's digest is the XOR of its row hashes plus
    the row count and a 32-bit hash sum.  XOR is commutative/associative
    with no overflow, so the digest is independent of row order,
    partitioning, and merge tree — two copies agree iff their
    (digest, n_rows, sum32) triples agree per group, and a mismatch
    localizes to the group.  XOR alone cancels rows duplicated an even
    number of times; the count and the bounded sum (2^32·n < 2^63 for
    any realistic group) are the standard hardening.  Callers must
    render NON-AMBIGUOUS payload strings (e.g. integer cents, not
    floats) — the digest is only as engine-stable as its rendering.
    NULL cells render as a \\x00-prefixed sentinel rather than being
    skipped: ``concat_ws`` drops NULLs entirely, so (a, NULL, b) and
    (a, b, NULL) would otherwise hash identically — a silent false
    negative in exactly the divergence this primitive exists to catch.
    One groupBy; map-side partial aggregation applies."""
    cols = [F.col(c) if isinstance(c, str) else c for c in payload]
    rendered = [F.coalesce(c.cast("string"), F.lit("\x00NULL")) for c in cols]
    h = F.conv(
        F.substring(F.md5(F.concat_ws(sep, *rendered)), 1, 15),
        16, 10,
    ).cast("bigint")
    return (
        df.select(F.col(group_col), h.alias("_h"))
        .groupBy(group_col)
        .agg(
            F.bit_xor("_h").alias("digest"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("_h") % F.lit(4294967296)).cast("bigint").alias("sum32"),
        )
    )
