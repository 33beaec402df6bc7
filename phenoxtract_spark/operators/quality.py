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
