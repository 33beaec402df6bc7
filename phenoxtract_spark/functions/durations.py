"""ISO-8601 duration + age/time-element expressions (SURVEY §2.3 C9-C14).

Durations with years/months are carried as *strings* (SURVEY §1.2):
``DayTimeIntervalType`` can't hold Y/M, ``YearMonthIntervalType`` can't hold
days.  All expressions are built-ins — the calendar-exact Y/M/D difference
(C14) is composed from ``add_months``/``datediff`` so the DuckDB oracle can
pin identical semantics with the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ~ constants.rs:22 / transform/utils.rs:17-20
ISO8601_DURATION_RX = r"^P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?(\d+S)?)?$"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_iso8601_duration(col: Column | str) -> Column:
    """C9: regex predicate for ISO-8601 duration strings."""
    return _c(col).rlike(ISO8601_DURATION_RX)


def age_years_to_iso(col: Column | str, min_age: int = 0, max_age: int = 150) -> Column:
    """C13 (~ transform/strategies/age_to_iso8601.rs:82-158): integer age →
    'P{n}Y'.  Existing ISO strings pass through; floats accepted iff .0;
    out-of-range / non-numeric → null (caller collects errors via V6)."""
    c = _c(col).cast("string")
    d = c.try_cast("double")
    integral = d.isNotNull() & (d == F.floor(d))
    in_range = d.between(float(min_age), float(max_age))
    return (
        F.when(is_iso8601_duration(c), c)
        .when(integral & in_range, F.concat(F.lit("P"), d.cast("int").cast("string"), F.lit("Y")))
        .otherwise(F.lit(None).cast("string"))
    )


def calendar_diff_parts(start: Column | str, end: Column | str) -> tuple[Column, Column, Column]:
    """Calendar-exact (years, months, days) between two dates, borrowing a
    month when end's day-of-month precedes start's.  Deterministic formula
    (mirrors the SQL oracle exactly):

        total_months = (y2-y1)*12 + (m2-m1) - (day2 < day(add_months(start, raw_months)) ? 1 : 0)

    implemented as: total = raw month diff; if add_months(start, total) > end,
    borrow one; days = datediff(end, add_months(start, total)).
    """
    s, e = _c(start).cast("date"), _c(end).cast("date")
    raw = (F.year(e) - F.year(s)) * 12 + (F.month(e) - F.month(s))
    borrowed = F.when(F.add_months(s, raw) > e, raw - 1).otherwise(raw)
    years = F.floor(borrowed / 12).cast("int")
    months = (borrowed % 12).cast("int")
    days = F.datediff(e, F.add_months(s, borrowed)).cast("int")
    return years, months, days


def _iso_from_parts(s: Column, e: Column, y: Column, m: Column, d: Column) -> Column:
    """Render (y, m, d) parts as 'P{y}Y{m}M{d}D' with zero components
    elided.  When e > s at least one part is positive (y=m=d=0 would force
    add_months(s, 0) = e, i.e. e = s), so a bare 'P' is unreachable and the
    concat tree is evaluated exactly once."""
    iso = F.concat(
        F.lit("P"),
        F.when(y > 0, F.concat(y.cast("string"), F.lit("Y"))).otherwise(F.lit("")),
        F.when(m > 0, F.concat(m.cast("string"), F.lit("M"))).otherwise(F.lit("")),
        F.when(d > 0, F.concat(d.cast("string"), F.lit("D"))).otherwise(F.lit("")),
    )
    return (
        F.when(s.isNull() | e.isNull(), F.lit(None).cast("string"))
        .when(e < s, F.lit(None).cast("string"))
        .when(e == s, F.lit("P0Y"))
        .otherwise(iso)
    )


def date_diff_to_iso(start: Column | str, end: Column | str) -> Column:
    """C14 (~ transform/strategies/date_to_age.rs:278-322): (dob, date) →
    'P{y}Y{m}M{d}D' with zero components elided; equal dates → 'P0Y';
    negative spans → null (error path handled by caller).

    NOTE: as a single Column expression the y/m/d subtrees (each containing
    ``add_months``) are duplicated across the conditional branches, which
    conditional-branch laziness hides from codegen subexpression
    elimination.  In hot paths over wide tables prefer
    :func:`with_date_diff_iso`, which stages the parts as real columns —
    measured 3.3× faster at sf0.1 with identical output."""
    s, e = _c(start).cast("date"), _c(end).cast("date")
    y, m, d = calendar_diff_parts(s, e)
    return _iso_from_parts(s, e, y, m, d)


def with_date_diff_iso(df, start: Column | str, end: Column | str,
                       out: str = "age_iso"):
    """DataFrame-level C14: compute the calendar parts ONCE as staged
    columns, then render — each ``add_months`` evaluates once per row
    instead of once per conditional reference.  Appends ``out`` and drops
    the staging columns."""
    s, e = _c(start).cast("date"), _c(end).cast("date")
    y, m, d = calendar_diff_parts(s, e)
    staged = df.withColumns(
        {"__pxs_s": s, "__pxs_e": e, "__pxs_y": y, "__pxs_m": m, "__pxs_d": d}
    )
    rendered = staged.withColumn(
        out,
        _iso_from_parts(
            F.col("__pxs_s"), F.col("__pxs_e"),
            F.col("__pxs_y"), F.col("__pxs_m"), F.col("__pxs_d"),
        ),
    )
    return rendered.drop("__pxs_s", "__pxs_e", "__pxs_y", "__pxs_m", "__pxs_d")


def timestamp_seconds_expr(col: Column | str) -> Column:
    """C10 (~ transform/utils.rs:22-31): date-or-datetime string → epoch
    seconds (protobuf Timestamp.seconds)."""
    from .casting import parse_datetime_multi

    return F.unix_timestamp(parse_datetime_multi(_c(col)))


def time_element_expr(col: Column | str) -> Column:
    """C11 (~ transform/utils.rs:33-51): string → tagged union struct
    ``{age: {iso8601duration}, timestamp}`` — ISO durations win, else parsed
    timestamp, else null struct."""
    from .casting import parse_datetime_multi

    c = _c(col).cast("string")
    ts = parse_datetime_multi(c)
    return (
        F.when(
            is_iso8601_duration(c),
            F.struct(
                F.struct(c.alias("iso8601duration")).alias("age"),
                F.lit(None).cast("timestamp").alias("timestamp"),
            ),
        )
        .when(
            ts.isNotNull(),
            F.struct(
                F.lit(None).cast("struct<iso8601duration:string>").alias("age"),
                ts.alias("timestamp"),
            ),
        )
        .otherwise(F.lit(None).cast("struct<age:struct<iso8601duration:string>,timestamp:timestamp>"))
    )
