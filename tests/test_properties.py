"""Property-based tests (hypothesis) — the testing dimension the reference
lacks (SURVEY §5.6).  Each property batches all examples into ONE DataFrame
so a hypothesis run costs one Spark job, not one per example."""

import datetime

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from phenoxtract_spark.descriptors import Identifier
from phenoxtract_spark.functions import casting, durations

DATES = st.dates(min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2100, 1, 1))


def _add_months_clamped(d: datetime.date, months: int) -> datetime.date:
    """Python reference for Spark's add_months (day clamped to month end)."""
    y, m = divmod(d.month - 1 + months, 12)
    y += d.year
    m += 1
    import calendar

    day = min(d.day, calendar.monthrange(y, m)[1])
    return datetime.date(y, m, day)


def _parse_iso(iso: str) -> tuple[int, int, int]:
    import re

    m = re.fullmatch(r"P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)D)?", iso)
    assert m, iso
    return tuple(int(g) if g else 0 for g in m.groups())


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(DATES, DATES), min_size=1, max_size=50))
def test_date_diff_iso_roundtrip(spark, pairs):
    """start + parsed(Y,M,D) must land exactly on end — for every random
    date pair (the calendar-exact property the oracle can't express)."""
    pairs = [(min(a, b), max(a, b)) for a, b in pairs]
    df = spark.createDataFrame(pairs, "s date, e date")
    rows = df.select(
        "s", "e", durations.date_diff_to_iso(F.col("s"), F.col("e")).alias("iso")
    ).collect()
    for r in rows:
        y, m, d = _parse_iso(r["iso"])
        reconstructed = _add_months_clamped(r["s"], y * 12 + m) + datetime.timedelta(days=d)
        assert reconstructed == r["e"], (r["s"], r["e"], r["iso"])


@settings(max_examples=20, deadline=None)
@given(st.lists(DATES, min_size=1, max_size=50), st.sampled_from(casting.DATE_FORMATS))
def test_multiformat_date_roundtrip(spark, dates, fmt):
    """format(date, f) → parse_date_multi must recover the exact date for
    every supported format."""
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    spark_fmt = fmt
    out = df.select(
        "d",
        casting.parse_date_multi(F.date_format("d", spark_fmt)).alias("parsed"),
    ).collect()
    for r in out:
        assert r["parsed"] == r["d"], (r["d"], fmt)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.text(alphabet="abcxyz_09", min_size=1, max_size=8), min_size=1, max_size=12),
    st.data(),
)
def test_identifier_resolution_properties(columns, data):
    """Multi resolution ≡ order-preserving set intersection; Single ≡ exact
    equality; results always ⊆ columns and in column order."""
    wanted = data.draw(st.lists(st.sampled_from(columns), max_size=5))
    multi = Identifier.of(list(wanted)).resolve(columns)
    assert multi == [c for c in columns if c in set(wanted)]
    single = Identifier.of(columns[0]).resolve(columns)
    assert single == [c for c in columns if c == columns[0]]


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=150), min_size=1, max_size=60))
def test_age_to_iso_in_range(spark, ages):
    df = spark.createDataFrame([(str(a),) for a in ages], "a string")
    out = [r["x"] for r in df.select(durations.age_years_to_iso("a").alias("x")).collect()]
    assert out == [f"P{a}Y" for a in ages]
