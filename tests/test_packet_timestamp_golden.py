"""Golden pins for the packet pipeline's timestamp rendering.

Phenopacket ``timeElement``/``timestamp`` fields format through
``parse_datetime_multi`` → ``date_format(..., yyyy-MM-dd'T'HH:mm:ss'Z')``
(operators/phenopacket_v2.py ``_ts_str``).  Timezone-less inputs are the
hazard: their rendering must be machine-timezone-independent and must not
drift as formats are added/reordered.  Reference behavior:
``/root/reference/phenoxtract/src/functions`` datetime coercion — wall-clock
preserved, no tz shifting.
"""

from __future__ import annotations

import json

import pytest

# (raw input, expected timeElement JSON) — tz-less datetimes in every
# supported shape, plus a duration (age branch) and garbage (null branch).
GOLDEN = [
    ("2021-05-03 14:30:00", {"timestamp": "2021-05-03T14:30:00Z"}),
    ("2021-05-03T14:30:00", {"timestamp": "2021-05-03T14:30:00Z"}),
    ("2021-05-03", {"timestamp": "2021-05-03T00:00:00Z"}),
    # MM/dd/yyyy outranks dd-MM-yyyy in DATE_FORMATS (US-style first)
    ("03/05/2021", {"timestamp": "2021-03-05T00:00:00Z"}),
    ("2021", {"timestamp": "2021-01-01T00:00:00Z"}),
    ("P3Y6M", {"age": {"iso8601duration": "P3Y6M"}}),
    ("not a date", None),
]


@pytest.fixture(scope="module")
def rendered(spark):
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators.phenopacket_v2 import time_element_v2

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(GOLDEN)], "i int, raw string"
    )
    out = df.select(
        "i", F.to_json(time_element_v2("raw"), {"ignoreNullFields": "true"}).alias("te")
    ).collect()
    return {r["i"]: (json.loads(r["te"]) if r["te"] else None) for r in out}


@pytest.mark.parametrize("i,case", list(enumerate(GOLDEN)))
def test_time_element_golden(rendered, i, case):
    raw, expected = case
    got = rendered[i]
    if got == {}:
        got = None
    assert got == expected, f"input {raw!r}: {got} != {expected}"


def test_tz_less_rendering_is_session_timezone_invariant(spark):
    """The same tz-less input must render identically under any session
    timezone (parse and format both use the session zone, so wall clock
    round-trips); a regression here would silently shift every packet
    timestamp on a non-UTC driver."""
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators.phenopacket_v2 import _ts_str

    df = spark.createDataFrame([("2021-05-03 14:30:00",)], "raw string")
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        outs = {}
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            outs[tz] = df.select(_ts_str(F.col("raw")).alias("ts")).first()["ts"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
    assert set(outs.values()) == {"2021-05-03T14:30:00Z"}, outs
