"""Regression tests for the timestamp-encoding hazard class.

The driver's ``events.parquet`` has shipped three different physical
encodings of ``ts`` across rounds:

- TIMESTAMP(NANOS)                      → long via ``nanosAsLong``
- TIMESTAMP(MICROS, adjusted=false)     → TIMESTAMP_NTZ
- TIMESTAMP(MICROS, adjusted to UTC)    → TIMESTAMP

``normalize_events`` (session.py) is the single choke point that must make
every timestamp-consuming query (``unix_micros``, ``session_window``,
``window``, interval arithmetic) encoding-agnostic.  Round 2's only failure
was the NTZ case reaching ``unix_micros`` — this file pins all three.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

ROWS = [
    # (event_id, ts_us, user_id, event_type, value)
    (1, dt.datetime(2024, 1, 1, 10, 0, 0), 1, "click", 1.0),
    (2, dt.datetime(2024, 1, 1, 10, 10, 0), 1, "view", 2.0),
    (3, dt.datetime(2024, 1, 1, 11, 30, 0), 1, "purchase", 3.0),
    (4, dt.datetime(2024, 1, 1, 10, 5, 0), 2, "click", 4.0),
    (5, dt.datetime(2024, 1, 2, 9, 0, 0), 2, "purchase", 5.0),
]


def _write_events(tmpdir: str, encoding: str) -> str:
    ids = pa.array([r[0] for r in ROWS], pa.int64())
    users = pa.array([r[2] for r in ROWS], pa.int64())
    etypes = pa.array([r[3] for r in ROWS], pa.string())
    values = pa.array([r[4] for r in ROWS], pa.float64())
    props = pa.array([None] * len(ROWS), pa.string())
    stamps = [r[1] for r in ROWS]
    if encoding == "nanos":
        ts = pa.array(stamps, pa.timestamp("ns"))
    elif encoding == "ntz":
        ts = pa.array(stamps, pa.timestamp("us"))
    elif encoding == "utc":
        ts = pa.array(stamps, pa.timestamp("us", tz="UTC"))
    else:  # pragma: no cover
        raise ValueError(encoding)
    table = pa.table(
        {
            "event_id": ids,
            "ts": ts,
            "user_id": users,
            "event_type": etypes,
            "value": values,
            "props": props,
        }
    )
    import os

    os.makedirs(tmpdir, exist_ok=True)
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return tmpdir


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("events_enc")
    return {
        enc: _write_events(str(base / enc), enc) for enc in ("nanos", "ntz", "utc")
    }


def _events_queries():
    import __spark_entry__ as ent

    qs = ent.queries()
    return {k: v for k, v in qs.items() if k.startswith("events_")}


def test_normalize_events_all_encodings(spark, encoded_dirs):
    from pyspark.sql import types as T

    from phenoxtract_spark.queries_core import read_table

    micros = {}
    for enc, d in encoded_dirs.items():
        df = read_table(spark, d, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType), enc
        rows = df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
        micros[enc] = {r["event_id"]: r["us"] for r in rows}
    assert micros["nanos"] == micros["ntz"] == micros["utc"]
    # spot value: 2024-01-01T10:00:00Z
    assert micros["ntz"][1] == 1704103200_000000


@pytest.mark.parametrize("enc", ["nanos", "ntz", "utc"])
def test_all_events_queries_run_on_every_encoding(spark, encoded_dirs, enc):
    results = {}
    for name, fn in _events_queries().items():
        out = fn(spark, encoded_dirs[enc])
        results[name] = out.count()
        assert results[name] >= 0, name
    # sessionize: user 1 has sessions {e1,e2} and {e3}; user 2 has {e4},{e5}
    sess = _events_queries()["events_sessionize"](spark, encoded_dirs[enc])
    assert sess.count() == 4


def test_sessionize_values_identical_across_encodings(spark, encoded_dirs):
    fn = _events_queries()["events_sessionize"]
    outs = {
        enc: sorted(
            tuple(r) for r in fn(spark, d).collect()
        )
        for enc, d in encoded_dirs.items()
    }
    assert outs["nanos"] == outs["ntz"] == outs["utc"]
