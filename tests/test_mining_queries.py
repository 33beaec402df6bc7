"""Brute-force cross-checks for the round-8 inline queries on hand-built
tables: the DuckDB oracle proves cross-engine equality; these prove the
SEMANTICS against independent pure-Python reimplementations."""

from __future__ import annotations

import datetime
import hashlib

import pytest


def _write(df, tmp_path, name):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_dau_wau_mau_brute_force(spark, tmp_path):
    """Exact DAU/WAU/MAU against a set-based Python replay on a small
    planted activity pattern."""
    import __spark_entry__ as ent

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1 active every day for 40 days; user 2 every 10th day;
    # user 3 only on day 0
    for d in range(40):
        for u, active in ((1, True), (2, d % 10 == 0), (3, d == 0)):
            if active:
                rows.append((eid, base + datetime.timedelta(days=d, hours=u),
                             u, "view", 1.0, None))
                eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    _write(ev, tmp_path, "events")
    out = {r.day: r for r in
           ent.queries()["events_dau_wau_mau"](spark, str(tmp_path)).collect()}

    activity = {}
    for _, ts, u, *_ in rows:
        activity.setdefault(ts.date(), set()).add(u)
    for day, seen in activity.items():
        dau = len(seen)
        wau = len(set().union(*[activity.get(day - datetime.timedelta(days=i),
                                             set()) for i in range(7)]))
        mau = len(set().union(*[activity.get(day - datetime.timedelta(days=i),
                                             set()) for i in range(28)]))
        r = out[day]
        assert (r.dau, r.wau, r.mau) == (dau, wau, mau), day
        assert r.stickiness == (dau * 10000 // mau) / 10000.0


def test_sequence_packing_matches_python_replay(spark, tmp_path):
    """Bin/split accounting matches a pure-Python concat-and-chunk replay
    (same md5 shard, same doc order)."""
    import __spark_entry__ as ent

    docs = [(i, " ".join(["w"] * (100 + 37 * (i % 29)))) for i in range(60)]
    df = spark.createDataFrame(
        [(i, t, "en", "s") for i, t in docs],
        "doc_id bigint, text string, lang string, source string",
    )
    _write(df, tmp_path, "documents")
    out = {r.shard: r for r in
           ent.queries()["curation_sequence_packing"](
               spark, str(tmp_path)).collect()}

    def shard(i):
        return int(hashlib.md5(f"pack-v1::{i}".encode()).hexdigest()[:8],
                   16) % 4

    per = {}
    for i, t in docs:
        per.setdefault(shard(i), []).append((i, len(t.split())))
    for s, items in per.items():
        items.sort()
        cum, splits, total = 0, 0, 0
        for _, n in items:
            start_bin = cum // 2048
            cum += n
            total += n
            if (cum - 1) // 2048 != start_bin:
                splits += 1
        r = out[s]
        n_bins = (total + 2047) // 2048
        assert (r.n_docs, r.total_tokens, r.n_bins) == (len(items), total,
                                                        n_bins)
        assert r.tail_padding == n_bins * 2048 - total
        assert r.n_split_docs == splits
        assert r.split_frac == (splits * 10000 // len(items)) / 10000.0


def test_referential_integrity_finds_planted_orphans(spark, tmp_path):
    import __spark_entry__ as ent

    _write(spark.createDataFrame([(0, "r")], "n_nationkey int, n_name string"),
           tmp_path, "nation")
    _write(spark.createDataFrame(
        [(1, "c", 0, 0.0, "B"), (2, "c", 9, 0.0, "B")],  # nation 9 missing
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string"), tmp_path, "customer")
    _write(spark.createDataFrame(
        [(10, 1, 1.0), (11, 99, 2.0)],  # customer 99 missing
        "o_orderkey bigint, o_custkey bigint, o_totalprice double"),
        tmp_path, "orders")
    _write(spark.createDataFrame(
        [(10, 1, 1), (77, 2, 1), (78, 3, 1)],  # orders 77, 78 missing
        "l_orderkey bigint, l_partkey bigint, l_linenumber int"),
        tmp_path, "lineitem")
    _write(spark.createDataFrame([(5, "s", 0)],
           "s_suppkey bigint, s_name string, s_nationkey int"),
           tmp_path, "supplier")
    out = {(r.fk_table, r.fk_column): r for r in
           ent.queries()["quality_referential_integrity"](
               spark, str(tmp_path)).collect()}
    assert out[("lineitem", "l_orderkey")].n_orphans == 2
    assert out[("orders", "o_custkey")].n_orphans == 1
    assert out[("customer", "c_nationkey")].n_orphans == 1
    assert out[("supplier", "s_nationkey")].n_orphans == 0
    assert out[("supplier", "s_nationkey")].passed is True
    assert out[("lineitem", "l_orderkey")].passed is False


def test_forecast_backtest_known_series(spark, tmp_path):
    """A perfectly linear daily series backtests with ~zero error under
    Holt (level+trend locks onto the trend)."""
    import __spark_entry__ as ent

    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for d in range(12):
        for k in range(10 + 5 * d):  # 10, 15, 20, ... linear growth
            rows.append((eid, base + datetime.timedelta(days=d, minutes=k),
                         k, "click", None, None))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    _write(ev, tmp_path, "events")
    r = ent.queries()["events_forecast_backtest"](
        spark, str(tmp_path)).collect()
    assert len(r) == 1 and r[0].n_train_days == 11
    assert r[0].actual == 65
    # Holt with dyadic alpha/beta converges onto an exact linear trend:
    # small residual from the zero-trend init, decaying geometrically
    assert r[0].abs_error < 1.0
    assert r[0].ape < 0.02
