"""Brute-force cross-checks for the round-9 continuation queries: the
DuckDB oracle proves cross-engine equality; these prove the SEMANTICS
against independent pure-Python reimplementations, plus the real-file
partition-pruning evidence for the sharded-write path."""

from __future__ import annotations

import datetime
import hashlib

import pytest


def _write(df, tmp_path, name):
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def test_survival_hazard_brute_force(spark, tmp_path):
    """KM at-risk table matches a pure-Python replay on a planted log
    with converters, a censored straggler, and a day-0 converter."""
    import __spark_entry__ as ent

    base = datetime.datetime(2024, 3, 1, 12)
    day = datetime.timedelta(days=1)
    rows = []
    eid = 0

    def ev(u, t, typ):
        nonlocal eid
        rows.append((eid, t, u, typ, 1.0, None))
        eid += 1

    # u1: signup day 0, purchase day 3 -> event at dur 3
    ev(1, base, "signup"); ev(1, base + 3 * day, "purchase")
    # u2: purchase on the very first event -> event at dur 0
    ev(2, base, "purchase")
    # u3: active days 0..9, never purchases -> censored at dur 9
    for d in range(10):
        ev(3, base + d * day, "view")
    # u4: signup day 0, purchase day 3 as well -> second event at dur 3
    ev(4, base, "view"); ev(4, base + 3 * day, "purchase")
    # u5: one event only, never purchases -> censored at dur 0
    ev(5, base, "click")

    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    _write(df, tmp_path, "events")
    out = {r.day: r for r in
           ent.queries()["events_survival_hazard"](spark, str(tmp_path)).collect()}

    # python replay
    durs = {}  # user -> (dur, event)
    by_user = {}
    for _, t, u, typ, *_ in rows:
        by_user.setdefault(u, []).append((t, typ))
    for u, evs in by_user.items():
        t0 = min(t for t, _ in evs)
        purchases = [t for t, typ in evs if typ == "purchase"]
        if purchases:
            durs[u] = ((min(purchases).date() - t0.date()).days, 1)
        else:
            durs[u] = ((max(t for t, _ in evs).date() - t0.date()).days, 0)
    n = len(durs)
    expected = {}
    for d in sorted({dur for dur, _ in durs.values()}):
        n_risk = sum(1 for dur, _ in durs.values() if dur >= d)
        n_event = sum(1 for dur, e in durs.values() if dur == d and e == 1)
        n_cens = sum(1 for dur, e in durs.values() if dur == d and e == 0)
        if n_event > 0:
            expected[d] = (n_risk, n_event, n_cens, n_event * 10000 // n_risk)

    assert set(out) == set(expected)
    for d, (n_risk, n_event, n_cens, hbp) in expected.items():
        r = out[d]
        assert (r.n_risk, r.n_event, r.n_censored, r.hazard_bp) == (
            n_risk, n_event, n_cens, hbp), d
    # structural invariants: day 0 risk set is everyone, risk never grows
    days = sorted(out)
    assert out[days[0]].n_risk <= n
    assert all(out[a].n_risk > out[b].n_risk
               for a, b in zip(days, days[1:]))


def test_sampled_heavyhitters_brute_force(spark, tmp_path):
    """Sample-then-verify output matches a full pure-Python replay
    (same planted key, same md5 row sample, same integer thresholds),
    and the one-sided guarantee holds: every reported key's EXACT count
    clears the global threshold."""
    import __spark_entry__ as ent

    rows = []
    # 1200 rows: planted head (orderkey%10<9 -> key=partkey%8) plus a
    # cold tail spread over ~400 keys
    for ok in range(200):
        for ln in range(1, 7):
            rows.append((ok, ln, (ok * 31 + ln * 7) % 997))
    df = spark.createDataFrame(
        rows, "l_orderkey bigint, l_linenumber bigint, l_partkey bigint"
    )
    _write(df, tmp_path, "lineitem")
    out = {r.key: r for r in
           ent.queries()["sketch_sampled_heavyhitters"](
               spark, str(tmp_path)).collect()}

    # python replay
    def key(ok, pk):
        return pk % 8 if ok % 10 < 9 else 8 + (pk % 4096)

    def sampled(ok, ln):
        return hashlib.md5(f"{ok}-{ln}".encode()).hexdigest()[0] in "01"

    exact, samp = {}, {}
    for ok, ln, pk in rows:
        k = key(ok, pk)
        exact[k] = exact.get(k, 0) + 1
        if sampled(ok, ln):
            samp[k] = samp.get(k, 0) + 1
    n_total = len(rows)
    n_sample = sum(samp.values())
    cand = {k for k, c in samp.items() if c * 1000 >= n_sample}
    expected = {
        k: (exact[k], samp[k], exact[k] * 10000 // n_total)
        for k in cand
        if exact[k] * 1000 >= n_total
    }
    assert out.keys() == expected.keys()
    for k, (ec, sc, bp) in expected.items():
        r = out[k]
        assert (r.exact_cnt, r.sample_cnt, r.share_bp) == (ec, sc, bp), k
    # one-sided guarantee: no false positives after the verify pass
    assert all(r.exact_cnt * 1000 >= n_total for r in out.values())
    # the planted head must actually be found (the sample is dense
    # enough here by construction: heads hold ~90% of rows)
    assert any(k < 8 for k in out)


def test_partitioned_write_scan_prunes(spark, tmp_path):
    """Directory-partitioned parquet (sinks.write_partitioned) + a
    partition-column predicate must prune at PLAN time: the scan's
    PartitionFilters carry the predicate, fewer files are read than
    exist, and values match the unpartitioned computation.  This is the
    partition-pruning leg of the layout story (zone maps and Z-order
    cover intra-file skipping; this covers directory-level skipping —
    at 100 TB the difference between touching one day and listing a
    year)."""
    from pyspark.sql import functions as F

    from phenoxtract_spark.sources import sinks

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    e = e.withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    sinks.write_parquet_partitioned(e, path, ["day"])

    back = spark.read.parquet(path)
    one_day = e.select(F.min("day")).first()[0]
    q = back.filter(F.col("day") == F.lit(one_day)).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the predicate must reach PartitionFilters (directory pruning),
    # not PushedFilters (row-group skipping) — day is a partition column
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in seg and seg.strip(), seg
    # and fewer partition dirs are touched than exist
    import glob
    import os

    n_dirs = len(glob.glob(os.path.join(path, "day=*")))
    assert n_dirs > 1
    touched = (
        back.filter(F.col("day") == F.lit(one_day))
        .select(F.input_file_name())
        .distinct()
        .collect()
    )
    dirs_touched = {t[0].split("day=")[1].split("/")[0] for t in touched}
    assert len(dirs_touched) == 1
    # value parity vs the unpartitioned path
    expected = {
        (r.event_type, r.n)
        for r in e.filter(F.col("day") == F.lit(one_day))
        .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {(r.event_type, r.n) for r in q.collect()} == expected
