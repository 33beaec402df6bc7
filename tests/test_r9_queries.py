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


def test_scd2_point_in_time_brute_force(spark, tmp_path):
    """PIT join semantics on a planted version history: boundary probes
    take the NEW version (half-open windows), pre-history probes drop,
    current-row probes match the open-ended version."""
    import __spark_entry__ as ent

    base = datetime.datetime(2024, 5, 1, 0, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = []
    eid = 0

    def ev(u, t, typ, val):
        nonlocal eid
        rows.append((eid, t, u, typ, val, None))
        eid += 1

    # user 1 dim history: v1 value 1.0 @t0, (unchanged 1.0 @t0+2 collapses),
    # v2 value 2.0 @t0+4, v3 value 3.0 @t0+8 (open-ended)
    ev(1, base + 0 * m, "view", 1.0)
    ev(1, base + 2 * m, "view", 1.0)
    ev(1, base + 4 * m, "view", 2.0)
    ev(1, base + 8 * m, "view", 3.0)
    # probes: before history (drops), inside v1, EXACTLY at v2's boundary
    # (must take v2, not v1), inside v2, far in the open-ended v3
    ev(1, base - 1 * m, "purchase", 0.0)
    ev(1, base + 1 * m, "purchase", 0.0)
    ev(1, base + 4 * m, "purchase", 0.0)
    ev(1, base + 5 * m, "purchase", 0.0)
    ev(1, base + 500 * m, "purchase", 0.0)
    # user 2: no views at all -> its probe drops
    ev(2, base + 1 * m, "purchase", 0.0)

    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    _write(df, tmp_path, "events")
    out = {r.event_id: (r.version_no, r.dim_value) for r in
           ent.queries()["join_scd2_point_in_time"](
               spark, str(tmp_path)).collect()}

    # probe event_ids are 4..9 in insertion order
    assert 4 not in out            # pre-history
    assert out[5] == (1, 1.0)      # inside v1
    assert out[6] == (2, 2.0)      # boundary -> new version
    assert out[7] == (2, 2.0)      # inside v2
    assert out[8] == (3, 3.0)      # open-ended current version
    assert 9 not in out            # user without history
    assert len(out) == 4


def test_chunk_overlap_brute_force(spark, tmp_path):
    """Chunk boundaries, counts, and texts match a pure-Python sliding
    window (size 16, stride 12) including the empty-doc and exact-fit
    edge cases."""
    import __spark_entry__ as ent

    texts = {
        1: " ".join(f"w{i}" for i in range(40)),   # 40 tokens -> 3 chunks
        2: " ".join(f"w{i}" for i in range(16)),   # exact fit -> 1 chunk
        3: " ".join(f"w{i}" for i in range(17)),   # 1 over -> 2 chunks
        4: "",                                      # empty -> 1 empty chunk
        5: "single",                                # 1 token -> 1 chunk
    }
    df = spark.createDataFrame(
        [(k, v, "en", "src", len(v)) for k, v in texts.items()],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _write(df, tmp_path, "documents")
    out = {}
    for r in ent.queries()["curation_chunk_overlap"](
            spark, str(tmp_path)).collect():
        out.setdefault(r.doc_id, []).append(
            (r.chunk_idx, r.start_tok, r.n_tok, r.chunk_text))

    for doc_id, text in texts.items():
        toks = [t for t in text.lower().split() if t]
        n = len(toks)
        k = 1 if n <= 16 else 1 + -(-(n - 16) // 12)
        expected = []
        for i in range(k):
            s = i * 12
            e = min(s + 16, n)
            expected.append((i, s, e - s, " ".join(toks[s:e])))
        assert sorted(out[doc_id]) == expected, doc_id


def test_bucketed_join_has_no_shuffle(spark):
    """Two tables bucketed identically on the join key must equi-join with
    ZERO exchanges — the co-located join that bucketing buys at 100 TB
    (the write pays the shuffle once; every later join rides it free)."""
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators import joins

    left = spark.createDataFrame(
        [(i % 50, i) for i in range(500)], "k bigint, a bigint")
    right = spark.createDataFrame(
        [(i % 50, i * 2) for i in range(300)], "k bigint, b bigint")
    joins.write_bucketed(left, "buck_l", ["k"], num_buckets=8)
    joins.write_bucketed(right, "buck_r", ["k"], num_buckets=8)
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a real two-sided join (the tiny test tables would
        # otherwise broadcast, which proves nothing about co-location)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l, r = spark.table("buck_l"), spark.table("buck_r")
        j = l.join(r, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        shuffles = (plan.count("Exchange")
                    - plan.count("BroadcastExchange")
                    - plan.count("RoundRobinPartitioning"))
        assert shuffles == 0, plan
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # and the result is right
        got = {(row.k, row.n) for row in j.collect()}
        expected = {(k, 10 * 6) for k in range(50)}
        assert got == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
        spark.sql("DROP TABLE IF EXISTS buck_l")
        spark.sql("DROP TABLE IF EXISTS buck_r")


def test_uplift_did_brute_force(spark, tmp_path):
    """DiD cells and estimate match a pure-Python replay with a PLANTED
    treatment uplift: users are pre-assigned by replicating the md5 arm
    hash, treated users get +50 value in the post period only, and the
    estimate must recover exactly +5000 centi-cents."""
    import __spark_entry__ as ent

    def arm(u):
        return int(hashlib.md5(f"did-v1::{u}".encode()).hexdigest()[:8], 16) % 2

    base = datetime.datetime(2024, 6, 1)
    h = datetime.timedelta(hours=1)
    rows = []
    eid = 0
    # 20 users x 2 purchases (hour 0 = pre, hour 10 = post over a
    # [0, 10h] span => post boundary at 5h); treated post gets +50
    for u in range(1, 21):
        treated = arm(u)
        rows.append((eid, base + 0 * h, u, "purchase", 100.0, None)); eid += 1
        rows.append((eid, base + 10 * h, u, "purchase",
                     100.0 + (50.0 if treated else 0.0), None)); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    )
    _write(df, tmp_path, "events")
    out = ent.queries()["events_uplift_did"](spark, str(tmp_path)).collect()[0]

    n_treated = sum(arm(u) for u in range(1, 21))
    n_control = 20 - n_treated
    assert (out.n_t0, out.n_t1, out.n_c0, out.n_c1) == (
        n_treated, n_treated, n_control, n_control)
    # value 100.00 -> 10000 cents -> mean in centi-cents = 1_000_000
    assert out.mean_t_pre_cc == 1_000_000
    assert out.mean_t_pre_cc == out.mean_c_pre_cc == out.mean_c_post_cc
    # planted +50.00 uplift -> +5000 cents -> +500_000 centi-cents
    assert out.mean_t_post_cc - out.mean_t_pre_cc == 500_000
    assert out.did_cc == 500_000
