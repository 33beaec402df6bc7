"""Unit tests for the behavioral analytics operators (funnel, retention,
transitions, rolling z-score) and the semantic-dedup / fuzzy-match /
mixing additions, on small hand-built fixtures with known answers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from phenoxtract_spark.operators import behavior, clustering, curation, dedup


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


@pytest.fixture(scope="module")
def funnel_events(spark):
    # u1 converts all three steps in order; u2 clicks BEFORE viewing (must
    # not count past step 1); u3 views only.
    rows = [
        (1, _ts(1, 9), 1, "view"),
        (2, _ts(1, 10), 1, "click"),
        (3, _ts(1, 11), 1, "purchase"),
        (4, _ts(1, 8), 2, "click"),
        (5, _ts(1, 9), 2, "view"),
        (6, _ts(2, 9), 3, "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_strict_ordering(funnel_events):
    out = {
        r["step"]: r["users"]
        for r in behavior.funnel(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_step_requires_strictly_later_event(spark):
    # same-timestamp click does NOT satisfy "after view"
    rows = [(1, _ts(1, 9), 1, "view"), (2, _ts(1, 9), 1, "click")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        r["step"]: r["users"]
        for r in behavior.funnel(ev, ["view", "click"]).collect()
    }
    assert out == {"view": 1, "click": 0}


def test_retention_offsets(spark):
    # u1 first active day 1, returns day 2 and day 8 (offsets 1 and 7);
    # u2 first active day 1 only (no retention rows).
    rows = [
        (1, _ts(1), 1, "view"),
        (2, _ts(2), 1, "view"),
        (3, _ts(8), 1, "view"),
        (4, _ts(1), 2, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = behavior.retention_cohorts(ev, offsets=[1, 7]).collect()
    got = {(str(r["cohort_day"]), r["offset_days"]): r["users"] for r in out}
    assert got == {("2024-01-01", 1): 1, ("2024-01-01", 7): 1}


def test_transition_matrix_probs(spark):
    # u1: a->b, b->a, a->b  => from a: {b:2}, from b: {a:1}
    rows = [
        (1, _ts(1, 9), 1, "a"),
        (2, _ts(1, 10), 1, "b"),
        (3, _ts(1, 11), 1, "a"),
        (4, _ts(1, 12), 1, "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["from_type"], r["to_type"]): (r["transitions"], r["prob"])
        for r in behavior.transition_matrix(ev).collect()
    }
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")] == (1, 1.0)


def test_transition_lag_tie_break_on_event_id(spark):
    # two events at the SAME ts: event_id orders them deterministically
    rows = [
        (1, _ts(1, 9), 1, "a"),
        (2, _ts(1, 9), 1, "b"),
        (3, _ts(1, 10), 1, "c"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["from_type"], r["to_type"]): r["transitions"]
        for r in behavior.transition_matrix(ev).collect()
    }
    assert out == {("a", "b"): 1, ("b", "c"): 1}


def test_rolling_zscore_flags_spike(spark):
    # 30 hourly buckets of 10 events, then one bucket of 60: the spike's
    # lookback window is constant-10, so z = (60-10)/0 would divide by
    # zero — use 24 flat + slight alternation to keep variance > 0.
    rows = []
    eid = 0
    for h in range(30):
        n = 10 + (h % 2)  # 10/11 alternation: nonzero variance
        for _ in range(n):
            eid += 1
            rows.append((eid, _ts(1 + h // 24, h % 24), 1, "x"))
    for _ in range(60):  # spike in hour 30
        eid += 1
        rows.append((eid, _ts(2, 6), 1, "x"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = behavior.rolling_zscore(ev, window_rows=24).collect()
    spike = [r for r in out if r["n_events"] == 60]
    assert len(spike) == 1 and spike[0]["zscore"] > 10
    normal = [abs(r["zscore"]) for r in out if r["n_events"] in (10, 11)]
    assert normal and max(normal) < 2


def test_semantic_canonical_groups_near_identical(spark):
    # 0/1 near-identical, 2 orthogonal; one centroid bucket (id 0)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = e.filter(F.col("vec_id") == 0)
    out = {
        r["vec_id"]: (r["canonical_id"], r["is_duplicate"])
        for r in clustering.semantic_canonical(e, cent, threshold=0.9).collect()
    }
    assert out[0] == (0, False)
    assert out[1] == (0, True)
    assert out[2] == (2, False)


def test_levenshtein_block_pairs_finds_near_dup(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumped over the lazy dog"),
        (3, "completely different text with no shared prefix"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.levenshtein_block_pairs(d, "doc_id", "text").collect()
    assert [(r["id_a"], r["id_b"]) for r in out] == [(1, 2)]
    assert out[0]["lev"] == 2  # "jumps" -> "jumped": insert 'e', sub 's'->'d'


def test_embedding_decontaminate_flags_only_close(spark):
    train = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    test = spark.createDataFrame(
        [(99, [0.999, 0.01])], "vec_id long, embedding array<double>"
    )
    out = curation.embedding_decontaminate(train, test, threshold=0.9).collect()
    assert [r["train_id"] for r in out] == [10]
    assert out[0]["n_test_hits"] == 1 and out[0]["max_cos"] > 0.99


def test_weighted_sample_rates_and_determinism(spark):
    d = spark.range(0, 4000).withColumnRenamed("id", "doc_id")
    kept = curation.weighted_sample(d, "doc_id", F.lit(0.5))
    n1, n2 = kept.count(), kept.count()
    assert n1 == n2  # deterministic — no rand()
    assert 0.45 * 4000 < n1 < 0.55 * 4000
    none_kept = curation.weighted_sample(d, "doc_id", F.lit(0.0)).count()
    all_kept = curation.weighted_sample(d, "doc_id", F.lit(1.0)).count()
    assert none_kept == 0 and all_kept == 4000


def test_bloom_no_false_negatives(spark):
    from phenoxtract_spark.operators import sketches

    members = spark.range(0, 200).withColumnRenamed("id", "k")
    bloom = sketches.bloom_build(members, "k", num_hashes=4, num_bits=8192)
    probes = spark.range(0, 400).withColumnRenamed("id", "k")
    out = {r["value"]: r["maybe_present"]
           for r in sketches.bloom_probe(bloom, probes, "k", num_hashes=4,
                                         num_bits=8192).collect()}
    # every true member MUST probe positive
    assert all(out[str(i)] for i in range(200))
    # non-members mostly negative at this load factor (800/8192 bits)
    fp = sum(1 for i in range(200, 400) if out[str(i)])
    assert fp < 20


def test_bloom_merge_is_bit_union(spark):
    from phenoxtract_spark.operators import sketches

    a = sketches.bloom_build(
        spark.range(0, 50).withColumnRenamed("id", "k"), "k")
    b = sketches.bloom_build(
        spark.range(50, 100).withColumnRenamed("id", "k"), "k")
    merged = a.unionByName(b).distinct()
    whole = sketches.bloom_build(
        spark.range(0, 100).withColumnRenamed("id", "k"), "k")
    assert sorted(r["bit"] for r in merged.collect()) == sorted(
        r["bit"] for r in whole.collect()
    )


def test_histogram_quantiles_close_to_exact(spark):
    from phenoxtract_spark.operators import sketches

    # uniform 0..9999: p50 ≈ 5000, p90 ≈ 9000 (bin width 10000/128 ≈ 78)
    d = spark.range(0, 10000).select(F.col("id").cast("double").alias("x"))
    out = {r["q"]: r["est"]
           for r in sketches.histogram_quantiles(d, "x", [0.5, 0.9]).collect()}
    assert abs(out[0.5] - 5000) < 100
    assert abs(out[0.9] - 9000) < 100


def test_followed_within_matches_and_bounds(spark):
    from phenoxtract_spark.operators import behavior as bh

    rows = [
        (1, _ts(1, 9, 0), 1, "purchase"),
        (2, _ts(1, 9, 5), 1, "error"),     # within 10 min -> match
        (3, _ts(1, 12, 0), 2, "purchase"),
        (4, _ts(1, 13, 0), 2, "error"),    # 60 min later -> no match
        (5, _ts(1, 9, 0), 3, "error"),     # error BEFORE purchase: no match
        (6, _ts(1, 9, 1), 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["user_id"]: r["matched_us"]
           for r in bh.followed_within(ev, "purchase", "error",
                                       within="10 minutes").collect()}
    assert out[1] is not None
    assert out[2] is None
    assert out[3] is None


def test_bloom_probe_handles_duplicate_probe_rows(spark):
    from phenoxtract_spark.operators import sketches

    members = spark.range(0, 50).withColumnRenamed("id", "k")
    bloom = sketches.bloom_build(members, "k", num_hashes=4, num_bits=8192)
    # probe value 7 five times: duplicates must not create false negatives
    dup_probes = spark.createDataFrame([(7,)] * 5 + [(3,)], "k long")
    out = {r["value"]: r["maybe_present"]
           for r in sketches.bloom_probe(bloom, dup_probes, "k", num_hashes=4,
                                         num_bits=8192).collect()}
    assert out == {"7": True, "3": True}


def test_rolling_zscore_flat_baseline_sentinel(spark):
    """A spike after a perfectly flat baseline (zero variance) must be
    FLAGGED (sentinel ±1e9), not silently NULLed; flat-and-expected gives 0."""
    rows = []
    eid = 0
    for h in range(25):
        for _ in range(10):  # perfectly flat 10/hour
            eid += 1
            rows.append((eid, _ts(1 + h // 24, h % 24), 1, "x"))
    for _ in range(60):  # spike in hour 25
        eid += 1
        rows.append((eid, _ts(2, 1), 1, "x"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {r["n_events"]: r["zscore"]
           for r in behavior.rolling_zscore(ev, window_rows=24).collect()}
    assert out[60] == 1e9
    assert out[10] == 0.0


def test_retention_empty_offsets_raises(spark):
    ev = spark.createDataFrame(
        [(1, _ts(1), 1, "view")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        behavior.retention_cohorts(ev, offsets=[])


def test_histogram_quantiles_validates_and_clamps(spark):
    from phenoxtract_spark.operators import sketches

    d = spark.range(0, 100).select(F.col("id").cast("double").alias("x"))
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sketches.histogram_quantiles(d, "x", [])
    with _pytest.raises(ValueError):
        sketches.histogram_quantiles(d, "x", [0.0, 0.5])
    # fixed lo above some data: below-range values clamp into bin 0 instead
    # of corrupting the bin relation with negative bins
    out = sketches.histogram_quantiles(d, "x", [0.9], num_bins=10, lo=50.0, hi=100.0)
    est = out.collect()[0]["est"]
    assert 50.0 <= est <= 100.0


def test_hierarchy_resolve_doubling(spark):
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators import graph

    # two trees: 1←11←111←1111 (chain) and 2←21, plus root-only 3
    nodes = spark.createDataFrame(
        [(1, 0), (11, 1), (111, 11), (1111, 111), (2, 0), (21, 2), (3, 0)],
        "id bigint, parent bigint",
    )
    out = {r["id"]: (r["root_id"], r["depth"])
           for r in graph.hierarchy_resolve(nodes, "id", "parent", rounds=3).collect()}
    assert out == {
        1: (1, 1), 11: (1, 2), 111: (1, 3), 1111: (1, 4),
        2: (2, 1), 21: (2, 2), 3: (3, 1),
    }


def test_trailing_ewma_hand_computed(spark):
    """Finite-window normalized EWMA, hand-checked: with alpha=0.5 over
    values [1, 2, 4]: row1 = 1; row2 = (1*0.5 + 2)/(0.5 + 1) = 5/3;
    row3 = (1*0.25 + 2*0.5 + 4)/(0.25 + 0.5 + 1) = 3; a window of 2
    rows drops the oldest term (row3 = (2*0.5 + 4)/1.5 = 10/3)."""
    from phenoxtract_spark.operators import behavior

    df = spark.createDataFrame(
        [("u", 1, 1.0), ("u", 2, 2.0), ("u", 3, 4.0)],
        "uid string, seq bigint, v double",
    )
    got = {r["seq"]: r["ewma"] for r in behavior.trailing_ewma(
        df, "uid", ["seq"], "v", window_rows=8, alpha=0.5).collect()}
    assert got[1] == 1.0
    assert got[2] == round(5 / 3, 6)
    assert got[3] == round((0.25 + 1.0 + 4.0) / 1.75, 6)
    got2 = {r["seq"]: r["ewma"] for r in behavior.trailing_ewma(
        df, "uid", ["seq"], "v", window_rows=2, alpha=0.5).collect()}
    assert got2[3] == round(10 / 3, 6)


def test_seasonal_hod_anomaly_loo_and_flags(spark):
    """LOO baseline excludes the judged hour; a 3x spike at the same hour
    of day flags high; a normal hour stays silent even though a trailing
    window would see the spike; single-peer buckets never flag."""
    from phenoxtract_spark.operators import behavior

    rows = []
    # type 'a', hod 9: days 1-4 have 10 events, day 5 has 30 (spike)
    for day in range(1, 5):
        rows += [("a", f"2024-01-0{day} 09:{m:02d}:00") for m in range(10)]
    rows += [("a", f"2024-01-05 09:{m:02d}:00") for m in range(30)]
    # type 'a', hod 12: a single lonely bucket -> no peers, never flagged
    rows += [("a", "2024-01-01 12:00:00")]
    from pyspark.sql import functions as F
    ev = spark.createDataFrame(rows, "event_type string, ts_raw string").select(
        "event_type", F.col("ts_raw").cast("timestamp").alias("ts")
    )
    out = {(r["event_type"], str(r["bucket_hour"])): r
           for r in behavior.seasonal_hod_anomaly(ev, factor=2).collect()}
    spike = out[("a", "2024-01-05 09:00:00")]
    assert spike["loo_baseline"] == 10.0 and spike["ratio"] == 3.0
    assert spike["anomaly"] is True
    normal = out[("a", "2024-01-02 09:00:00")]
    assert normal["loo_baseline"] == 15.0  # (30 + 10*3) / 4
    assert normal["anomaly"] is False
    lonely = out[("a", "2024-01-01 12:00:00")]
    assert lonely["n_peer_hours"] == 0 and lonely["anomaly"] is False
    assert lonely["loo_baseline"] is None


def test_markov_attribution_hand_computed(spark):
    """Tiny chain with a known solve: paths u1 A->B->conv, u2 A->null,
    u3 B->conv.  Transitions: START->{A:2/3, B:1/3}, A->{B:1/2,
    NULL:1/2}, B->{CONV:1}.  Absorption: p(B)=1, p(A)=0.5,
    p(START)=2/3*0.5 + 1/3*1 = 2/3.  Removing A: p(START) = 1/3;
    removing B: p(A)=0, p(START)=0.  Removal effects: A = 1-0.5 = 0.5,
    B = 1-0 = 1.0; shares 1/3 and 2/3."""
    from phenoxtract_spark.operators import behavior

    rows = [
        (1, 1, "2024-01-01 00:00:00", "A"),
        (1, 2, "2024-01-01 00:01:00", "B"),
        (1, 3, "2024-01-01 00:02:00", "purchase"),
        (2, 4, "2024-01-01 00:00:00", "A"),
        (3, 5, "2024-01-01 00:00:00", "B"),
        (3, 6, "2024-01-01 00:01:00", "purchase"),
        # post-conversion tail traffic must be ignored (path truncation)
        (1, 7, "2024-01-01 00:03:00", "A"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts_raw string, event_type string"
    ).select("user_id", "event_id",
             F.col("ts_raw").cast("timestamp").alias("ts"), "event_type")
    out = {r.channel: r for r in behavior.markov_attribution(
        ev, iterations=12).collect()}
    assert set(out) == {"A", "B"}
    assert abs(out["A"].p_conv - 2 / 3) < 1e-6
    assert abs(out["A"].p_conv_removed - 1 / 3) < 1e-6
    assert abs(out["A"].removal_effect - 0.5) < 1e-6
    assert out["B"].p_conv_removed == 0.0
    assert abs(out["B"].removal_effect - 1.0) < 1e-6
    assert abs(out["A"].attribution_share - 1 / 3) < 1e-5
    assert abs(out["B"].attribution_share - 2 / 3) < 1e-5


def test_cusum_drift_fires_on_planted_level_shift(spark):
    """A series with a genuine +60% level shift halfway through must
    flag after the shift and keep the pre-shift prefix clean; the
    recursive-fold identity is checked against a pure-Python Page CUSUM
    over the same counts."""
    from phenoxtract_spark.operators import behavior

    # 48 hourly buckets: 20 events/h, then 32 events/h from hour 24
    rows = []
    eid = 0
    for h in range(48):
        n = 20 if h < 24 else 32
        for i in range(n):
            rows.append((eid, 1, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:00:01", "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts_raw string, event_type string"
    ).select("event_id", "user_id",
             F.col("ts_raw").cast("timestamp").alias("ts"), "event_type")
    out = sorted(
        behavior.cusum_drift(ev, flag_den=40).collect(),
        key=lambda r: r.bucket_hour,
    )
    counts = [20] * 24 + [32] * 24
    T, total = 48, sum(counts)
    # pure-Python replay of the prefix-extrema identity == Page's fold
    p = 0; minp = 0; maxp = 0; s_up = 0; s_dn = 0
    for r, n in zip(out, counts):
        assert r.n_events == n
        p += T * n - total
        minp = min(minp, p); maxp = max(maxp, p)
        s_up = max(0, s_up + (T * n - total))
        s_dn = max(0, s_dn - (T * n - total))
        assert r.cusum_up == p - min(0, minp) == s_up
        assert r.cusum_down == max(0, maxp) - p == s_dn
    # flags fire on the shifted series (the low regime accumulates
    # DOWNWARD drift against the whole-series baseline, the high regime
    # upward — both are genuine level departures) but never in the
    # first buckets where nothing has accumulated yet (dev = -288/bucket
    # crosses the 1497.6 threshold at the 6th bucket: 288*6*40 > 1248*48)
    assert not any(r.drift_flag for r in out[:5])
    assert out[5].drift_flag
    assert any(r.drift_flag for r in out)
    # control: the same volume with NO shift never flags
    flat_rows = []
    eid = 0
    for h in range(48):
        for i in range(26):
            flat_rows.append((eid, 1, f"2024-01-{1 + h // 24:02d} {h % 24:02d}:00:01", "click"))
            eid += 1
    flat = spark.createDataFrame(
        flat_rows, "event_id bigint, user_id bigint, ts_raw string, event_type string"
    ).select("event_id", "user_id",
             F.col("ts_raw").cast("timestamp").alias("ts"), "event_type")
    assert not any(
        r.drift_flag
        for r in behavior.cusum_drift(flat, flag_den=40).collect()
    )
