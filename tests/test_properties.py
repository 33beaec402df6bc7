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


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 50), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=60,
    )
)
def test_funnel_counts_monotone_nonincreasing(spark, events):
    """Users reaching step i+1 can never exceed users reaching step i —
    for ANY event sequence (the structural funnel invariant)."""
    from phenoxtract_spark.operators import behavior

    rows = [
        (i, datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m), u, t)
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = sorted(
        behavior.funnel(df, ["a", "b", "c"]).collect(), key=lambda r: r["step_idx"]
    )
    counts = [r["users"] for r in out]
    assert counts == sorted(counts, reverse=True)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=6, max_size=40), min_size=2, max_size=12))
def test_containment_dominates_jaccard(spark, texts):
    """|A∩B|/min(|A|,|B|) ≥ |A∩B|/|A∪B| for every pair — containment can
    only exceed Jaccard (min ≤ union), so subset-duplication is never
    scored lower by the containment metric."""
    from phenoxtract_spark.operators import dedup as dd

    docs = [(i, t) for i, t in enumerate(texts) if t.strip()]
    if len(docs) < 2:
        return
    df = spark.createDataFrame(docs, "doc_id long, text string")
    jac = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in dd.ngram_jaccard_pairs(df, "doc_id", "text", k=2, threshold=0.0).collect()
    }
    con = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in dd.ngram_containment_pairs(df, "doc_id", "text", k=2, threshold=0.0).collect()
    }
    for pair, j in jac.items():
        assert pair in con and con[pair] >= j - 1e-9


@settings(max_examples=10, deadline=None)
@given(st.floats(0.05, 0.95), st.floats(0.05, 0.95))
def test_weighted_sample_monotone_in_rate(spark, r1, r2):
    """The kept set at a lower rate is a SUBSET of the kept set at a
    higher rate (same seed) — rates can be tuned without reshuffling
    which documents survive."""
    from phenoxtract_spark.operators import curation

    lo, hi = min(r1, r2), max(r1, r2)
    d = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    kept_lo = {r["doc_id"] for r in curation.weighted_sample(d, "doc_id", F.lit(lo)).collect()}
    kept_hi = {r["doc_id"] for r in curation.weighted_sample(d, "doc_id", F.lit(hi)).collect()}
    assert kept_lo <= kept_hi


@settings(max_examples=8, deadline=None)
@given(st.lists(st.floats(0, 1000, allow_nan=False), min_size=30, max_size=300))
def test_histogram_quantile_within_one_bin(spark, xs):
    """The histogram estimate lands within one bin width of the true
    value's neighborhood: bounded error is the contract that makes the
    sketch usable as a sort replacement."""
    from phenoxtract_spark.operators import sketches

    lo, hi = min(xs), max(xs)
    if hi - lo < 1e-9:
        return
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    out = sketches.histogram_quantiles(df, "x", [0.5], num_bins=64)
    est = out.collect()[0]["est"]
    width = (hi - lo) / 64
    xs_sorted = sorted(xs)
    true_p50 = xs_sorted[max(0, int(0.5 * len(xs)) - 1) : min(len(xs), int(0.5 * len(xs)) + 2)]
    assert min(true_p50) - width - 1e-6 <= est <= max(true_p50) + width + 1e-6


_TOKS = st.sampled_from(["a", "b", "c", "d"])
_DOC = st.lists(_TOKS, min_size=1, max_size=8).map(" ".join)


def _shingle_set(text: str, k: int = 3) -> set:
    toks = text.split()
    return {
        " ".join(toks[i : i + k]) for i in range(max(len(toks) - k, 0) + 1)
    }


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=6))
def test_prefix_join_matches_python_bruteforce(spark, texts):
    """Prefix filtering is EXACT: the Spark result must equal a pure-Python
    all-pairs Jaccard on the same shingle semantics, for every random tiny
    corpus (small alphabet → dense shingle collisions)."""
    from phenoxtract_spark.operators import dedup

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jacc"]
        for r in dedup.jaccard_prefix_pairs(
            df, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            a, b = _shingle_set(texts[i]), _shingle_set(texts[j])
            jacc = round(len(a & b) / len(a | b), 6)
            if jacc >= 0.5:
                want[(i, j)] = jacc
    assert got == want


def _ref_bpe(texts, rounds):
    from collections import Counter

    vocab = Counter(tok for t in texts for tok in t.split())
    seqs = {w: list(w) for w in vocab}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, f in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((r, a, b, cnt))
        ab = a + b
        for w, s in seqs.items():
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = ab
                else:
                    out.append(x)
            seqs[w] = out
    return merges


@settings(max_examples=6, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_bpe_merges_match_python_reference(spark, texts):
    """The distributed BPE trajectory (argmax choice, tie-breaks, and the
    left-to-right merge fold) must equal a sequential reference
    implementation on every random corpus."""
    from phenoxtract_spark.operators import textanalysis

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = [
        (r["merge_round"], r["sym_a"], r["sym_b"], r["pair_count"])
        for r in textanalysis.bpe_merges(df, "text", rounds=2)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == _ref_bpe(texts, 2)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=1, max_value=13),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.text(min_size=0, max_size=12),
)
def test_bmp_codec_roundtrip_and_resize_reference(w, h, ow, oh, seed):
    """Pure-Python properties of the stdlib image codec (no Spark job):
    BMP encode→decode is the identity for every (w, h) — including every
    row-padding residue — and nn_resize equals the brute-force floor-map
    reference for every source/target shape."""
    from phenoxtract_spark.operators import multimodal as mm

    rgb = mm.md5_keystream(seed, w * h * 3)
    assert mm.decode_bmp(mm.encode_bmp(w, h, rgb)) == (w, h, rgb)
    small = mm.nn_resize(w, h, rgb, ow, oh)
    assert len(small) == ow * oh * 3
    for r in range(oh):
        for c in range(ow):
            for k in range(3):
                src = ((r * h // oh) * w + (c * w // ow)) * 3 + k
                assert small[(r * ow + c) * 3 + k] == rgb[src]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 5),          # key
                  st.integers(0, 30),         # seq
                  st.sampled_from(["I", "U", "D"])),
        min_size=1, max_size=25, unique_by=lambda t: (t[0], t[1], t[2]),
    ),
    st.integers(0, 30),                       # retention watermark
)
def test_log_expiry_matches_python_spec(spark, entries, wm):
    """For ANY log and watermark, the operator's per-entry status equals
    the pure-Python spec: above-watermark entries retain; per key, the
    LWW-ordered (seq desc, op asc) first at-or-below entry is the
    boundary; everything else expires."""
    from phenoxtract_spark.operators import cdc

    log = spark.createDataFrame(entries, "k bigint, seq bigint, op string")
    got = {(r.k, r.seq, r.op): r.status
           for r in cdc.log_expiry(log, ["k"], wm).collect()}
    # python spec
    want = {}
    below = {}
    for k, seq, op in entries:
        if seq > wm:
            want[(k, seq, op)] = "retain_window"
        else:
            below.setdefault(k, []).append((seq, op))
    for k, rows in below.items():
        rows.sort(key=lambda t: (-t[0], t[1]))
        for i, (seq, op) in enumerate(rows):
            want[(k, seq, op)] = "retain_boundary" if i == 0 else "expire"
    assert got == want


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000),
             min_size=1, max_size=120),
    st.integers(min_value=1, max_value=16),
)
def test_bucketed_prefix_sum_any_weights_any_buckets(spark, ws, nb):
    """The two-phase decomposition equals a plain Python cumsum for ANY
    integer weights (negatives included — the sum is associative, the
    operator never assumes positivity) and ANY bucket count."""
    from phenoxtract_spark.operators import sweep

    rows = [(i, i % nb, w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(rows, "id bigint, bk bigint, w bigint")
    out = sweep.bucketed_prefix_sum(df, "bk", ["id"], {"w": "w"},
                                    totals=["w"])
    got = {r.id: (r.cum_w, r.total_w) for r in out.collect()}
    cum, expect = 0, {}
    for i, _, w in sorted(rows, key=lambda r: (r[1], r[0])):
        cum += w
        expect[i] = cum
    assert got == {i: (c, sum(ws)) for i, c in expect.items()}


@settings(max_examples=15, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=5000),
                min_size=1, max_size=60))
def test_pps_sample_invariants(spark, tmp_path_factory, ws):
    """For ANY weight vector: exactly k tickets land, every drawn doc's
    ticket count is within 1 of its proportional share w*k/W, and
    zero-weight docs never appear."""
    import __spark_entry__ as ent

    tmp_path = tmp_path_factory.mktemp("pps")
    docs = [(i, "t", "en", "s", w) for i, w in enumerate(ws)]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    if not any(w > 0 for w in ws):
        return  # empty sampling frame: nothing to assert
    out = ent.queries()["curation_pps_sample"](spark, str(tmp_path)).collect()
    total = sum(w for w in ws if w > 0)
    k = 100
    assert sum(r.n_hits for r in out) == k
    by_id = {r.doc_id: r.n_hits for r in out}
    for i, w in enumerate(ws):
        hits = by_id.get(i, 0)
        if w <= 0:
            assert hits == 0
            continue
        # systematic sampling: floor(a+s) - floor(a) is floor(s) or
        # ceil(s), and EXACTLY s when the share s = w*k/W is integral
        num = w * k
        if num % total == 0:
            assert hits == num // total, (i, w, hits)
        else:
            assert hits in (num // total, num // total + 1), (i, w, hits)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=80), min_size=1, max_size=8),
)
def test_chi2_expected_counts_partition_the_total(spark, tmp_path_factory,
                                                  cells):
    """Row x column floors: sum(expected_4dp) is within |cells| of
    t*10000 (each cell floors at most 1 ulp), and sum(observed) == t —
    for arbitrary 2 x n contingency layouts."""
    import datetime

    import __spark_entry__ as ent

    tmp_path = tmp_path_factory.mktemp("chi2")
    rows, oid = [], 0
    base = datetime.datetime(2024, 1, 1)
    statuses = ["F", "O", "P"]
    for j, n in enumerate(cells):
        prio = "1-URGENT" if j % 2 == 0 else "5-LOW"
        status = statuses[j % 3]
        for _ in range(n):
            rows.append((oid, oid, status, 10.0, base, prio))
            oid += 1
    df = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = ent.queries()["analytics_chi2_independence"](
        spark, str(tmp_path)).collect()
    t = len(rows)
    assert sum(r.observed for r in out) == t
    se = sum(r.expected_4dp for r in out)
    assert t * 10000 - len(out) <= se <= t * 10000
