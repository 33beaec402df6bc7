"""Oracle-checked behavioral / event-sequence analytics queries: funnel
conversion, cohort retention, transition matrices, rolling-z-score anomaly
detection, and a GROUPING SETS aggregation.

Cross-engine discipline as everywhere: counts are exact bigints, every
double derives from integer partials through an identical expression tree
on both sides (so summation-order ulps can't differ), doubles round
in-query, and window orderings carry an id tie-break so ``lag`` is
deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import behavior
from .queries_core import q, read_table

_FUNNEL_STEPS = ["view", "click", "purchase"]


@q(
    "events_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t
      GROUP BY e.user_id
    )
    SELECT 'view' AS step, CAST(1 AS BIGINT) AS step_idx, count(*) AS users FROM s1
    UNION ALL
    SELECT 'click', CAST(2 AS BIGINT), count(*) FROM s2
    UNION ALL
    SELECT 'purchase', CAST(3 AS BIGINT), count(*) FROM s3
    """,
)
def events_funnel(spark, sf_dir):
    """Strict-order view→click→purchase funnel.  Each stage is one
    filtered min-aggregate joined to the previous stage's one-row-per-user
    frame — stage frames shrink monotonically and broadcast at scale."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.funnel(ev, _FUNNEL_STEPS)


@q(
    "events_retention_cohort",
    """
    WITH first AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, active_day) AS BIGINT) AS offset_days,
           count(DISTINCT a.user_id) AS users
    FROM active a JOIN first f ON a.user_id = f.user_id
    WHERE date_diff('day', cohort_day, active_day) IN (1, 3, 7)
    GROUP BY 1, 2
    """,
)
def events_retention(spark, sf_dir):
    """Day-cohort retention at offsets 1/3/7: two user-keyed aggregates
    (first day, distinct active days) + one user join; the final count is
    on the coarse (cohort_day, offset) key."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.retention_cohorts(ev, offsets=[1, 3, 7])


@q(
    "events_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      FROM events
    )
    SELECT from_type, event_type AS to_type, count(*) AS transitions,
           round(count(*) / CAST(
             sum(count(*)) OVER (PARTITION BY from_type) AS DOUBLE), 6) AS prob
    FROM seq WHERE from_type IS NOT NULL
    GROUP BY from_type, event_type
    """,
)
def events_transitions(spark, sf_dir):
    """First-order Markov transition estimate over per-user event
    sequences; the (ts, event_id) ordering tie-break makes ``lag``
    deterministic across engines and partitionings."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.transition_matrix(ev)


@q(
    "events_anomaly_zscore",
    """
    WITH buckets AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_hour,
             count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, bucket_hour, n_events,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             CAST(sum(n_events) OVER w AS DOUBLE) AS sx,
             CAST(sum(n_events * n_events) OVER w AS DOUBLE) AS sxx
      FROM buckets
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, bucket_hour, n_events,
           CASE WHEN (sxx - sx * sx / n) / (n - 1.0) > 0
                THEN round((CAST(n_events AS DOUBLE) - sx / n)
                           / sqrt((sxx - sx * sx / n) / (n - 1.0)), 6)
                WHEN CAST(n_events AS DOUBLE) = sx / n THEN 0.0
                WHEN CAST(n_events AS DOUBLE) > sx / n THEN 1e9
                ELSE -1e9 END AS zscore
    FROM scored WHERE n >= 24
    """,
)
def events_anomaly(spark, sf_dir):
    """Rolling z-score over hourly per-type event counts.  The windowed
    sums are exact integers, so mean/variance/z derive through an
    identical double expression tree on both engines — bit-reproducible,
    no stddev-algorithm variance."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.rolling_zscore(ev, window_rows=24)


@q(
    "grouping_sets_revenue",
    """
    SELECT n_name, o_orderpriority,
           CAST(grouping(n_name, o_orderpriority) AS BIGINT) AS gid,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ())
    """,
)
def grouping_sets_revenue(spark, sf_dir):
    """GROUPING SETS in one aggregation pass (vs three unioned groupBys):
    per-(nation, priority) revenue, per-nation subtotal, and grand total,
    disambiguated by ``grouping_id``.  Money accumulates as integer
    CENTS (BIGINT) so the subtotal hierarchy is exact AND the rendered
    value is engine-independent — a raw DECIMAL output column hashes
    differently under the external driver (Spark hands back
    ``decimal.Decimal('…4900')`` objects while DuckDB's ``fetchdf``
    degrades its DECIMAL sum to float64), the r9 red-row root cause.
    Same cents discipline as ``skew_salted_agg_revenue``."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    joined = o.join(c, o.o_custkey == c.c_custkey).join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    )
    return joined.groupingSets(
        [["n_name", "o_orderpriority"], ["n_name"], []],
        "n_name",
        "o_orderpriority",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("revenue_cents"),
    )


@q(
    "events_json_props",
    """
    SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
           round(avg(k), 6) AS avg_k, min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type, CAST(props::JSON->>'k' AS BIGINT) AS k FROM events)
    GROUP BY event_type
    """,
)
def events_json_props(spark, sf_dir):
    """Semi-structured property extraction: parse the JSON ``props``
    column executor-side (``get_json_object`` — JVM JSON path, no Python
    UDF) and aggregate the extracted measure per event type.  The parse
    is a pure projection; the aggregate is one coarse-keyed shuffle."""
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@q(
    "events_pattern_followed_by",
    """
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    scored AS (
      SELECT user_id, event_type, us,
             min(CASE WHEN event_type = 'error' THEN us END) OVER (
               PARTITION BY user_id ORDER BY us
               RANGE BETWEEN 1 FOLLOWING AND 86400000000 FOLLOWING)
               AS matched_us
      FROM ev
    )
    SELECT user_id, us AS first_us, matched_us
    FROM scored WHERE event_type = 'purchase'
    """,
)
def events_pattern(spark, sf_dir):
    """CEP-style sequence detection — purchase followed by error within
    24 h — via ONE event-time RANGE-frame window per user: no self-join,
    no |L|×|R| range explosion, O(frame) state (streaming variant =
    stateful keyed buffer, see operator docstring)."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.followed_within(
        ev, "purchase", "error", within="24 hours"
    )


@q(
    "analytics_rfm_segments",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             max(CAST(o_orderdate AS DATE)) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, last_order, frequency, monetary_cents,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, custkey) AS BIGINT) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, custkey) AS BIGINT) AS m_score
    FROM base
    """,
)
def analytics_rfm(spark, sf_dir):
    """RFM customer segmentation: one aggregate over orders, then three
    ntile windows with deterministic (metric, custkey) tie-breaks.
    Money accumulates as integer cents (BIGINT) — the r9 driver red row
    was a raw DECIMAL ``monetary`` column rendering as Decimal objects
    on Spark and float64 on DuckDB's fetchdf; integer cents render
    identically on both engines.  The global-sort windows are the
    textbook shape; the 100 TB variant is ``analytics_rfm_scalable``
    (bucketed-CDF thresholds + broadcast join, no data-sized
    single-task sort)."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )
    return base.select(
        "custkey",
        "last_order",
        "frequency",
        "monetary_cents",
        F.ntile(4)
        .over(Window.orderBy(F.col("last_order").desc(), "custkey"))
        .cast("bigint")
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("frequency").desc(), "custkey"))
        .cast("bigint")
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.col("monetary_cents").desc(), "custkey"))
        .cast("bigint")
        .alias("m_score"),
    )


@q(
    "analytics_market_basket",
    """
    WITH items AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n_orders AS (SELECT count(DISTINCT ok) AS n FROM items),
    isup AS (SELECT pk, count(*) AS cnt FROM items GROUP BY pk),
    pairs AS (
      SELECT a.pk AS pk_a, b.pk AS pk_b, count(*) AS cnt
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2
    )
    SELECT pk_a, pk_b, p.cnt AS n_together,
           round(CAST(p.cnt AS DOUBLE) / (SELECT n FROM n_orders), 6) AS support,
           round(CAST(p.cnt AS DOUBLE) / sa.cnt, 6) AS confidence,
           round((CAST(p.cnt AS DOUBLE) * (SELECT n FROM n_orders))
                 / (CAST(sa.cnt AS DOUBLE) * CAST(sb.cnt AS DOUBLE)), 6) AS lift
    FROM pairs p
    JOIN isup sa ON sa.pk = p.pk_a
    JOIN isup sb ON sb.pk = p.pk_b
    WHERE p.cnt >= 2
    """,
)
def analytics_market_basket(spark, sf_dir):
    """Market-basket association over order line items: pair counts via a
    WITHIN-ORDER self-join (Σ per-basket |items|² — baskets are small, so
    this is linear in orders, never |parts|²), then support / confidence /
    lift from exact integer counts through identical expression trees.
    The one-row order-count aggregate broadcasts."""
    li = read_table(spark, sf_dir, "lineitem")
    # NOTE: the distinct item relation feeds several consumers, but its
    # identical-exchange self-join reuses cleanly here (measured: an
    # explicit localCheckpoint made this query 3x SLOWER — the
    # materialize-once rule pays only where consumers need DIFFERENT
    # downstream exchanges and AQE reuse actually breaks)
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_orders = items.select("ok").distinct().count()
    isup = items.groupBy("pk").agg(F.count(F.lit(1)).alias("cnt"))
    a = items.select(F.col("ok"), F.col("pk").alias("pk_a"))
    b = items.select(F.col("ok"), F.col("pk").alias("pk_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("pk_a") < F.col("pk_b"))
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("n_together"))
        .filter(F.col("n_together") >= 2)
    )
    sa = isup.select(F.col("pk").alias("pk_a"), F.col("cnt").alias("_ca"))
    sb = isup.select(F.col("pk").alias("pk_b"), F.col("cnt").alias("_cb"))
    return (
        pairs.join(sa, "pk_a")
        .join(sb, "pk_b")
        .select(
            "pk_a",
            "pk_b",
            "n_together",
            F.round(F.col("n_together") / F.lit(float(n_orders)), 6).alias("support"),
            F.round(F.col("n_together") / F.col("_ca"), 6).alias("confidence"),
            F.round(
                (F.col("n_together").cast("double") * F.lit(float(n_orders)))
                / (F.col("_ca").cast("double") * F.col("_cb").cast("double")),
                6,
            ).alias("lift"),
        )
    )


@q(
    "events_user_entropy",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
    ),
    t AS (SELECT user_id, CAST(sum(n) AS DOUBLE) AS tot, count(*) AS n_types
          FROM c GROUP BY 1)
    SELECT c.user_id,
           CAST(any_value(t.tot) AS BIGINT) AS n_events,
           any_value(t.n_types) AS n_types,
           round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) AS entropy
    FROM c JOIN t ON t.user_id = c.user_id
    GROUP BY c.user_id
    """,
)
def events_user_entropy(spark, sf_dir):
    """Behavioral diversity per user: Shannon entropy of the event-type
    distribution (0 = single-behavior bots, ln(k) = uniform usage) — the
    engagement-mix signal segmentation and anomaly models consume.  Two
    (user[, type]) aggregates with map-side combine; entropy terms are
    exact integer-count ratios so both engines agree at 6 dp."""
    e = read_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("user_id").agg(
        F.sum("n").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("n_types"),
    )
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "user_id")
        .groupBy("user_id")
        .agg(
            F.any_value(F.col("tot")).cast("bigint").alias("n_events"),
            F.any_value("n_types").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@q(
    "events_audience_overlap",
    """
    WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
    sizes AS (SELECT event_type, count(*) AS n FROM du GROUP BY 1),
    common AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b, count(*) AS c
      FROM du a JOIN du b ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT c.type_a, c.type_b, c.c AS n_shared_users,
           round(CAST(c.c AS DOUBLE) / (sa.n + sb.n - c.c), 6) AS jaccard
    FROM common c
    JOIN sizes sa ON sa.event_type = c.type_a
    JOIN sizes sb ON sb.event_type = c.type_b
    """,
)
def events_audience_overlap(spark, sf_dir):
    """Audience-overlap matrix: Jaccard similarity between event types'
    user sets — which behaviors share an audience.  DISTINCT (type, user)
    first (≤ |types|×|users| rows), then a user-keyed self-join whose
    output is the type-pair matrix; the size dim broadcasts back.  At
    100 TB swap exact distinct-user sets for the KMV sketch per type and
    intersect via inclusion-exclusion on merged sketches."""
    e = read_table(spark, sf_dir, "events")
    du = e.select("event_type", "user_id").distinct().localCheckpoint(eager=True)
    sizes = du.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = du.select(F.col("event_type").alias("type_a"), "user_id")
    b = du.select(F.col("event_type").alias("type_b"), "user_id")
    common = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_shared_users"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (
        common.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_shared_users",
            F.round(
                F.col("n_shared_users")
                / (F.col("na") + F.col("nb") - F.col("n_shared_users")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@q(
    "events_transition_entropy",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_type
      FROM events
    ),
    c AS (
      SELECT from_type, event_type AS to_type, count(*) AS n
      FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
    ),
    t AS (SELECT from_type, CAST(sum(n) AS DOUBLE) AS tot, count(*) AS n_succ
          FROM c GROUP BY 1)
    SELECT c.from_type,
           CAST(any_value(t.tot) AS BIGINT) AS n_transitions,
           any_value(t.n_succ) AS n_successors,
           round(-sum((c.n / t.tot) * ln(c.n / t.tot)), 6) AS entropy
    FROM c JOIN t ON t.from_type = c.from_type
    GROUP BY c.from_type
    """,
)
def events_transition_entropy(spark, sf_dir):
    """Per-state predictability of the behavioral Markov chain: Shannon
    entropy of each event type's successor distribution (0 = always the
    same next action, ln(k) = uniform) — the signal that separates
    scripted/bot flows from organic usage.  One lag window + two
    successor-keyed aggregates; exact integer-count ratios keep engines
    at 6 dp parity."""
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("from_type")
    ).filter(F.col("from_type").isNotNull())
    c = seq.groupBy("from_type", "event_type").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("from_type").agg(
        F.sum("n").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("n_succ"),
    )
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "from_type")
        .groupBy("from_type")
        .agg(
            F.any_value("tot").cast("bigint").alias("n_transitions"),
            F.any_value("n_succ").alias("n_successors"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


_KMV_EST = """CASE WHEN count(*) < 64
       THEN CAST(round(64.0 * ln(64.0 / (64.0 - CAST(count(*) AS DOUBLE))))
            AS BIGINT)
       ELSE CAST(round(4096.0 / (CAST(sum({umin}) AS DOUBLE) / 4503599627370496.0))
            AS BIGINT) END"""


@q(
    "events_audience_overlap_sketch",
    f"""
    WITH hashed AS (
      SELECT event_type,
             ('0x' || substr(md5('kmv-v1|' || CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS u52,
             ('0x' || substr(md5('kmv-v1|' || CAST(user_id AS VARCHAR)), 14, 2))::BIGINT % 64 AS b
      FROM events
    ),
    mins AS (SELECT event_type, b, min(u52) AS umin FROM hashed GROUP BY 1, 2),
    est AS (
      SELECT event_type, {_KMV_EST.format(umin='umin')} AS est
      FROM mins GROUP BY event_type
    ),
    tps AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM est a JOIN est b ON a.event_type < b.event_type
    ),
    mem AS (
      SELECT type_a, type_b, type_a AS member FROM tps
      UNION ALL SELECT type_a, type_b, type_b FROM tps
    ),
    mmins AS (
      SELECT m.type_a, m.type_b, s.b, min(s.umin) AS umin
      FROM mem m JOIN mins s ON s.event_type = m.member
      GROUP BY 1, 2, 3
    ),
    uest AS (
      SELECT type_a, type_b, {_KMV_EST.format(umin='umin')} AS est_union
      FROM mmins GROUP BY 1, 2
    )
    SELECT u.type_a, u.type_b, ea.est AS est_a, eb.est AS est_b, u.est_union,
           greatest(ea.est + eb.est - u.est_union, 0) AS est_intersection,
           round(greatest(ea.est + eb.est - u.est_union, 0)
                 / CAST(u.est_union AS DOUBLE), 6) AS est_jaccard
    FROM uest u
    JOIN est ea ON ea.event_type = u.type_a
    JOIN est eb ON eb.event_type = u.type_b
    """,
)
def events_audience_overlap_sketch(spark, sf_dir):
    """The SCALE path for audience overlap: per-type KMV sketches merge by
    bucket-wise min, union size comes from the merged sketch, and the
    intersection follows by inclusion-exclusion — no distinct-user
    relation ever materializes, and per-day/per-shard sketches roll up
    with the same aggregate.  Deterministic md5 arithmetic: both engines
    replay the sketch exactly (the exact twin is
    ``events_audience_overlap``)."""
    e = read_table(spark, sf_dir, "events")
    m = 64
    h = F.md5(F.concat_ws("|", F.lit("kmv-v1"), F.col("user_id").cast("string")))
    u52 = F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")
    bucket = F.pmod(F.conv(F.substring(h, 14, 2), 16, 10).cast("bigint"), F.lit(m))
    mins = (
        e.select("event_type", u52.alias("_u"), bucket.alias("_b"))
        .groupBy("event_type", "_b")
        .agg(F.min("_u").alias("_umin"))
    ).localCheckpoint(eager=True)  # feeds singles + merged pair sketches

    def estimator():
        two52 = float(1 << 52)
        hit = F.count(F.lit(1))
        raw = F.lit(float(m * m)) / (F.sum("_umin").cast("double") / F.lit(two52))
        linear = F.lit(float(m)) * F.log(
            F.lit(float(m)) / (F.lit(float(m)) - hit.cast("double"))
        )
        return (
            F.when(hit < m, F.round(linear)).otherwise(F.round(raw)).cast("bigint")
        )

    singles = mins.groupBy("event_type").agg(estimator().alias("est"))
    tps = (
        singles.select(F.col("event_type").alias("type_a"))
        .join(
            singles.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    mem = tps.select("type_a", "type_b", F.col("type_a").alias("member")).unionByName(
        tps.select("type_a", "type_b", F.col("type_b").alias("member"))
    )
    mmins = (
        F.broadcast(mem)
        .join(mins, mins["event_type"] == F.col("member"))
        .groupBy("type_a", "type_b", "_b")
        .agg(F.min("_umin").alias("_umin"))
    )
    uest = mmins.groupBy("type_a", "type_b").agg(estimator().alias("est_union"))
    ea = singles.select(F.col("event_type").alias("type_a"), F.col("est").alias("est_a"))
    eb = singles.select(F.col("event_type").alias("type_b"), F.col("est").alias("est_b"))
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
    )
    return (
        uest.join(F.broadcast(ea), "type_a")
        .join(F.broadcast(eb), "type_b")
        .select(
            "type_a", "type_b", "est_a", "est_b", "est_union",
            inter.alias("est_intersection"),
            F.round(inter / F.col("est_union").cast("double"), 6).alias("est_jaccard"),
        )
    )


@q(
    "process_conformance_orders",
    """
    WITH seq AS (
      SELECT o_custkey, o_orderstatus,
             lag(o_orderstatus) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ),
    trans AS (SELECT * FROM seq WHERE prev IS NOT NULL)
    SELECT prev AS from_status, o_orderstatus AS to_status,
           count(*) AS n_transitions,
           prev = 'F' AND o_orderstatus = 'O' AS violates_model
    FROM trans GROUP BY 1, 2
    """,
)
def process_conformance_orders(spark, sf_dir):
    """Process-mining conformance: the customer-level order-status
    transition log, with transitions the declared process model forbids
    (F→O: a finished history reopening) flagged.  One deterministic lag
    window per customer + one transition aggregate — the audit an order
    pipeline runs continuously; swap the flag expression for any declared
    legality matrix."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_orderstatus", F.lag("o_orderstatus").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return seq.groupBy(
        F.col("prev").alias("from_status"),
        F.col("o_orderstatus").alias("to_status"),
    ).agg(
        F.count(F.lit(1)).alias("n_transitions"),
    ).withColumn(
        "violates_model",
        (F.col("from_status") == "F") & (F.col("to_status") == "O"),
    )


@q(
    "events_rolling_wau",
    """
    WITH du AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events
    ),
    days AS (SELECT DISTINCT d FROM du),
    contrib AS (
      SELECT DISTINCT user_id, d + to_days(CAST(u.i AS INTEGER)) AS wd
      FROM du, unnest(range(0, 7)) AS u(i)
    ),
    wau AS (SELECT wd, count(*) AS wau FROM contrib GROUP BY 1)
    SELECT CAST(days.d AS VARCHAR) AS day, w.wau AS wau_7d
    FROM days JOIN wau w ON w.wd = days.d
    """,
)
def events_rolling_wau(spark, sf_dir):
    """EXACT rolling 7-day active users per day — the non-additive
    distinct count windows can't do directly: each (user, active-day) pair
    contributes itself to the 7 window-end days it falls inside, and the
    distinct contribution count per day IS the WAU.  Rows stay ≤
    7×|user-days| (linear), vs the day×user re-scan a naive per-day
    distinct would cost; the same shape yields MAU with range 30."""
    e = read_table(spark, sf_dir, "events")
    du = e.select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).cast("date").alias("d"),
    ).distinct()
    days = du.select("d").distinct()
    contrib = (
        du.select(
            "user_id", F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"), "d"
        )
        .select("user_id", F.expr("date_add(d, i)").alias("wd"))
        .distinct()
    )
    wau = contrib.groupBy("wd").agg(F.count(F.lit(1)).alias("wau_7d"))
    return days.join(wau, days["d"] == wau["wd"]).select(
        F.col("d").cast("string").alias("day"), "wau_7d"
    )


@q(
    "events_temporal_embargo_split",
    """
    WITH b AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tsx,
             (SELECT min(CAST(ts AS TIMESTAMP)) FROM events) AS t0,
             (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) AS t1
      FROM events
    ),
    tagged AS (
      SELECT event_id, user_id,
             CASE WHEN epoch_us(tsx) < epoch_us(t0)
                       + CAST(0.8 * (epoch_us(t1) - epoch_us(t0)) AS BIGINT)
                  THEN 'train'
                  WHEN epoch_us(tsx) >= epoch_us(t0)
                       + CAST(0.85 * (epoch_us(t1) - epoch_us(t0)) AS BIGINT)
                  THEN 'test'
                  ELSE 'embargo' END AS split
      FROM b
    )
    SELECT split, count(*) AS n_events, count(DISTINCT user_id) AS n_users
    FROM tagged GROUP BY 1
    """,
)
def events_temporal_embargo_split(spark, sf_dir):
    """Time-series split with an EMBARGO gap: train on the first 80% of
    the time range, test after 85%, and quarantine the 5% between — the
    purge that stops rolling-feature leakage across the boundary (the
    temporal sibling of `curation_leakproof_split`).  The range bounds
    are one broadcast scalar aggregate; tagging is a pure projection."""
    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = e.agg(
        F.min(us).alias("t0"), F.max(us).alias("t1")
    )
    tagged = e.crossJoin(F.broadcast(bounds)).select(
        "event_id", "user_id",
        F.when(
            us < F.col("t0")
            + (0.8 * (F.col("t1") - F.col("t0"))).cast("bigint"),
            F.lit("train"),
        )
        .when(
            us >= F.col("t0")
            + (0.85 * (F.col("t1") - F.col("t0"))).cast("bigint"),
            F.lit("test"),
        )
        .otherwise(F.lit("embargo"))
        .alias("split"),
    )
    return tagged.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@q(
    "events_churn_labels",
    """
    WITH b AS (
      SELECT (SELECT min(CAST(ts AS TIMESTAMP)) FROM events) AS t0,
             (SELECT max(CAST(ts AS TIMESTAMP)) FROM events) AS t1
    ),
    cut AS (
      SELECT epoch_us(t0) + CAST(0.7 * (epoch_us(t1) - epoch_us(t0)) AS BIGINT)
               AS cutoff_us
      FROM b
    ),
    feat AS (
      SELECT user_id,
             count(*) FILTER (epoch_us(CAST(ts AS TIMESTAMP)) < cutoff_us)
               AS n_events_before,
             count(*) FILTER (epoch_us(CAST(ts AS TIMESTAMP)) >= cutoff_us)
               AS n_events_after
      FROM events, cut GROUP BY user_id, cutoff_us
    )
    SELECT user_id, n_events_before,
           n_events_after = 0 AS churned
    FROM feat WHERE n_events_before > 0
    """,
)
def events_churn_labels(spark, sf_dir):
    """Supervised churn-label assembly with temporal hygiene: features
    come strictly BEFORE the 70% time cutoff, the label (no activity
    after) strictly AFTER — one conditional aggregate per user against a
    broadcast scalar cutoff, no leakage by construction.  Users born
    after the cutoff are excluded (no feature window)."""
    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = e.agg(F.min(us).alias("t0"), F.max(us).alias("t1"))
    cut = bounds.select(
        (F.col("t0") + (0.7 * (F.col("t1") - F.col("t0"))).cast("bigint")).alias(
            "cutoff_us"
        )
    )
    feat = (
        e.crossJoin(F.broadcast(cut))
        .groupBy("user_id")
        .agg(
            F.sum((us < F.col("cutoff_us")).cast("bigint")).alias("n_events_before"),
            F.sum((us >= F.col("cutoff_us")).cast("bigint")).alias("n_events_after"),
        )
    )
    return feat.filter(F.col("n_events_before") > 0).select(
        "user_id", "n_events_before",
        (F.col("n_events_after") == 0).alias("churned"),
    )


@q(
    "events_purchase_intervals",
    """
    WITH p AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS tsx, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT user_id,
             epoch_us(tsx) - epoch_us(lag(tsx) OVER (
               PARTITION BY user_id ORDER BY tsx, event_id)) AS gap_us
      FROM p
    )
    SELECT count(*) AS n_gaps,
           round(quantile_cont(gap_us / 3600000000.0, 0.5), 4) AS p50_hours,
           round(quantile_cont(gap_us / 3600000000.0, 0.9), 4) AS p90_hours,
           round(max(gap_us) / 3600000000.0, 4) AS max_hours
    FROM gaps WHERE gap_us IS NOT NULL
    """,
)
def events_purchase_intervals(spark, sf_dir):
    """Inter-purchase interval distribution: the repeat-behavior cadence
    (median/p90 hours between consecutive purchases) that drives
    replenishment and win-back timing.  One lag window on the (user)
    partitioning over the filtered purchase stream; integer microsecond
    gaps keep the percentiles engine-identical."""
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").cast("timestamp").alias("tsx"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("tsx", "event_id")
    gaps = p.select(
        (
            F.unix_micros("tsx") - F.unix_micros(F.lag("tsx").over(w))
        ).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    h = F.col("gap_us") / 3_600_000_000.0
    return gaps.agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.percentile(h, F.lit(0.5)), 4).alias("p50_hours"),
        F.round(F.percentile(h, F.lit(0.9)), 4).alias("p90_hours"),
        F.round(F.max("gap_us") / 3_600_000_000.0, 4).alias("max_hours"),
    )


@q(
    "events_trailing_ewma",
    """
    WITH w AS (
      SELECT user_id, ts, event_id,
             list(CAST(value AS DOUBLE))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS l
      FROM events WHERE value IS NOT NULL
    )
    SELECT user_id, ts, event_id,
           round(list_reduce(l, (a, x) -> a * CAST(0.7 AS DOUBLE) + x)
                 / list_reduce(list_transform(l, x -> CAST(1.0 AS DOUBLE)),
                               (a, x) -> a * CAST(0.7 AS DOUBLE) + x),
                 6) AS ewma
    FROM w
    """,
)
def events_trailing_ewma_q(spark, sf_dir):
    """Per-user trailing EWMA (α=0.3, last 8 events) over event values
    (operators/behavior.py:trailing_ewma): numerator and weight mass come
    from the SAME fold-left recurrence acc·(1-α)+x, one bounded-frame
    window + one codegen'd F.aggregate fold — no self-join, state
    bounded by the window regardless of history.  DuckDB's list_reduce
    folds in the identical order, so the doubles match bit-for-bit
    before the 6-dp round.  Null values are filtered on both sides (the
    engines disagree on nulls-in-list semantics; the contract is
    non-null input)."""
    from .operators import behavior

    ev = read_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    out = behavior.trailing_ewma(
        ev, "user_id", ["ts", "event_id"], "value", window_rows=8, alpha=0.3
    )
    return out.select("user_id", "ts", "event_id", "ewma")


@q(
    "events_seasonal_anomaly",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_hour,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT *, CAST(sum(n_events) OVER w AS BIGINT) AS tot,
                CAST(count(*) OVER w AS BIGINT) AS n
      FROM hourly
      WINDOW w AS (PARTITION BY event_type, hour(bucket_hour))
    )
    SELECT event_type, bucket_hour, n_events,
           n - 1 AS n_peer_hours,
           CASE WHEN n > 1
                THEN round(CAST(tot - n_events AS DOUBLE) / (n - 1), 6) END
             AS loo_baseline,
           CASE WHEN n > 1 AND tot != n_events
                THEN round(CAST(n_events AS DOUBLE)
                           / (CAST(tot - n_events AS DOUBLE) / (n - 1)), 6) END
             AS ratio,
           CASE WHEN n > 1
                THEN (n_events * (n - 1) > 2 * (tot - n_events))
                  OR (2 * n_events * (n - 1) < (tot - n_events))
                ELSE FALSE END AS anomaly
    FROM s
    """,
)
def events_seasonal_anomaly_q(spark, sf_dir):
    """Hour-of-day seasonal anomaly screen
    (operators/behavior.py:seasonal_hod_anomaly): each (type, hour)
    bucket vs the leave-one-out mean of the SAME hour of day on other
    days — the seasonality correction the trailing z-score can't make.
    Flags are exact integer inequalities (x·(n−1) vs 2·(Σ−x)); one
    count aggregate + one window, two bounded shuffles."""
    from .operators import behavior

    ev = read_table(spark, sf_dir, "events")
    return behavior.seasonal_hod_anomaly(ev, factor=2)


def _miter_sql(out: str, prev: str) -> str:
    """One Markov value-iteration step (mirrors behavior.markov_attribution:
    per-step contributions round to 9dp, accumulate in DECIMAL(28,12))."""
    return f"""
    {out} AS (
      SELECT pr.variant, pr.src AS state,
             round(CAST(coalesce(sum(CAST(round(pr.p *
                   (CASE WHEN pr.dst = '__CONV__' THEN 1.0
                         ELSE coalesce(prev.p, 0.0) END), 9)
                   AS DECIMAL(28,12))), CAST(0 AS DECIMAL(28,12)))
                   AS DOUBLE), 9) AS p
      FROM probs pr
      LEFT JOIN {prev} prev ON prev.variant = pr.variant
                           AND prev.state = pr.dst
      GROUP BY 1, 2
    )"""


_MITER_CHAIN = ",".join(
    _miter_sql(f"p{k}", f"p{k - 1}") for k in range(1, 13)
)


@q(
    "events_markov_attribution",
    f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prior_conv
      FROM events
    ),
    path AS (SELECT * FROM ordered WHERE prior_conv = 0),
    seq AS (
      SELECT *, lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prn
      FROM path
    ),
    tr AS (
      SELECT '__START__' AS src,
             CASE WHEN event_type = 'purchase' THEN '__CONV__'
                  ELSE event_type END AS dst
      FROM seq WHERE prn = 1
      UNION ALL
      SELECT event_type AS src,
             CASE WHEN nxt IS NULL THEN '__NULL__'
                  WHEN nxt = 'purchase' THEN '__CONV__'
                  ELSE nxt END AS dst
      FROM seq WHERE event_type != 'purchase'
    ),
    tcounts AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS n
                FROM tr GROUP BY 1, 2),
    variants AS (
      SELECT DISTINCT src AS variant FROM tcounts WHERE src != '__START__'
      UNION ALL SELECT '__full__'
    ),
    vtrans AS (
      SELECT v.variant, t.src,
             CASE WHEN t.dst = v.variant THEN '__NULL__' ELSE t.dst END AS dst,
             CAST(sum(t.n) AS BIGINT) AS n
      FROM tcounts t, variants v
      WHERE t.src != v.variant
      GROUP BY 1, 2, 3
    ),
    tot AS (SELECT variant, src, CAST(sum(n) AS BIGINT) AS tot
            FROM vtrans GROUP BY 1, 2),
    probs AS (
      SELECT vt.variant, vt.src, vt.dst,
             CAST(vt.n AS DOUBLE) / CAST(tt.tot AS DOUBLE) AS p
      FROM vtrans vt JOIN tot tt ON tt.variant = vt.variant
                                AND tt.src = vt.src
    ),
    p0 AS (SELECT DISTINCT variant, src AS state, CAST(0.0 AS DOUBLE) AS p
           FROM probs),
    {_MITER_CHAIN},
    fullp AS (SELECT p AS p_conv FROM p12
              WHERE variant = '__full__' AND state = '__START__'),
    rem AS (SELECT variant AS channel, p AS p_rem FROM p12
            WHERE variant != '__full__' AND state = '__START__'),
    re AS (
      SELECT channel,
             round(p_conv, 6) AS p_conv,
             round(p_rem, 6) AS p_conv_removed,
             greatest(CASE WHEN p_conv > 0
                           THEN round(1 - p_rem / p_conv, 6)
                           ELSE 0.0 END, 0.0) AS removal_effect
      FROM rem, fullp
    ),
    t2 AS (SELECT CAST(sum(CAST(removal_effect AS DECIMAL(18,6))) AS DOUBLE)
             AS total FROM re)
    SELECT channel, p_conv, p_conv_removed, removal_effect,
           CASE WHEN total > 0
                THEN round(removal_effect / total, 6)
                ELSE 0.0 END AS attribution_share
    FROM re, t2
    """,
)
def events_markov_attribution_q(spark, sf_dir):
    """Data-driven multi-touch attribution
    (operators/behavior.py:markov_attribution): per-user paths truncated
    at the first purchase feed a first-order Markov chain; each
    channel's REMOVAL EFFECT is the drop in 12-step START->CONV
    absorption probability when that channel redirects to the
    non-converting sink — the principled alternative to last-touch
    credit.  All removal variants iterate together as one
    (variant, state)-keyed relation (the chain solve is dimension-sized
    no matter how many channels), and the 12-step horizon is part of
    the contract so both engines run bit-identical arithmetic (the
    pagerank discipline: 9dp contribution rounds, DECIMAL(28,12)
    accumulation)."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.markov_attribution(ev, conversion="purchase",
                                       iterations=12)


@q(
    "events_cusum_drift",
    """
    WITH buckets AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_hour,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT *,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS t,
             CAST(sum(n_events) OVER (PARTITION BY event_type) AS BIGINT)
               AS total
      FROM buckets
    ),
    pfx AS (
      SELECT *,
             CAST(sum(t * n_events - total) OVER
               (PARTITION BY event_type ORDER BY bucket_hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS p
      FROM stats
    ),
    ext AS (
      SELECT *,
             least(CAST(0 AS BIGINT), CAST(min(p) OVER
               (PARTITION BY event_type ORDER BY bucket_hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
               AS minp,
             greatest(CAST(0 AS BIGINT), CAST(max(p) OVER
               (PARTITION BY event_type ORDER BY bucket_hour
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT))
               AS maxp
      FROM pfx
    )
    SELECT event_type, CAST(bucket_hour AS VARCHAR) AS bucket_hour, n_events,
           p - minp AS cusum_up,
           maxp - p AS cusum_down,
           ((p - minp) * 40 > total * t) OR ((maxp - p) * 40 > total * t)
             AS drift_flag
    FROM ext
    """,
)
def events_cusum_drift_q(spark, sf_dir):
    """Page's CUSUM level-shift detector over hourly per-type counts
    (operators/behavior.py:cusum_drift): the recursive max(0, S+dev)
    fold expressed through the prefix-extrema identity (S_t = P_t -
    min_j<=t P_j), so the detector is one coarse-key groupBy plus two
    window passes, all integer-exact.  CUSUM accumulates small
    PERSISTENT shifts that the rolling z-score (per-bucket outliers)
    and the seasonal screen (hour-of-day effects) both miss.  The flag
    threshold (cumulative deviation > 1/40 of series volume, chosen by
    measurement) fires on genuinely drifting series — the drift-free
    test corpus flags 18 buckets at sf0.01 and, correctly, ZERO at
    sf0.1: a random walk's relative excursion shrinks as volume grows,
    which is exactly the false-positive behavior you want; the planted
    level-shift pytest proves the detector bites."""
    ev = read_table(spark, sf_dir, "events")
    return behavior.cusum_drift(ev, flag_den=40)


@q(
    "events_abtest_proportions",
    """
    WITH arms AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5('ab-v1::' || CAST(user_id AS VARCHAR)),
                                       1, 8))::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS arm,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       >= 14 THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY 1
    ),
    agg AS (
      SELECT
        CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT)
          AS conv_a,
        CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT)
          AS conv_b
      FROM arms
    )
    SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
           round(CAST(conv_a AS DOUBLE) / n_a
                 - CAST(conv_b AS DOUBLE) / n_b, 6) AS lift,
           round(CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                      THEN 0.0
                      ELSE (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                        * (1.0 / n_a + 1.0 / n_b)) END, 6) AS z_stat,
           abs(CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b
                    THEN 0.0
                    ELSE (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
               / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                      * (1.0 / n_a + 1.0 / n_b)) END) > 1.96 AS significant
    FROM agg
    """,
)
def events_abtest_proportions_q(spark, sf_dir):
    """Two-proportion z-test (the experimentation readout): users
    md5-assigned to arms A/B ('ab-v1' — the deterministic assignment
    split_bucket uses everywhere), converted = any purchase event,
    pooled-variance z statistic with the 1.96 two-sided gate.  Exact
    integer counts feed ONE fixed double expression (the stats-profile
    discipline), so the z and the significance bit are engine-identical;
    on a null assignment (arm independent of behavior) the test should
    and does come back non-significant — the calibration property.
    Two user-keyed aggregates, one scalar row."""
    ev = read_table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("ab-v1::"),
                                          F.col("user_id").cast("string"))),
                           1, 8), 16, 10).cast("bigint") % 2 == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    arms = (
        ev.groupBy("user_id")
        .agg(
            (F.sum((F.col("event_type") == "purchase").cast("int")) >= 14)
            .cast("int")
            .alias("converted")
        )
        .withColumn("arm", arm)
    )
    agg = arms.agg(
        F.sum((F.col("arm") == "A").cast("int")).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("arm") == "A", F.col("converted")).otherwise(0))
        .cast("bigint").alias("conv_a"),
        F.sum((F.col("arm") == "B").cast("int")).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("arm") == "B", F.col("converted")).otherwise(0))
        .cast("bigint").alias("conv_b"),
    )
    ra = F.col("conv_a").cast("double") / F.col("n_a")
    rb = F.col("conv_b").cast("double") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    degenerate = (
        (F.col("conv_a") + F.col("conv_b") == 0)
        | (F.col("conv_a") + F.col("conv_b") == F.col("n_a") + F.col("n_b"))
    )
    z = F.when(degenerate, F.lit(0.0)).otherwise(
        (ra - rb) / F.sqrt(
            pp * (F.lit(1.0) - pp)
            * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
        )
    )
    return agg.select(
        "n_a", "conv_a", "n_b", "conv_b",
        F.round(ra, 6).alias("rate_a"),
        F.round(rb, 6).alias("rate_b"),
        F.round(ra - rb, 6).alias("lift"),
        F.round(z, 6).alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant"),
    )


# ---------------------------------------------------------------------------
# survival analysis: time-to-first-purchase hazard table
# ---------------------------------------------------------------------------


@q(
    "events_survival_hazard",
    """
    WITH u AS (
      SELECT user_id, min(ts) AS t0, max(ts) AS t_last,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_p
      FROM events GROUP BY user_id
    ),
    d AS (
      SELECT CASE WHEN t_p IS NOT NULL THEN date_diff('day', t0, t_p)
                  ELSE date_diff('day', t0, t_last) END AS dur,
             CASE WHEN t_p IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM u
    ),
    byday AS (
      SELECT dur AS day, sum(ev) AS n_event, sum(1 - ev) AS n_censored,
             count(*) AS n_leaving
      FROM d GROUP BY dur
    ),
    km AS (
      SELECT day, n_event, n_censored,
             (SELECT count(*) FROM d)
               - coalesce(sum(n_leaving) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM byday
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_event AS BIGINT) AS n_event,
           CAST(n_censored AS BIGINT) AS n_censored,
           CAST((n_event * 10000) // n_risk AS BIGINT) AS hazard_bp
    FROM km WHERE n_event > 0
    """,
)
def events_survival_hazard_q(spark, sf_dir):
    """Kaplan-Meier at-risk table for time-to-first-purchase: per user,
    duration runs from the first event to the first purchase (the event)
    or to the last observed event (right-censored).  For each duration
    day with >= 1 conversion the row reports the risk set, conversions,
    censorings, and the discrete hazard in exact integer basis points
    (n_event * 10^4 DIV n_risk — never a float division, so both
    engines agree bit-for-bit).  Scale shape: one groupBy(user) pass
    over the event log, then all survival arithmetic happens on the
    duration-day relation, which is CALENDAR-BOUNDED (one row per
    distinct duration day, <= the dataset's day span) — the cumulative
    risk-set window is therefore a deliberate single-task window over
    ~hundreds of rows, same documented posture as events_slo_burn and
    events_dau_wau_mau.  The censoring rule is the standard KM
    convention: censored users leave the risk set the day after their
    duration, conversions count against the risk set of their own day."""
    from pyspark.sql.window import Window

    e = read_table(spark, sf_dir, "events")
    u = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.max("ts").alias("t_last"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_p"),
    )
    d = u.select(
        F.when(
            F.col("t_p").isNotNull(), F.datediff(F.col("t_p"), F.col("t0"))
        )
        .otherwise(F.datediff(F.col("t_last"), F.col("t0")))
        .cast("bigint")
        .alias("dur"),
        F.when(F.col("t_p").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("ev"),
    )
    byday = d.groupBy(F.col("dur").alias("day")).agg(
        F.sum("ev").alias("n_event"),
        F.sum(F.lit(1) - F.col("ev")).alias("n_censored"),
        F.count(F.lit(1)).alias("n_leaving"),
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    km = byday.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_users") - F.coalesce(F.sum("n_leaving").over(w), F.lit(0)),
    )
    return km.filter(F.col("n_event") > 0).select(
        F.col("day").cast("bigint").alias("day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_event").cast("bigint").alias("n_event"),
        F.col("n_censored").cast("bigint").alias("n_censored"),
        F.expr("(n_event * 10000) DIV n_risk").cast("bigint").alias("hazard_bp"),
    )


@q(
    "events_uplift_did",
    """
    WITH span AS (
      SELECT min(epoch_us(CAST(ts AS TIMESTAMP))) AS lo,
             max(epoch_us(CAST(ts AS TIMESTAMP))) AS hi
      FROM events
    ),
    base AS (
      SELECT ('0x' || substr(md5('did-v1::' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
               % 2 AS treated,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP)) - lo >= (hi - lo) // 2
                  THEN 1 ELSE 0 END AS post,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events, span WHERE event_type = 'purchase'
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_t0,
             CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_t0,
             CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_t1,
             CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t1,
             CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_c0,
             CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c0,
             CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_c1,
             CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_c1
      FROM base
    )
    SELECT n_t0, n_t1, n_c0, n_c1,
           CAST(s_t0 * 100 // n_t0 AS BIGINT) AS mean_t_pre_cc,
           CAST(s_t1 * 100 // n_t1 AS BIGINT) AS mean_t_post_cc,
           CAST(s_c0 * 100 // n_c0 AS BIGINT) AS mean_c_pre_cc,
           CAST(s_c1 * 100 // n_c1 AS BIGINT) AS mean_c_post_cc,
           CAST((s_t1 * 100 // n_t1) - (s_t0 * 100 // n_t0)
                - ((s_c1 * 100 // n_c1) - (s_c0 * 100 // n_c0)) AS BIGINT)
             AS did_cc
    FROM cells
    """,
)
def events_uplift_did_q(spark, sf_dir):
    """Difference-in-differences uplift estimate on purchase value —
    completes the experimentation family next to the two-proportion
    z-test: treatment arm = deterministic md5 user hash ('did-v1' seed,
    null assignment on this fixture so the estimate should hover near 0),
    post period = second half of the observed time span (boundary from a
    1-row min/max aggregate, broadcast).  All four cell means and the DiD
    estimate are exact integer centi-cents (sum*100 DIV n — floors
    compose identically on both engines; never a float mean).  Scale
    shape: one conditional aggregate over the purchase slice — a single
    map-side-combinable pass, one row out; the span dim is the only
    other relation."""
    e = read_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = e.agg(F.min(us).alias("lo"), F.max(us).alias("hi"))
    base = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(span))
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("did-v1::"),
                                       F.col("user_id").cast("string"))),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint") % 2
            ).alias("treated"),
            F.when(us - F.col("lo") >= F.expr("(hi - lo) DIV 2"), F.lit(1))
            .otherwise(F.lit(0))
            .alias("post"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )

    def _cell(t, p, expr):
        cond = (F.col("treated") == t) & (F.col("post") == p)
        return F.sum(F.when(cond, expr).otherwise(F.lit(0))).cast("bigint")

    cells = base.agg(
        _cell(1, 0, F.col("cents")).alias("s_t0"),
        _cell(1, 0, F.lit(1)).alias("n_t0"),
        _cell(1, 1, F.col("cents")).alias("s_t1"),
        _cell(1, 1, F.lit(1)).alias("n_t1"),
        _cell(0, 0, F.col("cents")).alias("s_c0"),
        _cell(0, 0, F.lit(1)).alias("n_c0"),
        _cell(0, 1, F.col("cents")).alias("s_c1"),
        _cell(0, 1, F.lit(1)).alias("n_c1"),
    )
    return cells.select(
        "n_t0", "n_t1", "n_c0", "n_c1",
        F.expr("s_t0 * 100 DIV n_t0").cast("bigint").alias("mean_t_pre_cc"),
        F.expr("s_t1 * 100 DIV n_t1").cast("bigint").alias("mean_t_post_cc"),
        F.expr("s_c0 * 100 DIV n_c0").cast("bigint").alias("mean_c_pre_cc"),
        F.expr("s_c1 * 100 DIV n_c1").cast("bigint").alias("mean_c_post_cc"),
        F.expr(
            "(s_t1 * 100 DIV n_t1) - (s_t0 * 100 DIV n_t0)"
            " - ((s_c1 * 100 DIV n_c1) - (s_c0 * 100 DIV n_c0))"
        ).cast("bigint").alias("did_cc"),
    )


@q(
    "analytics_chi2_independence",
    """
    WITH cells AS (
      SELECT o_orderpriority AS priority, o_orderstatus AS status,
             CAST(count(*) AS BIGINT) AS observed
      FROM orders GROUP BY 1, 2
    ),
    rowt AS (SELECT priority, CAST(sum(observed) AS BIGINT) AS r
             FROM cells GROUP BY priority),
    colt AS (SELECT status, CAST(sum(observed) AS BIGINT) AS c
             FROM cells GROUP BY status),
    tot AS (SELECT CAST(sum(observed) AS BIGINT) AS t FROM cells),
    grid AS (
      SELECT priority, status, r, c, t,
             coalesce(observed, 0) AS observed
      FROM rowt CROSS JOIN colt CROSS JOIN tot
      LEFT JOIN cells USING (priority, status)
    ),
    e AS (
      SELECT priority, status, observed,
             (CAST(r AS HUGEINT) * c * 10000) // t AS e4
      FROM grid
    )
    SELECT priority, status, observed,
           CAST(e4 AS BIGINT) AS expected_4dp,
           CAST(CASE WHEN e4 = 0 THEN NULL
                ELSE (observed * 10000 - e4) * (observed * 10000 - e4)
                     // e4 END AS BIGINT) AS contrib_bp
    FROM e
    """,
)
def analytics_chi2_independence_q(spark, sf_dir):
    """Pearson chi-squared test of independence (order priority x order
    status), exact to the last basis point: the expected count is the
    4-dp floor e4 = (r*c*10000) DIV t and each cell's contribution to
    the statistic is ((o*10000 - e4)^2) DIV e4 — basis points of
    (O-E)^2/E computed on the PRE-ROUNDED expected count, so every value
    is a deterministic integer on both engines (no float division, no
    libm).  contrib_bp is NULL on an expected-zero cell, and its DIV
    quotient stays in int64 while (O-E)^2/E < 9.2e14 — breached only by
    a degenerate cell (expected < 1 with observed in the billions), not
    by any real contingency table.  sum(contrib_bp)/10000 is the chi-squared statistic at
    df = (|priority|-1)(|status|-1); the per-cell rows ARE the output
    because the residual table (which cells deviate) is what a data
    audit reads, not just the scalar.

    The output is the FULL r x c grid: a combination with zero observed
    rows still carries expected mass and contributes exactly e4 to the
    statistic ((0*10000 - e4)^2 DIV e4 == e4 — the floor is exact), so
    sparse tables are not understated; sum(expected_4dp) partitions
    t*10000 to within one floor-ulp per grid cell (property-tested).

    Scale shape: ONE map-side-combinable count aggregate over orders —
    the only data pass, checkpointed at 15 rows; row/column/grand
    totals and the grid cross-product are re-aggregations of the
    MATERIALIZED cells, so the source is never rescanned and every
    post-checkpoint relation is grid-bounded.  Intermediates ride in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB): r*c*10000 overflows int64
    past ~1.2e8 rows, and both engines' exact wide-integer floor
    divisions agree bit-for-bit (boundary-probed in tests); the DIV
    quotients themselves always fit int64 by construction."""
    o = read_table(spark, sf_dir, "orders")
    # the ONE data pass; 15 rows out — checkpointed so the grid's three
    # re-aggregations read the materialized cells, never the source
    cells = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("observed")).localCheckpoint()
    rowt = cells.groupBy("priority").agg(
        F.sum("observed").cast("bigint").alias("r"))
    colt = cells.groupBy("status").agg(
        F.sum("observed").cast("bigint").alias("c"))
    tot = cells.agg(F.sum("observed").cast("bigint").alias("t"))
    grid = (
        rowt.crossJoin(colt)
        .crossJoin(F.broadcast(tot))
        .join(cells, ["priority", "status"], "left")
        .withColumn("observed", F.coalesce("observed", F.lit(0)))
    )
    e = grid.select(
        "priority", "status", "observed",
        F.expr(
            "CAST(CAST(r AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"
            " * 10000 AS DECIMAL(38,0)) DIV t"
        ).cast("bigint").alias("e4"),
    )
    return e.select(
        "priority", "status", "observed",
        F.col("e4").alias("expected_4dp"),
        F.when(F.col("e4") == 0, F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(
                "(CAST(observed * 10000 - e4 AS DECIMAL(19,0))"
                " * CAST(observed * 10000 - e4 AS DECIMAL(19,0)))"
                " DIV CAST(e4 AS DECIMAL(19,0))"
            )
        )
        .cast("bigint").alias("contrib_bp"),
    )


@q(
    "analytics_rank_sum_test",
    """
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS g
      FROM orders
    ),
    cells AS (
      SELECT cents, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS n1
      FROM base GROUP BY cents
    ),
    c AS (
      SELECT n, n1,
             2 * sum(n) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               - n + 1 AS r2
      FROM cells
    ),
    agg AS (
      SELECT CAST(sum(n1) AS BIGINT) AS n1,
             CAST(sum(n) - sum(n1) AS BIGINT) AS n2,
             CAST(sum(n1 * r2) AS BIGINT) AS r1_x2,
             CAST(sum(n * n * n - n) AS BIGINT) AS tie_term
      FROM c
    )
    SELECT n1, n2,
           CAST(r1_x2 - n1 * (n1 + 1) AS BIGINT) AS u1_x2,
           CAST(n1 * n2 AS BIGINT) AS e_u1_x2,
           tie_term
    FROM agg
    """,
)
def analytics_rank_sum_test_q(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between urgent-priority orders
    (group 1 = priority 1-URGENT/2-HIGH) and the rest, on order value —
    the nonparametric two-sample test that needs no normality assumption,
    completing the experimentation family (z-test, DiD, CUSUM).  Ranks
    are midranks doubled to stay integral (r2 = 2*cum - n + 1 for a tie
    group of size n ending at cumulative count cum), so U is emitted as
    u1_x2 = 2*U1 exactly; e_u1_x2 = n1*n2 = 2*E[U] is the null
    expectation and tie_term = sum(n^3 - n) is the tie correction the
    variance formula consumes — everything integer, nothing from libm.
    u1_x2 > e_u1_x2 means urgent orders stochastically dominate.

    Scale shape: one map-side-combinable aggregate to per-distinct-value
    cells, then the global rank recurrence runs as the two-phase
    bucketed_prefix_sum (operators/sweep.py) over 256 VALUE-RANGE
    buckets (monotone in cents by construction from a 1-row min/max
    broadcast) — the |distinct values| relation is never in one task.
    The cells relation is an expensive subplan feeding three consumers
    (min/max stats, the bucket-totals dim, the window), so it is
    eagerly checkpointed once (sweep's materialize="input" discipline)
    — the source is scanned and aggregated exactly once
    (unmaterialized, column pruning forks the subtree and the scan ran
    4x: measured, module docstring of sweep).
    Sums fit int64 through ~3e9 rows (r1_x2 <= n1*(2t+1)); past that the
    partials cast to DECIMAL(38,0) unchanged."""
    from .operators import sweep

    o = read_table(spark, sf_dir, "orders")
    base = o.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(1)
        ).otherwise(F.lit(0)).alias("g"),
    )
    cells = base.groupBy("cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("n1"),
    ).localCheckpoint()
    b = sweep.value_range_buckets(cells, "cents")
    c = sweep.bucketed_prefix_sum(b, "bk", ["cents"], {"n": "n"})
    r = c.withColumn("r2", 2 * F.col("cum_n") - F.col("n") + 1)
    agg = r.agg(
        F.sum("n1").cast("bigint").alias("n1"),
        (F.sum("n") - F.sum("n1")).cast("bigint").alias("n2"),
        F.sum(F.col("n1") * F.col("r2")).cast("bigint").alias("r1_x2"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        .cast("bigint").alias("tie_term"),
    )
    return agg.select(
        "n1", "n2",
        (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1))
        .cast("bigint").alias("u1_x2"),
        (F.col("n1") * F.col("n2")).cast("bigint").alias("e_u1_x2"),
        "tie_term",
    )


@q(
    "analytics_kruskal_wallis",
    """
    WITH base AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderpriority AS grp
      FROM orders
    ),
    gc AS (
      SELECT cents, grp, CAST(count(*) AS BIGINT) AS ng
      FROM base GROUP BY cents, grp
    ),
    vc AS (SELECT cents, CAST(sum(ng) AS BIGINT) AS n FROM gc GROUP BY cents),
    c AS (
      SELECT cents, n,
             2 * sum(n) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
               - n + 1 AS r2
      FROM vc
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM vc)
    SELECT grp,
           CAST(sum(ng) AS BIGINT) AS n_g,
           CAST(sum(ng * r2) AS BIGINT) AS r2_sum,
           CAST(sum(ng) * (t + 1) AS BIGINT) AS e_r2,
           CAST(sum(ng * r2) - sum(ng) * (t + 1) AS BIGINT) AS dev_x2
    FROM gc JOIN c USING (cents), tot
    GROUP BY grp, t
    """,
)
def analytics_kruskal_wallis_q(spark, sf_dir):
    """Kruskal-Wallis rank table across ALL order priorities (the
    k-group generalization of the two-sample rank-sum): per group the
    doubled-midrank sum r2_sum = sum over members of (2*rank), its null
    expectation e_r2 = n_g*(t+1) (since E[2*rank] = t+1), and the
    doubled deviation dev_x2 — sum(dev_x2) over groups is identically 0
    (a pinned invariant), and the H statistic is
    3/(t*(t+1)) * sum(dev_x2^2/n_g) offline (dev_x2 = 2*dev_g folds the
    4 into 12/(t*(t+1))), exactly as chi2 emits the
    residual table rather than one scalar.  All integers, tie-aware
    midranks, nothing from libm.

    Scale shape: ONE data pass to (value, group) cells (checkpointed);
    per-value totals, the bucketed rank recurrence
    (operators/sweep.py), and the final k-row group rollup are all
    re-aggregations of the materialized cells.  The rank join back to
    group cells rides the same value key the sweep partitioned on, and
    is PINNED to sort-merge: both sides are value-cardinality relations
    whose post-checkpoint stats report bogus-small (the fatal-broadcast
    failure mode SCALING.md's r9 rehearsal measured on the substring
    anchors) — SMJ spills, so its 100 TB failure mode is slowness,
    never an error."""
    from .operators import sweep

    o = read_table(spark, sf_dir, "orders")
    gc = (
        o.select(
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
            F.col("o_orderpriority").alias("grp"),
        )
        .groupBy("cents", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ng"))
        .localCheckpoint()
    )
    vc = gc.groupBy("cents").agg(F.sum("ng").cast("bigint").alias("n"))
    b = sweep.value_range_buckets(vc, "cents")
    c = sweep.bucketed_prefix_sum(b, "bk", ["cents"], {"n": "n"})
    r = c.withColumn("r2", 2 * F.col("cum_n") - F.col("n") + 1)
    tot = vc.agg(F.sum("n").cast("bigint").alias("t"))
    return (
        gc.join(r.select("cents", "r2").hint("merge"), "cents")
        .crossJoin(F.broadcast(tot))
        .groupBy("grp", "t")
        .agg(
            F.sum("ng").cast("bigint").alias("n_g"),
            F.sum(F.col("ng") * F.col("r2")).cast("bigint").alias("r2_sum"),
        )
        .select(
            "grp", "n_g", "r2_sum",
            (F.col("n_g") * (F.col("t") + 1)).cast("bigint").alias("e_r2"),
            (F.col("r2_sum") - F.col("n_g") * (F.col("t") + 1))
            .cast("bigint").alias("dev_x2"),
        )
    )


@q(
    "analytics_rfm_scalable",
    """
    WITH base AS (
      SELECT o_custkey AS custkey,
             max(CAST(o_orderdate AS DATE)) AS last_order,
             count(*) AS frequency,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, last_order, frequency, monetary_cents,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, custkey) AS BIGINT) AS r_score,
           CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey) AS BIGINT) AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, custkey) AS BIGINT) AS m_score
    FROM base
    """,
)
def analytics_rfm_scalable(spark, sf_dir):
    """The 100 TB RFM: same output contract as ``analytics_rfm_segments``
    (the oracle IS the three-global-ntile SQL) but NO data-sized
    single-task sort anywhere in the plan.  Each quartile score derives
    from an EXACT global rank computed by the two-phase prefix scan
    (operators/sweep.py): 256 value-range buckets (monotone by
    construction from a 1-row min/max broadcast), per-bucket counts
    aggregate map-side into a 256-row offsets dim (its window runs on
    that dim only), and the within-bucket row_number window is
    PARTITIONED by bucket.  ntile(k) is then pure integer arithmetic on
    (rank, n): the first n%k buckets take n/k+1 rows, the rest n/k —
    bit-identical to the window function for a total order (custkey
    breaks all ties).  Ranks ascend in (metric ASC, custkey DESC) so
    rank_desc = n - rank_asc + 1 lands exactly on the oracle's
    (metric DESC, custkey ASC) order.  Precondition: the three metrics
    are NON-NULL — true by construction here (count, max over the
    NOT-NULL o_orderdate, sum over the NOT-NULL o_totalprice); a NULL
    metric would need a cross-engine null-ordering contract (Spark and
    DuckDB default opposite NULL placements per direction), so the
    sweep's NULL-bucket guard turns that case into a loud runtime error
    rather than a silent rank divergence — the engine's "error, never
    wrong values" discipline.  The relation re-materializes
    between the three passes (localCheckpoint) so each pass's stats +
    offsets jobs read the previous materialization instead of replaying
    upstream windows — the sweep module's "input" discipline; at
    cluster scale the checkpoint is a narrow per-customer relation,
    orders of magnitude under the orders table it aggregates."""
    from .operators import sweep

    o = read_table(spark, sf_dir, "orders")
    base = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_cents"),
    )

    def _ntile4(rank: str, n: str):
        # ntile(4) from a 1-based total-order rank: the first n%4
        # buckets hold n DIV 4 + 1 rows, the rest n DIV 4 — all BIGINT
        # arithmetic (no float div), exact past 2^53
        return F.expr(
            f"CASE WHEN {rank} <= ({n} DIV 4 + 1) * ({n} % 4) "
            f"THEN ({rank} - 1) DIV ({n} DIV 4 + 1) + 1 "
            f"ELSE {n} % 4 + ({rank} - 1 - ({n} DIV 4 + 1) * ({n} % 4))"
            f" DIV ({n} DIV 4) + 1 END"
        ).cast("bigint")

    keep = ["custkey", "last_order", "frequency", "monetary_cents"]
    passes = [
        ("r_score", "_r_days", "rr"),
        ("f_score", "frequency", "rf"),
        ("m_score", "monetary_cents", "rm"),
    ]
    cur = base.withColumn(
        "_r_days", F.unix_date(F.col("last_order")).cast("bigint")
    ).localCheckpoint()
    # r12 (guide §2.4): the passes were CHAINED THROUGH CHECKPOINTS — each
    # re-materialized the full-width relation so the NEXT pass's eager
    # stats + offsets jobs would not replay its windows.  Injection makes
    # the chain fully lazy instead: ONE stats job collects all three grid
    # bounds + the customer count up front (collect_value_range_stats),
    # and each pass's offsets dim builds from a narrow branch of the BASE
    # checkpoint (offsets_from — identical rows, so identical per-bucket
    # counts) rather than from the chained relation.  The main plan is now
    # one pass over the base checkpoint with three bucket-partitioned
    # windows and three broadcast dim joins — zero inter-pass
    # materializations (two full-width checkpoint writes removed), zero
    # data-sized joins, and 7 eager jobs -> 4.  Ranks, ntile arithmetic,
    # and output values are unchanged.
    pre = sweep.collect_value_range_stats(
        cur, [v for _, v, _ in passes],
        extra_stats={
            f"total_{nm}": F.count(F.lit(1)).cast("bigint")
            for _, _, nm in passes
        },
    )
    scores = []
    main = cur
    for score_col, vcol, nm in passes:
        vb = sweep.value_range_buckets(
            main, vcol,
            extra_stats={f"total_{nm}": F.count(F.lit(1)).cast("bigint")},
            precomputed_stats=pre,
        )
        ps = sweep.bucketed_prefix_sum(
            vb,
            "bk",
            [F.col(vcol).asc(), F.col("custkey").desc()],
            {nm: F.lit(1).cast("bigint")},
            materialize="offsets",
            offsets_from=sweep.value_range_buckets(
                cur.select(vcol), vcol, precomputed_stats=pre
            ),
        )
        ranked = ps.withColumn(
            "_rank", (F.col(f"total_{nm}") - F.col(f"cum_{nm}") + 1)
        )
        scored = ranked.withColumn(
            score_col, _ntile4("_rank", f"total_{nm}")
        ).select(*keep, "_r_days", *scores, score_col)
        scores.append(score_col)
        main = scored
    return main.select(*keep, *scores)
