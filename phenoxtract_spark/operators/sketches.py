"""Deterministic, mergeable frequency sketches (beyond-reference scale
operators; complements the built-in ``approx_count_distinct`` /
``percentile_approx`` already registered in ``approx_aggregates``).

Count-Min here is md5-seeded so Spark and the DuckDB oracle build the
IDENTICAL sketch — estimation error comes only from the sketch geometry,
never from engine-dependent hashing, which makes the whole path
value-checkable rather than tolerance-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _bucket(value: Column, d: Column | int, width: int, seed: str) -> Column:
    """Row-``d`` bucket for ``value``: first 8 md5 hex chars (< 2^32) of
    ``seed|d|value`` → decimal → mod width.  Reproducible in any engine."""
    dcol = F.lit(d) if isinstance(d, int) else d
    h = F.md5(F.concat_ws("|", F.lit(seed), dcol.cast("string"), value.cast("string")))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(width))


def count_min_build(df: DataFrame, col: str, depth: int = 4, width: int = 256,
                    seed: str = "cms-v1") -> DataFrame:
    """Build a Count-Min sketch of the ``col`` frequency distribution:
    ``depth × width`` counters as rows (d, bucket, cnt).

    Scale: ONE pass — each input row explodes to ``depth`` (d, bucket)
    pairs and a single groupBy with map-side combine reduces them; the
    shuffle carries at most depth×width rows per partition.  Sketches are
    MERGEABLE (counter-wise sum), so per-day/per-shard sketches roll up
    with a second tiny groupBy — the pattern for continuous 100 TB ingest.
    Memory is O(depth × width), independent of cardinality.
    """
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(col), d, width, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db")
    ).select(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def count_min_estimate(sketch: DataFrame, probes: DataFrame, col: str,
                       depth: int = 4, width: int = 256,
                       seed: str = "cms-v1") -> DataFrame:
    """Point-estimate frequencies for ``probes[col]``: min over the depth
    rows of the probed counters (the classic CM upper bound — exact for
    collision-free values, overestimates otherwise, never under).

    The probe side re-derives each row's bucket and joins the (tiny,
    broadcast) sketch — O(|probes| × depth) work, no scan of the original
    data.  Returns (value, est)."""
    probe_rows = probes.select(
        F.col(col).cast("string").alias("value"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(col), d, width, seed).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("db"),
    ).select("value", F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    return (
        probe_rows.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("value")
        .agg(F.min("cnt").alias("est"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (md5-seeded, engine-identical)
# ---------------------------------------------------------------------------


def _bloom_bits(value: Column, num_hashes: int, num_bits: int,
                seed: str) -> list[Column]:
    return [_bucket(value, k, num_bits, seed) for k in range(num_hashes)]


def bloom_build(df: DataFrame, col: str, num_hashes: int = 4,
                num_bits: int = 4096, seed: str = "bloom-v1") -> DataFrame:
    """Build a Bloom filter of ``df[col]`` as the DISTINCT set bit indices
    (one row per set bit — at most ``num_bits`` rows however large the
    input).

    Scale: one map pass (each row → ``num_hashes`` indices) + one distinct
    on a key space capped at ``num_bits`` — the shuffle is O(num_bits)
    regardless of input size.  Filters are MERGEABLE by unioning bit rows
    (set-OR), so per-shard filters roll up; the bit-row representation
    broadcasts to probes.  md5-seeded like Count-Min: Spark and the SQL
    oracle derive the IDENTICAL bit set, so probe results value-check
    exactly."""
    bits = df.select(
        F.explode(F.array(*_bloom_bits(F.col(col), num_hashes, num_bits, seed))).alias(
            "bit"
        )
    )
    return bits.distinct()


def bloom_probe(bloom: DataFrame, probes: DataFrame, col: str,
                num_hashes: int = 4, num_bits: int = 4096,
                seed: str = "bloom-v1") -> DataFrame:
    """Probe membership: a value is ``maybe_present`` iff ALL its hash
    bits are set (classic no-false-negative / bounded-false-positive
    semantics).  The bit set (≤ num_bits rows) broadcasts; probe cost is
    O(|probes| × num_hashes) with no scan of the original data.
    Returns (value, maybe_present) — one row per DISTINCT probe value
    (duplicates are collapsed first: the membership answer is a property
    of the value, and duplicate probe rows would otherwise inflate the
    matched-bit count past ``num_hashes`` and yield false negatives)."""
    probe_rows = probes.select(
        F.col(col).cast("string").alias("value")
    ).distinct().select(
        "value",
        F.explode(
            F.array(*_bloom_bits(F.col("value"), num_hashes, num_bits, seed))
        ).alias("bit"),
    )
    marked = probe_rows.join(
        F.broadcast(bloom.withColumn("_set", F.lit(1))), "bit", "left"
    )
    return marked.groupBy("value").agg(
        (F.count(F.col("_set")) == F.lit(num_hashes)).alias("maybe_present")
    )


# ---------------------------------------------------------------------------
# equi-width histogram quantile estimation (mergeable)
# ---------------------------------------------------------------------------


def histogram_quantiles(df: DataFrame, col: str, quantiles: list[float],
                        num_bins: int = 128, lo: float | None = None,
                        hi: float | None = None,
                        round_dp: int = 4) -> DataFrame:
    """Quantile estimates from an equi-width histogram: bin the column,
    accumulate counts, and linearly interpolate inside the bin containing
    each target rank (the mergeable-histogram alternative to a full sort;
    ``percentile_approx``'s sketch is engine-internal, this one is
    engine-replayable).

    ``lo``/``hi`` fix the range; when omitted a first bounded aggregate
    derives min/max (two-pass, like the cast-stats kernel).  Estimation
    error ≤ bin width; bins are mergeable counters so per-shard histograms
    roll up for continuous ingest.  Returns (q, est).

    Scale: one map pass + a groupBy on ≤ ``num_bins`` keys; the rank
    interpolation runs over the tiny bin relation.  All double arithmetic
    derives from exact integer counts and the two range constants through
    a fixed expression tree — engine-reproducible.

    Out-of-range values under a FIXED lo/hi clamp symmetrically into the
    edge bins (the histogram contract: range errors shift estimates by at
    most the clamped mass, never corrupt the bin relation).  Quantiles
    must lie in (0, 1]; q=0 is the range minimum, not a rank query.
    """
    if not quantiles or any(not (0.0 < q <= 1.0) for q in quantiles):
        raise ValueError("quantiles must be a non-empty list within (0, 1]")
    if lo is None or hi is None:
        r = df.agg(
            F.min(F.col(col).cast("double")).alias("lo"),
            F.max(F.col(col).cast("double")).alias("hi"),
        ).collect()[0]
        lo = r["lo"] if lo is None else lo
        hi = r["hi"] if hi is None else hi
    width = (hi - lo) / num_bins
    x = F.col(col).cast("double")
    bin_ = F.greatest(
        F.lit(0),
        F.least(
            F.lit(num_bins - 1),
            F.floor((x - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    ).cast("bigint")
    hist = (
        df.filter(x.isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    total_w = Window.partitionBy()
    cum = hist.select(
        "bin",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("cum_before"),
        F.sum("cnt").over(total_w).alias("total"),
    )
    out = None
    for qv in quantiles:
        rank = F.col("total").cast("double") * F.lit(qv)
        in_bin = (rank > F.col("cum_before").cast("double")) & (
            rank <= (F.col("cum_before") + F.col("cnt")).cast("double")
        )
        est = F.lit(lo) + (
            F.col("bin").cast("double")
            + (rank - F.col("cum_before").cast("double")) / F.col("cnt").cast("double")
        ) * F.lit(width)
        row = (
            cum.filter(in_bin)
            .select(
                F.lit(qv).alias("q"),
                F.round(est, round_dp).alias("est"),
            )
            .limit(1)
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# KMV / MinCount distinct-count sketch
# ---------------------------------------------------------------------------


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 m: int = 64, seed: str = "kmv-v1") -> DataFrame:
    """Mergeable distinct-count sketch: ``m`` bucketed minimum hashes per
    group (Flajolet-style MinCount / stochastic-averaged KMV), estimating
    ``n̂ = m² / Σᵢ uᵢ`` where ``uᵢ`` is bucket *i*'s minimum hash mapped
    to (0, 1].

    Unlike ``approx_count_distinct`` (HLL++, whose sketch bytes are
    engine-private), every intermediate here is deterministic md5
    arithmetic, so an independent engine replays the sketch EXACTLY —
    estimation error comes only from the published geometry (σ/n ≈
    1/√m ≈ 12.5% at m=64), never from hashing differences.

    Cross-engine value discipline: the per-bucket minimum is kept as the
    raw 52-bit INTEGER hash (min and Σ over bigints are exact and
    associative — a double Σ would be summation-order-dependent); the
    single double division happens once per group on identical operands.

    Scale: two narrow shuffles — (group, bucket) min with map-side
    combine (state ≤ m rows per group per partition), then the per-group
    Σ.  Sketches MERGE by bucket-wise min, so per-shard/per-day sketches
    roll up with the same aggregate — the continuous-ingest pattern.
    Returns (``*group_cols``, est_distinct, buckets_hit).

    The Σ-estimator needs n ≳ m; for small groups (``buckets_hit < m``)
    the sketch switches to linear counting — ``m·ln(m/empty)`` from the
    bucket-occupancy pattern alone (the HLL small-range correction) —
    which is near-exact down to n ≈ m/2 and keeps the whole range
    usable from one sketch.
    """
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(value_col).cast("string")))
    # chars 1-13 → 52-bit value hash (exact in bigint AND in the final
    # double); chars 14-15 → independent 8-bit bucket index
    u52 = F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")
    bucket = F.pmod(F.conv(F.substring(h, 14, 2), 16, 10).cast("bigint"), F.lit(m))
    mins = (
        df.select(*group_cols, u52.alias("_u"), bucket.alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.min("_u").alias("_umin"))
    )
    two52 = float(1 << 52)
    hit = F.count(F.lit(1))
    raw = F.lit(float(m * m)) / (F.sum("_umin").cast("double") / F.lit(two52))
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(float(m)) - hit.cast("double"))
    )
    return mins.groupBy(*group_cols).agg(
        F.when(hit < m, F.round(linear))
        .otherwise(F.round(raw))
        .cast("bigint")
        .alias("est_distinct"),
        hit.alias("buckets_hit"),
    )


def hll_registers(df: DataFrame, group_cols: list[str], value_col: str,
                  p: int = 8, seed: str = "hll-v1",
                  max_rho: int = 40) -> DataFrame:
    """HyperLogLog register relation: one row per (group, register) with
    the max leading-zero rank — the production-standard distinct-count
    sketch (next to :func:`kmv_distinct`'s MinCount geometry), kept
    engine-replayable: the hash is md5 arithmetic, the register index is
    the low ``p`` bits, and the rank is derived from ``length(bin(w))``
    (integer ops only — no float log2 at bit boundaries).

    Sketches MERGE by register-wise max: per-shard/per-day register
    relations roll up with the same ``max`` aggregate (pinned in tests).
    ``max_rho`` caps the rank (P[rho > 40] ≈ 2⁻⁴⁰) so the estimator's
    register sum stays EXACTLY representable as a bigint — summation
    order can never matter."""
    m = 1 << p
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col(value_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    nbits = 60 - p
    # integer division ONLY: h spans 60 bits, a double `/` would shave the
    # low bits above 2^53 and corrupt both the register index and the rank
    hashed = df.select(*group_cols, h.alias("_h"))
    w = F.expr(f"_h div {m}")
    rho = F.when(
        w > 0, F.lit(nbits) - F.length(F.bin(w)) + 1
    ).otherwise(F.lit(nbits) + 1)
    rho = F.least(rho, F.lit(max_rho)).cast("bigint")
    return (
        hashed.select(
            *group_cols, (F.col("_h") % m).alias("reg"), rho.alias("rho")
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 p: int = 8, seed: str = "hll-v1",
                 round_dp: int = 4) -> DataFrame:
    """HyperLogLog distinct-count estimate per group from
    :func:`hll_registers`: E = α_m·m²/Σ 2^(−rho) over all m registers
    (absent registers contribute 2⁰), with the standard small-range
    linear-counting correction (E ≤ 2.5m and empty registers V > 0 →
    m·ln(m/V)).

    Cross-engine value discipline (the kmv lesson): the register sum is
    computed as Σ 2^(max_rho − rho) in BIGINT — exact and associative —
    plus (m − hit)·2^max_rho for absent registers; the single double
    division and the α constant evaluate once per group on identical
    operands, so both engines produce the identical double before the
    final round.  Returns (*group_cols, est_distinct, registers_hit)."""
    regs = hll_registers(df, group_cols, value_col, p, seed, max_rho=40)
    return hll_estimate(regs, group_cols, p=p, round_dp=round_dp)


# ---------------------------------------------------------------------------
# Count-Min inner product (join-size estimation)
# ---------------------------------------------------------------------------


def count_min_join_size(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """Equi-join cardinality estimate from two Count-Min sketches built
    with the SAME (depth, width, seed): |A ⋈ₖ B| = Σₖ f_A(k)·f_B(k) is
    estimated by min_d Σ_w c_A[d,w]·c_B[d,w] — the classic AMS/CM inner
    product, an upper bound that is exact when no two distinct keys
    collide in some row d.

    This is what a cost-based planner does before picking a join
    strategy at 100 TB: both operands are sketch relations of at most
    depth×width rows (input-size-independent), so the estimate costs an
    inner join of two tiny relations — no scan, no shuffle of the data
    itself.  Returns one row (est_join_size,).

    Buckets absent from either sketch contribute 0 to the product, so an
    inner join on (d, bucket) is exact."""
    prod = (
        sketch_a.withColumnRenamed("cnt", "cnt_a")
        .join(
            sketch_b.withColumnRenamed("cnt", "cnt_b"), ["d", "bucket"]
        )
        .groupBy("d")
        .agg(F.sum(F.col("cnt_a") * F.col("cnt_b")).cast("bigint").alias("_ip"))
    )
    return prod.agg(F.min("_ip").cast("bigint").alias("est_join_size"))


# ---------------------------------------------------------------------------
# KMV set-operation estimates (union / intersection / Jaccard)
# ---------------------------------------------------------------------------


def _kmv_mins(df: DataFrame, value_col: str, m: int, seed: str,
              tag: str) -> DataFrame:
    """Tagged (set_tag, bucket, umin) relation — the mergeable KMV state
    (same 52-bit md5 hash + 8-bit bucket split as :func:`kmv_distinct`)."""
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(value_col).cast("string")))
    u52 = F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint")
    bucket = F.pmod(F.conv(F.substring(h, 14, 2), 16, 10).cast("bigint"), F.lit(m))
    return (
        df.select(u52.alias("_u"), bucket.alias("_b"))
        .groupBy("_b")
        .agg(F.min("_u").alias("_umin"))
        .select(F.lit(tag).alias("set_tag"), "_b", "_umin")
    )


def _kmv_estimate_col(m: int):
    """Estimator over a (bucket → umin) group: MinCount Σ-estimator with
    the linear-counting small-range switch (same constants as
    :func:`kmv_distinct`)."""
    two52 = float(1 << 52)
    hit = F.count(F.lit(1))
    raw = F.lit(float(m * m)) / (F.sum("_umin").cast("double") / F.lit(two52))
    linear = F.lit(float(m)) * F.log(
        F.lit(float(m)) / (F.lit(float(m)) - hit.cast("double"))
    )
    return (
        F.when(hit < m, F.round(linear)).otherwise(F.round(raw)).cast("bigint")
    )


def kmv_set_estimates(df_a: DataFrame, df_b: DataFrame, value_col: str,
                      m: int = 64, seed: str = "kmv-v1") -> DataFrame:
    """Distinct-set algebra from two KMV sketches: estimates |A|, |B|,
    |A ∪ B| (bucket-wise min merge of the two sketches — the defining
    KMV merge property), |A ∩ B| by inclusion–exclusion (clamped at 0),
    and the Jaccard similarity Ĵ = |A∩B| / |A∪B|.

    At 100 TB this answers "how much do two corpora / user populations
    overlap" from two O(m) sketch states that each side maintains
    independently — the sets are never co-shuffled, never joined.  Both
    engines replay identical md5 arithmetic, so the result is
    value-checked, not tolerance-checked.

    Plan: one narrow (bucket, min) agg per input, a bucket-wise min over
    the union of the two sketch relations (sketch-sized, no rescan), and
    a final ≤3-row pivot.  Returns one row
    (est_a, est_b, est_union, est_inter, jaccard_est)."""
    mins_a = _kmv_mins(df_a, value_col, m, seed, "a")
    mins_b = _kmv_mins(df_b, value_col, m, seed, "b")
    # the per-set state feeds both its own estimator and the union merge;
    # it is at most m rows per side — cheap to recompute, but a single
    # union keeps it one pass over each input
    both = mins_a.unionByName(mins_b)
    per_set = both.groupBy("set_tag").agg(_kmv_estimate_col(m).alias("est"))
    union_est = (
        both.groupBy("_b")
        .agg(F.min("_umin").alias("_umin"))
        .agg(_kmv_estimate_col(m).alias("est_union"))
    )
    wide = per_set.groupBy().pivot("set_tag", ["a", "b"]).agg(F.min("est"))
    out = wide.join(union_est)
    inter = F.greatest(
        F.col("a") + F.col("b") - F.col("est_union"), F.lit(0).cast("bigint")
    )
    return out.select(
        F.col("a").alias("est_a"),
        F.col("b").alias("est_b"),
        F.col("est_union").cast("bigint").alias("est_union"),
        inter.cast("bigint").alias("est_inter"),
        F.round(
            inter.cast("double") / F.col("est_union").cast("double"), 4
        ).alias("jaccard_est"),
    )


def hll_estimate(regs: DataFrame, group_cols: list[str], p: int = 8,
                 round_dp: int = 4) -> DataFrame:
    """Estimator over an (already merged) register relation — the body of
    :func:`hll_distinct`, exposed so rolled-up register states (per-shard,
    per-window) estimate WITHOUT recomputing registers from raw data."""
    m = 1 << p
    max_rho = 40
    scale = 1 << max_rho
    alpha = 0.7213 / (1 + 1.079 / m)
    per = regs.groupBy(*group_cols).agg(
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(40 - rho AS INT))")
        ).cast("bigint").alias("_s_hit"),
        F.count(F.lit(1)).cast("bigint").alias("registers_hit"),
    )
    s_total = F.col("_s_hit") + (F.lit(m) - F.col("registers_hit")) * F.lit(scale)
    raw = F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(scale)) / s_total
    v_zero = F.lit(m) - F.col("registers_hit")
    est = F.when(
        (raw <= 2.5 * m) & (v_zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
    ).otherwise(raw)
    return per.select(
        *group_cols,
        F.round(est, round_dp).alias("est_distinct"),
        "registers_hit",
    )


def hll_sliding_distinct(df: DataFrame, hour_col, value_col: str,
                         window_hours: int = 4, p: int = 8,
                         seed: str = "hll-v1",
                         round_dp: int = 4) -> DataFrame:
    """Trailing-window distinct count per hour by register REUSE: hourly
    HLL registers are computed ONCE from the data, then each hourly
    register state is projected into every trailing window it belongs to
    (window_end = hour + 0..W−1 — a pure projection, no self-join, no
    re-scan) and merged register-wise-max per window.  This is the
    continuous-rollup pattern a 100 TB metrics pipeline runs: the raw
    stream is touched once per hour, and every derived window — 4 h here,
    but daily/weekly identically — reduces sketch states, not events.

    ``hour_col``: integer epoch-hour Column.  Output windows are
    restricted to hours present in the data (partial leading windows
    included, trailing phantom hours excluded).
    Returns (window_end_hr, est_distinct, registers_hit)."""
    base = df.select(hour_col.cast("bigint").alias("hr"),
                     F.col(value_col).alias("_v"))
    regs = hll_registers(base, ["hr"], "_v", p=p, seed=seed)
    # register relation: |hours| × ≤ 2^p rows — tiny; checkpoint-free
    contrib = regs.select(
        F.explode(
            F.sequence(F.col("hr"), F.col("hr") + (window_hours - 1))
        ).alias("window_end_hr"),
        "reg",
        "rho",
    )
    merged = contrib.groupBy("window_end_hr", "reg").agg(F.max("rho").alias("rho"))
    hours = regs.select(F.col("hr").alias("window_end_hr")).distinct()
    merged = merged.join(F.broadcast(hours), "window_end_hr", "left_semi")
    return hll_estimate(merged, ["window_end_hr"], p=p, round_dp=round_dp)
