"""Mining / modeling queries (round 8): record linkage, domain-mixture
reweighting, readability, Holt trend forecasting, exact correlations,
embedding outliers, and link prediction.

Each query follows the repo's determinism discipline — DECIMAL(28,12)
accumulation for cross-row double sums (the PageRank recipe), dyadic
coefficients for folds, blocked/bucketed self-joins with explicit
quadratic valves — so every DuckDB oracle compares bit-identically and
every plan's cost is Σ|bucket|²-bounded, never |table|².
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import behavior, curation, linkage, textanalysis
from .queries_core import q, read_table
from .queries_scale import _NORM, _votes_sql

# ---------------------------------------------------------------------------
# entity resolution over structured records
# ---------------------------------------------------------------------------

_ER_PAIRS_SQL = """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a
    JOIN part b ON a.p_brand = b.p_brand AND a.p_size = b.p_size
              AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@q("er_fuzzy_part_pairs", _ER_PAIRS_SQL)
def er_fuzzy_part_pairs(spark, sf_dir):
    """Record-linkage compare stage (operators/linkage.py): parts
    blocked on (brand, size), Levenshtein ≤ 3 on the name — identical
    unit-cost edit distance on both engines, JVM codegen on Spark.  The
    self-join only meets inside a block (Σ|block|², blocks ≤ 7 rows at
    test scale) and the operator's max_block valve raises on a
    degenerate key instead of detonating quadratically."""
    p = read_table(spark, sf_dir, "part")
    return linkage.blocked_fuzzy_pairs(
        p, "p_partkey", "p_name", ["p_brand", "p_size"], max_dist=3
    )


@q(
    "er_fuzzy_part_clusters",
    f"""
    WITH pairs AS ({_ER_PAIRS_SQL}),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      WITH RECURSIVE r(a, b) AS (
        SELECT p_partkey, p_partkey FROM part
        UNION
        SELECT r.a, s.dst FROM r JOIN sym s ON r.b = s.src
      )
      SELECT * FROM r
    ),
    canon AS (SELECT a AS id, min(b) AS canonical_id FROM reach GROUP BY a),
    csize AS (SELECT canonical_id, CAST(count(*) AS BIGINT) AS cluster_size
              FROM canon GROUP BY 1)
    SELECT c.id, c.canonical_id, s.cluster_size
    FROM canon c JOIN csize s USING (canonical_id)
    """,
)
def er_fuzzy_part_clusters(spark, sf_dir):
    """Record-linkage cluster stage: transitive closure of the fuzzy
    match relation via min-label propagation
    (operators/dedup.py:connected_components — bounded rounds, scalar
    convergence check), so chained matches A~B~C canonicalize together
    even when A and C never compared.  Total assignment: singletons
    keep themselves with cluster_size 1."""
    p = read_table(spark, sf_dir, "part")
    pairs = linkage.blocked_fuzzy_pairs(
        p, "p_partkey", "p_name", ["p_brand", "p_size"], max_dist=3
    ).select("id_a", "id_b")
    return linkage.er_clusters(p, "p_partkey", pairs)


# ---------------------------------------------------------------------------
# DoReMi-style domain mixture reweighting
# ---------------------------------------------------------------------------

_QUALITY_CTE = f"""
    m AS (
      SELECT doc_id, source,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS n_alpha,
             CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter(string_split({_NORM}, ' '), t -> t != '')) AS DOUBLE) AS n_tok,
             CAST({_votes_sql('en')} AS DOUBLE) AS en_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             round(0.3 * least(n_chars / 500.0, 1.0)
                 + 0.3 * (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END)
                 + 0.2 * (CASE WHEN n_tok > 0
                               THEN least(en_stop / (n_tok * 0.1 + 1e-9), 1.0) ELSE 0.0 END)
                 + 0.2 * (CASE WHEN n_chars > 0
                               THEN 1.0 - least(n_punct / n_chars * 5, 1.0) ELSE 0.0 END), 6)
             AS quality
      FROM m
    )
"""

_MW_ROUND = """
    l{t} AS (SELECT CAST(sum(CAST(round(weight * domain_loss, 9)
                                  AS DECIMAL(28,12))) AS DOUBLE) AS lbar
             FROM w{p}),
    r{t} AS (SELECT domain, n_docs, domain_loss,
                    round(weight * (CAST(1.0 AS DOUBLE)
                          + CAST(0.5 AS DOUBLE) * (domain_loss - lbar)), 9) AS raw
             FROM w{p}, l{t}),
    t{t} AS (SELECT CAST(sum(CAST(raw AS DECIMAL(28,12))) AS DOUBLE) AS tot
             FROM r{t}),
    w{t} AS (SELECT domain, n_docs, domain_loss, round(raw / tot, 9) AS weight
             FROM r{t}, t{t})"""


@q(
    "curation_domain_mixture",
    f"""
    WITH {_QUALITY_CTE},
    dom AS (
      SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs,
             round(CAST(1.0 AS DOUBLE)
                   - CAST(sum(CAST(round(quality, 9) AS DECIMAL(28,12)))
                          AS DOUBLE) / count(*), 9) AS domain_loss
      FROM scored GROUP BY source
    ),
    kk AS (SELECT count(*) AS k FROM dom),
    w0 AS (SELECT domain, n_docs, domain_loss,
                  round(CAST(1.0 AS DOUBLE) / k, 9) AS weight
           FROM dom, kk),
    {_MW_ROUND.format(t=1, p=0)},
    {_MW_ROUND.format(t=2, p=1)},
    {_MW_ROUND.format(t=3, p=2)}
    SELECT domain, n_docs, domain_loss, weight FROM w3
    """,
)
def curation_domain_mixture(spark, sf_dir):
    """DoReMi-style mixture reweighting
    (operators/curation.py:domain_mixture_weights): three fixed
    multiplicative-weights rounds over per-source excess loss
    (1 − quality), the rational update w·(1+η·(L_d−L̄)) replacing exp()
    so both engines replay the trajectory exactly.  One corpus pass +
    K-row iterations; all cross-row sums DECIMAL(28,12)-accumulated.
    The oracle unrolls all three rounds CTE by CTE."""
    d = read_table(spark, sf_dir, "documents")
    return curation.domain_mixture_weights(
        d, "source", textanalysis.quality_score("text"), rounds=3, eta=0.5
    )


# ---------------------------------------------------------------------------
# readability
# ---------------------------------------------------------------------------


@q(
    "text_readability",
    f"""
    WITH c AS (
      SELECT doc_id,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS n_sentences,
             CAST(len(list_filter(string_split({_NORM}, ' '), x -> x != ''))
                  AS BIGINT) AS n_words,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                  AS BIGINT) AS n_syllables
      FROM documents
    )
    SELECT doc_id, n_sentences, n_words, n_syllables,
           CASE WHEN n_words > 0 THEN
             round(CAST(0.39 AS DOUBLE) * n_words / n_sentences
                 + CAST(11.8 AS DOUBLE) * n_syllables / n_words
                 - CAST(15.59 AS DOUBLE), 4)
           END AS fk_grade
    FROM c
    """,
)
def text_readability(spark, sf_dir):
    """Flesch-Kincaid readability per document
    (operators/textanalysis.py:readability_scores): vowel-group
    syllable proxy, [.!?]+ sentence runs floored at 1 — three compiled
    regex scans per row, integer counts, one final rounded double.  A
    curation signal orthogonal to the quality score (an all-stopword
    doc scores high quality but ~0 grade)."""
    d = read_table(spark, sf_dir, "documents")
    return textanalysis.readability_scores(d, "doc_id", "text").select(
        F.col("id").alias("doc_id"),
        "n_sentences", "n_words", "n_syllables", "fk_grade",
    )


# ---------------------------------------------------------------------------
# Holt linear trend forecast
# ---------------------------------------------------------------------------


@q(
    "analytics_holt_linear",
    """
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(count(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    ord AS MATERIALIZED (
      SELECT event_type, x,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
                  AS BIGINT) AS i
      FROM daily
    ),
    rec AS MATERIALIZED (
      -- fold replayed as a recursive CTE: DuckDB's struct-state
      -- list_reduce evaluates result fields SEQUENTIALLY over an
      -- in-place accumulator (field 2 sees field 1's NEW value), so a
      -- two-field recurrence cannot use it; the recursion has
      -- well-defined simultaneous-assignment semantics
      WITH RECURSIVE r(event_type, i, level, trend) AS (
        SELECT event_type, i, x, CAST(0.0 AS DOUBLE)
        FROM ord WHERE i = 1
        UNION ALL
        SELECT r.event_type, r.i + 1,
               CAST(0.5 AS DOUBLE) * o.x + CAST(0.5 AS DOUBLE) * r.level
                 + CAST(0.5 AS DOUBLE) * r.trend,
               CAST(0.25 AS DOUBLE) * o.x - CAST(0.25 AS DOUBLE) * r.level
                 + CAST(0.75 AS DOUBLE) * r.trend
        FROM r JOIN ord o ON o.event_type = r.event_type AND o.i = r.i + 1
      )
      SELECT * FROM r
    ),
    fin AS (SELECT event_type, max(i) AS n FROM rec GROUP BY 1)
    SELECT r.event_type, CAST(fin.n AS BIGINT) AS n_periods,
           round(r.level, 6) AS level,
           round(r.trend, 6) AS trend,
           round(r.level + r.trend, 6) AS forecast_next
    FROM rec r JOIN fin ON fin.event_type = r.event_type AND r.i = fin.n
    """,
)
def analytics_holt_linear(spark, sf_dir):
    """Holt's linear smoothing over daily event counts per type
    (operators/behavior.py:holt_linear_forecast): level+trend fold with
    dyadic α = β = 0.5, so every update is an exact binary average and
    the fold is bit-identical to DuckDB's list_reduce — no rounding
    grid needed.  Aggregate-first (one element per day, not per event),
    then a codegen'd sequential fold per key."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    return behavior.holt_linear_forecast(
        daily, "event_type", "day", "x", alpha=0.5, beta=0.5
    )


# ---------------------------------------------------------------------------
# exact Pearson correlation
# ---------------------------------------------------------------------------


@q(
    "profiling_numeric_correlation",
    """
    WITH sc AS (
      SELECT CAST(round(l_quantity * 100) AS BIGINT) AS xq,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS xp,
             CAST(round(l_discount * 100) AS BIGINT) AS xd
      FROM lineitem
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(xq) AS DOUBLE) AS sq, CAST(sum(xp) AS DOUBLE) AS sp,
             CAST(sum(xd) AS DOUBLE) AS sd,
             CAST(sum(xq * xq) AS DOUBLE) AS sqq,
             CAST(sum(xp * xp) AS DOUBLE) AS spp,
             CAST(sum(xd * xd) AS DOUBLE) AS sdd,
             CAST(sum(xq * xp) AS DOUBLE) AS sqp,
             CAST(sum(xq * xd) AS DOUBLE) AS sqd,
             CAST(sum(xp * xd) AS DOUBLE) AS spd
      FROM sc
    )
    SELECT 'quantity~extendedprice' AS pair, CAST(n AS BIGINT) AS n_rows,
           round((n * sqp - sq * sp)
                 / sqrt((n * sqq - sq * sq) * (n * spp - sp * sp)), 6) AS r
    FROM s
    UNION ALL
    SELECT 'quantity~discount', CAST(n AS BIGINT),
           round((n * sqd - sq * sd)
                 / sqrt((n * sqq - sq * sq) * (n * sdd - sd * sd)), 6)
    FROM s
    UNION ALL
    SELECT 'extendedprice~discount', CAST(n AS BIGINT),
           round((n * spd - sp * sd)
                 / sqrt((n * spp - sp * sp) * (n * sdd - sd * sd)), 6)
    FROM s
    """,
)
def profiling_numeric_correlation(spark, sf_dir):
    """Exact Pearson correlation between lineitem measures, computed
    from INTEGER-EXACT sufficient statistics: 2-dp values scale to
    cent-integers, all sums/products accumulate exactly (DECIMAL(38,0)
    on Spark, HUGEINT on DuckDB — associative, order-independent), and
    only the final r is a double expression — so the result is
    bit-stable under any partitioning, unlike corr() on raw doubles.
    One scan, one aggregate, three report rows."""
    li = read_table(spark, sf_dir, "lineitem")
    sc = li.select(
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("xq"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("xp"),
        F.round(F.col("l_discount") * 100).cast("bigint").alias("xd"),
    )
    dec = "decimal(38,0)"
    s = sc.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("xq").cast(dec)).cast("double").alias("sq"),
        F.sum(F.col("xp").cast(dec)).cast("double").alias("sp"),
        F.sum(F.col("xd").cast(dec)).cast("double").alias("sd"),
        F.sum((F.col("xq") * F.col("xq")).cast(dec)).cast("double").alias("sqq"),
        F.sum((F.col("xp") * F.col("xp")).cast(dec)).cast("double").alias("spp"),
        F.sum((F.col("xd") * F.col("xd")).cast(dec)).cast("double").alias("sdd"),
        F.sum((F.col("xq") * F.col("xp")).cast(dec)).cast("double").alias("sqp"),
        F.sum((F.col("xq") * F.col("xd")).cast(dec)).cast("double").alias("sqd"),
        F.sum((F.col("xp") * F.col("xd")).cast(dec)).cast("double").alias("spd"),
    )

    def r_row(label, sxy, sx, sy, sxx, syy):
        n = F.col("n")
        return s.select(
            F.lit(label).alias("pair"),
            n.cast("bigint").alias("n_rows"),
            F.round(
                (n * F.col(sxy) - F.col(sx) * F.col(sy))
                / F.sqrt(
                    (n * F.col(sxx) - F.col(sx) * F.col(sx))
                    * (n * F.col(syy) - F.col(sy) * F.col(sy))
                ),
                6,
            ).alias("r"),
        )

    return (
        r_row("quantity~extendedprice", "sqp", "sq", "sp", "sqq", "spp")
        .unionByName(r_row("quantity~discount", "sqd", "sq", "sd", "sqq", "sdd"))
        .unionByName(r_row("extendedprice~discount", "spd", "sp", "sd", "spp", "sdd"))
    )


# ---------------------------------------------------------------------------
# embedding centroid outliers
# ---------------------------------------------------------------------------


@q(
    "embedding_centroid_outliers",
    """
    WITH idx AS (SELECT unnest(generate_series(1, 64)) AS i),
    vx AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
           FROM embeddings, idx),
    cent AS (
      SELECT i, round(CAST(sum(CAST(round(x, 9) AS DECIMAL(28,12)))
                           AS DOUBLE) / count(*), 9) AS c
      FROM vx GROUP BY i
    ),
    d2 AS (
      SELECT vec_id,
             round(CAST(sum(CAST(round((x - c) * (x - c), 9)
                                 AS DECIMAL(28,12))) AS DOUBLE), 6) AS dist2
      FROM vx JOIN cent USING (i) GROUP BY vec_id
    ),
    st AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(CAST(dist2 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
             CAST(sum(CAST(round(dist2 * dist2, 9) AS DECIMAL(28,12)))
                  AS DOUBLE) AS s2
      FROM d2
    )
    SELECT vec_id, dist2,
           round((dist2 - s1 / n)
                 / sqrt(greatest(s2 / n - (s1 / n) * (s1 / n),
                                 CAST(1e-18 AS DOUBLE))), 4) AS z,
           (dist2 - s1 / n)
             > 2.0 * sqrt(greatest(s2 / n - (s1 / n) * (s1 / n),
                                   CAST(1e-18 AS DOUBLE))) AS is_outlier
    FROM d2, st
    """,
)
def embedding_centroid_outliers(spark, sf_dir):
    """Embedding-space outlier screen: squared distance to the global
    centroid, z-scored over the corpus — the cheap first-pass filter
    for mislabeled/degenerate vectors before ANN indexing or semantic
    dedup.  Every cross-row double sum (per-dim centroid, per-vector
    distance, corpus moments) uses the DECIMAL(28,12) recipe so the
    flags are partition-order-independent.  Plan: one posexplode, one
    64-key groupBy, one broadcast join back, one per-vector groupBy,
    one 1-row moment aggregate — all shuffles on bounded keys except
    the per-vector one, which is the data's own key."""
    e = read_table(spark, sf_dir, "embeddings")
    vx = e.select(
        "vec_id", F.posexplode("embedding").alias("i", "xf")
    ).select("vec_id", "i", F.col("xf").cast("double").alias("x"))
    cent = vx.groupBy("i").agg(
        F.round(
            F.sum(F.round(F.col("x"), 9).cast("decimal(28,12)"))
            .cast("double") / F.count(F.lit(1)),
            9,
        ).alias("c")
    )
    d2 = (
        vx.join(F.broadcast(cent), "i")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(
                    F.round((F.col("x") - F.col("c"))
                            * (F.col("x") - F.col("c")), 9)
                    .cast("decimal(28,12)")
                ).cast("double"),
                6,
            ).alias("dist2")
        )
    )
    st = d2.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("dist2").cast("decimal(28,12)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("dist2") * F.col("dist2"), 9)
              .cast("decimal(28,12)")).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    sig = F.sqrt(
        F.greatest(F.col("s2") / F.col("n") - mu * mu, F.lit(1e-18))
    )
    return d2.crossJoin(F.broadcast(st)).select(
        "vec_id", "dist2",
        F.round((F.col("dist2") - mu) / sig, 4).alias("z"),
        ((F.col("dist2") - mu) > F.lit(2.0) * sig).alias("is_outlier"),
    )


# ---------------------------------------------------------------------------
# link prediction on the similarity graph
# ---------------------------------------------------------------------------


@q(
    "graph_resource_allocation",
    """
    WITH cand AS (
      SELECT c_custkey AS id_a, c_custkey + 1 AS id_b FROM customer
      WHERE (c_custkey - 1) % 10 < 9
      UNION ALL
      SELECT c_custkey, c_custkey + 9 FROM customer
      WHERE (c_custkey - 1) % 10 = 0
        AND ('0x' || substr(md5('onion-v1|'
              || CAST((c_custkey - 1) // 10 AS VARCHAR)), 1, 8))::BIGINT % 3 = 0
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM cand
      UNION ALL SELECT id_b, id_a FROM cand
    ),
    deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
            FROM sym GROUP BY src),
    wedge AS (
      SELECT e1.src AS id_a, e2.dst AS id_b, e1.dst AS z
      FROM sym e1 JOIN sym e2 ON e1.dst = e2.src
      WHERE e1.src < e2.dst
    ),
    scored AS (
      SELECT w.id_a, w.id_b,
             CAST(count(*) AS BIGINT) AS n_common,
             round(CAST(sum(CAST(round(CAST(1.0 AS DOUBLE) / d.deg, 9)
                                 AS DECIMAL(28,12))) AS DOUBLE), 6) AS ra_score
      FROM wedge w JOIN deg d ON d.id = w.z
      GROUP BY w.id_a, w.id_b
    )
    SELECT s.id_a, s.id_b, s.n_common, s.ra_score
    FROM scored s
    LEFT JOIN cand c ON c.id_a = s.id_a AND c.id_b = s.id_b
    WHERE c.id_a IS NULL
    """,
)
def graph_resource_allocation(spark, sf_dir):
    """Resource-allocation link prediction (Zhou et al. 2009): for each
    NON-adjacent pair with common neighbors, RA = Σ_z 1/deg(z) — pure
    rational arithmetic (no logs, unlike Adamic-Adar, so no cross-engine
    libm risk), DECIMAL-accumulated.  The wedge join is the triangle-
    count pattern: Σ degree² over the graph; predicted links are wedges
    minus existing edges (one anti-join).  Runs on the deterministic
    chain-and-chord customer graph (the graph_onion_layers fixture) —
    the LSH near-dup graph is all 2-cliques at test scale, which would
    make the report vacuously empty."""
    c = read_table(spark, sf_dir, "customer")
    pos = (F.col("c_custkey") - 1) % 10
    block = ((F.col("c_custkey") - 1) / 10).cast("bigint")
    bsel = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.lit("onion-v1"),
                                             block.cast("string"))), 1, 8),
               16, 10).cast("bigint") % 3
    )
    chain = c.filter(pos < 9).select(
        F.col("c_custkey").alias("id_a"),
        (F.col("c_custkey") + 1).alias("id_b"),
    )
    chords = c.filter((pos == 0) & (bsel == 0)).select(
        F.col("c_custkey").alias("id_a"),
        (F.col("c_custkey") + 9).alias("id_b"),
    )
    cand = chain.unionByName(chords).localCheckpoint(
        eager=True
    )  # feeds sym twice + the anti-join
    sym = cand.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")) \
        .unionByName(cand.select(F.col("id_b").alias("src"),
                                 F.col("id_a").alias("dst")))
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    e1 = sym.select(F.col("src").alias("id_a"), F.col("dst").alias("z"))
    e2 = sym.select(F.col("src").alias("z"), F.col("dst").alias("id_b"))
    wedge = e1.join(e2, "z").filter(F.col("id_a") < F.col("id_b"))
    scored = (
        wedge.join(deg.withColumnRenamed("id", "z"), "z")
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            F.round(
                F.sum(
                    F.round(F.lit(1.0) / F.col("deg"), 9)
                    .cast("decimal(28,12)")
                ).cast("double"),
                6,
            ).alias("ra_score"),
        )
    )
    return scored.join(cand, ["id_a", "id_b"], "left_anti").select(
        "id_a", "id_b", "n_common", "ra_score"
    )
