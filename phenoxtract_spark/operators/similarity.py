"""Similarity search over embedding columns (SURVEY §7.2 step 9).

- brute-force cosine top-k: the correctness baseline.  Dot products run
  JVM-side via ``F.aggregate``/``F.zip_with`` (no Python in the hot path);
  top-k per query via window ``row_number``.
- IVF (inverted-file) bucketed variant: assign every vector to its nearest
  of C centroids (a broadcast dimension), then only compare query/candidate
  pairs sharing a centroid — the 100 TB path: the self-join becomes
  |bucket|-bounded.  Probing n>1 centroids trades recall for cost.
- random-hyperplane LSH: sign-bit signature via deterministic
  pseudo-random hyperplanes (md5-derived), bucket join on signature.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    round_dp: int | None = 6,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.
    ``queries`` is small (broadcast); candidates stream map-side, so the only
    shuffle is the per-query top-k aggregation.  Self-matches excluded.
    Returns (query_id, neighbor_id, cos, rank)."""
    # norms are precomputed ONCE per side: cosine() inline would re-run two
    # l2_norm aggregates for every (query, candidate) pair — 3 higher-order
    # aggregates per pair instead of 1.  Numerically identical (same
    # operands, same op order), ~3× less HOF work.
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            l2_norm(F.col(vec_col)).alias("_qn"),
        )
    )
    c = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    )
    raw = dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))
    # rank on the ROUNDED score: makes the top-k boundary deterministic
    # across engines despite summation-order ulp differences
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.round(raw, round_dp) if round_dp is not None else raw).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("bigint").alias("rank"))
    )


def assign_ivf_centroid(vectors: DataFrame, centroids: DataFrame,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        nprobe: int = 1) -> DataFrame:
    """IVF assignment: nearest centroid(s) by cosine (centroids broadcast).
    Returns (id, centroid_id) — one row per probed centroid (``nprobe`` > 1
    emits the top-``nprobe``; standard IVF probing for the query side).
    Centroids can come from any source — here typically a sampled subset of
    the vectors themselves (deterministic)."""
    cen = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).alias("cv"),
            l2_norm(F.col(vec_col)).alias("_cn"),
        )
    )
    v = vectors.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        l2_norm(F.col(vec_col)).alias("_vn"),
    )
    # the assignment is n·|centroids| dot products — CPU-dense per byte,
    # so a small embeddings file packed into 1-2 scan splits serializes
    # the whole n^1.5 term.  Fan out to cluster parallelism when the scan
    # is narrower; at scale inputs arrive with >= parallelism splits and
    # this is a no-op.  (Same guard as casting.castability_stats.)
    from ..session import fan_out

    v = fan_out(v)
    # rounded score → deterministic assignment across engines/runs; norms
    # precomputed per side (1 HOF aggregate per pair, not 3)
    scored = v.crossJoin(cen).select(
        "id",
        "centroid_id",
        F.round(
            dot(F.col("v"), F.col("cv")) / (F.col("_vn") * F.col("_cn")), 6
        ).alias("_cos"),
    )
    w = Window.partitionBy("id").orderBy(F.col("_cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select("id", "centroid_id")
    )


def ivf_topk(vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
             id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10,
             round_dp: int | None = 6, nprobe: int = 1) -> DataFrame:
    """Approximate top-k: compare only pairs sharing a centroid bucket.

    ``nprobe`` probes the query's top-n buckets (neighbors stay in exactly
    one, so no pair is scored twice and no dedup pass is needed): recall
    rises toward brute force at cost ∝ nprobe × bucket size — the standard
    IVF recall/cost dial."""
    assign = assign_ivf_centroid(vectors, centroids, id_col, vec_col)
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        l2_norm(F.col(vec_col)).alias("_cn"),
    ).join(assign.withColumnRenamed("id", "neighbor_id"), "neighbor_id")
    qassign = (
        assign
        if nprobe == 1
        else assign_ivf_centroid(queries, centroids, id_col, vec_col, nprobe=nprobe)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
    ).join(qassign.withColumnRenamed("id", "query_id"), "query_id")
    raw = dot(F.col("qv"), F.col("cv")) / (F.col("_qn") * F.col("_cn"))
    scored = (
        v.join(q, "centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.round(raw, round_dp) if round_dp is not None else raw).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("bigint").alias("rank"))
    )


def plane_components(seed: int, num_planes: int, dim: int) -> list[list[float]]:
    """±1 hyperplane components: component (p, j) = +1 iff the first 8 hex
    chars of md5(f"{seed}|{p}|{j}") are even.  Reproducible in any engine
    (the SQL oracle derives the identical planes from md5)."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{seed}|{p}|{j}".encode()).hexdigest()[:8], 16) % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for p in range(num_planes)
    ]


def hyperplane_signature(vectors: DataFrame, dim: int, num_planes: int = 16,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         seed: int = 42, round_dp: int = 6) -> DataFrame:
    """Random-hyperplane LSH signature.  Signature bit p = sign of the
    vector's dot product with deterministic plane p (see
    :func:`plane_components`).  Returns (id, sig bigint).

    Scale notes: ``dim`` is a parameter (it's schema knowledge — no
    ``.first()`` driver probe), and the P×dim plane matrix rides in ONE
    broadcast single-row relation instead of P×dim plan literals, so the
    plan stays O(1) regardless of dimension.  The dot is rounded before the
    sign test so the bit is stable under summation-order ulp differences
    across engines (same discipline as every cosine in this module)."""
    spark = vectors.sparkSession
    planes = plane_components(seed, num_planes, dim)
    planes_df = F.broadcast(
        spark.createDataFrame([(planes,)], "planes array<array<double>>")
    )
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))

    def _plane_dot(pl: Column) -> Column:
        return F.aggregate(
            F.zip_with(F.col("v"), pl, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    # two-arg transform lambda receives (element, index): index = plane p
    contribs = F.transform(
        F.col("planes"),
        lambda pl, p: F.when(
            F.round(_plane_dot(pl), round_dp) > 0,
            F.pow(F.lit(2.0), p).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")),
    )
    sig = F.aggregate(contribs, F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    return v.crossJoin(planes_df).select("id", sig.alias("sig"))


def hyperplane_candidate_pairs(vectors: DataFrame, dim: int, num_planes: int = 16,
                               rows_per_band: int = 4, id_col: str = "vec_id",
                               vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """LSH candidate pairs: band the signature into ``num_planes /
    rows_per_band`` bands of ``rows_per_band`` sign bits; candidates = pairs
    agreeing on ALL bits of ≥1 band.  The self-join key is (band, band
    bits), so pairs only ever meet inside a bucket — never all-pairs.
    Returns distinct (id_a, id_b), id_a < id_b."""
    from .dedup import banded_pairs

    # (id, sig) is narrow but its subtree is the plane-projection pass;
    # banded_pairs consumes it on both join sides — materialize once
    sig = hyperplane_signature(vectors, dim, num_planes, id_col, vec_col, seed).localCheckpoint(
        eager=True
    )
    return banded_pairs(sig, bits=num_planes, band_width=rows_per_band,
                        id_col="id", fp_col="sig")


def ivf_neardup_pairs(vectors: DataFrame, centroids: DataFrame,
                      threshold: float = 0.4, id_col: str = "vec_id",
                      vec_col: str = "embedding", round_dp: int = 6) -> DataFrame:
    """Near-duplicate pairs via IVF buckets: assign every vector to its
    nearest centroid (broadcast dim), generate pairs ONLY within a bucket,
    then cosine-verify.  Σ|bucket|² work instead of |corpus|²; with C
    centroids ∝ corpus size the cost is linear in the corpus.  Approximate:
    a near-dup pair straddling two buckets is missed (near-identical
    vectors share a nearest centroid with high probability — the recall
    gate in tests measures this against brute force).
    Returns (id_a, id_b, cos)."""
    # the assignment subtree is the n·√C dot-product pass — and it feeds
    # BOTH sides of the bucket self-join.  Materialize its (id, centroid)
    # output once (two narrow columns) so the expensive pass can never
    # re-execute when AQE breaks exchange reuse.
    assign = assign_ivf_centroid(vectors, centroids, id_col, vec_col).localCheckpoint(
        eager=True
    )
    a = assign.select(F.col("id").alias("id_a"), "centroid_id")
    b = assign.select(F.col("id").alias("id_b"), "centroid_id")
    pairs = a.join(b, "centroid_id").filter(F.col("id_a") < F.col("id_b"))
    # norms once per side, not per pair (see brute_force_topk)
    va = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        l2_norm(F.col(vec_col)).alias("_na"),
    )
    vb = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        l2_norm(F.col(vec_col)).alias("_nb"),
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.col("_na") * F.col("_nb")), round_dp
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Per-vector int8-style scale quantization (the storage layout an ANN
    index serves from): min/max → 0..255 codes → reconstruction-error
    report.  Pure expression projection, zero shuffles; a 100 TB corpus
    quantizes in one map pass and shrinks 4× before any index build.
    Returns (id, q_min, q_max, q_sum, recon_mse) — the code sum and MSE
    pin the exact quantized content without shipping the codes."""
    d = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("e"),
    )
    d = d.select(
        "id", "e",
        F.array_min("e").alias("mn"),
        F.array_max("e").alias("mx"),
    ).withColumn(
        "sc",
        F.when(F.col("mx") > F.col("mn"), (F.col("mx") - F.col("mn")) / 255.0),
    )
    d = d.withColumn(
        "q",
        F.when(
            F.col("sc").isNull(),
            F.expr("transform(e, x -> cast(0 as bigint))"),
        ).otherwise(
            F.expr("transform(e, x -> cast(round((x - mn) / sc) as bigint))")
        ),
    )
    mse = F.when(F.col("sc").isNull(), F.lit(0.0)).otherwise(
        F.expr(
            "aggregate(zip_with(e, q, (x, qi) -> pow(x - (mn + qi * sc), 2)),"
            " cast(0 as double), (a, x) -> a + x)"
        )
        / F.size("e")
    )
    return d.select(
        F.col("id"),
        F.round("mn", 6).alias("q_min"),
        F.round("mx", 6).alias("q_max"),
        F.expr("aggregate(q, cast(0 as bigint), (a, x) -> a + x)").alias("q_sum"),
        F.round(mse, 8).alias("recon_mse"),
    )


def ring_negatives(df: DataFrame, id_col: str = "vec_id",
                   label_col: str = "label", k: int = 4,
                   shards: int = 16, seed: str = "neg-v1") -> DataFrame:
    """Deterministic negative sampling for contrastive training: order each
    md5 shard's vectors on a hash ring and pair every anchor with its next
    ``k`` ring neighbors.  Hash order is label-independent, so neighbors
    are uniform pseudo-random negatives — reproducible across engines,
    runs, and cluster layouts (unlike ``rand()`` sampling).  Same-label
    collisions are flagged, not silently dropped, so the trainer decides.
    Returns (anchor_id, neg_rank, neg_id, same_label).

    Scale: rings are per-shard (pack_sequences-style), so the only window
    sort is within a shard — no global ordering — and the neighbor lookup
    is an equi-join on (shard, position).  Cost is one shuffle + k rows
    per anchor.

    Wrap behavior: on a shard with ``cnt <= k`` members the ring wraps, so
    an anchor's k negatives can repeat the same neg_id at different
    neg_rank, and a singleton shard yields ZERO negatives for its anchor
    (the only ring neighbor is itself, which is excluded).  The DuckDB
    oracle wraps identically, so parity holds — but consumers needing k
    DISTINCT negatives per anchor must deduplicate on (anchor_id, neg_id)
    or size ``shards`` so every shard comfortably exceeds k+1 members."""
    from pyspark.sql.window import Window

    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).alias("lbl"),
        F.pmod(
            F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(shards)
        ).alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy("_h", "id")
    wn = Window.partitionBy("shard")
    ranked = base.select(
        "id", "lbl", "shard",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("cnt"),
    ).localCheckpoint(eager=True)  # feeds both join sides
    anchors = ranked.select(
        F.col("id").alias("anchor_id"),
        F.col("lbl").alias("alabel"),
        "shard", "pos", "cnt",
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_rank"),
    ).withColumn("npos", (F.col("pos") - 1 + F.col("neg_rank")) % F.col("cnt") + 1)
    negs = ranked.select(
        F.col("shard").alias("nshard"), F.col("pos").alias("npos2"),
        F.col("id").alias("neg_id"), F.col("lbl").alias("nlabel"),
    )
    return (
        anchors.join(
            negs,
            (F.col("shard") == F.col("nshard")) & (F.col("npos") == F.col("npos2")),
        )
        .filter(F.col("neg_id") != F.col("anchor_id"))  # singleton-shard wrap
        .select(
            "anchor_id", "neg_rank", "neg_id",
            F.col("alabel").eqNullSafe(F.col("nlabel")).alias("same_label"),
        )
    )
