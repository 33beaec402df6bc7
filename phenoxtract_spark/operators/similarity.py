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
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    raw = cosine(F.col("qv"), F.col("cv"))
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
                        id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF assignment: nearest centroid by cosine (centroids broadcast).
    Returns (id, centroid_id).  Centroids can come from any source — here
    typically a sampled subset of the vectors themselves (deterministic)."""
    cen = F.broadcast(
        centroids.select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"))
    )
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    # rounded score → deterministic assignment across engines/runs
    scored = v.crossJoin(cen).select(
        "id", "centroid_id", F.round(cosine(F.col("v"), F.col("cv")), 6).alias("_cos")
    )
    w = Window.partitionBy("id").orderBy(F.col("_cos").desc(), F.col("centroid_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "centroid_id")
    )


def ivf_topk(vectors: DataFrame, queries: DataFrame, centroids: DataFrame,
             id_col: str = "vec_id", vec_col: str = "embedding", k: int = 10,
             round_dp: int | None = 6) -> DataFrame:
    """Approximate top-k: compare only pairs sharing a centroid bucket."""
    assign = assign_ivf_centroid(vectors, centroids, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")).join(
        assign.withColumnRenamed("id", "neighbor_id"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")).join(
        assign.withColumnRenamed("id", "query_id"), "query_id"
    )
    raw = cosine(F.col("qv"), F.col("cv"))
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


def hyperplane_signature(vectors: DataFrame, num_planes: int = 16,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         seed: int = 42) -> DataFrame:
    """Random-hyperplane LSH signature.  Plane p's component j is a
    deterministic pseudo-random ±1 derived from md5(seed|p|j) — reproducible
    across engines and runs without RNG state.  Signature = bigint of sign
    bits.  Returns (id, sig)."""
    dim_probe = vectors.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    planes = []
    import hashlib

    for p in range(num_planes):
        comps = []
        for j in range(dim_probe):
            h = hashlib.md5(f"{seed}|{p}|{j}".encode()).hexdigest()
            comps.append(1.0 if int(h[:8], 16) % 2 == 0 else -1.0)
        planes.append(comps)
    v = vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    sig = F.lit(0).cast("bigint")
    for p, comps in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in comps])
        d = dot(F.col("v"), plane)
        sig = sig + F.when(d > 0, F.shiftleft(F.lit(1), p).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return v.select("id", sig.alias("sig"))
