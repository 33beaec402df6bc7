"""Spatial operators — the grid-bucketed radius join (the standard
re-expression of a spatial join on an engine without an R-tree: bucket
points into lat/lon grid cells, probe each query point's 3×3 cell
neighborhood, verify with exact haversine).  The same
bucket-then-verify shape as the LSH/IVF families, so the join is
Σ|cell|²-bounded, never all-pairs.

Recall contract (stated, not hidden): the 3×3 neighborhood of a
``cell_deg``-sized grid guarantees every pair within ``radius_km`` is
found when the radius fits one cell in BOTH axes — ~111·cell_deg km of
latitude always, but longitude width shrinks by cos(lat), so near the
poles a fixed grid under-covers east–west.  Production systems use
latitude-adaptive cells (geohash/S2/H3); the operators here take the
fixed grid and the caller bounds the latitude band (the registered
query synthesizes |lat| ≤ 60°, where 1° of longitude ≥ 55.5 km).

Determinism: all arithmetic is plain float expressions (radians /
sin / cos / asin), rounded before the radius filter so the boundary is
stable across engines — the usual ~0-probability libm-ulp argument.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column,
                 round_dp: int = 3) -> Column:
    """Great-circle distance in km, rounded for cross-engine stability."""
    dphi = F.radians(lat2 - lat1) / 2
    dlam = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dphi) * F.sin(dphi)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2))
        * F.sin(dlam) * F.sin(dlam)
    )
    return F.round(2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a)), round_dp)


def grid_radius_join(points: DataFrame, queries: DataFrame,
                     radius_km: float = 100.0, cell_deg: float = 1.0,
                     id_col: str = "id", lat_col: str = "lat",
                     lon_col: str = "lon") -> DataFrame:
    """All (query, point) pairs within ``radius_km``: points land in
    their grid cell; each query probes its 3×3 neighborhood (explode of
    a 9-element literal array — no shuffle to build it); the exact
    haversine verifies.  Returns (query_id, point_id, dist_km).

    Scale shape: one equi-join on (cell_lat, cell_lon) — candidate
    volume Σ|cell|·|neighborhood| — plus a narrow verify; the classic
    bucket-then-verify discipline.  Self-pairs (same id) are kept out
    by the caller's id spaces or a post-filter, not assumed here."""
    p = points.select(
        F.col(id_col).alias("point_id"),
        F.col(lat_col).alias("p_lat"),
        F.col(lon_col).alias("p_lon"),
        F.floor(F.col(lat_col) / cell_deg).cast("bigint").alias("cell_lat"),
        F.floor(F.col(lon_col) / cell_deg).cast("bigint").alias("cell_lon"),
    )
    neigh = F.explode(
        F.array(*[F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
                  for i in (-1, 0, 1) for j in (-1, 0, 1)])
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(lat_col).alias("q_lat"),
        F.col(lon_col).alias("q_lon"),
        F.floor(F.col(lat_col) / cell_deg).cast("bigint").alias("_qcl"),
        F.floor(F.col(lon_col) / cell_deg).cast("bigint").alias("_qcn"),
    ).select(
        "query_id", "q_lat", "q_lon", neigh.alias("_n"), "_qcl", "_qcn"
    ).select(
        "query_id", "q_lat", "q_lon",
        (F.col("_qcl") + F.col("_n.di")).alias("cell_lat"),
        (F.col("_qcn") + F.col("_n.dj")).alias("cell_lon"),
    )
    cand = q.join(p, ["cell_lat", "cell_lon"])
    dist = haversine_km(
        F.col("q_lat"), F.col("q_lon"), F.col("p_lat"), F.col("p_lon")
    )
    return (
        cand.select("query_id", "point_id", dist.alias("dist_km"))
        .filter(F.col("dist_km") <= radius_km)
    )


def synthetic_coords(df: DataFrame, id_col: str, seed: str = "geo-v1",
                     lat_band: float = 60.0) -> DataFrame:
    """Deterministic md5-derived coordinates for the synthetic tables:
    lat uniform in ±``lat_band`` (poles excluded — see the module
    docstring's recall contract), lon uniform in ±180.  4-decimal
    fixed-point so both engines materialize identical doubles."""
    def u(tag: str, mod: int) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("|", F.lit(f"{seed}-{tag}"),
                                      F.col(id_col).cast("string"))),
                    1, 12,
                ),
                16, 10,
            ).cast("bigint") % mod
        )

    lat_span = int(2 * lat_band * 10000)
    return df.select(
        F.col(id_col).alias("id"),
        (u("lat", lat_span) / 10000.0 - lat_band).alias("lat"),
        (u("lon", 3600000) / 10000.0 - 180.0).alias("lon"),
    )


def grid_knn(points: DataFrame, queries: DataFrame, k: int = 1,
             radius_km: float = 200.0, cell_deg: float = 4.0,
             id_col: str = "id", lat_col: str = "lat",
             lon_col: str = "lon") -> DataFrame:
    """k nearest points per query WITHIN the grid-probe radius: the
    radius join bounds the candidates, a per-query window ranks them by
    (dist, point_id).  Queries with no candidate in the radius emit
    nothing — the caller widens the radius (re-probe with a larger
    cell) rather than paying an unbounded global search, which is the
    standard iterative-widening kNN on a grid index.
    Returns (query_id, point_id, dist_km, rank)."""
    from pyspark.sql.window import Window

    cand = grid_radius_join(
        points, queries, radius_km, cell_deg, id_col, lat_col, lon_col
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist_km").asc(), F.col("point_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )
