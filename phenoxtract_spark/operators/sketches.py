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
