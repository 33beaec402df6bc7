"""Data-layout optimization: Z-order (Morton) clustering keys.

The 100 TB write-path lever the scan-side levers depend on: sorting a
table by a SINGLE dimension makes min/max file statistics useless for
every other filter column, while writing in Z-ORDER of the filter
columns keeps every file's bounding box small in ALL of them — so
min/max pruning (parquet row groups, Delta/Iceberg file skipping) works
for multi-dimensional predicates.  ``repartitionByRange(zorder_key)``
before the write is the whole integration.

Everything here is exact, deterministic arithmetic (two-pass min/max
scaling + bit interleave as a fixed JVM expression tree), so the key —
and the file-level bounding-box statistics that justify it — replay
bit-identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(scaled: list[Column], bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of the already-scaled integer
    columns (column i contributes bit b to output bit ``b*len + i``) —
    the Morton code.  A fixed ``bits × len`` expression tree, whole-stage
    codegen'd; no shuffle, no UDF."""
    n = len(scaled)
    key = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(scaled):
            key = key + F.shiftleft(
                F.shiftright(c.cast("bigint"), b).bitwiseAND(F.lit(1)),
                b * n + i,
            )
    return key


def scale_to_grid(col: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Min-max scale a numeric column onto the [0, 2^bits) integer grid:
    ``floor((x - lo) / (hi - lo) * (2^bits - 1) + 0.5)`` (HALF_UP via
    +0.5/floor — engine-identical), constant-range columns land on 0."""
    m = float(2**bits - 1)
    span = hi.cast("double") - lo.cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.floor(frac * F.lit(m) + F.lit(0.5)).cast("bigint")


def zorder_layout(df: DataFrame, dims: list[str], bits: int = 8,
                  file_bits: int = 4) -> DataFrame:
    """Assign every row its Z-order key and its target FILE under a
    ``2^file_bits``-file layout (the top ``file_bits`` bits of the key —
    what ``repartitionByRange`` produces with that many partitions), and
    report per-file bounding-box statistics for every dimension: the
    min/max pairs a reader's file-skipping consults.  Narrow boxes in all
    dimensions = multi-dimensional pruning works; that property is what
    the oracle value-checks.

    Two-pass: one global min/max aggregate over the dims (broadcast as a
    1-row dim — the cast-stats pattern), then one projection + one
    coarse groupBy(file).  Returns
    (file_id, n_rows, then per dim: <dim>_lo, <dim>_hi)."""
    stats = df.agg(
        *[F.min(d).alias(f"_lo_{d}") for d in dims],
        *[F.max(d).alias(f"_hi_{d}") for d in dims],
    )
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        scale_to_grid(
            F.col(d), F.col(f"_lo_{d}"), F.col(f"_hi_{d}"), bits
        ).alias(f"_g_{d}")
        for d in dims
    ]
    proj = joined.select(*[F.col(d) for d in dims], *scaled)
    key = zorder_key([F.col(f"_g_{d}") for d in dims], bits)
    total_bits = bits * len(dims)
    file_id = F.shiftright(key, total_bits - int(file_bits))
    return (
        proj.select(*[F.col(d) for d in dims], file_id.alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                agg
                for d in dims
                for agg in (
                    F.min(d).alias(f"{d}_lo"),
                    F.max(d).alias(f"{d}_hi"),
                )
            ],
        )
    )


def compaction_plan(files: DataFrame, part_cols: list[str], key_col: str,
                    size_col: str, target_size: int) -> DataFrame:
    """Small-file compaction planner — the other standing lakehouse
    write-path chore next to :func:`zorder_layout`: assign input files to
    output bins of ~``target_size`` so a rewrite job can coalesce
    many small files into few right-sized ones.

    Streaming first-fit by running total: within each TABLE PARTITION,
    files are walked in ``key_col`` order and file f lands in bin
    ``floor((cumsum_through_f − size_f) / target_size)`` — the
    deterministic one-pass bin-pack (a file straddling a boundary starts
    its bin; bins overfill by at most one file, never underfill below
    target except the last).  Returns the input plus ``bin``.

    Scale: compaction is ALWAYS per table partition (rewrites must not
    cross partition boundaries), which is exactly what keeps this plan
    distributed — one window partitioned by ``part_cols``, no global
    cumsum, no single-task sort."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(*part_cols)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(size_col).over(w)
    return files.withColumn(
        "bin",
        F.floor((cum - F.col(size_col)) / target_size).cast("bigint"),
    )


def hilbert_key_2d(x: Column, y: Column, bits: int = 8) -> Column:
    """2-D Hilbert-curve distance of an (x, y) grid cell (the classic
    per-level rotate-and-flip walk, folded over the ``bits`` levels with
    ``F.aggregate`` so the expression tree stays LINEAR in ``bits`` —
    an unrolled CASE chain would grow ~3× per level).

    Hilbert ordering preserves 2-D locality strictly better than the
    Morton code (:func:`zorder_key`): consecutive key ranges are always
    edge-connected cells, so range-partitioned files get tighter
    bounding boxes on BOTH dimensions.  Integer arithmetic end to end —
    engine-exact."""
    levels = F.array(
        *[F.lit(1 << (bits - 1 - i)).cast("bigint") for i in range(bits)]
    )
    init = F.struct(
        x.cast("bigint").alias("x"),
        y.cast("bigint").alias("y"),
        F.lit(0).cast("bigint").alias("d"),
    )

    def step(acc, s):
        rx = F.when(acc["x"].bitwiseAND(s) > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        ry = F.when(acc["y"].bitwiseAND(s) > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        d2 = acc["d"] + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        fx = F.when(rx == 1, s - 1 - acc["x"]).otherwise(acc["x"])
        fy = F.when(rx == 1, s - 1 - acc["y"]).otherwise(acc["y"])
        nx = F.when(ry == 0, fy).otherwise(acc["x"])
        ny = F.when(ry == 0, fx).otherwise(acc["y"])
        return F.struct(nx.alias("x"), ny.alias("y"), d2.alias("d"))

    return F.aggregate(levels, init, step)["d"]


def hilbert_key_dim(spark, bits: int = 8) -> DataFrame:
    """The full ``2^bits × 2^bits`` grid with each cell's Hilbert
    distance: (_cx, _cy, _hkey).  The :func:`hilbert_key_2d` fold is an
    interpreted HOF (``ArrayAggregate`` never whole-stage-codegens), so
    running it PER ROW was the slowest query in the registry — running
    it once over the 65536-cell grid and broadcast-joining the result
    makes the per-row cost a codegen BHJ probe instead (interleaved sf1
    A/B: 4.6 s → 1.1 s; at 100 TB the fold cost is a CONSTANT while the
    probe scales embarrassingly).  ~1.5 MB at the default 8 bits."""
    n = 1 << bits
    cells = spark.range(n * n).select(
        F.shiftright("id", bits).cast("bigint").alias("_cx"),
        F.col("id").bitwiseAND(F.lit(n - 1)).cast("bigint").alias("_cy"),
    )
    return cells.select(
        "_cx", "_cy",
        hilbert_key_2d(F.col("_cx"), F.col("_cy"), bits).alias("_hkey"),
    )


def hilbert_layout(df: DataFrame, dims: list[str], bits: int = 8,
                   file_bits: int = 4) -> DataFrame:
    """Hilbert-curve write layout: the :func:`zorder_layout` contract
    (scale dims to the 2^bits grid, key, assign the top ``file_bits``
    bits as the target file, report per-file min/max bounding boxes) with
    the Hilbert distance as the clustering key.  Two dims only — the
    curve is 2-D; for >2 dims compose (hilbert(d1,d2), d3...) or fall
    back to Z-order.  Plan: one global min/max agg broadcast back, one
    projection, one BHJ against the :func:`hilbert_key_dim` grid (the
    interpreted fold runs on the 4^bits-cell dim, never per row), one
    coarse groupBy(file_id).  Grids past ~2^10 per side outgrow a sane
    broadcast — those fall back to the per-row fold."""
    if len(dims) != 2:
        raise ValueError("hilbert_layout is 2-D; use zorder_layout for other arities")
    stats = df.agg(
        *[F.min(d).alias(f"_lo_{d}") for d in dims],
        *[F.max(d).alias(f"_hi_{d}") for d in dims],
    )
    joined = df.crossJoin(F.broadcast(stats))
    scaled = [
        scale_to_grid(F.col(d), F.col(f"_lo_{d}"), F.col(f"_hi_{d}"), bits).alias(
            f"_g_{d}"
        )
        for d in dims
    ]
    proj = joined.select(*[F.col(d) for d in dims], *scaled)
    gx, gy = f"_g_{dims[0]}", f"_g_{dims[1]}"
    if bits <= 10:
        # LEFT join: a NULL dim value yields a NULL grid cell, which must
        # land under a NULL file_id exactly like the bits>10 per-row-fold
        # path (an inner join would silently drop those rows)
        dim = hilbert_key_dim(df.sparkSession, bits)
        proj = proj.join(
            F.broadcast(dim),
            (F.col(gx) == F.col("_cx")) & (F.col(gy) == F.col("_cy")),
            "left",
        )
        key = F.col("_hkey")
    else:
        key = hilbert_key_2d(F.col(gx), F.col(gy), bits)
    file_id = F.shiftright(key, 2 * bits - int(file_bits))
    return (
        proj.select(*[F.col(d) for d in dims], file_id.alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                agg
                for d in dims
                for agg in (F.min(d).alias(f"{d}_lo"), F.max(d).alias(f"{d}_hi"))
            ],
        )
    )


def range_layout(df: DataFrame, file_dim: str, stat_dims: list[str],
                 file_bits: int = 4) -> DataFrame:
    """Per-file bounding boxes under a SINGLE-dimension range layout
    (what ``repartitionByRange(file_dim)`` with ``2^file_bits``
    partitions writes): the baseline :func:`zonemap_prune` contrasts
    against Z-order — files are narrow in ``file_dim`` but span the full
    range of every OTHER dimension, so min/max skipping only works for
    predicates on the sort column.  Same two-pass shape as
    :func:`zorder_layout`.  Returns
    (file_id, n_rows, then per stat dim: <dim>_lo, <dim>_hi)."""
    stats = df.agg(
        F.min(file_dim).alias("_lo"), F.max(file_dim).alias("_hi")
    )
    file_id = scale_to_grid(
        F.col(file_dim), F.col("_lo"), F.col("_hi"), file_bits
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .select(*[F.col(d) for d in stat_dims], file_id.alias("file_id"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                agg
                for d in stat_dims
                for agg in (
                    F.min(d).alias(f"{d}_lo"),
                    F.max(d).alias(f"{d}_hi"),
                )
            ],
        )
    )


def zonemap_prune(stats: DataFrame,
                  predicates: list[tuple[str, float, float]]) -> DataFrame:
    """File-skipping decision from zone-map statistics: a file must be
    SCANNED iff for EVERY range predicate ``(col, lo, hi)`` the file's
    ``[col_lo, col_hi]`` box intersects ``[lo, hi]`` — the exact
    min/max-pruning rule parquet row groups and Delta/Iceberg data
    skipping apply.  Conservative by construction (a scanned file may
    still contain zero matches; a pruned file provably contains none).
    Adds a ``scanned`` boolean to the stats relation — metadata-sized,
    never touches the data files themselves, which is the whole point at
    100 TB: the decision costs |files|, not |rows|."""
    cond = F.lit(True)
    for c, lo, hi in predicates:
        cond = cond & (F.col(f"{c}_hi") >= F.lit(lo)) & (
            F.col(f"{c}_lo") <= F.lit(hi)
        )
    return stats.withColumn("scanned", cond)


def prune_summary(stats: DataFrame,
                  predicates: list[tuple[str, float, float]]) -> DataFrame:
    """One-row scan-cost summary of :func:`zonemap_prune`:
    (n_files, files_scanned, rows_scanned) — the number a layout is
    judged by."""
    pruned = zonemap_prune(stats, predicates)
    return pruned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.col("scanned").cast("bigint")).cast("bigint").alias(
            "files_scanned"
        ),
        F.sum(
            F.when(F.col("scanned"), F.col("n_rows")).otherwise(F.lit(0))
        ).cast("bigint").alias("rows_scanned"),
    )
