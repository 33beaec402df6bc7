"""Entity resolution (record linkage) over blocked fuzzy joins.

The classic three-stage shape — block, compare, cluster — expressed so
the quadratic compare never sees the full table: candidate pairs only
meet inside a blocking-key bucket (Σ|block|², never |table|²), the
string comparison is Spark's JVM-codegen ``levenshtein`` (identical
unit-cost semantics to DuckDB's, so oracles replay it exactly), and the
transitive closure reuses :func:`..operators.dedup.connected_components`.

At 100 TB the valve is the blocking key: a key whose biggest bucket is
b rows costs Σb² comparisons regardless of corpus size, and the
``max_block`` guard surfaces (rather than silently eats) a
degenerate key.  This is the dedup-family pattern (``lsh_capped``,
``banded_pairs``) applied to structured records instead of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def blocked_fuzzy_pairs(df: DataFrame, id_col: str, name_col: str,
                        block_cols: list[str], max_dist: int = 3,
                        max_block: int = 10_000) -> DataFrame:
    """Candidate pairs by blocking + Levenshtein verify: records sharing
    every ``block_cols`` value pair up (id_a < id_b) and survive when
    ``levenshtein(name_a, name_b) <= max_dist``.  Returns
    (id_a, id_b, dist).

    ``max_block`` is the quadratic valve: any block larger than it
    raises rather than detonating a b² self-join — the caller picks a
    finer key (the bounded-error philosophy, never a silent truncation).
    The guard lives INSIDE the plan (a ``raise_error`` branch on the
    per-block count joined onto the probe side) so no extra eager job
    runs per invocation — one invocation, one job; the block-count
    groupBy shuffles on the same key as the pair join, so the exchange
    is shared, and the guard expression evaluates exactly where the b²
    blowup would start.
    """
    base = df.select(
        F.col(id_col).alias("_id"), F.col(name_col).alias("_nm"), *block_cols
    )
    guard = base.groupBy(*block_cols).agg(
        F.when(
            F.count(F.lit(1)) > max_block,
            F.raise_error(F.format_string(
                "blocked_fuzzy_pairs: a block has %s rows > max_block="
                f"{int(max_block)}; refine the blocking key",
                F.count(F.lit(1)).cast("string"),
            )).cast("long"),
        ).otherwise(F.count(F.lit(1))).alias("_b")
    )
    # referencing _b in the filter below forces the guard branch to
    # evaluate (column pruning would otherwise drop it silently)
    a = base.join(guard, list(block_cols)).filter(F.col("_b") >= 0).drop("_b")
    a, b = a.alias("a"), base.alias("b")
    cond = F.lit(True)
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (F.col("a._id") < F.col("b._id"))
    dist = F.levenshtein(F.col("a._nm"), F.col("b._nm"))
    return (
        a.join(b, cond)
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            dist.cast("bigint").alias("dist"),
        )
        .filter(F.col("dist") <= int(max_dist))
    )


def er_clusters(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Transitive closure of the match relation: every record gets the
    min id of its connected match component plus that component's size.
    Returns (id, canonical_id, cluster_size) — singletons included with
    cluster_size 1, so the output is a total assignment, not just the
    matched subset."""
    from . import dedup

    canon = dedup.connected_components(
        df.select(F.col(id_col).alias("id")), pairs
    )
    sizes = canon.groupBy("canonical_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return canon.join(sizes, "canonical_id").select(
        "id", "canonical_id", "cluster_size"
    )
