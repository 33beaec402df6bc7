"""Change-data-capture application — the incremental-ingest primitive a
100 TB pipeline uses to keep a materialized table current from an
ordered change stream (Debezium-style I/U/D events), and the batch MERGE
(upsert) special case.

Spark-first shapes: last-writer-wins collapses the change stream with
one per-key window (no iterative driver logic), and the apply is a full
outer join on the key — broadcastable when the change batch is small,
shuffle-on-key otherwise, exactly the join Catalyst already optimizes.
Everything is deterministic (explicit sequence column, explicit
tie-breaks), so the whole path is oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_changes(changes: DataFrame, key_cols: list[str],
                   seq_col: str = "seq", op_col: str = "op") -> DataFrame:
    """Collapse an I/U/D change stream to the LAST change per key
    (last-writer-wins by ``seq_col``; ties break toward the delete so a
    same-sequence insert+delete converges deterministically, then by
    ``op_col`` descending for stability).  One per-key window pass —
    the map-side-combine-friendly shape that survives any stream
    length."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdc_apply(base: DataFrame, changes: DataFrame, key_cols: list[str],
              payload_cols: list[str], seq_col: str = "seq",
              op_col: str = "op") -> DataFrame:
    """Apply an ordered change stream to a base table:

    - key absent from changes            -> base row survives unchanged
    - last change is I or U              -> change payload wins (insert
      if the key was absent from base — MERGE's WHEN NOT MATCHED arm)
    - last change is D                   -> row deleted

    Returns the post-apply table (``key_cols`` + ``payload_cols``).
    Plan: :func:`latest_changes` (one window) + ONE full outer join on
    the key.  With a small change batch Catalyst broadcasts it; at CDC
    scale both sides shuffle on the key once — there is no per-row
    driver loop anywhere."""
    last = latest_changes(changes, key_cols, seq_col, op_col)
    b = base.select(
        *key_cols, *[F.col(c).alias(f"_b_{c}") for c in payload_cols]
    )
    c = last.select(
        *key_cols,
        F.col(op_col).alias("_op"),
        *[F.col(c).alias(f"_c_{c}") for c in payload_cols],
    )
    joined = b.join(c, key_cols, "full_outer")
    kept = joined.filter(F.col("_op").isNull() | (F.col("_op") != F.lit("D")))
    return kept.select(
        *key_cols,
        *[
            F.when(F.col("_op").isNotNull(), F.col(f"_c_{c}"))
            .otherwise(F.col(f"_b_{c}"))
            .alias(c)
            for c in payload_cols
        ],
    )


def merge_upsert(target: DataFrame, source: DataFrame, key_cols: list[str],
                 payload_cols: list[str]) -> DataFrame:
    """Batch MERGE (Delta-style WHEN MATCHED UPDATE / WHEN NOT MATCHED
    INSERT): every source row upserts — the degenerate change stream
    where every change is a U with equal sequence.  Same single
    full-outer-join plan as :func:`cdc_apply`."""
    src = source.select(
        *key_cols, F.lit("U").alias("op"), F.lit(0).cast("bigint").alias("seq"),
        *payload_cols,
    )
    return cdc_apply(target, src, key_cols, payload_cols)


def incremental_agg_maintain(base: DataFrame, changes: DataFrame,
                             key_cols: list[str], group_col: str,
                             measure_col: str, seq_col: str = "seq",
                             op_col: str = "op",
                             base_agg: DataFrame | None = None) -> DataFrame:
    """Incremental materialized-view maintenance for per-group
    (count, sum) aggregates under an I/U/D change stream: instead of
    re-aggregating the post-apply table, combine the STORED aggregate
    with a delta computed only from the CHANGED keys —

    - every touched key retracts its old contribution (−1, −measure) in
      its OLD group (an update that moves a row across groups retracts
      there and asserts in the new group automatically);
    - every surviving last-change (I/U) asserts its new contribution.

    At 100 TB this is the difference between scanning the fact table per
    refresh and scanning |changes|: the only base-table access is the
    key-join fetching old rows of touched keys (bucket/index-prunable),
    and the final combine is a union + one group aggregate against the
    view-sized stored state.  Count and sum are self-maintainable; min /
    max / distinct need auxiliary state and are out of scope.

    Use an exact type (DECIMAL) for ``measure_col`` — retract/assert
    arithmetic in floating point would drift from a full recompute.
    ``base_agg`` (group_col, n_rows, measure_sum) is the stored view
    state; if None it is computed from ``base`` (test convenience —
    production passes the stored relation).  The maintained result
    EQUALS the full re-aggregation of cdc_apply(base, changes) — that is
    the property the registered oracle value-checks.
    Returns (group_col, n_rows, measure_sum), empty groups dropped."""
    last = latest_changes(changes, key_cols, seq_col, op_col)
    if base_agg is None:
        base_agg = base.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(measure_col).alias("measure_sum"),
        )
    removed = base.join(last.select(*key_cols), key_cols)
    neg = removed.select(
        F.col(group_col).alias("_g"),
        (-F.lit(1)).cast("bigint").alias("_dn"),
        (-F.col(measure_col)).alias("_dm"),
    )
    pos = last.filter(F.col(op_col) != "D").select(
        F.col(group_col).alias("_g"),
        F.lit(1).cast("bigint").alias("_dn"),
        F.col(measure_col).alias("_dm"),
    )
    state = base_agg.select(
        F.col(group_col).alias("_g"),
        F.col("n_rows").cast("bigint").alias("_dn"),
        F.col("measure_sum").alias("_dm"),
    )
    return (
        state.unionByName(neg).unionByName(pos)
        .groupBy("_g")
        .agg(
            F.sum("_dn").cast("bigint").alias("n_rows"),
            F.sum("_dm").alias("measure_sum"),
        )
        .filter(F.col("n_rows") > 0)
        .withColumnRenamed("_g", group_col)
    )


def time_travel(base: DataFrame, changes: DataFrame, key_cols: list[str],
                payload_cols: list[str], as_of, seq_col: str = "seq",
                op_col: str = "op") -> DataFrame:
    """Reconstruct the table state AS OF a sequence point from the base
    snapshot plus the retained change log — the time-travel read every
    lakehouse table format exposes, expressed as plain relational
    algebra: filter the log to ``seq <= as_of``, then the same
    last-writer-wins window + one full outer join as :func:`cdc_apply`.

    ``as_of`` may be a Python scalar or a ONE-ROW DataFrame holding a
    single ``as_of`` column (e.g. a computed watermark); the one-row
    form broadcasts and never touches the driver.  Changes after the
    point are invisible — including deletes, so a row deleted later is
    resurrected in the reconstruction, the property the tests pin.
    At 100 TB the cost is one log scan (partition-prunable by seq if
    the log is seq-bucketed on disk) — the base table is read once
    regardless of how far back ``as_of`` lies."""
    if isinstance(as_of, DataFrame):
        visible = (
            changes.crossJoin(F.broadcast(as_of))
            .filter(F.col(seq_col) <= F.col("as_of"))
            .drop("as_of")
        )
    else:
        visible = changes.filter(F.col(seq_col) <= F.lit(as_of))
    return cdc_apply(base, visible, key_cols, payload_cols, seq_col, op_col)


def log_expiry(changes: DataFrame, key_cols: list[str], retain_from,
               seq_col: str = "seq", op_col: str = "op") -> DataFrame:
    """VACUUM planning for a CDC log under a time-travel retention
    watermark (the Delta/Iceberg expire-snapshots decision as plain
    relational algebra): an entry may be EXPIRED iff dropping it cannot
    change any reconstruction AS OF any point ``>= retain_from``.
    Three statuses per log entry:

    - ``retain_window``: ``seq > retain_from`` — still inside the
      travel window, every such entry is reachable;
    - ``retain_boundary``: the key's LATEST entry with
      ``seq <= retain_from`` (same LWW tie convention as
      :func:`cdc_apply`: seq desc, delete-first) — it alone defines the
      key's state at the watermark, so every reconstruction at or after
      ``retain_from`` needs it (a boundary DELETE must be kept too, or
      the key would resurrect from the base snapshot);
    - ``expire``: every other ``seq <= retain_from`` entry — shadowed
      by the boundary entry at EVERY reachable as_of.

    ``retain_from`` may be a scalar or a one-row DataFrame with a
    ``retain_from`` column (broadcasts; no driver scalar).  Cost: one
    window over the below-watermark slice, partitioned by key — the
    same single shuffle as :func:`latest_changes`; the above-watermark
    slice passes through untouched."""
    from pyspark.sql.window import Window

    if isinstance(retain_from, DataFrame):
        tagged = changes.crossJoin(F.broadcast(retain_from))
    else:
        tagged = changes.withColumn("retain_from", F.lit(retain_from))
    below = tagged.filter(F.col(seq_col) <= F.col("retain_from"))
    above = tagged.filter(F.col(seq_col) > F.col("retain_from"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(seq_col).desc(), F.col(op_col).asc()
    )
    ranked = below.withColumn("_rn", F.row_number().over(w))
    out_cols = [c for c in changes.columns]
    return (
        ranked.select(
            *out_cols,
            F.when(F.col("_rn") == 1, F.lit("retain_boundary"))
            .otherwise(F.lit("expire"))
            .alias("status"),
        )
        .unionByName(
            above.select(*out_cols, F.lit("retain_window").alias("status"))
        )
    )


def merge_conflicts(a: DataFrame, b: DataFrame, key_cols: list[str],
                    payload_cols: list[str], seq_col: str = "seq",
                    op_col: str = "op") -> DataFrame:
    """Conflict report between TWO change streams writing the same table
    (two replicas, two pipelines, a branch merge): a key conflicts iff
    BOTH streams touched it and their last-writer payloads (or ops)
    disagree — the relation a reconciler reviews before applying a
    resolution policy.  Agreeing double-writes are NOT conflicts.

    The report also carries the default LWW RESOLUTION: higher seq wins,
    ties break toward stream A (deterministic, documented — not a claim
    that LWW is always the right policy).  Plan: one window per stream +
    one inner join on the key; cost is |touched keys|, never table-sized.
    Returns key_cols + per-stream (op, seq, payload…) + ``winner``."""
    la = latest_changes(a, key_cols, seq_col, op_col)
    lb = latest_changes(b, key_cols, seq_col, op_col)
    pa = la.select(
        *key_cols, F.col(op_col).alias("a_op"), F.col(seq_col).alias("a_seq"),
        *[F.col(c).alias(f"a_{c}") for c in payload_cols],
    )
    pb = lb.select(
        *key_cols, F.col(op_col).alias("b_op"), F.col(seq_col).alias("b_seq"),
        *[F.col(c).alias(f"b_{c}") for c in payload_cols],
    )
    joined = pa.join(pb, key_cols)
    differs = F.col("a_op") != F.col("b_op")
    for c in payload_cols:
        differs = differs | ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
    return joined.filter(differs).withColumn(
        "winner",
        F.when(F.col("b_seq") > F.col("a_seq"), F.lit("b")).otherwise(F.lit("a")),
    )
