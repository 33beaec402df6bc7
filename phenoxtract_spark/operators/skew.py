"""Skew-mitigation operators: salted two-phase aggregation and salted
shuffle joins for power-law keys.

The repo can already *detect* skew (``profiling_skew_report``); this
module is the *mitigation*.  At 100 TB a groupBy/join key whose hottest
value owns 90% of the rows turns one reducer task into the stage's
critical path — every other task finishes in seconds while the hot
task sorts/merges the whole key alone.  The standard fix is salting:
split the hot key into B sub-keys for the heavy phase, then merge the
B partial states in a second, trivially-small phase.

Exactness contract (the whole point — these are NOT approximations):

- ``salted_agg``: sum/count/min/max decompose over any row partition,
  so phase 1 may salt by ANY deterministic row expression; phase 2's
  merge (sum of sums, min of mins, ...) is algebraically identical to
  the unsalted aggregate.
- ``salted_distinct_count``: salts by ``pmod(xxhash64(value), B)`` —
  the VALUE, not the row — so every occurrence of a given value lands
  in exactly one (key, salt) cell; per-cell ``count_distinct`` never
  double-counts across cells and the phase-2 ``sum`` is the exact
  global distinct count.  (Spark's own rewrite of ``count(DISTINCT)``
  shuffles on (key, value) which distributes fine; this operator
  exists for the collect_set-shaped formulations users actually write,
  where partial state is O(|group|) and the hot key's merge is a
  single task holding every distinct value at once.)
- ``salted_join``: the dim side is replicated B× (one copy per salt
  value) and the fact side gets a deterministic per-row salt, so every
  fact row still meets ALL dim rows for its key exactly once — the
  result multiset is identical to the plain join.  Use when the dim is
  too big to broadcast and the fact's fk is power-law: the hot key's
  probe rows spread over B tasks instead of one.  Cost: the dim shuffle
  grows B×, which is why B stays small (8-64) and the dim must be the
  *smaller* side.

Why not just AQE?  ``spark.sql.adaptive.skewJoin`` splits oversized
sort-merge partitions at runtime and is the right default — but it only
covers sort-merge/shuffle-hash JOINS, not aggregation state, and only
fires when runtime stats cross its thresholds.  Salting is the
plan-level guarantee the operator can promise regardless of runtime
statistics; SCALING.md records the measured straggler improvement of
both approaches on a planted 90%-hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__pxs_salt"


def row_salt(cols: list[Column | str], buckets: int) -> Column:
    """Deterministic per-row salt in [0, buckets): pmod(xxhash64(cols), B).
    Deterministic (no rand()) so retried/speculative tasks re-derive the
    same salt — a rand() salt breaks exactly-once semantics under task
    retry, the classic salting bug."""
    return F.pmod(F.xxhash64(*cols), F.lit(int(buckets))).cast("int")


def salted_agg(df: DataFrame, keys: list[str], salt_on: list[str],
               buckets: int = 32, *, sums: list[str] | None = None,
               counts: bool = True, mins: list[str] | None = None,
               maxs: list[str] | None = None) -> DataFrame:
    """Two-phase salted aggregate for decomposable aggregates.

    Phase 1 groups by (keys..., salt) — the hot key's rows spread over
    ``buckets`` reducer cells; phase 2 groups the ≤ B partial rows per
    key.  Output: one row per key with ``sum_<c>``, ``cnt`` (bigint),
    ``min_<c>``, ``max_<c>`` — exactly equal to the plain groupBy.

    Phase-2 input is |keys| × B rows regardless of data volume, so the
    second exchange is negligible; the first exchange is where the
    planted 90%-hot key stops being a single-task straggler.
    """
    sums, mins, maxs = sums or [], mins or [], maxs or []
    p1 = []
    for c in sums:
        p1.append(F.sum(c).alias(f"_s_{c}"))
    if counts:
        p1.append(F.count(F.lit(1)).alias("_c"))
    for c in mins:
        p1.append(F.min(c).alias(f"_mn_{c}"))
    for c in maxs:
        p1.append(F.max(c).alias(f"_mx_{c}"))
    phase1 = df.groupBy(
        *keys, row_salt([F.col(c) for c in salt_on], buckets).alias(_SALT)
    ).agg(*p1)
    p2 = []
    for c in sums:
        p2.append(F.sum(f"_s_{c}").alias(f"sum_{c}"))
    if counts:
        p2.append(F.sum("_c").cast("bigint").alias("cnt"))
    for c in mins:
        p2.append(F.min(f"_mn_{c}").alias(f"min_{c}"))
    for c in maxs:
        p2.append(F.max(f"_mx_{c}").alias(f"max_{c}"))
    return phase1.groupBy(*keys).agg(*p2)


def salted_distinct_count(df: DataFrame, keys: list[str], value_col: str,
                          buckets: int = 32,
                          out_col: str = "n_distinct") -> DataFrame:
    """Exact per-key COUNT(DISTINCT value) that never concentrates a hot
    key's distinct-set in one task: salt by the VALUE hash (same value →
    same cell, so cells partition the value space), count distinct per
    (key, salt) cell, then sum the B cell counts per key."""
    cell = df.groupBy(
        *keys, row_salt([F.col(value_col)], buckets).alias(_SALT)
    ).agg(F.count_distinct(F.col(value_col)).alias("_d"))
    return cell.groupBy(*keys).agg(
        F.sum("_d").cast("bigint").alias(out_col)
    )


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                buckets: int = 16,
                fact_salt_on: list[str] | None = None) -> DataFrame:
    """Inner equi-join resilient to a power-law fact fk, for dims too
    big to broadcast: dim rows are replicated once per salt value
    (``explode(sequence(0, B-1))``) and each fact row carries one
    deterministic salt, so the join on (key, salt) yields exactly the
    plain join's rows while the hot key's probe side spreads over B
    partitions.  ``shuffle_hash`` hint: the replicated dim is still the
    small side and skipping the sort keeps the salted path cheap; at
    real scale the planner would pick SMJ if the dim outgrew memory.

    Fact salt defaults to hashing the fact's OTHER columns is not safe
    (fk-only rows would all salt alike), so callers pass
    ``fact_salt_on`` — any per-row-varying columns (an id, a line
    number).  Dim columns survive with their names; fact columns keep
    theirs (same contract as a plain ``fact.join(dim, on)``)."""
    if not fact_salt_on:
        raise ValueError("salted_join: fact_salt_on must name >=1 column")
    salted_fact = fact.withColumn(
        _SALT, row_salt([F.col(c) for c in fact_salt_on], buckets)
    )
    salted_dim = dim.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(int(buckets) - 1)).cast("array<int>")),
    )
    return (
        salted_fact.join(salted_dim.hint("shuffle_hash"), [on, _SALT])
        .drop(_SALT)
    )
