"""Custom stateful streaming operator (SURVEY §7.3 stretch):
per-key running aggregation via ``applyInPandasWithState``.

The reference is batch-only; this is the Spark-native pattern for operators
whose state can't be expressed as windowed aggregation — e.g. a running
per-user spend tracker that emits an update row per micro-batch and times
out idle users.  State = one small tuple per key (O(keys) memory per
executor); works identically under ``availableNow`` batch triggers and
continuous micro-batches.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming DF (user_id, ts, value, ...) → update stream of per-user
    running (n_events, total_value).  Call on a ``readStream`` source and
    write with ``outputMode("update")``.

    The update function is a CLOSURE, not a module-level function: cloudpickle
    then serializes it by value, so executor Python workers need no
    ``phenoxtract_spark`` on their import path (the driver may run from any
    cwd)."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # worker-side import

        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_totals_batch(events: DataFrame) -> DataFrame:
    """Batch-equivalent of the stateful operator (the oracle-checkable
    semantics): plain groupBy — state folded over all input at once."""
    from pyspark.sql import functions as F

    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# stateful sessionization with event-time timeout
# ---------------------------------------------------------------------------

SESSIONS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      ts: str = "ts") -> DataFrame:
    """Custom stateful sessionization: sessions close when the event-time
    watermark passes ``last_event + gap`` (``EventTimeTimeout``), then emit
    exactly one appended row — the semantics of ``F.session_window`` in
    append mode, re-implemented as user state to show the pattern for
    session logic the built-in can't express (e.g. cart-abandonment payloads,
    per-session feature vectors).

    State per key is one (start, end, n) tuple — O(active sessions) executor
    memory, bounded by the watermark.  Requires ``withWatermark`` ≥ gap on
    the source, which this function applies.
    """
    import datetime as _dt

    gap_n, gap_unit = gap.split()
    gap_ms = int(gap_n) * {
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
        "hour": 3_600_000, "hours": 3_600_000,
    }[gap_unit]

    def update(key, pdfs, state: GroupState):
        import datetime as dt

        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [dt.datetime.utcfromtimestamp(start_ms / 1000)],
                    "session_end": [dt.datetime.utcfromtimestamp((end_ms + gap_ms) / 1000)],
                    "n_events": [n],
                }
            )
            return
        start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
        for pdf in pdfs:
            # normalize to ns regardless of the Arrow batch's unit (us vs ns)
            ts_ms = pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64") // 1_000_000
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            start_ms = lo if start_ms is None else min(start_ms, lo)
            end_ms = hi if end_ms is None else max(end_ms, hi)
            n += len(pdf)
        state.update((start_ms, end_ms, n))
        # close the session once the watermark passes last_event + gap
        state.setTimeoutTimestamp(end_ms + gap_ms)
        yield from ()

    from pyspark.sql import functions as F

    # project to (user_id, ts) before grouping: state shuffle carries only
    # what the session machine needs, and the update fn sees a fixed schema
    watermarked = (
        events.select("user_id", F.col(ts).alias("ts")).withWatermark("ts", gap)
    )
    return watermarked.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSIONS_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# stateful CEP pattern matching (A followed by B within T)
# ---------------------------------------------------------------------------

PATTERN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("matched_us", T.LongType()),
    ]
)
_PATTERN_STATE_SCHEMA = T.StructType(
    [T.StructField("pending", T.ArrayType(T.LongType()))]
)


def pattern_match_stream(events: DataFrame, first_type: str, then_type: str,
                         within: str = "24 hours", ts: str = "ts") -> DataFrame:
    """Streaming equivalent of ``behavior.followed_within``: per user,
    every ``first_type`` event is an open anchor; the earliest
    ``then_type`` event strictly after it and within ``within`` matches
    it; anchors whose horizon passes unmatched emit ``matched_us = null``
    once the event-time watermark confirms no matching follower can
    arrive.

    State per key = the array of still-open anchor timestamps — bounded
    by anchors-per-horizon, expired by ``EventTimeTimeout`` at
    ``max(pending) + within`` so idle keys hold no state forever.  Within
    a micro-batch events process in event-time order; cross-batch
    ordering is watermark-bounded (the standard streaming contract).
    """
    gap_n, gap_unit = within.split()
    within_us = int(gap_n) * {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
    }[gap_unit] * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key

        def emit(firsts, matches):
            return pd.DataFrame(
                {
                    "user_id": [user_id] * len(firsts),
                    "first_us": firsts,
                    "matched_us": matches,
                }
            )

        if state.hasTimedOut:
            pending = list(state.get[0]) if state.exists else []
            state.remove()
            if pending:
                yield emit(pending, [None] * len(pending))
            return
        pending = list(state.get[0]) if state.exists else []
        out_first: list = []
        out_match: list = []
        rows = []
        for pdf in pdfs:
            us = (
                pd.to_datetime(pdf["ts"]).astype("datetime64[ns]").astype("int64")
                // 1_000
            )
            rows.extend(zip(us.tolist(), pdf["event_type"].tolist()))
        rows.sort()
        for us, typ in rows:
            still = []
            for a in pending:
                if us > a + within_us:  # horizon passed before this event
                    out_first.append(a)
                    out_match.append(None)
                else:
                    still.append(a)
            pending = still
            if typ == then_type:
                for a in pending:
                    if a < us:  # strictly-after match; earliest follower wins
                        out_first.append(a)
                        out_match.append(us)
                pending = [a for a in pending if a >= us]
            if typ == first_type:
                pending.append(us)
        if pending:
            state.update((pending,))
            # event-time timeout is in MILLISECONDS
            state.setTimeoutTimestamp((max(pending) + within_us) // 1_000 + 1)
        elif state.exists:
            state.remove()
        if out_first:
            yield emit(out_first, out_match)

    from pyspark.sql import functions as F

    watermarked = (
        events.select("user_id", F.col(ts).alias("ts"), "event_type")
        .withWatermark("ts", within)
    )
    return watermarked.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=PATTERN_SCHEMA,
        stateStructType=_PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# streaming content dedup (first-seen wins)
# ---------------------------------------------------------------------------

DEDUP_SCHEMA = T.StructType(
    [
        T.StructField("digest", T.StringType()),
        T.StructField("keep_id", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
_DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("keep_id", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def dedup_first_seen_stream(docs: DataFrame) -> DataFrame:
    """Streaming exact content dedup over a (doc_id, digest) stream:
    per content digest, keep the FIRST document ever seen and count
    every arrival — the ingestion-time dedup that stops duplicate
    content from ever landing in the corpus, with state bounded by
    |distinct content|, not |arrivals|.

    Determinism contract: arrival order WITHIN a micro-batch is
    partition-dependent, so "first" means min doc_id — and the fold
    takes ``min(keep, batch_min)`` across batches too, so the keep
    policy is the GLOBAL minimum doc_id over all arrivals regardless of
    batch order (which is exactly what makes the stream=batch-groupBy
    parity hold for any batch split).  Emit mode: update — each digest
    re-emits its (keep_id, n_seen) row whenever a batch touches it."""

    def update(key, pdfs, state: GroupState):
        import pandas as pd  # worker-side import

        (digest,) = key
        keep, n = state.get if state.exists else (None, 0)
        for pdf in pdfs:
            if len(pdf):
                bmin = int(pdf["doc_id"].min())
                keep = bmin if keep is None else min(keep, bmin)
                n += len(pdf)
        state.update((keep, n))
        yield pd.DataFrame(
            {"digest": [digest], "keep_id": [keep], "n_seen": [n]}
        )

    return docs.groupBy("digest").applyInPandasWithState(
        update,
        outputStructType=DEDUP_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_first_seen_batch(docs: DataFrame) -> DataFrame:
    """Batch-equivalent semantics: one groupBy over all arrivals."""
    from pyspark.sql import functions as F

    return docs.groupBy("digest").agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_seen"),
    )
