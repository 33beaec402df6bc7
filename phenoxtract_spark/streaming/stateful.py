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
