"""Registry-wide driver-compatibility invariants that need a SparkSession.

The external driver canonicalizes each query result with a raw pandas
``sort_values`` over cell values before hashing.  That compare CRASHES on
any column whose cells are Python lists / numpy arrays ("TypeError:
unhashable type: 'list'" — the round-5 ``multimodal_features`` red row),
so every driver-facing query must return ATOMIC columns only: no
ArrayType, MapType, or StructType in the result schema.  Complex values
belong in intermediate plans; the registry surface explodes or
stringifies them.

This builds every registered query's plan at sf0.001 (schema only — a few
queries run bounded key-discovery jobs, so this is not free, but it is the
only gate that can see the whole registry's result shapes).
"""

from __future__ import annotations

import __spark_entry__ as ent


def test_every_registered_query_returns_atomic_columns(spark):
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    offenders = {}
    decimal_offenders = {}
    for name, fn in ent.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        complex_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            offenders[name] = complex_cols
        # Round-10 hardening: DECIMAL output columns are driver-render-
        # unsafe — Spark toPandas hands back decimal.Decimal objects
        # (scale-padded str, e.g. '…4900') while DuckDB's fetchdf degrades
        # DECIMAL aggregates to float64 ('…49'), so the driver's
        # as-rendered value hash diverges on identical values (the r9
        # grouping_sets_revenue / analytics_rfm_segments red rows).
        # DECIMAL is fine in intermediate plans (exact accumulation);
        # the registry SURFACE must emit integer cents or rounded DOUBLE.
        decimal_cols = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if decimal_cols:
            decimal_offenders[name] = decimal_cols
    assert not offenders, (
        "driver-facing queries must return atomic columns (the driver's "
        f"sort_values canon crashes on lists): {offenders}"
    )
    assert not decimal_offenders, (
        "driver-facing queries must not emit DECIMAL columns (Decimal-vs-"
        "float render divergence hash-FAILS under the driver; output "
        f"integer cents or rounded DOUBLE): {decimal_offenders}"
    )
