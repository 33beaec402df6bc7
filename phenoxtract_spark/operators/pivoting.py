"""Reshape operators: transpose, multi-value expansion, unpivot
(SURVEY §2 S3, M6, G7-support).

Scale notes: dynamic ``pivot()`` needs the distinct key set — collected once
(bounded) or passed explicitly (SURVEY §7.3).  When key cardinality explodes
we keep the *long* (exploded) form, which the nested assembly consumes
equally well; ``max_width`` enforces that fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import extract_hpo_ids


class PivotWidthError(ValueError):
    pass


def transpose(df: DataFrame, header_col: str | None = None) -> DataFrame:
    """S3 (~ extract/data_source.rs:37-76): flip a patients-are-columns table.
    ``header_col`` (default: first column) holds the future column names.

    Implementation: unpivot every other column into (patient, key, value)
    long form, then pivot keys back as columns grouped by patient.  Values
    stringify (mixed-type columns — Excel semantics, S2).  Driver-bounded:
    intended for config-sized tables (the reference transposes cohort
    spreadsheets); at scale the long form is the primary representation.
    """
    header_col = header_col or df.columns[0]
    others = [c for c in df.columns if c != header_col]
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as string)" for c in others)
    long = df.select(
        F.col(header_col).cast("string").alias("_key"),
        F.expr(f"stack({len(others)}, {stack_expr}) as (_patient, _value)"),
    )
    keys = [r[0] for r in long.select("_key").distinct().collect()]
    n_rows = df.count()
    if len(keys) < n_rows:
        dupes = [
            r[0]
            for r in long.groupBy("_key").count().filter(F.col("count") > len(others))
            .limit(5).collect()
        ]
        raise ValueError(
            f"transpose: header column {header_col!r} has duplicate values "
            f"({n_rows} rows, {len(keys)} distinct); e.g. {dupes} — rows would "
            "silently collapse"
        )
    wide = (
        long.groupBy("_patient")
        .pivot("_key", keys)
        .agg(F.first("_value"))
        .withColumnRenamed("_patient", header_col)
    )
    return wide


def unpivot_columns(df: DataFrame, id_cols: list[str], value_cols: list[str],
                    key_name: str = "key", value_name: str = "value") -> DataFrame:
    """Generic unpivot (stack) keeping id columns; values stringified for a
    uniform value column."""
    stack_expr = ", ".join(f"'{c}', cast(`{c}` as string)" for c in value_cols)
    return df.select(
        *[F.col(c) for c in id_cols],
        F.expr(f"stack({len(value_cols)}, {stack_expr}) as ({key_name}, {value_name})"),
    )


def explode_multi_ids(df: DataFrame, subject: str, column: str,
                      pattern_fn=extract_hpo_ids, id_name: str = "hpo_id") -> DataFrame:
    """M6 long form (~ multi_hpo_col_expansion.rs:48-230): regex-extract all
    ids from free-text cells → (subject, id) distinct pairs.  This is the
    scale-safe primary output; the wide boolean pivot is a view over it."""
    return (
        df.select(
            F.col(subject).alias("subject_id"),
            F.explode(pattern_fn(F.col(column))).alias(id_name),
        )
        .filter(F.col(id_name).isNotNull())
        .distinct()
    )


def pivot_flags(long: DataFrame, subject: str = "subject_id", key: str = "hpo_id",
                max_width: int = 10_000, block_id: str | None = None,
                key_order: list | None = None) -> DataFrame:
    """M6 wide form: one boolean column per distinct id (header ``id`` or
    ``id#block``, ~ transform/utils.rs:62-85).  Distinct-key collect is the
    driver bottleneck — bounded by ``max_width`` with a hard error directing
    callers to the long form.  ``key_order`` pins the column order (e.g.
    first-occurrence order for reference parity); default is sorted."""
    if key_order is not None:
        keys = list(key_order)
    else:
        keys = sorted(
            r[0] for r in long.select(key).distinct().limit(max_width + 1).collect()
        )
    if len(keys) > max_width:
        raise PivotWidthError(
            f"{key} cardinality exceeds max_width={max_width}; use the long form"
        )
    header = (lambda k: f"{k}#{block_id}") if block_id else (lambda k: k)
    wide = (
        long.groupBy(subject)
        .pivot(key, keys)
        .agg(F.first(F.lit(True)))
    )
    renames = {k: header(k) for k in keys}
    return wide.select(
        F.col(subject), *[F.col(f"`{k}`").alias(renames[k]) for k in keys]
    )
