"""C1: trim + empty→null normalization (SURVEY §2.3 C1;
~ transform/data_processing/preprocessor.rs:28-52).

Pure Column expressions — stay inside whole-stage codegen; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def trim_empty_to_null(col: Column | str) -> Column:
    """Trim whitespace; '' → null.  ``F.nullif(F.trim(c), lit(''))``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.nullif(F.trim(c), F.lit(""))


def clean_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Apply C1 to every string column (or the given subset) in one projection."""
    string_cols = {f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)}
    targets = set(columns) if columns is not None else string_cols
    exprs = [
        trim_empty_to_null(c).alias(c) if c in targets and c in string_cols else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)
