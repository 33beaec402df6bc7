"""Scans/sources (SURVEY §2.1 S1-S5, S7-S8).

CSV is the native distributed path (S1).  Excel (S2) has no JVM codec in
this container: the reader parses on the driver via pandas/openpyxl when
available (gated import) and always lands in a distributed DataFrame —
acceptable because spreadsheets are config-scale inputs; 100 TB data arrives
as CSV/parquet.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..operators.pivoting import transpose as _transpose


def default_column_names(n: int) -> list[str]:
    """S4 (~ extract/utils.rs:1-3): headerless columns named "0".."n-1"."""
    return [str(i) for i in range(n)]


@dataclass
class ExtractionConfig:
    """S5 (~ extract/extraction_config.rs:7-27)."""

    name: str
    has_headers: bool = True
    patients_are_rows: bool = True
    separator: str = ","


def read_csv(spark: SparkSession, path: str, cfg: ExtractionConfig) -> DataFrame:
    """S1 (~ extract/data_source.rs:82-128): CSV scan with separator/header
    options + schema inference; headerless → synthetic names (S4);
    patients-are-columns → transpose (S3)."""
    df = (
        spark.read.option("sep", cfg.separator)
        .option("header", str(cfg.has_headers).lower())
        .option("inferSchema", "true")
        .csv(path)
    )
    if not cfg.has_headers:
        df = df.toDF(*default_column_names(len(df.columns)))
    if not cfg.patients_are_rows:
        df = _transpose(df)
    return df


def read_excel(spark: SparkSession, path: str, cfg: ExtractionConfig,
               sheet: str | int = 0) -> DataFrame:
    """S2 (~ extract/excel_range_reader.rs:23-159): typed-cell decode with
    mixed-type columns stringified.  Driver-side pandas parse (gated
    import), distributed thereafter."""
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("excel reading requires pandas") from e
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "excel reading requires openpyxl; not installed in this container"
        ) from e
    pdf = pd.read_excel(path, sheet_name=sheet, header=0 if cfg.has_headers else None)
    if not cfg.has_headers:
        pdf.columns = default_column_names(len(pdf.columns))
    else:
        pdf.columns = [str(c) for c in pdf.columns]
    # mixed-type columns → string (Excel decode fallback, :144-154)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: None if pd.isna(v) else str(v))
    df = spark.createDataFrame(pdf)
    if not cfg.patients_are_rows:
        df = _transpose(df)
    return df


def load_config(path: str) -> dict:
    """S7 (~ config/config_loader.rs:8-43): YAML/TOML/JSON config with
    ``${ENV}`` expansion."""
    import json

    with open(path) as f:
        raw = f.read()
    raw = os.path.expandvars(raw)
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml

            return yaml.safe_load(raw)
        except ImportError as e:
            raise NotImplementedError("yaml config requires pyyaml") from e
    if path.endswith(".toml"):
        import tomllib

        return tomllib.loads(raw)
    return json.loads(raw)


def read_alias_map_csv(spark: SparkSession, path: str, key_col: str, alias_col: str) -> DataFrame:
    """S8 (~ config/try_from_config.rs:276-315): key→alias mapping table from
    CSV columns, destined for broadcast."""
    df = spark.read.option("header", "true").csv(path)
    return df.selectExpr(f"`{key_col}` as key", f"`{alias_col}` as value")
