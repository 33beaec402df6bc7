"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship phenopacket-assembly query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the beyond-reference scale operators, each paired with a
DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# executor Python workers inherit the driver env in local mode; exporting the
# repo on PYTHONPATH lets by-reference-pickled functions import the package
# even when the driver process runs from another cwd
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")


def _registry():
    # importing the query modules populates the shared registry
    from phenoxtract_spark import queries_analytics, queries_joins  # noqa: F401
    from phenoxtract_spark import queries_core, queries_pipeline, queries_scale  # noqa: F401
    from phenoxtract_spark import queries_analytics2, queries_composite, queries_scalars  # noqa: F401
    from phenoxtract_spark import queries_curation, queries_llm, queries_tpch  # noqa: F401

    return queries_core.QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: per-customer nested
    order-packet JSON (the scan → group → nest → serialize spine)."""
    reg = _registry()
    fn, _ = reg["g10_packet_json"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _registry().items() if sql is not None}
