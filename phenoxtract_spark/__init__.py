"""phenoxtract_spark — a PySpark-native analytics/ETL engine with the query
and data-processing capabilities of the P2GX/PhenoXtract reference, built
Spark-first (DataFrame/SQL/Catalyst), plus large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from .descriptors import (  # noqa: F401
    Boundary,
    Context,
    ContextKind,
    ContextualizedDataFrame,
    Identifier,
    OutputDataType,
    SeriesContext,
    TableContext,
    TimeElementType,
    ValidationError,
)
from .session import get_spark, load_tables  # noqa: F401

__version__ = "0.1.0"
