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


# Stable registry ordering: the first 50 entries form the driver's sampled
# correctness snapshot.  Policy (rotates each round, r3 verdict #7): keep
# ONE representative per operator family so every family stays sampled,
# and cycle the remaining slots to queries that have never had a driver
# row, so driver-green evidence accumulates across rounds.  Rotated-out
# queries keep their green rows in CORRECTNESS_r{1,2,3}.json.
_PRIORITY = [
    # --- family representatives (driver-green in earlier rounds; 14
    # this round — trimmed so the r9+r10 rotations cover every
    # remaining never-checked query) -----------------------------------
    "c1_trim_empty_to_null", "m2_synonym_mapping",
    # grouping / packet assembly spine (always sampled — r4 verdict #6)
    "g2_group_collect", "g6_upsert_last", "g10_packet_json",
    "g13_medical_actions", "pipeline_e2e_packets",
    # ontology / events / dedup / similarity
    "x2_bidict_priority_lookup", "events_tumbling_hour",
    "dedup_exact", "similarity_ivf_topk",
    # multimodal_features stays: r5's ONLY red row (array-typed result
    # crashed the driver's sort_values canon) — now posexploded to
    # atomic columns; its green r6 row is the fix evidence
    "multimodal_features",
    # curation_lr_calibration stays: r7's ONLY red driver row (a
    # summation-order flake) — now DECIMAL(28,12)-accumulated on both
    # engines and 5/5 hash-stable under varied partitioning; its green
    # r8 row under the driver is the fix evidence
    "curation_lr_calibration",
    # source-transform spine rep (pytest pins the prefix to cover it)
    "s3_transpose",
    # --- r9 first-time rotation (never driver-checked; pool from
    # tools/rotation_status.py — the r8 mining family leads, per the r8
    # verdict, plus this round's new skew-mitigation family) -----------
    "skew_salted_agg_revenue", "skew_salted_distinct_orders",
    "skew_salted_join_supplier",
    "er_fuzzy_part_pairs", "er_fuzzy_part_clusters",
    "curation_domain_mixture", "analytics_holt_linear",
    "analytics_cohort_ltv", "events_dau_wau_mau",
    "events_anomaly_ensemble", "curation_mixture_allocation",
    "events_slo_burn", "events_bot_detection", "text_readability",
    "profiling_numeric_correlation", "embedding_centroid_outliers",
    "graph_resource_allocation", "profiling_histogram_equiwidth",
    "embedding_pipeline_e2e", "similarity_mmr_rerank",
    "text_langid_confusion", "text_tokenizer_fertility",
    "curation_sequence_packing", "curation_dedup_tradeoff",
    "quality_referential_integrity", "events_forecast_backtest",
    "graph_hierarchy_rollup",
    # remaining slots: family-diverse never-checked queries
    "tpch_q8_market_share", "tpch_q15_top_supplier",
    "tpch_q17_small_quantity", "tpch_q21_suppliers_kept_waiting",
    "grouping_sets_revenue", "analytics_rfm_segments",
    "events_transition_entropy", "process_conformance_orders",
    "events_temporal_embargo_split",
]


def _registry():
    # importing the query modules populates the shared registry
    from phenoxtract_spark import queries_analytics, queries_joins  # noqa: F401
    from phenoxtract_spark import queries_core, queries_pipeline, queries_scale  # noqa: F401
    from phenoxtract_spark import queries_analytics2, queries_composite, queries_scalars  # noqa: F401
    from phenoxtract_spark import queries_curation, queries_llm, queries_tpch  # noqa: F401
    from phenoxtract_spark import queries_behavior, queries_semantic  # noqa: F401
    from phenoxtract_spark import queries_graph, queries_mining  # noqa: F401
    from phenoxtract_spark import queries_skew  # noqa: F401

    reg = queries_core.QUERIES
    ordered = {n: reg[n] for n in _PRIORITY if n in reg}
    ordered.update({n: v for n, v in reg.items() if n not in ordered})
    return ordered


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
