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
    # --- representatives (driver-green in earlier rounds; trimmed to 9
    # this round so the r10 rotation covers all but 8 of the remaining
    # never-checked pool — the r9 handoff's named keeps) ----------------
    # grouping / packet assembly spine (always sampled — r4 verdict #6)
    "g10_packet_json", "g13_medical_actions", "pipeline_e2e_packets",
    # multimodal_features stays: r5's ONLY red row (array-typed result
    # crashed the driver's sort_values canon) — now posexploded to
    # atomic columns; its green r6+ rows are the fix evidence
    "multimodal_features",
    # curation_lr_calibration stays: r7's ONLY red driver row (a
    # summation-order flake) — now DECIMAL(28,12)-accumulated on both
    # engines and 5/5 hash-stable under varied partitioning
    "curation_lr_calibration",
    # source-transform spine rep (pytest pins the prefix to cover it)
    "s3_transpose",
    # similarity family rep (pytest pins the prefix to cover the family;
    # no never-checked similarity query remains in the pool)
    "similarity_ivf_topk",
    # r9's TWO red rows (DECIMAL-render hash divergence) — now integer
    # cents on both engines; their green r10 rows are the fix evidence
    "grouping_sets_revenue", "analytics_rfm_segments",
    # --- r10 first-time rotation (never driver-checked; pool from
    # tools/rotation_status.py — leads with the r9 stats/sweep batch per
    # the r9 handoff, then the full remaining pool minus 8 deferred
    # family-duplicates; plus this round's new scale-safe RFM) ----------
    "analytics_rfm_scalable",
    "curation_pps_sample", "profiling_quantiles_distributed",
    "profiling_gini_concentration", "analytics_chi2_independence",
    "analytics_rank_sum_test", "analytics_kruskal_wallis",
    "join_scd2_point_in_time", "sketch_sampled_heavyhitters",
    "events_survival_hazard", "events_uplift_did",
    "curation_chunk_overlap",
    "c6_int_via_float", "curation_stratified_sample",
    "curation_line_dedup", "text_ngram_diversity",
    "curation_hashed_features", "curation_cross_source_overlap",
    "text_html_strip", "text_cooccurrence_pmi", "text_inverted_index",
    "curation_source_scorecard", "curation_weighted_reservoir",
    "curation_feature_matrix", "curation_contrastive_positives",
    "text_unigram_logprob", "dedup_canonical_by_quality",
    "embedding_mean_pool",
    "tpch_q19_discounted_revenue", "tpch_q22_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q11_important_parts",
    "tpch_q16_parts_supplier_relationship", "tpch_q20_dominant_suppliers",
    "events_anomaly_zscore", "analytics_market_basket",
    "events_audience_overlap", "events_purchase_intervals",
    "curation_embedding_decontaminate", "curation_source_mix",
    "dedup_ngram_containment",
    # deferred to r11 (family twins already sampled this round):
    # text_bigram_logprob, events_audience_overlap_sketch,
    # embedding_quantize_int8, c16_strip_punct, curation_word_dropout,
    # curation_curriculum_phases, text_vocab_richness,
    # curation_cluster_balanced_sample
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
