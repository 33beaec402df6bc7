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


# Stable registry ordering: a representative cross-section first — the
# reference-core ETL spine, the events/streaming block, AND the
# dedup/similarity/text/clustering scale block — so any prefix of the
# registry (e.g. a sampled correctness snapshot) exercises every operator
# family rather than just the modules that happen to import first.
_PRIORITY = [
    # §2.3 casting / scalar functions
    "c1_trim_empty_to_null", "c2_integral_promotion", "c3_ambivalent_cast",
    "c5_bool_parse", "c7_multiformat_date", "c10_timestamp_parse",
    "c13_age_to_iso", "c14_date_diff_iso", "c17_prefixed_id",
    # §2.4 mapping
    "m1_alias_map", "m2_synonym_mapping", "m3_ontology_normalize",
    "m5_membership_split", "m6_multi_id_extraction",
    # §2.1 sources / pivoting
    "s3_transpose", "s4_unpivot",
    # §2.5 grouping / assembly
    "g1_collect_individual", "g2_group_collect", "g3_single_valued",
    "g5_row_zip", "g6_upsert_last", "g7_header_collapse",
    "g8_variant_classification", "g8_interpretation_assembly",
    "g10_packet_flat", "g10_packet_json", "g11_resource_prefixes",
    "g13_medical_actions",
    # §2.6 ontology + e2e
    "x2_bidict_priority_lookup", "pipeline_e2e_packets",
    # event-time windows
    "events_tumbling_hour", "events_sliding_window", "events_sessionize",
    # LLM-pipeline: dedup family
    "dedup_exact", "dedup_minhash_signature", "dedup_lsh_candidates",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_simhash_pairs",
    "dedup_pipeline_canonical", "dedup_connected_components",
    # LLM-pipeline: similarity search
    "similarity_neardup_pairs", "similarity_ivf_topk",
    "similarity_lsh_candidate_pairs",
    # LLM-pipeline: text analysis / clustering
    "text_quality", "text_fingerprint", "text_tfidf_topk",
    "clustering_kmeans_assign",
    # semantic dedup / fuzzy match / mixing
    "dedup_semantic_canonical", "dedup_levenshtein_pairs",
    "curation_embedding_decontaminate", "curation_source_mix",
    # behavioral event-sequence analytics
    "events_funnel", "events_retention_cohort",
    "events_transition_matrix", "events_anomaly_zscore",
    # mergeable sketches / semi-structured
    "sketch_bloom_membership", "sketch_histogram_quantiles",
    "events_json_props", "events_pattern_followed_by",
    # analytics spine
    "tpch_q1_pricing_summary", "window_running_total",
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
