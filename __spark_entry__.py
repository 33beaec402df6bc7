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
    # --- r7 first-time rotation (never driver-checked before; pool from
    # tools/rotation_status.py — the r6-continuation operators lead) ----
    # CDC family: IVM, time travel, two-writer conflicts
    "cdc_incremental_agg", "cdc_time_travel", "cdc_merge_conflicts",
    # similarity: hybrid RRF fusion, nDCG@k, recall@k
    "similarity_hybrid_rrf", "similarity_ann_ndcg", "similarity_ann_recall",
    # layout: zone-map pruning + the Hilbert curve (slowest registered
    # query — its r7 perf work needs a driver row too)
    "layout_zonemap_prune", "layout_hilbert_files",
    # multimodal: VAD, aHash + banded pairs, mean-pool, PCM resample
    "multimodal_vad_segments", "multimodal_image_ahash",
    "multimodal_ahash_pairs", "multimodal_image_meanpool",
    "multimodal_pcm_resample",
    # web / curation continuation operators
    "web_url_canonical_dedup", "curation_pareto_frontier",
    "curation_lr_calibration", "curation_length_bucket_padding",
    "curation_shrunk_source_quality", "curation_span_corruption",
    # text / quality / profiling
    "text_cross_entropy_filter", "quality_group_digest",
    "quality_table_diff", "quality_drift_report",
    "profiling_benford_digits", "profiling_join_fanout",
    # events / behavior
    "events_trailing_ewma", "events_seasonal_anomaly",
    "stateful_running_totals",
    # geo + substring coverage + sketches
    "geo_grid_radius_join", "geo_nearest_supplier",
    "dedup_substring_coverage", "sketch_kmv_setops",
    "sketch_hll_sliding_distinct",
    # analytics first-timer + the r7 capstone: the composed FineWeb/
    # CCNet-style web-curation pipeline (WARC -> URL dedup -> langid ->
    # Gopher -> CCNet LM filter -> MinHash-LSH -> decontaminate ->
    # token budget) as ONE plan with a full chained-CTE oracle
    "analytics_mad_outliers", "curation_web_pipeline_e2e",
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
