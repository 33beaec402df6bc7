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
    # --- representatives (driver-green in earlier rounds; the r10
    # verdict's named keeps) --------------------------------------------
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
    # similarity family rep (pytest pins the prefix to cover the family)
    "similarity_ivf_topk",
    # r9's TWO red rows (DECIMAL-render hash divergence) — now integer
    # cents on both engines; their green r10 rows are the fix evidence
    "grouping_sets_revenue", "analytics_rfm_segments",
    # --- r12 first-time rows: the round's two new operators (the real
    # .warc.gz member framing and the stdlib PNG codec) ----------------
    "warc_gz_ingest_roundtrip", "multimodal_png_roundtrip",
    # --- last-seen-age recycling (the standing r11 policy: with every
    # query driver-checked at least once, the non-rep slots recycle the
    # queries whose most recent driver row is OLDEST — r11 refreshed
    # the r1–r3 stragglers, so this round takes the remaining r2 rows,
    # all of r3/r4, and the three oldest r5 rows; tools/
    # rotation_status.py + the CORRECTNESS_r* artifacts derive the
    # ordering) --------------------------------------------------------
    "window_rank", "cube_counts",                                   # r2
    "g10_packet_flat", "similarity_neardup_pairs",                  # r3
    "g8_variant_classification", "g8_interpretation_assembly",
    "g1_collect_individual", "g11_resource_prefixes",
    "c10_timestamp_parse", "events_sliding_window",
    "similarity_lsh_candidate_pairs", "clustering_kmeans_assign",
    "dedup_levenshtein_pairs",
    "window_ntile_distribution", "asof_nearest_event",              # r4
    "similarity_lsh_signature", "text_langid",
    "multimodal_image_roundtrip", "sketch_bloom_membership",
    "sketch_histogram_quantiles", "sketch_kmv_distinct",
    "dedup_incremental_batch", "dedup_prefix_join",
    "events_session_stats", "curation_leakproof_split",
    "dedup_pair_features", "text_bpe_merges",
    "embedding_ring_negatives", "embedding_label_propagation",
    "embedding_hard_negatives", "tpch_q9_product_type_profit",
    "events_funnel", "events_retention_cohort",
    "events_transition_matrix", "events_pattern_followed_by",
    "curation_clean_pipeline",
    "c14_date_diff_iso", "m6_multi_id_extraction", "s4_unpivot",    # r5
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
