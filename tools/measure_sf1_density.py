"""Measure WHY the two sf1-superlinear pipelines scale the way they do
(r3 verdict #4): record candidate-pair / dup-cluster / bucket cardinalities
at sf0.1 vs sf1 so the bench ratios are explained by measured near-dup
density, not inference.

The sf1 generator (tools/gen_scale_data.py) makes 10 NEAR-dup copies of
every sf0.1 document, so true-pair count grows ~quadratically in the copy
factor (each organic dup cluster of size c becomes 10c => pairs grow
~(10c choose 2)/(c choose 2) ≈ 100x for large c, plus 45 pairs per
previously-unique doc).  Candidate/verify stages cost ∝ |true pairs|, so
their sf1 ratio is EXPECTED above 10x — this script prints the numbers
that show it, including max bucket size (the quadratic-risk bound).

Usage: python tools/measure_sf1_density.py   (prints a markdown table)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def measure(spark, sf_dir: str) -> dict:
    from phenoxtract_spark import queries_core
    from phenoxtract_spark.operators import dedup

    d = queries_core.read_table(spark, sf_dir, "documents")
    t = dedup.normalized_text(F.col("text"))

    # --- dedup_pipeline_canonical geometry (same params as the query) ---
    sig = dedup.minhash_signature(d, "doc_id", "text", num_hashes=4, k=3)
    bands = dedup.lsh_bands(sig, rows_per_band=2).localCheckpoint(eager=True)
    bucket_stats = (
        bands.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("bigint").alias("pair_budget"),
        )
        .first()
    )
    cand = dedup.lsh_candidate_pairs(bands).localCheckpoint(eager=True)
    n_cand = cand.count()
    verified = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", k=3, threshold=0.3, candidates=cand
    ).select("id_a", "id_b").localCheckpoint(eager=True)
    n_verified = verified.count()
    clusters = (
        verified.select(F.col("id_a").alias("doc_id"), F.col("id_b").alias("m"))
        .unionByName(verified.select(F.col("id_b").alias("doc_id"), F.col("id_a").alias("m")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(F.count(F.lit(1)).alias("docs_in_clusters"), F.max("deg").alias("max_degree"))
        .first()
    )

    # --- curation_clean_pipeline geometry -------------------------------
    feat = d.select(
        "doc_id", t.alias("_t"), F.length(t).cast("bigint").alias("n_chars"),
        F.round(
            F.length(F.regexp_replace(t, "[^a-z ]", "")).cast("double")
            / F.length(t).cast("double"), 6,
        ).alias("alpha_ratio"),
    ).filter(F.length(F.col("_t")) > 0)
    kept = feat.filter(
        F.col("n_chars").between(50, 20000) & (F.col("alpha_ratio") >= 0.6)
    ).localCheckpoint(eager=True)
    cur = kept.agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_chars").alias("kept_chars"),
        F.countDistinct(F.md5(F.col("_t"))).alias("distinct_digests"),
    ).first()

    return {
        "docs": d.count(),
        "n_buckets": bucket_stats["n_buckets"],
        "max_bucket": bucket_stats["max_bucket"],
        "pair_budget": bucket_stats["pair_budget"],
        "candidates": n_cand,
        "verified": n_verified,
        "docs_in_clusters": clusters["docs_in_clusters"],
        "max_degree": clusters["max_degree"],
        "kept_docs": cur["kept_docs"],
        "kept_chars": cur["kept_chars"],
        "distinct_digests": cur["distinct_digests"],
    }


def main():
    from phenoxtract_spark import get_spark
    from tools.gen_scale_data import generate

    spark = get_spark(app_name="sf1-density")
    spark.sparkContext.setLogLevel("ERROR")
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = generate(src_dir=sf01)
    a, b = measure(spark, sf01), measure(spark, sf1)
    keys = list(a)
    print("| metric | sf0.1 | sf1 | ratio |")
    print("|---|---|---|---|")
    for k in keys:
        r = (b[k] / a[k]) if a[k] else float("nan")
        print(f"| {k} | {a[k]:,} | {b[k]:,} | {r:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
