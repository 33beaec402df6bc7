"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver collect, no disk
write) — measures scan + compute + shuffle, not result serialization.

A second **sf1 scale probe** (disable with SPARK_GRAFT_SF1=0) synthesizes a
10x dataset from sf0.1 (tools/gen_scale_data.py, cached in /tmp) and re-runs
the scale-sensitive queries there.  The probe exists to catch nonlinear
blowups — a bucketed join degrading to quadratic shows up as >>10x the sf0.1
time.  Per-query seconds land under the "sf1" key; the headline "value"
stays the sf0.1 total so round-over-round comparisons stay apples-to-apples.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # reference-core ETL spine
    "g10_packet_json",
    "g10_packet_flat",
    "c3_ambivalent_cast",
    "c14_date_diff_iso",
    "m2_synonym_mapping",
    "g2_group_collect",
    "g6_upsert_last",
    # analytics breadth
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "join_star_revenue",
    "window_running_total",
    "range_join_ship_window",
    # events / streaming-shaped
    "events_tumbling_hour",
    "events_sessionize",
    # scale operators
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_lsh_candidates",
    "dedup_pipeline_canonical",
    "dedup_simhash",
    "similarity_bruteforce_topk",
    "text_quality",
    "text_fingerprint",
    # round-3 additions: semantic dedup, composed cleaning, CEP pattern
    "dedup_semantic_canonical",
    "curation_clean_pipeline",
    "events_pattern_followed_by",
    # round-3 late additions: iterative graph + the join-heaviest of the
    # five new TPC-H shape adaptations
    "graph_pagerank_similarity",
    "tpch_q9_product_type_profit",
    # round-4 additions (not in the r1/r3 overlap set): the unstubbed
    # multimodal codecs (real BMP/WAV/Y4M encode→parse→compute over
    # mapInPandas) and BPE tokenizer application
    "multimodal_image_roundtrip",
    "multimodal_wav_energy",
    "multimodal_y4m_luma",
    "text_bpe_apply",
    # round-8 additions: the new mining family's cheapest representatives
    # (blocked fuzzy linkage, exact-sufficient-statistics correlation,
    # per-series trend fold)
    "er_fuzzy_part_pairs",
    "profiling_numeric_correlation",
    "analytics_holt_linear",
    # round-9 addition: the skew-mitigation flagship (salted shuffle
    # join on the planted 90%-hot fk — SHJ on (key, salt), no SMJ)
    "skew_salted_join_supplier",
    # round-9 continuation: sample-then-verify heavy hitters (two-pass
    # candidate/broadcast-verify), the PIT/SCD2 feature-store join, and
    # the zero-shuffle overlap chunker
    "sketch_sampled_heavyhitters",
    "join_scd2_point_in_time",
    "curation_chunk_overlap",
    # round-9 stats/sweep batch: the distributed prefix-scan family —
    # exact-k PPS sampling (offsets-checkpoint main plan), rank-selected
    # exact quantiles, and the Lorenz/Gini concentration audit
    "curation_pps_sample",
    "profiling_quantiles_distributed",
    "profiling_gini_concentration",
    # round-10 addition: the scale-safe RFM (three exact global ntiles
    # via the bucketed prefix scan — no data-sized single-task sort)
    "analytics_rfm_scalable",
    # round-11 additions: the remaining sweep-spine statistics (median/
    # MAD via the double rank-selection pass, global + per-segment
    # equi-depth histograms, and the per-group exact-quantile twin of
    # the grouped-percentile baseline)
    "profiling_mad_outliers",
    "profiling_histogram_equidepth",
    "profiling_histogram_grouped",
    "profiling_quantiles_grouped",
    # round-11 late addition: the per-segment MCV (two-pass
    # sample-then-verify per group — the third ANALYZE-style
    # per-partition statistic)
    "profiling_mcv_grouped",
    # round-12 additions: the real Common Crawl .warc.gz member framing
    # (member-wise gzip encode -> strict member-walk decode) and the
    # stdlib PNG codec (deflate + 5-filter unfilter through the shared
    # image pipeline)
    "warc_gz_ingest_roundtrip",
    "multimodal_png_roundtrip",
]

# Scale-sensitive subset re-run at sf1 (10x).  Linear operators should land
# near 10x their sf0.1 time; anything quadratic-in-disguise (all-pairs joins,
# skewed buckets) blows past that and gets flagged by the ratio.
SF1_PROBE = [
    "dedup_exact",
    "dedup_minhash_signature",
    "dedup_lsh_candidates",
    "dedup_pipeline_canonical",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
    "similarity_ivf_topk",
    "similarity_lsh_candidate_pairs",
    "events_sessionize",
    "events_tumbling_hour",
    "text_quality",
    "text_fingerprint",
    "tpch_q1_pricing_summary",
    # round-3 additions: bucket-bounded semantic dedup and the composed
    # cleaning pipeline are the scale-sensitive new paths
    "dedup_semantic_canonical",
    "curation_clean_pipeline",
    # round-8 additions: the lineitem-scan-bound exact correlation (pure
    # linear probe) and the embedding outlier screen (linear in vectors)
    "profiling_numeric_correlation",
    "embedding_centroid_outliers",
    # iterative rank propagation: per-round cost ∝ |edges|, so the ratio
    # tracks candidate-pair growth, not vertex count
    "graph_pagerank_similarity",
    # vocabulary-dim broadcast geometry (tf materialized once)
    "text_tfidf_topk",
    # round-3 late additions: the two new shuffle-bearing curation paths
    # (feature hashing's (doc,bucket) agg; the digest self-join behind the
    # cross-source matrix)
    "curation_hashed_features",
    "curation_cross_source_overlap",
    # exact-recall similarity join: prefix-bucket geometry is the scale
    # question (rarity-first ordering must keep Σ|bucket|² bounded as the
    # near-dup density grows 10x)
    "dedup_prefix_join",
    # cross-boundary incremental dedup: cost must track the 10% batch
    "dedup_incremental_batch",
    # BPE rounds run on the distinct-word vocabulary — the ratio tracks
    # vocab growth (sublinear), not corpus size
    "text_bpe_merges",
    # round-4: behavior family joins the probe (single-shuffle window
    # passes over events — ratios should track event count, ~10x)
    "events_funnel",
    "events_retention_cohort",
    # round-4: the unstubbed codecs are Python-side mapInPandas — the probe
    # proves encode/parse/compute stays linear in doc count (partition-
    # parallel, no shuffle), and BPE apply's replace-chain scales with text
    "multimodal_image_roundtrip",
    "multimodal_wav_energy",
    "multimodal_y4m_luma",
    "text_bpe_apply",
    # round-5: the new PQ-ADC path (one Arrow encode+score pass; the ratio
    # tracks corpus size × |queries|) and the now-Arrow-vectorized
    # cluster-histogram composite (edge subtree materialized once)
    "similarity_pq_adc_topk",
    "similarity_ivfpq_topk",
    "dedup_cluster_size_histogram",
    # round-5 late: Z-order layout is two scans + one coarse groupBy —
    # the ratio should track row count (~10x)
    "layout_zorder_files",
    # round-6: the exact-substring family is the new heavy exact path —
    # witness volume tracks planted duplication (Σ span_len), so the
    # ratio measures true-dup density, not corpus size; clean adds the
    # complement-rebuild joins on top of the same subtree
    "dedup_substring_spans",
    "dedup_substring_clean",
    "curation_substring_decontaminate",
    # round-6: container/codec + sketch + retrieval + CDC + spatial —
    # each one shuffle-light by construction (see PLANS.md pins)
    "warc_ingest_roundtrip",
    "sketch_hll_users",
    "text_bm25_topk",
    "cdc_apply_customers",
    "geo_grid_radius_join",
    "curation_quality_lr_train",
    # round-6 late: compressed-JSONL ingest and the span-corruption
    # generator (two windows + ordered concat) are the remaining
    # Python-side and window-heavy new paths
    "jsonl_gz_ingest_roundtrip",
    "curation_span_corruption",
    # round-6 continuation: the new sketch-algebra paths are sketch-sized
    # after one narrow pass (ratios ~10x scan cost); DSIR is one bigram
    # explode + broadcast dims; the two new codec stats are partition-
    # local Python like their siblings; Hilbert layout mirrors Z-order;
    # cluster-balanced sampling is the assignment kernel + one window
    "sketch_join_size_estimate",
    "sketch_hll_sliding_distinct",
    "curation_dsir_select",
    "multimodal_pcm_resample",
    "multimodal_image_meanpool",
    "layout_hilbert_files",
    "curation_cluster_balanced_sample",
    "curation_gopher_rules",
    # round-6 continuation 2: IVM maintains from |changes| not |table|
    # (the ratio tracks the change stream); time-travel is the same
    # window+join as cdc_apply; hybrid RRF's legs are the corpus-scale
    # work (fusion is leg-sized); zone-map pruning is two scans + two
    # coarse groupBys; VAD extends the linear codec family; URL dedup is
    # one expression pass + one groupBy; the Pareto frontier's bucket
    # recurrence must stay flat as distinct-quality count grows; the
    # digest and EWMA are single-window/groupBy passes
    "cdc_incremental_agg",
    "cdc_time_travel",
    "similarity_hybrid_rrf",
    "layout_zonemap_prune",
    "multimodal_vad_segments",
    "web_url_canonical_dedup",
    "curation_pareto_frontier",
    "quality_group_digest",
    "curation_shrunk_source_quality",
    "events_trailing_ewma",
    # round-6 continuation 3: conflicts cost |touched keys|; the
    # seasonal screen is one agg + one bounded window; nDCG reuses the
    # recall legs; aHash is the codec family's fingerprint pass
    "cdc_merge_conflicts",
    "events_seasonal_anomaly",
    "similarity_ann_ndcg",
    "multimodal_image_ahash",
    # held-out LM filtering: three reference-bounded broadcast dims over
    # one pass of the scored token stream
    "text_cross_entropy_filter",
    # the calibration pass re-runs the bounded-driver-traffic GD loop +
    # one broadcast predict join; the padding report is one tiny groupBy
    "curation_lr_calibration",
    "curation_length_bucket_padding",
    # banded-aHash pairs: Σ|bucket|² candidates over image fingerprints
    "multimodal_ahash_pairs",
    # round-7 capstone: the composed web-curation pipeline — WARC codec
    # pass + LM dims + LSH + decontamination chained in one plan; the
    # ratio tracks corpus size (every stage is broadcast- or
    # bucket-bounded; checkpoints pin the shared subtrees)
    "curation_web_pipeline_e2e",
    # round-7 late: the shared-span report (one witness join feeding
    # both consumers), CDC log expiry (one key window), Markov
    # attribution (one path window + dimension-sized chain solve), and
    # onion peeling (8 alive-set semi-join rounds) — each linear in its
    # table by construction
    "dedup_substring_shared_report",
    "cdc_log_expiry",
    "events_markov_attribution",
    "graph_onion_layers",
]

# r5 (verdict #7b/#4): the heaviest sf1 queries get TWO reps and report the
# best — the VM's one-shot noise is ±50%, which forced every cross-round
# perf judgment on these through rebuttal evidence.  The per-rep times land
# under sf1.reps so the noise itself stays observable.  similarity_ivf_topk
# is included per verdict #4 (its r4 2.5→4.7 s move needed a second rep).
SF1_BEST_OF_2 = {
    "dedup_substring_spans",
    "dedup_substring_clean",
    "dedup_prefix_join",
    "dedup_pipeline_canonical",
    "dedup_semantic_canonical",
    "similarity_lsh_candidate_pairs",
    "similarity_ivf_topk",
    "multimodal_image_roundtrip",
}


def _warm_session(spark, warm_dir: str) -> None:
    """JVM/session first-use warm-up (r3; extended r12 — see
    OPTIMIZATION_r12.md "Measurement fix").  Codegen, the parquet reader,
    shuffle machinery, broadcast-hash-join build, window exec, the
    object-hash aggregate (collect_list/sort_array), the JSON writer, the
    noop sink, and the Python/Arrow worker pool all have first-use costs
    (several seconds total on slow hosts) that otherwise land on whichever
    HEADLINE query happens to exercise each of them first — engine
    machinery cost, not query work, and pure noise for cross-round
    comparison.  Everything here runs on the 5-row sf0.001 region table or
    a synthetic range: no benched relation is precomputed or cached."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark.range(1000).count()
    if os.path.isdir(warm_dir):
        w = spark.read.parquet(os.path.join(warm_dir, "region.parquet"))
        w.groupBy(w.columns[0]).count().write.format("noop").mode("overwrite").save()
        k = w.columns[0]
        j = w.join(F.broadcast(w.select(k)), k).withColumn(
            "_rn", F.row_number().over(Window.partitionBy(k).orderBy(k))
        )
        (
            j.groupBy(k)
            .agg(
                F.to_json(
                    F.struct(F.sort_array(F.collect_list("_rn")).alias("a"))
                ).alias("_j")
            )
            .write.format("noop").mode("overwrite").save()
        )
    # spin up the Arrow worker pool at cluster width: numpy/pandas import
    # once per Python worker (~1 s each), workers are reused afterwards by
    # every pandas_udf / mapInPandas query in the session
    par = spark.sparkContext.defaultParallelism

    def _touch(batches):
        import numpy as np  # noqa: F401  (the import IS the warm-up)

        for pdf in batches:
            yield pdf

    (
        spark.range(par * 4)
        .repartition(par)
        .mapInPandas(_touch, "id long")
        .write.format("noop").mode("overwrite").save()
    )


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from phenoxtract_spark import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="phenoxtract-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    results: dict[str, float] = {}
    warm_dir = "/root/testdata/sf0.001"
    _warm_session(spark, warm_dir)
    errors: dict[str, str] = {}
    warm: dict[str, float | str] = {}  # "ERR" marks a failed warm re-run
    do_warm = os.environ.get("SPARK_GRAFT_WARM", "1") != "0"
    total0 = time.time()
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            results[name] = round(time.time() - t0, 3)
        except Exception as exc:  # one broken query must never zero the artifact
            results[name] = "ERR"
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        if do_warm:
            # immediate second run: steady-state with this query's codegen/
            # JIT already paid (SCALING.md "one-shot vs steady-state") —
            # measured back-to-back so session state is comparable.  The
            # official metric stays the first-run total.
            t0 = time.time()
            try:
                df = qs[name](spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                warm[name] = round(time.time() - t0, 3)
            except Exception:
                warm[name] = "ERR"
    total = round(sum(v for v in results.values() if isinstance(v, float)), 3)
    wall = round(time.time() - total0, 3)  # headline loop wall-clock (cold+warm)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    payload = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        # r3 changed "value" from wall-clock to the sum of cold per-query
        # times (warm re-runs made wall-clock ≈ 2x the cold work).  Record
        # both explicitly so cross-round comparisons are unambiguous:
        # r1/r2 artifacts' "value" ≈ wall_sec; r3+ "value" == cold_total_sec.
        "cold_total_sec": total,
        "wall_sec": wall,
    }
    if errors:
        payload["errors"] = errors
    if warm:
        payload["warm"] = {
            "queries": warm,
            "total_sec": round(
                sum(v for v in warm.values() if isinstance(v, float)), 3
            ),
        }

    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == 0.1:
        try:
            from tools.gen_scale_data import generate

            g0 = time.time()
            sf1_dir = generate(src_dir=sf_dir)
            gen_sec = round(time.time() - g0, 3)
            # r4: probe in a FRESH session — after 54 headline executions the
            # old JVM's accumulated state (codegen cache, GC pressure) was
            # measured inflating late sf1 numbers up to ~2.5x vs fresh-JVM
            # isolation; a clean session makes the ratios reproducible.
            spark.stop()
            spark = get_spark(app_name="phenoxtract-bench-sf1")
            spark.sparkContext.setLogLevel("ERROR")
            _warm_session(spark, warm_dir)
            sf1_results: dict[str, float | str] = {}  # "ERR" on failure
            sf1_reps: dict[str, list[float]] = {}
            for name in SF1_PROBE:
                if name not in qs:
                    continue
                n_reps = 2 if name in SF1_BEST_OF_2 else 1
                times: list[float] = []
                for _ in range(n_reps):
                    t0 = time.time()
                    try:
                        df = qs[name](spark, sf1_dir)
                        df.write.format("noop").mode("overwrite").save()
                        times.append(round(time.time() - t0, 3))
                    except Exception as exc:
                        # record the failure only when NO rep succeeded: a
                        # clean rep-1 time plus an errors entry for a flaky
                        # rep 2 would be contradictory (r5 ADVICE) — a
                        # genuinely flaky query should read as ERR, not as
                        # a clean best-of time.
                        sf1_results[name] = "ERR"
                        payload.setdefault("errors", {})[f"sf1:{name}"] = (
                            f"{type(exc).__name__}: {exc}"[:300]
                        )
                        times = []
                        break
                if times:
                    sf1_results[name] = min(times)
                    if len(times) > 1:
                        sf1_reps[name] = times
            payload["sf1"] = {
                "gen_sec": gen_sec,
                "queries": sf1_results,
                "reps": sf1_reps,
                "total_sec": round(
                    sum(v for v in sf1_results.values() if isinstance(v, float)), 3
                ),
                "note": "10x sf0.1 via tools/gen_scale_data.py; copies are near-dups (dedup stress)",
            }
        except Exception as exc:  # the probe must never sink the headline bench
            payload["sf1"] = {"error": f"{type(exc).__name__}: {exc}"}

    # The driver retains only the LAST ~2000 chars of stdout and parses the
    # last complete JSON line inside that window — the full payload outgrew
    # it in r2 and every BENCH_r{2..6}.json landed with "parsed": null
    # (r6 verdict #4).  So: the COMPLETE payload goes to BENCH_last.json,
    # and stdout gets ONE compact line that always fits the window.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_last.json"), "w") as fh:
            fh.write(json.dumps(payload) + "\n")
    except OSError:
        pass

    compact = {
        "metric": payload["metric"],
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "cold_total_sec": payload["cold_total_sec"],
        "wall_sec": payload["wall_sec"],
        "n_queries": len(results),
        "n_errors": len(errors),
        # 2dp in the compact line (full 3dp lives in BENCH_last.json):
        # at 49 headline queries the 3dp line ran 1808 of the 1900-char
        # window — one more round of additions would have silently
        # dropped the whole per-query dict via the guard below
        "queries": {k: (round(v, 2) if isinstance(v, float) else v)
                    for k, v in results.items()},
        "detail": "BENCH_last.json",
    }
    if warm:
        compact["warm_total_sec"] = payload["warm"]["total_sec"]
    if isinstance(payload.get("sf1"), dict) and "total_sec" in payload["sf1"]:
        compact["sf1_total_sec"] = payload["sf1"]["total_sec"]
        compact["sf1_n_queries"] = len(payload["sf1"]["queries"])
    line = json.dumps(compact)
    if len(line) > 1900:  # never outgrow the driver's tail window again
        compact.pop("queries", None)
        line = json.dumps(compact)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
