"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the noop sink (no driver collect, no disk
write) — measures scan + compute + shuffle, not result serialization.
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
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from phenoxtract_spark import get_spark

    import __spark_entry__ as ent

    spark = get_spark(app_name="phenoxtract-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = ent.queries()
    results: dict[str, float] = {}
    # warm the JVM/codegen once with a trivial action
    spark.range(1000).count()
    total0 = time.time()
    for name in HEADLINE:
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        results[name] = round(time.time() - t0, 3)
    total = round(time.time() - total0, 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
