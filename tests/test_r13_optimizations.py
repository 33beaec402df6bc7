"""Focused pins for the r13 optimization-round internals changes:

- substring_anchors carries ``pos`` as INT (guide §2.3 narrower types —
  4 bytes off every anchor row crossing the self-join shuffle) while the
  span surface contract stays BIGINT, so the oracle schema cannot drift;
- cross_entropy_score's ``model=`` injection seam (guide §2.6 stage
  overlap in the web pipeline) returns bit-identical rows to the default
  in-line dim build;
- session.fan_out memoizes its driver-side partition probe per
  (application, analyzed plan) — one physical planning per repeated
  relation instead of one per query build (r12 verdict item 7).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_substring_anchor_pos_is_int_and_span_surface_bigint(spark):
    from phenoxtract_spark.operators import dedup

    shared = "abcdefghijklmnopqrstuvwxyz0123456789ABCD"  # 40 distinct chars
    df = spark.createDataFrame(
        [(1, "first-" + shared), (2, shared + "-second"), (3, "zzz")],
        "doc_id bigint, text string",
    )
    anchors = dedup.substring_anchors(df, "doc_id", "text", gram=10)
    schema = {f.name: f.dataType for f in anchors.schema.fields}
    assert isinstance(schema["pos"], T.IntegerType), schema["pos"]
    assert isinstance(schema["h"], T.LongType)

    spans = dedup.duplicate_span_pairs(df, "doc_id", "text", gram=10)
    sschema = {f.name: f.dataType for f in spans.schema.fields}
    # the oracle contract: positions and lengths surface as BIGINT
    for col in ("start_a", "start_b", "span_len"):
        assert isinstance(sschema[col], T.LongType), (col, sschema[col])
    rows = spans.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id_a, r.id_b, r.start_a, r.start_b, r.span_len) == (1, 2, 6, 0, 40)


def test_cross_entropy_model_injection_matches_inline_build(spark):
    from phenoxtract_spark.operators import textanalysis

    docs = spark.createDataFrame(
        [(i, f"the quick fox {i % 3} jumps over the dog {i % 5}")
         for i in range(40)],
        "doc_id bigint, text string",
    )
    train = docs.filter(F.col("doc_id") % 10 < 3)
    score = docs.filter(F.col("doc_id") % 10 >= 3)
    base = textanalysis.cross_entropy_score(train, score, "doc_id", "text")
    lm = textanalysis.bigram_lm_dims(train, "doc_id", "text")
    injected = textanalysis.cross_entropy_score(
        train, score, "doc_id", "text", model=lm
    )
    a = {r["id"]: (r["n_bigrams"], r["cross_entropy"]) for r in base.collect()}
    b = {r["id"]: (r["n_bigrams"], r["cross_entropy"]) for r in injected.collect()}
    assert a == b and len(a) > 0


def test_fan_out_probe_memoized_per_relation(spark):
    from phenoxtract_spark import session as sess

    df = spark.range(0, 100, 1, 2).select(F.col("id").alias("k"))
    sess._FAN_OUT_PROBE_CACHE.clear()
    out1 = sess.fan_out(df)
    assert len(sess._FAN_OUT_PROBE_CACHE) == 1
    # a semantically identical relation hits the cache, not df.rdd
    df2 = spark.range(0, 100, 1, 2).select(F.col("id").alias("k"))
    probed = []
    orig = type(df2).rdd

    class _Spy:
        def __get__(self, obj, objtype=None):
            probed.append(True)
            return orig.__get__(obj, objtype)

    try:
        type(df2).rdd = _Spy()
        out2 = sess.fan_out(df2)
    finally:
        type(df2).rdd = orig
    assert not probed, "cached relation re-probed df.rdd"
    # and the guard semantics are unchanged: fewer partitions than
    # parallelism → round-robin fan-out
    par = spark.sparkContext.defaultParallelism
    if par > 2:
        assert out1.rdd.getNumPartitions() == par
        assert out2.rdd.getNumPartitions() == par
