"""Unit tests for the round-8 mining operators: record linkage,
domain-mixture reweighting, readability, Holt linear smoothing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_blocked_fuzzy_pairs_blocks_and_verifies(spark):
    """Pairs only form inside a block; the Levenshtein gate filters;
    ids order id_a < id_b."""
    from phenoxtract_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "red widget", "B1", 5),
            (2, "red widgett", "B1", 5),   # dist 1 -> match
            (3, "blue bolt", "B1", 5),     # dist >3 from both -> no match
            (4, "red widget", "B2", 5),    # same name, other block -> no pair
        ],
        "id bigint, name string, brand string, size int",
    )
    out = blocked_fuzzy_pairs(df, "id", "name", ["brand", "size"], max_dist=3)
    rows = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    assert rows == {(1, 2): 1}


def test_blocked_fuzzy_pairs_max_block_valve(spark):
    """The valve lives IN the plan (r9: no eager guard job per call), so
    it fires lazily at action time via raise_error, not at construction."""
    from phenoxtract_spark.operators.linkage import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [(i, f"n{i}", "B", 1) for i in range(5)],
        "id bigint, name string, brand string, size int",
    )
    out = blocked_fuzzy_pairs(df, "id", "name", ["brand", "size"],
                              max_dist=3, max_block=4)  # lazy: no raise yet
    with pytest.raises(Exception, match="max_block"):
        out.collect()


def test_er_clusters_transitive_and_singletons(spark):
    """A~B and B~C land in one cluster even though A,C never compared;
    unmatched records keep themselves with cluster_size 1."""
    from phenoxtract_spark.operators.linkage import er_clusters

    recs = spark.createDataFrame([(i,) for i in [1, 2, 3, 9]], "id bigint")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a bigint, id_b bigint"
    )
    out = {r.id: (r.canonical_id, r.cluster_size)
           for r in er_clusters(recs, "id", pairs).collect()}
    assert out == {1: (1, 3), 2: (1, 3), 3: (1, 3), 9: (9, 1)}


def test_domain_mixture_weights_matches_python_replay(spark):
    """The multiplicative-weights trajectory matches a pure-Python
    replay: harder domains (lower quality) gain weight, Σweight = 1."""
    from phenoxtract_spark.operators.curation import domain_mixture_weights

    rows = [(i, "easy", 0.9) for i in range(4)] + [
        (i + 10, "hard", 0.1) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "id bigint, dom string, q double")
    out = {r.domain: r for r in
           domain_mixture_weights(df, "dom", F.col("q"), rounds=3,
                                  eta=0.5).collect()}

    # python replay with the same rounding grid
    losses = {"easy": round(1.0 - 0.9, 9), "hard": round(1.0 - 0.1, 9)}
    w = {d: round(1.0 / 2, 9) for d in losses}
    for _ in range(3):
        lbar = sum(round(w[d] * losses[d], 9) for d in w)
        raw = {d: round(w[d] * (1.0 + 0.5 * (losses[d] - lbar)), 9) for d in w}
        tot = sum(raw.values())
        w = {d: round(raw[d] / tot, 9) for d in w}
    for d in w:
        assert out[d].weight == pytest.approx(w[d], abs=1e-9)
        assert out[d].domain_loss == pytest.approx(losses[d], abs=1e-9)
    assert out["hard"].weight > out["easy"].weight
    assert abs(sum(r.weight for r in out.values()) - 1.0) < 1e-8


def test_readability_scores_counts(spark):
    from phenoxtract_spark.operators.textanalysis import readability_scores

    df = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),   # 2 sentences, 6 words
            (2, "no punctuation here"),          # floored at 1 sentence
            (3, "   "),                          # zero words -> NULL grade
        ],
        "doc_id bigint, text string",
    )
    out = {r.id: r for r in readability_scores(df, "doc_id", "text").collect()}
    assert (out[1].n_sentences, out[1].n_words) == (2, 6)
    # syllable proxy: vowel groups — "e a a e o a" -> The(1) cat(1)
    # sat(1) The(1) dog(1) ran(1) = 6
    assert out[1].n_syllables == 6
    expected = round(0.39 * 6 / 2 + 11.8 * 6 / 6 - 15.59, 4)
    assert out[1].fk_grade == pytest.approx(expected)
    assert out[2].n_sentences == 1
    assert out[3].n_words == 0 and out[3].fk_grade is None


def test_holt_linear_forecast_matches_python_fold(spark):
    from phenoxtract_spark.operators.behavior import holt_linear_forecast

    xs = [4.0, 6.0, 5.0, 7.0, 3.0, 8.0]

    def holt(vals, a=0.5, b=0.5):
        lvl, trd = vals[0], 0.0
        for x in vals[1:]:
            nl = a * x + (1 - a) * lvl + (1 - a) * trd
            trd = a * b * x - a * b * lvl + (1 - a * b) * trd
            lvl = nl
        return lvl, trd

    df = spark.createDataFrame(
        [("k", i, x) for i, x in enumerate(xs)] + [("solo", 0, 42.0)],
        "k string, o int, x double",
    )
    out = {r.k: r for r in
           holt_linear_forecast(df, "k", "o", "x").collect()}
    lvl, trd = holt(xs)
    assert out["k"].n_periods == 6
    assert out["k"].level == pytest.approx(round(lvl, 6))
    assert out["k"].trend == pytest.approx(round(trd, 6))
    assert out["k"].forecast_next == pytest.approx(round(lvl + trd, 6))
    # single-period series: level = x0, trend 0, forecast = x0
    assert (out["solo"].level, out["solo"].trend,
            out["solo"].forecast_next) == (42.0, 0.0, 42.0)
