"""Corpus-curation operators: repetition filters, PII scrub, deterministic
splits, decontamination — hand-computable literal frames."""

import pytest

from pyspark.sql import functions as F

from phenoxtract_spark.operators import curation


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spam spam spam spam"),                       # one word repeated
            (2, "a b c a b c a b c"),                         # repeating 3-cycle
            (3, "all distinct words here now"),               # no repetition
            (4, "x"),                                         # single token
        ],
        "doc_id bigint, text string",
    )


def test_repetition_stats_values(docs):
    out = {r["doc_id"]: r for r in curation.repetition_stats(docs, "doc_id", "text").collect()}
    # doc 1: 4 tokens, "spam" ×4; 2-gram "spam spam" ×3 → 6/4 capped? top_2gram
    # is not capped (only dup_3gram is) → 1.5; 3-gram "spam spam spam" ×2 → 6/4 → capped 1.0
    assert out[1]["n_tokens"] == 4
    assert out[1]["top_word_frac"] == 1.0
    assert out[1]["top_2gram_frac"] == 1.5
    assert out[1]["dup_3gram_frac"] == 1.0
    # doc 2: 9 tokens, top word ×3 → 1/3; "a b" ×3 → 6/9; "a b c" ×3 ... dup3 =
    # grams with cnt>1: "a b c"×3, "b c a"×2, "c a b"×2 → (3+2+2)*3/9 → capped 1.0
    assert out[2]["top_word_frac"] == round(3 / 9, 6)
    assert out[2]["top_2gram_frac"] == round(6 / 9, 6)
    assert out[2]["dup_3gram_frac"] == 1.0
    # doc 3: no repeats
    assert out[3]["top_word_frac"] == 0.2
    assert out[3]["top_2gram_frac"] == 0.4  # every 2-gram unique: 2/5
    assert out[3]["dup_3gram_frac"] == 0.0
    # doc 4: single token; no 2/3-grams at all
    assert out[4]["n_tokens"] == 1
    assert out[4]["top_word_frac"] == 1.0
    assert out[4]["top_2gram_frac"] == 0.0
    assert out[4]["dup_3gram_frac"] == 0.0


def test_pii_scrub_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.com or c.d-e@f.org, ip 10.0.0.1, call +1 555-0142 now")],
        "id bigint, text string",
    )
    row = curation.scrub_documents(df, "id", "text").first()
    assert row["n_email"] == 2 and row["n_ip"] == 1 and row["n_phone"] == 1
    assert row["scrubbed"] == "mail [EMAIL] or [EMAIL], ip [IP], call [PHONE] now"


def test_pii_scrub_order_email_before_phone(spark):
    # digits inside an email must not be half-eaten by the phone pattern
    df = spark.createDataFrame([(1, "x +12 345-6789@example.com y")], "id bigint, text string")
    row = curation.scrub_documents(df, "id", "text").first()
    assert "[EMAIL]" in row["scrubbed"] and "@" not in row["scrubbed"]


def test_dataset_split_deterministic_and_weighted(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = curation.dataset_split(df, "doc_id").groupBy("split").count()
    counts = {r["split"]: r["count"] for r in a.collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    # same seed → identical assignment; different seed → different
    b = curation.dataset_split(df, "doc_id")
    assert a.exceptAll(b.groupBy("split").count()).count() == 0
    c = curation.dataset_split(df, "doc_id", seed="other")
    diff = (
        curation.dataset_split(df, "doc_id").select("doc_id", "split")
        .join(c.select("doc_id", F.col("split").alias("split2")), "doc_id")
        .filter(F.col("split") != F.col("split2"))
        .count()
    )
    assert diff > 0


def test_decontaminate_flags_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "totally unrelated training document with private words"),
        ],
        "doc_id bigint, text string",
    )
    test = spark.createDataFrame(
        [(10, "zzz one two three four five six seven eight qqq")],
        "doc_id bigint, text string",
    )
    out = curation.decontaminate(train, test, "doc_id", "text", k=8)
    rows = {r["train_id"]: r for r in out.collect()}
    # train doc 1 shares exactly one 8-gram window ("one..eight") with test 10
    assert list(rows) == [1]
    assert rows[1]["n_shared_shingles"] == 1
    assert rows[1]["n_test_docs_hit"] == 1


def test_constraint_report_single_pass(spark):
    from phenoxtract_spark.operators.quality import Check, constraint_report

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", -1.0), (2, None, 3.0), (None, "zz", 0.0)],
        "id bigint, code string, val double",
    )
    checks = [
        Check("id", "not_null"),
        Check("id", "unique"),
        Check("val", "min_ge", 0),
        Check("code", "in_set", ("a", "b")),
        Check("code", "matches", r"^[a-z]$"),
    ]
    rep = {(r["column"], r["check"]): r for r in constraint_report(df, checks).collect()}
    assert rep[("id", "not_null")]["n_violations"] == 1
    assert rep[("id", "unique")]["n_violations"] == 1      # id=2 twice
    assert rep[("val", "min_ge")]["n_violations"] == 1     # -1.0
    assert rep[("code", "in_set")]["n_violations"] == 1    # "zz" (null ignored)
    assert rep[("code", "matches")]["n_violations"] == 1   # "zz"
    assert not rep[("id", "unique")]["passed"]
    # exactly one aggregation job: the plan contains a single Aggregate chain,
    # no joins
    plan = constraint_report(df, checks)._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_pack_sequences_invariants(spark):
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators import curation

    df = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(1, 101)], "doc_id bigint, text string"
    )
    out = curation.pack_sequences(
        df, "doc_id", F.size(F.split(F.trim("text"), " ")), context_len=10, shards=4
    ).collect()
    assert len(out) == 100
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["pack_offset"] < 10
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r)
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["id"])
        running = 0
        for r in rows:
            # pack_id/offset are exactly the exclusive running-total chunk
            assert r["pack_id"] == running // 10, r
            assert r["pack_offset"] == running % 10, r
            running += r["n_tokens"]


def test_pack_sequences_deterministic_across_partitionings(spark):
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators import curation

    df = spark.createDataFrame(
        [(i, "tok " * (i % 5 + 1)) for i in range(1, 51)], "doc_id bigint, text string"
    )
    tok = F.size(F.split(F.trim("text"), " "))
    a = {tuple(r) for r in curation.pack_sequences(df, "doc_id", tok).collect()}
    b = {
        tuple(r)
        for r in curation.pack_sequences(df.repartition(7), "doc_id", tok).collect()
    }
    assert a == b


def test_line_dedup_first_owner_keeps_order(spark):
    """Shared lines survive only in the min-id document; surviving lines
    re-assemble in their original positions."""
    from pyspark.sql import functions as F

    from phenoxtract_spark.operators.curation import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro\nshared-banner\nbody one"),
            (2, "shared-banner\nbody two\noutro"),
            (3, "body three"),
        ],
        "doc_id bigint, text string",
    )
    out = {
        r["id"]: r
        for r in line_dedup(docs, "doc_id", F.split("text", "\n")).collect()
    }
    assert out[1]["cleaned_text"] == "intro\nshared-banner\nbody one"
    assert out[1]["n_dup_lines"] == 1 and out[1]["n_removed"] == 0
    assert out[2]["cleaned_text"] == "body two\noutro"
    assert out[2]["n_removed"] == 1
    assert out[3]["cleaned_text"] == "body three"
    assert out[3]["n_dup_lines"] == 0


def test_ngram_diversity_ttr_values(spark):
    from phenoxtract_spark.operators import textanalysis

    df = spark.createDataFrame(
        [
            (1, "a a b"),                  # 3 tokens, 2 distinct; bigrams: "a a","a b"
            (2, "x"),                      # single token: no bigrams
            (3, "spam spam spam spam"),    # minimal diversity
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in textanalysis.ngram_diversity(df, "doc_id", "text").collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["ttr"] == round(2 / 3, 6)
    assert out[1]["bigram_ttr"] == 1.0
    assert out[2]["n_tokens"] == 1 and out[2]["ttr"] == 1.0
    assert out[2]["bigram_ttr"] is None
    assert out[3]["ttr"] == 0.25
    # bigrams of doc 3: "spam spam" ×3 → 1 distinct / 3
    assert out[3]["bigram_ttr"] == round(1 / 3, 6)


def test_hashed_features_l2_norm_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "alpha beta alpha gamma")],
        "doc_id bigint, text string",
    )
    rows = curation.hashed_features(df, "doc_id", "text", buckets=8).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = (r["cnt"], r["l2_weight"])
    # identical docs hash identically (engine-portable md5 bucketing)
    assert by_doc[1] == by_doc[2]
    # counts survive bucketing: 4 tokens total, every bucket in range
    assert sum(c for c, _ in by_doc[1].values()) == 4
    assert all(0 <= b < 8 for b in by_doc[1])
    # L2 weights normalize: sum of squares ≈ 1 per doc
    ss = sum(w * w for _, w in by_doc[1].values())
    assert abs(ss - 1.0) < 1e-4


def test_cross_source_overlap_matrix_with_zeros(spark):
    df = spark.createDataFrame(
        [
            (1, "Shared  Text", "a"),
            (2, "shared text", "b"),      # same digest after normalization
            (3, "only in a", "a"),
            (4, "only in c", "c"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in curation.cross_source_overlap(df, "source", "text").collect()
    }
    # full unordered pair matrix, zeros materialized
    assert out == {("a", "b"): 1, ("a", "c"): 0, ("b", "c"): 0}


def test_bpe_merges_classic_example(spark):
    from phenoxtract_spark.operators import textanalysis

    # the classic BPE corpus: low ×3, lower ×2, newest ×1
    df = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        "doc_id bigint, text string",
    )
    got = [
        (r["merge_round"], r["sym_a"], r["sym_b"], r["pair_count"])
        for r in textanalysis.bpe_merges(df, "text", rounds=3)
        .orderBy("merge_round")
        .collect()
    ]
    # round 1: (l,o)=5 ties (o,w)=5 → lexicographic tie-break picks (l,o)
    # round 2: (lo,w)=5 dominates
    # round 3: (e,r)=2 ties (low,e)=2 → "e" < "low" picks (e,r)
    assert got == [(1, "l", "o", 5), (2, "lo", "w", 5), (3, "e", "r", 2)]


def test_html_strip_tags_entities_whitespace(spark):
    df = spark.createDataFrame(
        [
            (1, '<div><p>Hello   <b>world</b></p>&amp;&nbsp;&lt;tag&gt;&quot;q&quot;</div>'),
            (2, "no markup at all"),
        ],
        "doc_id bigint, html string",
    )
    out = {r["doc_id"]: r for r in curation.strip_html_documents(df, "doc_id", "html").collect()}
    assert out[1]["stripped"] == 'Hello world & <tag>"q"'
    assert out[1]["n_tags"] == 6
    assert out[2]["stripped"] == "no markup at all"
    assert out[2]["n_tags"] == 0
    assert out[2]["keep_ratio"] == 1.0


def test_leakproof_split_keeps_clusters_together(spark):
    from phenoxtract_spark.operators import curation, dedup

    base = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(i, base + f" tail{i % 3}") for i in range(12)]   # 3 near-dup clusters
        + [(100, "completely different standalone text here")],
        "doc_id bigint, text string",
    )
    pairs = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.5)
    canon = dedup.connected_components(
        df.select("doc_id"), pairs.select("id_a", "id_b")
    )
    out = curation.dataset_split(canon, "canonical_id", seed="leak-v1").collect()
    # every member of a cluster inherits the cluster's split
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["canonical_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values())
    # the near-dup docs really did cluster (fewer clusters than docs)
    assert len(by_cluster) < 13


def test_token_budget_select_greedy_prefix_and_maximal(spark):
    from phenoxtract_spark.operators import curation, textanalysis

    rows = [(i, "word " * (10 + (i * 13) % 40) + ("great text" * (i % 5))) for i in range(60)]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    budget, shards = 300, 4
    out = curation.token_budget_select(
        d, "doc_id",
        quality=textanalysis.quality_score("text"),
        n_tokens=textanalysis.token_count("text"),
        budget_per_shard=budget, shards=shards,
    )
    got = out.collect()
    assert got, "selection must be non-empty"
    # full scored relation for the reference greedy
    scored = d.select(
        F.col("doc_id").alias("id"),
        curation.split_bucket("doc_id", "budget-v1", buckets=shards).alias("shard"),
        textanalysis.token_count("text").cast("bigint").alias("n_tokens"),
        textanalysis.quality_score("text").alias("quality"),
    ).collect()
    by_shard = {}
    for r in scored:
        by_shard.setdefault(r["shard"], []).append(r)
    expect = set()
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: (-r["quality"], r["id"]))
        cum = 0
        for r in rs:
            cum += r["n_tokens"]
            if cum <= budget:
                expect.add((r["id"], shard, r["n_tokens"], r["quality"], cum))
            else:
                break  # greedy running-total semantics: stop at first overflow
    assert {(r["id"], r["shard"], r["n_tokens"], r["quality"], r["cum_tokens"])
            for r in got} == expect
    # budget respected everywhere
    assert all(r["cum_tokens"] <= budget for r in got)


def test_quality_lr_training_learns_signal(spark):
    """The trained classifier must separate the classes it was fit on:
    scoring the training docs with the learned weights ranks high-quality
    docs above junk, the bias moves toward the majority class, and
    training is deterministic across runs."""
    from phenoxtract_spark.operators import curation

    rows = [(i, "the quick brown fox jumps over the lazy dog and keeps on running")
            for i in range(10)]
    rows += [(100 + i, "@@@@ #### !!!! %%%% ^^^^ &&&& ****") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    w = {r["bucket"]: r["weight"] for r in
         curation.train_quality_lr(df, "doc_id", "text", buckets=16,
                                   iterations=3).collect()}
    w2 = {r["bucket"]: r["weight"] for r in
          curation.train_quality_lr(df, "doc_id", "text", buckets=16,
                                    iterations=3).collect()}
    assert w == w2  # deterministic
    feats = curation.hashed_features(df, "doc_id", "text", buckets=16)
    score = {}
    for r in feats.collect():
        score[r["doc_id"]] = score.get(r["doc_id"], w.get(-1, 0.0)) + \
            w.get(r["bucket"], 0.0) * r["l2_weight"]
    good = sum(score.get(i, w[-1]) for i in range(10)) / 10
    junk = sum(score.get(100 + i, w[-1]) for i in range(10)) / 10
    assert good > junk


def test_table_diff_all_statuses(spark):
    from phenoxtract_spark.operators import quality

    left = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, "d", 4.0)],
        "k bigint, name string, bal double",
    )
    right = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged
         (2, "b", 2.0),        # null -> value = changed (null-safe)
         (3, "c2", 3.5),       # both cols changed
         (5, "e", 5.0)],       # added; 4 removed
        "k bigint, name string, bal double",
    )
    out = {r["k"]: r for r in
           quality.table_diff(left, right, ["k"], ["name", "bal"]).collect()}
    assert out[1]["status"] == "unchanged" and out[1]["n_changed_cols"] == 0
    assert out[2]["status"] == "changed" and out[2]["n_changed_cols"] == 1
    assert out[3]["status"] == "changed" and out[3]["n_changed_cols"] == 2
    assert out[4]["status"] == "removed"
    assert out[5]["status"] == "added"


def test_span_corruption_reconstructs_original(spark):
    """Denoising invariant: splicing each target span back over its
    sentinel in the input must reproduce the normalized original text —
    for every document, whatever the mask pattern."""
    import re

    from phenoxtract_spark.operators import curation

    texts = [(i, f"token{j} " * 20) for i, j in ((1, 0), (2, 1), (3, 2))]
    texts.append((4, "the quick brown fox jumps over the lazy dog again and again"))
    df = spark.createDataFrame(texts, "doc_id bigint, text string")
    out = curation.span_corruption(df, "doc_id", "text").collect()
    assert len(out) == 4
    for r in out:
        spans = {}
        for m in re.finditer(r"<extra_id_(\d+)> ([^<]*)", r["target_text"] + " "):
            spans[m.group(1)] = m.group(2).strip()
        rebuilt = re.sub(
            r"<extra_id_(\d+)>",
            lambda m: spans.get(m.group(1), ""),
            r["input_text"],
        )
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        original = re.sub(r"\s+", " ", texts[r["id"] - 1][1].lower()).strip()
        assert rebuilt == original, (r["id"], rebuilt, original)
        n_sentinels = r["input_text"].count("<extra_id_")
        assert n_sentinels == r["n_spans"]
        if r["n_spans"] > 0:
            assert r["n_masked_tokens"] >= r["n_spans"]


def test_gopher_rules_fire_on_crafted_documents(spark):
    from phenoxtract_spark.operators import textanalysis

    good = ("the study was designed to measure how the treatment works and "
            "that it can be replicated with care across sites ") * 3
    bullets = "\n".join(f"- item {i}" for i in range(10))
    symbols = "buy ### now ### cheap ### deal ### wow ### " * 10
    short = "too short to pass"
    rows = [(1, good), (2, bullets), (3, symbols), (4, short)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           textanalysis.gopher_rules(df, "doc_id", "text").collect()}
    assert out[1].pass_gopher and out[1].n_rules_failed == 0
    assert out[2].bullet_frac == 1.0 and not out[2].pass_gopher
    assert out[3].symbol_ratio > 0.1 and not out[3].pass_gopher
    assert out[4].n_words < 50 and not out[4].pass_gopher
    assert out[1].stop_hits >= 2


def test_pareto_frontier_2d_matches_bruteforce(spark):
    """The bucket-recurrence skyline equals quadratic dominance checking,
    on data with q-ties, c-ties, full (q,c) duplicates, and a point that
    straddles bucket boundaries."""
    import random

    from phenoxtract_spark.operators import curation

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 20) / 4.0, float(rng.randint(0, 30)))
            for i in range(200)]
    rows += [(200, 5.0, 0.0), (201, 5.0, 0.0)]     # duplicate optimum: both kept
    df = spark.createDataFrame(rows, "id bigint, q double, c double")
    got = {r["id"] for r in
           curation.pareto_frontier_2d(df, "id", "q", "c").collect()}
    want = {
        i for i, qi, ci in rows
        if not any(
            (qo > qi and co <= ci) or (qo == qi and co < ci)
            for j, qo, co in rows if j != i
        )
    }
    assert got == want
    assert {200, 201} <= got


def test_group_digest_order_invariant_and_sensitive(spark):
    """Digest is invariant to row order and partitioning; any single-cell
    change flips it; an even-duplicated row slips past XOR but is caught
    by n_rows/sum32 (the documented hardening)."""
    from pyspark.sql import functions as F
    from phenoxtract_spark.operators import quality

    rows = [("g", i, f"n{i}", i * 10) for i in range(8)]
    a = spark.createDataFrame(rows, "g string, k bigint, name string, v bigint")
    b = spark.createDataFrame(rows[::-1], "g string, k bigint, name string, v bigint").repartition(7)
    dig = lambda df: quality.group_digest(
        df, "g", ["k", "name", "v"]).collect()[0]
    da, db = dig(a), dig(b)
    assert (da["digest"], da["n_rows"], da["sum32"]) == (
        db["digest"], db["n_rows"], db["sum32"])
    # one changed cell -> digest differs
    c = spark.createDataFrame(
        rows[:-1] + [("g", 7, "n7", 71)], "g string, k bigint, name string, v bigint")
    assert dig(c)["digest"] != da["digest"]
    # a row duplicated twice XOR-cancels, but count and sum32 catch it
    d = spark.createDataFrame(
        rows + [rows[0], rows[0]], "g string, k bigint, name string, v bigint")
    dd = dig(d)
    assert dd["digest"] == da["digest"]
    assert dd["n_rows"] != da["n_rows"] and dd["sum32"] != da["sum32"]


def test_group_digest_null_position_disambiguated(spark):
    """Rows differing only in WHICH column is NULL must hash differently:
    concat_ws silently skips NULLs, so (a, NULL, b) and (a, b, NULL)
    would collapse to the same row string without the sentinel rendering
    (r6 ADVICE) — a silent false negative in a divergence detector."""
    from phenoxtract_spark.operators import quality

    schema = "g string, k string, name string, v string"
    a = spark.createDataFrame([("g", "a", None, "b")], schema)
    b = spark.createDataFrame([("g", "a", "b", None)], schema)
    dig = lambda df: quality.group_digest(
        df, "g", ["k", "name", "v"]).collect()[0]["digest"]
    assert dig(a) != dig(b)
    # and a NULL cell differs from the literal sentinel-free empty string
    c = spark.createDataFrame([("g", "a", "", "b")], schema)
    assert dig(a) != dig(c)


def test_shrunk_group_means_pulls_small_groups(spark):
    """A 2-row group with extreme scores lands near the prior; a 1000-row
    group keeps (almost) its raw mean; shrunk is always strictly between
    raw mean and global mean (when they differ)."""
    from phenoxtract_spark.operators import curation

    rows = [("small", 1.0)] * 2 + [("big", 0.4)] * 500 + [("big", 0.6)] * 500
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in
           curation.shrunk_group_means(df, "g", "v", 20.0).collect()}
    gm = (2 * 1.0 + 500 * 0.4 + 500 * 0.6) / 1002
    assert out["small"]["raw_mean"] == 1.0
    # k=20 vs n=2: shrunk sits much nearer the prior than the raw mean
    assert abs(out["small"]["shrunk_mean"] - gm) < 0.15
    assert abs(out["big"]["shrunk_mean"] - out["big"]["raw_mean"]) < 0.001
    for g in ("small", "big"):
        lo, hi = sorted((out[g]["raw_mean"], round(gm, 6)))
        assert lo <= out[g]["shrunk_mean"] <= hi


def test_lr_reliability_bins_monotone_signal(spark):
    """On separable data the calibration curve is usable: multiple bins
    fill, counts conserve, frac_pos rises from the lowest to the highest
    bin (the trained model orders clean above junk)."""
    from phenoxtract_spark.operators import curation

    rows = [(i, "the quick brown fox jumps over the lazy dog and runs far")
            for i in range(30)]
    rows += [(100 + i, "zzz !!! ### @@@ %%% ^^^ &&& *** ((( )))")
             for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = sorted(
        (r["bin"], r["n_docs"], r["mean_pred"], r["frac_pos"])
        for r in curation.lr_reliability_bins(df, "doc_id", "text").collect()
    )
    assert sum(n for _, n, _, _ in out) == 60
    assert len(out) >= 2
    assert out[-1][3] > out[0][3]          # high-score bin is purer
    assert out[-1][2] > out[0][2]          # and predicts higher


def test_length_bucket_padding_arithmetic(spark):
    """Power-of-two ceilings (1->1, 2->2, 3->4, 5->8); waste arithmetic
    exact; the bucketed total waste is strictly below the single-bucket
    baseline on mixed lengths."""
    from phenoxtract_spark.operators import curation

    df = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 5), (5, 100)],
        "doc_id bigint, n_tokens bigint",
    )
    out = {(r["bucketed"], r["bucket_ceiling"]): r
           for r in curation.length_bucket_padding(
               df, "doc_id", "n_tokens").collect()}
    assert (True, 1) in out and (True, 2) in out
    b4 = out[(True, 4)]
    assert b4["n_docs"] == 1 and b4["total_tokens"] == 3
    assert b4["padded_tokens"] == 4 and b4["waste_frac"] == 0.25
    assert out[(True, 8)]["waste_frac"] == round(1 - 5 / 8, 6)
    base = out[(False, 100)]
    assert base["padded_tokens"] == 500
    assert base["waste_frac"] == round(1 - 111 / 500, 6)
    bucketed_waste = sum(
        r["padded_tokens"] - r["total_tokens"]
        for k, r in out.items() if k[0]
    )
    assert bucketed_waste < base["padded_tokens"] - base["total_tokens"]
