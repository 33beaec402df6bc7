"""Custom stateful streaming operator: applyInPandasWithState running
totals, exercised through a real streaming query (availableNow trigger),
and checked for agreement with the batch-equivalent aggregation."""

import pytest

from pyspark.sql import functions as F

from phenoxtract_spark.streaming import stateful


@pytest.fixture()
def event_rows():
    return [
        (1, "2024-01-01 00:00:01", 10.0),
        (1, "2024-01-01 00:10:00", 5.5),
        (2, "2024-01-01 00:00:02", 7.25),
        (2, "2024-01-01 01:00:00", None),
        (3, "2024-01-01 02:00:00", 1.0),
    ]


def test_stateful_running_totals_stream(spark, tmp_path, event_rows):
    src = tmp_path / "events_src"
    df = spark.createDataFrame(event_rows, "user_id bigint, ts_raw string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = (
        spark.readStream.schema("user_id bigint, ts_raw string, value double")
        .parquet(str(src))
        .select("user_id", F.col("ts_raw").cast("timestamp").alias("ts"), "value")
    )
    out = stateful.running_totals_stream(stream)
    query = (
        out.writeStream.format("memory")
        .queryName("stateful_totals_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM stateful_totals_test").collect()
    }
    assert got == {1: (2, 15.5), 2: (2, 7.25), 3: (1, 1.0)}


def test_stateful_state_carries_across_batches(spark, tmp_path, event_rows):
    """Two micro-batches in one query (maxFilesPerTrigger=1): totals from
    the first batch must fold into the second via GroupState."""
    src = tmp_path / "events_src2"
    src.mkdir()
    df1 = spark.createDataFrame(event_rows[:2], "user_id bigint, ts_raw string, value double")
    df1.coalesce(1).write.mode("append").parquet(str(src))
    df2 = spark.createDataFrame(
        [(1, "2024-01-01 03:00:00", 4.5)], "user_id bigint, ts_raw string, value double"
    )
    df2.coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("user_id bigint, ts_raw string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .select("user_id", "value")
    )
    out = stateful.running_totals_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_carry_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits one row per batch; the final (max-n) row per user is
    # the carried total: 2 events (10.0+5.5) in one batch + 1 event (4.5)
    rows = spark.sql(
        "SELECT user_id, max_by(total_value, n_events) AS total, max(n_events) AS n "
        "FROM stateful_carry_test GROUP BY user_id"
    ).collect()
    got = {r["user_id"]: (r["n"], r["total"]) for r in rows}
    assert got[1] == (3, 20.0)


def test_batch_equivalent_matches(spark, event_rows):
    df = spark.createDataFrame(event_rows, "user_id bigint, ts_raw string, value double")
    got = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in stateful.running_totals_batch(df).collect()
    }
    assert got == {1: (2, 15.5), 2: (2, 7.25), 3: (1, 1.0)}


def test_stateful_sessionize_event_time_timeout(spark, tmp_path):
    """Sessions close when the watermark passes last_event + gap and agree
    with the batch F.session_window semantics (start, end = last + gap, n)."""
    import datetime as dt

    from phenoxtract_spark.streaming import events as ev

    src = tmp_path / "sess_src"
    src.mkdir()
    # batch 1: two sessions forming for users 1 and 2
    b1 = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:10:00"),
        (2, "2024-01-01 00:05:00"),
    ]
    # batch 2: user 1 continues within gap; flush user far ahead advances the
    # watermark so every earlier session times out in the following batch
    b2 = [
        (1, "2024-01-01 00:30:00"),
        (99, "2024-01-01 06:00:00"),
    ]
    spark.createDataFrame(b1, "user_id bigint, ts_raw string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b1"))
    spark.createDataFrame(b2, "user_id bigint, ts_raw string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "b2"))

    from phenoxtract_spark.streaming import stateful

    stream = (
        spark.readStream.schema("user_id bigint, ts_raw string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .select("user_id", F.col("ts_raw").cast("timestamp").alias("ts"))
    )
    out = stateful.sessionize_stream(stream, gap="30 minutes")
    query = (
        out.writeStream.format("memory")
        .queryName("sessionize_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    got = {
        r["user_id"]: (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessionize_test").collect()
    }
    # user 2's lone event: session [00:05, 00:35), 1 event
    assert got[2] == (
        dt.datetime(2024, 1, 1, 0, 5), dt.datetime(2024, 1, 1, 0, 35), 1
    )
    # user 1: events at 00:00/00:10/00:30 chain into one session ending 01:00
    assert got[1] == (
        dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 1, 0), 3
    )
    # flush user 99's session never closes (watermark stops at its event)
    assert 99 not in got
    # batch session_window agrees for the closed sessions
    all_rows = spark.createDataFrame(
        b1 + b2, "user_id bigint, ts_raw string"
    ).select("user_id", F.col("ts_raw").cast("timestamp").alias("ts"))
    batch = {
        r["user_id"]: (r["session_start"], r["session_end"], r["n_events"])
        for r in ev.session_windows(all_rows, gap="30 minutes").collect()
        if r["user_id"] in (1, 2)
    }
    assert batch == {k: v for k, v in got.items()}


def test_merge_upsert_sink_idempotent(spark, tmp_path):
    """foreachBatch merge: later batches replace rows per key; re-running
    the same input (new checkpoint) leaves the target unchanged."""
    src = tmp_path / "upsert_src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k bigint, v string, seq bigint"
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [(2, "b2", 21), (3, "c", 30)], "k bigint, v string, seq bigint"
    ).coalesce(1).write.parquet(str(src / "b2"))

    from phenoxtract_spark.sources.sinks import merge_upsert_sink

    target = str(tmp_path / "upsert_target")

    def run(ckpt):
        stream = spark.readStream.schema("k bigint, v string, seq bigint").option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src / "*"))
        q = merge_upsert_sink(stream, target, "k", str(tmp_path / ckpt), seq_col="seq")
        q.awaitTermination(120)

    run("ck1")
    got = {r["k"]: (r["v"], r["seq"]) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 10), 2: ("b2", 21), 3: ("c", 30)}
    # replay from scratch (fresh checkpoint) → same target state
    run("ck2")
    got2 = {r["k"]: (r["v"], r["seq"]) for r in spark.read.parquet(target).collect()}
    assert got2 == got


def test_stateful_pattern_match_stream(spark, tmp_path):
    """Streaming CEP agrees with the batch followed_within semantics:
    matched anchors emit on match; unmatched anchors emit null once the
    watermark passes their horizon."""
    import datetime as dt

    from phenoxtract_spark.streaming import stateful

    src = tmp_path / "pat_src"
    src.mkdir()
    # user 1: purchase at 00:00, error at 00:05 (match within 10 min)
    # user 2: purchase at 00:00, error at 01:00 (outside horizon -> null)
    b1 = [
        (1, "2024-01-01 00:00:00", "purchase"),
        (1, "2024-01-01 00:05:00", "error"),
        (2, "2024-01-01 00:00:00", "purchase"),
    ]
    # batch 2: user 2's late error + flush event far ahead to advance the
    # watermark past every horizon
    b2 = [
        (2, "2024-01-01 01:00:00", "error"),
        (99, "2024-01-01 06:00:00", "view"),
    ]
    schema = "user_id bigint, ts_raw string, event_type string"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1")
    )
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b2")
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
        .select(
            "user_id",
            F.col("ts_raw").cast("timestamp").alias("ts"),
            "event_type",
        )
    )
    out = stateful.pattern_match_stream(
        stream, "purchase", "error", within="10 minutes"
    )
    query = (
        out.writeStream.format("memory")
        .queryName("pattern_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "pat_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    got = {
        (r["user_id"], r["first_us"]): r["matched_us"]
        for r in spark.sql("SELECT * FROM pattern_test").collect()
    }
    us = lambda s: int(
        dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    # user 1 matched at 00:05
    assert got[(1, us("2024-01-01 00:00:00"))] == us("2024-01-01 00:05:00")
    # user 2's error came after the 10-minute horizon: unmatched
    assert got[(2, us("2024-01-01 00:00:00"))] is None
    # batch operator agrees on the same data
    from phenoxtract_spark.operators import behavior

    all_rows = spark.createDataFrame(b1 + b2, schema).select(
        F.monotonically_increasing_id().alias("event_id"),
        "user_id",
        F.col("ts_raw").cast("timestamp").alias("ts"),
        "event_type",
    )
    batch = {
        (r["user_id"], r["first_us"]): r["matched_us"]
        for r in behavior.followed_within(
            all_rows, "purchase", "error", within="10 minutes"
        ).collect()
    }
    assert batch == {k: v for k, v in got.items() if k[0] in (1, 2)}


def test_cdc_apply_sink_stream_equals_batch(spark, tmp_path):
    """Streaming CDC (I/U/D) applied batch-by-batch must converge to the
    same table as one batch cdc_apply over the full change stream — and
    deletes actually delete, which merge_upsert_sink cannot express."""
    from phenoxtract_spark.operators import cdc
    from phenoxtract_spark.sources.sinks import cdc_apply_sink

    src = tmp_path / "cdc_src"
    src.mkdir()
    b1 = [("I", 1, 1, "a", 1.0), ("I", 2, 2, "b", 2.0), ("I", 3, 3, "c", 3.0)]
    b2 = [("U", 4, 2, "b2", 22.0), ("D", 5, 3, None, None),
          ("I", 6, 9, "z", 9.0)]
    schema = "op string, seq bigint, k bigint, name string, bal double"
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(str(src / "b2"))

    target = str(tmp_path / "cdc_target")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    q = cdc_apply_sink(stream, target, ["k"], ["name", "bal"],
                       str(tmp_path / "ck"), seq_col="seq", op_col="op")
    q.awaitTermination(120)

    got = {r["k"]: (r["name"], r["bal"])
           for r in spark.read.parquet(target).collect()}
    empty = spark.createDataFrame([], "k bigint, name string, bal double")
    allchanges = spark.createDataFrame(b1 + b2, schema)
    want = {r["k"]: (r["name"], r["bal"])
            for r in cdc.cdc_apply(empty, allchanges, ["k"],
                                   ["name", "bal"]).collect()}
    assert got == want
    assert 3 not in got and got[2] == ("b2", 22.0) and got[9] == ("z", 9.0)


def test_hll_registers_stream_equals_batch(spark, tmp_path):
    """The HLL register relation is a plain groupBy-max, so it runs
    unchanged under Structured Streaming (complete mode) — per-shard
    micro-batches converge to exactly the batch registers, which is the
    continuous-ingest mergeability story made executable."""
    from phenoxtract_spark.operators import sketches

    src = tmp_path / "hll_src"
    src.mkdir()
    rows1 = [(i % 3, i % 500) for i in range(0, 4000)]
    rows2 = [(i % 3, i % 700) for i in range(4000, 8000)]
    schema = "g bigint, v bigint"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "b2"))

    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src / "*"))
    out = sketches.hll_registers(stream, ["g"], "v", p=8)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["g"], r["reg"]): r["rho"]
        for r in spark.sql("SELECT * FROM hll_stream").collect()
    }
    batch = {
        (r["g"], r["reg"]): r["rho"]
        for r in sketches.hll_registers(
            spark.createDataFrame(rows1 + rows2, schema), ["g"], "v", p=8
        ).collect()
    }
    assert streamed == batch


def test_dedup_first_seen_stream_equals_batch(spark, tmp_path):
    """Streaming content dedup: three id-ordered micro-batches with
    duplicates inside a batch, across batches, and a late duplicate of
    the very first doc — final per-digest state equals the batch
    groupBy, and the earliest id always wins."""
    src = tmp_path / "dedup_src"
    src.mkdir()
    batches = [
        [(1, "aaa"), (2, "bbb"), (3, "aaa")],     # in-batch dup of aaa
        [(4, "ccc"), (5, "bbb")],                 # cross-batch dup of bbb
        [(6, "aaa"), (7, "ddd")],                 # late dup of the first doc
    ]
    for rows in batches:
        spark.createDataFrame(
            rows, "doc_id bigint, digest string"
        ).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema("doc_id bigint, digest string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stateful.dedup_first_seen_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode re-emits per batch; the max-n row per digest is final
    got = {
        r["digest"]: (r["keep_id"], r["n"])
        for r in spark.sql(
            "SELECT digest, max_by(keep_id, n_seen) AS keep_id,"
            " max(n_seen) AS n FROM dedup_stream_test GROUP BY digest"
        ).collect()
    }
    allrows = [r for rows in batches for r in rows]
    batch = {
        r["digest"]: (r["keep_id"], r["n_seen"])
        for r in stateful.dedup_first_seen_batch(
            spark.createDataFrame(allrows, "doc_id bigint, digest string")
        ).collect()
    }
    assert got == batch == {
        "aaa": (1, 3), "bbb": (2, 2), "ccc": (4, 1), "ddd": (7, 1)
    }
