"""WARC 1.0 codec + Spark plumbing (sources/warc.py) — same strictness
contract as the image/wav/y4m codecs: exact roundtrip, loud errors on
malformation, never a silent clamp."""

import pytest

from phenoxtract_spark.sources import warc


def test_record_roundtrip_exact():
    body = b"hello warc \x00\xff binary ok"
    rec = warc.encode_warc_record("http://x.test/1", body)
    out = warc.decode_warc(rec)
    assert len(out) == 1
    r = out[0]
    assert r["target_uri"] == "http://x.test/1"
    assert r["type"] == "response"
    assert r["content_length"] == len(body)
    assert r["body"] == body
    assert r["date"] == warc.FIXED_WARC_DATE
    assert r["record_id"].startswith("<urn:md5:")


def test_segment_walk_multi_record():
    recs = [(f"http://x.test/{i}", f"body number {i}".encode()) for i in range(5)]
    seg = warc.encode_warc_segment(recs)
    out = warc.decode_warc(seg)
    assert [(r["target_uri"], r["body"]) for r in out] == [
        (u, b) for u, b in recs
    ]


def test_encoding_is_deterministic():
    recs = [("http://x.test/a", b"payload")]
    assert warc.encode_warc_segment(recs) == warc.encode_warc_segment(recs)


def test_truncated_body_raises():
    rec = warc.encode_warc_record("http://x.test/1", b"0123456789")
    with pytest.raises(ValueError, match="truncated record"):
        warc.decode_warc(rec[:-6])  # cut into the body/terminator


def test_bad_version_line_raises():
    rec = warc.encode_warc_record("http://x.test/1", b"abc")
    with pytest.raises(ValueError, match="bad WARC version"):
        warc.decode_warc(b"HTTP/1.1 200 OK\r\n" + rec)


def test_missing_terminator_raises():
    rec = warc.encode_warc_record("http://x.test/1", b"abc")
    broken = rec[:-4] + b"XXXX"
    with pytest.raises(ValueError, match="missing record terminator"):
        warc.decode_warc(broken)


def test_missing_content_length_raises():
    raw = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.test/1\r\n\r\nabc\r\n\r\n"
    )
    with pytest.raises(ValueError, match="missing Content-Length"):
        warc.decode_warc(raw)


def test_spark_segments_and_parse(spark):
    df = spark.createDataFrame(
        [(i, f"document text {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    segs = warc.synthetic_warc_segments(df, "doc_id", "text", docs_per_segment=16)
    seg_rows = {r["segment_id"]: r for r in segs.collect()}
    assert set(seg_rows) == {0, 1, 2}
    assert seg_rows[0]["n_records"] == 16 and seg_rows[2]["n_records"] == 8
    parsed = warc.parse_warc_segments(segs).collect()
    assert len(parsed) == 40
    by_uri = {r["target_uri"]: r for r in parsed}
    r7 = by_uri["http://corpus.local/doc/7"]
    assert r7["segment_id"] == 0 and r7["rec_index"] == 7
    assert r7["content_length"] == len("document text 7")
    import hashlib

    assert r7["body_md5"] == hashlib.md5(b"document text 7").hexdigest()


def test_segments_with_host_col_emit_per_domain_uris(spark):
    df = spark.createDataFrame(
        [(0, "text zero", "src-a"), (1, "text one", "src-b")],
        "doc_id bigint, text string, source string",
    )
    segs = warc.synthetic_warc_segments(
        df, "doc_id", "text", docs_per_segment=16, host_col="source"
    )
    uris = {r["target_uri"] for r in warc.parse_warc_segments(segs).collect()}
    assert uris == {
        "http://src-a.corpus.local/doc/0",
        "http://src-b.corpus.local/doc/1",
    }


# --- .warc.gz member-wise framing (the real Common Crawl layout) -------


def test_warc_gz_roundtrip_and_determinism():
    recs = [(f"http://x.test/{i}", f"body number {i}".encode()) for i in range(5)]
    gz = warc.encode_warc_gz_segment(recs)
    assert gz[:2] == warc.GZIP_MAGIC
    assert gz == warc.encode_warc_gz_segment(recs)  # mtime=0
    out = warc.decode_warc_gz(gz)
    assert [(r["target_uri"], r["body"]) for r in out] == recs
    # and the parsed fields match the plain framing exactly
    plain = warc.decode_warc(warc.encode_warc_segment(recs))
    assert [
        (r["target_uri"], r["content_length"], r["record_id"]) for r in out
    ] == [(r["target_uri"], r["content_length"], r["record_id"]) for r in plain]


def test_warc_gz_auto_dispatch_on_magic():
    recs = [("http://x.test/a", b"payload-a")]
    assert warc.decode_warc_auto(warc.encode_warc_gz_segment(recs))[0][
        "body"
    ] == b"payload-a"
    assert warc.decode_warc_auto(warc.encode_warc_segment(recs))[0][
        "body"
    ] == b"payload-a"


def test_warc_gz_truncated_member_raises():
    gz = warc.encode_warc_gz_segment([("http://x.test/1", b"0123456789")])
    with pytest.raises(ValueError, match="truncated gzip member"):
        warc.decode_warc_gz(gz[:-9])  # cut into the CRC/ISIZE trailer


def test_warc_gz_bad_crc_raises():
    import zlib

    gz = bytearray(warc.encode_warc_gz_segment([("http://x.test/1", b"abcdef")]))
    gz[-6] ^= 0xFF  # flip a CRC32 byte (trailer = CRC32 + ISIZE)
    with pytest.raises(zlib.error):
        warc.decode_warc_gz(bytes(gz))


def test_warc_gz_bad_magic_raises():
    gz = warc.encode_warc_gz_segment([("http://x.test/1", b"abc")])
    with pytest.raises(ValueError, match="not a gzip member"):
        warc.decode_warc_gz(b"XX" + gz)
    # and a mid-stream framing break is caught at ITS offset
    with pytest.raises(ValueError, match="not a gzip member at offset"):
        warc.decode_warc_gz(gz + b"junk")


def test_warc_gz_multi_record_member_rejected():
    import gzip as _gzip

    two = warc.encode_warc_segment(
        [("http://x.test/1", b"a"), ("http://x.test/2", b"b")]
    )
    with pytest.raises(ValueError, match="exactly 1 per member"):
        warc.decode_warc_gz(_gzip.compress(two, mtime=0))


def test_spark_gz_segments_parse_identically(spark):
    df = spark.createDataFrame(
        [(i, f"document text {i}") for i in range(40)],
        "doc_id bigint, text string",
    )
    plain = warc.parse_warc_segments(
        warc.synthetic_warc_segments(df, "doc_id", "text", docs_per_segment=16)
    )
    gz = warc.parse_warc_segments(
        warc.synthetic_warc_segments(
            df, "doc_id", "text", docs_per_segment=16, gzip_members=True
        )
    )
    key = lambda r: (r["segment_id"], r["rec_index"])
    assert sorted(map(tuple, gz.collect()), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, plain.collect()), key=lambda t: (t[0], t[1])
    )


def test_web_pipeline_gz_ingest_parity(spark):
    """The e2e capstone's ingest option: .warc.gz framing must yield the
    SAME per-stage survivor counts as plain framing (every parsed field
    is identical by construction)."""
    from phenoxtract_spark.queries_curation import _web_pipeline_stages

    sf = "/root/testdata/sf0.001"
    plain = [df.count() for df in _web_pipeline_stages(spark, sf)]
    gz = [df.count() for df in _web_pipeline_stages(spark, sf, gzip_members=True)]
    assert gz == plain and plain[0] > 0


# --- jsonl.gz shard codec (sources/jsonl_gz.py) ------------------------


def test_jsonl_gz_roundtrip_and_determinism():
    from phenoxtract_spark.sources import jsonl_gz

    recs = [{"id": 1, "text": "hello"}, {"id": 2, "text": "wörld é"}]
    b1 = jsonl_gz.encode_jsonl_gz(recs)
    b2 = jsonl_gz.encode_jsonl_gz(recs)
    assert b1 == b2  # mtime=0, sorted keys
    assert jsonl_gz.decode_jsonl_gz(b1) == recs


def test_jsonl_gz_strict_errors():
    import pytest as _pytest

    from phenoxtract_spark.sources import jsonl_gz

    with _pytest.raises(ValueError, match="not a gzip payload"):
        jsonl_gz.decode_jsonl_gz(b"plaintext")
    import gzip as _gzip

    with _pytest.raises(ValueError, match="not a JSON object"):
        jsonl_gz.decode_jsonl_gz(_gzip.compress(b'[1,2]\n', mtime=0))
    corrupt = bytearray(jsonl_gz.encode_jsonl_gz([{"a": 1}]))
    corrupt[-3] ^= 0xFF  # flip a CRC byte
    with _pytest.raises(Exception):
        jsonl_gz.decode_jsonl_gz(bytes(corrupt))


def test_jsonl_gz_spark_shards_and_parse(spark):
    from phenoxtract_spark.sources import jsonl_gz

    df = spark.createDataFrame(
        [(i, f"text {i}", "en") for i in range(20)],
        "doc_id bigint, text string, lang string",
    )
    shards = jsonl_gz.synthetic_jsonl_gz_shards(
        df, "doc_id", ["text", "lang"], docs_per_shard=8
    )
    assert {r["shard_id"]: r["n_records"] for r in shards.collect()} == {
        0: 8, 1: 8, 2: 4
    }
    parsed = {r["doc_id"]: r for r in jsonl_gz.parse_jsonl_gz_shards(
        shards, "doc_id", ["text", "lang"]).collect()}
    assert len(parsed) == 20
    assert parsed[9]["text"] == "text 9" and parsed[9]["shard_id"] == 1
    assert parsed[9]["rec_index"] == 1 and parsed[9]["lang"] == "en"
