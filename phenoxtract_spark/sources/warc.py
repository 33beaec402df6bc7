"""WARC 1.0 ingest — the Common Crawl container format every web-scale
training-data pipeline starts from.

Same honesty contract as the multimodal codec family
(operators/multimodal.py): a REAL pure-stdlib codec pair — strict
writer + strict record-boundary reader (version line, header block,
Content-Length-driven body read, record terminator) — wrapped in real
Spark plumbing (segment assembly with ``applyInPandas``, parsing with
``mapInPandas``), value-checked end-to-end by a roundtrip query whose
oracle recomputes every parsed field from the source table in SQL.

Scale shape: a WARC segment is the unit of parallelism exactly as on a
real crawl (one ~1 GB warc.gz per task); records never leave their
partition, headers parse streaming, and the reader is O(bytes) with no
backtracking.

Both on-disk framings are supported: plain concatenated WARC 1.0, and
the ``.warc.gz`` layout actual Common Crawl ships — ONE GZIP MEMBER PER
RECORD, members concatenated, so a reader can seek to any record
boundary and stream-decompress from there without inflating the whole
file.  The gzip codec is member-wise stdlib ``zlib`` (wbits=31 so the
per-member CRC32 + ISIZE trailer is verified), deterministic bytes
(``mtime=0``) mirroring sources/jsonl_gz.py; the parser dispatches on
the gzip magic, so mixed corpora parse through one path.
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_VERSION = b"WARC/1.0"
# deterministic capture date: engine paths never read the wall clock
FIXED_WARC_DATE = "2024-01-01T00:00:00Z"
CRLF = b"\r\n"
GZIP_MAGIC = b"\x1f\x8b"


def encode_warc_record(target_uri: str, body: bytes,
                       rec_type: str = "response",
                       date: str = FIXED_WARC_DATE) -> bytes:
    """One WARC 1.0 record: version line, named headers in fixed order,
    blank line, body, record terminator (two CRLFs).  The record id is
    content-derived (md5 of uri + body) so encoding is deterministic."""
    digest = hashlib.md5(target_uri.encode() + b"\x00" + body).hexdigest()
    headers = [
        (b"WARC-Type", rec_type.encode()),
        (b"WARC-Record-ID", f"<urn:md5:{digest}>".encode()),
        (b"WARC-Date", date.encode()),
        (b"WARC-Target-URI", target_uri.encode()),
        (b"Content-Length", str(len(body)).encode()),
    ]
    out = [WARC_VERSION, CRLF]
    for k, v in headers:
        out += [k, b": ", v, CRLF]
    out += [CRLF, body, CRLF, CRLF]
    return b"".join(out)


def encode_warc_segment(records: list[tuple[str, bytes]]) -> bytes:
    """Concatenate (target_uri, body) pairs into one multi-record WARC
    segment — the on-disk unit a crawler emits."""
    return b"".join(encode_warc_record(uri, body) for uri, body in records)


def encode_warc_gz_segment(records: list[tuple[str, bytes]]) -> bytes:
    """The real Common Crawl ``.warc.gz`` layout: each record compresses
    into its OWN gzip member (``mtime=0`` for byte determinism), members
    concatenated back-to-back.  Per-record framing is what makes the
    format splittable: a reader positioned at any member boundary can
    decompress one record without touching the rest of the file."""
    return b"".join(
        gzip.compress(encode_warc_record(uri, body), mtime=0)
        for uri, body in records
    )


def decode_warc_gz(payload: bytes) -> list[dict]:
    """Strict member-wise ``.warc.gz`` walk: gunzip one gzip member at a
    time (stdlib ``zlib`` with wbits=31, so each member's CRC32 + ISIZE
    trailer is verified — corruption raises ``zlib.error``, truncation
    raises here), require each member to hold EXACTLY ONE WARC record
    (the Common Crawl contract; multi-record members would break record
    seekability), and parse it with the same strict reader as the plain
    framing.  O(bytes): member boundaries come from
    ``decompressobj.unused_data`` over a memoryview, no re-scanning."""
    chunk_size = 1 << 20
    records = []
    view = memoryview(payload)
    pos, n = 0, len(payload)
    # ``carry`` holds the tail of the last fed chunk that belonged to
    # the NEXT member (the previous inflater's unused_data) — seeding
    # the next member with it means every payload byte is fed to zlib
    # exactly once, so the whole walk is O(bytes) regardless of member
    # count (re-slicing from the member offset instead would re-feed up
    # to a full chunk per member: ~chunk/member x amplification on
    # small-record segments)
    carry = b""
    while carry or pos < n:
        member_off = pos - len(carry)
        head = carry[:2]
        if len(head) < 2:
            head += bytes(view[pos:pos + 2 - len(head)])
        if head != GZIP_MAGIC:
            raise ValueError(
                f"not a gzip member at offset {member_off} (magic {head!r})"
            )
        d = zlib.decompressobj(wbits=31)
        parts = [d.decompress(carry)] if carry else []
        while not d.eof:
            if pos >= n:
                raise ValueError(
                    f"truncated gzip member at offset {member_off}"
                )
            step = view[pos:pos + chunk_size]
            pos += len(step)
            parts.append(d.decompress(step))
        member = b"".join(parts)
        recs = decode_warc(member)
        if len(recs) != 1:
            raise ValueError(
                f"gzip member at offset {member_off} holds {len(recs)} WARC "
                f"records; the .warc.gz contract is exactly 1 per member"
            )
        records.append(recs[0])
        carry = d.unused_data
    return records


def decode_warc_auto(payload: bytes) -> list[dict]:
    """Dispatch on the leading magic: gzip members (``.warc.gz``) or
    plain concatenated WARC 1.0 — one parse entry point for mixed
    corpora, each branch staying fully strict."""
    if payload[:2] == GZIP_MAGIC:
        return decode_warc_gz(payload)
    return decode_warc(payload)


def decode_warc(payload: bytes) -> list[dict]:
    """Strict multi-record WARC parse: returns one dict per record with
    ``type``, ``target_uri``, ``record_id``, ``date``, ``content_length``
    and ``body`` (bytes).  Raises ``ValueError`` on any malformation —
    bad version line, missing Content-Length, truncated body, missing
    record terminator — never silently clamps (the decode_wav lesson)."""
    records = []
    off = 0
    n = len(payload)
    while off < n:
        hdr_end = payload.find(CRLF + CRLF, off)
        if hdr_end < 0:
            raise ValueError(f"truncated header block at offset {off}")
        lines = payload[off:hdr_end].split(CRLF)
        if lines[0] != WARC_VERSION:
            raise ValueError(
                f"bad WARC version line at offset {off}: {lines[0][:40]!r}"
            )
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b": ")
            if not sep:
                raise ValueError(f"malformed header line {ln[:60]!r}")
            headers[k.decode()] = v.decode()
        if "Content-Length" not in headers:
            raise ValueError(f"record at offset {off} missing Content-Length")
        clen = int(headers["Content-Length"])
        body_start = hdr_end + 4
        body_end = body_start + clen
        if body_end + 4 > n:
            raise ValueError(
                f"truncated record at offset {off}: need {clen} body bytes "
                f"+ terminator, have {n - body_start}"
            )
        if payload[body_end:body_end + 4] != CRLF + CRLF:
            raise ValueError(f"missing record terminator at offset {body_end}")
        records.append(
            {
                "type": headers.get("WARC-Type", ""),
                "target_uri": headers.get("WARC-Target-URI", ""),
                "record_id": headers.get("WARC-Record-ID", ""),
                "date": headers.get("WARC-Date", ""),
                "content_length": clen,
                "body": payload[body_start:body_end],
            }
        )
        off = body_end + 4
    return records


def synthetic_warc_segments(df: DataFrame, id_col: str, text_col: str,
                            docs_per_segment: int = 16,
                            uri_prefix: str = "http://corpus.local/doc/",
                            host_col: str | None = None,
                            uri_col: str | None = None,
                            gzip_members: bool = False) -> DataFrame:
    """Pack documents into multi-record WARC segments through the REAL
    encoder — ``segment_id = id // docs_per_segment`` keys one
    ``applyInPandas`` group per segment (records sorted by id inside, so
    bytes are deterministic).  With ``uri_col``, each record's
    Target-URI is taken verbatim from that column (crawl-shaped corpora
    where the fetch URL is data); with ``host_col``, the URI is
    ``http://<host>.corpus.local/doc/<id>`` (per-domain corpora); else
    ``uri_prefix<id>``.  With ``gzip_members`` the segment bytes are the
    real ``.warc.gz`` framing (one gzip member per record) instead of
    plain concatenation.  Returns (segment_id, n_records, payload)."""
    import pandas as pd

    enc = encode_warc_gz_segment if gzip_members else encode_warc_segment

    cols = [
        F.col(id_col).cast("bigint").alias("id"),
        F.col(text_col).alias("t"),
        (F.col(id_col).cast("bigint") / docs_per_segment)
        .cast("bigint")
        .alias("segment_id"),
    ]
    if uri_col is not None:
        cols.append(F.col(uri_col).cast("string").alias("uri"))
    elif host_col is not None:
        cols.append(F.col(host_col).cast("string").alias("host"))
    src = df.select(*cols)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        if uri_col is not None:
            uris = list(pdf["uri"])
        elif host_col is not None:
            uris = [
                f"http://{h}.corpus.local/doc/{int(i)}"
                for i, h in zip(pdf["id"], pdf["host"])
            ]
        else:
            uris = [f"{uri_prefix}{int(i)}" for i in pdf["id"]]
        recs = [
            (u, ("" if t is None else str(t)).encode())
            for u, t in zip(uris, pdf["t"])
        ]
        return pd.DataFrame(
            {
                "segment_id": [int(pdf["segment_id"].iloc[0])],
                "n_records": [len(recs)],
                "payload": [enc(recs)],
            }
        )

    return src.groupBy("segment_id").applyInPandas(
        build, schema="segment_id bigint, n_records bigint, payload binary"
    )


def parse_warc_segments(segments: DataFrame) -> DataFrame:
    """Parse WARC segments back to one row per record via the strict
    reader: (segment_id, rec_index, warc_type, target_uri,
    content_length, body_md5).  Dispatches per payload on the gzip
    magic, so plain and ``.warc.gz`` segments (even mixed) parse through
    the one entry point.  Partition-preserving ``mapInPandas`` —
    payloads never shuffle; the md5 fingerprints the body so downstream
    value checks need no blob comparison."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "segment_id": [], "rec_index": [], "warc_type": [],
                "target_uri": [], "content_length": [], "body_md5": [],
            }
            for seg_id, payload in zip(pdf["segment_id"], pdf["payload"]):
                for i, rec in enumerate(decode_warc_auto(bytes(payload))):
                    rows["segment_id"].append(int(seg_id))
                    rows["rec_index"].append(i)
                    rows["warc_type"].append(rec["type"])
                    rows["target_uri"].append(rec["target_uri"])
                    rows["content_length"].append(rec["content_length"])
                    rows["body_md5"].append(
                        hashlib.md5(rec["body"]).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return segments.mapInPandas(
        run,
        schema=(
            "segment_id bigint, rec_index bigint, warc_type string, "
            "target_uri string, content_length bigint, body_md5 string"
        ),
    )
