"""Compressed JSONL shard ingest — the other wire format training
corpora actually arrive in (alongside WARC): ``.jsonl.gz`` shards, one
JSON object per line, gzip-framed.

Pure-stdlib codec pair (``gzip``/``json``), deterministic bytes
(sorted keys, ``mtime=0`` so the gzip header never embeds a clock),
wrapped in the same partition-local Spark plumbing as sources/warc.py:
one ``applyInPandas`` group per shard on the encode side, one
``mapInPandas`` pass on the decode side, payloads never shuffle.  The
roundtrip query's oracle recomputes every parsed field from the source
table, so a value match proves gzip-encode → gzip-decode → JSON-parse
end to end.

Scale shape: the shard is the task unit (exactly how these corpora are
laid out on object storage); decode is streaming per shard with no
cross-record state.
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GZIP_MAGIC = b"\x1f\x8b"


def encode_jsonl_gz(records: list[dict]) -> bytes:
    """Gzip one shard: one sorted-key JSON object per line, trailing
    newline, ``mtime=0`` for byte determinism."""
    body = "".join(
        json.dumps(r, sort_keys=True, separators=(",", ":")) + "\n"
        for r in records
    ).encode()
    return gzip.compress(body, mtime=0)


def decode_jsonl_gz(payload: bytes) -> list[dict]:
    """Strict shard decode: gzip magic checked up front (clear error
    instead of a generic zlib failure), then gunzip (truncation and CRC
    corruption raise from the stdlib), then line-wise JSON parse — a
    non-object line raises, never skips."""
    if payload[:2] != GZIP_MAGIC:
        raise ValueError(f"not a gzip payload (magic {payload[:2]!r})")
    body = gzip.decompress(payload)
    records = []
    for i, line in enumerate(body.split(b"\n")):
        if not line:
            continue
        obj = json.loads(line)
        if not isinstance(obj, dict):
            raise ValueError(f"line {i} is not a JSON object")
        records.append(obj)
    return records


def synthetic_jsonl_gz_shards(df: DataFrame, id_col: str, cols: list[str],
                              docs_per_shard: int = 16) -> DataFrame:
    """Pack rows into ``.jsonl.gz`` shards through the real encoder —
    ``shard_id = id // docs_per_shard``, rows sorted by id inside, so
    shard bytes are deterministic.  Returns
    (shard_id, n_records, payload)."""
    import pandas as pd

    src = df.select(
        F.col(id_col).cast("bigint").alias("_id"),
        (F.col(id_col).cast("bigint") / docs_per_shard)
        .cast("bigint")
        .alias("shard_id"),
        *cols,
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_id")
        recs = []
        for _, r in pdf.iterrows():
            rec = {id_col: int(r["_id"])}
            for c in cols:
                v = r[c]
                rec[c] = None if pd.isna(v) else v
            recs.append(rec)
        return pd.DataFrame(
            {
                "shard_id": [int(pdf["shard_id"].iloc[0])],
                "n_records": [len(recs)],
                "payload": [encode_jsonl_gz(recs)],
            }
        )

    return src.groupBy("shard_id").applyInPandas(
        build, schema="shard_id bigint, n_records bigint, payload binary"
    )


def parse_jsonl_gz_shards(shards: DataFrame, id_col: str,
                          str_cols: list[str]) -> DataFrame:
    """Parse shards back to rows via the strict decoder:
    (shard_id, rec_index, <id_col> bigint, <str_cols>...).  Partition-
    preserving ``mapInPandas``; payloads never shuffle."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "shard_id": [], "rec_index": [], id_col: [],
                **{c: [] for c in str_cols},
            }
            for sid, payload in zip(pdf["shard_id"], pdf["payload"]):
                for i, rec in enumerate(decode_jsonl_gz(bytes(payload))):
                    rows["shard_id"].append(int(sid))
                    rows["rec_index"].append(i)
                    rows[id_col].append(rec[id_col])
                    for c in str_cols:
                        rows[c].append(rec.get(c))
            yield pd.DataFrame(rows)

    schema = ", ".join(
        ["shard_id bigint", "rec_index bigint", f"{id_col} bigint"]
        + [f"{c} string" for c in str_cols]
    )
    return shards.mapInPandas(run, schema=schema)
