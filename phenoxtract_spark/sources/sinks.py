"""Sinks (SURVEY §2.1 S6).

The reference writes one pretty JSON file per patient
(load/file_system_loader.rs:68-98) — anti-scale (SURVEY §7.3).  Default here
is sharded JSONL (one part per task, id-keyed rows); the per-file mode stays
for cohort-sized outputs, implemented with ``foreachPartition`` so the
driver never materializes packets.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl(packets: DataFrame, path: str, json_col: str = "packet_json",
                num_shards: int | None = None) -> None:
    """Scale path: sharded JSONL of packet JSON strings."""
    out = packets.select(json_col)
    if num_shards:
        out = out.repartition(num_shards)
    out.write.mode("overwrite").text(path)


def write_file_per_subject(packets: DataFrame, out_dir: str,
                           id_col: str = "subject_id",
                           json_col: str = "packet_json",
                           pretty: bool = True,
                           drop_default_survival: bool = True) -> None:
    """S6 faithful mode: one ``{id}.json`` per subject, pretty-printed;
    drops default-zero ``survivalTimeInDays`` (~ file_system_loader.rs:31-98).
    Executor-side ``foreachPartition`` — no driver collect."""
    os.makedirs(out_dir, exist_ok=True)

    def _strip_default(obj):
        if isinstance(obj, dict):
            return {
                k: _strip_default(v)
                for k, v in obj.items()
                if not (k == "survivalTimeInDays" and v == 0)
            }
        if isinstance(obj, list):
            return [_strip_default(v) for v in obj]
        return obj

    def _safe_basename(sid) -> str:
        # subject ids are arbitrary strings from data: percent-encode
        # anything that could escape out_dir ('/', '..', control chars)
        s = str(sid)
        enc = "".join(
            c if (c.isalnum() or c in "._-") else f"%{ord(c):02X}" for c in s
        )
        if not enc or set(enc) <= {"."}:
            enc = "_" + enc
        return enc

    def write_part(rows):
        for row in rows:
            obj = json.loads(row[json_col])
            if drop_default_survival:
                obj = _strip_default(obj)
            fname = os.path.join(out_dir, f"{_safe_basename(row[id_col])}.json")
            with open(fname, "w") as f:
                json.dump(obj, f, indent=2 if pretty else None, sort_keys=False)

    packets.select(id_col, json_col).foreachPartition(write_part)


def write_parquet_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                              mode: str = "overwrite") -> None:
    """General columnar sink with partition pruning for downstream readers."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
