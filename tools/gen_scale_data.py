"""Synthesize an sf1-equivalent dataset from sf0.1 for scale probing.

The driver ships parquet at sf{0.001,0.01,0.1} only; BENCH needs an sf1
probe to catch nonlinear blowups (quadratic candidate growth, skewed
buckets) that sf0.1 numbers hide.  We build sf1 as 10 id-shifted copies of
sf0.1 via pyarrow — NOT DuckDB, which would rewrite timestamp[ns] columns
as timestamp[us] without tz metadata and flip Spark's read type from
TIMESTAMP to TIMESTAMP_NTZ.  Pyarrow round-trips the source Arrow schema
bit-for-bit, so sf1 tables read with the exact same Spark schema as the
driver's own parquet.

- ``documents``: doc_id shifted by copy*10**9; each non-zero copy's text
  gets a distinct trailing token so copies are *near*- (not exact-)
  duplicates — deliberately creating 10-doc near-dup clusters, a dedup
  stress harder than organic sf1 data (LSH buckets hold every copy of a
  doc, so the candidate join must stay bucket-bounded to survive).
- ``embeddings``: vec_id shifted; vectors unchanged (IVF/LSH bucket sizes
  scale 10x, the relevant stress).
- ``events``: event_id/user_id shifted -> 10x distinct users, linear
  sessionization growth.
- ``lineitem``: l_orderkey shifted -> 6M rows for the aggregation probe.

Small dimension tables are copied verbatim.  Deterministic: no RNG, output
depends only on the sf0.1 input.  Cached: regenerated only if missing.
"""

from __future__ import annotations

import os
import shutil

COPIES = 10
SHIFT = 10**9

# table -> (id columns to shift, text column to suffix or None)
SCALED = {
    "documents": (["doc_id"], "text"),
    "embeddings": (["vec_id"], None),
    "events": (["event_id", "user_id"], None),
    "lineitem": (["l_orderkey"], None),
}

COPY_VERBATIM = ["region", "nation", "customer", "supplier", "part", "orders"]


def _scaled_copies(table, id_cols, text_col, copies):
    import pyarrow as pa
    import pyarrow.compute as pc

    out = []
    for i in range(copies):
        t = table
        if i > 0:
            for c in id_cols:
                col = t.column(c)
                shifted = pc.cast(pc.add(col, i * SHIFT), col.type)
                t = t.set_column(t.schema.get_field_index(c), t.field(c), shifted)
            if text_col is not None:
                col = t.column(text_col)
                suffixed = pc.cast(
                    pc.binary_join_element_wise(
                        pc.cast(col, pa.string()), f" cp{i}tok", ""
                    ),
                    col.type,
                )
                t = t.set_column(
                    t.schema.get_field_index(text_col), t.field(text_col), suffixed
                )
        out.append(t)
    return pa.concat_tables(out)


# opt-in (scale_dims=True): also scale the customer/orders spine so the
# packet-assembly path has a real scaling fixture.  Key shifts are
# CONSISTENT across tables (o_orderkey matches lineitem.l_orderkey's
# shift; o_custkey matches c_custkey's), so fk joins keep their fanout.
# NOT the default: the canonical sf1 fixture (dims verbatim) is what
# every recorded sweep/bench number was measured on — changing it would
# silently re-baseline round-over-round comparisons.
SCALED_DIMS = {
    "customer": (["c_custkey"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
}


def generate(src_dir: str = "/root/testdata/sf0.1",
             out_dir: str = "/tmp/phenoxtract_sf1",
             copies: int = COPIES, force: bool = False,
             scale_dims: bool = False) -> str:
    """Build the scaled dataset; returns ``out_dir``.  No-op if the marker
    file exists (cheap cache for repeated bench runs)."""
    marker = os.path.join(out_dir, "_GENERATED")
    if os.path.exists(marker) and not force:
        return out_dir
    import pyarrow.parquet as pq

    scaled_tables = dict(SCALED)
    verbatim = list(COPY_VERBATIM)
    if scale_dims:
        scaled_tables.update(SCALED_DIMS)
        verbatim = [n for n in verbatim if n not in SCALED_DIMS]

    os.makedirs(out_dir, exist_ok=True)
    for name, (id_cols, text_col) in scaled_tables.items():
        src = os.path.join(src_dir, f"{name}.parquet")
        table = pq.read_table(src)
        scaled = _scaled_copies(table, id_cols, text_col, copies)
        pq.write_table(scaled, os.path.join(out_dir, f"{name}.parquet"))
    for name in verbatim:
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.exists(src):
            shutil.copyfile(src, os.path.join(out_dir, f"{name}.parquet"))
    with open(marker, "w") as f:
        f.write(f"copies={copies} src={src_dir} scale_dims={scale_dims}\n")
    return out_dir


if __name__ == "__main__":
    import sys
    out = generate(force="--force" in sys.argv)
    print(out)
