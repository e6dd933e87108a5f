"""Synthesize an sf1.0 dataset as a 10x FK-consistent scale-up of sf0.1.

The driver ships sf{0.001,0.01,0.1}; the robustness sweep wants one more
decade. Each fact table is replicated REPLICAS times with every key
column offset by replica * (max_key + 1), applied consistently on both
sides of every FK edge (customer<-orders<-lineitem, part/supplier<-
lineitem, customer<-events.user_id, documents<-embeddings), so the join
graph of replica k is an exact isomorphic copy of replica 0 -- row
counts, join fan-outs, and group cardinalities all scale linearly, which
is exactly the shape a scale sweep should hold fixed. Dimension tables
(region, nation) stay as-is, like real dimensions would.

Document text gets a per-replica suffix so the near-dup family doesn't
degenerate into "every doc has 9 planted twins"; timestamps are NOT
shifted -- series count grows 10x while per-series length stays fixed,
matching how a bigger market feed actually grows.

pyarrow end-to-end: preserves the physical types the engine's source
layer depends on (events.ts keeps the SOURCE file's timestamp unit —
ns or us, whichever this round's driver generated — so the sniffing
source path is exercised identically at every scale).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPLICAS = 10

# table -> columns that carry each key family
KEY_FAMILIES = {
    "custkey": {"customer": ["c_custkey"], "orders": ["o_custkey"],
                "events": ["user_id"]},
    "orderkey": {"orders": ["o_orderkey"], "lineitem": ["l_orderkey"]},
    "partkey": {"part": ["p_partkey"], "lineitem": ["l_partkey"]},
    "suppkey": {"supplier": ["s_suppkey"], "lineitem": ["l_suppkey"]},
    "eventid": {"events": ["event_id"]},
    "docid": {"documents": ["doc_id"], "embeddings": ["vec_id"]},
}

SCALED_TABLES = ("customer", "supplier", "part", "orders", "lineitem",
                 "events", "documents", "embeddings")
COPIED_TABLES = ("region", "nation")


def _key_strides(src: str) -> dict[str, int]:
    """max_key + 1 per key family, computed over every column that carries
    the family (offsets must exceed every occurrence, FK orphans included)."""
    strides: dict[str, int] = {}
    for fam, tables in KEY_FAMILIES.items():
        mx = 0
        for tbl, cols in tables.items():
            t = pq.read_table(os.path.join(src, f"{tbl}.parquet"), columns=cols)
            for c in cols:
                mx = max(mx, pc.max(t[c]).as_py() or 0)
        strides[fam] = mx + 1
    return strides


def _offset_cols(tbl: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for fam, tables in KEY_FAMILIES.items():
        for c in tables.get(tbl, []):
            out[c] = fam
    return out


def scale_table(src: str, dst: str, tbl: str, strides: dict[str, int]) -> int:
    t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
    offsets = _offset_cols(tbl)
    replicas = []
    for k in range(REPLICAS):
        cols = []
        for name in t.column_names:
            col = t[name]
            if name in offsets and k > 0:
                delta = pa.scalar(k * strides[offsets[name]],
                                  type=col.type)
                col = pc.add(col, delta)
            if tbl == "documents" and name == "text" and k > 0:
                col = pc.binary_join_element_wise(
                    pc.cast(col, pa.string()), f" [r{k}]", "")
            cols.append(col)
        replicas.append(pa.table(cols, schema=t.schema))
    scaled = pa.concat_tables(replicas)
    if tbl == "documents":
        # keep n_chars consistent with the perturbed text
        n_chars = pc.cast(pc.utf8_length(scaled["text"]), pa.int64())
        idx = scaled.column_names.index("n_chars")
        scaled = scaled.set_column(idx, scaled.schema.field("n_chars"), n_chars)
    # version 2.6 can store ns timestamps; without it pyarrow silently
    # coerces ns -> us and the scale-up would not exercise the same
    # source path as the original file
    pq.write_table(scaled, os.path.join(dst, f"{tbl}.parquet"),
                   version="2.6")
    return scaled.num_rows


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "_artifacts", "sf1.0",
    )
    os.makedirs(dst, exist_ok=True)
    strides = _key_strides(src)
    print("key strides:", strides)
    for tbl in COPIED_TABLES:
        t = pq.read_table(os.path.join(src, f"{tbl}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{tbl}.parquet"))
        print(f"{tbl}: copied {t.num_rows}")
    for tbl in SCALED_TABLES:
        n = scale_table(src, dst, tbl, strides)
        print(f"{tbl}: scaled to {n}")
    # physical-type parity check on the unit-sensitive column
    src_ts = pq.read_schema(os.path.join(src, "events.parquet")).field("ts").type
    ts_type = pq.read_schema(os.path.join(dst, "events.parquet")).field("ts").type
    assert ts_type == src_ts, (src_ts, ts_type)
    print("events.ts type preserved:", ts_type)


if __name__ == "__main__":
    main()
