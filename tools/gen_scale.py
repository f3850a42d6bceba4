#!/usr/bin/env python3
"""Amplify a driver testdata dir by an integer factor, preserving schemas.

Usage: python3 tools/gen_scale.py <src_sf_dir> <dest_dir> <factor>

Key shifts keep join semantics intact (copy k shifts every pk/fk family by
k * base-table-cardinality); dims (region, nation) are copied unchanged.
Document texts of copy k > 0 get a tiny "copyK " prefix: byte-exact dedup
does NOT collapse them while minhash/simhash see dense near-dup clusters
(~factor docs each) — the boilerplate-skew regime the banded-join bucket
cap exists for. Embedding vectors are copied verbatim for the same reason
(dense cosine clusters). Timestamp physical types (including the events
table's TIMESTAMP(NANOS)) survive because pyarrow rewrites the original
column values/types untouched.

Writes OUTSIDE /root/testdata (that tree is read-only by contract).
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFTS = {
    # table -> {column: base cardinality multiplier source table}
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
DIMS = ["region", "nation"]
TABLES = DIMS + list(SHIFTS)


def main(src: str, dest: str, factor: int) -> None:
    import os
    os.makedirs(dest, exist_ok=True)
    tables = {t: pq.read_table(f"{src}/{t}.parquet") for t in TABLES}
    base = {t: tables[t].num_rows for t in TABLES}
    # user_id is not a pk of events; shift by (max+1) so per-user event
    # streams stay disjoint across copies
    base["events_users"] = pc.max(tables["events"]["user_id"]).as_py() + 1

    for t in DIMS:
        pq.write_table(tables[t], f"{dest}/{t}.parquet")
        print(t, tables[t].num_rows, "copied")

    for t, shifts in SHIFTS.items():
        src_t = tables[t]
        copies = []
        for k in range(factor):
            cols = []
            for name in src_t.column_names:
                col = src_t[name]
                if name in shifts:
                    off = k * base[shifts[name]]
                    cols.append(pc.add(col, pa.scalar(off, type=col.type)))
                elif t == "documents" and name == "text" and k > 0:
                    prefix = pa.scalar(f"copy{k} ")
                    cols.append(pc.binary_join_element_wise(
                        prefix, col.combine_chunks(), ""))
                elif t == "documents" and name == "n_chars" and k > 0:
                    cols.append(pc.add(col, pa.scalar(len(f"copy{k} "),
                                                      type=col.type)))
                else:
                    cols.append(col)
            copies.append(pa.table(cols, schema=src_t.schema))
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{dest}/{t}.parquet")
        print(t, out.num_rows, f"= {factor} x {base[t]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
