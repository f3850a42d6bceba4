#!/usr/bin/env python3
"""Amplify documents.parquet to a REAL-SHAPE large corpus: mostly unique
documents with a small duplicated minority.

gen_scale.py's amplification copies texts with only a tiny "copyK " prefix,
so every token window beyond the prefix duplicates across all copies — the
dense-dup ADVERSARIAL regime (ratio ~0.9 for substring/span dedup). Real
corpora sit near the opposite end: the round-11/12 routing splits exist
because most documents lose nothing. This generator rewrites copy k's
tokens with a "_k" suffix (token-level mutation → no shared windows) for
19 of every 20 documents, and leaves every 20th document's text VERBATIM
(those duplicate across all copies) — ~5% cut docs at any factor, the
shape the clean-doc routing is built for.

Usage: python3 tools/gen_realshape.py <src_sf_dir> <dest_dir> <factor>
Writes OUTSIDE /root/testdata (that tree is read-only by contract).
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main(src: str, dest: str, factor: int) -> None:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    n = t.num_rows
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    others = [c for c in t.column_names if c not in ("doc_id", "text")]
    out_ids, out_texts = [], []
    out_others = {c: [] for c in others}
    for k in range(factor):
        for i in range(n):
            out_ids.append((ids[i] if ids[i] is not None else 0) + k * n)
            tx = texts[i]
            if tx is None or k == 0 or (ids[i] is not None and ids[i] % 20 == 0):
                out_texts.append(tx)  # verbatim: the duplicated minority
            else:
                out_texts.append(" ".join(
                    f"{w}_{k}" for w in tx.split(" ")))
            for c in others:
                out_others[c].append(t.column(c)[i].as_py())
    cols = {"doc_id": out_ids, "text": out_texts}
    cols.update(out_others)
    arrays, names = [], []
    for name in t.column_names:
        field = t.schema.field(name)
        arrays.append(pa.array(cols[name], type=field.type))
        names.append(name)
    os.makedirs(dest, exist_ok=True)
    pq.write_table(pa.table(dict(zip(names, arrays))),
                   os.path.join(dest, "documents.parquet"))
    print(f"wrote {len(out_ids)} docs to {dest}/documents.parquet")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
