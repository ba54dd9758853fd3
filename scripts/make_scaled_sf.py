"""Build a LOCAL measurement-only corpus that approximates the
driver's larger scale factors (the driver generates its own sf1.0;
/root/testdata stops at sf0.1) so optimization rounds can measure
where the driver measures.

Each replica r of a document keeps the length/vocabulary profile but
appends a replica marker token, so near-dup/minhash/embedding
distributions stay realistic instead of collapsing into 10-way exact
duplicate groups. doc_ids are offset per replica to stay unique.
Layout mimics the driver's: ONE parquet file, ONE row group per
table (scan parallelism behaves the same way).

Usage: python scripts/make_scaled_sf.py [factor] [src_dir] [dst_dir]
"""
from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_scaled_{factor}x"
    os.makedirs(dst, exist_ok=True)

    docs = pq.read_table(f"{src}/documents.parquet")
    n = docs.num_rows
    parts = []
    for r in range(factor):
        t = docs
        if r > 0:
            did = pc.add(t.column("doc_id"), r * n)
            text = pc.binary_join_element_wise(
                t.column("text").cast(pa.string()),
                pa.array([f"w{r}"] * n, pa.string()), " ")
            nch = pc.add(t.column("n_chars"), len(f" w{r}"))
            t = t.set_column(t.schema.get_field_index("doc_id"),
                             "doc_id", did)
            t = t.set_column(t.schema.get_field_index("text"),
                             "text", text)
            t = t.set_column(t.schema.get_field_index("n_chars"),
                             "n_chars", nch)
        parts.append(t)
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{dst}/documents.parquet",
                   row_group_size=big.num_rows)

    emb = pq.read_table(f"{src}/embeddings.parquet")
    eparts = []
    key = emb.schema.names[0]
    for r in range(factor):
        t = emb
        if r > 0:
            t = t.set_column(0, key, pc.add(t.column(key), r * n))
        eparts.append(t)
    ebig = pa.concat_tables(eparts)
    pq.write_table(ebig, f"{dst}/embeddings.parquet",
                   row_group_size=ebig.num_rows)

    for other in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events"):
        p = f"{src}/{other}.parquet"
        if os.path.exists(p):
            shutil.copy(p, f"{dst}/{other}.parquet")
    print(f"wrote {dst}: documents={big.num_rows}")


if __name__ == "__main__":
    main()
