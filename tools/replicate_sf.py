"""Build a larger benchmarking corpus by deterministic replication of an
existing sf dir (doc_id offsets keep ids unique — the same scheme
bench.prepare_pages uses for the pages corpus).

This is a LOCAL measurement aid only: the driver generates its own large
scale factors.  Replication makes the corpus dup-heavier than a freshly
generated one (every doc has R exact copies), which is conservative for
the dedup-family queries (their candidate structures only get denser).

Usage: python tools/replicate_sf.py <src_sf_dir> <dst_dir> <replication>
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_019  # prime-ish, same offset scheme as bench.prepare_pages


def replicate(src: str, dst: str, rep: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        s = os.path.join(src, name)
        d = os.path.join(dst, name)
        id_cols = {
            "documents.parquet": "doc_id",
            "embeddings.parquet": "vec_id",
            "lineitem.parquet": "l_orderkey",
            "orders.parquet": "o_orderkey",
            "events.parquet": "event_id",
        }
        if name in id_cols:
            t = pq.read_table(s)
            id_col = id_cols[name]
            parts = []
            for k in range(rep):
                ids = pc.add(t.column(id_col), k * OFFSET)
                parts.append(t.set_column(t.schema.get_field_index(id_col), id_col, ids))
            pq.write_table(pa.concat_tables(parts), d)
        else:
            shutil.copy(s, d)
    open(os.path.join(dst, "_DONE"), "w").close()


if __name__ == "__main__":
    replicate(sys.argv[1], sys.argv[2], int(sys.argv[3]))
