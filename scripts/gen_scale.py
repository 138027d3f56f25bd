#!/usr/bin/env python3
"""Scale-rehearsal fixture generator (see SCALE.md).

Replicates /root/testdata/sf0.1 COPIES times with deterministic,
disjoint key offsets — the same linear-growth model TPC-H uses:
dims (region, nation) stay fixed, facts and their foreign keys grow
linearly. Copy 0 is byte-identical to the source, so sf0.1 results
embed in the scaled fixture.

Two tables need decorrelation, not just key offsets:
 - documents: a verbatim 10x replication would hand the near-dup
   pipeline a pathological corpus (every doc in a 10-clique of exact
   dups => C(10,2) pairs per doc), so copies c>0 append a copy tag to
   every 3rd word. Word 3-gram/5-gram shingle windows all contain a
   tagged word, so cross-copy Jaccard collapses to ~0 while the
   per-copy dup structure (what the queries measure) is preserved.
   n_chars is recomputed to keep the n_chars == length(text) fixture
   invariant.
 - embeddings: copies cyclically shift the vector by c positions, so
   cross-copy cosines decorrelate instead of forming exact-duplicate
   ANN neighborhoods.

Usage: gen_scale.py OUTDIR COPIES   (COPIES=10 ~ sf1)
"""
import sys
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def max_plus_one(table: pa.Table, col: str) -> int:
    return pc.max(table.column(col)).as_py() + 1


def offset_col(table: pa.Table, col: str, off: int) -> pa.Table:
    i = table.schema.get_field_index(col)
    typ = table.schema.field(i).type
    shifted = pc.cast(pc.add(table.column(col), off), typ)
    return table.set_column(i, table.schema.field(i), shifted)


def perturb_documents(table: pa.Table, c: int) -> pa.Table:
    texts = table.column("text").to_pylist()
    new_texts = []
    for t in texts:
        words = t.split(" ")
        words = [w + f"z{c}" if j % 3 == 0 else w for j, w in enumerate(words)]
        new_texts.append(" ".join(words))
    n_chars = [len(t) for t in new_texts]
    ti = table.schema.get_field_index("text")
    table = table.set_column(ti, table.schema.field(ti),
                             pa.array(new_texts, type=pa.string()))
    ni = table.schema.get_field_index("n_chars")
    table = table.set_column(ni, table.schema.field(ni),
                             pa.array(n_chars, type=pa.int64()))
    return table


def rotate_embeddings(table: pa.Table, c: int) -> pa.Table:
    embs = table.column("embedding").to_pylist()
    rotated = [e[c % len(e):] + e[:c % len(e)] if e else e for e in embs]
    i = table.schema.get_field_index("embedding")
    return table.set_column(i, table.schema.field(i),
                            pa.array(rotated, type=table.schema.field(i).type))


def main() -> None:
    outdir, copies = sys.argv[1], int(sys.argv[2])
    os.makedirs(outdir, exist_ok=True)

    src = {t: pq.read_table(f"{SRC}/{t}.parquet")
           for t in ("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "events", "documents", "embeddings")}

    mc = max_plus_one(src["customer"], "c_custkey")
    ms = max_plus_one(src["supplier"], "s_suppkey")
    mp = max_plus_one(src["part"], "p_partkey")
    mo = max_plus_one(src["orders"], "o_orderkey")
    me = max_plus_one(src["events"], "event_id")
    mu = max_plus_one(src["events"], "user_id")
    md = max_plus_one(src["documents"], "doc_id")  # vec_id ⊆ doc_id: share md

    # key-offset units per table; scaled by the copy index c
    offsets = {
        "customer": {"c_custkey": mc},
        "supplier": {"s_suppkey": ms},
        "part": {"p_partkey": mp},
        "orders": {"o_orderkey": mo, "o_custkey": mc},
        "lineitem": {"l_orderkey": mo, "l_partkey": mp, "l_suppkey": ms},
        "events": {"event_id": me, "user_id": mu},
        "documents": {"doc_id": md},
        "embeddings": {"vec_id": md},
    }

    for t in ("region", "nation"):  # dims fixed at every scale, as in TPC-H
        pq.write_table(src[t], f"{outdir}/{t}.parquet")

    for t, keys in offsets.items():
        parts = []
        for c in range(copies):
            tab = src[t]
            for col, unit in keys.items():
                tab = offset_col(tab, col, c * unit)
            if c > 0 and t == "documents":
                tab = perturb_documents(tab, c)
            if c > 0 and t == "embeddings":
                tab = rotate_embeddings(tab, c)
            parts.append(tab)
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{outdir}/{t}.parquet")
        print(f"{t}: {out.num_rows} rows")


if __name__ == "__main__":
    main()
