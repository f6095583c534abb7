#!/usr/bin/env python3
"""Deterministic SKEW amplifier for the adversarial gate program.

The four round-6 adversarial swaps covered edge VALUES (NULLs,
malformed input, zero-norm vectors, unicode). This one covers the
remaining 100 TB failure mode: DISTRIBUTION — hot keys and mega
duplicate groups. It rewrites a testdata scale-factor dir into a
schema-identical sibling where:

  events:     30% of events land on ONE hot user (event_id % 10 < 3),
              and the even-id two-thirds of those are 'click' — the
              hot-user sessionize / as-of / funnel regime;
  orders:     30% of orders belong to ONE hot customer (the skewed
              groupBy/join key q37/q74 exist for);
  lineitem:   10% of lineitems attach to ONE hot order (join fan-out);
  customer:   50% of customers in ONE nation (hot dim group);
  documents:  20% of docs share ONE text and a further 20% share one
              of 5 texts (mega exact-dup groups, stop-shingles over
              the df-cap, oversized LSH buckets);
  embeddings: 30% of vectors are copies of vector 0 (degenerate ANN /
              hyperplane buckets, zero-distance top-k ties).

Everything keyed off existing ids (FKs stay valid), schema preserved
byte-for-byte from the source files, fully deterministic (no RNG —
membership is `key % 10 < k`). The oracle gate (tools/check.py) runs
unchanged against the output dir: the engine and DuckDB must agree on
skewed data exactly as they do on uniform data, and the bench must
degrade sub-linearly, not quadratically, on the hot groups.

Usage: python3 tools/skewgen.py <srcSfDir> <outDir>
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def load(src, name):
    return pq.read_table(f"{src}/{name}.parquet")


def save(out, name, table, schema):
    # cast back to the source schema (field order, types, metadata
    # stripped) so Spark and DuckDB read the swap exactly as they read
    # the original
    pq.write_table(table.select(schema.names).cast(
        schema.remove_metadata()), f"{out}/{name}.parquet")


def skew_col(table, col, mask, hot_value):
    """Set `col` to hot_value where mask, preserving everything else."""
    idx = table.schema.get_field_index(col)
    hot = pa.array([hot_value] * len(table)).cast(table.schema.field(col).type)
    return table.set_column(idx, table.schema.field(col),
                            pc.if_else(mask, hot, table.column(col)))


def pct_mask(table, key, k):
    """Deterministic ~k*10% membership: key % 10 < k. (This pyarrow
    build ships no modulo kernel, so the mask is built row-wise —
    testdata scale, not a bottleneck.)"""
    return pa.array([v is not None and abs(v) % 10 < k
                     for v in table.column(key).to_pylist()], pa.bool_())


def main(src, out):
    import os
    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation", "part", "supplier"):
        t = load(src, name)
        save(out, name, t, t.schema)

    cust = load(src, "customer")
    hot_nation = cust.column("c_nationkey")[0].as_py()
    save(out, "customer",
         skew_col(cust, "c_nationkey", pct_mask(cust, "c_custkey", 5),
                  hot_nation), cust.schema)

    orders = load(src, "orders")
    hot_cust = orders.column("o_custkey")[0].as_py()
    save(out, "orders",
         skew_col(orders, "o_custkey", pct_mask(orders, "o_orderkey", 3),
                  hot_cust), orders.schema)

    li = load(src, "lineitem")
    hot_order = li.column("l_orderkey")[0].as_py()
    save(out, "lineitem",
         skew_col(li, "l_orderkey", pct_mask(li, "l_orderkey", 1),
                  hot_order), li.schema)

    ev = load(src, "events")
    hot_user = ev.column("user_id")[0].as_py()
    t = skew_col(ev, "user_id", pct_mask(ev, "event_id", 3), hot_user)
    click_mask = pa.array(
        [v is not None and abs(v) % 10 < 3 and v % 2 == 0
         for v in t.column("event_id").to_pylist()], pa.bool_())
    save(out, "events",
         skew_col(t, "event_type", click_mask, "click"), ev.schema)

    docs = load(src, "documents")
    mega = docs.column("text")[0].as_py()
    five = [docs.column("text")[i].as_py() for i in range(1, 6)]
    doc_id = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    new_texts = []
    for i, t_ in zip(doc_id, texts):
        m = i % 10
        if m < 2:
            new_texts.append(mega)          # 20%: ONE mega group
        elif m < 4:
            # (i // 10) decorrelates the group pick from the m-gate
            new_texts.append(five[(i // 10) % 5])   # 20%: one of 5 groups
        else:
            new_texts.append(t_)
    tbl = docs.set_column(docs.schema.get_field_index("text"),
                          docs.schema.field("text"),
                          pa.array(new_texts, pa.string()))
    n_chars = pa.array([len(s) if s is not None else None
                        for s in new_texts], pa.int64())
    tbl = tbl.set_column(tbl.schema.get_field_index("n_chars"),
                         tbl.schema.field("n_chars"), n_chars)
    save(out, "documents", tbl, docs.schema)

    emb = load(src, "embeddings")
    v0 = emb.column("embedding")[0].as_py()
    vec_id = emb.column("vec_id").to_pylist()
    vecs = emb.column("embedding").to_pylist()
    new_vecs = [v0 if i % 10 < 3 else v for i, v in zip(vec_id, vecs)]
    tbl = emb.set_column(emb.schema.get_field_index("embedding"),
                         emb.schema.field("embedding"),
                         pa.array(new_vecs, emb.schema.field("embedding").type))
    save(out, "embeddings", tbl, emb.schema)
    print(f"skewed swap written to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
