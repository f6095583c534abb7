#!/usr/bin/env python3
"""Deterministic VALUE swap for the adversarial gate program.

Round 6's four ad hoc swaps (edge values: NULLs, malformed input,
unicode, extremes) surfaced 16 cross-engine divergences but lived
outside the repo; this commits the regime as a reproducible generator
so every new operator is gated against the same classes. It rewrites a
testdata scale-factor dir into a schema-identical sibling where:

  documents:  doc 0 empty text; doc 1 whitespace-only; doc 2 unicode
              (CJK + accents + emoji); doc 3 regex metacharacters;
              doc 4 one 1000-char token; doc 5 a single word; docs
              6-8 one identical text (exact-dup group); docs 9/10 a
              planted near-dup pair (one-token mutation of a 40-token
              text) — exercising tokenize/shingle/entropy/LM/dup-span
              edges on q19-q26, q35, q38, q41-q42, q45, q49, q66-q68,
              q88-q89, q94-q100, q102, q107;
  events:     ~10% NULL user_id (event_id%10==3), ~10% NULL ts
              (event_id%10==7, disjoint), duplicate instants (two
              event pairs forced to share (user_id, ts)), one
              malformed props JSON — the q16-q17, q43, q59, q63-q64,
              q72, q84-q85, q101 regime;
  orders:     ~10% NULL o_orderdate (o_orderkey%10==4), ~5% NULL
              o_totalprice (%20==9), one negative and one huge
              total — the q02-q10, q15, q53-q58, q103-q106 regime;
  customer:   ~10% NULL c_mktsegment (c_custkey%10==6) — the q82,
              q105-q106 listagg/semi-join regime;
  embeddings: vec 0 all-zero (the cosine-0 zero-norm convention),
              vec 2 an exact duplicate of vec 1, vec 3 ±0.9995
              stripes (the float32→double half-up quantization
              edge) — the q27-q33, q39, q80, q91, q96, q112-q114
              ANN/PQ regime.

Everything else copies through byte-identical. Fully deterministic
(membership by key modulo, no RNG). The oracle gate (tools/check.py)
runs unchanged against the output: the engine and DuckDB must agree on
edge values exactly as they do on clean data.

Usage: python3 tools/swapgen.py <srcSfDir> <outDir>
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def load(src, name):
    return pq.read_table(f"{src}/{name}.parquet")


def save(out, name, table, schema):
    pq.write_table(table.select(schema.names).cast(
        schema.remove_metadata()), f"{out}/{name}.parquet")


def set_rows(table, col, updates):
    """Set col to value for the given row indices ({idx: value})."""
    i = table.schema.get_field_index(col)
    vals = table.column(col).to_pylist()
    for idx, v in updates.items():
        if idx < len(vals):
            vals[idx] = v
    return table.set_column(
        i, table.schema.field(col),
        pa.array(vals).cast(table.schema.field(col).type))


def key_pos(table, key, wanted):
    """Row position of each wanted KEY VALUE ({key_value: row_idx}).

    The id-targeted fixtures (vec_id 0-3, doc_id 0-10) are contracts
    on KEY VALUES — "vec 2 duplicates vec 1" must hold whatever order
    the source parquet was written in. Resolving positions by value
    (and failing loud on a missing id) keeps the fixture honest if a
    generator ever writes rows unsorted."""
    keys = table.column(key).to_pylist()
    pos = {}
    for i, k in enumerate(keys):
        if k in wanted and k not in pos:
            pos[k] = i
    missing = set(wanted) - set(pos)
    if missing:
        raise SystemExit(f"swapgen: no row with {key} in {sorted(missing)}")
    return pos


def set_by_key(table, col, key, updates):
    """set_rows keyed by the id column's VALUES, not row positions."""
    pos = key_pos(table, key, set(updates))
    return set_rows(table, col, {pos[k]: v for k, v in updates.items()})


def null_mask(table, col, key, mod, residue):
    """NULL out col where key % mod == residue (key non-null)."""
    i = table.schema.get_field_index(col)
    keys = table.column(key).to_pylist()
    mask = pa.array([k is not None and k % mod == residue for k in keys],
                    pa.bool_())
    nulls = pa.nulls(len(table), table.schema.field(col).type)
    return table.set_column(i, table.schema.field(col),
                            pc.if_else(mask, nulls, table.column(col)))


def main(src, out):
    os.makedirs(out, exist_ok=True)

    for name in ("region", "nation", "part", "supplier", "lineitem"):
        t = load(src, name)
        save(out, name, t, t.schema)

    # embeddings edge regime (vec_ids 0-3 are both QUERIES (<8) and
    # k-means SEEDS (<16), so these stress init + probe paths):
    #   0: all-zero vector -- the cosine-0 zero-norm convention, PQ
    #      residual = -centroid;
    #   2: exact duplicate of vector 1 -- dup pair through ANN/dedup,
    #      duplicate seed centroids (empty-cell drop, ties);
    #   3: +/-0.9995 stripes -- the float32->double half-up rounding
    #      edge of milli-unit quantization (both engines must read the
    #      same float32 and round identically).
    emb = load(src, "embeddings")
    epos = key_pos(emb, "vec_id", {0, 1, 2, 3})
    dim = len(emb.column("embedding")[epos[0]].as_py())
    v1 = emb.column("embedding")[epos[1]].as_py()
    emb = set_by_key(emb, "embedding", "vec_id", {
        0: [0.0] * dim,
        2: v1,
        3: [0.9995 if i % 2 == 0 else -0.9995 for i in range(dim)],
    })
    save(out, "embeddings", emb, emb.schema)

    docs = load(src, "documents")
    near_base = " ".join(f"tok{i}" for i in range(40))
    near_mut = " ".join("MUT" if i == 7 else f"tok{i}" for i in range(40))
    docs = set_by_key(docs, "text", "doc_id", {
        0: "",
        1: "   \t  ",
        2: "的 你好 café naïve 🚀 Straße ΣΔ жизнь 的 你好",
        3: "a.b (c) [d-e] f*g h+i j?k l|m ^n $o \\p",
        4: "x" * 1000 + " short tail",
        5: "solo",
        6: "identical duplicate text body for the exact group",
        7: "identical duplicate text body for the exact group",
        8: "identical duplicate text body for the exact group",
        9: near_base,
        10: near_mut,
    })
    # keep the corpus internally consistent (as skewgen does): n_chars
    # must agree with length(text) on exactly the edge rows this
    # fixture targets, else every n_chars consumer (quality z-score,
    # length bins) sees a signal contradicting the text
    texts = docs.column("text").to_pylist()
    n_chars = pa.array([len(s) if s is not None else None for s in texts],
                       docs.schema.field("n_chars").type)
    docs = docs.set_column(docs.schema.get_field_index("n_chars"),
                           docs.schema.field("n_chars"), n_chars)
    save(out, "documents", docs, docs.schema)

    ev = load(src, "events")
    ev = null_mask(ev, "user_id", "event_id", 10, 3)
    ev = null_mask(ev, "ts", "event_id", 10, 7)
    # duplicate instants: rows 1/2 and 5/6 share (user_id, ts)
    ts = ev.column("ts").to_pylist()
    uid = ev.column("user_id").to_pylist()
    ev = set_rows(ev, "ts", {2: ts[1], 6: ts[5]})
    ev = set_rows(ev, "user_id", {2: uid[1], 6: uid[5]})
    ev = set_rows(ev, "props", {4: "{not json"})
    save(out, "events", ev, ev.schema)

    orders = load(src, "orders")
    orders = null_mask(orders, "o_orderdate", "o_orderkey", 10, 4)
    orders = null_mask(orders, "o_totalprice", "o_orderkey", 20, 9)
    orders = set_rows(orders, "o_totalprice", {0: -123.45, 1: 9.9e10})
    save(out, "orders", orders, orders.schema)

    cust = load(src, "customer")
    cust = null_mask(cust, "c_mktsegment", "c_custkey", 10, 6)
    save(out, "customer", cust, cust.schema)

    print(f"swap fixture written to {out}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
