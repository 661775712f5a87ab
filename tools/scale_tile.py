#!/usr/bin/env python3
"""Tile /root/testdata/sf0.1 xK into a scratch dir for the scale rehearsal.

Deterministic key-shifting keeps every relationship meaningful instead of
degenerate:

  - Foreign keys shift by per-table strides (max(key)+1 from the base data),
    consistently on both sides (o_orderkey/l_orderkey, c_custkey/o_custkey,
    p_partkey/l_partkey, s_suppkey/l_suppkey), so joins match within a tile
    and never across tiles — the join graph grows as a disjoint union, the
    way a real corpus grows.
  - region/nation stay untiled (they are dimensions; c_nationkey/s_nationkey
    keep pointing at them) — exactly the broadcast-dim shape at 100 TB.
  - documents: tile 0 is the original corpus; tile i>0 suffixes EVERY token
    with a tile tag — a vocabulary bijection, so all within-tile dup/shingle/
    df structure is preserved exactly while cross-tile Jaccard drops to ~0
    (no artificial K^2 near-dup pair blowup). n_chars is recomputed.
  - embeddings: tile i>0 adds small deterministic uniform noise (seeded per
    tile), so cluster structure survives but no vector is an exact duplicate.
  - events: event_id/user_id shift (K x more users, same per-user behavior).

Usage: python3 tools/scale_tile.py K OUT_DIR [SRC_DIR]
"""
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def stride(con, src, table, key):
    return con.execute(f"SELECT max({key})+1 FROM '{src}/{table}.parquet'").fetchone()[0]


def tile(k: int, out: str, src: str = "/root/testdata/sf0.1") -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    sc = stride(con, src, "customer", "c_custkey")
    so = stride(con, src, "orders", "o_orderkey")
    sp = stride(con, src, "part", "p_partkey")
    ss = stride(con, src, "supplier", "s_suppkey")
    se = stride(con, src, "events", "event_id")
    su = stride(con, src, "events", "user_id")
    sd = stride(con, src, "documents", "doc_id")
    sv = stride(con, src, "embeddings", "vec_id")

    def copy(table, select):
        con.execute(
            f"COPY ({select}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")

    rng_k = f"CROSS JOIN range({k}) t(i)"
    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{src}/{t}.parquet'")
    copy("customer", f"""
        SELECT c_custkey + i*{sc} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet' {rng_k}""")
    copy("supplier", f"""
        SELECT s_suppkey + i*{ss} AS s_suppkey, s_name, s_nationkey, s_acctbal
        FROM '{src}/supplier.parquet' {rng_k}""")
    copy("part", f"""
        SELECT p_partkey + i*{sp} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        FROM '{src}/part.parquet' {rng_k}""")
    copy("orders", f"""
        SELECT o_orderkey + i*{so} AS o_orderkey, o_custkey + i*{sc} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet' {rng_k}""")
    copy("lineitem", f"""
        SELECT l_orderkey + i*{so} AS l_orderkey, l_partkey + i*{sp} AS l_partkey,
               l_suppkey + i*{ss} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
               l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet' {rng_k}""")
    copy("events", f"""
        SELECT event_id + i*{se} AS event_id, ts, user_id + i*{su} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet' {rng_k}""")
    copy("documents", f"""
        SELECT doc_id + i*{sd} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '([^ ]+)', '\\1x' || i, 'g') END AS text,
               lang, source,
               CAST(length(CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '([^ ]+)', '\\1x' || i, 'g') END) AS BIGINT) AS n_chars
        FROM '{src}/documents.parquet' {rng_k}""")

    emb = pq.read_table(f"{src}/embeddings.parquet")
    vec = np.stack([np.asarray(v, dtype=np.float32) for v in emb["embedding"].to_pylist()])
    ids = emb["vec_id"].to_numpy()
    parts = []
    for i in range(k):
        rng = np.random.default_rng(987_000 + i)
        v = vec if i == 0 else (vec + rng.uniform(-0.01, 0.01, vec.shape)).astype(np.float32)
        parts.append(pa.table({
            "vec_id": pa.array(ids + i * sv, pa.int64()),
            "embedding": pa.array([row for row in v], pa.list_(pa.float32())),
            "label": emb["label"],
        }))
    pq.write_table(pa.concat_tables(parts), f"{out}/embeddings.parquet")
    print(f"tiled x{k} -> {out}")


if __name__ == "__main__":
    k = int(sys.argv[1])
    out = sys.argv[2]
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    tile(k, out, src)
