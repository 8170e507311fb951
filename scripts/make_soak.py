"""Build a ~10x scale-soak directory from sf0.1 (default /tmp/soak_sf1).

The testdata generator tops out at sf0.1; this manufactures the next
order of magnitude by unioning K key-shifted copies of each fact table
so the iterative tier (connected-component closures, k-core peels,
personalized PageRank, fixed-Lloyd k-means, stream drains) can be
checked for correctness parity AND super-linear blowup at 10x volume:

- events: event_id shifted per copy; ts shifted +i days (longer daily
  series for the gap-fill/EWMA/CUSUM family); users UNCHANGED, so
  per-user group sizes grow 10x — the skew direction that hurts.
- documents: doc_id shifted; copies i>0 get a 3-token suffix so the
  near-dup families face 10-way ~0.9-Jaccard clusters (dense
  components) instead of degenerate exact duplicates; n_chars
  recomputed.
- embeddings: vec_id shifted, vectors unchanged — every ANN band
  bucket holds 10 exact collisions per point.
- orders/lineitem: orderkey shifted in lockstep (FK preserved), same
  customers/parts — the co-purchase graph gets 10x denser, not wider.
- dimensions (region nation customer supplier part): copied as-is
  (dims don't scale with fact volume).

Deterministic (pure projection, no RNG). Usage:
    python scripts/make_soak.py [out_dir] [copies]
"""
from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_sf1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    shift = 10_000_000_000

    def build(table: str, select_i: str) -> None:
        parts = " UNION ALL ".join(
            select_i.format(i=i, off=i * shift) for i in range(k))
        con.execute(
            f"COPY ({parts}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.sql(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    build("events", f"""
        SELECT event_id + {{off}} AS event_id,
               ts + INTERVAL ({{i}}) DAY AS ts,
               user_id, event_type, value, props
        FROM '{SRC}/events.parquet'""")
    build("documents", f"""
        SELECT doc_id + {{off}} AS doc_id,
               CASE WHEN {{i}} = 0 THEN text
                    ELSE text || ' copy variant {{i}}' END AS text,
               lang, source,
               CAST(length(CASE WHEN {{i}} = 0 THEN text
                    ELSE text || ' copy variant {{i}}' END) AS BIGINT)
                 AS n_chars
        FROM '{SRC}/documents.parquet'""")
    build("embeddings", f"""
        SELECT vec_id + {{off}} AS vec_id, embedding, label
        FROM '{SRC}/embeddings.parquet'""")
    build("orders", f"""
        SELECT o_orderkey + {{off}} AS o_orderkey, o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""")
    build("lineitem", f"""
        SELECT l_orderkey + {{off}} AS l_orderkey, l_partkey, l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""")
    for dim in ("region", "nation", "customer", "supplier", "part"):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') TO "
                    f"'{out}/{dim}.parquet' (FORMAT PARQUET)")
        print(f"{dim}: copied")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
