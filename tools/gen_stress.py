#!/usr/bin/env python3
"""Generate a ~sf1 stress dataset (10x sf0.1) in /tmp/sfx1.

Replicates every sf0.1 table 10x with consistent key shifts (orderkey
shifts identically in orders+lineitem, custkey in customer+orders, etc.)
so joins stay referentially intact. Documents get a per-replica text tag
(a pure 10x-duplicate corpus would make dedup degenerate); events go
through pyarrow to write a TIMESTAMP-typed ts column (NANOS when the source
generation is NANOS, MICROS otherwise) — Spark reads either via
GraftSession's nanosAsLong + Tables.canonTs, both landing as BIGINT nanos.

Usage: python3 tools/gen_stress.py [outdir] [R] [--hot]  (default /tmp/sfx1, 10x; ~3 s)
Then:  SPARK_GRAFT_SF_DIR=/tmp/sfx1 SPARK_GRAFT_ONLY=q21_waiting,... \
         sbt "runMain graft.Bench"

--hot: adversarial hot-key mode — half of all events collapse onto ONE
topic ('click' ends up with ~60% of the stream) and half of all docs onto
ONE source ('src0' with ~52% of the corpus), by reassigning the label on
odd event_id/doc_id rows. Everything else (ids, payloads, join keys) is
untouched, so results CHANGE (it is a different dataset) but plan shapes
and skew behavior are measured on the same volume as the uniform replica
set — the §5 skew datapoints compare hot vs uniform time per query.
"""
import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import os
import sys

SRC = "/root/testdata/sf0.1"
args = [a for a in sys.argv[1:] if a != "--hot"]
HOT = "--hot" in sys.argv[1:]
for a in args:
    # A stray flag must never become an output directory (a '--help' dir of
    # parquet once got committed); only --hot is a real flag.
    if a.startswith("-"):
        sys.exit(__doc__ if a in ("-h", "--help") else f"unknown flag {a!r}\n\n{__doc__}")
OUT = args[0] if len(args) > 0 else "/tmp/sfx1"
R = int(args[1]) if len(args) > 1 else 10
os.makedirs(OUT, exist_ok=True)

con = duckdb.connect()
con.execute("PRAGMA threads=16")

for t in ["region", "nation"]:
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")


def mx(table, col):
    return con.execute(
        f"SELECT MAX({col})+1 FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchone()[0]


C, S, P, O = mx("customer", "c_custkey"), mx("supplier", "s_suppkey"), \
    mx("part", "p_partkey"), mx("orders", "o_orderkey")
D, V = mx("documents", "doc_id"), mx("embeddings", "vec_id")

rep = f"(SELECT CAST(i AS BIGINT) AS i FROM generate_series(0, {R-1}) t(i))"
jobs = {
    "customer": f"SELECT c_custkey + i*{C} AS c_custkey, c_name, c_nationkey,"
                f" c_acctbal, c_mktsegment FROM read_parquet('{SRC}/customer.parquet') CROSS JOIN {rep}",
    "supplier": f"SELECT s_suppkey + i*{S} AS s_suppkey, s_name, s_nationkey,"
                f" s_acctbal FROM read_parquet('{SRC}/supplier.parquet') CROSS JOIN {rep}",
    "part": f"SELECT p_partkey + i*{P} AS p_partkey, p_name, p_brand, p_type,"
            f" p_size, p_retailprice FROM read_parquet('{SRC}/part.parquet') CROSS JOIN {rep}",
    "orders": f"SELECT o_orderkey + i*{O} AS o_orderkey, o_custkey + i*{C} AS o_custkey,"
              f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
              f" FROM read_parquet('{SRC}/orders.parquet') CROSS JOIN {rep}",
    "lineitem": f"SELECT l_orderkey + i*{O} AS l_orderkey, l_partkey + i*{P} AS l_partkey,"
                f" l_suppkey + i*{S} AS l_suppkey, l_linenumber, l_quantity,"
                f" l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
                f" l_shipdate FROM read_parquet('{SRC}/lineitem.parquet') CROSS JOIN {rep}",
    "documents": f"SELECT doc_id + i*{D} AS doc_id,"
                 f" CASE WHEN i = 0 THEN text ELSE text || ' r' || i END AS text,"
                 f" lang, "
                 + (f"CASE WHEN (doc_id + i*{D}) % 2 = 1 THEN 'src0' ELSE source END AS source, "
                    if HOT else "source, ")
                 + f"n_chars FROM read_parquet('{SRC}/documents.parquet') CROSS JOIN {rep}",
    "embeddings": f"SELECT vec_id + i*{V} AS vec_id, embedding, label"
                  f" FROM read_parquet('{SRC}/embeddings.parquet') CROSS JOIN {rep}",
}
for t, q in jobs.items():
    con.execute(f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

# events via pyarrow: COPY would downcast ts to timestamp[us].
src = pq.read_table(f"{SRC}/events.parquet")
E = pc.max(src["event_id"]).as_py() + 1
U = pc.max(src["user_id"]).as_py() + 1
parts = []
for i in range(R):
    t = src
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t["event_id"], i * E))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t["user_id"], i * U))
    if HOT:
        # odd event_id -> topic 'click': one topic carries ~60% of the
        # stream (half of everything plus its own uniform fifth).
        hot = pc.equal(pc.bit_wise_and(t["event_id"], 1), 1)
        t = t.set_column(t.schema.get_field_index("event_type"), "event_type",
                         pc.if_else(hot, pa.scalar("click"), t["event_type"]))
    parts.append(t)
pq.write_table(pa.concat_tables(parts), f"{OUT}/events.parquet")
print("wrote", OUT, "(hot-key mode)" if HOT else "")
