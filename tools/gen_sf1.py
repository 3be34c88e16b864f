#!/usr/bin/env python3
"""Regenerate the /tmp/testdata_sf1 rehearsal fixture: 10x sf0.1 with
key offsets so referential joins stay consistent, and per-copy text
perturbation so dedup workloads don't explode quadratically.
Driver-side tooling only (duckdb), never an engine dependency."""
import duckdb, os

SRC = "/root/testdata/sf0.1"
DST = "/tmp/testdata_sf1"
COPIES = 10
os.makedirs(DST, exist_ok=True)
con = duckdb.connect()

def mx(table, col):
    return con.execute(
        f"SELECT max({col})+1 FROM read_parquet('{SRC}/{table}.parquet')").fetchone()[0]

def gen(table, select_i):
    parts = [select_i(i) for i in range(COPIES)]
    sql = " UNION ALL ".join(parts)
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{table}.parquet')").fetchone()[0]
    print(f"{table}: {n}")

# tiny dims: copy as-is (single copy)
for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    print(t, "copied")

ck, ok_, sk, pk = mx("customer", "c_custkey"), mx("orders", "o_orderkey"), \
    mx("supplier", "s_suppkey"), mx("part", "p_partkey")
eid, uid = mx("events", "event_id"), mx("events", "user_id")
did, vid = mx("documents", "doc_id"), mx("embeddings", "vec_id")

gen("customer", lambda i:
    f"SELECT c_custkey + {i*ck} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment "
    f"FROM read_parquet('{SRC}/customer.parquet')")
gen("supplier", lambda i:
    f"SELECT s_suppkey + {i*sk} AS s_suppkey, s_name, s_nationkey, s_acctbal "
    f"FROM read_parquet('{SRC}/supplier.parquet')")
gen("part", lambda i:
    f"SELECT p_partkey + {i*pk} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice "
    f"FROM read_parquet('{SRC}/part.parquet')")
gen("orders", lambda i:
    f"SELECT o_orderkey + {i*ok_} AS o_orderkey, o_custkey + {i*ck} AS o_custkey, "
    f"o_orderstatus, o_totalprice, o_orderdate, o_orderpriority "
    f"FROM read_parquet('{SRC}/orders.parquet')")
gen("lineitem", lambda i:
    f"SELECT l_orderkey + {i*ok_} AS l_orderkey, l_partkey + {i*pk} AS l_partkey, "
    f"l_suppkey + {i*sk} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, "
    f"l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
    f"FROM read_parquet('{SRC}/lineitem.parquet')")
gen("events", lambda i:
    f"SELECT event_id + {i*eid} AS event_id, ts, user_id + {i*uid} AS user_id, "
    f"event_type, value, props FROM read_parquet('{SRC}/events.parquet')")
# copy 0 intact; later copies append a copy-marker token so near-dup
# workloads grow linearly, matching the prior rehearsal fixture's shape
gen("documents", lambda i:
    f"SELECT doc_id + {i*did} AS doc_id, "
    + ("text," if i == 0 else f"text || ' c{i}' AS text,")
    + f" lang, source, "
    + ("n_chars" if i == 0 else f"n_chars + {len(f' c{i}')} AS n_chars")
    + f" FROM read_parquet('{SRC}/documents.parquet')")
gen("embeddings", lambda i:
    f"SELECT vec_id + {i*vid} AS vec_id, embedding, label "
    f"FROM read_parquet('{SRC}/embeddings.parquet')")
print("done ->", DST)
