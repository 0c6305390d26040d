#!/usr/bin/env python3
"""Build a local sf1.0 verification tier (10x sf0.1) by deterministic
key-shifted replication of the driver's read-only sf0.1 tables.

The driver's generator is not available (TESTDATA.md: do NOT
regenerate), and every oracle is a self-consistent SQL replay over
whatever parquet it is pointed at — so a scaled tier only needs the
same schemas and unique keys, not the same distributions. Replicated
text/embeddings mean the dedup/ANN queries see massive planted
duplicate clusters at 10x volume, which is exactly the stress the
sf1.0 tier exists to flush (hot LSH buckets, bounded collects,
iteration costs). Dimension tables (nation/region + the TPC-H dims)
are copied, not scaled, like real dims.

Usage: python3 scripts/gen_sf1.py [outdir]   (default /tmp/sf1.0)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0"
K = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads=16")


def span_of(table, col):
    return con.execute(
        f"SELECT coalesce(max({col}), 0) + 1 FROM '{SRC}/{table}.parquet'").fetchone()[0]


def scale(table, key_shifts):
    """UNION ALL K copies; key_shifts maps column -> (span_table,
    span_col) so foreign keys shift by their REFERENCED table's span and
    stay coherent across copies."""
    spans = {c: span_of(st, sc) for c, (st, sc) in key_shifts.items()}
    selects = []
    desc = con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()
    for k in range(K):
        cols = []
        for name, typ, *_ in desc:
            if name in key_shifts:
                cols.append(f"CAST({name} + {k * spans[name]} AS {typ}) AS {name}")
            else:
                cols.append(name)
        selects.append(f"SELECT {', '.join(cols)} FROM '{SRC}/{table}.parquet'")
    sql = " UNION ALL ".join(selects)
    con.execute(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


def copy(table):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
                f"TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    print(f"{table}: copied")


scale("documents", {"doc_id": ("documents", "doc_id")})
scale("embeddings", {"vec_id": ("embeddings", "vec_id")})
scale("events", {"event_id": ("events", "event_id"),
                 "user_id": ("events", "user_id")})
scale("orders", {"o_orderkey": ("orders", "o_orderkey"),
                 "o_custkey": ("customer", "c_custkey")})
scale("lineitem", {"l_orderkey": ("orders", "o_orderkey")})
scale("customer", {"c_custkey": ("customer", "c_custkey")})
copy("supplier")
copy("part")
copy("nation")
copy("region")
print(f"sf1.0 tier at {OUT}")
