#!/usr/bin/env python3
"""Synthesize an sf1-scale fixture tree from the driver's sf0.1 fixtures
(r17 optimization round, VERDICT r16 "Next round" #2): the driver ships no
sf1 tree, and the r16 scaling block proved sf0.1 sits BELOW the local
parallelism knee (8-vs-32-core ratios all ~1), so width/partitioning rules
tuned there are scheduling-floor measurements. This tool builds a 10x tree
purely for PAIRED PERF WINDOWS — it is NOT driver data and is never used
for correctness rounds.

Construction: 10 replicas of every scaling table with disjoint key spaces
(per-table offsets chosen to stay inside the packing domains the operators
document, e.g. affinityGraph's d*1e6+node rank packing needs node < 1e6).
region/nation stay fixed (TPC-H convention). Foreign keys stay consistent
within each replica (customer offset == user_id offset == o_custkey
offset). Two de-degeneration tweaks, both needed to keep the 10x tree's
JOIN/DEDUP shape linear like real scaled data instead of quadratic in the
replica count:
  - documents: every token gets a per-replica suffix for replicas > 0, so
    identical texts do NOT collide across replicas in the minhash/shingle
    band joins (10 identical copies of each doc would turn every LSH band
    group of size k into 10k -> ~100x candidate pairs, not 10x).
    n_chars is adjusted by the added suffix bytes (one per token).
  - embeddings: per-replica epsilon added to each component, so ANN
    ground-truth top-k does not acquire 10-way exact-distance ties.
Timestamps are kept as-is: 10x events in the same time range = 10x rate,
which scales streaming state per batch the way a bigger feed would.

Usage: python3 tools/make_sf1.py [out_dir]   (default /root/sf1_synth)
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/sf1_synth"
R = 10  # replicas

# per-table key offsets (> max key at sf0.1, small enough for the packed
# rank domains: max custkey 15000+9*20000=195000 -> graph node 390001 < 1e6)
OFF = {"cust": 20000, "supp": 2000, "part": 25000, "order": 200000,
       "event": 200000, "doc": 10000, "vec": 5000}


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")

    def gen(table, select_body):
        parts = [select_body.format(i=i) + f" FROM read_parquet('{SRC}/{table}.parquet')"
                 for i in range(R)]
        sql = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{OUT}/{table}.parquet')").fetchone()[0]
        print(f"{table}: {n} rows")

    # dims that do not scale: straight copies
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        print(f"{t}: copied")

    gen("customer",
        "SELECT c_custkey + {i}*%d AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment" % OFF["cust"])
    gen("supplier",
        "SELECT s_suppkey + {i}*%d AS s_suppkey, s_name, s_nationkey, "
        "s_acctbal" % OFF["supp"])
    gen("part",
        "SELECT p_partkey + {i}*%d AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice" % OFF["part"])
    gen("orders",
        "SELECT o_orderkey + {i}*%d AS o_orderkey, o_custkey + {i}*%d AS "
        "o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
        % (OFF["order"], OFF["cust"]))
    gen("lineitem",
        "SELECT l_orderkey + {i}*%d AS l_orderkey, l_partkey + {i}*%d AS "
        "l_partkey, l_suppkey + {i}*%d AS l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate" % (OFF["order"], OFF["part"], OFF["supp"]))
    gen("events",
        "SELECT event_id + {i}*%d AS event_id, ts, user_id + {i}*%d AS "
        "user_id, event_type, value, props" % (OFF["event"], OFF["cust"]))
    # replica 0 keeps the original text; replicas >0 suffix every token
    gen("documents",
        "SELECT doc_id + {i}*%d AS doc_id, CASE WHEN {i} = 0 THEN text ELSE "
        "regexp_replace(text, '(\\S+)', '\\1{i}', 'g') END AS text, lang, "
        "source, n_chars + CASE WHEN {i} = 0 THEN 0 ELSE "
        "len(string_split(text, ' ')) END AS n_chars" % OFF["doc"])
    gen("embeddings",
        "SELECT vec_id + {i}*%d AS vec_id, CASE WHEN {i} = 0 THEN embedding "
        "ELSE list_transform(embedding, x -> CAST(x + {i}*0.0011 AS FLOAT)) "
        "END AS embedding, label" % OFF["vec"])
    print(f"done -> {OUT}")


if __name__ == "__main__":
    main()
