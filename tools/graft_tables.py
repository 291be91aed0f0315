"""The ONE copy of the sf-fixture table list + DuckDB view bootstrap,
shared by bench_duckdb.py and check_oracle.py — previously duplicated,
so a new base table added to one silently broke the other (r14 bench
review)."""

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def create_views(con, sf_dir):
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
