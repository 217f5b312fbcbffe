"""Local replica of the driver's t2 correctness check: run each catalog query
on Spark and its oracle SQL on DuckDB, compare row count, column names, and
(order-insensitively) values."""

from __future__ import annotations

import math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and fold tiny fp residue
        return round(v, 9) + 0.0
    return v


def compare(spark_df, con, sql, name="query"):
    """Return (ok, message)."""
    sp = spark_df.toPandas()
    du = con.execute(sql).fetchdf()
    sp_cols = sorted(sp.columns)
    du_cols = sorted(du.columns)
    if sp_cols != du_cols:
        return False, f"{name}: columns differ spark={sp_cols} duck={du_cols}"
    if len(sp) != len(du):
        return False, f"{name}: row count differs spark={len(sp)} duck={len(du)}"
    def _key(row):
        return tuple((v is None, str(v)) for v in row)

    sp_rows = sorted(
        (tuple(_norm_cell(v) for v in row)
         for row in sp[sp_cols].itertuples(index=False, name=None)),
        key=_key,
    )
    du_rows = sorted(
        (tuple(_norm_cell(v) for v in row)
         for row in du[du_cols].itertuples(index=False, name=None)),
        key=_key,
    )
    if sp_rows == du_rows:
        return True, f"{name}: OK ({len(sp)} rows)"
    # find first mismatch for diagnostics
    for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
        if a != b:
            return False, (f"{name}: value mismatch at sorted-row {i}:\n"
                           f"  spark={a}\n  duck ={b}")
    return False, f"{name}: rows differ (same length, no aligned diff?)"
