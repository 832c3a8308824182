"""Driver-contract mimic: run a Spark DataFrame query and a DuckDB oracle SQL
on the same parquet tables, compare row count, schema (column names), and an
order-insensitive value representation."""

from __future__ import annotations

import math

import duckdb

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def rows_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sig = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    return sig


def compare(spark_df, oracle_con, oracle_sql: str):
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    o_rel = oracle_con.sql(oracle_sql)
    o_cols = o_rel.columns
    o_rows = o_rel.fetchall()
    assert sorted(c.lower() for c in s_cols) == \
        sorted(c.lower() for c in o_cols), \
        f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    assert len(s_rows) == len(o_rows), \
        f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    s_sig = rows_signature([c.lower() for c in s_cols], s_rows)
    o_sig = rows_signature([c.lower() for c in o_cols], o_rows)
    mism = [i for i, (a, b) in enumerate(zip(s_sig, o_sig)) if a != b]
    assert not mism, (
        f"value mismatch at {len(mism)} rows; first: "
        f"spark={s_sig[mism[0]]!r} oracle={o_sig[mism[0]]!r}")
