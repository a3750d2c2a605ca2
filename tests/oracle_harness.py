"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark and its oracle SQL through DuckDB on the
same parquet dir, sorts columns by name and rows by value, and compares
cell-by-cell. Floats are compared by exact repr first (predicts the driver's
value-hash) with an epsilon fallback reported separately so we can tell
"genuinely wrong" from "needs rounding".
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

TABLES = [
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
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _sorted_cells(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    projected = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(projected, key=lambda t: tuple(str(x) for x in t))


def compare(spark_df, oracle_sql: str, sf_dir: str, rel_tol: float = 1e-9):
    """Returns (exact_match: bool, approx_match: bool, detail: str)."""
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    con = duck_connection(sf_dir)
    cur = con.execute(oracle_sql)
    duck_cols = [d[0] for d in cur.description]
    duck_rows = cur.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(duck_cols):
        return False, False, f"columns differ: spark={spark_cols} duck={duck_cols}"
    if len(spark_rows) != len(duck_rows):
        return (
            False,
            False,
            f"row counts differ: spark={len(spark_rows)} duck={len(duck_rows)}",
        )

    a = _sorted_cells(spark_cols, spark_rows)
    b = _sorted_cells(duck_cols, duck_rows)
    if a == b:
        return True, True, "exact"

    # epsilon comparison to distinguish float-noise from real mismatches
    mism = 0
    first = None
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if va == vb:
                continue
            try:
                fa, fb = float(va), float(vb)
                if math.isclose(fa, fb, rel_tol=rel_tol, abs_tol=1e-9):
                    continue
            except (TypeError, ValueError):
                pass
            mism += 1
            if first is None:
                first = (ra, rb)
    if mism == 0:
        return False, True, "approx-only (float repr noise — tighten rounding)"
    return False, False, f"{mism} mismatched cells; first rows: {first}"
