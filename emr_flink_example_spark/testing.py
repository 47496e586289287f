"""Oracle-differential comparison utilities (shared by tools/selfcheck.py and
tests/). Mirrors the driver's correctness gate: row count + sorted column
names + order-insensitive stringified value comparison.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from .io import TABLES


def connect_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    return str(v)


def canon(rows, cols) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)


def compare(spark, con, builder, sql, sf_dir: str) -> tuple[bool, str]:
    """Run one Spark builder and its oracle; return (ok, message)."""
    sdf = builder(spark, sf_dir)
    srows, scols = sdf.collect(), sdf.columns
    cur = con.execute(sql)
    dcols = [c[0] for c in cur.description]
    drows = cur.fetchall()
    if len(srows) != len(drows):
        return False, f"rowcount spark={len(srows)} duck={len(drows)}"
    if sorted(scols) != sorted(dcols):
        return False, f"cols spark={sorted(scols)} duck={sorted(dcols)}"
    sc, dc = canon(srows, scols), canon(drows, dcols)
    if sc != dc:
        diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
        return False, f"values differ; first diffs: {diff}"
    return True, f"{len(srows)} rows"
