"""Oracle-differential comparison utilities (shared by tools/selfcheck.py and
tests/). Mirrors the driver's correctness gate: row count + sorted column
names + order-insensitive stringified value comparison.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from .io import EMB_DIM, TABLES


def connect_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the fixture tables as DuckDB views, mirroring io.load's
    ingestion contracts so the oracle views the same normalized tables
    the Spark engine queries — otherwise operators would diverge on a
    dirty fixture for reasons that are contract, not computation:

    * documents.text is NEVER NULL downstream (coalesced to '');
    * events rows with NULL ts are excluded (an event-time engine cannot
      place a timeless event);
    * embeddings rows with NULL or wrong-dimension vectors are excluded
      (unscorable by a fixed-dim index).

    The driver's own oracle registers raw views, which is equivalent on
    the clean fixtures it runs (no nulls/short vectors exist there)."""
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"CREATE VIEW {t} AS SELECT * REPLACE (coalesce(text, '') AS text)"
                f" FROM '{sf_dir}/{t}.parquet'"
            )
        elif t == "events":
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                " WHERE ts IS NOT NULL"
            )
        elif t == "embeddings":
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                f" WHERE embedding IS NOT NULL AND len(embedding) = {EMB_DIM}"
            )
        else:
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
