"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same sf directory, then compares row count, sorted column names, and
an order-insensitive value hash (stringified rows, sorted). Use while
iterating:

    python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from emr_flink_example_spark.session import local_test_session  # noqa: E402


def _norm_cell(v) -> str:
    import datetime
    import math

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


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(",".join(_norm_cell(r[i]) for i in order) for r in rows)
    return out


def run(sf_dir: str, only: list[str]) -> int:
    from __spark_entry__ import oracle_sql, queries

    spark = local_test_session()
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, os_ = queries(), oracle_sql()
    names = only or list(qs)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc(limit=4)
            n_fail += 1
            continue
        if name not in os_:
            print(f"rows  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            d = con.execute(os_[name])
            dcols = [c[0] for c in d.description]
            drows = d.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if len(srows) != len(drows):
            ok, msgs = False, msgs + [f"rowcount spark={len(srows)} duck={len(drows)}"]
        if sorted(scols) != sorted(dcols):
            ok, msgs = False, msgs + [f"cols spark={sorted(scols)} duck={sorted(dcols)}"]
        if ok:
            sc, dc = _canon(srows, scols), _canon(drows, dcols)
            if sc != dc:
                ok = False
                diff = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                msgs.append(f"values differ; first diffs: {diff}")
        if ok:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    sf = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a]
    sys.exit(run(sf, only))
