"""Oracle output-type sweep: no DuckDB-only numeric types may escape an oracle.

The driver's value hash is TYPE-sensitive while our local comparator
(testing.norm_cell) stringifies — so a DuckDB ``sum(int)`` returning HUGEINT
(int128) passes selfcheck but fails the driver (round-1 `unpivot_stack`
hash failure, VERDICT.md "What's wrong" #1/#2). This sweep runs DESCRIBE on
every oracle (metadata-only, no data execution) and bans the types Spark can
never produce, so the whole bug class is caught at pytest time.
"""

from __future__ import annotations

import pytest

from emr_flink_example_spark.plans.catalog import all_oracles
from emr_flink_example_spark.testing import connect_oracle

SF_DIR = "/root/testdata/sf0.001"

# Types DuckDB emits that Spark has no equivalent for (or maps differently):
# HUGEINT/UHUGEINT (int128 — driver hash mismatch vs Spark BIGINT) and
# unsized DECIMAL from sum(decimal) widening. Oracles must cast explicitly.
BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def con():
    c = connect_oracle(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_oracle_has_no_engine_specific_types(con, name):
    sql = all_oracles()[name]
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in BANNED)
    ]
    assert not bad, (
        f"oracle '{name}' emits engine-specific numeric types {bad}; "
        "cast to ::BIGINT / ::DOUBLE for driver-hash parity"
    )
