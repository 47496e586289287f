"""Query/operator builders.

Each module exposes two dicts keyed by query name:
  QUERIES: name -> Callable[(SparkSession, sf_dir), DataFrame]
  ORACLES: name -> equivalent ANSI SQL for DuckDB (omitted for operators whose
           semantics aren't SQL-expressible — the driver then records a weaker
           rows-only check).

Conventions (driver contract):
  * every computed/aggregate column is aliased IDENTICALLY in the Spark
    builder and the oracle SQL (the compare hashes values under sorted column
    names);
  * float aggregates are rounded on BOTH sides so cross-engine summation-order
    differences can't flip the value hash;
  * window/order specs always include a unique tiebreaker column so results
    are deterministic under ties.
"""
