"""Watermark-gated partition commit (≙ Flink's partition-commit machinery).

Reference semantics (Kafka2S3Hive.scala:100-104):
  * partition.time-extractor.timestamp-pattern = '$logday $h:$m:00'
  * sink.partition-commit.trigger = 'partition-time'
  * sink.partition-commit.delay = '1 min'
  * sink.partition-commit.policy.kind = 'metastore'
i.e. a (logday, h, m) partition becomes visible in the catalog once the
event-time watermark passes partition-time + 1 minute.

Spark's file sink commits files to its own _spark_metadata log and never
talks to a catalog, so this is the one genuinely custom execution component
in the engine (SURVEY.md §7 hard part 2): a foreachBatch sink that

  1. appends the micro-batch to the partitioned parquet layout,
  2. tracks pending partitions in a JSON ledger next to the data,
  3. "commits" every pending partition whose extracted timestamp + delay
     <= the stream's event-time watermark — via `ALTER TABLE ... ADD
     PARTITION` when the table exists in the session catalog, and always
     into the ledger (so tests and metastore-less deployments can assert
     visibility).

The watermark is taken from the micro-batch's max event time minus the
configured out-of-orderness bound — the same quantity Spark reports as
`lastProgress.eventTime.watermark`, but available synchronously inside
foreachBatch (the reported watermark lags one batch behind).

Scale note: the ledger write is O(partitions touched), driver-side, once per
micro-batch — negligible against the executor-side parquet write; at 100 TB
the same pattern holds because partition counts (day*hour*minute) are
bounded by time, not data volume.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class PartitionCommitter:
    def __init__(
        self,
        table: str,
        path: str,
        partition_cols: tuple[str, ...] = ("logday", "h", "m"),
        commit_delay_seconds: int = 60,
        watermark_lag_seconds: int = 5,
    ) -> None:
        self.table = table
        self.path = path
        self.partition_cols = partition_cols
        self.commit_delay = timedelta(seconds=commit_delay_seconds)
        self.watermark_lag = timedelta(seconds=watermark_lag_seconds)
        self.ledger_path = os.path.join(path, "_partition_commits.json")

    # -- ledger ------------------------------------------------------------
    def _load_ledger(self) -> dict:
        if os.path.exists(self.ledger_path):
            with open(self.ledger_path) as f:
                return json.load(f)
        return {"pending": [], "committed": [], "watermark": None}

    def _save_ledger(self, ledger: dict) -> None:
        tmp = self.ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f, indent=1, sort_keys=True)
        os.replace(tmp, self.ledger_path)

    # -- partition-time extraction ----------------------------------------
    @staticmethod
    def _partition_time(part: dict) -> datetime:
        """'$logday $h:$m:00' pattern (Kafka2S3Hive.scala:101)."""
        return datetime.strptime(
            f"{part['logday']} {part['h']}:{part['m']}:00", "%Y-%m-%d %H:%M:%S"
        )

    def _add_partition_sql(self, part: dict) -> str:
        spec = ", ".join(f"{c}='{part[c]}'" for c in self.partition_cols)
        loc = os.path.join(self.path, *[f"{c}={part[c]}" for c in self.partition_cols])
        return f"ALTER TABLE {self.table} ADD IF NOT EXISTS PARTITION ({spec}) LOCATION '{loc}'"

    # -- foreachBatch entry point ------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.persist()
        try:
            (
                batch_df.write.mode("append")
                .partitionBy(*self.partition_cols)
                .parquet(self.path)
            )
            parts = [r.asDict() for r in batch_df.select(*self.partition_cols).distinct().collect()]
            max_ts = batch_df.agg(
                F.max(F.to_timestamp(F.concat_ws(" ", "logday", F.concat_ws(":", "h", "m")))).alias("m")
            ).collect()[0]["m"]
        finally:
            batch_df.unpersist()

        ledger = self._load_ledger()
        pending = {tuple(sorted(p.items())) for p in ledger["pending"]}
        committed = {tuple(sorted(p.items())) for p in ledger["committed"]}
        pending |= {tuple(sorted(p.items())) for p in parts} - committed

        if max_ts is not None:
            wm = max_ts - self.watermark_lag
            prev = ledger.get("watermark")
            if prev:
                wm = max(wm, datetime.strptime(prev, "%Y-%m-%d %H:%M:%S"))
            ledger["watermark"] = wm.strftime("%Y-%m-%d %H:%M:%S")
            table_exists = spark.catalog.tableExists(self.table)
            for key in sorted(pending):
                part = dict(key)
                if self._partition_time(part) + self.commit_delay <= wm:
                    if table_exists:
                        spark.sql(self._add_partition_sql(part))
                    committed.add(key)
                    pending.discard(key)

        ledger["pending"] = [dict(k) for k in sorted(pending)]
        ledger["committed"] = [dict(k) for k in sorted(committed)]
        self._save_ledger(ledger)
