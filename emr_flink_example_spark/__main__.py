"""CLI entry point: `python -m emr_flink_example_spark <job> [options]`.

≙ the reference's three main() classes (Kafka2S3Text.scala:61,
Kafka2S3Parquet.scala:57, Kafka2S3Hive.scala:20) driven by one scopt config;
here one argparse config (config.py) dispatching to streaming/pipelines.py.
"""

from __future__ import annotations

import sys

from .config import parse_config
from .session import build_session
from .sources.streams import parsed_ad_stream, raw_string_stream
from .streaming import pipelines


def main(argv: list[str] | None = None) -> None:
    cfg = parse_config(argv)
    spark = build_session(
        app_name=f"emr-flink-example-spark-{cfg.job}",
        streaming=True,
        # hive job: register the Hive catalog before anything else touches
        # the builder (≙ HiveCatalog registration, Kafka2S3Hive.scala:44-53)
        enable_hive=cfg.job == "hive",
        hive_metastore_uris=cfg.metastore_uris,
        hive_conf_dir=cfg.hive_conf_dir,
    )
    if cfg.job == "text":
        query = pipelines.text_sink(raw_string_stream(spark, cfg), cfg)
    elif cfg.job == "parquet":
        query = pipelines.parquet_sink(parsed_ad_stream(spark, cfg), cfg)
    elif cfg.job == "hive":
        query = pipelines.hive_sink(parsed_ad_stream(spark, cfg), cfg)
    else:  # pragma: no cover - argparse enforces choices
        raise SystemExit(f"unknown job {cfg.job!r}")
    query.awaitTermination()


if __name__ == "__main__":
    main(sys.argv[1:])
