"""Hive catalog wiring (A11) + external-table DDL (A13).

≙ Kafka2S3Hive.scala:44-53 (HiveCatalog registration from metastore URIs /
a hive conf dir) and :85-111 (CREATE EXTERNAL TABLE ... PARTITIONED BY
(logday, h, m) STORED AS parquet LOCATION ... TBLPROPERTIES (...)).

The shared test session runs the in-memory catalog (catalogImplementation
is fixed at first-session creation per JVM), so the hive-session path is
asserted at the conf-assembly level — the exact confs enableHiveSupport +
a remote metastore need — and the DDL/commit path end-to-end through the
datasource form, which SHOW PARTITIONS / ALTER TABLE ADD PARTITION treat
identically.
"""

from __future__ import annotations

import os
import time

from emr_flink_example_spark.catalog_ddl import (
    REFERENCE_TBLPROPERTIES,
    create_external_table,
    create_external_table_sql,
)
from emr_flink_example_spark.config import PipelineConfig
from emr_flink_example_spark.session import hive_confs, hive_site_confs


def test_hive_confs_enable_catalog_and_metastore():
    confs = hive_confs(metastore_uris="thrift://ms-host:9083")
    assert confs["spark.sql.catalogImplementation"] == "hive"
    assert confs["spark.hadoop.hive.metastore.uris"] == "thrift://ms-host:9083"
    # no URIs -> embedded metastore: catalog on, no uris override
    assert "hive.metastore.uris" not in hive_confs()


def test_hive_site_xml_is_lifted_into_session_confs(tmp_path):
    (tmp_path / "hive-site.xml").write_text(
        """<?xml version="1.0"?>
<configuration>
  <property><name>hive.metastore.uris</name><value>thrift://site-host:9083</value></property>
  <property><name>hive.metastore.warehouse.dir</name><value>s3://bucket/warehouse</value></property>
</configuration>"""
    )
    confs = hive_confs(hive_conf_dir=str(tmp_path))
    assert confs["spark.hadoop.hive.metastore.uris"] == "thrift://site-host:9083"
    assert confs["spark.hadoop.hive.metastore.warehouse.dir"] == "s3://bucket/warehouse"
    # explicit -m URIs beat the conf-dir value (programmatic-over-dir, as in
    # the reference's HiveConf-vs-hiveConfDir note)
    both = hive_confs("thrift://cli-host:9083", str(tmp_path))
    assert both["spark.hadoop.hive.metastore.uris"] == "thrift://cli-host:9083"
    # missing dir is a no-op, not an error
    assert hive_site_confs(str(tmp_path / "nope")) == {}


def test_hive_dialect_ddl_mirrors_reference():
    sql = create_external_table_sql("db.t", "s3://b/p", hive_catalog=True)
    assert "CREATE EXTERNAL TABLE IF NOT EXISTS db.t" in sql
    assert "PARTITIONED BY (`logday` STRING, `h` STRING, `m` STRING)" in sql
    assert "STORED AS parquet" in sql and "LOCATION 's3://b/p'" in sql
    for k, v in REFERENCE_TBLPROPERTIES.items():
        assert f"'{k}'='{v}'" in sql


def test_create_external_table_registers_partitioned_table(spark, tmp_path):
    cfg = PipelineConfig(
        database="default",
        hive_table_name=f"ext_ddl_{int(time.time() * 1000)}",
        hive_s3_path=str(tmp_path / "wh"),
    )
    table = create_external_table(spark, cfg)
    try:
        assert spark.catalog.tableExists(table)
        cols = {c.name: c for c in spark.catalog.listColumns(table)}
        assert set(cols) == {
            "uuid", "date", "ad_type", "ad_type_name", "timestamp",
            "logday", "h", "m",
        }
        assert all(cols[c].isPartition for c in ("logday", "h", "m"))
        # external: dropping must not delete the location's data dir
        os.makedirs(cfg.hive_s3_path, exist_ok=True)
        probe = os.path.join(cfg.hive_s3_path, "_probe")
        open(probe, "w").close()
        # idempotent (IF NOT EXISTS)
        create_external_table(spark, cfg)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
    assert os.path.exists(probe)
