"""Object-store-safe layout helpers (VERDICT r11 #2 / ADVICE r11 low):
warehouse cleanup and listing must route through the Hadoop FileSystem
API — never shutil/os on a urlparse'd path — so file:/hdfs:/s3a:
warehouses behave identically.  Locally this is exercised with explicit
`file:` URIs (scheme-qualified, exactly what a remote warehouse URI
looks like structurally); the FS object is resolved per-URI from the
session's Hadoop conf, which is the property that makes s3a work
unchanged."""

from __future__ import annotations

import os

from wukong_spark.layout import (
    drop_managed_table,
    fs_delete,
    fs_list_files,
    warehouse_uri,
)


def test_fs_helpers_on_scheme_qualified_uris(spark, tmp_path):
    d = f"file:{tmp_path}/lay"
    spark.range(10).repartition(2).write.mode("overwrite").parquet(d)

    files = fs_list_files(spark, d, suffix=".parquet")
    assert len(files) == 2
    assert all(size > 0 for _, size in files)
    assert all(name.endswith(".parquet") for name, _ in files)

    assert fs_delete(spark, d) is True
    assert not os.path.exists(f"{tmp_path}/lay")
    # idempotent like rm -rf: deleting a missing path is not an error
    assert fs_delete(spark, d) is False


def test_warehouse_uri_preserves_scheme(spark):
    wh = spark.conf.get("spark.sql.warehouse.dir")
    uri = warehouse_uri(spark, "some_table")
    assert uri.startswith(wh.rstrip("/"))
    assert uri.endswith("/some_table")
    # the scheme the session configured must survive (urlparse().path
    # stripping is exactly the bug this API replaces)
    if ":" in wh.split("/")[0]:
        assert uri.split("/")[0] == wh.split("/")[0]


def test_drop_managed_table_clears_stale_location(spark):
    """A leftover managed-table LOCATION (e.g. from a crashed previous
    session with an in-memory catalog) must not fail the next
    saveAsTable: drop_managed_table clears catalog entry AND location."""
    table = "layout_drop_test_tmp"
    try:
        spark.range(5).write.mode("overwrite").bucketBy(2, "id").saveAsTable(table)
        # simulate the stale-directory situation: forget the catalog entry
        # but leave the files on disk
        spark.sql(f"DROP TABLE {table}")
        drop_managed_table(spark, table)
        # a fresh saveAsTable must now succeed (LOCATION_ALREADY_EXISTS
        # would throw here if the location survived)
        spark.range(7).write.bucketBy(2, "id").saveAsTable(table)
        assert spark.table(table).count() == 7
    finally:
        drop_managed_table(spark, table)
