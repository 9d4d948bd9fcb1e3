"""Source/sink layer (SURVEY.md §2.2 B-III "scans/sources").

The reference has NO file formats — data enters via scatter/from_pandas/
random generation only (`/root/reference/Static Scheduler/wukong/
client.py:1963-2168`).  The rebuild ships Spark's native formats as the
source layer, plus the two write disciplines that matter at 100 TB:

- **partitioned writes** (`partitionBy`) → partition pruning on read:
  a date-filtered scan touches only matching directories;
- **bucketed tables** (`bucketBy` + saveAsTable) → co-located joins:
  two tables bucketed on the join key join WITHOUT a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: columnar (parquet/orc), delimited (csv), semi-structured (json — JSONL
#: layout, xml — Spark 4 native), and raw line (text) formats.  Avro needs
#: the external spark-avro module, absent in this environment — read_any
#: raises a clear error rather than Spark's opaque ClassNotFound.
FORMATS = ("parquet", "csv", "json", "orc", "xml", "text")


def _apply_defaults(fmt: str, options: dict) -> dict:
    if fmt == "csv":
        options.setdefault("header", "true")
    if fmt == "xml":
        # rowTag is mandatory for XML reads and defines the record element
        options.setdefault("rowTag", "row")
        options.setdefault("rootTag", "rows")
    return options


def read_any(spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None, **options) -> DataFrame:
    """Format-dispatched scan.  CSV/JSON/XML get explicit schemas in
    production (inference is a full extra pass — fine in tests, wrong at
    scale)."""
    if fmt == "avro":
        raise ValueError(
            "avro needs the external spark-avro module, which is not "
            "deployed in this environment"
        )
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if schema:
        reader = reader.schema(schema)
    return reader.options(**_apply_defaults(fmt, options)).load(path)


def write_any(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", partition_by: list[str] | None = None, **options) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.options(**_apply_defaults(fmt, options)).save(path)


def read_binary_files(
    spark: SparkSession, path: str, glob: str | None = None
) -> DataFrame:
    """Media ingestion: Spark's `binaryFile` source reads raw files as
    (path, modificationTime, length, content binary) — the entry point for
    the multimodal pipeline (operators/multimodal.py wraps `content` with
    typed metadata and Arrow-batched decode).

    Scale notes: file listing is distributed; set
    `spark.sql.files.maxPartitionBytes` so a partition holds a sane number
    of media blobs, and avoid tiny-file explosions by compacting upstream.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Joins/aggregations on `bucket_col` between tables bucketed the same way
    skip the shuffle entirely — the pre-partitioning strategy for repeated
    big-fact joins (SURVEY.md §2.1 A18's locality heuristic, solved the
    Spark way)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)
