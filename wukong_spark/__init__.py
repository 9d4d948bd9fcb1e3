"""wukong_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ds2-lab/Wukong (reference surveyed in
SURVEY.md), rebuilt Spark-first.

Layers (SURVEY.md §7):
  session      — SparkSession factory + table catalog + plan-fingerprint cache
  queries      — the declarative operator/query library (DuckDB-oracle checked)
  taskgraph    — futures-style submit/map/scatter/gather/persist surface
  blockmatrix  — chunked-ndarray linear algebra (GEMM/TSQR/SVD/Cholesky)
  operators    — dedup / similarity / text / multimodal pipeline operators
"""

from wukong_spark.session import get_spark, load_table, TABLES

__all__ = ["get_spark", "load_table", "TABLES"]
__version__ = "0.1.0"
