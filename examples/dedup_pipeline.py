"""End-to-end training-data curation pipeline — the capability tier this
repo adds beyond the reference (BASELINE.json §2.3): quality-gate →
exact dedup → near-dup clustering (MinHash-LSH → connected components)
→ deterministic train/val/test split, over the `documents` table.

Every stage is the registry operator itself (each one value-checked
against a DuckDB oracle by the driver gate); this example wires them
into the one flow a corpus pipeline actually runs.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def run(spark) -> bool:
    from pyspark.sql import functions as F

    from wukong_spark.queries.sampling import split_train_val_test
    from wukong_spark.queries.textops import (
        dedup_neardup_clusters,
        pipeline_clean_corpus,
    )

    # 1. quality gate + exact dedup + per-(source, lang) corpus stats
    stats = pipeline_clean_corpus(spark, SF_DIR)
    if stats.count() == 0:
        return False

    # 2. near-dup verdicts: every cluster maps to one canonical doc_id
    clusters = dedup_neardup_clusters(spark, SF_DIR)
    bad = clusters.filter(F.col("n_docs") < 2).count()  # singletons never cluster
    if bad != 0:
        return False

    # 3. reproducible 90/5/5 split — same content-hash gate on every run
    split_a = {tuple(r) for r in split_train_val_test(spark, SF_DIR).collect()}
    split_b = {tuple(r) for r in split_train_val_test(spark, SF_DIR).collect()}
    return split_a == split_b and len(split_a) > 0


if __name__ == "__main__":
    from _common import report, session

    report("dedup_pipeline", run(session()))
