"""End-to-end training-data curation pipeline — the capability tier this
repo adds beyond the reference (BASELINE.json §2.3): quality-gate →
exact dedup → near-dup clustering (MinHash-LSH → connected components)
→ repetition gate → benchmark decontamination → deterministic
train/val/test split → sequence packing, over the `documents` table.

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

    # 3. repetition gate + benchmark decontamination: drop repetitive docs
    #    and anything sharing a 4-gram with the held-out set
    from wukong_spark.queries.textops import (
        text_decontaminate,
        text_pack_sequences,
        text_repetition_filter,
    )

    keep = text_repetition_filter(spark, SF_DIR).filter("keep").select("doc_id")
    droplist = text_decontaminate(spark, SF_DIR).select("doc_id")
    clean = keep.join(droplist, "doc_id", "left_anti")
    if clean.count() == 0:
        return False

    # 4. reproducible 90/5/5 split — same content-hash gate on every run
    split_a = {tuple(r) for r in split_train_val_test(spark, SF_DIR).collect()}
    split_b = {tuple(r) for r in split_train_val_test(spark, SF_DIR).collect()}
    if split_a != split_b or len(split_a) == 0:
        return False

    # 5. pack the corpus into fixed-budget training sequences — every
    #    shard's stream must start at offset 0 and span multiple sequences
    packed = text_pack_sequences(spark, SF_DIR)
    starts = packed.groupBy("source").agg(
        F.min("seq_offset").alias("first_off"), F.max("seq_id").alias("last_seq")
    )
    bad_shards = starts.filter(
        (F.col("first_off") != 0) | (F.col("last_seq") < 1)
    ).count()
    return bad_shards == 0


if __name__ == "__main__":
    from _common import report, session

    report("dedup_pipeline", run(session()))
