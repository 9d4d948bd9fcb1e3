"""Round-12 corpus-curation flow — the stages a pretraining pipeline runs
AFTER dedup_pipeline's cleaning pass: cross-document boilerplate mining →
span removal → per-doc quality signals (entropy + DSIR importance weight
toward a target domain) → data-mixture rebalancing to target proportions.

Every stage is the registry operator itself (each value-checked against a
DuckDB oracle by the driver gate); this example wires them into the
selection-and-mixing flow that decides what a model actually trains on.
"""

from __future__ import annotations

SF_DIR = "/root/testdata/sf0.001"


def run(spark) -> bool:
    from pyspark.sql import functions as F

    from wukong_spark.queries.sampling import sample_mixture_rebalance
    from wukong_spark.queries.textops import (
        text_boilerplate_mine,
        text_boilerplate_strip,
        text_dsir_weights,
        text_token_entropy,
    )

    # 1. mine cross-document boilerplate, then strip the covered spans —
    #    stripping can only remove tokens, and exactly the mined coverage
    mined = text_boilerplate_mine(spark, SF_DIR).select(
        "doc_id", "n_shingles", "n_boiler"
    )
    stripped = text_boilerplate_strip(spark, SF_DIR).select("doc_id", "n_kept")
    joined = mined.join(stripped, "doc_id")
    grew = joined.filter(
        F.col("n_kept") > F.col("n_shingles") + 2  # tokens = shingles + 2
    ).count()
    uncut = joined.filter(
        (F.col("n_boiler") > 0) & (F.col("n_kept") == F.col("n_shingles") + 2)
    ).count()
    if grew != 0 or uncut != 0:
        return False

    # 2. per-doc quality signals: token entropy + DSIR importance toward
    #    the lang='en' target — both total and both keyed by doc_id
    entropy = text_token_entropy(spark, SF_DIR)
    dsir = text_dsir_weights(spark, SF_DIR)
    n_docs = entropy.count()
    if dsir.count() != n_docs or n_docs == 0:
        return False
    selected = dsir.filter("selected").count()
    if not (0 < selected < n_docs):  # the gate separates, never rubber-stamps
        return False

    # 3. rebalance the corpus mixture toward equal per-lang shares —
    #    over-represented strata shrink, capped strata keep everything
    mix = sample_mixture_rebalance(spark, SF_DIR)
    bad = mix.filter(F.col("n_sampled") > F.col("n_before")).count()
    capped_ok = (
        mix.filter(F.col("rate") == 10_000)
        .filter(F.col("n_sampled") != F.col("n_before"))
        .count()
    )
    return bad == 0 and capped_ok == 0 and mix.count() > 0


if __name__ == "__main__":
    from _common import report, session

    report("curation_pipeline", run(session()))
