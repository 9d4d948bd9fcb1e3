"""Exact set-similarity candidate generation (prefix filtering).

Scale problem (VERDICT r15 Next #4): the containment entry's candidate
pairs came from a raw shingle self-join — one boilerplate shingle shared
by k documents fans out k² candidate rows at 100 TB.  The fix the dedup
literature uses for EXACT thresholds is prefix filtering (PPJoin-family,
Chaudhuri/Ganti/Kaushik SSJoin; public technique): order every document's
shingles by a global rarity order (document frequency ascending), and
note that for containment(A,B) = |A∩B| / min(|A|,|B|) ≥ t with
|B| ≤ |A|, the first ⌊|B|·(1−t)⌋+1 shingles of B must contain at least
one element of A — otherwise A∩B fits inside B's remaining
⌈t·|B|⌉−1 shingles, contradicting the threshold.  So joining each
document's PREFIX (probe side) against all documents' shingles (index
side) is lossless: every pair meeting the threshold is produced, and the
pathological high-DF shingle ranks LAST in the rarity order, falling
outside the prefix of any document with more than 1/(1−t) shingles —
candidate fan-out on boilerplate collapses from k² to ~0.

Why not MinHash bands here (the Jaccard entries' scale path): band
recall is a function of JACCARD, and the whole point of containment is
flagging pairs whose Jaccard is arbitrarily small (short doc inside a
long one).  No (bands, rows) setting gives recall 1 at Jaccard→0, so a
banded candidate set cannot reproduce an exact containment oracle;
prefix filtering can, deterministically.

Reference parity: the reference's dedup surface is the gap-fill mandate
(BASELINE.json:6); candidate generation strategy is ours to choose.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def prefix_filter_candidates(
    shingles: DataFrame,
    doc_col: str = "doc_id",
    sh_col: str = "sh",
    t_num: int = 1,
    t_den: int = 4,
) -> DataFrame:
    """LOSSLESS candidate pairs for containment ≥ t_num/t_den.

    `shingles` must be (doc, shingle) DISTINCT rows.  Returns
    (doc_a, doc_b) with doc_a < doc_b, a SUPERSET of every pair whose
    containment meets the threshold (callers verify candidates exactly
    and re-apply the threshold — extra candidates cost work, never
    correctness).

    Plan shape (the 100 TB contract): the candidate join keys on PREFIX
    shingles only — ordering is (document frequency ASC, shingle ASC),
    so a boilerplate shingle shared by k documents sits at the END of
    every document's order and joins ~0 probe rows instead of k².
    Shuffles are all keyed (DF agg on shingle, size agg + row_number
    window on document); nothing is all-pairs.
    """
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    sizes = shingles.groupBy(doc_col).agg(F.count(F.lit(1)).alias("__n"))
    dfreq = shingles.groupBy(sh_col).agg(F.count(F.lit(1)).alias("__df"))
    ranked = (
        shingles.join(dfreq, sh_col)
        .join(sizes, doc_col)
        .withColumn(
            "__pos",
            F.row_number().over(
                Window.partitionBy(doc_col).orderBy("__df", sh_col)
            ),
        )
    )
    # prefix length = n − ⌈n·t⌉ + 1 = ⌊n·(t_den−t_num)/t_den⌋ + 1
    prefix_len = (
        F.floor(F.col("__n") * F.lit(t_den - t_num) / F.lit(t_den)) + 1
    )
    probe = ranked.filter(F.col("__pos") <= prefix_len).select(
        F.col(doc_col).alias("__pd"),
        F.col(sh_col).alias("__ps"),
        F.col("__n").alias("__pn"),
    )
    index = ranked.select(
        F.col(doc_col).alias("__xd"),
        F.col(sh_col).alias("__xs"),
        F.col("__n").alias("__xn"),
    )
    # the probe doc must be the pair's SMALLER set (the lemma's B);
    # equal sizes orient by id so each unordered pair appears once
    smaller = (F.col("__pn") < F.col("__xn")) | (
        (F.col("__pn") == F.col("__xn")) & (F.col("__pd") < F.col("__xd"))
    )
    return (
        probe.join(index, (F.col("__ps") == F.col("__xs")) & smaller)
        .select(
            F.least("__pd", "__xd").alias("doc_a"),
            F.greatest("__pd", "__xd").alias("doc_b"),
        )
        .distinct()
    )
