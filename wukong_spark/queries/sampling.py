"""Deterministic sampling & dataset-split operators (SURVEY.md §2.3 —
training-data pipeline staples beyond the reference's surface).

A 100 TB corpus is sampled with CONTENT-HASH gates, not RNG: the decision
`md5(key) mod M < threshold` is reproducible across engines, partitions,
re-runs, and cluster sizes — the property a train/val/test split must
have so no document ever migrates between splits when the pipeline
re-executes.  (Spark's `df.sample` draws from a per-partition RNG stream:
resilient to nothing — a repartition reshuffles the sample.  It exists
for quick interactive estimates; these operators are the pipeline path.)

All gates are JVM expressions (md5 + conv + pmod) and push down around
them; the DuckDB oracles compute the identical 48-bit hash, so every
query here is full value-hash checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from wukong_spark.queries import query
from wukong_spark.queries.helpers import local_frame, tbl

#: 48-bit integer from the md5 hex prefix — engine-portable (same trick as
#: textops minhash); {e} is the SQL expression to hash
_ORACLE_H48 = "CAST(('0x' || substr(md5({e}), 1, 12)) AS BIGINT)"

SAMPLE_MOD = 10_000  # hash buckets = 0.01 % sampling granularity


def _h48(col: Column) -> Column:
    """48-bit hash of a string column (Spark side of _ORACLE_H48)."""
    return F.conv(F.substring(F.md5(col), 1, 12), 16, 10).cast("long")


def _bucket(col: Column) -> Column:
    return F.pmod(_h48(col), F.lit(SAMPLE_MOD))


@query(
    "sample_hash_fraction",
    oracle=f"""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE {_ORACLE_H48.format(e="'doc-' || CAST(doc_id AS VARCHAR)")} % {SAMPLE_MOD} < 2000
    """,
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str):
    """Deterministic 20 % sample: keep rows whose key-hash bucket falls
    below the threshold.  Stable under repartitioning and re-runs (unlike
    `df.sample`), composable (a 20 % gate then a 10 % gate with a
    different salt are independent), and shuffle-free: the gate is a
    map-side expression evaluated in the scan stage."""
    d = tbl(spark, sf_dir, "documents")
    key = F.concat(F.lit("doc-"), F.col("doc_id").cast("string"))
    return d.filter(_bucket(key) < 2000).select("doc_id", "source", "lang", "n_chars")


@query(
    "split_train_val_test",
    oracle=f"""
    WITH tagged AS (
      SELECT source,
             CASE
               WHEN {_ORACLE_H48.format(e="'split-' || CAST(doc_id AS VARCHAR)")} % {SAMPLE_MOD} < 9000 THEN 'train'
               WHEN {_ORACLE_H48.format(e="'split-' || CAST(doc_id AS VARCHAR)")} % {SAMPLE_MOD} < 9500 THEN 'val'
               ELSE 'test'
             END AS split,
             n_chars
      FROM documents
    )
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY source, split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str):
    """90/5/5 train/val/test assignment by content-hash bucket — the
    split every training pipeline needs to be REPRODUCIBLE: a document's
    split is a pure function of its id (salted), so re-runs, backfills,
    and scale-ups never leak rows across splits.  Emits per-(source,
    split) counts; the split column itself is the reusable primitive."""
    d = tbl(spark, sf_dir, "documents")
    b = _bucket(F.concat(F.lit("split-"), F.col("doc_id").cast("string")))
    split = (
        F.when(b < 9000, F.lit("train")).when(b < 9500, F.lit("val")).otherwise("test")
    )
    return (
        d.select("source", split.alias("split"), "n_chars")
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


@query(
    "split_exact_stratified",
    # EXACT per-stratum 80/10/10: per-lang 0-based rank over the salted
    # md5 order (doc_id tiebreak — a total order), split by the integer
    # rule rid*10 < n*8 / n*9 — counts are exact per stratum, not
    # hash-expected; all windows are PARTITIONED by lang (keyed)
    oracle="""
    WITH r AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('xsplit-' || CAST(doc_id AS VARCHAR)), doc_id
             ) - 1 AS rid,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ), tagged AS (
      SELECT lang, n_chars,
             CASE WHEN rid * 10 < n * 8 THEN 'train'
                  WHEN rid * 10 < n * 9 THEN 'val'
                  ELSE 'test' END AS split
      FROM r
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM tagged GROUP BY lang, split ORDER BY lang, split
    """,
)
def split_exact_stratified(spark: SparkSession, sf_dir: str):
    """EXACT STRATIFIED 80/10/10 SPLIT (r14) — the companion to the
    hash-bucket split (`split_train_val_test`): hash buckets give
    EXPECTED proportions (a 500-doc language can land 76/14/10), while
    evaluation protocols often require EXACT per-stratum counts.  Here
    each language's docs are ranked by a salted md5 (doc_id tiebreak —
    a total order, so the split is reproducible and backfill-stable
    WITHIN a fixed snapshot) and cut by the integer rule rid·10 < n·8 /
    n·9 — every stratum gets exactly ⌈0.8n⌉/⌈0.1n⌉-style counts.

    Plan: per-lang rank + count via windows PARTITIONED by lang — keyed
    exchanges (millions of independent strata at 100 TB, never a global
    sort; the 1pw audit rule stays zero), then one (lang, split) agg.
    Trade vs the hash split, stated: adding documents RESHUFFLES ranks
    (the hash split is append-stable but inexact) — pick per use case."""
    from pyspark.sql.window import Window

    d = tbl(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("xsplit-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    r = d.select(
        "lang",
        "n_chars",
        (F.row_number().over(w) - 1).alias("rid"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
    )
    split = (
        F.when(F.col("rid") * 10 < F.col("n") * 8, "train")
        .when(F.col("rid") * 10 < F.col("n") * 9, "val")
        .otherwise("test")
    )
    return (
        r.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


@query(
    "sample_stratified_by_lang",
    oracle=f"""
    WITH rated AS (
      SELECT lang, doc_id, n_chars,
             CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 5000 ELSE {SAMPLE_MOD} END AS rate
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM rated
    WHERE {_ORACLE_H48.format(e="'strat-' || CAST(doc_id AS VARCHAR)")} % {SAMPLE_MOD} < rate
    GROUP BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str):
    """Stratified downsampling with per-stratum rates (10 % of English,
    50 % of German, 100 % of everything else) — the rebalancing move of
    corpus curation (downweight the dominant language).  Same hash-gate
    determinism as sample_hash_fraction, with the rate looked up per
    stratum; one scan, one map-side filter, one small agg."""
    d = tbl(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 1000)
        .when(F.col("lang") == "de", 5000)
        .otherwise(SAMPLE_MOD)
    )
    b = _bucket(F.concat(F.lit("strat-"), F.col("doc_id").cast("string")))
    return (
        d.filter(b < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
        )
    )


@query(
    "dedup_bloom_check",
    # verdict booleans are deterministic by construction: a Bloom filter
    # can NEVER false-negative, and the FP gate (< 5 %) sits ~6σ above
    # the ~0.8 % expectation at 12 bits/key, k=7
    oracle="""
    SELECT TRUE AS no_false_negatives, TRUE AS fp_under_bound,
           (SELECT COUNT(*) FROM customer) AS n_probed
    """,
)
def dedup_bloom_check(spark: SparkSession, sf_dir: str):
    """Distributed Bloom-filter membership contract: build the filter
    over the distinct order-placing customer keys (one pass, per-task
    bit-array partials OR-merged on the driver), broadcast it, probe
    EVERY customer map-side (no join on the probe path), then verify
    against exact membership:

    - no_false_negatives: every customer with orders must probe true —
      the Bloom guarantee, violated only by a build/probe hash mismatch;
    - fp_under_bound: false-positive rate among order-less customers
      < 5 % (sized 12 bits/key at k=7 → ~0.8 % expected).

    The 100 TB dedup pattern: seen-keys filter broadcast once, candidate
    stream filtered map-side, exact verification only on survivors."""
    from wukong_spark.operators.membership import bloom_build, bloom_probe

    members = (
        tbl(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    n = members.count()
    n_bits = max(1024, ((12 * n + 7) // 8) * 8)
    bits = bloom_build(members, "key", n_bits, k=7)
    cust = tbl(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    probed = bloom_probe(cust, "key", bits, k=7)
    truth = members.withColumn("is_member", F.lit(True))
    agg = probed.join(truth, "key", "left").agg(
        F.sum(
            F.when(F.col("is_member") & ~F.col("maybe"), 1).otherwise(0)
        ).alias("fn"),
        F.sum(
            F.when(F.col("is_member").isNull() & F.col("maybe"), 1).otherwise(0)
        ).alias("fp"),
        F.sum(F.when(F.col("is_member").isNull(), 1).otherwise(0)).alias("nonmem"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        (F.col("fn") == 0).alias("no_false_negatives"),
        ((F.col("fp") * 20 <= F.col("nonmem")) | (F.col("nonmem") == 0)).alias(
            "fp_under_bound"
        ),
        F.col("n").alias("n_probed"),
    )


@query(
    "sketch_countmin_check",
    # never_underestimates is structural (min of sums ≥ true count);
    # the overestimate gate 3eN/width fails with prob < 1e-6 per key
    # (Markov per row, min over depth=7 rows)
    oracle="""
    SELECT TRUE AS never_underestimates, TRUE AS overestimate_bounded,
           (SELECT COUNT(DISTINCT l_suppkey) FROM lineitem) AS n_keys
    """,
)
def sketch_countmin_check(spark: SparkSession, sf_dir: str):
    """Count-Min sketch frequency contract over lineitem supplier keys:
    build the (7 × 8192) sketch in one distributed pass (per-task
    counter-block partials summed on the driver — size independent of
    row count), then check EVERY distinct key's estimate against its
    exact groupBy count:

    - never_underestimates: CMS estimates are min-of-sums ≥ truth,
      structurally;
    - overestimate_bounded: error ≤ 3eN/width for every key.

    Only the distinct-key truth table (bounded by supplier count) and
    the sketch itself leave the cluster."""
    import math

    from wukong_spark.operators.membership import (
        countmin_build,
        countmin_estimate,
    )

    li = tbl(spark, sf_dir, "lineitem").select(F.col("l_suppkey").alias("key"))
    width, depth = 8192, 7
    cms = countmin_build(li, "key", width, depth)
    truth = li.groupBy("key").count().toPandas()  # O(n_suppliers) rows
    ests = countmin_estimate(cms, truth["key"])
    true_np = truth["count"].to_numpy()
    bound = 3.0 * math.e * float(true_np.sum()) / width
    return local_frame(spark,
        [
            (
                bool((ests >= true_np).all()),
                bool(((ests - true_np) <= bound).all()),
                len(truth),
            )
        ],
        "never_underestimates boolean, overestimate_bounded boolean,"
        " n_keys bigint",
    )


@query(
    "sketch_heavy_hitters_check",
    # the rows are the φ-heavy hitters by EXACT count (both engines
    # compute the same GROUP BY); the booleans are the CMS contracts:
    # `surfaced` is structural (estimates never under-count, so a key
    # with exact_n·625 > N estimates over the same threshold), and
    # `est_within_bound` (≤ 3eN/width per key) fails with prob < 1e-6
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, CAST(n AS BIGINT) AS exact_n,
           TRUE AS surfaced, TRUE AS est_within_bound
    FROM c, (SELECT COUNT(*) AS total FROM events) t
    WHERE n * 625 > total
    ORDER BY user_id, event_type
    """,
)
def sketch_heavy_hitters_check(spark: SparkSession, sf_dir: str):
    """Count-Min HEAVY HITTERS (r10, VERDICT r9 #3) — the operation a
    CMS actually exists for: surface every (user_id × event_type) pair
    holding more than φ = 1/625 of the event stream, from sketch
    estimates over a DISTRIBUTED candidate set, with the exact referee
    in-plan.

    Pipeline (the 100 TB shape end-to-end): the composite key is an
    INTEGRAL pack (user_id·n_types + type_code from a bounded broadcast
    dictionary) so hashing stays on the vectorized splitmix64 lane; one
    distributed CMS pass (counter blocks merged driver-side, O(w·d)
    state); candidates come from `local_heavy_candidates` — per-batch
    exact top-m heaps whose union is a pigeonhole-guaranteed SUPERSET
    of every φ-heavy key — NOT from a full-cardinality groupBy.
    `surfaced` = candidate ∧ estimate over φN: no false dismissals
    structurally (superset + estimates never under-count);
    `est_within_bound` pins each estimate to exact + 3eN/w.  The exact
    groupBy here is only the referee the driver hashes."""
    import math

    from wukong_spark.operators.membership import (
        countmin_build,
        countmin_estimate,
        local_heavy_candidates,
    )

    e = tbl(spark, sf_dir, "events").select("user_id", "event_type")
    types = sorted(
        r[0] for r in e.select("event_type").distinct().collect()
    )
    code = F.element_at(
        F.create_map(
            *[F.lit(x) for t, i in zip(types, range(len(types))) for x in (t, i)]
        ),
        F.col("event_type"),
    )
    keyed = e.select(
        "user_id",
        "event_type",
        (F.col("user_id") * len(types) + code).alias("key"),
    )
    width, depth = 8192, 7
    phi = 1.0 / 625.0
    cms = countmin_build(keyed, "key", width, depth)
    cand = set(
        r[0]
        for r in local_heavy_candidates(keyed, "key", phi).collect()
    )
    truth = keyed.groupBy("user_id", "event_type", "key").count().toPandas()
    ests = countmin_estimate(cms, truth["key"], integral=True)
    total = int(truth["count"].sum())
    bound = 3.0 * math.e * total / width
    is_hh = (truth["count"] * 625 > total).to_numpy()
    hh = truth[is_hh].copy()
    hh_est = ests[is_hh]
    in_cand = hh["key"].isin(cand).to_numpy()
    out = pd.DataFrame(
        {
            "user_id": hh["user_id"].astype("int64"),
            "event_type": hh["event_type"],
            "exact_n": hh["count"].astype("int64"),
            "surfaced": in_cand & (hh_est * 625 > total),
            "est_within_bound": (hh_est - hh["count"].to_numpy()) <= bound,
        }
    ).sort_values(["user_id", "event_type"], ignore_index=True)
    return local_frame(spark,
        out,
        "user_id bigint, event_type string, exact_n bigint,"
        " surfaced boolean, est_within_bound boolean",
    )


N_NEGATIVES = 4


@query(
    "sample_negative_pairs",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT d.doc_id AS anchor_id,
           s.j,
           (d.doc_id + 1 +
            {_ORACLE_H48.format(e="'neg-' || CAST(d.doc_id AS VARCHAR) || '-' || CAST(s.j AS VARCHAR)")}
            % (n.n_docs - 1)) % n.n_docs AS negative_id
    FROM documents d
    CROSS JOIN n
    CROSS JOIN (SELECT unnest(range(0, {N_NEGATIVES})) AS j) s
    ORDER BY anchor_id, j
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str):
    """CONTRASTIVE NEGATIVE SAMPLING (r11) — the training-pair generator
    for embedding/contrastive objectives: every anchor document gets
    k = 4 deterministic pseudo-random negatives.  The ring trick
    `neg = (anchor + 1 + h48(anchor, j) mod (N−1)) mod N` guarantees
    negative ≠ anchor WITHOUT rejection sampling (a rejection loop is
    non-deterministic row count and unvectorizable), and the content
    hash makes pairs reproducible across re-runs, repartitions, and
    engines — the split_train_val_test discipline applied to pair
    generation.

    100 TB path: map-side expression + a 4-element explode — no shuffle,
    no RNG state; the corpus-size scalar broadcasts."""
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    j = F.explode(F.array(*[F.lit(i) for i in range(N_NEGATIVES)])).alias("j")
    pairs = d.crossJoin(F.broadcast(n)).select(
        F.col("doc_id").alias("anchor_id"), "n_docs", j
    )
    h = _h48(
        F.concat(
            F.lit("neg-"),
            F.col("anchor_id").cast("string"),
            F.lit("-"),
            F.col("j").cast("string"),
        )
    )
    return pairs.select(
        "anchor_id",
        "j",
        (
            (F.col("anchor_id") + 1 + F.pmod(h, F.col("n_docs") - 1))
            % F.col("n_docs")
        ).alias("negative_id"),
    ).orderBy("anchor_id", "j")


def _epoch_key(epoch: int) -> Column:
    """Unique, engine-portable epoch-shuffle sort key: fixed-width decimal
    h48 then the doc id — lexicographic order == (hash, id) order, and
    the id suffix makes the key unique even under 48-bit collisions."""
    h = _h48(F.concat(F.lit(f"ep{epoch}-"), F.col("doc_id").cast("string")))
    return F.concat(
        F.lpad(h.cast("string"), 15, "0"),
        F.lit("-"),
        F.lpad(F.col("doc_id").cast("string"), 10, "0"),
    )


@query(
    "epoch_shuffle_check",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             lpad(CAST({_ORACLE_H48.format(e="'ep1-' || CAST(doc_id AS VARCHAR)")} AS VARCHAR), 15, '0')
               || '-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS k1,
             lpad(CAST({_ORACLE_H48.format(e="'ep2-' || CAST(doc_id AS VARCHAR)")} AS VARCHAR), 15, '0')
               || '-' || lpad(CAST(doc_id AS VARCHAR), 10, '0') AS k2
      FROM documents
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY k1) - 1 AS BIGINT) AS pos_epoch1,
           CAST(ROW_NUMBER() OVER (ORDER BY k2) - 1 AS BIGINT) AS pos_epoch2
    FROM keyed ORDER BY doc_id
    """,
)
def epoch_shuffle_check(spark: SparkSession, sf_dir: str):
    """DETERMINISTIC EPOCH SHUFFLING (r11) — the data-loader contract:
    every training epoch visits the corpus in a different but
    REPRODUCIBLE pseudo-random order (re-runs, restarts, and executor
    retries must agree on position i of epoch e).  Order = content hash
    of (epoch, doc_id) with the id as unique suffix; positions come from
    `operators/setindex.global_row_number` — range-partition + broadcast
    prefix offsets, NO single-partition sort (the window formulation the
    ORACLE uses is the semantic spec, not the physical plan).

    Emits each document's position in epochs 1 and 2 — hash-checked per
    row, and the two permutations differ by construction of the salt.

    100 TB path: one range exchange per epoch ordering; position
    assignment is map-side offsets — the same machinery as
    global_row_number_check."""
    from wukong_spark.operators.setindex import global_row_number

    d = tbl(spark, sf_dir, "documents").select("doc_id")
    p1 = global_row_number(
        d.withColumn("k", _epoch_key(1)), "k", n_partitions=16, out_col="pos"
    ).select("doc_id", F.col("pos").alias("pos_epoch1"))
    p2 = global_row_number(
        d.withColumn("k", _epoch_key(2)), "k", n_partitions=16, out_col="pos"
    ).select("doc_id", F.col("pos").alias("pos_epoch2"))
    return p1.join(p2, "doc_id").orderBy("doc_id")


@query(
    "sample_mixture_rebalance",
    # data-dependent integer rates replayed in SQL: rate_l in hash-bucket
    # units is pure BIGINT arithmetic (min(MOD, target_ppm*N*MOD DIV
    # (1e6*n_l))), then the same 48-bit hash gate as every sampler here
    oracle=f"""
    WITH n_l AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT SUM(n) AS nt FROM n_l
    ), rates AS (
      SELECT lang, n,
             LEAST({SAMPLE_MOD},
                   (200000 * nt * {SAMPLE_MOD}) // (1000000 * n)) AS rate
      FROM n_l CROSS JOIN tot
    )
    SELECT d.lang, r.n AS n_before, CAST(r.rate AS BIGINT) AS rate,
           COUNT(*) AS n_sampled
    FROM documents d JOIN rates r ON r.lang = d.lang
    WHERE {_ORACLE_H48.format(e="'mix-' || CAST(d.doc_id AS VARCHAR)")}
          % {SAMPLE_MOD} < r.rate
    GROUP BY d.lang, r.n, r.rate
    ORDER BY d.lang
    """,
)
def sample_mixture_rebalance(spark: SparkSession, sf_dir: str):
    """MIXTURE REBALANCING to target proportions (r12) — the data-mixing
    knob of a pretraining pipeline: given a target share per stratum
    (equal fifths by lang here, 200000 ppm each), the per-stratum
    acceptance rate is COMPUTED from the observed counts —
    rate_l = min(1, target_share·N / n_l) — rather than hardcoded like
    `sample_stratified_by_lang`'s fixed rates.  Over-represented strata
    are downsampled toward the target; under-represented ones keep
    everything (a sampler cannot mint rows — the min() is the honest
    cap, and the emitted `rate` column shows which strata saturated).

    Exactness: rates live in integer hash-bucket units via pure BIGINT
    arithmetic (no float proportions), and the row gate is the
    registry's deterministic 48-bit md5 hash — so the sampled set is
    reproducible across engines, partitionings, and retries.

    100 TB path: one small per-stratum count agg, a ≤|strata|-row
    broadcast join, then a map-side hash filter — the data is scanned
    once and never shuffled."""
    d = tbl(spark, sf_dir, "documents")
    n_l = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    tot = n_l.agg(F.sum("n").alias("nt"))
    rates = n_l.crossJoin(F.broadcast(tot)).selectExpr(
        "lang",
        "n",
        f"LEAST({SAMPLE_MOD},"
        f" (200000 * nt * {SAMPLE_MOD}) DIV (1000000 * n)) AS rate",
    )
    b = _bucket(F.concat(F.lit("mix-"), F.col("doc_id").cast("string")))
    return (
        d.join(F.broadcast(rates), "lang")
        .filter(b < F.col("rate"))
        .groupBy("lang", "n", "rate")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .select(
            "lang",
            F.col("n").alias("n_before"),
            F.col("rate").cast("long").alias("rate"),
            "n_sampled",
        )
        .orderBy("lang")
    )


#: shared HLL post-aggregation formula text (Spark selectExpr == DuckDB):
#: raw harmonic-mean estimate, then the standard small-range linear
#: counting correction — identical IEEE op sequence in both engines
_HLL_RAW = (
    "(0.7213 / (1.0 + 1.079 / 4096.0)) * 4096.0 * 4096.0"
    " / (s_present + (4096 - present) * 1.0) AS raw,"
    " 4096 - present AS v"
)
_HLL_FIN = (
    "CASE WHEN raw <= 2.5 * 4096.0 AND v > 0"
    " THEN 4096.0 * LN(4096.0 / v) ELSE raw END AS e"
)


@query(
    "sketch_hll_distinct_check",
    oracle=f"""
    WITH k AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) || '|' || event_type AS key
      FROM events
    ), h AS (
      SELECT CAST(('0x' || substr(md5(key), 1, 15)) AS BIGINT) AS h FROM k
    ), rb AS (
      SELECT h % 4096 AS bucket, h // 4096 AS w FROM h
    ), rho AS (
      SELECT bucket,
             MAX(CASE WHEN w = 0 THEN 49 ELSE 49 - LENGTH(BIN(w)) END) AS r
      FROM rb GROUP BY bucket
    ), agg AS (
      SELECT COUNT(*) AS present, SUM(POWER(2.0, -r)) AS s_present FROM rho
    ), est AS (
      SELECT {_HLL_RAW} FROM agg
    ), fin AS (
      SELECT {_HLL_FIN}, v FROM est
    )
    SELECT (SELECT COUNT(*) FROM k) AS n_exact,
           ROUND(e, 6) AS hll_estimate_6,
           CAST(v AS BIGINT) AS empty_registers,
           ABS(e - (SELECT COUNT(*) FROM k))
             / (SELECT COUNT(*) FROM k) < 0.08 AS within_error
    FROM fin
    """,
)
def sketch_hll_distinct_check(spark: SparkSession, sf_dir: str):
    """HyperLogLog DISTINCT-COUNT sketch, engine-portably deterministic
    (r12) — completes the sketch trio next to Bloom (membership) and
    Count-Min (frequency).  `approx_count_distinct` is Spark's built-in
    HLL++ but its sketch is implementation-defined (no cross-engine
    oracle); this entry builds HLL from first principles on the
    registry's md5-derived 60-bit hash so DuckDB replays it EXACTLY:

    - bucket = h mod 4096 (p=12), w = h div 4096 (48 payload bits);
    - register rank via EXACT INTEGER ops: rho = 49 − LENGTH(BIN(w))
      (length of the binary string = floor(log2 w)+1 — no floating
      log2 edge-rounding anywhere);
    - per-bucket MAX is the sketch merge — a plain keyed groupBy, so
      partial aggregation IS the distributed sketch union;
    - the harmonic-mean estimate + standard small-range linear-counting
      correction share formula text between engines (the round-6
      estimate hashes bit-for-bit; the only fp-order freedom is the
      4096-term power sum, ~1e-11 absolute against a 1e-6 grid).

    within_error (<8 %, ~5σ of the 1.04/√m standard error) is the
    regen-safe quality gate.  100 TB path: state is 4096 registers
    regardless of cardinality; the shuffle is (bucket, rho) pairs with
    map-side MAX combine."""
    e = tbl(spark, sf_dir, "events")
    k = e.selectExpr(
        "CAST(user_id AS STRING) || '|' || event_type AS key"
    ).distinct()
    from wukong_spark.queries.textops import md5_long

    # integer DIV, not float division: h is 60 bits, past double precision
    rb = k.select(md5_long(F.col("key")).alias("h")).selectExpr(
        "h % 4096 AS bucket", "h DIV 4096 AS w"
    )
    rho = rb.selectExpr(
        "bucket",
        "CASE WHEN w = 0 THEN 49 ELSE 49 - LENGTH(BIN(w)) END AS r",
    ).groupBy("bucket").agg(F.max("r").alias("r"))
    agg = rho.selectExpr("r").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(F.expr("POWER(2.0, -r)")).alias("s_present"),
    )
    est = agg.selectExpr(*_HLL_RAW.split(", "))
    fin = est.selectExpr(_HLL_FIN, "v")
    n_exact = k.count()
    return fin.select(
        F.lit(n_exact).alias("n_exact"),
        F.round("e", 6).alias("hll_estimate_6"),
        F.col("v").cast("long").alias("empty_registers"),
        (F.abs(F.col("e") - n_exact) / n_exact < 0.08).alias("within_error"),
    )


@query(
    "sample_bottomk_per_key",
    # bottom-k by md5 hex: the hash ORDER is a total order on (h, id)
    # strings/ints identical in both engines, so the k survivors per key
    # are bit-deterministic — no RNG, no seed drift
    oracle="""
    WITH h AS (
      SELECT event_type, event_id,
             md5(CAST(event_id AS VARCHAR)) AS hx
      FROM events
    ), r AS (
      SELECT event_type, event_id, hx,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY hx ASC, event_id ASC
             ) AS rk
      FROM h
    )
    SELECT event_type, rk, event_id, hx
    FROM r WHERE rk <= 5
    ORDER BY event_type, rk
    """,
)
def sample_bottomk_per_key(spark: SparkSession, sf_dir: str):
    """BOTTOM-K PER-KEY SAMPLING (r13) — the deterministic equivalent of
    a per-key reservoir sample: hash every row's id and keep the k rows
    with the SMALLEST hashes per key.  Because md5 is uniform, the
    survivors are a uniform k-sample of each key's rows, yet fully
    reproducible across engines, reruns, and data relayouts — no RNG
    state, no seed plumbing.  The same bottom-k set doubles as a
    mergeable DISTINCT-COUNT sketch (the k-th smallest hash estimates
    cardinality), which is why warehouses keep it as a first-class
    sample operator.

    Plan: map-side hash, one exchange on the key, window row_number.
    At 100 TB the winning move Catalyst already makes here: rank<=k
    windows push a per-partition TOP-K (WindowGroupLimit) below the
    exchange, so each map task forwards at most k rows per key instead
    of its whole partition — the reservoir property, distributed."""
    from pyspark.sql.window import Window

    e = tbl(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.md5(F.col("event_id").cast("string")).alias("hx"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("hx").asc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("event_type", "rk", "event_id", "hx")
        .orderBy("event_type", "rk")
    )


@query(
    "sample_source_cap",
    # per-source frequency cap: keep ≤ cap docs per source chosen by a
    # salted content-address rank (md5, doc_id tiebreak — a total
    # order); emit per-source audit rows with exact integer measures
    # plus an id-sum fingerprint of the kept set so the CAP SELECTION
    # (not just the counts) hash-matches
    oracle="""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('srccap-' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rk <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk <= 120 THEN doc_id END) AS BIGINT)
             AS kept_id_sum,
           CAST(SUM(CASE WHEN rk <= 120 THEN n_chars END) AS BIGINT)
             AS kept_chars
    FROM r GROUP BY source ORDER BY source
    """,
)
def sample_source_cap(spark: SparkSession, sf_dir: str):
    """PER-SOURCE FREQUENCY CAP (r15) — the Dolma/RefinedWeb-style
    domain-capping step: no source (domain) may contribute more than
    `cap` documents to the corpus, the survivors chosen by a salted
    content-address rank (md5 over the salted id, doc_id tiebreak — a
    total order, so the kept set is deterministic and engine-identical)
    rather than arrival order, which would bias toward early crawl
    segments.  Emits a per-source audit row: total docs, kept docs, an
    exact id-sum fingerprint of the kept set (pins WHICH docs survived,
    not just how many) and kept chars for mixture accounting.

    Plan: one rank window PARTITIONED BY source (keyed exchange —
    millions of independent domains at 100 TB, never a global sort; the
    1pw audit rule stays zero) + one keyed agg.  Catalyst pushes the
    rank ≤ cap filter below the exchange as WindowGroupLimit, so each
    map task forwards at most cap rows per source — the same
    distributed-reservoir property the per-key sampler uses."""
    from pyspark.sql.window import Window

    cap = 120
    d = tbl(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("srccap-"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    r = d.select("source", "doc_id", "n_chars").withColumn(
        "rk", F.row_number().over(w)
    )
    kept = F.col("rk") <= cap
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id"))).cast("long").alias(
                "kept_id_sum"
            ),
            F.sum(F.when(kept, F.col("n_chars"))).cast("long").alias(
                "kept_chars"
            ),
        )
        .orderBy("source")
    )
