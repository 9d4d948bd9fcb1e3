"""Distributed membership & frequency sketches (SURVEY.md §2.3 —
training-data pipeline staples beyond the reference's surface).

Bloom filters are THE dedup/membership primitive at corpus scale:
build once over the seen-key set, broadcast the bit array, and probe a
candidate stream map-side — no join, no shuffle of the big side.
Count-Min sketches answer frequency/heavy-hitter queries in O(w·d)
memory regardless of key cardinality.  Both build via per-partition
partials whose size is independent of row count (an m-bit array / a
w·d counter block per task) and merge by elementwise OR / sum — the
same bounded-driver-traffic shape as the gramian partials.

100 TB path: the arrays here are driver-merged (fine to ~100 MB); past
that, key-range-partitioned blooms (one per bucket, probed after a
bucket-id map) keep every array bounded while the probe stays map-side.

Hashing: integer key columns take a fully-vectorized splitmix64 lane
pair (numpy, no per-row Python); other types hash per value through
stdlib blake2b.  The branch is decided ONCE from the Spark column type
(never from a batch's pandas dtype — an integral column carrying NULLs
arrives as float64/object only in the batches that hold a null, which
would silently switch branches partition-dependently and break the
no-false-negative / never-underestimate contracts).  NULL keys hash to
a fixed sentinel lane pair in every branch, so build and probe agree
regardless of how nulls distribute across partitions.

Batches are made null-proof UPSTREAM in the Spark plan (ADVICE r10
medium): the operators project `coalesce(key, 0)` plus an `isnull`
flag, so an integral key column reaches pandas as exact int64 in EVERY
batch.  Without this, Arrow→pandas promotes a null-carrying int64 batch
to float64 before any Python code runs, silently rounding keys with
|v| ≥ 2^53 — the same key would then hash differently in null-carrying
vs null-free batches, and build/probe could disagree partition-
dependently.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix(x: np.ndarray) -> np.ndarray:
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z ^= z >> np.uint64(30)
    z = (z * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    z ^= z >> np.uint64(27)
    z = (z * np.uint64(0x94D049BB133111EB)) & _M64
    return z ^ (z >> np.uint64(31))


_INTEGRAL_SPARK_TYPES = frozenset(("tinyint", "smallint", "int", "bigint"))

# Fixed sentinel lanes for NULL keys — same value in every branch and
# every partition, so a null hashes identically at build and probe time.
_NULL_DIGEST = hashlib.blake2b(b"\x00wukong:null-key", digest_size=16).digest()
_NULL_H1 = np.uint64(int.from_bytes(_NULL_DIGEST[:8], "little"))
_NULL_H2 = np.uint64(int.from_bytes(_NULL_DIGEST[8:], "little"))


def _is_integral(df: DataFrame, col: str) -> bool:
    """Decide the hash branch from the Spark schema (ADVICE r9: per-batch
    pandas dtypes lie when an integral column carries NULLs)."""
    t = {f.name: f.dataType.simpleString() for f in df.schema.fields}[col]
    return t in _INTEGRAL_SPARK_TYPES


_KEY, _NULLFLAG = "__wk_key", "__wk_isnull"


def _key_cols(col: str, integral: bool):
    """Null-proof batch projection for a key column (module docstring):
    integral keys ship as `coalesce(col, 0)` bigint — exact int64 in
    every Arrow batch, no float64 promotion — with null positions in a
    separate boolean flag; other types pass through (object series hold
    None losslessly)."""
    key = (
        F.coalesce(F.col(col), F.lit(0)).cast("bigint")
        if integral
        else F.col(col)
    )
    return key.alias(_KEY), F.isnull(col).alias(_NULLFLAG)


def _hash2_series(
    s: pd.Series, integral: bool, na: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Series of keys → two independent uint64 hash lanes (vectorized
    splitmix64 when the SPARK column type is integral, blake2b per value
    otherwise).  `integral` comes from the DataFrame schema, never from
    the batch dtype.  NULLs map to a fixed sentinel pair; the null mask
    `na` should come from the plan-side `_key_cols` flag (a null-carrying
    int64 batch without that projection has ALREADY been promoted to
    float64 and rounded past 2^53 — see module docstring).  The second
    lane is forced odd so double hashing never degenerates."""
    if na is None:
        na = s.isna().to_numpy()
    if integral:
        # fillna(0) keeps the vectorized cast valid for direct driver-side
        # callers that skip _key_cols; null rows are overwritten below.
        vals = s.fillna(0) if s.isna().any() else s
        x = vals.to_numpy(dtype=np.int64).astype(np.uint64)
        h1 = _splitmix(x)
        h2 = _splitmix(x ^ np.uint64(0xA076_1D64_78BD_642F))
    else:
        pairs = [
            _NULL_DIGEST
            if null
            else hashlib.blake2b(str(v).encode("utf-8"), digest_size=16).digest()
            for v, null in zip(s, na)
        ]
        h1 = np.array(
            [int.from_bytes(p[:8], "little") for p in pairs], np.uint64
        )
        h2 = np.array(
            [int.from_bytes(p[8:], "little") for p in pairs], np.uint64
        )
    if na.any():
        h1[na] = _NULL_H1
        h2[na] = _NULL_H2
    return h1, h2 | np.uint64(1)


def _positions(
    h1: np.ndarray, h2: np.ndarray, n_bits: int, k: int
) -> np.ndarray:
    """(n, k) Kirsch–Mitzenmacher double-hashed probe positions."""
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
        np.int64
    )


def bloom_build(df: DataFrame, col: str, n_bits: int, k: int = 7) -> np.ndarray:
    """Distributed Bloom-filter build → packed bit array (n_bits/8 bytes).

    One pass: every partition sets bits in its local copy and ships it
    once; the driver ORs the partials.  Guaranteed no false negatives;
    n_bits ≈ 10 bits/key gives ~1 % false positives at k=7."""
    assert n_bits % 8 == 0
    nb = n_bits
    integral = _is_integral(df, col)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.zeros(nb // 8, np.uint8)
        got = False
        for pdf in batches:
            if not len(pdf):
                continue
            h1, h2 = _hash2_series(
                pdf[_KEY], integral, na=pdf[_NULLFLAG].to_numpy()
            )
            pos = _positions(h1, h2, nb, k).ravel()
            np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            got = True
        if got:
            yield pd.DataFrame({"b": [bits.tobytes()]})

    rows = df.select(*_key_cols(col, integral)).mapInPandas(partials, "b binary").collect()
    out = np.zeros(nb // 8, np.uint8)
    for row in rows:
        out |= np.frombuffer(row.b, np.uint8)
    return out


def bloom_probe(
    df: DataFrame, col: str, bits: np.ndarray, k: int = 7, out_col: str = "maybe"
) -> DataFrame:
    """Map-side membership probe: broadcast the bit array, emit a boolean
    `maybe` per row (true = possibly member, false = definitely not).
    No join, no shuffle — the big side streams."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits.tobytes())
    nb = len(bits) * 8
    integral = _is_integral(df, col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.frombuffer(bc.value, np.uint8)
        for pdf in batches:
            pdf = pdf.copy()
            if len(pdf):
                h1, h2 = _hash2_series(
                    pdf[_KEY], integral, na=pdf[_NULLFLAG].to_numpy()
                )
                pos = _positions(h1, h2, nb, k)
                hit = (arr[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
                pdf[out_col] = hit.all(axis=1)
            else:
                pdf[out_col] = np.zeros(0, bool)
            yield pdf.drop(columns=[_KEY, _NULLFLAG])

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    key, flag = _key_cols(col, integral)
    return df.select("*", key, flag).mapInPandas(
        run, f"{schema}, {out_col} boolean"
    )


def countmin_build(df: DataFrame, col: str, width: int, depth: int) -> np.ndarray:
    """Distributed Count-Min sketch build → (depth, width) int64 counters.

    Per-partition partials sum elementwise; a point estimate is the min
    over rows of the double-hashed cells — always ≥ the true count, and
    within εN (ε = e/width) with probability 1 − e^(−depth)."""
    integral = _is_integral(df, col)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cms = np.zeros((depth, width), np.int64)
        got = False
        for pdf in batches:
            if not len(pdf):
                continue
            h1, h2 = _hash2_series(
                pdf[_KEY], integral, na=pdf[_NULLFLAG].to_numpy()
            )
            pos = _positions(h1, h2, width, depth)  # (n, depth)
            for r in range(depth):
                np.add.at(cms[r], pos[:, r], 1)
            got = True
        if got:
            yield pd.DataFrame({"b": [cms.tobytes()]})

    rows = df.select(*_key_cols(col, integral)).mapInPandas(partials, "b binary").collect()
    out = np.zeros((depth, width), np.int64)
    for row in rows:
        out += np.frombuffer(row.b, np.int64).reshape(depth, width)
    return out


def local_heavy_candidates(
    df: DataFrame, col: str, phi: float, margin: int = 2
) -> DataFrame:
    """Candidate keys for φ-heavy-hitter surfacing WITHOUT a
    full-cardinality groupBy: the exact local top-m keys of every Arrow
    batch, unioned and deduped.

    Superset guarantee (pigeonhole): batches partition the stream, so a
    key with global count > φN has local share > φ in at least one
    batch; within a batch, fewer than 1/φ keys can each hold a > φ
    share — the batch's top-⌈1/φ⌉ by count therefore contains every
    global φ-heavy key.  m = margin·⌈1/φ⌉ adds slack for ties.

    100 TB path: driver/shuffle traffic is n_batches · m keys, never
    the key cardinality — this is the candidate stream a Count-Min
    sketch is probed with when keys are unbounded (user×URL, n-grams).

    NULL keys participate (ADVICE r10 low): counting runs over the
    null-proof (key, isnull) projection — `groupby(dropna=False)` on
    the pair — so a φ-heavy NULL key surfaces as a candidate (as a
    NULL row of the result) instead of being silently dropped by
    pandas' default NaN exclusion.  (`groupby(dropna=False)` is
    pandas ≥ 1.3; `DataFrame.value_counts(dropna=...)` would need 1.5 —
    ADVICE r11 low, executor-pandas portability.)
    """
    import math

    m = margin * int(math.ceil(1.0 / phi))
    integral = _is_integral(df, col)

    def tops(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                # sort_values + head, not nlargest: nlargest drops rows
                # through MultiIndex.drop, which raises KeyError when the
                # (key, flag) index carries a NaN lane (pandas quirk)
                top = (
                    pdf.groupby([_KEY, _NULLFLAG], dropna=False, sort=False)
                    .size()
                    .sort_values(ascending=False, kind="stable")
                    .head(m)
                )
                yield top.index.to_frame(index=False)

    schema_t = {f.name: f.dataType.simpleString() for f in df.schema.fields}[col]
    key_t = "bigint" if integral else schema_t
    cands = df.select(*_key_cols(col, integral)).mapInPandas(
        tops, f"{_KEY} {key_t}, {_NULLFLAG} boolean"
    ).distinct()
    # (0, true) ↔ NULL is injective, so distinct-before-map is exact
    return cands.select(
        F.when(F.col(_NULLFLAG), F.lit(None))
        .otherwise(F.col(_KEY))
        .cast(schema_t)
        .alias(col)
    )


def countmin_estimate(
    cms: np.ndarray, values: pd.Series, integral: bool | None = None
) -> np.ndarray:
    """Point-frequency estimates for a series of keys: min over the
    sketch's d hashed cells (vectorized).  `integral` must match the
    build's Spark-schema branch; when None it is inferred from the
    series dtype (only safe for null-free driver-side key lists)."""
    depth, width = cms.shape
    if integral is None:
        integral = values.dtype.kind in ("i", "u")
    h1, h2 = _hash2_series(values, integral)
    pos = _positions(h1, h2, width, depth)  # (n, depth)
    ests = np.stack([cms[r][pos[:, r]] for r in range(depth)], axis=1)
    return ests.min(axis=1)


def value_hist_build(
    df: DataFrame, col: str, width: int, n_buckets: int
) -> np.ndarray:
    """Distributed MERGEABLE value-bucket histogram -> int64[n_buckets]:
    bucket[j] counts rows with j*width <= value < (j+1)*width (values
    outside [0, n_buckets*width) clip into the edge buckets — callers
    that need the containment contract check the domain separately).

    This is the quantile-sketch workhorse of the streaming layer: exact
    integer counts over a FIXED value grid, so partials from partitions,
    micro-batches, or parallel streams merge by plain addition
    (order-free, loss-free) — the same mergeability currency as the
    Count-Min counters above — and any rank query answers from one
    cumsum with value-resolution error <= width.  State is
    O(n_buckets) int64 regardless of row count.

    `col` must be integral (the caller fixes the grid by pre-scaling,
    e.g. CAST(ROUND(value*10000) AS BIGINT)); NULLs are dropped."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        hist = np.zeros(n_buckets, np.int64)
        got = False
        for pdf in batches:
            if not len(pdf):
                continue
            v = pdf[col].dropna().to_numpy(np.int64)
            if not len(v):
                continue
            idx = np.clip(v // width, 0, n_buckets - 1)
            np.add.at(hist, idx, 1)
            got = True
        if got:
            yield pd.DataFrame({"b": [hist.tobytes()]})

    rows = df.select(col).mapInPandas(partials, "b binary").collect()
    out = np.zeros(n_buckets, np.int64)
    for row in rows:
        out += np.frombuffer(row.b, np.int64)
    return out
