"""Skew-resilient aggregation: two-phase salted groupBy.

Reference parity: the reference never aggregates by key at all (its
reductions are tree-folds over opaque tasks, `/root/reference/README.md:180-202`),
so key skew is a problem class it cannot express.  At 100 TB a groupBy on a
low-cardinality or Zipfian key (event_type, language, domain) concentrates
entire keys on single reducers; the standard fix is salting — aggregate on
(key, salt) first, then combine the ≤`buckets` partials per key.

Spark's partial (map-side) aggregation already de-skews *algebraic* aggs in
most cases; explicit salting matters when the combiner is disabled
(high-cardinality intermediate maps) or for composed pipelines where the
first shuffle key is skewed.  The helper keeps the decomposition exact:
count → sum of counts, sum → sum of sums, min/max → min/max of partials —
bit-identical for integer columns, so the salted plan is oracle-checkable
against the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: out_name -> (fn, column-expr); fn ∈ {"count", "sum", "min", "max"}
AggSpec = dict[str, tuple[str, "Column | str | None"]]

_PARTIAL = {
    # count honors SQL semantics: count(col) counts non-null rows of col,
    # count with col=None is COUNT(*)
    "count": lambda c: F.count(F.lit(1)) if c is None else F.count(c),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_COMBINE = {
    "count": F.sum,  # counts add up
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame, keys: list[str], aggs: AggSpec, buckets: int = 32
) -> DataFrame:
    """GroupBy `keys` with the shuffle salted into `buckets` sub-keys.

    Phase 1 shuffles on (keys…, salt) — a skewed key's rows spread over
    `buckets` reducers; phase 2 shuffles ≤`buckets` rows per key.  Only
    exactly-decomposable aggregates are accepted (see module docstring).
    """
    unknown = {fn for fn, _ in aggs.values()} - set(_PARTIAL)
    if unknown:
        raise ValueError(f"non-decomposable aggregate(s): {sorted(unknown)}")

    # row-deterministic salt with no key dependence: spreads every key's
    # rows uniformly; value plays no role in the final result
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).alias("__salt")

    partial_cols = [
        _PARTIAL[fn](col).alias(f"__p_{name}") for name, (fn, col) in aggs.items()
    ]
    partial = df.groupBy(*keys, salt).agg(*partial_cols)

    final_cols = [
        _COMBINE[fn](F.col(f"__p_{name}")).alias(name)
        for name, (fn, _) in aggs.items()
    ]
    return partial.groupBy(*keys).agg(*final_cols)
