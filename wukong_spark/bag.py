"""Bag — partitioned generic-Python-object collection (dask.bag parity).

Reference surface: `dask.bag` partitioned sequences with map/filter/fold/
groupby/frequencies (`/root/reference/Static Scheduler/wukong/tests/
test_collections.py:11,106-110` — bag groupby by arbitrary key fn), executed
as opaque task graphs.  Spark-first: a Bag wraps an RDD — this is the ONE
surface where RDDs are the right tool (arbitrary Python objects, per-element
lambdas, no schema), exactly the "genuinely need per-partition imperative
logic" carve-out.  Anything with a schema should be a DataFrame instead;
`to_dataframe` is the exit ramp.

Laziness matches dask: transformations build up the RDD lineage; only
`compute()`/`take()`/reductions execute.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

#: pluck's "no default supplied" marker (None is a legitimate default)
_NO_DEFAULT = object()


class _Neg:
    """Order-reversing key wrapper (works for any comparable, not just
    numbers — takeOrdered ascends, topk wants descending)."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        return other.v < self.v

    def __eq__(self, other):
        return self.v == other.v


class Bag:
    def __init__(self, rdd):
        self._rdd = rdd

    # -- constructors -----------------------------------------------------
    @staticmethod
    def from_sequence(
        spark: SparkSession, seq: Iterable[Any], npartitions: int = 8
    ) -> "Bag":
        return Bag(spark.sparkContext.parallelize(list(seq), npartitions))

    @staticmethod
    def from_dataframe(df: DataFrame) -> "Bag":
        """Rows become plain dicts (bag semantics: generic objects)."""
        return Bag(df.rdd.map(lambda r: r.asDict()))

    # -- transformations (lazy) -------------------------------------------
    def map(self, fn: Callable[[Any], Any]) -> "Bag":
        return Bag(self._rdd.map(fn))

    def filter(self, pred: Callable[[Any], bool]) -> "Bag":
        return Bag(self._rdd.filter(pred))

    def flatten(self) -> "Bag":
        return Bag(self._rdd.flatMap(lambda x: x))

    def map_partitions(self, fn: Callable[[Iterable[Any]], Iterable[Any]]) -> "Bag":
        return Bag(self._rdd.mapPartitions(fn))

    def groupby(self, key: Callable[[Any], Any]) -> "Bag":
        """(key(x) → list of x) pairs — dask.bag.groupby semantics.

        Scale note: this is the shuffle-the-values shape (like dask's);
        prefer `foldby` when a reduction follows — it combines map-side
        and never materializes per-key lists.
        """
        return Bag(self._rdd.groupBy(key).map(lambda kv: (kv[0], list(kv[1]))))

    def foldby(
        self,
        key: Callable[[Any], Any],
        binop: Callable[[Any, Any], Any],
        initial: Any,
        combine: Callable[[Any, Any], Any] | None = None,
    ) -> "Bag":
        """Per-key fold with map-side combining (dask.bag.foldby ≈
        aggregateByKey) — the scalable alternative to groupby+reduce."""
        comb = combine or binop
        return Bag(
            self._rdd.map(lambda x: (key(x), x)).aggregateByKey(
                initial, binop, comb
            )
        )

    def frequencies(self) -> "Bag":
        return self.foldby(
            lambda x: x, lambda acc, _x: acc + 1, 0, lambda a, b: a + b
        )

    def distinct(self) -> "Bag":
        return Bag(self._rdd.distinct())

    def starmap(self, fn: Callable[..., Any]) -> "Bag":
        """Apply fn(*x) to each (tuple) element — dask.bag.starmap."""
        return Bag(self._rdd.map(lambda x: fn(*x)))

    def remove(self, pred: Callable[[Any], bool]) -> "Bag":
        """Drop elements where pred holds — dask.bag.remove (¬filter)."""
        return Bag(self._rdd.filter(lambda x: not pred(x)))

    def pluck(self, key: Any, default: Any = _NO_DEFAULT) -> "Bag":
        """Extract `key` from each mapping/sequence element —
        dask.bag.pluck (toolz.get semantics): withOUT a default, lookup
        errors propagate (a bag of ints plucked by key is a programming
        error, not a column of defaults); WITH one, missing keys yield
        it."""

        # resolved DRIVER-side: the sentinel is identity-compared, and a
        # cloudpickled closure cell would deserialize to a different object
        has_default = default is not _NO_DEFAULT

        def get(x):
            try:
                return x[key]
            except (KeyError, IndexError, TypeError):
                if not has_default:
                    raise
                return default

        return Bag(self._rdd.map(get))

    def repartition(self, npartitions: int) -> "Bag":
        return Bag(self._rdd.repartition(npartitions))

    # -- actions ----------------------------------------------------------
    def compute(self) -> list:
        return self._rdd.collect()

    def take(self, n: int) -> list:
        return self._rdd.take(n)

    def count(self) -> int:
        return self._rdd.count()

    def fold(
        self,
        binop: Callable[[Any, Any], Any],
        initial: Any,
        combine: Callable[[Any, Any], Any] | None = None,
    ) -> Any:
        return self._rdd.aggregate(initial, binop, combine or binop)

    def sum(self) -> Any:
        return self._rdd.sum()

    def topk(self, k: int, key: Callable[[Any], Any] | None = None) -> list:
        """Largest k elements (dask.bag.topk) — distributed TakeOrdered,
        never a full sort/collect."""
        if key is None:
            return self._rdd.takeOrdered(k, key=lambda x: _Neg(x))
        return self._rdd.takeOrdered(k, key=lambda x: _Neg(key(x)))

    # -- exit ramp to the declarative layer --------------------------------
    def to_dataframe(self, spark: SparkSession, schema: str) -> DataFrame:
        """Escape to DataFrames as soon as structure emerges — everything
        downstream gets Catalyst/codegen back."""
        return spark.createDataFrame(self._rdd, schema)
