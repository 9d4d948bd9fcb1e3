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
        #: RDDs an operator persisted on behalf of this bag (accumulate's
        #: parent store) — freed by release(), the BlockMatrix pattern
        self._cached_deps: list = []

    def release(self) -> None:
        """Unpersist any RDDs an operator cached on behalf of this bag
        (currently: accumulate's two-pass parent store).  Safe any time
        after the last action on this bag — persist does not truncate
        lineage, later reads just recompute; idempotent."""
        for rdd in self._cached_deps:
            try:
                rdd.unpersist()
            except Exception:
                pass  # already unpersisted / context gone
        self._cached_deps = []

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

    def min(self) -> Any:
        return self._rdd.min()

    def max(self) -> Any:
        return self._rdd.max()

    def mean(self) -> float:
        n, s = self._rdd.aggregate(
            (0, 0.0), lambda a, x: (a[0] + 1, a[1] + x),
            lambda a, b: (a[0] + b[0], a[1] + b[1]),
        )
        return s / n

    def var(self, ddof: int = 0) -> float:
        """dask.bag.var: single-pass (n, Σx, Σx²) fold."""
        n, s, ss = self._rdd.aggregate(
            (0, 0.0, 0.0),
            lambda a, x: (a[0] + 1, a[1] + x, a[2] + x * x),
            lambda a, b: (a[0] + b[0], a[1] + b[1], a[2] + b[2]),
        )
        return (ss - s * s / n) / (n - ddof)

    def std(self, ddof: int = 0) -> float:
        return self.var(ddof) ** 0.5

    def any(self) -> bool:
        """True iff any element is truthy — EARLY-EXIT: take(1) over the
        filtered bag stops at the first hit instead of scanning all
        partitions."""
        return bool(self._rdd.filter(bool).take(1))

    def all(self) -> bool:
        return not bool(self._rdd.filter(lambda x: not x).take(1))

    def random_sample(self, prob: float, random_state: int = 0) -> "Bag":
        """Deterministic Bernoulli sample (dask.bag.random_sample):
        per-partition PCG64 seeded by (random_state, partition id), so the
        selection is reproducible for a fixed partitioning — the bag-level
        analogue of the content-hash sampling queries."""
        import numpy as _np

        def part(pid: int, it: Iterable[Any]):
            rng = _np.random.default_rng((random_state, pid))
            for x in it:
                if rng.random() < prob:
                    yield x

        return Bag(self._rdd.mapPartitionsWithIndex(part))

    def accumulate(self, binop: Callable[[Any, Any], Any], initial: Any = _NO_DEFAULT) -> "Bag":
        """Prefix scan (dask.bag.accumulate / itertools.accumulate
        semantics, `initial` prepended when given).  `binop` must be
        associative — the scan runs as the classic two-phase distributed
        prefix: per-partition totals → driver exclusive carries (one tiny
        collect of npartitions values) → per-partition local scan seeded
        by its carry.  Same shape as BlockMatrix.cumsum_rows."""

        def part_total(it: Iterable[Any]):
            t, has = None, False
            for x in it:
                t = x if not has else binop(t, x)
                has = True
            yield (has, t)

        # The scan needs TWO passes over the parent (totals now, per-element
        # scan later).  Persist the parent across them (ADVICE r5): without
        # it a nondeterministic or expensive upstream would re-evaluate
        # between passes — diverging carries produce silently wrong
        # prefixes.  MEMORY_AND_DISK, not cache(): a MEMORY_ONLY partition
        # evicted under pressure would be recomputed in pass 2, which is
        # the exact divergence this guards against.  If the caller already
        # persisted at some level, honor theirs (changing levels raises).
        # The store is stashed on the RETURNED bag: call result.release()
        # once done (ADVICE r6 — mirrors BlockMatrix.release()), else it
        # lingers until LRU eviction.  NOTE: unlike the rest of the Bag
        # surface, accumulate is EAGER — the totals pass runs at call time
        # (dask defers it to compute()).
        from pyspark import StorageLevel

        parent = self._rdd
        ours = parent.getStorageLevel() == StorageLevel.NONE
        if ours:
            parent = parent.persist(StorageLevel.MEMORY_AND_DISK)
        totals = parent.mapPartitions(part_total, preservesPartitioning=True).collect()
        carries: list[tuple[bool, Any]] = []
        cur, cur_has = (initial, True) if initial is not _NO_DEFAULT else (None, False)
        for has, t in totals:
            carries.append((cur_has, cur))
            if has:
                cur = t if not cur_has else binop(cur, t)
                cur_has = True

        def scan(pid: int, it: Iterable[Any]):
            chas, c = carries[pid]
            acc, has = None, False
            for x in it:
                if not has:
                    acc = binop(c, x) if chas else x
                    has = True
                else:
                    acc = binop(acc, x)
                yield acc

        out = parent.mapPartitionsWithIndex(scan)
        if initial is not _NO_DEFAULT:
            head = parent.context.parallelize([initial], 1)
            out = head.union(out)
        result = Bag(out)
        if ours:
            result._cached_deps = [parent]
        return result

    # -- exit ramp to the declarative layer --------------------------------
    def to_dataframe(self, spark: SparkSession, schema: str) -> DataFrame:
        """Escape to DataFrames as soon as structure emerges — everything
        downstream gets Catalyst/codegen back."""
        return spark.createDataFrame(self._rdd, schema)
