"""Query/operator registry.

Every implemented operator from SURVEY.md §2 registers here as a QuerySpec:
a Spark callable `(spark, sf_dir) -> DataFrame` plus (when SQL-expressible)
the equivalent ANSI SQL the DuckDB oracle runs on the same parquet tables.
`__spark_entry__.py` exposes this registry to the driver.

Cross-engine exactness rules (SURVEY.md §7 "Exactness for t2 hashing"):
- money sums are computed in integer cents/micros (order-independent, exact
  in both engines) — see queries/helpers.py;
- double outputs that are not exact are rounded to 4 decimals on BOTH sides;
- every computed column is aliased identically on both sides;
- top-k queries carry unique-key tie-breakers so LIMIT is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""
    #: sf the oracle is valid at, or None for every sf.  Queries with
    #: sf-branching dims (la_*_ref) capture literal oracles for the
    #: sf<0.1 gate branch only — at bench sf they emit reference-dim
    #: results no literal can match, so sf-aware checkers (
    #: tools/check_correctness.py) skip the compare instead of
    #: reporting a spurious FAIL.  The driver's gate always runs at
    #: 0.01, where every oracle below is valid.
    oracle_sf: float | None = None
    #: largest sf the oracle is TRACTABLE at, or None for every sf.
    #: Transitive-closure RECURSIVE CTEs enumerate O(N·labels) rows and
    #: grind for >40 min at sf0.1 (r5 audit, re-hit r15) — the SPARK side
    #: converges at any scale; only the SQL referee is bounded.  sf-aware
    #: checkers fall back to a rows-only check above this.
    oracle_max_sf: float | None = None
    #: True for entries whose exchanges carry OPERATOR STATE (matrix
    #: blocks, factor panels) rather than table data: their width should
    #: track the cluster's core count, not the session's data-sized
    #: shuffle default.  The registry wraps these in
    #: `session.scoped_shuffle_partitions(spark, defaultParallelism)`
    #: during entry construction — eager checkpoints inside driver-loop
    #: operators sever the plan, so AQE cannot coalesce the hundreds of
    #: near-empty tasks a 200-partition default pays per step.
    state_sized: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    oracle_sf: float | None = None,
    oracle_max_sf: float | None = None,
    state_sized: bool = False,
):
    """Decorator registering a query implementation."""

    def deco(fn):
        run = fn
        if state_sized:
            import functools

            @functools.wraps(fn)
            def run(spark: SparkSession, sf_dir: str) -> DataFrame:
                from wukong_spark.session import scoped_shuffle_partitions

                with scoped_shuffle_partitions(
                    spark, spark.sparkContext.defaultParallelism
                ):
                    return fn(spark, sf_dir)

        REGISTRY[name] = QuerySpec(
            name=name,
            fn=run,
            oracle=oracle,
            headline=headline,
            doc=fn.__doc__ or "",
            oracle_sf=oracle_sf,
            oracle_max_sf=oracle_max_sf,
            state_sized=state_sized,
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: registration) and return the
    registry."""
    from wukong_spark.queries import (  # noqa: F401
        events,
        linalg_queries,
        ml_queries,
        multimodal_queries,
        pandas_surface,
        relational,
        relational2,
        relational3,
        sampling,
        taskgraph_queries,
        textops,
        vectors,
    )

    return REGISTRY
