"""merge_asof — the as-of join as a reusable operator (r14).

Reference parity: dask.dataframe users run ``pd.merge_asof`` /
``dd.merge_asof`` for event-to-quote alignment, attribution, and sensor
fusion; the reference executes those as opaque dask graphs
(`/root/reference/Static Scheduler/wukong/tests/test_collections.py` —
dask.dataframe ops are first-class workloads).  The query registry uses
the shape inline (`asof_join_last_click`, `asof_join_nearest`); this
module is the library form a user migrating from pandas/dask calls
directly.

Spark-first formulation — the UNION-MERGE, not a range join:

1. tag left probe rows and right reference rows, union them on a shared
   schema (the right payload packed into ONE struct column);
2. one shuffle on the `by` key; within each key a running
   ``last(payload, ignorenulls)`` over (on, tag, payload) gives every
   left row its backward match in a single sorted pass — O(n log n) per
   key, while a range join is O(left × right) per key with a candidate
   blowup;
3. `forward` flips the frame (first over CURRENT..UNBOUNDED FOLLOWING);
   `nearest` computes both in the SAME pass and picks the closer
   (ties → backward, the pandas convention);
4. `tolerance` filters matches whose |on − matched_on| exceeds it;
   unmatched left rows keep NULL right columns (left join semantics).

Determinism with duplicate right `on` values: pandas resolves by input
POSITION (meaningless for a distributed frame), so the merge order here
includes the packed right payload struct as the final sort key — equal
timestamps resolve to the lexicographically LARGEST payload for
backward/last and SMALLEST for forward/first, a stable, rerun-safe
total order (pass a unique column in the right frame to make it a real
key).

100 TB shape: one exchange on `by` shared by both inputs; per-key state
is the sort — no broadcast, no per-row range probe.  Without `by` the
merge would be a global sort (the 1pw class) — this operator REQUIRES a
`by` key and raises otherwise; a truly keyless as-of at scale should
range-partition on `on` first (operators/setindex.set_index) and run
per-partition with boundary exchange, which is a different operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _q(name: str) -> str:
    """Backtick-quote a column name so dots/spaces/dashes survive
    `F.col` parsing (embedded backticks doubled, the Spark escape)."""
    return "`" + name.replace("`", "``") + "`"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str],
    direction: str = "backward",
    tolerance: Column | int | float | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """pandas.merge_asof for Spark DataFrames (keyed, union-merge plan).

    Returns every `left` row plus the matched right row's columns, each
    renamed ``{right_prefix}{col}`` (the match's `on` value appears as
    ``{right_prefix}{on}``); NULLs where no match exists within
    `direction`/`tolerance`.  `on` must be an orderable column present
    in both frames; `by` is one or more equality keys (required — see
    module docstring).  `direction`: 'backward' (largest right.on ≤
    left.on), 'forward' (smallest right.on ≥ left.on), or 'nearest'
    (closer of the two; ties → backward).  `tolerance` bounds
    |left.on − right.on| (pass a Column for interval types, e.g.
    ``F.expr("INTERVAL 30 MINUTES")`` — comparison is
    ``abs_diff <= tolerance`` with timestamps compared via their
    difference when numeric subtraction applies).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by)
    if not by_cols:
        raise ValueError(
            "merge_asof requires a `by` key: a keyless as-of is a global "
            "sort at scale — range-partition on `on` (set_index) instead"
        )
    for c in (on, *by_cols):
        if c not in left.columns or c not in right.columns:
            raise ValueError(f"column {c!r} missing from left or right")

    r_payload_cols = [c for c in right.columns if c not in by_cols]
    clash = [
        c for c in left.columns
        if c in {f"{right_prefix}{rc}" for rc in r_payload_cols}
    ]
    if clash:
        raise ValueError(
            f"left column(s) {clash} collide with prefixed right output "
            f"columns; pass a different right_prefix"
        )
    # right rows: payload packed into one struct (sortable tie-break +
    # single ignorenulls target); left rows carry NULL payload
    r_tagged = right.select(
        *[F.col(_q(c)) for c in by_cols],
        F.col(_q(on)).alias("__on"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(_q(c)) for c in r_payload_cols]).alias("__pay"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    # NULL struct literal needs the right type: pass the DataType object
    # directly — a simpleString() round-trip breaks on right column
    # names needing backtick quoting (spaces/dashes/dots) (ADVICE r14)
    pay_type = r_tagged.schema["__pay"].dataType
    l_tagged = left.select(
        *[F.col(_q(c)) for c in by_cols],
        F.col(_q(on)).alias("__on"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(pay_type).alias("__pay"),
        *[F.col(_q(c)).alias(f"__l_{c}") for c in left.columns],
    )
    u = r_tagged.unionByName(l_tagged)

    # backward: right rows sort BEFORE the left row at equal __on
    # (inclusive match), larger payload wins ties → last()
    w_back = (
        Window.partitionBy(*[F.col(_q(c)) for c in by_cols])
        .orderBy(F.col("__on"), F.col("__is_left"), F.col("__pay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: left rows sort BEFORE right rows at equal __on is WRONG —
    # inclusive forward wants equal-ts right rows at-or-after the left
    # row; with right tagged 0 they sort before, so flip the tag order
    # and take first() over the forward frame ordered the same way
    w_fwd = (
        Window.partitionBy(*[F.col(_q(c)) for c in by_cols])
        .orderBy(F.col("__on"), -F.col("__is_left"), F.col("__pay"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    out = u
    want_back = direction in ("backward", "nearest")
    want_fwd = direction in ("forward", "nearest")
    if want_back:
        # ignorenulls applies to the WRAPPED value: a left row
        # contributes NULL, a right row its (on, payload) struct
        out = out.withColumn(
            "__back",
            F.last(
                F.when(
                    F.col("__is_left") == 0,
                    F.struct(F.col("__on").alias("o"), F.col("__pay").alias("p")),
                ),
                ignorenulls=True,
            ).over(w_back),
        )
    if want_fwd:
        out = out.withColumn(
            "__fwd",
            F.first(
                F.when(
                    F.col("__is_left") == 0,
                    F.struct(F.col("__on").alias("o"), F.col("__pay").alias("p")),
                ),
                ignorenulls=True,
            ).over(w_fwd),
        )

    out = out.filter(F.col("__is_left") == 1)

    if direction == "backward":
        match = F.col("__back")
    elif direction == "forward":
        match = F.col("__fwd")
    else:
        bd = F.col("__on") - F.col("__back.o")
        fd = F.col("__fwd.o") - F.col("__on")
        match = (
            F.when(F.col("__back").isNull(), F.col("__fwd"))
            .when(F.col("__fwd").isNull(), F.col("__back"))
            # ties → backward (pandas convention)
            .when(bd <= fd, F.col("__back"))
            .otherwise(F.col("__fwd"))
        )
    out = out.withColumn("__m", match)
    if tolerance is not None:
        tol = tolerance if isinstance(tolerance, Column) else F.lit(tolerance)
        diff = F.when(
            F.col("__m.o") <= F.col("__on"), F.col("__on") - F.col("__m.o")
        ).otherwise(F.col("__m.o") - F.col("__on"))
        out = out.withColumn(
            "__m", F.when(diff <= tol, F.col("__m"))
        )

    return out.select(
        *[F.col(_q(f"__l_{c}")).alias(c) for c in left.columns],
        F.col("__m.o").alias(f"{right_prefix}{on}"),
        *[
            F.col("__m").getField("p").getField(c).alias(f"{right_prefix}{c}")
            for c in r_payload_cols
            if c != on
        ],
    )
