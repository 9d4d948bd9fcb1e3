"""Consolidated column-expression library (single import point).

Everything here is a *Catalyst-visible* Column expression — the design rule
from SURVEY.md §4: operators expressed as expressions (not opaque UDFs) get
predicate pushdown, codegen, and vectorization for free.  The reference has
no expression layer at all (every computation is an opaque Python callable,
`/root/reference/AWS Lambda Task Executor/TaskExecutor/function.py:3826-3847`).

Grouped by origin module; see those modules for the engine-portability
contracts (e.g. md5-derived hashes reproduce exactly in DuckDB SQL).
"""

from __future__ import annotations

# exact cross-engine arithmetic (money/rates/rounding)
from wukong_spark.queries.helpers import cents, pct_units, r4  # noqa: F401

# text: tokenization + engine-portable hashing
from wukong_spark.queries.textops import (  # noqa: F401
    ORACLE_MD5_LONG,
    ORACLE_MD5_LONG48,
    md5_long,
    md5_long48,
    tokens,
)

# vectors: JVM-side linear algebra over array<double>
from wukong_spark.queries.vectors import as_double, dot, norm  # noqa: F401

__all__ = [
    "cents",
    "pct_units",
    "r4",
    "tokens",
    "md5_long",
    "md5_long48",
    "ORACLE_MD5_LONG",
    "ORACLE_MD5_LONG48",
    "dot",
    "norm",
    "as_double",
]
