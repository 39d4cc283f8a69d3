"""User-facing scalar functions (reference IsFiniteFunc.java:27-40) plus
the engine's own scalar kernels, all as column expressions (JVM-side,
whole-stage-codegen friendly).

`register_sql_functions(spark)` exposes the @UserFunction surface to SQL
(``SELECT algo_isFinite(x)``) — the Spark analogue of Neo4j's function
registration.  The Python UDF wrappers exist only for that SQL entry point;
DataFrame callers use the expression builders, which never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession, functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def is_finite(col) -> Column:
    """algo.isFinite (IsFiniteFunc.java:27-30): non-null, not NaN, not ±inf."""
    c = _c(col)
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def is_infinite(col) -> Column:
    """algo.isInfinite (IsFiniteFunc.java:33-36)."""
    c = _c(col)
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) == F.lit(float("inf")))


def infinity() -> Column:
    """algo.Infinity (IsFiniteFunc.java:39-40)."""
    return F.lit(float("inf"))


def combine_int_int(src, dst) -> Column:
    """Pack two 32-bit ids into one BIGINT (RawValues.combineIntInt,
    core/utils/RawValues.java:43-45): src·2^32 + dst."""
    return (_c(src).cast("long") * F.lit(2**32).cast("long")) + _c(dst).cast("long")


def combine_sorted(src, dst) -> Column:
    """Direction-agnostic edge key (RawValues.combineSorted,
    core/utils/RawValues.java:47-51): min·2^32 + max."""
    s, d = _c(src), _c(dst)
    return (F.least(s, d).cast("long") * F.lit(2**32).cast("long")) + F.greatest(
        s, d
    ).cast("long")


def register_sql_functions(spark: SparkSession) -> None:
    """Register the scalar surface for SQL callers as SQL UDFs (pure
    expressions, JVM-side / codegen-friendly — NOT per-row Python)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION algo_isFinite(x DOUBLE) "
        "RETURNS BOOLEAN RETURN x IS NOT NULL AND NOT isnan(x) "
        "AND abs(x) <> double('Infinity')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION algo_isInfinite(x DOUBLE) "
        "RETURNS BOOLEAN RETURN x IS NOT NULL AND NOT isnan(x) "
        "AND abs(x) = double('Infinity')"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION algo_Infinity() "
        "RETURNS DOUBLE RETURN double('Infinity')"
    )
