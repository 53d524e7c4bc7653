"""Decimal arithmetic with the reference's exact null/zero semantics.

The reference does all money math in BigNumber over strings
(src/lib/math.ts:3-43) with these quirks, replicated here as Column
expressions (no UDF — SURVEY §2.10 item 4):

- every operand is null-coerced to 0 before +, -, × (``plus(null, 2) = 2``);
- ``div(x, d)`` uses divisor 1 when ``d`` is null/absent (math.ts:8-9:
  ``div = (a, b) => bn(a).div(b ?? 1)``), and null x coerces to 0;
- ``getIntegerPortion`` truncates toward zero (BigNumber ROUND_DOWN).

Policy (SURVEY §1.3): DecimalType(38,10) instead of the reference's
Postgres decimal(40,10) — 28 integer digits still exceed any real chain
supply by ~10 orders of magnitude.  Strings only at the serialization edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DECIMAL_T = "decimal(38,10)"


def _c(x) -> Column:
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def dec(x) -> Column:
    """Cast to the engine's money type decimal(38,10)."""
    return _c(x).cast(DECIMAL_T)


def _z(x) -> Column:
    """Null → 0 coercion (math.ts bn() treats undefined as NaN; callers
    pre-coalesce with `|| 0` — net behavior is null-as-zero)."""
    return F.coalesce(dec(x), F.lit(0).cast(DECIMAL_T))


def plus(a, b) -> Column:
    return _z(a) + _z(b)


def minus(a, b) -> Column:
    return _z(a) - _z(b)


def times(a, b) -> Column:
    return _z(a) * _z(b)


def div(a, b) -> Column:
    """a / b with divisor defaulting to 1 when null (math.ts:8-9).

    Divisor 0: the reference's BigNumber yields Infinity, which
    decimal(38,10) cannot represent; try_divide maps it to NULL instead
    of aborting the job under the session's ANSI default (the r2 advice
    audit: every decimal division must be zero-divisor-safe).  Callers
    that need the reference's `isFinite` guard can test for NULL."""
    return F.try_divide(_z(a), F.coalesce(dec(b), F.lit(1).cast(DECIMAL_T)))


def get_integer_portion(x) -> Column:
    """Truncate-toward-zero integer part as decimal (math.ts:43)."""
    d = dec(x)
    return F.when(d < 0, F.ceil(d).cast(DECIMAL_T)).otherwise(
        F.floor(d).cast(DECIMAL_T)
    )
