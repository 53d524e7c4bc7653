"""Scalar function library — SURVEY.md §2.8 (F1-F20) and §2.10 UDFs.

Everything that can be a built-in Column expression is one (JVM-side,
codegen-friendly); only the bech32 address algebra is a Python UDF, as in
the plan (§2.10 — the reference's only genuinely non-relational scalar
logic, src/lib/common.ts:73-93).
"""

from classic_fcd_spark.functions.math import (  # noqa: F401
    dec,
    div,
    get_integer_portion,
    minus,
    plus,
    times,
)
from classic_fcd_spark.functions.common import (  # noqa: F401
    denom_to_currency,
    extract_addresses,
    split_denom_and_amount,
)
