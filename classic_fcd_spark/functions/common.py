"""String/denom/address helpers — SURVEY §2.8 F3-F6.

All JVM-side Column expressions; address *extraction* stays native
(regexp_extract_all over the serialized payload, exactly as exhaustive as
the reference's recursive JSON walk at src/collector/block/accountTx.ts:5-43).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference: src/lib/common.ts:109-114 — "123.45ukrw" → (amount, denom).
_AMOUNT_DENOM_RE = r"^([0-9.]+)([a-z][a-z0-9/]*)$"

# Reference: src/collector/block/accountTx.ts:5-9 and watcher.ts:19-20.
# bech32 payloads are 38 chars for accounts/operators (20-byte data).
ACCOUNT_RE = r"terra1[a-z0-9]{38}"
VALOPER_RE = r"terravaloper1[a-z0-9]{38}"

# Reference: src/lib/common.ts:24-66 — denom ↔ display currency.
DENOM_CURRENCY = {
    "uluna": "Luna",
    "ukrw": "KRT",
    "uusd": "UST",
    "usdr": "SDT",
    "umnt": "MNT",
    "ueur": "EUT",
    "ucny": "CNT",
    "ujpy": "JPT",
    "ugbp": "GBT",
}

# Canonical ordering uluna, ukrw, usdr, uusd, rest alphabetical
# (src/lib/common.ts:99-107).
DENOM_ORDER = ["uluna", "ukrw", "usdr", "uusd"]


def split_denom_and_amount(coin: Column | str) -> Column:
    """struct(amount decimal, denom string) from '123.45ukrw'.

    Malformed input yields (0, '') like the reference's regex-miss path.
    """
    c = F.col(coin) if isinstance(coin, str) else coin
    amount = F.regexp_extract(c, _AMOUNT_DENOM_RE, 1)
    denom = F.regexp_extract(c, _AMOUNT_DENOM_RE, 2)
    return F.struct(
        F.coalesce(
            F.when(amount != "", amount).cast("decimal(38,10)"),
            F.lit(0).cast("decimal(38,10)"),
        ).alias("amount"),
        denom.alias("denom"),
    )


def extract_addresses(payload: Column | str) -> Column:
    """All distinct terra account/operator addresses anywhere in a string
    payload (serialize structs with to_json first).  Matches the
    reference's exhaustive recursive walk because the serialized JSON
    contains every nested value the walk would visit."""
    c = F.col(payload) if isinstance(payload, str) else payload
    return F.array_distinct(
        F.concat(
            F.regexp_extract_all(c, F.lit(f"({VALOPER_RE})"), 1),
            # negative lookahead-free: terra1 addresses that are not a
            # terravaloper suffix match; regexp_extract_all on the raw
            # pattern also matches inside 'terravaloper1...'? No — the
            # valoper pattern starts 'terravaloper1', whose substring
            # 'terra1' never occurs ('terravaloper1' contains 'terra' then
            # 'valoper1'), so the two patterns are disjoint.
            F.regexp_extract_all(c, F.lit(f"({ACCOUNT_RE})"), 1),
        )
    )


def denom_to_currency(denom: Column | str) -> Column:
    """Display-currency lookup with passthrough for unknown denoms
    (src/lib/common.ts:24-66)."""
    c = F.col(denom) if isinstance(denom, str) else denom
    mapping = F.create_map(*[F.lit(x) for kv in DENOM_CURRENCY.items() for x in kv])
    return F.coalesce(mapping[c], c)


def denom_sort_key(denom: Column | str) -> Column:
    """Sort key for the canonical denom ordering (common.ts:99-107):
    fixed head order, then alphabetical."""
    c = F.col(denom) if isinstance(denom, str) else denom
    expr = F.when(c == DENOM_ORDER[0], F.lit("0"))
    for i, d in enumerate(DENOM_ORDER[1:], start=1):
        expr = expr.when(c == d, F.lit(str(i)))
    return F.concat(expr.otherwise(F.lit("9")), c)
