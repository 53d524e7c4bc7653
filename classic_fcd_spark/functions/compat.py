"""Chain-version compatibility scalars — F14/F15/F16/F17 (SURVEY §2.8).

The Terra chain changed message type names, account JSON shapes, and
vesting schedule encodings across columbus-1..5; the reference patches
all of this in app code.  Here each becomes a Column function:

- F14 sync_msg_type: columbus-1 -> columbus-2 msg-type renames applied
  to the serialized tx (src/collector/block/tx.ts:141-158 syncMsgType).
- F15 scrub_null_bytes: strip the three \\u0000 escape variants that
  break JSONB ingestion (tx.ts:170-172).
- F16 normalize_account: six account shapes -> one struct
  (src/service/bank/getBalance/normalizeAccount.ts:19-128).
- F17 vesting math: freedRate clamp + vesting balances
  (src/service/bank/getBalance/calculate.ts:36-101, getVesting.ts:4-39).

All pure Column algebra (when-chains, get_json_object, aggregate HOFs);
no UDFs, so everything stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F14 — msg-type renames (tx.ts:141-158).  Applied to the SERIALIZED tx
# like the reference (covers types nested anywhere in the payload).
# ---------------------------------------------------------------------------
MSG_TYPE_RENAMES = [
    ("cosmos-sdk/MsgSend", "pay/MsgSend"),
    ("cosmos-sdk/MsgMultiSend", "pay/MsgMultiSend"),
    ("cosmos-sdk/MsgCreateValidator", "staking/MsgCreateValidator"),
    ("cosmos-sdk/MsgEditValidator", "staking/MsgEditValidator"),
    ("cosmos-sdk/MsgDelegate", "staking/MsgDelegate"),
    ("cosmos-sdk/MsgUndelegate", "staking/MsgUndelegate"),
    ("cosmos-sdk/MsgBeginRedelegate", "staking/MsgBeginRedelegate"),
    (
        "cosmos-sdk/MsgWithdrawDelegationReward",
        "distribution/MsgWithdrawDelegationReward",
    ),
    (
        "cosmos-sdk/MsgWithdrawValidatorCommission",
        "distribution/MsgWithdrawValidatorCommission",
    ),
    ("cosmos-sdk/MsgModifyWithdrawAddress", "distribution/MsgModifyWithdrawAddress"),
    ("cosmos-sdk/MsgUnjail", "slashing/MsgUnjail"),
]

# Longest-first so MsgSend never clobbers MsgMultiSend's prefix mid-chain
# (the reference's regex order has the same property: distinct literals).
_ORDERED_RENAMES = sorted(MSG_TYPE_RENAMES, key=lambda p: -len(p[0]))


def sync_msg_type(serialized_tx: Column | str) -> Column:
    """Chained literal replacement over the serialized tx string.  Only
    applied when chain_id == 'columbus-1' by callers (tx.ts:178-180)."""
    c = F.col(serialized_tx) if isinstance(serialized_tx, str) else serialized_tx
    for old, new in _ORDERED_RENAMES:
        c = F.replace(c, F.lit(old), F.lit(new))
    return c


# ---------------------------------------------------------------------------
# F15 — null-byte scrub (tx.ts:170-172): the reference strips the
# double-escaped, escaped, and raw NUL forms before JSON ingestion.
# ---------------------------------------------------------------------------
def scrub_null_bytes(raw: Column | str) -> Column:
    c = F.col(raw) if isinstance(raw, str) else raw
    # the reference's tx.ts:172 regex strips the 4-backslash, 2-backslash
    # and 1-backslash textual forms; longest-first so each erases as a
    # unit (a shorter match inside the 4-backslash form would leave '\\'
    # residue).  The raw-NUL strip is a deliberate extension beyond the
    # reference: parquet/UTF-8 sinks reject embedded NULs just like
    # postgres JSONB rejects the textual forms.
    c = F.replace(c, F.lit("\\\\\\\\u0000"), F.lit(""))
    c = F.replace(c, F.lit("\\\\u0000"), F.lit(""))
    c = F.replace(c, F.lit("\\u0000"), F.lit(""))
    c = F.replace(c, F.lit("\x00"), F.lit(""))
    return c


# ---------------------------------------------------------------------------
# F16 — account-shape normalization (normalizeAccount.ts:19-128).
# Input: the raw LCD account JSON string.  Output: one struct with the
# unified fields; unknown types yield NULL address (the reference throws
# — callers can filter address IS NULL to fail loudly).
# ---------------------------------------------------------------------------
_SCHEDULE_DDL = "array<struct<start_time:string, end_time:string, ratio:string>>"
_VESTING_DENOM_DDL = f"array<struct<denom:string, schedules:{_SCHEDULE_DDL}>>"
_OLD_SCHEDULE_DDL = "array<struct<cliff:string, ratio:string>>"
_OLD_VESTING_DDL = f"array<struct<denom:string, schedules:{_OLD_SCHEDULE_DDL}>>"
_COINS_DDL = "array<struct<denom:string, amount:string>>"

COLUMBUS1_GENESIS_MS = "1556085600000"


def _converted_col1_schedules(path_col: Column) -> Column:
    """columbus-1 GradedVestingAccount schedules carry only (cliff, ratio);
    the reference converts them to (start, end, ratio) windows where each
    window starts at the previous cliff (genesis for the first) —
    normalizeAccount.ts:25-41.  An aggregate HOF threads the running
    start time through the array exactly like the JS loop."""
    old = F.from_json(path_col, _OLD_VESTING_DDL)
    return F.transform(
        old,
        lambda vs: F.struct(
            vs["denom"].alias("denom"),
            F.aggregate(
                vs["schedules"],
                F.struct(
                    F.lit(COLUMBUS1_GENESIS_MS).alias("start"),
                    F.array().cast(_SCHEDULE_DDL).alias("out"),
                ),
                lambda acc, s: F.struct(
                    (s["cliff"].cast("long") * 1000).cast("string").alias("start"),
                    F.concat(
                        acc["out"],
                        F.array(
                            F.struct(
                                acc["start"].alias("start_time"),
                                (s["cliff"].cast("long") * 1000)
                                .cast("string")
                                .alias("end_time"),
                                s["ratio"].alias("ratio"),
                            )
                        ),
                    ).alias("out"),
                ),
                lambda acc: acc["out"],
            ).alias("schedules"),
        ),
    )


def _schedules_to_ms(parsed: Column) -> Column:
    """Scale second-valued LCD schedule start/end to milliseconds.

    The reference's convertSchedules (calculate.ts:27-29) multiplies
    schedule times by 1000 before comparing with latestBlockTimestamp
    (ms).  columbus-3/4/5 LCD payloads carry seconds; columbus-1
    schedules are converted to ms during window conversion
    (_converted_col1_schedules).  Normalizing here means every account
    shape hands freed_rate one unit: milliseconds."""
    return F.transform(
        parsed,
        lambda vs: F.struct(
            vs["denom"].alias("denom"),
            F.transform(
                vs["schedules"],
                lambda s: F.struct(
                    (s["start_time"].cast("long") * 1000).cast("string").alias("start_time"),
                    (s["end_time"].cast("long") * 1000).cast("string").alias("end_time"),
                    s["ratio"].alias("ratio"),
                ),
            ).alias("schedules"),
        ),
    )


def normalize_account(raw: Column | str) -> Column:
    """Six LCD account variants -> struct(address, coins,
    original_vesting, delegated_free, delegated_vesting,
    vesting_schedules, name, permissions).  vesting_schedules times are
    always milliseconds (see _schedules_to_ms)."""
    c = F.col(raw) if isinstance(raw, str) else raw
    typ = F.get_json_object(c, "$.type")
    j = lambda p: F.get_json_object(c, p)  # noqa: E731

    _null_s = F.lit(None).cast("string")

    def unified(base_path, ov=None, df_=None, dv=None, vs=None, vs_old=False, name=None, perms=None):
        return F.struct(
            F.get_json_object(c, f"{base_path}.address").alias("address"),
            F.from_json(
                F.coalesce(j(f"{base_path}.coins"), j("$.value.coins")), _COINS_DDL
            ).alias("coins"),
            F.from_json(j(ov) if ov else _null_s, _COINS_DDL).alias("original_vesting"),
            F.from_json(j(df_) if df_ else _null_s, _COINS_DDL).alias("delegated_free"),
            F.from_json(j(dv) if dv else _null_s, _COINS_DDL).alias("delegated_vesting"),
            (
                _converted_col1_schedules(j(vs))
                if vs_old
                else _schedules_to_ms(
                    F.from_json(j(vs) if vs else _null_s, _VESTING_DENOM_DDL)
                )
            ).alias("vesting_schedules"),
            (j(name) if name else _null_s).alias("name"),
            F.from_json(j(perms) if perms else _null_s, "array<string>").alias(
                "permissions"
            ),
        )

    base = unified("$.value")
    # columbus-1 GradedVestingAccount: BaseVestingAccount wrapper + cliff
    # schedules needing window conversion
    vesting_col1 = unified(
        "$.value.BaseVestingAccount.BaseAccount",
        ov="$.value.BaseVestingAccount.original_vesting",
        df_="$.value.BaseVestingAccount.delegated_free",
        dv="$.value.BaseVestingAccount.delegated_vesting",
        vs="$.value.vesting_schedules",
        vs_old=True,
    )
    # columbus-5 LazyGraded: base_vesting_account nesting
    lazy_col5 = unified(
        "$.value.base_vesting_account.base_account",
        ov="$.value.base_vesting_account.original_vesting",
        df_="$.value.base_vesting_account.delegated_free",
        dv="$.value.base_vesting_account.delegated_vesting",
        vs="$.value.vesting_schedules",
    )
    # columbus-4 LazyGraded: flat value
    lazy_col4 = unified(
        "$.value",
        ov="$.value.original_vesting",
        df_="$.value.delegated_free",
        dv="$.value.delegated_vesting",
        vs="$.value.vesting_schedules",
    )
    # columbus-3 LazyGraded: BaseVestingAccount wrapper, already-windowed
    lazy_col3 = unified(
        "$.value.BaseVestingAccount.BaseAccount",
        ov="$.value.BaseVestingAccount.original_vesting",
        df_="$.value.BaseVestingAccount.delegated_free",
        dv="$.value.BaseVestingAccount.delegated_vesting",
        vs="$.value.vesting_schedules",
    )
    module_col3 = unified(
        "$.value.BaseAccount", name="$.value.name", perms="$.value.permissions"
    )
    module_col4 = unified("$.value", name="$.value.name", perms="$.value.permissions")

    lazy = (
        F.when(j("$.value.base_vesting_account").isNotNull(), lazy_col5)
        .when(j("$.value.address").isNotNull(), lazy_col4)
        .otherwise(lazy_col3)
    )
    module = F.when(j("$.value.BaseAccount").isNotNull(), module_col3).otherwise(
        module_col4
    )
    return (
        F.when(typ == "core/GradedVestingAccount", vesting_col1)
        .when(typ == "core/LazyGradedVestingAccount", lazy)
        .when(typ.isin("core/ModuleAccount", "supply/ModuleAccount"), module)
        .when(typ.isin("auth/Account", "core/Account"), base)
        .otherwise(F.lit(None))
    )


# ---------------------------------------------------------------------------
# F17 — vesting math (calculate.ts:36-101).
# ---------------------------------------------------------------------------
def freed_rate(schedules: Column, now_ms: Column | int) -> Column:
    """Σ over schedule windows of ratio × clamp((min(end, now) − start)
    / (end − start)); windows whose rate ≤ 0 contribute nothing
    (calculate.ts:50-54 reduceFreedRate).  Double math mirrors the
    reference's BigNumber-on-float behavior for these small ratios.

    Schedule times must be MILLISECONDS (normalize_account guarantees
    it) so the comparison with now_ms is unit-consistent.  try_divide
    keeps a zero-length window from aborting the job under ANSI mode
    (session default): the reference's BigNumber div yields NaN/Inf
    there and its `rate > 0` guard drops it — NULL > 0 is equally
    false, so the semantics match."""
    now = F.lit(now_ms).cast("double") if isinstance(now_ms, int) else now_ms.cast("double")

    def _contrib(s):
        rate = F.try_divide(
            F.least(s["end_time"].cast("double"), now) - s["start_time"].cast("double"),
            s["end_time"].cast("double") - s["start_time"].cast("double"),
        )
        # the reference adds ratio*rate only when rate > 0 and does NOT
        # clamp at 1 (min(end, now) already bounds it)
        return F.when(rate > 0, rate * s["ratio"].cast("double")).otherwise(F.lit(0.0))

    return F.aggregate(schedules, F.lit(0.0), lambda acc, s: acc + _contrib(s))


def vesting_balance(
    amount: Column,
    original_vesting: Column,
    delegated_vesting: Column,
    rate: Column,
    is_vested_denom: Column,
) -> Column:
    """struct(available, freed_vesting, remaining_vesting, vesting) per
    calculate.ts:70-92: freed = original × rate; vesting = original −
    freed (vested denoms only); available = min(amount, amount +
    delegated_vesting − vesting)."""
    freed = original_vesting * rate
    vesting = F.when(is_vested_denom, original_vesting - freed).otherwise(F.lit(0.0))
    available = F.least(amount, amount + delegated_vesting - vesting)
    return F.struct(
        available.alias("available"),
        freed.alias("freed_vesting"),
        (original_vesting - freed).alias("remaining_vesting"),
        vesting.alias("vesting"),
    )
