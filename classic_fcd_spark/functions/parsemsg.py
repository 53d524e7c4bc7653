"""Human-readable msg parsing + display mappings — F18/F20/U3 (SURVEY §2.8).

- F18 parse_msg: per-msg-type {tag, text} strings
  (src/service/transaction/parseMsg.ts:11-286) as a when-chain over the
  typed msg struct; amounts are emitted in micro units (the reference's
  format.amount/1e6 display division is a UI concern — documented
  deviation, keeps the expression engine-portable).
- U3 to_failure_message: the reference runs a compromise-NLP
  past-tense->infinitive pass (src/service/transaction/helper.ts:36-46);
  the verbs it can ever see are the finite set its own parsers emit
  (helper.spec.ts:3-35), so a literal lookup replaces the NLP library —
  same outputs on every spec fixture, no Python UDF.
- F20 proposal_status_display / proposal_type_display: literal maps
  (src/service/governance/helper/proposalBasic.ts:14-36).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# U3 — past-tense verb -> infinitive, exactly the verbs parseMsg emits
# (helper.spec.ts fixture list) + the reference's own exceptional map
# ('deposite' -> 'deposit', helper.ts:32-34).
VERB_INFINITIVES = {
    "Sent": "send",
    "Received": "receive",
    "Requested": "request",
    "Set": "set",
    "Withdraw": "withdraw",
    "Withdrew": "withdraw",
    "Created": "create",
    "Edited": "edit",
    "Delegated": "delegate",
    "Redelegated": "redelegate",
    "Prevoted": "prevote",
    "Voted": "vote",
    "Swapped": "swap",
    "Deposited": "deposit",
    "Stored": "store",
    "Instantiated": "instantiate",
    "Executed": "execute",
    "Migrated": "migrate",
    "Changed": "change",
}


def to_failure_message(text: Column | str) -> Column:
    """First word -> infinitive (lookup), rest unchanged — the U3 helper
    without the NLP dependency.  Unknown first words pass through
    lower-cased, matching compromise's behavior on non-verbs closely
    enough for the emitted set (exact on every reference spec case)."""
    c = F.col(text) if isinstance(text, str) else text
    first = F.substring_index(c, " ", 1)
    # everything from the first space (inclusive) to the end
    rest = F.when(
        F.instr(c, " ") > 0, c.substr(F.instr(c, " "), F.length(c))
    ).otherwise(F.lit(""))
    verb = F.lower(first)
    for past, inf in VERB_INFINITIVES.items():
        verb = F.when(first == past, F.lit(inf)).otherwise(verb)
    return F.concat(verb, rest)


# ---------------------------------------------------------------------------
# F18 — per-msg-type {tag, text}.
# ---------------------------------------------------------------------------
def parse_msg(msg: Column, address: Column | None = None, code: Column | None = None) -> Column:
    """struct(tag, text) for the common msg families; `address` drives the
    Send/Receive direction (parseMsg.ts:12-29), `code` non-null prefixes
    'Failed to ' + infinitive text (parseMsg.ts:280-283)."""
    typ = msg["type"]
    v = lambda p: F.get_json_object(msg["value"], p)  # noqa: E731

    is_sent = (
        (v("$.from_address") == address) if address is not None else F.lit(True)
    )
    send = F.struct(
        F.when(is_sent, F.lit("Send")).otherwise(F.lit("Receive")).alias("tag"),
        F.concat(
            F.when(is_sent, F.lit("Sent ")).otherwise(F.lit("Received ")),
            v("$.amount[0].amount"),
            F.lit(" "),
            v("$.amount[0].denom"),
            F.when(is_sent, F.lit(" to ")).otherwise(F.lit(" from ")),
            F.when(is_sent, v("$.to_address")).otherwise(v("$.from_address")),
        ).alias("text"),
    )
    multisend = F.struct(
        F.lit("Multisend").alias("tag"),
        F.concat(
            F.lit("Sent multiSend message with "),
            F.size(F.from_json(v("$.inputs"), "array<string>")).cast("string"),
            F.lit(" inputs"),
        ).alias("text"),
    )
    delegate = F.struct(
        F.lit("Staking").alias("tag"),
        F.concat(
            F.lit("Delegated "),
            v("$.amount.amount"),
            F.lit(" "),
            v("$.amount.denom"),
            F.lit(" to "),
            v("$.validator_address"),
        ).alias("text"),
    )
    swap = F.struct(
        F.lit("Swap").alias("tag"),
        F.concat(
            F.lit("Swapped "),
            v("$.offer_coin.amount"),
            F.lit(" "),
            v("$.offer_coin.denom"),
            F.lit(" for "),
            v("$.ask_denom"),
        ).alias("text"),
    )
    unjail = F.struct(
        F.lit("Slashing").alias("tag"),
        F.concat(F.lit("Requested unjail for "), v("$.address")).alias("text"),
    )
    fallback = F.struct(
        F.lit("Other").alias("tag"),
        F.concat(F.lit("Message type "), typ).alias("text"),
    )
    parsed = (
        F.when(typ.isin("bank/MsgSend", "pay/MsgSend"), send)
        .when(typ.isin("bank/MsgMultiSend", "pay/MsgMultiSend"), multisend)
        .when(typ == "staking/MsgDelegate", delegate)
        .when(typ == "market/MsgSwap", swap)
        .when(typ == "slashing/MsgUnjail", unjail)
        .otherwise(fallback)
    )
    if code is None:
        return parsed
    failed_text = F.concat(F.lit("Failed to "), to_failure_message(parsed["text"]))
    return F.when(
        code.isNotNull(),
        F.struct(parsed["tag"].alias("tag"), failed_text.alias("text")),
    ).otherwise(parsed)


# ---------------------------------------------------------------------------
# F20 — proposal display mappings (proposalBasic.ts:14-36).
# ---------------------------------------------------------------------------
PROPOSAL_STATUS_DISPLAY = {
    "VotingPeriod": "Voting",
    "DepositPeriod": "Deposit",
}

PROPOSAL_TYPE_DISPLAY = {
    "gov/TextProposal": "Text Proposal",
    "treasury/TaxRateUpdateProposal": "Tax-rate Update",
    "treasury/RewardWeightUpdateProposal": "Reward-weight Update",
    "distribution/CommunityPoolSpendProposal": "Community-pool Spend",
    "params/ParameterChangeProposal": "Parameter-change",
}


def proposal_status_display(status: Column | str) -> Column:
    c = F.col(status) if isinstance(status, str) else status
    out = c
    for k, disp in PROPOSAL_STATUS_DISPLAY.items():
        out = F.when(c == k, F.lit(disp)).otherwise(out)
    return out


def proposal_type_display(ptype: Column | str) -> Column:
    c = F.col(ptype) if isinstance(ptype, str) else ptype
    out = c  # unknown types pass through (|| proposalType fallback)
    for k, disp in PROPOSAL_TYPE_DISPLAY.items():
        out = F.when(c == k, F.lit(disp)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# F18 cross-engine oracle (r8): the DuckDB twin of parse_msg +
# to_failure_message, so the parser's gate is engine-equivalence over a
# case table (tests/test_parsemsg.py::TestParseMsgDuckOracle) on top of
# the 22 reference spec cases — the same upgrade the F1/F14 scalars got.
# ---------------------------------------------------------------------------
def duck_parse_msg_sql(table: str = "msgs") -> str:
    """SELECT (id, tag, text) from `table`(id, t, v, code): the same
    when-chain, JSON paths, literal fragments, and failed-msg verb
    rewrite as parse_msg/to_failure_message, in DuckDB SQL.  NULL
    propagation matches (both engines null the whole concat on a missing
    JSON path)."""

    def js(p: str) -> str:
        return f"json_extract_string(v, '{p}')"

    is_sent = f"({js('$.from_address')} = addr OR addr IS NULL)"
    send_text = (
        f"CASE WHEN {is_sent} THEN 'Sent ' || {js('$.amount[0].amount')}"
        f" || ' ' || {js('$.amount[0].denom')} || ' to ' || {js('$.to_address')}"
        f" ELSE 'Received ' || {js('$.amount[0].amount')}"
        f" || ' ' || {js('$.amount[0].denom')} || ' from ' || {js('$.from_address')} END"
    )
    send_tag = f"CASE WHEN {is_sent} THEN 'Send' ELSE 'Receive' END"
    multisend_text = (
        "'Sent multiSend message with ' || "
        "CAST(json_array_length(v, '$.inputs') AS VARCHAR) || ' inputs'"
    )
    delegate_text = (
        f"'Delegated ' || {js('$.amount.amount')} || ' ' || {js('$.amount.denom')}"
        f" || ' to ' || {js('$.validator_address')}"
    )
    swap_text = (
        f"'Swapped ' || {js('$.offer_coin.amount')} || ' ' || {js('$.offer_coin.denom')}"
        f" || ' for ' || {js('$.ask_denom')}"
    )
    unjail_text = f"'Requested unjail for ' || {js('$.address')}"
    tag = f"""CASE
        WHEN t IN ('bank/MsgSend', 'pay/MsgSend') THEN {send_tag}
        WHEN t IN ('bank/MsgMultiSend', 'pay/MsgMultiSend') THEN 'Multisend'
        WHEN t = 'staking/MsgDelegate' THEN 'Staking'
        WHEN t = 'market/MsgSwap' THEN 'Swap'
        WHEN t = 'slashing/MsgUnjail' THEN 'Slashing'
        ELSE 'Other' END"""
    text = f"""CASE
        WHEN t IN ('bank/MsgSend', 'pay/MsgSend') THEN {send_text}
        WHEN t IN ('bank/MsgMultiSend', 'pay/MsgMultiSend') THEN {multisend_text}
        WHEN t = 'staking/MsgDelegate' THEN {delegate_text}
        WHEN t = 'market/MsgSwap' THEN {swap_text}
        WHEN t = 'slashing/MsgUnjail' THEN {unjail_text}
        ELSE 'Message type ' || t END"""
    verb_map = " ".join(
        f"WHEN '{past}' THEN '{inf}'" for past, inf in VERB_INFINITIVES.items()
    )
    infinitive = (
        f"(CASE split_part(text, ' ', 1) {verb_map} "
        "ELSE lower(split_part(text, ' ', 1)) END || "
        "CASE WHEN strpos(text, ' ') > 0 "
        "THEN substr(text, strpos(text, ' ')) ELSE '' END)"
    )
    return f"""
    WITH parsed AS (
        SELECT id, code, {tag} AS tag, {text} AS text FROM {table}
    )
    SELECT id, tag,
           CASE WHEN code IS NOT NULL THEN 'Failed to ' || {infinitive}
                ELSE text END AS text
    FROM parsed
    """
