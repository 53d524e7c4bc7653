"""F18/F20/U3 tests — the U3 cases are the reference's own spec fixtures
(src/service/transaction/helper.spec.ts:3-35)."""

from __future__ import annotations

from pyspark.sql import functions as F

from classic_fcd_spark.functions.parsemsg import (
    parse_msg,
    proposal_status_display,
    proposal_type_display,
    to_failure_message,
)

# (input, expected) straight from helper.spec.ts
REFERENCE_SPEC_CASES = [
    ("Sent 9,980.039920 Luna from terra1asdfasdf", "send 9,980.039920 Luna from terra1asdfasdf"),
    ("Received 9,980.039920 Luna from terra1asdfasdf", "receive 9,980.039920 Luna from terra1asdfasdf"),
    ("Requested unjail for terra1...", "request unjail for terra1..."),
    ("Set withdraw address as terra1...", "set withdraw address as terra1..."),
    ("Withdraw reward from validator1", "withdraw reward from validator1"),
    ("Withdraw validator1's commission", "withdraw validator1's commission"),
    ("Created validator terravaloper1...", "create validator terravaloper1..."),
    ("Edited validator terravaloper1...", "edit validator terravaloper1..."),
    ("Delegated 1234.567890 Luna to terravaloper1...", "delegate 1234.567890 Luna to terravaloper1..."),
    ("Redelegated 1234.567890 Luna to terravaloper1...", "redelegate 1234.567890 Luna to terravaloper1..."),
    (
        "Requested to undelegate 1234.567890 Luna from validator1",
        "request to undelegate 1234.567890 Luna from validator1",
    ),
    ("Prevoted price of LUNA denominated in UST", "prevote price of LUNA denominated in UST"),
    ("Voted oracle price of LUNA denominated in UST", "vote oracle price of LUNA denominated in UST"),
    ("Swapped 1000.123456 UST for 1000.222222 LUNA", "swap 1000.123456 UST for 1000.222222 LUNA"),
    ("Deposited 123.456789 LUNA to Proposal 1", "deposit 123.456789 LUNA to Proposal 1"),
    ("Voted yes for proposal 1", "vote yes for proposal 1"),
    (
        "Created proposal 'To The Moon' with 1000.000000 LUNA deposit",
        "create proposal 'To The Moon' with 1000.000000 LUNA deposit",
    ),
    ("Stored 1", "store 1"),
    ("Instantiated terra1... from code 1", "instantiate terra1... from code 1"),
    ("Executed burn on terra1...", "execute burn on terra1..."),
    ("Migrated terra1... to code 2", "migrate terra1... to code 2"),
    ("Changed terra1... owner to terra1... from terra1...", "change terra1... owner to terra1... from terra1..."),
]


class TestFailureMessage:
    def test_reference_spec_cases(self, spark):
        df = spark.createDataFrame([(a, b) for a, b in REFERENCE_SPEC_CASES], "t string, expected string")
        bad = df.select(to_failure_message(F.col("t")).alias("got"), "expected").filter(
            F.col("got") != F.col("expected")
        )
        assert bad.count() == 0, bad.collect()


class TestParseMsg:
    def _parse(self, spark, msg_type, value, address=None, code=None):
        df = spark.createDataFrame(
            [(({"type": msg_type, "value": value}), code)],
            "m struct<type:string, value:string>, code int",
        )
        addr = F.lit(address) if address else None
        return df.select(
            parse_msg(F.col("m"), addr, F.col("code")).alias("p")
        ).first()["p"]

    def test_send_directions(self, spark):
        value = '{"from_address":"terra1me","to_address":"terra1you","amount":[{"denom":"ukrw","amount":"55"}]}'
        sent = self._parse(spark, "bank/MsgSend", value, address="terra1me")
        recv = self._parse(spark, "bank/MsgSend", value, address="terra1you")
        assert sent["tag"] == "Send" and sent["text"] == "Sent 55 ukrw to terra1you"
        assert recv["tag"] == "Receive" and recv["text"] == "Received 55 ukrw from terra1me"

    def test_failed_tx_gets_infinitive_prefix(self, spark):
        value = '{"from_address":"terra1me","to_address":"terra1you","amount":[{"denom":"ukrw","amount":"55"}]}'
        out = self._parse(spark, "bank/MsgSend", value, address="terra1me", code=4)
        assert out["text"] == "Failed to send 55 ukrw to terra1you"

    def test_delegate_swap_unjail(self, spark):
        d = self._parse(
            spark,
            "staking/MsgDelegate",
            '{"delegator_address":"terra1d","validator_address":"terravaloper1v","amount":{"denom":"uluna","amount":"7"}}',
        )
        assert d["text"] == "Delegated 7 uluna to terravaloper1v"
        s = self._parse(
            spark,
            "market/MsgSwap",
            '{"trader":"terra1t","offer_coin":{"denom":"ukrw","amount":"9"},"ask_denom":"uusd"}',
        )
        assert s["text"] == "Swapped 9 ukrw for uusd"
        u = self._parse(spark, "slashing/MsgUnjail", '{"address":"terravaloper1v"}')
        assert u["text"] == "Requested unjail for terravaloper1v"


class TestProposalDisplay:
    def test_status_and_type_maps(self, spark):
        df = spark.createDataFrame(
            [("VotingPeriod", "gov/TextProposal"), ("Passed", "bogus/Thing")],
            "status string, ptype string",
        )
        rows = df.select(
            proposal_status_display("status").alias("s"),
            proposal_type_display("ptype").alias("t"),
        ).collect()
        assert (rows[0]["s"], rows[0]["t"]) == ("Voting", "Text Proposal")
        assert (rows[1]["s"], rows[1]["t"]) == ("Passed", "bogus/Thing")  # passthrough
