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


class TestParseMsgDuckOracle:
    """F18 cross-engine oracle (r8): parse_msg + the failed-msg verb
    rewrite evaluated as DuckDB SQL over one shared case table covering
    every family, both Send directions, the code-failed path, and the
    NULL-propagation edge (missing JSON path nulls the text on BOTH
    engines)."""

    CASES = [
        # (id, type, value_json, address_or_None, code_or_None)
        (0, "bank/MsgSend",
         '{"from_address":"terra1me","to_address":"terra1you",'
         '"amount":[{"denom":"uluna","amount":"1000"}]}', "terra1me", None),
        (1, "bank/MsgSend",
         '{"from_address":"terra1you","to_address":"terra1me",'
         '"amount":[{"denom":"uluna","amount":"1000"}]}', "terra1me", None),
        (2, "pay/MsgSend",
         '{"from_address":"terra1me","to_address":"terra1you",'
         '"amount":[{"denom":"ukrw","amount":"5"}]}', "terra1me", 4),
        (3, "bank/MsgMultiSend",
         '{"inputs":[{"a":1},{"a":2},{"a":3}]}', None, None),
        (4, "staking/MsgDelegate",
         '{"validator_address":"terravaloper1x",'
         '"amount":{"denom":"uluna","amount":"777"}}', None, None),
        (5, "staking/MsgDelegate",
         '{"validator_address":"terravaloper1x",'
         '"amount":{"denom":"uluna","amount":"777"}}', None, 2),
        (6, "market/MsgSwap",
         '{"offer_coin":{"denom":"uluna","amount":"9"},"ask_denom":"uusd"}',
         None, None),
        (7, "slashing/MsgUnjail", '{"address":"terravaloper1y"}', None, 1),
        (8, "gov/MsgVote", '{"option":"yes"}', None, None),
        (9, "gov/MsgVote", '{"option":"yes"}', None, 5),
        # missing amount path: concat nulls out on both engines
        (10, "bank/MsgSend", '{"from_address":"terra1me"}', "terra1me", None),
    ]

    def test_matches_duckdb(self, spark):
        import duckdb

        from classic_fcd_spark.functions.parsemsg import (
            duck_parse_msg_sql,
            parse_msg,
        )

        got = {}
        for mid, t, v, addr, code in self.CASES:
            df = spark.createDataFrame(
                [({"type": t, "value": v}, code)],
                "m struct<type:string,value:string>, code int",
            )
            row = df.select(
                parse_msg(
                    F.col("m"),
                    address=F.lit(addr) if addr is not None else None,
                    code=F.col("code"),
                ).alias("p")
            ).collect()[0]["p"]
            got[mid] = (row["tag"], row["text"])

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE msgs (id INT, t VARCHAR, v VARCHAR,"
            " addr VARCHAR, code INT)"
        )
        con.executemany("INSERT INTO msgs VALUES (?, ?, ?, ?, ?)", self.CASES)
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(duck_parse_msg_sql()).fetchall()
        }
        assert got == want
        # spot pins so both engines being wrong together cannot hide
        assert got[0] == ("Send", "Sent 1000 uluna to terra1you")
        assert got[1] == ("Receive", "Received 1000 uluna from terra1you")
        assert got[2] == ("Send", "Failed to send 5 ukrw to terra1you")
        assert got[3] == ("Multisend", "Sent multiSend message with 3 inputs")
        assert got[5] == ("Staking", "Failed to delegate 777 uluna to terravaloper1x")
        assert got[9] == ("Other", "Failed to message type gov/MsgVote")
        assert got[10] == ("Send", None)
