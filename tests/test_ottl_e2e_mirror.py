"""Statement-for-statement mirror of the reference's OTTL end-to-end
suite (pkg/ottl/e2e/e2e_test.go, Test_e2e_converters): each statement is
copied VERBATIM from the Go test table along with its expected
``attributes["test"]`` value, executed over the same standard log
record (constructLogTransformContext, e2e_test.go:2573-2640) modeled as
one Spark row.

Statements omitted from the mirror (documented divergences): nested
any-typed attribute trees beyond map<string,string>, 0x… trace-id
literals, ParseSeverity's custom-mapping argument, String() of
non-scalars, and Substring's 4-arg rune mode.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkotel import expr as X

CASES = [
    # (statement, expected attributes["test"] value)
    ('set(attributes["test"], "pass")', "pass"),
    ('set(attributes["test"], Base64Encode("pass"))', "cGFzcw=="),
    ('set(attributes["test"], Base64Decode("cGFzcw=="))', "pass"),
    ('set(attributes["test"], Decode("cGFzcw==", "base64"))', "pass"),
    (
        'set(attributes["test"], Coalesce([attributes["http.method"], attributes["http.path"], "fallback"]))',
        "get",
    ),
    (
        'set(attributes["test"], Coalesce([attributes["nonexistent"], attributes["http.method"], "fallback"]))',
        "get",
    ),
    (
        'set(attributes["test"], Coalesce([attributes["nonexistent"], attributes["also.missing"], "fallback"]))',
        "fallback",
    ),
    ('set(attributes["test"], Concat(["A","B"], ":"))', "A:B"),
    ('set(attributes["test"], Concat(["A","B"], attributes["val"]))', "Aval2B"),
    ('set(attributes["test"], ConvertCase(attributes["http.method"], "upper"))', "GET"),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))', "pass"),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))', "foo_bar"),
    ('set(attributes["test"], ConvertCase("foo_bar", "camel"))', "FooBar"),
    ('set(attributes["test"], ToCamelCase("foo_bar"))', "FooBar"),
    ('set(attributes["test"], ToSnakeCase("fooBar"))', "foo_bar"),
    ('set(attributes["test"], ToUpperCase(attributes["http.method"]))', "GET"),
    ('set(attributes["test"], ToLowerCase("PASS"))', "pass"),
    (
        'set(attributes["test"], ConvertAttributesToElementsXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>"))',
        "<Log><id>1</id><Message>This is a log message!</Message></Log>",
    ),
    ('set(attributes["test"], ParseInt("0xAF", 0))', 175),
    ('set(attributes["test"], ParseInt("12345", 10))', 12345),
    ('set(attributes["test"], ParseInt("AF", 16))', 175),
    ('set(attributes["test"], Double(1.0))', 1.0),
    ('set(attributes["test"], Double("1"))', 1.0),
    ('set(attributes["test"], Double(true))', 1.0),
    ('set(attributes["test"], Double(1))', 1.0),
    ('set(attributes["test"], FNV("pass"))', 266877920130663416),
    ('set(attributes["test"], Format("%03d-%s", [7, "test"]))', "007-test"),
    ('set(attributes["test"], Hours(Duration("90m")))', 1.5),
    ('set(attributes["test"], InsertXML("<a></a>", "/a", "<b></b>"))', "<a><b></b></a>"),
    ('set(attributes["test"], Int(1.0))', 1),
    ('set(attributes["test"], Int("1"))', 1),
    ('set(attributes["test"], Int(true))', 1),
    ('set(attributes["test"], Int(1))', 1),
    (
        'set(attributes["test"], GetXML("<a><b>1</b><c><b>2</b></c></a>", "/a//b"))',
        "<b>1</b><b>2</b>",
    ),
    ('set(attributes["test"], Hex(1.0))', "3ff0000000000000"),
    ('set(attributes["test"], Hex(true))', "01"),
    ('set(attributes["test"], Hex(12))', "000000000000000c"),
    ('set(attributes["test"], Hex("12"))', "3132"),
    ('set(attributes["test"], "pass") where IsMatch("aa123bb", "\\\\d{3}")', "pass"),
    ('set(attributes["test"], Log(1))', 0.0),
    ('set(attributes["test"], IsValidLuhn("17893729974"))', True),
    ('set(attributes["test"], IsValidLuhn(17893729975))', False),
    ('set(attributes["test"], MD5("pass"))', "1a1dc91c907325c69271ddf0c944bc72"),
    ('set(attributes["test"], Microseconds(Duration("1ms")))', 1000),
    ('set(attributes["test"], Milliseconds(Duration("1s")))', 1000),
    ('set(attributes["test"], Minutes(Duration("1h")))', 60.0),
    (
        'set(attributes["test"], Murmur3Hash128("Hello World"))',
        "dbc2a0c1ab26631a27b4c09fcf1fe683",
    ),
    ('set(attributes["test"], Murmur3Hash("Hello World"))', "ce837619"),
    ('set(attributes["test"], Nanoseconds(Duration("1ms")))', 1000000),
    (
        'set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "=", " ", true))',
        "k1=v1 k2=v2",
    ),
    (
        'set(attributes["test"], ToKeyValueString(ParseKeyValue("k1:v1,k2:v2", ":", ","), ":", ",", true))',
        "k1:v1,k2:v2",
    ),
    (
        'set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "!", "+", true))',
        "k1!v1+k2!v2",
    ),
    (
        'set(attributes["test"], RemoveXML("<Log id=\\"1\\"><Message>This is a log message!</Message></Log>", "/Log/Message"))',
        '<Log id="1"></Log>',
    ),
    ('set(attributes["test"], Seconds(Duration("1m")))', 60.0),
    (
        'set(attributes["test"], SHA1("pass"))',
        "9d4e1e23bd5b727046a9e3b4b7db57bd8d6ee684",
    ),
    (
        'set(attributes["test"], SHA256("pass"))',
        "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1",
    ),
    (
        'set(attributes["test"], SHA512("pass"))',
        "5b722b307fce6c944905d132691d5e4a2214b7fe92b738920eb3fce3a90420a19511c3010a0e7712b054daef5b57bad59ecbd93b3280f210578f547f4aed4d25",
    ),
    ('set(attributes["test"], String("test"))', "test"),
    ('set(attributes["test"], String(attributes["http.method"]))', "get"),
    ('set(attributes["test"], String(true))', "true"),
    ('set(attributes["test"], Substring("pass", 0, 2))', "pa"),
    ('set(attributes["test"], "pass") where UnixMicro(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where UnixMilli(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where UnixNano(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where UnixSeconds(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where IsString(UUID())', "pass"),
    ('set(attributes["test"], "pass") where IsString(UUIDv7())', "pass"),
    ('set(attributes["test"], XXH3("hello world"))', "d447b1ea40e6988b"),
    ('set(attributes["test"], XXH128("hello world"))', "df8d09e93f874900a99b8775cc15b6c7"),
    ('set(attributes["test"], Bool(1))', True),
    ('set(attributes["test"], Bool("true"))', True),
    ('set(attributes["test"], Bool(true))', True),
    ('set(attributes["test"], "pass") where HasPrefix(body, "operation")', "pass"),
    (
        'set(attributes["test"], "pass") where HasPrefix(body, attributes["dynamicprefix"])',
        "pass",
    ),
    ('set(attributes["test"], "pass") where HasSuffix(body, "tionA")', "pass"),
    (
        'set(attributes["test"], "pass") where HasSuffix(body, attributes["dynamicsuffix"])',
        "pass",
    ),
    ('set(attributes["test"], "pass") where IsMatch(body, "operation[AC]")', "pass"),
    (
        'set(attributes["test"], "pass") where IsMatch(body, Concat(["operation", "[AC]"], ""))',
        "pass",
    ),
    (
        'set(attributes["test"], "pass") where body == Concat(["operation", "A"], "")',
        "pass",
    ),
    (
        'set(attributes["test"], "pass") where ContainsValue(["hello", "world"], "hello")',
        "pass",
    ),
    ('set(attributes["test"], "pass") where ContainsValue([1, 2, 3, 4], 4)', "pass"),
    (
        'set(attributes["test"], "pass") where ContainsValue([1.1, 2.2, 3.3, 4.4], 4.4)',
        "pass",
    ),
    (
        'set(attributes["test"], "pass") where attributes["non_exiting_attrs"] == nil',
        "pass",
    ),
    ('set(attributes["test"], "pass") where attributes["nil_string"] == "nil"', "pass"),
    (
        'set(attributes["test"], CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "TCP", 0))',
        "1:9qr9Z1LViXcNwtLVOHZ3CL8MlyM=",
    ),
    (
        'set(attributes["test"], CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "UDP", 1))',
        "1:1viZaClxhTkWejXjxmQXaZzI8F4=",
    ),
    (
        'set(attributes["test"], CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "ICMP", 9))',
        "1:7tb0A6iknoFJCZmtLXkvScm21Ss=",
    ),
    (
        'set(attributes["test"], CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "ICMP6", 10))',
        "1:D7dVM6HJooFwvHhLnrMrNMw/UR4=",
    ),
    (
        'set(attributes["test"], CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "RSVP", 11))',
        "1:cEVbY6jymDAKgyIU4UqMu0WQHTI=",
    ),
    (
        'set(attributes["test"], CommunityID("123.124.125.126", 12345, "55.56.57.58", 80, "SCTP", 12))',
        "1:4KOPjy2bsV43uY/mf4HtwyZkwqM=",
    ),
    ('set(attributes["test"], Split("fail|pass", "|")[Int("1")])', "pass"),
    ('set(attributes["test"], "pass") where "a" + "b" == "ab"', "pass"),
]


@pytest.fixture(scope="module")
def record(spark):
    """the standard e2e log record (e2e_test.go:2573-2640 subset)."""
    return spark.createDataFrame(
        [
            (
                "operationA",
                "2020-02-11 20:26:12.000000321",
                "2020-02-11 20:26:13.000000789",
                {
                    "http.method": "get",
                    "http.path": "/health",
                    "http.url": "http://localhost/health",
                    "dynamicprefix": "operation",
                    "dynamicsuffix": "tionA",
                    "flags": "A|B|C",
                    "total.string": "123456789",
                    "val": "val2",
                    "nil_string": "nil",
                    "encoding": "base64",
                    "server.ip": "192.168.0.1",
                    "int_value_str": "0",
                },
            )
        ],
        "text string, ts_s string, ots_s string, attributes map<string,string>",
    ).select(
        "text",
        F.col("ts_s").cast("timestamp").alias("log_ts"),
        F.col("ots_s").cast("timestamp").alias("warc_ts"),
        "attributes",
    )


@pytest.mark.parametrize("stmt,want", CASES, ids=[c[0][:60] for c in CASES])
def test_e2e_statement(spark, record, stmt, want):
    got = X.apply_statement(record, stmt).first()["test"]
    if isinstance(want, float):
        assert got == pytest.approx(want)
    else:
        assert got == want, f"{stmt}: {got!r} != {want!r}"
