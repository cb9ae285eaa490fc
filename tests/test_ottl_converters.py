"""Extended OTTL converter coverage (one executed case each)."""

from __future__ import annotations

import pytest

from sparkotel import expr as X


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("prefix-body-suffix", "10.1.2.3", "4111111111111111", ["k1=v1", "k2=v2"], "foo_bar baz")],
        "s string, ip string, card string, arr array<string>, words string",
    )


def _one(df, stmt):
    return X.apply_statement(df, stmt).first()["out"]


def test_trim_prefix_suffix(spark, df):
    assert _one(df, 'set(out, TrimPrefix(s, "prefix-"))') == "body-suffix"
    assert _one(df, 'set(out, TrimSuffix(s, "-suffix"))') == "prefix-body"
    assert _one(df, 'set(out, TrimPrefix(s, "nope"))') == "prefix-body-suffix"


def test_format_and_cases(spark, df):
    assert _one(df, 'set(out, Format("ip=%s n=%d", ip, 7))') == "ip=10.1.2.3 n=7"
    assert _one(df, 'set(out, ToCamelCase("foo_bar"))') == "FooBar"
    assert _one(df, 'set(out, ToTitleCase("foo bar"))') == "Foo Bar"
    assert _one(df, 'set(out, ToSnakeCase("fooBar"))') == "foo_bar"


def test_type_predicates(spark, df):
    # literal args: TYPE tests, not parseability (func_is_int.go etc. —
    # a string is never an int; the e2e mirror pins IsBool(false) etc.)
    assert _one(df, 'set(out, IsInt(42))') is True
    assert _one(df, 'set(out, IsInt("42"))') is False
    assert _one(df, 'set(out, IsInt("x"))') is False
    assert _one(df, 'set(out, IsDouble(4.5))') is True
    assert _one(df, 'set(out, IsDouble("4.5"))') is False
    assert _one(df, 'set(out, IsBool(true))') is True
    assert _one(df, 'set(out, IsBool("true"))') is False


def test_array_converters(spark, df):
    assert _one(df, 'set(out, ContainsValue(arr, "k1=v1"))') is True
    # Index = position of value (func_index.go), -1 when absent
    assert _one(df, 'set(out, Index(arr, "k2=v2"))') == 1
    assert _one(df, 'set(out, Index(arr, "missing"))') == -1
    assert _one(df, 'set(out, DeleteIndex(arr, 0))') == ["k2=v2"]
    assert _one(df, 'set(out, Append(arr, "k3=v3"))') == ["k1=v1", "k2=v2", "k3=v3"]
    # func_slice_to_map.go: no keyPath → index keys
    m = _one(df, "set(out, SliceToMap(arr))")
    assert m == {"0": "k1=v1", "1": "k2=v2"}


def test_cidr(spark, df):
    assert _one(df, 'set(out, IsInCIDR(ip, "10.1.0.0/16"))') is True
    assert _one(df, 'set(out, IsInCIDR(ip, "10.2.0.0/16"))') is False
    assert _one(df, 'set(out, IsInCIDR(ip, "0.0.0.0/0"))') is True


def test_luhn(spark, df):
    assert _one(df, "set(out, IsValidLuhn(card))") is True  # 4111... is valid
    assert _one(df, 'set(out, IsValidLuhn("4111111111111112"))') is False


def test_hashes_bit_exact(spark, df):
    """golden vectors from the reference's own unit tests
    (func_murmur3_hash_test.go, func_murmur3_hash128_test.go,
    func_fnv_test.go, func_xxh3_test.go, func_xxh128_test.go)."""
    assert _one(df, 'set(out, Murmur3Hash("Hello World"))') == "ce837619"
    assert _one(df, 'set(out, Murmur3Hash(""))') == "00000000"
    assert (
        _one(df, 'set(out, Murmur3Hash128("Hello World"))')
        == "dbc2a0c1ab26631a27b4c09fcf1fe683"
    )
    assert _one(df, 'set(out, FNV("hello world"))') == 8618312879776256743
    assert _one(df, 'set(out, FNV(""))') == -3750763034362895579
    assert _one(df, 'set(out, XXH3("hello world"))') == "d447b1ea40e6988b"
    assert _one(df, 'set(out, XXH3(""))') == "2d06800538d394c2"
    assert (
        _one(df, 'set(out, XXH128("hello world"))')
        == "df8d09e93f874900a99b8775cc15b6c7"
    )
    assert len(_one(df, "set(out, UUID())")) == 36
    assert len(_one(df, "set(out, UUIDv7())")) == 36


def test_convert_case_and_kv_string(spark, df):
    """e2e_test.go:662-685 ConvertCase statements."""
    assert _one(df, 'set(out, ConvertCase("PASS", "lower"))') == "pass"
    assert _one(df, 'set(out, ConvertCase("pass", "upper"))') == "PASS"
    assert _one(df, 'set(out, ConvertCase("fooBar", "snake"))') == "foo_bar"
    assert _one(df, 'set(out, ConvertCase("foo_bar", "camel"))') == "FooBar"
    assert (
        _one(df, 'set(out, ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), "=", " "))')
        == "k1=v1 k2=v2"
    )


def test_decode(spark, df):
    """e2e_test.go:620 Decode statement."""
    assert _one(df, 'set(out, Decode("cGFzcw==", "base64"))') == "pass"
    assert _one(df, 'set(out, Decode("cGFzcw", "base64-raw"))') == "pass"


def test_user_agent(spark, df):
    chrome = (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/91.0.4472.124 Safari/537.36"
    )
    m = _one(df, f'set(out, UserAgent("{chrome}"))')
    assert m["user_agent.name"] == "Chrome"
    assert m["user_agent.version"] == "91.0.4472.124"
    assert m["os.name"] == "Windows"
    assert m["user_agent.original"] == chrome
    m2 = _one(df, 'set(out, UserAgent("curl/8.4.0"))')
    assert m2["user_agent.name"] == "curl" and m2["user_agent.version"] == "8.4.0"


def test_durations(spark, df):
    assert _one(df, 'set(out, Duration("1h30m"))') == 5400.0
    assert _one(df, 'set(out, Hours(Duration("90m")))') == 1.5
    assert _one(df, 'set(out, Minutes(Duration("90s")))') == 1.5
    assert _one(df, 'set(out, Milliseconds(Duration("1.5s")))') == 1500
    assert _one(df, 'set(out, Nanoseconds(Duration("1us")))') == 1000


def test_unix_and_nanosecond(spark, df):
    t = _one(df, "set(out, Unix(1710460800))")
    assert t.year == 2024 and t.month == 3
    ns = _one(df, "set(out, Nanosecond(Unix(0, 500000000)))")
    assert ns == 500000000  # micro-precision timestamps: ns = micros * 1000


def test_ids(spark, df):
    # ids model as lowercase hex strings (the trace_parser convention);
    # String(<id>) renders the reference's byte-slice form (e2e mirror)
    assert _one(df, 'set(out, SpanID("0102030405060708"))') == "0102030405060708"
    assert (
        _one(df, 'set(out, TraceID("000102030405060708090A0B0C0D0E0F"))')
        == "000102030405060708090a0b0c0d0e0f"
    )
    assert _one(df, 'set(out, SpanID("zz"))') is None  # invalid hex -> NULL


def test_parse_csv_and_severity(spark, df):
    m = _one(df, 'set(out, ParseCSV("1,2,3", "a,b,c"))')
    assert m == {"a": "1", "b": "2", "c": "3"}
    assert _one(df, 'set(out, ParseSeverity("WARNING"))') == "warn"
    assert _one(df, 'set(out, ParseSeverity("err"))') == "error"
    assert _one(df, 'set(out, ParseSeverity("18"))') == "error"
    assert _one(df, 'set(out, ParseSeverity("3"))') == "trace"


def test_extract_patterns(spark, df):
    m = _one(df, 'set(out, ExtractPatterns(s, "^(?P<head>[a-z]+)-(?P<mid>[a-z]+)"))')
    assert m == {"head": "prefix", "mid": "body"}
    m2 = _one(df, 'set(out, ExtractGrokPatterns(ip, "%{IP:addr}"))')
    assert m2 == {"addr": "10.1.2.3"}


def test_xml_family(spark, spark_xml_df=None):
    from pyspark.sql import functions as F  # noqa: F401
    from sparkotel import expr as XP

    sp = spark.createDataFrame(
        [('<root a="1"><b>t1</b><c><d>t2</d></c></root>',)], "x string"
    )
    one = lambda stmt: XP.apply_statement(sp, stmt).first()["out"]  # noqa: E731
    simp = one("set(out, ParseSimplifiedXML(x))")
    assert simp == {"root.b": "t1", "root.c.d": "t2"}
    assert one('set(out, GetXML(x, ".//d"))') == "<d>t2</d>"
    assert one('set(out, RemoveXML(x, ".//b"))') == '<root a="1"><c><d>t2</d></c></root>'
    assert "<e>new</e>" in one('set(out, InsertXML(x, "c", "<e>new</e>"))')
    assert one("set(out, ConvertAttributesToElementsXML(x))").startswith("<root><a>1</a>")
    parsed = one("set(out, ParseXML(x))")
    assert '"tag": "root"' in parsed


def test_community_id(spark):
    """vectors from func_community_id_test.go."""
    from sparkotel import expr as XP

    sp = spark.createDataFrame(
        [("1.2.3.4", 12345, "5.6.7.8", 80)],
        "sip string, sport int, dip string, dport int",
    )
    out = XP.apply_statement(sp, 'set(out, CommunityID(sip, sport, dip, dport, "TCP"))')
    assert out.first()["out"] == "1:0by3b/tE95hcOzccyt6d4kjgbZc="
    flipped = spark.createDataFrame(
        [("5.6.7.8", 80, "1.2.3.4", 12345)],
        "sip string, sport int, dip string, dport int",
    )
    out2 = XP.apply_statement(flipped, 'set(out, CommunityID(sip, sport, dip, dport, "TCP"))')
    assert out2.first()["out"] == "1:0by3b/tE95hcOzccyt6d4kjgbZc="


def test_sort_desc(spark, df):
    assert _one(df, 'set(out, Sort(arr, "desc"))') == ["k2=v2", "k1=v1"]
    assert _one(df, "set(out, Sort(arr))") == ["k1=v1", "k2=v2"]
