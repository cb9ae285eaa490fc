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
    assert _one(df, 'set(out, IsInt("42"))') is True
    assert _one(df, 'set(out, IsInt("x"))') is False
    assert _one(df, 'set(out, IsDouble("4.5"))') is True
    assert _one(df, 'set(out, IsBool("true"))') is True


def test_array_converters(spark, df):
    assert _one(df, 'set(out, ContainsValue(arr, "k1=v1"))') is True
    assert _one(df, 'set(out, Index(arr, 1))') == "k2=v2"
    assert _one(df, 'set(out, DeleteIndex(arr, 0))') == ["k2=v2"]
    assert _one(df, 'set(out, Append(arr, "k3=v3"))') == ["k1=v1", "k2=v2", "k3=v3"]
    m = _one(df, "set(out, SliceToMap(arr))")
    assert m == {"k1": "v1", "k2": "v2"}


def test_cidr(spark, df):
    assert _one(df, 'set(out, IsInCIDR(ip, "10.1.0.0/16"))') is True
    assert _one(df, 'set(out, IsInCIDR(ip, "10.2.0.0/16"))') is False
    assert _one(df, 'set(out, IsInCIDR(ip, "0.0.0.0/0"))') is True


def test_luhn(spark, df):
    assert _one(df, "set(out, IsValidLuhn(card))") is True  # 4111... is valid
    assert _one(df, 'set(out, IsValidLuhn("4111111111111112"))') is False


def test_hash_standins(spark, df):
    assert isinstance(_one(df, "set(out, Murmur3Hash(s))"), int)
    assert len(_one(df, "set(out, UUID())")) == 36
