"""Grok expansion + new parser unit tests."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from sparkotel.operators import parse as PR
from sparkotel.operators.grok import GROK_PATTERNS, expand_grok, grok_parser


def test_expand_simple():
    rx, caps = expand_grok("%{IP:ip} %{INT:n:int}")
    assert caps == [("ip", None), ("n", "int")]
    m = re.match(rx, "10.0.0.1 42")
    assert m and m.group(1) == "10.0.0.1" and m.group(2) == "42"


def test_expand_nested_apache():
    rx, caps = expand_grok("%{COMMONAPACHELOG}")
    names = [c[0] for c in caps]
    assert names == ["clientip", "auth", "timestamp", "verb", "request", "httpversion", "response", "bytes"]
    line = '10.0.0.5 - frank [15/Mar/2024:01:02:03 +0000] "GET /d/5/5 HTTP/1.1" 503 185'
    m = re.match(rx, line)
    assert m and m.group(1) == "10.0.0.5" and m.group(8) == "185"


def test_expand_custom_and_errors():
    rx, caps = expand_grok("%{MYPAT:x}", {"MYPAT": r"[abc]+"})
    assert re.match(rx, "abba")
    with pytest.raises(KeyError):
        expand_grok("%{NOPE:x}")
    with pytest.raises(ValueError):
        expand_grok("%{A:x}", {"A": "%{A}"})  # recursion bound


def test_grok_typed_captures(spark):
    df = spark.createDataFrame([("v 12 3.5",), ("nope",)], "text string")
    out = grok_parser(
        df, "%{WORD:w} %{INT:i:int} %{NUMBER:f:float}", "text", line1=False
    )
    rows = {r["text"]: r for r in out.collect()}
    good = rows["v 12 3.5"]
    assert good["i"] == 12 and abs(good["f"] - 3.5) < 1e-9 and not good["_error"]
    assert rows["nope"]["_error"] and rows["nope"]["i"] is None


def test_syslog_parser_unit(spark):
    df = spark.createDataFrame(
        [("<13>Mar 15 01:02:03 web01 nginx[99]: GET /",), ("garbage",)], "text string"
    )
    out = {r["text"]: r for r in PR.syslog_parser(df).collect()}
    good = out["<13>Mar 15 01:02:03 web01 nginx[99]: GET /"]
    assert good["facility"] == 1 and good["syslog_severity"] == 5
    assert good["hostname"] == "web01" and good["appname"] == "nginx"
    assert good["proc_id"] == 99 and good["message"] == "GET /"
    assert out["garbage"]["_error"]


def test_container_parser_unit(spark):
    df = spark.createDataFrame(
        [
            ('{"log":"hello\\n","stream":"stdout","time":"T1"}',),  # \n = complete record
            ("2024-03-15T00:00:01Z stderr P partial line",),
        ],
        "line string",
    )
    rows = PR.container_parser(df).collect()
    docker = next(r for r in rows if r["format"] == "docker")
    cri = next(r for r in rows if r["format"] == "cri")
    assert docker["log"] == "hello" and docker["stream"] == "stdout" and not docker["partial"]
    assert cri["log"] == "partial line" and cri["stream"] == "stderr" and cri["partial"]


def test_drain_templates_unit(spark):
    df = spark.createDataFrame(
        [("user 1 logged in",), ("user 22 logged in",), ("other event",)], "line string"
    )
    out = {r["template"]: r for r in PR.drain_templates(df).collect()}
    assert out["user <*> logged in"]["n"] == 2
    assert out["user <*> logged in"]["example"] == "user 1 logged in"
    assert out["other event"]["n"] == 1


def test_grok_round2_patterns(spark):
    """round-2 dictionary additions parse representative tokens."""
    df = spark.createDataFrame(
        [("2024-03-15T01:02:03Z fe80::1 00:1b:44:11:3a:b7 /var/log/app.log a@b.co",)],
        "text string",
    )
    out = grok_parser(
        df,
        "%{TIMESTAMP_ISO8601:ts} %{IPV6:ip6} %{MAC:mac} %{PATH:path} %{EMAILADDRESS:mail}",
        line1=False,
    ).first()
    assert out["ts"] == "2024-03-15T01:02:03Z"
    assert out["ip6"] == "fe80::1"
    assert out["mac"] == "00:1b:44:11:3a:b7"
    assert out["path"] == "/var/log/app.log"
    assert out["mail"] == "a@b.co"


def test_base_dictionary_long_tail():
    """spot checks over the newly added go-grok base patterns."""
    from sparkotel.operators.grok import expand_grok
    import re as _re

    cases = [
        ("%{URI:u}", "https://u:p@example.com:8080/a/b?x=1", "u"),
        ("%{COMMONMAC:m}", "aa:bb:cc:dd:ee:ff", "m"),
        ("%{WINPATH:p}", r"C:\Users\x\file.txt", "p"),
        ("%{UNIXPATH:p}", "/var/log/app.log", "p"),
        ("%{DATESTAMP:d}", "12/31/2024 23:59:59", "d"),
        ("%{DATESTAMP_RFC822:d}", "Tue Jan 07 2025 10:01:22 UTC", "d"),
        ("%{BOOLEAN:b}", "true", "b"),
        ("%{HOSTPORT:h}", "db.internal:5432", "h"),
        ("%{QS:q}", '"quoted text"', "q"),
        ("%{SYSLOGBASE}", "Jan  7 10:01:22 host01 sshd[42]:", None),
    ]
    for expr, sample, field in cases:
        regex, captures = expand_grok(expr)
        m = _re.search(regex, sample)
        assert m, (expr, sample, regex)
        if field:
            assert captures[0][0] == field
            assert m.group(1) == sample


def test_syslogfacility_typed_captures():
    from sparkotel.operators.grok import expand_grok
    import re as _re

    regex, captures = expand_grok("%{SYSLOGFACILITY}")
    m = _re.search(regex, "<13.5>")
    assert m and m.group(1) == "13" and m.group(2) == "5"
    assert captures == [
        ("log.syslog.facility.code", "int"),
        ("log.syslog.priority", "int"),
    ]
