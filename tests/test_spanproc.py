"""spanprocessor + metricsaslogsconnector semantics (span.go /
connector.go), incl. the README's canonical to_attributes example."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkotel.operators.spanproc import (
    span_name_from_attributes,
    span_name_to_attributes,
    span_set_status,
)


def _spans(spark, rows):
    """rows: (name, attrs)."""
    return spark.createDataFrame(
        [(f"{i:016x}", n, a, 0, "") for i, (n, a) in enumerate(rows)],
        "span_id string, name string, attributes map<string,string>,"
        " status_code int, status_message string",
    )


def test_from_attributes_any_miss_is_noop(spark):
    df = _spans(
        spark,
        [
            ("orig", {"db.svc": "location", "operation": "get", "id": "1234"}),
            ("orig", {"db.svc": "location", "operation": "get"}),  # id missing
            ("orig", {}),  # empty attrs → untouched (span.go:101-104)
        ],
    )
    out = span_name_from_attributes(
        df, ["db.svc", "operation", "id"], separator="::"
    ).orderBy("span_id").collect()
    assert [r["name"] for r in out] == ["location::get::1234", "orig", "orig"]


def test_to_attributes_reference_example(spark):
    # README/config example: /api/v1/document/{documentId}/update
    df = _spans(spark, [("/api/v1/document/12345678/update", {"x": "1"})])
    out = span_name_to_attributes(
        df, [r"^\/api\/v1\/document\/(?P<documentId>.*)\/update$"]
    ).collect()[0]
    assert out["name"] == "/api/v1/document/{documentId}/update"
    assert out["attributes"]["documentId"] == "12345678"
    assert out["attributes"]["x"] == "1"  # existing attrs preserved


def test_to_attributes_rule_chain_and_break(spark):
    rules = [r"(?P<a>\d+)", r"(?P<b>x+)"]
    df = _spans(spark, [("q-123-xx", {})])
    # sequential: rule 2 sees rule 1's rewritten name
    r = span_name_to_attributes(df, rules).collect()[0]
    assert r["name"] == "q-{a}-{b}"
    assert r["attributes"] == {"a": "123", "b": "xx"}
    # break_after_match: second rule never runs
    r = span_name_to_attributes(df, rules, break_after_match=True).collect()[0]
    assert r["name"] == "q-{a}-xx"
    assert r["attributes"] == {"a": "123"}
    # keep_original_name: attrs extracted, name untouched
    r = span_name_to_attributes(df, rules, keep_original_name=True).collect()[0]
    assert r["name"] == "q-123-xx"
    assert r["attributes"] == {"a": "123", "b": "xx"}


def test_to_attributes_optional_group_not_participating(spark):
    # a named group that doesn't participate in the match (optional
    # group) must be skipped entirely — not extracted, not spliced
    # (m.start(i) == -1 would otherwise corrupt the rewritten name)
    df = _spans(spark, [("bar-77", {})])
    r = span_name_to_attributes(
        df, [r"^(?P<opt>foo)?bar-(?P<id>\d+)$"]
    ).collect()[0]
    assert r["name"] == "bar-{id}"
    assert r["attributes"] == {"id": "77"}
    # participating run of the same rule still extracts both
    df2 = _spans(spark, [("foobar-9", {})])
    r2 = span_name_to_attributes(
        df2, [r"^(?P<opt>foo)?bar-(?P<id>\d+)$"]
    ).collect()[0]
    assert r2["name"] == "{opt}bar-{id}"
    assert r2["attributes"] == {"opt": "foo", "id": "9"}


def test_to_attributes_no_match_is_noop(spark):
    df = _spans(spark, [("nope", {"k": "v"})])
    r = span_name_to_attributes(df, [r"(?P<n>\d+)"]).collect()[0]
    assert r["name"] == "nope" and r["attributes"] == {"k": "v"}


def test_set_status_semantics(spark):
    df = _spans(spark, [("a", {})]).withColumn(
        "status_message", F.lit("old")
    ).withColumn("status_code", F.lit(2))
    # Ok clears the message (span.go:221-229)
    r = span_set_status(df, "Ok", "ignored").collect()[0]
    assert (r["status_code"], r["status_message"]) == (1, "")
    r = span_set_status(df, "Error", "boom").collect()[0]
    assert (r["status_code"], r["status_message"]) == (2, "boom")
    r = span_set_status(df, "Unset").collect()[0]
    assert (r["status_code"], r["status_message"]) == (0, "")


def test_metrics_as_logs_histogram_and_summary(spark):
    from sparkotel.operators.metricsaslogs import (
        histogram_points_as_logs,
        summary_points_as_logs,
    )
    from sparkotel.otlpjson import parse_otlp_histograms, parse_otlp_summaries

    hline = (
        '{"resourceMetrics":[{"resource":{"attributes":[]},'
        '"scopeMetrics":[{"scope":{"name":"m"},"metrics":['
        '{"name":"h","histogram":{"aggregationTemporality":1,"dataPoints":['
        '{"timeUnixNano":"1000000000","count":"3","sum":6.5,"min":1.0,'
        '"bucketCounts":["1","2"],"explicitBounds":[5.0]}]}}]}]}]}'
    )
    df = spark.createDataFrame([(hline,)], "line string")
    r = histogram_points_as_logs(parse_otlp_histograms(df)).collect()[0]
    a = r["attributes"]
    assert r["body"] == "metric converted to log"
    assert a["metric.name"] == "h" and a["metric.type"] == "Histogram"
    assert a["metric.aggregation_temporality"] == "Delta"
    assert a["histogram.count"] == "3" and a["histogram.sum"] == "6.5"
    assert a["histogram.min"] == "1.0"
    assert "histogram.max" not in a  # HasMax false → omitted
    assert a["histogram.bucket_counts"] == "[1,2]"
    assert a["histogram.explicit_bounds"] == "[5.0]"

    sline = (
        '{"resourceMetrics":[{"resource":{"attributes":[]},'
        '"scopeMetrics":[{"scope":{"name":"m"},"metrics":['
        '{"name":"s","unit":"ms","summary":{"dataPoints":['
        '{"timeUnixNano":"1000000000","count":"10","sum":99.0,'
        '"quantileValues":[{"quantile":0.5,"value":4.0}]}]}}]}]}]}'
    )
    df = spark.createDataFrame([(sline,)], "line string")
    r = summary_points_as_logs(parse_otlp_summaries(df)).collect()[0]
    a = r["attributes"]
    assert a["metric.type"] == "Summary"
    assert a["summary.count"] == "10" and a["summary.sum"] == "99.0"
    assert a["summary.quantile_values"] == '[{"quantile":0.5,"value":4.0}]'
