"""OTLP/JSON file source/sink (receiver/otlpjsonfilereceiver +
fileexporter JSON-lines mode).

Golden line = the JSON form of the reference's
processor/logdedupprocessor/testdata/input/basicLogs.yaml plog fixture
(same tree the plog JSONUnmarshaler consumes in
receiver/otlpjsonfilereceiver/file.go:86-101).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from sparkotel.otlpjson import (
    parse_otlp_logs,
    to_otlp_logs_json,
    write_otlp_json_sink,
)

GOLDEN = (
    '{"resourceLogs":[{"resource":{"attributes":[{"key":"one","value":{"intValue":"1"}}]},'
    '"scopeLogs":[{"logRecords":['
    '{"attributes":[{"key":"bool","value":{"boolValue":true}},'
    '{"key":"str","value":{"stringValue":"attr str"}}],'
    '"body":{"stringValue":"Body of the log"},"severityText":"info","spanId":"",'
    '"timeUnixNano":"1728069266547395000","traceId":""},'
    '{"attributes":[{"key":"bool","value":{"boolValue":true}},'
    '{"key":"remove_me","value":{"boolValue":false}}],'
    '"body":{"stringValue":"Body of the log"},"severityText":"info","spanId":"",'
    '"timeUnixNano":"1728069206547395000","traceId":""}'
    '],"scope":{}}]}]}'
)


def test_parse_golden_fixture(spark):
    out = parse_otlp_logs(spark.createDataFrame([(GOLDEN,)], "line string"))
    rows = sorted(out.collect(), key=lambda r: str(r["ts"]))
    assert len(rows) == 2
    r0, r1 = rows
    assert str(r0["ts"]) == "2024-10-04 19:13:26.547395"  # ns → µs truncation
    assert r0["body"] == "Body of the log"
    assert r0["severity_text"] == "info"
    assert r0["severity_number"] == 0  # absent enum → UNSPECIFIED
    assert r0["observed_ts"] is None
    assert r0["attributes"] == {"bool": "true", "remove_me": "false"}  # AsString
    assert r1["attributes"] == {"bool": "true", "str": "attr str"}
    assert r0["resource"] == {"one": "1"}  # intValue AsString
    assert (r0["scope_name"], r0["scope_version"]) == ("", "")  # scope: {}
    assert (r0["trace_id"], r0["span_id"], r0["flags"]) == ("", "", 0)


def test_parse_multi_resource_and_bad_lines(spark):
    multi = json.dumps(
        {
            "resourceLogs": [
                {
                    "resource": {"attributes": [{"key": "r", "value": {"stringValue": "a"}}]},
                    "scopeLogs": [
                        {
                            "scope": {"name": "s1", "version": "2"},
                            "logRecords": [
                                {
                                    "timeUnixNano": "1728069266547395000",
                                    "observedTimeUnixNano": "1728069266547395001",
                                    "severityNumber": 9,
                                    "body": {"doubleValue": 1.5},
                                    "flags": 1,
                                    "traceId": "0102030405060708090a0b0c0d0e0f10",
                                    "spanId": "0102030405060708",
                                    "droppedAttributesCount": 3,
                                }
                            ],
                        },
                        {"scope": {"name": "s2"}, "logRecords": [{"body": {"boolValue": True}}]},
                    ],
                },
                {"resource": {}, "scopeLogs": [{"logRecords": [{"body": {"stringValue": "x"}}]}]},
            ]
        }
    )
    df = spark.createDataFrame([(multi,), ("not json at all",), ("{}",)], "line string")
    out = parse_otlp_logs(df).collect()
    # bad line and empty request produce no rows (receiver refuses them)
    assert len(out) == 3
    by_body = {r["body"]: r for r in out}
    r = by_body["1.5"]  # doubleValue AsString (engine cast form)
    assert r["severity_number"] == 9
    assert r["scope_name"] == "s1" and r["scope_version"] == "2"
    assert r["trace_id"] == "0102030405060708090a0b0c0d0e0f10"
    assert r["span_id"] == "0102030405060708"
    assert r["flags"] == 1 and r["dropped_attributes_count"] == 3
    assert str(r["observed_ts"]) == "2024-10-04 19:14:26.547395"
    assert by_body["true"]["scope_name"] == "s2"
    assert by_body["x"]["resource"] == {}


def _records(spark, n=12):
    rows = [
        (
            f"2024-01-0{1 + i % 3} 00:00:{10 + i}",
            5 + (i % 3) * 4,
            f"body {i}",
            {"k": str(i % 2)},
            {"service.name": f"svc{i % 2}", "host.name": f"h{i % 3}"},
            f"scope{i % 2}",
            "1.0",
            f"{i:016x}",
            i % 4,
        )
        for i in range(n)
    ]
    src = spark.createDataFrame(
        rows,
        "ts string, severity_number int, body string, attributes map<string,string>, "
        "resource map<string,string>, scope_name string, scope_version string, "
        "span_id string, flags int",
    )
    return (
        src.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        .withColumn("observed_ts", F.col("ts"))
        .withColumn("severity_text", F.lit("INFO"))
        .withColumn("trace_id", F.md5("body"))
        .withColumn("dropped_attributes_count", F.lit(0))
    )


def _row_key(r, cols):
    return tuple(
        str(sorted(r[c].items())) if isinstance(r[c], dict) else str(r[c]) for c in cols
    )


def test_marshal_structure_and_roundtrip(spark):
    src = _records(spark)
    lines = to_otlp_logs_json(src)
    # one line per resource identity (2 services × 3 hosts)
    raw = [r["line"] for r in lines.collect()]
    assert len(raw) == 6
    for line in raw:
        req = json.loads(line)
        assert list(req) == ["resourceLogs"] and len(req["resourceLogs"]) == 1
        rl = req["resourceLogs"][0]
        # single-valued on the resource (batchperresourceattr contract)
        keys = {kv["key"]: kv["value"]["stringValue"] for kv in rl["resource"]["attributes"]}
        assert set(keys) == {"service.name", "host.name"}
        for sl in rl["scopeLogs"]:
            assert sl["scope"]["name"].startswith("scope")
            for rec in sl["logRecords"]:
                assert rec["timeUnixNano"].isdigit()
                assert "flags" not in rec or rec["flags"] != 0  # proto3 omits defaults
    # unmarshal(marshal(x)) == x
    back = parse_otlp_logs(lines)
    cols = sorted(back.columns)
    a = sorted(_row_key(r, cols) for r in src.select(*cols).collect())
    b = sorted(_row_key(r, cols) for r in back.collect())
    assert a == b


def test_sink_writes_lines(spark, tmp_path):
    src = _records(spark, n=6)
    path = str(tmp_path / "otlp")
    write_otlp_json_sink(src, path)
    back = parse_otlp_logs(spark.read.text(path).withColumnRenamed("value", "line"))
    assert back.count() == 6


TRACE_LINE = json.dumps(
    {
        "resourceSpans": [
            {
                "resource": {"attributes": [{"key": "service.name", "value": {"stringValue": "svcA"}}]},
                "scopeSpans": [
                    {
                        "scope": {"name": "s"},
                        "spans": [
                            {
                                "traceId": "0af7651916cd43dd8448eb211c80319c",
                                "spanId": "b7ad6b7169203331",
                                "parentSpanId": "",
                                "name": "GET /",
                                "kind": 2,
                                "startTimeUnixNano": "1728069266547395000",
                                "endTimeUnixNano": "1728069266557395000",
                                "attributes": [{"key": "http.status_code", "value": {"intValue": "200"}}],
                                "status": {"code": 1},
                            },
                            {
                                "traceId": "0af7651916cd43dd8448eb211c80319c",
                                "spanId": "00f067aa0ba902b7",
                                "parentSpanId": "b7ad6b7169203331",
                                "name": "SELECT",
                                "kind": 3,
                                "startTimeUnixNano": "1728069266548395000",
                                "endTimeUnixNano": "1728069266549395000",
                                "status": {"code": 2, "message": "boom"},
                            },
                        ],
                    }
                ],
            }
        ]
    }
)

METRIC_LINE = json.dumps(
    {
        "resourceMetrics": [
            {
                "resource": {"attributes": [{"key": "host", "value": {"stringValue": "h1"}}]},
                "scopeMetrics": [
                    {
                        "scope": {"name": "sm"},
                        "metrics": [
                            {
                                "name": "cpu.util",
                                "unit": "1",
                                "gauge": {
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1728069266547395000",
                                            "asDouble": 0.5,
                                            "attributes": [{"key": "core", "value": {"intValue": "0"}}],
                                        }
                                    ]
                                },
                            },
                            {
                                "name": "requests",
                                "sum": {
                                    "aggregationTemporality": 2,
                                    "isMonotonic": True,
                                    "dataPoints": [
                                        {
                                            "startTimeUnixNano": "1728069266547395000",
                                            "timeUnixNano": "1728069266557395000",
                                            "asInt": "42",
                                        }
                                    ],
                                },
                            },
                            {
                                "name": "latency",
                                "histogram": {
                                    "aggregationTemporality": 1,
                                    "dataPoints": [
                                        {
                                            "timeUnixNano": "1728069266547395000",
                                            "count": "7",
                                            "sum": 3.5,
                                            "bucketCounts": ["1", "2", "4"],
                                            "explicitBounds": [0.1, 1.0],
                                        }
                                    ],
                                },
                            },
                        ],
                    }
                ],
            }
        ]
    }
)


def test_parse_traces_golden(spark):
    from sparkotel.otlpjson import parse_otlp_traces

    out = {r["span_id"]: r for r in parse_otlp_traces(
        spark.createDataFrame([(TRACE_LINE,)], "line string")).collect()}
    assert len(out) == 2
    root = out["b7ad6b7169203331"]
    assert root["trace_id"] == "0af7651916cd43dd8448eb211c80319c"
    assert root["parent_span_id"] == "" and root["kind"] == 2
    assert str(root["start_ts"]) == "2024-10-04 19:14:26.547395"
    assert str(root["end_ts"]) == "2024-10-04 19:14:26.557395"
    assert root["status_code"] == 1 and root["status_message"] == ""
    assert root["attributes"] == {"http.status_code": "200"}
    assert root["resource"] == {"service.name": "svcA"}
    child = out["00f067aa0ba902b7"]
    assert child["parent_span_id"] == "b7ad6b7169203331"
    assert child["status_code"] == 2 and child["status_message"] == "boom"
    assert child["attributes"] == {}


def test_parse_metrics_golden(spark):
    from sparkotel.otlpjson import parse_otlp_histograms, parse_otlp_metrics

    df = spark.createDataFrame([(METRIC_LINE,)], "line string")
    nums = {r["metric_name"]: r for r in parse_otlp_metrics(df).collect()}
    assert set(nums) == {"cpu.util", "requests"}
    g = nums["cpu.util"]
    assert g["metric_type"] == "gauge" and g["value"] == 0.5
    assert g["start_ts"] is None and g["attributes"] == {"core": "0"}
    s = nums["requests"]
    assert s["metric_type"] == "sum" and s["value"] == 42.0
    assert s["aggregation_temporality"] == 2 and s["is_monotonic"]
    assert str(s["start_ts"]) == "2024-10-04 19:14:26.547395"
    (h,) = parse_otlp_histograms(df).collect()
    assert h["metric_name"] == "latency"
    assert h["count"] == 7 and h["sum"] == 3.5
    assert h["bucket_counts"] == [1, 2, 4]  # uint64-strings → longs
    assert h["explicit_bounds"] == [0.1, 1.0]
    assert h["resource"] == {"host": "h1"}


def test_parsed_spans_feed_servicegraph(spark):
    """Signal interop: OTLP/JSON spans drive the servicegraph pairing
    with no adaptation beyond column selection."""
    from sparkotel.operators.aggregate import service_graph_edges
    from sparkotel.otlpjson import parse_otlp_traces

    spans = parse_otlp_traces(spark.createDataFrame([(TRACE_LINE,)], "line string"))
    typed = spans.withColumn(
        "span_type", F.when(F.col("kind") == 2, "client").otherwise("server")
    )
    edges = service_graph_edges(
        typed,
        key_cols=["trace_id"],
        order_cols=["start_ts", "span_id"],
        type_col="span_type",
        client_type="client",
        server_type="server",
        ts_col="start_ts",
    ).collect()
    assert len(edges) == 1
    assert edges[0]["latency_seconds"] == 0.001  # 548395 − 547395 µs


def test_parsed_points_feed_delta_to_cumulative(spark):
    from sparkotel.operators.aggregate import delta_to_cumulative
    from sparkotel.otlpjson import parse_otlp_metrics

    lines = []
    for i in range(3):
        lines.append(json.dumps({
            "resourceMetrics": [{
                "resource": {"attributes": [{"key": "host", "value": {"stringValue": "h1"}}]},
                "scopeMetrics": [{"scope": {"name": "sm"}, "metrics": [{
                    "name": "requests",
                    "sum": {"aggregationTemporality": 1, "isMonotonic": True,
                            "dataPoints": [{"timeUnixNano": str(1728069266547395000 + i * 10**9),
                                            "asInt": str(10 * (i + 1))}]},
                }]}],
            }]
        }))
    pts = parse_otlp_metrics(spark.createDataFrame([(l,) for l in lines], "line string"))
    out = delta_to_cumulative(pts, ["metric_name"], "ts", "value")
    vals = [r["cumulative"] for r in out.orderBy("ts").collect()]
    assert vals == [10.0, 30.0, 60.0]


def test_marshal_no_wide_shuffle_before_group(spark):
    """Plan gate: the marshal is exactly two hash exchanges (scope-level
    group, then the metadata-sized resource fold) — no extra sort or
    repartition stages sneak in."""
    src = _records(spark)
    plan = to_otlp_logs_json(src)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 2


def test_marshal_plans_are_bounded(spark):
    """each signal marshal is a metadata-width fold: hash exchanges
    only (resource/scope grouping), no sort-merge join, no Python."""
    import io
    from contextlib import redirect_stdout

    from sparkotel.otlpjson import (
        parse_otlp_logs,
        parse_otlp_metrics,
        parse_otlp_traces,
        to_otlp_logs_json,
        to_otlp_metrics_json,
        to_otlp_traces_json,
    )

    log_line = (
        '{"resourceLogs":[{"resource":{"attributes":[]},"scopeLogs":['
        '{"scope":{"name":"s"},"logRecords":[{"timeUnixNano":"1","body":{"stringValue":"b"}}]}]}]}'
    )
    trace_line = (
        '{"resourceSpans":[{"resource":{"attributes":[]},"scopeSpans":['
        '{"scope":{"name":"s"},"spans":[{"traceId":"t","spanId":"s","name":"n","kind":1,'
        '"startTimeUnixNano":"1","endTimeUnixNano":"2","status":{"code":0}}]}]}]}'
    )
    metric_line = (
        '{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":['
        '{"scope":{"name":"s"},"metrics":[{"name":"m","gauge":{"dataPoints":['
        '{"timeUnixNano":"1","asDouble":1.0}]}}]}]}]}'
    )

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    for line, parse, marshal, max_shuffles in [
        (log_line, parse_otlp_logs, to_otlp_logs_json, 2),
        (trace_line, parse_otlp_traces, to_otlp_traces_json, 2),
        (metric_line, parse_otlp_metrics, to_otlp_metrics_json, 3),
    ]:
        df = spark.createDataFrame([(line,)], "line string")
        plan = plan_of(marshal(parse(df)))
        n = sum(
            1
            for l in plan.splitlines()
            if l.strip().startswith("(") and ") Exchange" in l and "Broadcast" not in l
        )
        assert n <= max_shuffles, plan
        assert "SortMergeJoin" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


EXPH_LINE = (
    '{"resourceMetrics":[{"resource":{"attributes":[{"key":"host","value":{"stringValue":"h1"}}]},'
    '"scopeMetrics":[{"scope":{"name":"meter"},"metrics":['
    '{"name":"e.lat","exponentialHistogram":{"aggregationTemporality":1,"dataPoints":['
    '{"startTimeUnixNano":"1728069266547395000","timeUnixNano":"1728069266547395000",'
    '"count":"7","sum":3.5,"min":0.1,"max":9.0,"scale":-1,"zeroCount":"2","zeroThreshold":0.25,'
    '"positive":{"offset":-2,"bucketCounts":["1","0","4"]},'
    '"negative":{"offset":3,"bucketCounts":["2"]},'
    '"attributes":[{"key":"k","value":{"stringValue":"a"}}]},'
    '{"timeUnixNano":"1728069266547395000","count":"0","scale":0,"zeroCount":"0"}'
    ']}}]}]}]}'
)


def test_parse_exp_histograms_golden(spark):
    """ExponentialHistogramDataPoint arm (metrics.proto oneof): scale /
    zeroCount / zeroThreshold / both Buckets halves; a point with
    absent halves normalizes to pdata's zero-value Buckets (offset 0,
    empty counts)."""
    from sparkotel.otlpjson import parse_otlp_exp_histograms

    df = spark.createDataFrame([(EXPH_LINE,)], "line string")
    rows = sorted(parse_otlp_exp_histograms(df).collect(), key=lambda r: r["count"])
    assert len(rows) == 2
    empty, full = rows
    assert full["metric_name"] == "e.lat" and full["aggregation_temporality"] == 1
    assert full["count"] == 7 and full["sum"] == 3.5
    assert full["scale"] == -1 and full["zero_count"] == 2
    assert full["zero_threshold"] == 0.25
    assert full["positive_offset"] == -2
    assert full["positive_bucket_counts"] == [1, 0, 4]
    assert full["negative_offset"] == 3 and full["negative_bucket_counts"] == [2]
    assert full["resource"] == {"host": "h1"} and full["attributes"] == {"k": "a"}
    assert empty["count"] == 0 and empty["start_ts"] is None
    assert empty["positive_offset"] == 0 and empty["positive_bucket_counts"] == []
    assert empty["negative_offset"] == 0 and empty["negative_bucket_counts"] == []
    assert empty["zero_threshold"] == 0.0 and empty["min"] is None


def test_exp_histogram_marshal_roundtrip(spark):
    """parse → to_otlp_exp_histograms_json → parse is lossless, and the
    marshal omits zero-value Buckets halves (proto3-JSON default
    omission)."""
    import json as _json

    from sparkotel.otlpjson import (
        parse_otlp_exp_histograms,
        to_otlp_exp_histograms_json,
    )

    df = spark.createDataFrame([(EXPH_LINE,)], "line string")
    first = parse_otlp_exp_histograms(df)
    lines = to_otlp_exp_histograms_json(first)
    (line,) = lines.collect()
    obj = _json.loads(line["line"])
    dps = obj["resourceMetrics"][0]["scopeMetrics"][0]["metrics"][0][
        "exponentialHistogram"]["dataPoints"]
    flat = {d["count"]: d for d in dps}
    assert "negative" not in flat["0"] and "positive" not in flat["0"]
    assert "zeroThreshold" not in flat["0"]
    again = parse_otlp_exp_histograms(lines)
    key = lambda r: (r["count"], r["ts"])
    assert sorted(first.collect(), key=key) == sorted(again.collect(), key=key)


def test_exp_histogram_marshal_plan_bounded(spark):
    """marshal = the two metadata-width hash folds, no sort-merge join,
    no Python."""
    from sparkotel.otlpjson import (
        parse_otlp_exp_histograms,
        to_otlp_exp_histograms_json,
    )

    df = spark.createDataFrame([(EXPH_LINE,)], "line string")
    plan = (
        to_otlp_exp_histograms_json(parse_otlp_exp_histograms(df))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2
    assert "SortMergeJoin" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_parse_tolerates_null_numeric_fields(spark):
    """OTLP/JSON with null timeUnixNano / count / bucketCounts elements
    must degrade to NULL fields (the reference receiver drops the bad
    record; a batch engine must not die on one), not throw an ANSI cast
    error."""
    from sparkotel.otlpjson import parse_otlp_histograms, parse_otlp_traces

    # "xyz" (a malformed NON-null string) is the case that distinguishes
    # try_cast from cast: a JSON null parses to SQL NULL, which even an
    # ANSI cast tolerates, so a null-only fixture would go green against
    # the pre-fix code
    trace_line = (
        '{"resourceSpans":[{"resource":{"attributes":[]},"scopeSpans":[{'
        '"spans":[{"traceId":"0102030405060708090a0b0c0d0e0f10","spanId":'
        '"0102030405060708","name":"s","startTimeUnixNano":"xyz",'
        '"endTimeUnixNano":"2000000"}]}]}]}'
    )
    rows = parse_otlp_traces(
        spark.createDataFrame([(trace_line,)], "line string")
    ).collect()
    assert len(rows) == 1 and rows[0]["start_ts"] is None

    hist_line = (
        '{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":[{'
        '"metrics":[{"name":"h","histogram":{"dataPoints":[{'
        '"timeUnixNano":"1000000","count":"not-a-count",'
        '"bucketCounts":["1","bad","2"],"explicitBounds":[0.5,1.5]}]}}]}]}]}'
    )
    hrows = parse_otlp_histograms(
        spark.createDataFrame([(hist_line,)], "line string")
    ).collect()
    assert len(hrows) == 1
    assert hrows[0]["count"] == 0  # coalesced like an absent field
    assert list(hrows[0]["bucket_counts"]) == [1, None, 2]

    from sparkotel.otlpjson import parse_otlp_metrics

    num_line = (
        '{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":[{'
        '"metrics":[{"name":"m","sum":{"dataPoints":[{'
        '"timeUnixNano":"1000000","asInt":"12x"}]}}]}]}]}'
    )
    nrows = parse_otlp_metrics(
        spark.createDataFrame([(num_line,)], "line string")
    ).collect()
    assert len(nrows) == 1 and nrows[0]["value"] is None
