"""slowsqlconnector + exceptionsconnector semantics, mirroring the
reference's connector tests (connector/slowsqlconnector/connector_logs.go,
connector/exceptionsconnector/connector_{metrics,logs}.go) plus plan
gates: the logs arms must stay shuffle-free, the metrics arm exactly
one hash exchange."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from sparkotel.operators.spanconnect import (
    exceptions_logs,
    exceptions_metrics,
    slow_sql_logs,
)


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _spans(spark, rows):
    """rows: (name, kind, dur_ms, attrs, resource) → parse_otlp_traces shape."""
    data = [
        (
            f"{i:032x}",
            f"{i:016x}",
            "",
            name,
            kind,
            "2024-01-01 00:00:00",
            f"2024-01-01 00:00:{dur_ms / 1000:09.6f}",
            status,
            "",
            attrs,
            res,
            "tracer",
        )
        for i, (name, kind, dur_ms, status, attrs, res) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "trace_id string, span_id string, parent_span_id string, name string,"
        " kind int, start_s string, end_s string, status_code int,"
        " status_message string, attributes map<string,string>,"
        " resource map<string,string>, scope_name string",
    )
    return df.withColumns(
        {
            "start_ts": F.to_timestamp("start_s").cast("timestamp_ntz"),
            "end_ts": F.to_timestamp("end_s").cast("timestamp_ntz"),
        }
    ).drop("start_s", "end_s")


SVC = {"service.name": "svc"}


def test_slow_sql_filter_gates(spark):
    rows = [
        # kept: CLIENT, slow, mysql
        ("q1", 3, 600, 0, {"db.system.name": "mysql", "db.statement": "SELECT 1"}, SVC),
        # dropped: below threshold
        ("q2", 3, 400, 0, {"db.system.name": "mysql", "db.statement": "SELECT 2"}, SVC),
        # dropped: not CLIENT kind
        ("q3", 2, 600, 0, {"db.system.name": "mysql", "db.statement": "SELECT 3"}, SVC),
        # dropped: db system not in allow-list
        ("q4", 3, 600, 0, {"db.system.name": "redis", "db.statement": "GET 4"}, SVC),
        # dropped: no db.system.name attribute at all
        ("q5", 3, 600, 0, {"other": "x"}, SVC),
        # dropped: resource has no service.name (connector skips resource)
        ("q6", 3, 600, 0, {"db.system.name": "mysql"}, {"host": "h"}),
        # kept: exactly at threshold (>= per connector_logs.go:71)
        ("q7", 3, 500, 2, {"db.system.name": "postgresql"}, SVC),
    ]
    out = slow_sql_logs(_spans(spark, rows)).orderBy("span_id").collect()
    assert [r["attributes"]["span.name"] for r in out] == ["q1", "q7"]
    r1, r7 = out
    a = r1["attributes"]
    assert a["span.kind"] == "SPAN_KIND_CLIENT"
    assert a["status.code"] == "STATUS_CODE_UNSET"
    assert a["service.name"] == "svc"
    assert a["db.statement"] == "SELECT 1"
    assert a["db.client.operation.duration"] == str(600 * 1_000_000)
    assert (r1["severity_number"], r1["severity_text"]) == (17, "SLOW")
    # missing db.statement → "" (getValue, connector_logs.go:139-144)
    assert r7["attributes"]["db.statement"] == ""
    assert r7["attributes"]["status.code"] == "STATUS_CODE_ERROR"


def test_slow_sql_dimension_chain(spark):
    rows = [
        ("q", 3, 900, 0, {"db.system.name": "mysql", "region": "span-r"},
         {"service.name": "svc", "region": "res-r", "zone": "z1"}),
    ]
    out = slow_sql_logs(
        _spans(spark, rows),
        dimensions=[("region", None), ("zone", None), ("absent", "dflt")],
    ).collect()[0]["attributes"]
    assert out["region"] == "span-r"  # span attrs beat resource attrs
    assert out["zone"] == "z1"  # falls through to resource
    assert out["absent"] == "dflt"  # configured default


def _events_frame(spark, rows):
    """rows: (event_name, span_kind, status, event_attrs, span_attrs, res)."""
    data = [
        (
            name,
            "2024-01-01 00:00:01",
            0,
            ea,
            f"{i:032x}",
            f"{i:016x}",
            "op",
            kind,
            status,
            sa,
            res,
            "tracer",
        )
        for i, (name, kind, status, ea, sa, res) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_name string, ts_s string, event_index int,"
        " attributes map<string,string>, trace_id string, span_id string,"
        " span_name string, span_kind int, status_code int,"
        " span_attributes map<string,string>, resource map<string,string>,"
        " scope_name string",
    )
    return df.withColumn(
        "ts", F.to_timestamp("ts_s").cast("timestamp_ntz")
    ).drop("ts_s")


def test_exceptions_logs_semantics(spark):
    rows = [
        ("exception", 2, 2,
         {"exception.type": "IOError", "exception.message": "m",
          "exception.stacktrace": "st"},
         {"http.method": "GET"}, SVC),
        # no stacktrace on the event → '' attribute still present
        ("exception", 1, 0, {"exception.type": "E2"}, {}, SVC),
        # non-exception events ignored
        ("note", 2, 2, {"exception.type": "X"}, {}, SVC),
        # resource without service.name skipped entirely
        ("exception", 2, 2, {"exception.type": "X"}, {}, {"h": "x"}),
    ]
    out = exceptions_logs(
        _events_frame(spark, rows),
        dimensions=[("exception.type", None), ("exception.message", None)],
    ).orderBy("span_id").collect()
    assert len(out) == 2
    a0, a1 = out[0]["attributes"], out[1]["attributes"]
    # span attributes copied, common keys overlaid (connector_logs.go:113-127)
    assert a0["http.method"] == "GET"
    assert a0["span.kind"] == "SPAN_KIND_SERVER"
    assert a0["status.code"] == "STATUS_CODE_ERROR"
    assert a0["exception.stacktrace"] == "st"
    assert a0["exception.type"] == "IOError"
    assert a1["exception.stacktrace"] == ""  # GetAttributeValue miss → ""
    assert a1["span.kind"] == "SPAN_KIND_INTERNAL"
    assert out[0]["severity_text"] == "ERROR"


def test_exceptions_metrics_grouping_and_dim_precedence(spark):
    rows = [
        # two identical exceptions → one group, count 2
        ("exception", 2, 2, {"exception.type": "A", "exception.message": "m"}, {}, SVC),
        ("exception", 2, 2, {"exception.type": "A", "exception.message": "m"}, {}, SVC),
        # span attr beats event attr for the dimension (GetDimensionValue order)
        ("exception", 2, 2, {"exception.type": "B"},
         {"exception.type": "SPAN-WINS"}, SVC),
        ("note", 2, 2, {"exception.type": "A", "exception.message": "m"}, {}, SVC),
    ]
    out = {
        (r["exception_type"], r["exceptions_total"])
        for r in exceptions_metrics(_events_frame(spark, rows)).collect()
    }
    assert out == {("A", 2), ("SPAN-WINS", 1)}


def test_plan_shapes(spark):
    rows = [("exception", 2, 2, {"exception.type": "A"}, {}, SVC)]
    ev = _events_frame(spark, rows)
    sp = _spans(spark, [("q", 3, 900, 0, {"db.system.name": "mysql"}, SVC)])
    # logs arms: pure filter+projection, zero Exchange
    assert "Exchange" not in plan_of(slow_sql_logs(sp))
    assert "Exchange" not in plan_of(exceptions_logs(ev))
    # metrics arm: exactly one shuffle (map-side partial agg before it)
    plan = plan_of(exceptions_metrics(ev))
    n_shuffle = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Exchange" in l and "Broadcast" not in l
    )
    assert n_shuffle == 1, plan
    assert "partial" in plan.lower()


def test_spanmetrics_events_dim_precedence_and_counting(spark):
    from sparkotel.operators.spanconnect import spanmetrics_events

    rows = [
        # event attr wins over resource attr in the merged map, but span
        # attrs beat both (buildKey lookup order)
        ("e1", 2, 0, {"region": "event-r"}, {},
         {"service.name": "svc", "region": "res-r"}),
        ("e2", 2, 0, {}, {"region": "span-r"},
         {"service.name": "svc", "region": "res-r"}),
        # dim missing everywhere → NULL key, event still counted
        ("e3", 2, 0, {}, {}, SVC),
        # resource without service.name skipped
        ("e4", 2, 0, {}, {}, {"h": "x"}),
    ]
    out = {
        (r["region"] if "region" in r.__fields__ else None, r["events_total"])
        for r in spanmetrics_events(
            _events_frame(spark, rows), event_dimensions=[("region", None)]
        ).collect()
    }
    assert out == {("event-r", 1), ("span-r", 1), (None, 1)}
