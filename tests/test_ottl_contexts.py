"""OTTL span / datapoint context path resolution over the OTLP frames.

The reference binds one path table per signal context
(pkg/ottl/contexts/ottlspan/span.go, pkg/ottl/contexts/ottldatapoint/
datapoint.go); since collector 0.120 statements spell paths with an
explicit context prefix (``span.status.code``) while the historical bare
form (``status.code``) remains equivalent.  The engine's canonical frames
are parse_otlp_traces / parse_otlp_metrics output, so these tests build
rows in exactly those schemas and assert statement semantics for both
spellings.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel import expr as X

_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

_SPAN_DDL = (
    "trace_id string, span_id string, parent_span_id string, name string,"
    " kind int, start_ts timestamp_ntz, end_ts timestamp_ntz,"
    " status_code int, status_message string,"
    " attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)

_DP_DDL = (
    "metric_name string, unit string, metric_type string,"
    " aggregation_temporality int, is_monotonic boolean,"
    " start_ts timestamp_ntz, ts timestamp_ntz, value double,"
    " attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)


@pytest.fixture(scope="module")
def spans(spark):
    return spark.createDataFrame(
        [
            ("t1", "s1", "", "op-a", 2, _TS, _TS, 2, "boom",
             {"user.id": "7"}, {"service.name": "svc-1"}, "tracer"),
            ("t1", "s2", "s1", "op-b", 3, _TS, _TS, 1, "",
             {"user.id": "8"}, {"service.name": "svc-1"}, "tracer"),
            ("t2", "s3", "", "op-c", 1, _TS, _TS, 0, "",
             {"user.id": "9"}, {"service.name": "svc-2"}, "tracer"),
        ],
        _SPAN_DDL,
    )


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(
        [
            ("m.click", "ms", "gauge", 0, False, None, _TS, 1.5,
             {"k": "a"}, {"host.name": "h1"}, "meter"),
            ("m.buy", "ms", "sum", 2, True, _TS, _TS, 4.0,
             {"k": "b"}, {"host.name": "h2"}, "meter"),
        ],
        _DP_DDL,
    )


def test_span_status_paths(spark, spans):
    # span.status.code / span.status.message are two-segment flattened
    # columns (ottlspan README "span.status.code"); both prefixed and
    # bare spellings hit the same column.
    out = X.apply_statements(
        spans,
        [
            'set(span.status.message, "exploded") where span.status.code == 2',
            'set(status.message, "fine") where status.code == 1',
        ],
        ctx="span",
    )
    msgs = {r["span_id"]: r["status_message"] for r in out.collect()}
    assert msgs == {"s1": "exploded", "s2": "fine", "s3": ""}


def test_span_scope_and_resource(spark, spans):
    out = X.apply_statements(
        spans,
        [
            'set(span.attributes["scope"], instrumentation_scope.name)',
            'set(span.attributes["svc"], resource.attributes["service.name"])',
            'set(span.name, Concat([instrumentation_scope.name, span.name], "/"))'
            " where span.kind == 3",
        ],
        ctx="span",
    )
    rows = {r["span_id"]: r for r in out.collect()}
    assert rows["s1"]["scope"] == "tracer" and rows["s1"]["svc"] == "svc-1"
    assert rows["s2"]["name"] == "tracer/op-b"  # kind==3 only
    assert rows["s1"]["name"] == "op-a"


def test_span_time_aliases(spark, spans):
    # start_time / start_time_unix_nano both alias the start_ts column
    # (the engine's timestamps carry the value; README start_time rows).
    out = X.apply_statements(
        spans,
        ['set(span.attributes["t"], String(span.start_time))'],
        ctx="span",
    )
    assert all(r["t"].startswith("2024-01-01") for r in out.collect())
    out2 = X.apply_statements(
        spans, ["set(end_time, start_time_unix_nano)"], ctx="span"
    )
    assert all(r["end_ts"] == r["start_ts"] for r in out2.collect())


def test_datapoint_value_and_metric_paths(spark, points):
    # datapoint.value_double / value_int collapse to the canonical
    # double `value` column; metric.* paths read the enclosing-metric
    # header columns (ottldatapoint README).
    out = X.apply_statements(
        points,
        [
            "set(datapoint.value_double, datapoint.value_double * 1000)"
            ' where metric.unit == "ms"',
            'set(datapoint.attributes["mtype"], metric.type)',
            'set(metric.name, Concat([metric.name, "scaled"], "."))'
            " where datapoint.value_int >= 4000",
        ],
        ctx="datapoint",
    )
    rows = {r["attributes"]["k"]: r for r in out.collect()}
    assert rows["a"]["value"] == 1500.0 and rows["b"]["value"] == 4000.0
    assert rows["a"]["mtype"] == "gauge" and rows["b"]["mtype"] == "sum"
    assert rows["b"]["metric_name"] == "m.buy.scaled"
    assert rows["a"]["metric_name"] == "m.click"


def test_datapoint_temporality_filter(spark, points):
    # metric.aggregation_temporality / metric.is_monotonic as gates —
    # the shape filterprocessor metric configs use.
    out = X.apply_statements(
        points,
        [
            'set(datapoint.attributes["delta"], "no")',
            'set(datapoint.attributes["delta"], "cumulative")'
            " where metric.aggregation_temporality == 2 and metric.is_monotonic",
        ],
        ctx="datapoint",
    )
    rows = {r["attributes"]["k"]: r for r in out.collect()}
    assert rows["b"]["delta"] == "cumulative" and rows["a"]["delta"] == "no"


def test_log_ctx_prefix_still_resolves(spark):
    # the log context accepts the explicit `log.` prefix too; `body`
    # aliases the engine's canonical `text` column either way
    df = spark.createDataFrame(
        [("hello", 5)], "text string, severity_number int"
    )
    out = X.apply_statements(
        df, ['set(log.body, "HI") where log.severity_number == 5']
    )
    assert out.collect()[0]["text"] == "HI"


def test_is_root_span(spark, spans):
    # IsRootSpan() — ParentSpanID().IsEmpty()
    # (pkg/ottl/ottlfuncs/func_is_root_span.go); s1/s3 have empty parents
    out = X.apply_statements(
        spans,
        ['set(span.attributes["root"], "yes") where IsRootSpan()'],
        ctx="span",
    )
    # promoted-column write model: the new attribute lands in its own column
    rows = {r["span_id"]: r["root"] for r in out.collect()}
    assert rows == {"s1": "yes", "s2": None, "s3": "yes"}


def test_is_root_span_log_ctx_rejected(spark):
    df = spark.createDataFrame([("x",)], "text string")
    import pytest as _pt

    with _pt.raises(NameError, match="only available in the span context"):
        X.apply_statements(df, ['set(attributes["r"], IsRootSpan())'])


_SE_DDL = (
    "event_name string, ts timestamp_ntz, event_index int,"
    " attributes map<string,string>, trace_id string, span_id string,"
    " span_name string, span_kind int, status_code int,"
    " span_attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)


@pytest.fixture(scope="module")
def spanevents(spark):
    return spark.createDataFrame(
        [
            ("exception", _TS, 0, {"exception.type": "IOError"},
             "t1", "s1", "op-a", 2, 2, {"user.id": "7"},
             {"service.name": "svc-1"}, "tracer"),
            ("retry", _TS, 1, {"attempt": "2"},
             "t1", "s1", "op-a", 2, 2, {"user.id": "7"},
             {"service.name": "svc-1"}, "tracer"),
            ("enqueue", _TS, 0, {"queue": "q1"},
             "t2", "s3", "op-c", 1, 0, {"user.id": "9"},
             {"service.name": "svc-2"}, "tracer"),
        ],
        _SE_DDL,
    )


def test_spanevent_paths(spark, spanevents):
    # ottlspanevent: bare paths name the EVENT, span.* the parent span,
    # event_index the position (pkg/ottl/contexts/ottlspanevent)
    out = X.apply_statements(
        spanevents,
        [
            'set(spanevent.attributes["err"], span.status.code)'
            ' where spanevent.name == "exception"',
            'set(spanevent.attributes["svc"], resource.attributes["service.name"])',
            'set(spanevent.name, Concat([span.name, spanevent.name], ":"))'
            " where event_index == 0",
        ],
        ctx="spanevent",
    )
    rows = {(r["span_id"], r["event_index"]): r for r in out.collect()}
    assert rows[("s1", 0)]["event_name"] == "op-a:exception"
    assert rows[("s1", 0)]["err"] == 2
    assert rows[("s1", 1)]["event_name"] == "retry"
    assert rows[("s1", 1)]["err"] is None
    assert rows[("s3", 0)]["event_name"] == "op-c:enqueue"
    assert rows[("s3", 0)]["svc"] == "svc-2"


def test_spanevent_span_attr_read(spark, spanevents):
    out = X.apply_statements(
        spanevents,
        ['set(spanevent.attributes["uid"], span.attributes["user.id"])'],
        ctx="spanevent",
    )
    assert {r["uid"] for r in out.collect()} == {"7", "9"}


def test_parse_otlp_spanevents(spark):
    from sparkotel.otlpjson import parse_otlp_spanevents

    line = (
        '{"resourceSpans":[{"resource":{"attributes":['
        '{"key":"service.name","value":{"stringValue":"svc"}}]},'
        '"scopeSpans":[{"scope":{"name":"tracer"},"spans":['
        '{"traceId":"t1","spanId":"s1","name":"op","kind":2,'
        '"startTimeUnixNano":"1000000000","endTimeUnixNano":"2000000000",'
        '"status":{"code":1},'
        '"events":[{"timeUnixNano":"1500000000","name":"ev-a",'
        '"attributes":[{"key":"k","value":{"stringValue":"v"}}]},'
        '{"timeUnixNano":"1600000000","name":"ev-b"}]}]}]}]}'
    )
    df = spark.createDataFrame([(line,)], "line string")
    rows = sorted(parse_otlp_spanevents(df).collect(), key=lambda r: r["event_index"])
    assert [(r["event_name"], r["event_index"]) for r in rows] == [("ev-a", 0), ("ev-b", 1)]
    assert rows[0]["attributes"] == {"k": "v"}
    assert rows[0]["span_name"] == "op" and rows[0]["status_code"] == 1
    assert rows[0]["resource"] == {"service.name": "svc"}


def test_infer_context_priority_table(spark):
    """mirror of pkg/ottl/context_inferrer_test.go rows that map onto
    the engine's selectable tables (log/span/datapoint/spanevent):
    highest-priority path context wins; metric.* infers datapoint;
    bare or resource-only paths leave the context undetermined."""
    from sparkotel.expr import infer_context

    # spanevent outranks span and resource (test row 55-56)
    assert (
        infer_context(["set(span.foo, resource.value) where spanevent.bar == true"])
        == "spanevent"
    )
    # same-context statements (row 91-92)
    assert infer_context(["set(span.foo, true) where span.bar == true"]) == "span"
    # metric paths select the datapoint table (rows 97-103)
    assert (
        infer_context(['set(metric.is_foo, true) where metric.name == "foo"'])
        == "datapoint"
    )
    # datapoint outranks metric and span
    assert (
        infer_context(["set(datapoint.value_double, 1.0) where span.kind == 2"])
        == "datapoint"
    )
    # log outranks everything
    assert infer_context(["set(log.body, span.name)"]) == "log"
    # bare paths: no candidate (row 74-75)
    assert infer_context(["set(foo, true) where bar == true"]) is None
    # resource/scope-only paths don't pin a signal table (engine scoping;
    # the reference would select the resource context itself)
    assert infer_context(['set(resource.attributes["a"], "b")']) is None
    # conditions-only inference (inferFromConditions)
    assert infer_context(conditions=["span.status.code == 2"]) == "span"
    # paths inside converter args and list literals are seen
    assert (
        infer_context(['set(log.attributes["x"], Concat([span.name, "a"], "-"))'])
        == "log"
    )


def test_apply_statements_infers_context(spark):
    """ctx=None end-to-end: the span table is inferred and the existing
    explicit-ctx result is reproduced; uninferrable statements raise."""
    import pytest

    from sparkotel.expr import apply_statements

    df = spark.createDataFrame(
        [("s1", 2, {"k": "v"})],
        "name string, kind int, attributes map<string,string>",
    )
    stmts = ['set(span.name, "renamed") where span.kind == 2']
    inferred = apply_statements(df, stmts, ctx=None).collect()
    explicit = apply_statements(df, stmts, ctx="span").collect()
    assert inferred == explicit and inferred[0]["name"] == "renamed"
    with pytest.raises(ValueError, match="cannot infer OTTL context"):
        apply_statements(df, ['set(attributes["a"], "b")'], ctx=None)
