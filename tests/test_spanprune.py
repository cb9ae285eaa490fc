"""Span pruning: leaf grouping, summary spans, parent recursion,
outlier preservation (processor/spanpruningprocessor)."""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel.operators.spanprune import span_pruning

_DDL = (
    "trace_id string, span_id string, parent_span_id string, name string,"
    " kind int, start_ts timestamp_ntz, end_ts timestamp_ntz,"
    " status_code int, status_message string,"
    " attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)

_T0 = dt.datetime(2024, 1, 1)


def _s(sid, parent, name, start_ms, dur_ms, attrs=None, kind=3, status=0, trace="t1"):
    start = _T0 + dt.timedelta(milliseconds=start_ms)
    return (trace, sid, parent, name, kind, start,
            start + dt.timedelta(milliseconds=dur_ms), status, "",
            attrs or {}, {}, "tracer")


@pytest.fixture(scope="module")
def nplus1(spark):
    """root → handler → 6 identical db queries (classic N+1) + 1 odd query."""
    rows = [
        _s("r", "", "GET /orders", 0, 100, kind=2),
        _s("h", "r", "handler", 1, 95),
    ]
    rows += [
        _s(f"q{i}", "h", "SELECT orders", 2 + i, 3 + i, {"db.operation": "select"})
        for i in range(6)
    ]
    rows.append(_s("qx", "h", "INSERT orders", 20, 4, {"db.operation": "insert"}))
    return spark.createDataFrame(rows, _DDL)


def test_leaf_aggregation(spark, nplus1):
    out = span_pruning(
        nplus1, min_spans_to_aggregate=3, max_parent_depth=0,
        group_by_attributes=("db.*",),
    ).collect()
    by_name = {}
    for r in out:
        by_name.setdefault(r["name"], []).append(r)
    # six SELECTs collapse into one summary; INSERT (below minimum) survives
    assert len(by_name["SELECT orders"]) == 1
    summary = by_name["SELECT orders"][0]
    a = summary["attributes"]
    assert a["pruning.is_summary"] == "true"
    assert a["pruning.span_count"] == "6"
    assert int(a["pruning.duration_min_ns"]) == 3_000_000
    assert int(a["pruning.duration_max_ns"]) == 8_000_000
    assert int(a["pruning.duration_total_ns"]) == 33_000_000
    assert a["db.operation"] == "select"  # template attrs survive
    assert summary["parent_span_id"] == "h"
    # start/end span the union
    assert summary["start_ts"] == _T0 + dt.timedelta(milliseconds=2)
    assert summary["end_ts"] == _T0 + dt.timedelta(milliseconds=7 + 8)
    assert len(by_name["INSERT orders"]) == 1
    assert "pruning.is_summary" not in by_name["INSERT orders"][0]["attributes"]
    # root + handler untouched
    assert "GET /orders" in by_name and "handler" in by_name


def test_attribute_groups_separate(spark):
    rows = [_s("r", "", "root", 0, 50, kind=2)]
    rows += [_s(f"a{i}", "r", "q", i, 1, {"db.operation": "select"}) for i in range(3)]
    rows += [_s(f"b{i}", "r", "q", i, 1, {"db.operation": "insert"}) for i in range(3)]
    df = spark.createDataFrame(rows, _DDL)
    out = span_pruning(
        df, min_spans_to_aggregate=3, max_parent_depth=0,
        group_by_attributes=("db.operation",),
    ).collect()
    summaries = [r for r in out if r["attributes"].get("pruning.is_summary")]
    assert len(summaries) == 2
    assert {s["attributes"]["db.operation"] for s in summaries} == {"select", "insert"}


def test_parent_recursion(spark):
    """two identical handler subtrees whose leaves all aggregate →
    handlers themselves aggregate at depth 1."""
    rows = [_s("r", "", "root", 0, 100, kind=2)]
    for h in ("h1", "h2"):
        rows.append(_s(h, "r", "handler", 1, 40))
        rows += [
            _s(f"{h}q{i}", h, "SELECT x", 2 + i, 2, {"db.operation": "s"})
            for i in range(3)
        ]
    df = spark.createDataFrame(rows, _DDL)
    out = span_pruning(
        df, min_spans_to_aggregate=3, max_parent_depth=2,
        group_by_attributes=("db.*",),
    ).collect()
    handlers = [r for r in out if r["name"] == "handler"]
    # the two handlers merged into one summary
    assert len(handlers) == 1
    assert handlers[0]["attributes"]["pruning.span_count"] == "2"
    assert handlers[0]["parent_span_id"] == "r"
    # leaves group by parent NAME (not id) — one summary across both
    # subtrees — and re-point at the handler summary
    leaf_summaries = [r for r in out if r["name"] == "SELECT x"]
    assert len(leaf_summaries) == 1
    assert leaf_summaries[0]["attributes"]["pruning.span_count"] == "6"
    assert leaf_summaries[0]["parent_span_id"] == handlers[0]["span_id"]
    # depth 0 disables parent aggregation
    out0 = span_pruning(
        df, min_spans_to_aggregate=3, max_parent_depth=0,
        group_by_attributes=("db.*",),
    ).collect()
    assert len([r for r in out0 if r["name"] == "handler"]) == 2


def test_outlier_preservation(spark):
    rows = [_s("r", "", "root", 0, 5000, kind=2)]
    rows += [_s(f"q{i}", "r", "q", i, 10 + (i % 3)) for i in range(8)]
    rows.append(_s("slow", "r", "q", 30, 4000))  # extreme duration outlier
    df = spark.createDataFrame(rows, _DDL)
    out = span_pruning(
        df, min_spans_to_aggregate=3, max_parent_depth=0,
        outlier_method="iqr", preserve_outliers=True,
    ).collect()
    qs = [r for r in out if r["name"] == "q"]
    summaries = [r for r in qs if r["attributes"].get("pruning.is_summary")]
    outliers = [r for r in qs if "pruning.summary_span_id" in r["attributes"]]
    assert len(summaries) == 1
    assert summaries[0]["attributes"]["pruning.span_count"] == "8"
    assert summaries[0]["attributes"]["pruning.preserved_outlier_count"] == "1"
    assert len(outliers) == 1 and outliers[0]["span_id"] == "slow"
    assert outliers[0]["attributes"]["pruning.summary_span_id"] == summaries[0]["span_id"]


def test_determinism(spark, nplus1):
    a = sorted(map(repr, span_pruning(nplus1, 3, 0, ("db.*",)).collect()))
    b = sorted(map(repr, span_pruning(nplus1, 3, 0, ("db.*",)).collect()))
    assert a == b


def test_validation(spark, nplus1):
    with pytest.raises(ValueError, match="unknown outlier method"):
        span_pruning(nplus1, outlier_method="zscore")


def test_null_trace_id_single_group_across_batches(spark):
    """A NULL trace_id group must stay ONE group even when it fills
    whole Arrow batches: the tail-carry mask uses isna() for a NULL
    last key (`== None` is all-False in pandas), matching the old
    groupBy(trace_id) semantics where NULL is a single key.  Also
    guards the summary-id concat against a None trace_id."""
    rows = [_s("r", "", "root", 0, 100, kind=2, trace=None)]
    rows += [
        _s(f"q{i}", "r", "SELECT orders", 1 + i, 3, {"db.operation": "s"},
           trace=None)
        for i in range(6)
    ]
    # a second, real trace in the same frame for contrast
    rows += [_s("r2", "", "root", 0, 50, kind=2, trace="t9")]
    df = spark.createDataFrame(rows, _DDL)
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "2")  # force the NULL group across batches
        out = span_pruning(
            df, min_spans_to_aggregate=3, max_parent_depth=0,
            group_by_attributes=("db.*",),
        ).collect()
    finally:
        spark.conf.set(conf, old)
    selects = [r for r in out if r["name"] == "SELECT orders"]
    # all six NULL-trace leaves collapse into ONE summary (a split
    # group would leave sub-minimum fragments unaggregated or emit
    # several summaries)
    assert len(selects) == 1
    assert selects[0]["attributes"]["pruning.span_count"] == "6"
    assert selects[0]["trace_id"] is None
    assert len([r for r in out if r["trace_id"] == "t9"]) == 1


def test_nat_timestamps_in_aggregated_group(spark):
    """NULL start/end timestamps arrive in Python as pd.NaT (not None)
    after to_dict('records'); dur_ns must treat them as 0, duration
    attributes must never be the literal string 'nan', the template
    choice must stay deterministic, and the summary start/end skip NaT
    members instead of letting all-False NaT comparisons pick an
    order-dependent min/max."""
    rows = [
        _s("r", "", "root", 0, 100, kind=2),
        # three identical leaves, the middle one with a NULL end_ts
        _s("q0", "r", "SELECT x", 1, 3, {"db.operation": "s"}),
        (
            "t1", "q1", "r", "SELECT x", 3, _T0 + dt.timedelta(milliseconds=2),
            None, 0, "", {"db.operation": "s"}, {}, "tracer",
        ),
        _s("q2", "r", "SELECT x", 3, 9, {"db.operation": "s"}),
    ]
    df = spark.createDataFrame(rows, _DDL)
    out = span_pruning(
        df, min_spans_to_aggregate=3, max_parent_depth=0,
        group_by_attributes=("db.*",),
    ).collect()
    summaries = [r for r in out if r["name"] == "SELECT x"]
    assert len(summaries) == 1
    s = summaries[0]
    attrs = s["attributes"]
    for k in ("duration_min_ns", "duration_max_ns", "duration_total_ns",
              "duration_avg_ns"):
        v = attrs["pruning." + k]
        assert v == str(int(v)), f"{k} not an exact int: {v!r}"
    # NaT-duration member counts as 0 → min is 0, max is q2's 9 ms
    assert attrs["pruning.duration_min_ns"] == "0"
    assert attrs["pruning.duration_max_ns"] == str(9 * 10**6)
    # summary window = union of DEFINED times (q1's NaT end skipped)
    assert s["start_ts"] == _T0 + dt.timedelta(milliseconds=1)
    assert s["end_ts"] == _T0 + dt.timedelta(milliseconds=12)
