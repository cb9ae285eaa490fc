"""signaltometricsconnector semantics: attribute gating
(required/default/optional), OR-ed conditions, AdjustedCount,
SearchFloat64s bucket edges, gauge last-wins, plan shape."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from sparkotel.operators.signaltometrics import Attr, MetricDef, signal_to_metrics


def _spans(spark, rows):
    """rows: (svc, attrs, dur_ms, trace_state)."""
    data = [
        (
            f"{i:016x}",
            "op",
            3,
            "2024-01-01 00:00:00",
            f"2024-01-01 00:00:{dur_ms / 1000:09.6f}",
            0,
            ts or "",
            attrs,
            {"service.name": svc},
        )
        for i, (svc, attrs, dur_ms, ts) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "span_id string, name string, kind int, start_s string, end_s string,"
        " status_code int, trace_state string, attributes map<string,string>,"
        " resource map<string,string>",
    )
    return df.withColumns(
        {
            "start_ts": F.to_timestamp("start_s").cast("timestamp_ntz"),
            "end_ts": F.to_timestamp("end_s").cast("timestamp_ntz"),
        }
    ).drop("start_s", "end_s")


def test_attribute_gating(spark):
    rows = [
        ("a", {"env": "prod", "zone": "z1"}, 100, None),
        ("a", {"zone": "z1"}, 100, None),  # missing required env → skipped
        ("a", {"env": "prod"}, 100, None),  # optional zone missing → kept, NULL
    ]
    d = MetricDef(
        name="m",
        metric_type="sum",
        value="1",
        attributes=(
            Attr("env"),
            Attr("region", default_value="eu"),
            Attr("zone", optional=True),
        ),
        include_resource_attributes=(Attr("service.name"),),
    )
    out = {
        (r["env"], r["region"], r["zone"]): r["value"]
        for r in signal_to_metrics(_spans(spark, rows), d).collect()
    }
    assert out == {("prod", "eu", "z1"): 1, ("prod", "eu", None): 1}


def test_conditions_are_ored(spark):
    rows = [
        ("a", {"x": "1"}, 100, None),
        ("a", {"y": "1"}, 100, None),
        ("a", {}, 100, None),
    ]
    d = MetricDef(
        name="m",
        value="1",
        conditions=('attributes["x"] != nil', 'attributes["y"] != nil'),
        include_resource_attributes=(Attr("service.name"),),
    )
    out = signal_to_metrics(_spans(spark, rows), d).collect()
    assert out[0]["value"] == 2  # third span matches neither condition


def test_adjusted_count(spark):
    # th:8 → threshold 2^55 → p=1/2 → adjusted count 2; th:c → p=1/4 → 4;
    # th:0 → always-sample → 1; no tracestate → 1; other members ignored
    rows = [
        ("a", {}, 100, "ot=th:8"),
        ("a", {}, 100, "congo=t61rcWkgMzE,ot=p:8;th:c"),
        ("a", {}, 100, "ot=th:0"),
        ("a", {}, 100, None),
    ]
    d = MetricDef(
        name="m",
        metric_type="sum",
        value="Int(AdjustedCount())",
        include_resource_attributes=(Attr("service.name"),),
    )
    out = signal_to_metrics(_spans(spark, rows), d).collect()
    assert out[0]["value"] == 2 + 4 + 1 + 1


def test_histogram_bucket_edges(spark):
    # SearchFloat64s semantics: value == bound → that bound's bucket
    # (upper-inclusive); below first bound → bucket 0; above last → last
    rows = [
        ("a", {}, 2, None),  # v=2.0 == bounds[0] → bucket 0
        ("a", {}, 2, None),
        ("a", {}, 3, None),  # (2,4] → bucket 1
        ("a", {}, 9000, None),  # > 5000 → bucket 3 (last)
    ]
    d = MetricDef(
        name="m",
        metric_type="histogram",
        value="Seconds(span.end_time - span.start_time) * 1000",
        buckets=(2.0, 4.0, 5000.0),
        include_resource_attributes=(Attr("service.name"),),
    )
    r = signal_to_metrics(_spans(spark, rows), d).collect()[0]
    assert r["bucket_counts"] == [2, 1, 0, 1]
    assert r["count"] == 4
    assert abs(r["sum"] - (2 + 2 + 3 + 9000)) < 1e-6
    assert r["explicit_bounds"] == [2.0, 4.0, 5000.0]


def test_histogram_count_weighting(spark):
    rows = [("a", {}, 3, "ot=th:8")]  # adjusted count 2
    d = MetricDef(
        name="m",
        metric_type="histogram",
        value="Seconds(span.end_time - span.start_time) * 1000",
        count="Int(AdjustedCount())",
        buckets=(2.0, 4.0),
        include_resource_attributes=(Attr("service.name"),),
    )
    r = signal_to_metrics(_spans(spark, rows), d).collect()[0]
    assert r["bucket_counts"] == [0, 2, 0]
    assert r["count"] == 2
    assert abs(r["sum"] - 6.0) < 1e-6  # value * count


def test_gauge_last_wins(spark):
    from pyspark.sql import Row

    df = _spans(
        spark,
        [("a", {"v": "1"}, 100, None), ("a", {"v": "9"}, 100, None)],
    )
    # stagger start times: second span is later → its value wins
    df = df.withColumn(
        "start_ts",
        F.when(F.col("attributes")["v"] == "9",
               F.expr("start_ts + INTERVAL 1 SECOND")).otherwise(F.col("start_ts")),
    )
    d = MetricDef(
        name="m",
        metric_type="gauge",
        value='Int(attributes["v"])',
        include_resource_attributes=(Attr("service.name"),),
    )
    assert signal_to_metrics(df, d).collect()[0]["value"] == 9


def test_one_shuffle(spark):
    d = MetricDef(
        name="m",
        metric_type="histogram",
        value="Seconds(span.end_time - span.start_time) * 1000",
        include_resource_attributes=(Attr("service.name"),),
    )
    out = signal_to_metrics(_spans(spark, [("a", {}, 5, None)]), d)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    n_shuffle = sum(
        1
        for l in plan.splitlines()
        if l.strip().startswith("(") and ") Exchange" in l and "Broadcast" not in l
    )
    assert n_shuffle == 1, plan
    assert "partial" in plan.lower()


def test_readme_grok_gauge_over_otlp_log_frame(spark):
    """The README's logs example: ExtractGrokPatterns gauge over a
    frame with a literal `body` column (the OTLP/JSON log frame shape) —
    the log-context alias (body→text on the pages frame) must fall back
    to the frame's own column."""
    df = spark.createDataFrame(
        [
            ("Memory usage 512MB", "2024-01-01 00:00:00", {}, {"service.name": "s"}),
            ("Memory usage 256MB", "2024-01-01 00:00:01", {}, {"service.name": "s"}),
        ],
        "body string, ts_s string, attributes map<string,string>,"
        " resource map<string,string>",
    )
    df = df.withColumn("ts", F.to_timestamp("ts_s").cast("timestamp_ntz")).drop("ts_s")
    d = MetricDef(
        name="logs.memory_mb",
        metric_type="gauge",
        value='Int(ExtractGrokPatterns(body, "Memory usage %{NUMBER:memory_mb:int}MB")'
        '["memory_mb"])',
        include_resource_attributes=(Attr("service.name"),),
    )
    assert signal_to_metrics(df, d, ctx="log").collect()[0]["value"] == 256


def test_error_mode_ignore_skips_bad_records(spark):
    """README error handling: ignore/silent skip records whose value
    extraction failed (NULL in the column engine) instead of failing."""
    rows = [
        ("a", {"n": "5"}, 100, None),
        ("a", {"n": "not-a-number"}, 100, None),
        ("a", {}, 100, None),
    ]
    d = MetricDef(
        name="m",
        metric_type="sum",
        value='Int(attributes["n"])',
        include_resource_attributes=(Attr("service.name"),),
        error_mode="ignore",
    )
    out = signal_to_metrics(_spans(spark, rows), d).collect()
    assert out[0]["value"] == 5  # the two unparseable records skipped


def test_histogram_null_value_consistency(spark):
    """in ignore mode, a record whose value extraction fails (NULL)
    must not inflate the histogram count without landing in a bucket."""
    rows = [
        ("a", {"n": "5"}, 100, None),
        ("a", {}, 100, None),  # Int(missing) → NULL
    ]
    d = MetricDef(
        name="m",
        metric_type="histogram",
        value='Int(attributes["n"])',
        buckets=(2.0, 10.0),
        include_resource_attributes=(Attr("service.name"),),
        error_mode="ignore",
    )
    r = signal_to_metrics(_spans(spark, rows), d).collect()[0]
    assert r["count"] == sum(r["bucket_counts"]) == 1


def test_error_mode_propagate_fails_on_null_extraction(spark):
    """README error handling: propagate (the default) fails the
    pipeline on a record whose value expression errors, rather than
    silently dropping it through NULL-skipping aggregates."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    rows = [
        ("a", {"n": "5"}, 100, None),
        ("a", {}, 100, None),  # Int(missing) → NULL
    ]
    for mt, extra in [
        ("sum", {}),
        ("gauge", {}),
        ("histogram", {"buckets": (2.0, 10.0)}),
    ]:
        d = MetricDef(
            name="m",
            metric_type=mt,
            value='Int(attributes["n"])',
            include_resource_attributes=(Attr("service.name"),),
            **extra,
        )
        with pytest.raises(SparkRuntimeException, match="error_mode=propagate"):
            signal_to_metrics(_spans(spark, rows), d).collect()
    # clean input under propagate still succeeds
    d = MetricDef(
        name="m",
        metric_type="sum",
        value='Int(attributes["n"])',
        include_resource_attributes=(Attr("service.name"),),
    )
    out = signal_to_metrics(_spans(spark, [("a", {"n": "5"}, 100, None)]), d)
    assert out.collect()[0]["value"] == 5
