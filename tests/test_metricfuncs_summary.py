"""Summary-datapoint conversions and percentile extraction
(func_convert_summary_*.go, func_extract_percentile_metric.go).

The percentile table mirrors the reference's own test vectors
(func_extract_percentile_metric_test.go:185-358) case for case.
"""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel.operators import metricfuncs as MF

_TS = dt.datetime(2024, 1, 1)

_SUMM_DDL = (
    "metric_name string, unit string, start_ts timestamp_ntz, ts timestamp_ntz,"
    " count long, sum double,"
    " quantiles array<struct<quantile:double,value:double>>,"
    " attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)

_HIST_DDL = (
    "metric_name string, aggregation_temporality int, start_ts timestamp_ntz,"
    " ts timestamp_ntz, count long, sum double, min double, max double,"
    " bucket_counts array<long>, explicit_bounds array<double>,"
    " attributes map<string,string>, resource map<string,string>"
)


@pytest.fixture(scope="module")
def summaries(spark):
    return spark.createDataFrame(
        [
            ("s.latency", "ms", _TS, _TS, 42, 126.0,
             [(0.5, 10.0), (0.99, 99.0)], {"k": "x"}, {"h": "1"}, "meter"),
            ("s.size", "by", _TS, _TS, 7, 3.5,
             [(0.9, 0.9)], {"k": "y"}, {"h": "2"}, "meter"),
        ],
        _SUMM_DDL,
    )


def test_summary_count_val_to_sum(summaries):
    out = {r["metric_name"]: r
           for r in MF.convert_summary_count_val_to_sum(summaries, "delta", True).collect()}
    r = out["s.latency_count"]
    assert (r["value"], r["metric_type"], r["aggregation_temporality"],
            r["is_monotonic"], r["unit"]) == (42.0, "sum", 1, True, "ms")
    with pytest.raises(ValueError, match="unknown aggregation temporality"):
        MF.convert_summary_count_val_to_sum(summaries, "weekly", True)


def test_summary_sum_val_to_sum(summaries):
    out = {r["metric_name"]: r
           for r in MF.convert_summary_sum_val_to_sum(summaries, "cumulative", False).collect()}
    r = out["s.size_sum"]
    assert (r["value"], r["aggregation_temporality"], r["is_monotonic"]) == (3.5, 2, False)


def test_summary_quantile_val_to_gauge(summaries):
    rows = MF.convert_summary_quantile_val_to_gauge(summaries).collect()
    assert len(rows) == 3  # one gauge point per quantile value
    by = {(r["metric_name"], r["attributes"]["quantile"]): r for r in rows}
    r = by[("s.latency.quantiles", "0.99")]
    assert r["value"] == 99.0 and r["metric_type"] == "gauge"
    assert r["attributes"]["k"] == "x"  # original attrs preserved
    # custom attr key + suffix
    alt = MF.convert_summary_quantile_val_to_gauge(summaries, attr_key="q", suffix="_q").collect()
    assert {r["metric_name"] for r in alt} == {"s.latency_q", "s.size_q"}
    assert all("q" in r["attributes"] for r in alt)


# --- extract_percentile_metric: reference vector table ----------------------
# (name, count, bucket_counts, explicit_bounds, min, max, percentile,
#  want_value or None for skip)
_PCT_CASES = [
    ("empty_count", 0, [0, 0], [1.0], None, None, 50.0, None),
    ("no_buckets", 10, [], [], None, None, 50.0, None),
    ("response_time", 100, [60, 40], [1.0], None, None, 50.0, 0.8333333333333334),
    ("latency3", 115, [50, 35, 50], [1.0, 5.0], None, None, 99.0, 5.0),
    ("latency4", 115, [50, 35, 50, 15], [1.0, 3.0, 5.0], None, None, 95.0, 4.0),
    ("request_duration", 1000, [100, 400, 400, 95, 5], [0.1, 0.5, 1.0, 5.0],
     None, None, 99.5, 5.0),
    ("response_size", 100, [25, 50, 25], [100.0, 500.0], None, 750.0, 99.0, 740.0),
    ("simple", 41, [40, 1], [100.0], None, None, 75.0, 77.5),
    ("detailed", 1000, [50, 100, 200, 300, 200, 100, 50],
     [10.0, 25.0, 50.0, 100.0, 250.0, 500.0], None, None, 90.0, 375.0),
    ("timed_metric", 100, [40, 60], [10.0], None, None, 50.0, 10.0),
    ("no_bounds", 100, [100], [], 5.0, 25.0, 50.0, 15.0),
    ("no_bounds_no_minmax", 100, [100], [], None, None, 50.0, None),
    ("all_negative", 100, [100, 0], [-5.0], None, None, 50.0, -5.0),
    ("negative_with_min", 100, [100, 0], [-5.0], -10.0, None, 50.0, -7.5),
]


@pytest.mark.parametrize(
    "name,count,bc,eb,mn,mx,pct,want",
    _PCT_CASES,
    ids=[c[0] for c in _PCT_CASES],
)
def test_extract_percentile_reference_vectors(spark, name, count, bc, eb, mn, mx, pct, want):
    hist = spark.createDataFrame(
        [(name, 1, _TS, _TS, count, 0.0, mn, mx, bc, eb, {}, {})], _HIST_DDL
    )
    rows = MF.extract_percentile_metric(hist, pct).collect()
    if want is None:
        assert rows == []
    else:
        assert len(rows) == 1
        assert rows[0]["value"] == pytest.approx(want)
        sfx = f"_p{pct:g}"
        assert rows[0]["metric_name"] == name + sfx


def test_extract_percentile_suffix_and_validation(spark):
    hist = spark.createDataFrame(
        [("m", 1, _TS, _TS, 100, 0.0, None, None, [60, 40], [1.0], {}, {})], _HIST_DDL
    )
    rows = MF.extract_percentile_metric(hist, 99.5, suffix="_percentile_995").collect()
    assert rows[0]["metric_name"] == "m_percentile_995"
    for bad in (0.0, 100.0, -1.0):
        with pytest.raises(ValueError, match="percentile must be"):
            MF.extract_percentile_metric(hist, bad)


def test_parse_otlp_summaries(spark):
    from sparkotel.otlpjson import parse_otlp_summaries

    line = (
        '{"resourceMetrics":[{"resource":{"attributes":['
        '{"key":"host.name","value":{"stringValue":"h1"}}]},'
        '"scopeMetrics":[{"scope":{"name":"meter"},"metrics":['
        '{"name":"s.rt","unit":"ms","summary":{"dataPoints":['
        '{"startTimeUnixNano":"1000000000","timeUnixNano":"2000000000",'
        '"count":"7","sum":21.5,'
        '"quantileValues":[{"quantile":0.5,"value":3.0},{"quantile":0.99,"value":9.0}],'
        '"attributes":[{"key":"k","value":{"stringValue":"v"}}]}]}}]}]}]}'
    )
    df = spark.createDataFrame([(line,)], "line string")
    rows = parse_otlp_summaries(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["metric_name"], r["unit"], r["count"], r["sum"]) == ("s.rt", "ms", 7, 21.5)
    assert [(q["quantile"], q["value"]) for q in r["quantiles"]] == [(0.5, 3.0), (0.99, 9.0)]
    assert r["attributes"] == {"k": "v"}
    assert r["resource"] == {"host.name": "h1"}
