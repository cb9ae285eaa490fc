"""transformprocessor metric-context functions over the canonical
number-point / histogram-point frames
(processor/transformprocessor/internal/metrics/func_*.go)."""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel.operators import metricfuncs as MF

_TS = dt.datetime(2024, 1, 1)

_PT_DDL = (
    "metric_name string, unit string, metric_type string,"
    " aggregation_temporality int, is_monotonic boolean,"
    " start_ts timestamp_ntz, ts timestamp_ntz, value double,"
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
def points(spark):
    return spark.createDataFrame(
        [
            ("m.a", "ms", "gauge", 0, False, None, _TS, 1.5,
             {"k": "x", "j": "1"}, {"h": "1"}, "s"),
            ("m.a", "ms", "gauge", 0, False, None, _TS, 2.5,
             {"k": "x", "j": "2"}, {"h": "1"}, "s"),
            ("m.b", "ms", "sum", 2, True, _TS, _TS, 4.0,
             {"k": "y"}, {"h": "1"}, "s"),
        ],
        _PT_DDL,
    )


@pytest.fixture(scope="module")
def hist(spark):
    return spark.createDataFrame(
        [
            ("h", 1, _TS, _TS, 10, 55.0, 1.0, 9.0, [1, 2, 3, 4],
             [1.0, 2.0, 5.0], {"k": "x"}, {"h": "1"}),
            ("seven", 1, _TS, _TS, 28, 99.0, 0.5, 12.0, [1, 2, 3, 4, 5, 6, 7],
             [1.0, 2.0, 3.0, 4.0, 5.0, 6.0], {"k": "y"}, {"h": "1"}),
            # malformed: len(bounds)+1 != len(counts) — must pass through
            ("bad", 1, _TS, _TS, 3, 3.0, 1.0, 2.0, [1, 2],
             [1.0, 2.0, 3.0], {"k": "z"}, {"h": "1"}),
        ],
        _HIST_DDL,
    )


def test_convert_sum_to_gauge(points):
    # sums become gauges; temporality/monotonic reset; gauges untouched
    # (func_convert_sum_to_gauge.go:23-37)
    out = {
        r["metric_name"]: r
        for r in MF.convert_sum_to_gauge(points)
        .select("metric_name", "metric_type", "aggregation_temporality", "is_monotonic")
        .distinct()
        .collect()
    }
    assert out["m.b"]["metric_type"] == "gauge"
    assert out["m.b"]["aggregation_temporality"] == 0
    assert out["m.b"]["is_monotonic"] is False
    assert out["m.a"]["metric_type"] == "gauge"


def test_convert_gauge_to_sum(points):
    out = {
        (r["metric_name"], r["value"]): r
        for r in MF.convert_gauge_to_sum(points, "delta", True).collect()
    }
    assert out[("m.a", 1.5)]["metric_type"] == "sum"
    assert out[("m.a", 1.5)]["aggregation_temporality"] == 1
    assert out[("m.a", 1.5)]["is_monotonic"] is True
    # existing sum keeps its own temporality (func only hits gauges)
    assert out[("m.b", 4.0)]["aggregation_temporality"] == 2
    with pytest.raises(ValueError, match="unknown aggregation temporality"):
        MF.convert_gauge_to_sum(points, "weekly", True)


def test_scale_metric_and_unit(points):
    rows = MF.scale_metric(points, 2.0, unit="s").select("unit", "value").collect()
    assert sorted(r["value"] for r in rows) == [3.0, 5.0, 8.0]
    assert {r["unit"] for r in rows} == {"s"}


def test_scale_histogram(hist):
    r = {
        r["metric_name"]: r
        for r in MF.scale_histogram(hist, 2.0).collect()
    }["h"]
    # sum/min/max and every bound double; counts don't (func_scale.go:93-117)
    assert (r["sum"], r["min"], r["max"]) == (110.0, 2.0, 18.0)
    assert r["explicit_bounds"] == [2.0, 4.0, 10.0]
    assert r["bucket_counts"] == [1, 2, 3, 4]


def test_copy_metric(points, spark):
    from pyspark.sql import functions as F

    out = MF.copy_metric(points, name="m.copy", where=F.col("metric_name") == "m.b")
    assert out.count() == 4
    copy = out.where(F.col("metric_name") == "m.copy").collect()
    assert len(copy) == 1 and copy[0]["value"] == 4.0


def test_aggregate_on_attributes(points):
    out = {
        r["metric_name"]: r
        for r in MF.aggregate_on_attributes(points, "sum", ["k"]).collect()
    }
    # the two m.a points collide once j is dropped → values sum
    assert out["m.a"]["value"] == 4.0
    assert out["m.a"]["attributes"] == {"k": "x"}
    assert out["m.b"]["value"] == 4.0
    with pytest.raises(ValueError, match="invalid aggregation function"):
        MF.aggregate_on_attributes(points, "p99", ["k"])


def test_aggregate_on_attributes_drop_all(points):
    out = {
        r["metric_name"]: r
        for r in MF.aggregate_on_attributes(points, "count").collect()
    }
    assert out["m.a"]["value"] == 2.0
    assert out["m.a"]["attributes"] == {}


def test_aggregate_on_attribute_value(points):
    # j∈{1,2} rewrites to "all" → the two m.a points collide
    out = {
        r["metric_name"]: r
        for r in MF.aggregate_on_attribute_value(
            points, "max", "j", ["1", "2"], "all"
        ).collect()
    }
    assert out["m.a"]["value"] == 2.5
    assert out["m.a"]["attributes"] == {"k": "x", "j": "all"}
    assert out["m.b"]["attributes"] == {"k": "y"}


def test_extract_sum_and_count(hist):
    sums = {r["metric_name"]: r for r in MF.extract_sum_metric(hist, False).collect()}
    assert sums["h_sum"]["value"] == 55.0
    assert sums["h_sum"]["metric_type"] == "sum"
    assert sums["h_sum"]["aggregation_temporality"] == 1
    counts = {r["metric_name"]: r for r in MF.extract_count_metric(hist, True).collect()}
    assert counts["h_count"]["value"] == 10.0
    assert counts["h_count"]["is_monotonic"] is True


def test_merge_buckets_remove_explicit_bound(hist):
    out = {
        r["metric_name"]: r
        for r in MF.merge_histogram_buckets(hist, 2.0, "remove_explicit_bound").collect()
    }
    # bucket at bound 2.0 folds right (func_merge_histogram_buckets.go:117-144)
    assert out["h"]["bucket_counts"] == [1, 5, 4]
    assert out["h"]["explicit_bounds"] == [1.0, 5.0]
    assert out["seven"]["bucket_counts"] == [1, 5, 4, 5, 6, 7]
    # malformed point untouched
    assert out["bad"]["bucket_counts"] == [1, 2]
    # absent bound → no-op
    noop = {
        r["metric_name"]: r
        for r in MF.merge_histogram_buckets(hist, 99.0, "remove_explicit_bound").collect()
    }
    assert noop["h"]["bucket_counts"] == [1, 2, 3, 4]


def test_merge_buckets_limit(hist):
    out = {
        r["metric_name"]: r
        for r in MF.merge_histogram_buckets(hist, 3, "limit_buckets").collect()
    }
    # divisor = ceil(7/3) = 3 → [1+2+3, 4+5+6, 7], bounds at i=2,5
    # (func_merge_histogram_buckets.go:153-198)
    assert out["seven"]["bucket_counts"] == [6, 15, 7]
    assert out["seven"]["explicit_bounds"] == [3.0, 6.0]
    assert out["h"]["bucket_counts"] == [3, 7]
    assert out["h"]["explicit_bounds"] == [2.0]
    assert out["bad"]["bucket_counts"] == [1, 2]
    with pytest.raises(ValueError, match="positive integer"):
        MF.merge_histogram_buckets(hist, 2.5, "limit_buckets")
    with pytest.raises(ValueError, match="unsupported method"):
        MF.merge_histogram_buckets(hist, 2, "squash")
