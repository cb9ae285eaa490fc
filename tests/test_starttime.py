"""metricstarttimeprocessor strategies over the number-point frame
(internal/{truereset,subtractinitial,starttimemetric}/adjuster.go)."""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel.operators.starttime import adjust_start_time

_DDL = (
    "metric_name string, unit string, metric_type string,"
    " aggregation_temporality int, is_monotonic boolean,"
    " start_ts timestamp_ntz, ts timestamp_ntz, value double,"
    " attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _row(ts, value, name="c", start=None, mtype="sum", temp=2):
    return (name, "", mtype, temp, True, start, ts, value, {}, {"h": "1"}, "s")


@pytest.fixture(scope="module")
def series(spark):
    # one series with a reset at t=30 (value drops 50 → 7)
    return spark.createDataFrame(
        [
            _row(_t(10), 10.0),
            _row(_t(20), 50.0),
            _row(_t(30), 7.0),
            _row(_t(40), 9.0),
            # a gauge and a delta sum pass through untouched
            _row(_t(10), 1.0, name="g", mtype="gauge", temp=0),
            _row(_t(10), 1.0, name="d", temp=1),
            # a sum with a valid start is reported as-is
            _row(_t(20), 3.0, name="ok", start=_t(5)),
        ],
        _DDL,
    )


def test_true_reset_point(spark, series):
    out = {
        (r["metric_name"], r["ts"]): r
        for r in adjust_start_time(series, "true_reset_point").collect()
    }
    # first point: start = own ts (True Reset, truereset/adjuster.go:208)
    assert out[("c", _t(10))]["start_ts"] == _t(10)
    assert out[("c", _t(20))]["start_ts"] == _t(10)
    # reset (50 → 7): new anchor at ts − 1 ms (adjuster.go:218-221)
    reset_anchor = _t(30) - dt.timedelta(milliseconds=1)
    assert out[("c", _t(30))]["start_ts"] == reset_anchor
    assert out[("c", _t(40))]["start_ts"] == reset_anchor
    # values untouched
    assert out[("c", _t(20))]["value"] == 50.0
    # pass-throughs
    assert out[("g", _t(10))]["start_ts"] is None
    assert out[("d", _t(10))]["start_ts"] is None
    assert out[("ok", _t(20))]["start_ts"] == _t(5)
    assert len(out) == 7


def test_subtract_initial_point(spark, series):
    rows = adjust_start_time(series, "subtract_initial_point").collect()
    out = {(r["metric_name"], r["ts"]): r for r in rows}
    # initial point dropped (subtractinitial/adjuster.go:216-226)
    assert ("c", _t(10)) not in out
    # second point: start = initial ts, value − initial value
    assert out[("c", _t(20))]["start_ts"] == _t(10)
    assert out[("c", _t(20))]["value"] == 40.0
    # reset point kept, re-anchored at ts − 1 ms, value NOT subtracted
    reset_anchor = _t(30) - dt.timedelta(milliseconds=1)
    assert out[("c", _t(30))]["start_ts"] == reset_anchor
    assert out[("c", _t(30))]["value"] == 7.0
    assert out[("c", _t(40))]["start_ts"] == reset_anchor
    assert out[("c", _t(40))]["value"] == 9.0
    assert out[("ok", _t(20))]["start_ts"] == _t(5)


def test_start_time_metric(spark):
    epoch = dt.datetime(2023, 12, 31, 23, 0, 0)
    start_sec = (epoch - dt.datetime(1970, 1, 1)).total_seconds()
    df = spark.createDataFrame(
        [
            ("process_start_time_seconds", "", "gauge", 0, False, None, _t(1),
             start_sec, {}, {"h": "1"}, "s"),
            _row(_t(10), 5.0),
            _row(_t(20), 8.0),
            _row(_t(30), 2.0),  # reset
            # resource without the start metric → start stays null
            ("c", "", "sum", 2, True, None, _t(10), 1.0, {}, {"h": "2"}, "s"),
        ],
        _DDL,
    )
    out = {
        (r["metric_name"], str(r["resource"]), r["ts"]): r
        for r in adjust_start_time(df, "start_time_metric").collect()
    }
    k = lambda ts: ("c", "{'h': '1'}", ts)
    assert out[k(_t(10))]["start_ts"] == epoch
    assert out[k(_t(20))]["start_ts"] == epoch
    # reset re-anchors at ts − 1 ms (starttimemetric/adjuster.go:93)
    assert out[k(_t(30))]["start_ts"] == _t(30) - dt.timedelta(milliseconds=1)
    assert out[("c", "{'h': '2'}", _t(10))]["start_ts"] is None


def test_unknown_strategy(spark, series):
    with pytest.raises(ValueError, match="unknown strategy"):
        adjust_start_time(series, "guess")
