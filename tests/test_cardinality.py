"""Cardinality guardian — detection and the three enforcement modes
(processor/cardinalityguardianprocessor/processor.go, reaggregation.go)."""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel.operators.cardinality import (
    OVERFLOW_SENTINEL,
    OVERFLOW_TAG,
    cardinality_guardian,
)

_DDL = (
    "metric_name string, unit string, metric_type string,"
    " aggregation_temporality int, is_monotonic boolean,"
    " start_ts timestamp_ntz, ts timestamp_ntz, value double,"
    " attributes map<string,string>, resource map<string,string>,"
    " scope_name string"
)

_E0 = dt.datetime(2024, 1, 1, 0, 0, 0)   # epoch 0
_E1 = dt.datetime(2024, 1, 1, 0, 5, 0)   # epoch 1 (300 s later)


def _pt(ts, value, attrs, name="m", mtype="sum", temp=1):
    return (name, "", mtype, temp, True, ts, ts, value, attrs, {"h": "1"}, "s")


@pytest.fixture(scope="module")
def exploding(spark):
    """epoch 0: error.type has 2 values; epoch 1: 6 values → delta 4.
    region stays at 2 values both epochs → delta 0."""
    rows = []
    for i in range(2):
        rows.append(_pt(_E0, 1.0, {"error.type": f"e{i}", "region": f"r{i % 2}"}))
    for i in range(6):
        rows.append(_pt(_E1, 1.0, {"error.type": f"x{i}", "region": f"r{i % 2}"}))
    return spark.createDataFrame(rows, _DDL)


def test_tag_only(spark, exploding):
    out = cardinality_guardian(
        exploding, max_cardinality_delta_per_epoch=3, enforcement_mode="tag_only"
    ).collect()
    assert len(out) == 8  # nothing dropped or merged
    e0 = [r for r in out if r["ts"] == _E0]
    e1 = [r for r in out if r["ts"] == _E1]
    assert all(OVERFLOW_TAG not in r["attributes"] for r in e0)
    assert all(r["attributes"][OVERFLOW_TAG] == "true" for r in e1)
    # original attrs survive in tag_only
    assert all("error.type" in r["attributes"] for r in e1)


def test_strip_and_reaggregate(spark, exploding):
    out = cardinality_guardian(
        exploding, max_cardinality_delta_per_epoch=3,
        enforcement_mode="strip_and_reaggregate",
    ).collect()
    e1 = [r for r in out if r["ts"] == _E1]
    # 6 offending points collapse onto 2 regions; error.type gone,
    # delta-sum values added
    assert len(e1) == 2
    assert all("error.type" not in r["attributes"] for r in e1)
    assert sorted(r["value"] for r in e1) == [3.0, 3.0]
    # epoch-0 points untouched
    e0 = [r for r in out if r["ts"] == _E0]
    assert len(e0) == 2 and all("error.type" in r["attributes"] for r in e0)


def test_overflow_attribute(spark, exploding):
    out = cardinality_guardian(
        exploding, max_cardinality_delta_per_epoch=3,
        enforcement_mode="overflow_attribute",
    ).collect()
    e1 = [r for r in out if r["ts"] == _E1]
    assert len(e1) == 2
    assert all(r["attributes"]["error.type"] == OVERFLOW_SENTINEL for r in e1)
    assert sorted(r["value"] for r in e1) == [3.0, 3.0]


def test_never_drop_labels(spark):
    rows = [_pt(_E0, 1.0, {"k": "a"}), ]
    rows += [_pt(_E1, 1.0, {"k": f"v{i}"}) for i in range(6)]
    df = spark.createDataFrame(rows, _DDL)
    out = cardinality_guardian(
        df, max_cardinality_delta_per_epoch=3,
        enforcement_mode="strip_and_reaggregate", never_drop_labels=("k",),
    ).collect()
    # protected label: no stripping, no merge
    assert len(out) == 7
    assert all("k" in r["attributes"] for r in out)


def test_metric_overrides(spark):
    rows = [_pt(_E1, 1.0, {"k": f"v{i}"}, name="hot") for i in range(6)]
    rows += [_pt(_E1, 1.0, {"k": f"v{i}"}, name="cold") for i in range(6)]
    df = spark.createDataFrame(rows, _DDL)
    out = cardinality_guardian(
        df, max_cardinality_delta_per_epoch=3, enforcement_mode="tag_only",
        metric_overrides={"hot": 100},
    ).collect()
    by = {}
    for r in out:
        by.setdefault(r["metric_name"], []).append(r)
    assert all(OVERFLOW_TAG not in r["attributes"] for r in by["hot"])
    assert all(r["attributes"][OVERFLOW_TAG] == "true" for r in by["cold"])


def test_cumulative_sum_falls_back_to_tag(spark):
    rows = [_pt(_E1, float(i), {"k": f"v{i}"}, temp=2) for i in range(6)]
    df = spark.createDataFrame(rows, _DDL)
    out = cardinality_guardian(
        df, max_cardinality_delta_per_epoch=3,
        enforcement_mode="strip_and_reaggregate",
    ).collect()
    # cumulative sums are not reaggregated (processor.go:332-341):
    # points survive individually, tagged
    assert len(out) == 6
    assert all(r["attributes"][OVERFLOW_TAG] == "true" for r in out)
    assert all("k" in r["attributes"] for r in out)


def test_gauge_last_value_wins(spark):
    t1, t2 = _E1, _E1 + dt.timedelta(seconds=30)
    rows = [
        _pt(t1, 10.0, {"k": f"v{i}"}, name="g", mtype="gauge", temp=0)
        for i in range(5)
    ]
    rows.append(_pt(t2, 99.0, {"k": "v5"}, name="g", mtype="gauge", temp=0))
    df = spark.createDataFrame(rows, _DDL)
    out = cardinality_guardian(
        df, max_cardinality_delta_per_epoch=3,
        enforcement_mode="strip_and_reaggregate",
    ).collect()
    # all six merge into one identity; the latest value wins
    assert len(out) == 1
    assert out[0]["value"] == 99.0 and out[0]["ts"] == t2


def test_bad_mode(spark, exploding):
    with pytest.raises(ValueError, match="unknown enforcement mode"):
        cardinality_guardian(exploding, enforcement_mode="panic")
