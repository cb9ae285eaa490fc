"""metricstransformprocessor rule surface: actions insert/update/combine,
label operations (processor/metricstransformprocessor/README.md config
examples; metrics_transform_processor_otlp.go transformMetric order)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkotel.operators.aggregate import metrics_transform


def _frame(spark, rows):
    """rows: (metric, value, attrs)."""
    return spark.createDataFrame(
        rows, "metric string, value double, attributes map<string,string>"
    )


def test_legacy_rename_scale_still_works(spark):
    df = _frame(spark, [("purchase", 100.0, {}), ("click", 2.0, {})])
    out = metrics_transform(
        df,
        [
            {"match": "purchase", "new_name": "purchase_dollars", "scale": 0.01},
            {"match": "click", "new_name": "interaction.click"},
        ],
    )
    got = {r["metric"]: r["value"] for r in out.collect()}
    assert got == {"purchase_dollars": 1.0, "interaction.click": 2.0}


def test_update_label_rename_key_and_values(spark):
    df = _frame(spark, [("m", 1.0, {"state": "used", "x": "1"}), ("n", 1.0, {"state": "used"})])
    out = metrics_transform(
        df,
        [{
            "match": "m",
            "operations": [{
                "action": "update_label",
                "label": "state",
                "new_label": "status",
                "value_actions": [{"value": "used", "new_value": "busy"}],
            }],
        }],
    )
    rows = {r["metric"]: r["attributes"] for r in out.collect()}
    assert rows["m"] == {"status": "busy", "x": "1"}
    assert rows["n"] == {"state": "used"}  # unmatched untouched


def test_add_and_delete_label_value(spark):
    df = _frame(
        spark,
        [("m", 1.0, {"k": "drop"}), ("m", 2.0, {"k": "keep"}), ("n", 3.0, {"k": "drop"})],
    )
    out = metrics_transform(
        df,
        [{
            "match": "m",
            "operations": [
                {"action": "delete_label_value", "label": "k", "label_value": "drop"},
                {"action": "add_label", "label": "env", "new_value": "prod"},
            ],
        }],
    )
    rows = sorted(out.collect(), key=lambda r: r["value"])
    assert len(rows) == 2
    assert rows[0]["metric"] == "m" and rows[0]["attributes"] == {"k": "keep", "env": "prod"}
    assert rows[1]["metric"] == "n" and rows[1]["attributes"] == {"k": "drop"}


def test_aggregate_labels_sum_and_mean(spark):
    df = _frame(
        spark,
        [
            ("m", 1.0, {"svc": "a", "host": "h1"}),
            ("m", 2.0, {"svc": "a", "host": "h2"}),
            ("m", 5.0, {"svc": "b", "host": "h1"}),
            ("n", 9.0, {"svc": "a", "host": "h1"}),
        ],
    )
    out = metrics_transform(
        df,
        [{
            "match": "m",
            "operations": [{
                "action": "aggregate_labels",
                "label_set": ["svc"],
                "aggregation_type": "sum",
            }],
        }],
    )
    got = {(r["metric"], r["attributes"].get("svc")): (r["value"], r["attributes"])
           for r in out.collect()}
    assert got[("m", "a")] == (3.0, {"svc": "a"})
    assert got[("m", "b")] == (5.0, {"svc": "b"})
    assert got[("n", "a")][0] == 9.0 and got[("n", "a")][1] == {"svc": "a", "host": "h1"}
    mean = metrics_transform(
        df,
        [{"match": "m", "operations": [{
            "action": "aggregate_labels", "label_set": ["svc"],
            "aggregation_type": "mean"}]}],
    )
    got = {r["attributes"].get("svc"): r["value"]
           for r in mean.collect() if r["metric"] == "m"}
    assert got == {"a": 1.5, "b": 5.0}


def test_aggregate_label_values(spark):
    df = _frame(
        spark,
        [
            ("m", 1.0, {"region": "us-east"}),
            ("m", 2.0, {"region": "us-west"}),
            ("m", 4.0, {"region": "eu"}),
        ],
    )
    out = metrics_transform(
        df,
        [{
            "match": "m",
            "operations": [{
                "action": "aggregate_label_values",
                "label": "region",
                "aggregated_values": ["us-east", "us-west"],
                "new_value": "us",
                "aggregation_type": "sum",
            }],
        }],
    )
    got = {r["attributes"]["region"]: r["value"] for r in out.collect()}
    assert got == {"us": 3.0, "eu": 4.0}


def test_insert_keeps_original(spark):
    df = _frame(spark, [("m", 10.0, {})])
    out = metrics_transform(
        df,
        [{
            "action": "insert",
            "match": "m",
            "new_name": "m_scaled",
            "operations": [{"action": "experimental_scale_value", "scale": 2}],
        }],
    )
    got = {r["metric"]: r["value"] for r in out.collect()}
    assert got == {"m": 10.0, "m_scaled": 20.0}


def test_combine_submatch_labels(spark):
    df = _frame(
        spark,
        [
            ("cpu.user.total", 1.0, {}),
            ("cpu.system.total", 2.0, {}),
            ("mem.free", 7.0, {}),
        ],
    )
    out = metrics_transform(
        df,
        [{
            "action": "combine",
            "match": r"cpu\.(?P<mode>[a-z]+)\.total",
            "new_name": "cpu.total",
        }],
    )
    rows = sorted(out.collect(), key=lambda r: r["value"])
    assert [(r["metric"], r["attributes"].get("mode")) for r in rows] == [
        ("cpu.total", "user"),
        ("cpu.total", "system"),
        ("mem.free", None),
    ]


def test_match_labels_gate(spark):
    df = _frame(spark, [("m", 1.0, {"env": "prod"}), ("m", 2.0, {"env": "dev"})])
    out = metrics_transform(
        df,
        [{"match": "m", "match_labels": {"env": "prod"}, "new_name": "m_prod"}],
    )
    got = {r["value"]: r["metric"] for r in out.collect()}
    assert got == {1.0: "m_prod", 2.0: "m"}


def test_sequential_rules_see_previous_output(spark):
    df = _frame(spark, [("a", 1.0, {})])
    out = metrics_transform(
        df, [{"match": "a", "new_name": "b"}, {"match": "b", "new_name": "c"}]
    )
    assert out.collect()[0]["metric"] == "c"


def test_invalid_inputs_raise(spark):
    df = _frame(spark, [("m", 1.0, {})])
    with pytest.raises(ValueError, match="unknown action"):
        metrics_transform(df, [{"action": "group", "match": "m"}]).collect()
    with pytest.raises(ValueError, match="invalid aggregation_type"):
        metrics_transform(
            df,
            [{"match": "m", "operations": [{
                "action": "aggregate_labels", "label_set": [],
                "aggregation_type": "p99"}]}],
        ).collect()
