"""Isolation forest anomaly detection (Liu/Ting/Zhou 2008 batch
algorithm standing in for processor/isolationforestprocessor's online
variant): planted outliers score high, scores are deterministic under a
fixed seed, grouping trains independent models."""

from __future__ import annotations

import numpy as np
import pytest

from sparkotel.functions.iforest import isolation_forest, score_rows, train_forest

_DDL = "grp string, x double, y double"


def _cluster_rows(n, cx, cy, spread, seed):
    rng = np.random.default_rng(seed)
    return [
        (float(cx + spread * rng.standard_normal()),
         float(cy + spread * rng.standard_normal()))
        for _ in range(n)
    ]


@pytest.fixture(scope="module")
def clustered(spark):
    rows = [("a", x, y) for x, y in _cluster_rows(300, 10.0, 10.0, 0.5, 1)]
    # planted far outliers
    rows += [("a", 100.0, -50.0), ("a", -80.0, 90.0)]
    return spark.createDataFrame(rows, _DDL)


def test_outliers_score_highest(spark, clustered):
    out = isolation_forest(
        clustered, ["x", "y"], num_trees=50, subsample=128, seed=3,
        contamination_rate=0.01,
    )
    rows = out.collect()
    by_score = sorted(rows, key=lambda r: -r["anomaly_isolation_score"])
    top2 = {(r["x"], r["y"]) for r in by_score[:2]}
    assert top2 == {(100.0, -50.0), (-80.0, 90.0)}
    # the planted outliers are flagged, the cluster core mostly isn't
    flagged = [r for r in rows if r["anomaly_is_anomaly"]]
    assert {(r["x"], r["y"]) for r in flagged} >= top2
    assert len(flagged) <= 10


def test_deterministic_under_seed(spark, clustered):
    a = isolation_forest(clustered, ["x", "y"], num_trees=20, subsample=64, seed=5)
    b = isolation_forest(clustered, ["x", "y"], num_trees=20, subsample=64, seed=5)
    sa = sorted(r["anomaly_isolation_score"] for r in a.collect())
    sb = sorted(r["anomaly_isolation_score"] for r in b.collect())
    assert sa == sb


def test_filter_mode_drops_anomalies(spark, clustered):
    total = clustered.count()
    kept = isolation_forest(
        clustered, ["x", "y"], num_trees=50, subsample=128, seed=3,
        contamination_rate=0.01, mode="filter",
    )
    assert kept.count() < total
    assert "anomaly_isolation_score" not in kept.columns
    pts = {(r["x"], r["y"]) for r in kept.collect()}
    assert (100.0, -50.0) not in pts


def test_grouped_models(spark):
    # group b's "normal" is group a's outlier: per-group models must
    # not cross-contaminate
    rows = [("a", x, y) for x, y in _cluster_rows(200, 0.0, 0.0, 0.3, 2)]
    rows += [("b", x, y) for x, y in _cluster_rows(200, 500.0, 500.0, 0.3, 3)]
    rows += [("a", 500.0, 500.0), ("b", 0.0, 0.0)]  # planted cross-outliers
    df = spark.createDataFrame(rows, _DDL)
    out = isolation_forest(
        df, ["x", "y"], group_by=("grp",), num_trees=50, subsample=128,
        seed=4, contamination_rate=0.005,
    ).collect()
    score = {(r["grp"], r["x"], r["y"]): r["anomaly_isolation_score"] for r in out}
    # the cross-planted points are their group's top outlier
    a_scores = sorted(
        ((s, k) for k, s in score.items() if k[0] == "a"), reverse=True
    )
    b_scores = sorted(
        ((s, k) for k, s in score.items() if k[0] == "b"), reverse=True
    )
    assert a_scores[0][1] == ("a", 500.0, 500.0)
    assert b_scores[0][1] == ("b", 0.0, 0.0)


def test_fixed_threshold(spark, clustered):
    out = isolation_forest(
        clustered, ["x", "y"], num_trees=20, subsample=64, seed=5, threshold=2.0
    )
    # impossible threshold → nothing flagged
    assert out.where("anomaly_is_anomaly").count() == 0


def test_score_math_degenerate():
    # constant data isolates nothing: every split is impossible, score
    # collapses to the single-leaf case
    X = np.ones((50, 2))
    forest = train_forest(X, 10, 32, seed=1)
    s = score_rows(forest, X)
    assert np.allclose(s, s[0])


def test_validation(spark, clustered):
    with pytest.raises(ValueError, match="unknown mode"):
        isolation_forest(clustered, ["x"], mode="softly")
    with pytest.raises(ValueError, match="at least one feature"):
        isolation_forest(clustered, [])


def test_approx_threshold_close_to_exact(spark, clustered):
    """the scale path (t-digest approx percentile) lands within noise of
    the exact-threshold flag rate."""
    exact = isolation_forest(
        clustered, ["x", "y"], contamination_rate=0.2, seed=3
    ).where("anomaly_is_anomaly").count()
    approx = isolation_forest(
        clustered, ["x", "y"], contamination_rate=0.2, seed=3,
        approx_threshold=True,
    ).where("anomaly_is_anomaly").count()
    total = clustered.count()
    assert abs(exact - approx) <= max(2, total * 0.02)


def test_golden_k_twin_matches_spark_cast(spark):
    """golden._k must mirror the registry's
    coalesce(get_json_object(props,'$.k').try_cast(double), 0.0) exactly
    — including JSON booleans (try_cast NULLs 'true'/'false' where
    python float() would say 1.0/0.0) and Infinity literals (invalid
    JSON to Spark, a python-json extension the twin must suppress)."""
    from pyspark.sql import functions as F

    from sparkotel.golden import _k

    cases = [
        '{"k": 2.5}', '{"k": -3}', '{"k": true}', '{"k": false}',
        '{"k": "1.5"}', '{"k": "abc"}', '{"k": null}', '{"j": 1}',
        '{"k": Infinity}', '{"k": 1e999}',
        "[1,2]", "7", "not json", None,
    ]
    df = spark.createDataFrame([(c,) for c in cases], "props string")
    spark_vals = [
        r["v"]
        for r in df.select(
            F.coalesce(
                F.get_json_object("props", "$.k").try_cast("double"), F.lit(0.0)
            ).alias("v")
        ).collect()
    ]
    assert [_k(c) for c in cases] == spark_vals
