"""schemaprocessor analogue — mirrors the reference's attribute
migration test tables (processor/schemaprocessor/internal/migrate/
attributes_test.go) plus version-chain iteration order
(internal/translation/translation.go:392)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkotel.operators.schema import schema_transform


def _one(spark, attrs: dict, version="v0", **kw):
    df = spark.createDataFrame(
        [(attrs, version)], "attrs map<string,string>, schema_version string"
    )
    out = schema_transform(df, **kw).first()
    return dict(out["attrs"]), out["schema_version"]


def _single_rev(mapping, target, copy=False):
    return dict(
        versions=["v0", "v1"],
        revisions=[("v1", mapping)],
        target=target,
        copy_attributes=copy,
    )


# --- StateSelectorApply table (attributes_test.go:42-101) -----------------


def test_apply_no_modifications(spark):
    got, v = _one(spark, {"test.cases": "1"}, "v0", **_single_rev({}, "v1"))
    assert got == {"test.cases": "1"} and v == "v1"


def test_apply_changes(spark):
    got, _ = _one(
        spark,
        {"service_version": "v0.0.1"},
        "v0",
        **_single_rev({"service_version": "service.version"}, "v1"),
    )
    assert got == {"service.version": "v0.0.1"}


def test_apply_naming_loop(spark):
    got, _ = _one(
        spark,
        {"service_version": "v0.0.1"},
        "v0",
        **_single_rev(
            {"service.version": "service_version", "service_version": "service.version"},
            "v1",
        ),
    )
    assert got == {"service.version": "v0.0.1"}


def test_apply_overrides_existing_value(spark):
    """Renamed value wins; the pre-existing target entry is dropped
    (the reference also reports an error; the value outcome is this)."""
    got, _ = _one(
        spark,
        {"application.name": "my-awesome-application",
         "service.name": "my-awesome-service"},
        "v0",
        **_single_rev({"application.name": "service.name"}, "v1"),
    )
    assert got == {"service.name": "my-awesome-application"}


# --- StateSelectorRollback table (attributes_test.go:117-191) -------------


def test_rollback_changes(spark):
    got, v = _one(
        spark,
        {"service.version": "v0.0.1"},
        "v1",
        **_single_rev({"service_version": "service.version"}, "v0"),
    )
    assert got == {"service_version": "v0.0.1"} and v == "v0"


def test_rollback_naming_loop(spark):
    got, _ = _one(
        spark,
        {"service.version": "v0.0.1"},
        "v1",
        **_single_rev(
            {"service.version": "service_version", "service_version": "service.version"},
            "v0",
        ),
    )
    assert got == {"service_version": "v0.0.1"}


def test_rollback_overrides_existing_value(spark):
    got, _ = _one(
        spark,
        {"service.name": "my-awesome-application",
         "application.name": "my-awesome-service"},
        "v1",
        **_single_rev({"application.name": "service.name"}, "v0"),
    )
    assert got == {"application.name": "my-awesome-application"}


# --- copy mode (attributes_test.go copy tables; attributes.go:63-69) ------


def test_copy_mode_preserves_original(spark):
    got, _ = _one(
        spark,
        {"service_version": "1.0.0"},
        "v0",
        **_single_rev({"service_version": "service.version"}, "v1", copy=True),
    )
    assert got == {"service_version": "1.0.0", "service.version": "1.0.0"}


def test_copy_mode_target_exists_keeps_both_untouched(spark):
    got, _ = _one(
        spark,
        {"service_version": "1.0.0", "service.version": "2.0.0"},
        "v0",
        **_single_rev({"service_version": "service.version"}, "v1", copy=True),
    )
    assert got == {"service_version": "1.0.0", "service.version": "2.0.0"}


# --- version-chain iteration (translation.go:392 iterator order) ----------

CHAIN = dict(
    versions=["1.20.0", "1.21.0", "1.22.0"],
    revisions=[
        ("1.21.0", {"http.method": "http.request.method"}),
        ("1.22.0", {"http.status_code": "http.response.status_code"}),
    ],
    target="1.22.0",
)


def test_chain_upgrade_applies_only_newer_revisions(spark):
    rows = [
        ({"http.method": "GET", "http.status_code": "200"}, "1.20.0"),
        ({"http.request.method": "GET", "http.status_code": "200"}, "1.21.0"),
        ({"http.request.method": "GET", "http.response.status_code": "200"}, "1.22.0"),
        ({"http.method": "GET"}, "9.9.9"),  # unknown family: untouched
    ]
    df = spark.createDataFrame(rows, "attrs map<string,string>, schema_version string")
    out = [
        (dict(r["attrs"]), r["schema_version"])
        for r in schema_transform(df, **CHAIN).collect()
    ]
    full = {"http.request.method": "GET", "http.response.status_code": "200"}
    assert out[0] == (full, "1.22.0")
    assert out[1] == (full, "1.22.0")
    assert out[2] == (full, "1.22.0")
    assert out[3] == ({"http.method": "GET"}, "9.9.9")


def test_chain_downgrade_applies_inverse_descending(spark):
    down = dict(CHAIN, target="1.20.0")
    df = spark.createDataFrame(
        [({"http.request.method": "GET", "http.response.status_code": "200"},
          "1.22.0")],
        "attrs map<string,string>, schema_version string",
    )
    r = schema_transform(df, **down).first()
    assert dict(r["attrs"]) == {"http.method": "GET", "http.status_code": "200"}
    assert r["schema_version"] == "1.20.0"


def test_chain_is_pure_projection(spark):
    from conftest import SF_DIR
    from test_plans import plan_of

    from sparkotel import pages as P

    df = P.pages(spark, SF_DIR).select(
        "url",
        F.create_map(F.lit("http.method"), F.lit("GET")).alias("attrs"),
        F.lit("1.20.0").alias("schema_version"),
    )
    plan = plan_of(schema_transform(df, **CHAIN))
    assert "Exchange" not in plan and "Python" not in plan


def test_duplicate_rename_target_merges_first_wins(spark):
    """two source keys renaming to the same target is a legal merge of
    mutually exclusive legacy keys; when both DO appear in one record,
    the first entry in attribute order wins — never a duplicate-map-key
    crash (default mapKeyDedupPolicy=EXCEPTION)."""
    merge = dict(
        versions=["1.20.0", "1.21.0"],
        revisions=[("1.21.0", {"a": "x", "b": "x"})],
        target="1.21.0",
    )
    # mutually exclusive sources: each record converges on x
    df2 = spark.createDataFrame(
        [({"a": "1"}, "1.20.0"), ({"b": "2"}, "1.20.0")],
        "attrs map<string,string>, schema_version string",
    )
    rows = [dict(r["attrs"]) for r in schema_transform(df2, **merge).collect()]
    assert rows == [{"x": "1"}, {"x": "2"}]
    # co-occurring sources: first attribute-order entry wins, no crash
    df = spark.createDataFrame(
        [({"a": "1", "b": "2"}, "1.20.0")],
        "attrs map<string,string>, schema_version string",
    )
    r = schema_transform(df, **merge).first()
    assert dict(r["attrs"]) == {"x": "1"}
    # a rename CHAIN (a→x while x→y) is legal and collision-free
    ok = dict(
        versions=["1.20.0", "1.21.0"],
        revisions=[("1.21.0", {"a": "x", "x": "y"})],
        target="1.21.0",
    )
    r = schema_transform(df.withColumn(
        "attrs", F.create_map(F.lit("a"), F.lit("1"), F.lit("x"), F.lit("2"))
    ), **ok).first()
    assert dict(r["attrs"]) == {"x": "1", "y": "2"}
