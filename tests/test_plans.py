"""Physical-plan quality gates — the .explain('formatted') audit as
assertions, so plan regressions (lost pruning, surprise sort-merge
joins, shuffles on the parse path) fail CI instead of surfacing as a
10x slowdown at scale."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from conftest import SF_DIR

from sparkotel import pages as P
from sparkotel import pipeline as PL


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_column_pruning_reaches_scan(spark):
    """The pipeline reads only (doc_id, text, lang) from the documents
    parquet — never source/n_chars; html is generated+dropped before
    any action and must not appear in the scan either."""
    out = PL.build(spark, SF_DIR)
    plan = plan_of(out["routed"])
    read_schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schemas, "no parquet scan found"
    for rs in read_schemas:
        assert "n_chars" not in rs and "source" not in rs
        assert "html" not in rs


def test_enrich_joins_are_broadcast(spark):
    out = PL.build(spark, SF_DIR)
    plan = plan_of(out["enriched"])
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_parse_path_has_no_exchange(spark):
    """parse stage = scan + codegen'd projections; any Exchange here
    would shuffle the full 100 TB of text."""
    parsed = PL.parse_stage(P.pages(spark, SF_DIR).drop("html"))
    plan = plan_of(parsed)
    assert "Exchange" not in plan


def test_filter_pushdown(spark):
    """A filter on a source column reaches the parquet scan as a
    PushedFilter."""
    P.load_tables(spark, SF_DIR, ["documents"])
    df = spark.table("documents").filter("lang = 'en'").select("doc_id")
    plan = plan_of(df)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "lang" in pushed[0]


def test_single_pass_agg_one_shuffle(spark):
    """the single-pass multi-metric aggregate has exactly one
    hash-partitioned exchange (partial agg → exchange → final)."""
    from sparkotel.operators.aggregate import connector_metrics_single_pass

    out = PL.build(spark, SF_DIR)
    m = connector_metrics_single_pass(
        out["routed"], PL.SINK_METRICS, copy_conds={"de": "geo_country = 'DE'"}
    )
    plan = plan_of(m)
    n_shuffle = sum(
        1 for l in plan.splitlines() if l.strip().startswith("(") and ") Exchange" in l
        and "Broadcast" not in l
    )
    assert n_shuffle == 1, plan
