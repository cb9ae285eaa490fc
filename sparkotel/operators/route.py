"""Routing — the routingconnector's ordered move/copy/default table.

Reference: connector/routingconnector/logs.go:63-172, router.go:47-328;
``move`` (default) consumes matched rows so later routes never see
them; ``copy`` duplicates without consuming; leftovers go to
``default_pipelines``.  Stanza's in-DAG router has the same first-match
semantics (operator/transformer/router/transformer.go:38-122).

Spark-first: ONE pass computes ``route_idx`` as a first-match
``when()`` chain over the move routes (Catalyst preserves evaluation
order), so move exactness — a row consumed by route k never matches
route k+1 — holds by construction (SURVEY §7.5.4).  Copy routes are
independent filters unioned in.  Sinks then either ``filter(route ==
k)`` from a cached prefix or do a single partitioned write on the
``route`` column — no per-route rescans of the source.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_ROUTE = "__default__"


@dataclass
class Route:
    condition: Column | str
    sink: str
    mode: str = "move"  # 'move' | 'copy'
    attributes: dict = field(default_factory=dict)  # stanza router attach-attrs


def _col(c: Column | str) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def assign_routes(df: DataFrame, routes: list[Route], default_sink: str = DEFAULT_ROUTE) -> DataFrame:
    """Add a ``route`` column (first-match over move routes; copies excluded)."""
    expr = None
    for r in routes:
        if r.mode != "move":
            continue
        cond = _col(r.condition)
        expr = F.when(cond, F.lit(r.sink)) if expr is None else expr.when(cond, F.lit(r.sink))
    expr = F.lit(default_sink) if expr is None else expr.otherwise(F.lit(default_sink))
    return df.withColumn("route", expr)


def route_outputs(df: DataFrame, routes: list[Route], default_sink: str = DEFAULT_ROUTE) -> dict[str, DataFrame]:
    """Per-sink DataFrames with exact move/copy/default semantics.

    Copy routes see the PRE-routing stream (they match rows even if a
    later/earlier move also takes them) — plogutil copy clones the
    record (internal/plogutil/logs.go:12-39).  Route-local attach
    attributes (stanza router) are applied per output.
    """
    routed = assign_routes(df, routes, default_sink)
    outs: dict[str, DataFrame] = {}

    def _attach(d: DataFrame, attrs: dict) -> DataFrame:
        for k, v in attrs.items():
            d = d.withColumn(k, F.lit(v))
        return d

    for r in routes:
        if r.mode == "move":
            part = routed.filter(F.col("route") == r.sink)
        else:
            part = routed.filter(_col(r.condition))
        part = _attach(part, r.attributes)
        outs[r.sink] = outs[r.sink].unionByName(part) if r.sink in outs else part
    outs[default_sink] = routed.filter(F.col("route") == default_sink)
    return outs


def round_robin(df: DataFrame, n: int, order_col: str = "doc_id") -> DataFrame:
    """roundrobinconnector (connector/roundrobinconnector/) — deterministic
    shard assignment; we key on a stable column rather than batch arrival."""
    return df.withColumn("shard", F.pmod(F.col(order_col), F.lit(n)).cast("int"))
