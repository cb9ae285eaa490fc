"""Routing — the routingconnector's ordered move/copy/default table.

Reference: connector/routingconnector/logs.go:63-172, router.go:230-328;
``move`` (default) consumes matched data so later routes never see it;
``copy`` duplicates without consuming; leftovers go to
``default_pipelines``.  Stanza's in-DAG router has the same first-match
semantics (operator/transformer/router/transformer.go:38-122).

Two statement contexts, as in the reference:

- ``record`` (the reference's ``log`` context,
  plogutil.MoveRecordsWithContextIf, logs.go:125-155): the condition
  gates each record independently.
- ``resource`` (plogutil.MoveResourcesIf, logs.go:94-124): the
  condition is evaluated once per resource — the group of records
  sharing the ``resource_keys`` columns — and the WHOLE group moves or
  copies together, including records that individually fail the
  predicate.  In the reference a resource statement can only see
  group-constant resource attributes; on a flat table we generalize to
  ANY-record semantics (``bool_or`` over the group), which coincides
  with the reference for group-constant conditions and gives a
  deterministic meaning for record-varying ones.  Conditions are
  evaluated over the PRE-routing stream (a resource statement only
  reads resource attributes, so earlier record-level moves can't change
  its outcome in the reference either).

Spark-first: ONE pass computes every route condition — all
resource-context conditions share a single ``Window.partitionBy(
resource_keys)`` spec, so any number of resource routes costs exactly
one hash Exchange (and a record-only table costs zero).  ``route`` is a
first-match ``when()`` chain over the move routes (Catalyst preserves
evaluation order), so move exactness — data consumed by route k never
matches route k+1 — holds by construction (SURVEY §7.5.4).  Copy
outputs mask rows already consumed by EARLIER move routes (the
reference copies from the remaining stream, logs.go:96-108) but do not
consume: a copied row still reaches later routes and, if never moved,
the default sink.  Sinks then either ``filter(route == k)`` from a
cached prefix or do a single partitioned write on the ``route`` column
— no per-route rescans of the source.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ROUTE = "__default__"


@dataclass
class Route:
    condition: Column | str
    sink: str
    mode: str = "move"  # 'move' | 'copy'
    attributes: dict = field(default_factory=dict)  # stanza router attach-attrs
    context: str = "record"  # 'record' | 'resource'


def _col(c: Column | str) -> Column:
    return F.expr(c) if isinstance(c, str) else c


def _route_conditions(
    df: DataFrame, routes: list[Route], resource_keys: list[str] | None
) -> DataFrame:
    """Materialize one boolean ``_rc{i}`` per route (in table order).

    Record-context conditions are per-row; resource-context conditions
    are ANY-over-the-resource-group via ``max`` over a window shared by
    all resource routes (one Exchange total; none if there are no
    resource routes).  A NULL condition is not-a-match, mirroring the
    reference's evaluate-error => no match (logs.go:103-106).
    """
    w = None
    cols: dict[str, Column] = {}
    for i, r in enumerate(routes):
        cond = F.coalesce(_col(r.condition).cast("boolean"), F.lit(False))
        if r.context == "resource":
            if not resource_keys:
                raise ValueError("resource-context route needs resource_keys")
            if w is None:
                w = Window.partitionBy(*[F.col(k) for k in resource_keys])
            cond = F.max(cond.cast("int")).over(w) == F.lit(1)
        cols[f"_rc{i}"] = cond
    return df.withColumns(cols)


def assign_routes(
    df: DataFrame,
    routes: list[Route],
    default_sink: str = DEFAULT_ROUTE,
    resource_keys: list[str] | None = None,
) -> DataFrame:
    """Add a ``route`` column (first-match over move routes; copies excluded)."""
    pre = _route_conditions(df, routes, resource_keys)
    expr = None
    for i, r in enumerate(routes):
        if r.mode != "move":
            continue
        cond = F.col(f"_rc{i}")
        expr = F.when(cond, F.lit(r.sink)) if expr is None else expr.when(cond, F.lit(r.sink))
    expr = F.lit(default_sink) if expr is None else expr.otherwise(F.lit(default_sink))
    return pre.withColumn("route", expr).drop(*[f"_rc{i}" for i in range(len(routes))])


def route_outputs(
    df: DataFrame,
    routes: list[Route],
    default_sink: str = DEFAULT_ROUTE,
    resource_keys: list[str] | None = None,
) -> dict[str, DataFrame]:
    """Per-sink DataFrames with exact sequential move/copy/default semantics.

    Route k's output excludes anything consumed by moves 1..k-1 (the
    reference iterates the route table over a shrinking stream,
    logs.go:66-160); copies don't consume, so a copied-but-never-moved
    row also reaches the default sink.  Route-local attach attributes
    (stanza router) are applied per output.
    """
    pre = _route_conditions(df, routes, resource_keys)
    expr = None
    for i, r in enumerate(routes):
        if r.mode != "move":
            continue
        cond = F.col(f"_rc{i}")
        expr = F.when(cond, F.lit(r.sink)) if expr is None else expr.when(cond, F.lit(r.sink))
    expr = F.lit(default_sink) if expr is None else expr.otherwise(F.lit(default_sink))
    pre = pre.withColumn("route", expr)
    helper = [f"_rc{i}" for i in range(len(routes))]
    outs: dict[str, DataFrame] = {}

    def _attach(d: DataFrame, attrs: dict) -> DataFrame:
        for k, v in attrs.items():
            d = d.withColumn(k, F.lit(v))
        return d

    consumed = F.lit(False)
    for i, r in enumerate(routes):
        cond = F.col(f"_rc{i}")
        part = _attach(pre.filter(cond & ~consumed).drop(*helper), r.attributes)
        if r.mode == "move":
            consumed = consumed | cond
        outs[r.sink] = outs[r.sink].unionByName(part) if r.sink in outs else part
    outs[default_sink] = pre.filter(~consumed).drop(*helper)
    return outs


def round_robin(df: DataFrame, n: int, order_col: str = "doc_id") -> DataFrame:
    """roundrobinconnector (connector/roundrobinconnector/) — deterministic
    shard assignment; we key on a stable column rather than batch arrival."""
    return df.withColumn("shard", F.pmod(F.col(order_col), F.lit(n)).cast("int"))
