"""Span pruning: collapse groups of similar leaf spans (and eligible
parents) into aggregated summary spans
(processor/spanpruningprocessor/).

Semantics (processor.go:188-380, grouping.go, aggregation.go):

- leaves (no child in the trace) group by parent span NAME + tree depth
  + name + kind + status + the values of ``group_by_attributes``
  (glob-matched keys, sorted) — buildLeafGroupKey/buildGroupKey.
- groups of ≥ ``min_spans_to_aggregate`` collapse into ONE summary span
  cloned from the template (the longest-duration member): its
  name/kind/status/attributes survive, start/end span the union, and
  ``<prefix>is_summary``, ``span_count``,
  ``duration_{min,max,total,avg}_ns`` stats are attached
  (createSummarySpanWithParent, aggregation.go:142-199).
- parents become eligible when ALL their children were aggregated and
  they are not roots; eligible parents group by depth + name + kind +
  status (attributes intentionally excluded), ≥ 2 per group, recursing
  up to ``max_parent_depth`` levels (-1 = unlimited, 0 = leaf-only).
- optional duration-outlier analysis (IQR or MAD, outlier.go): with
  ``preserve_outliers`` the outliers stay as individual spans tagged
  with ``<prefix>summary_span_id`` and the rest aggregate (only if the
  remainder still meets the minimum).

A summary span's parent is the template's parent — re-pointed at that
parent's own summary when it too was aggregated.  Summary span ids are
a deterministic md5 of (trace, group key) rather than the reference's
random ids, so reruns are replayable.

Spark shape: one shuffle on trace_id (repartition + partition-local
sort), then the per-trace tree walk runs batched under ``mapInPandas``
— one Python invocation per Arrow batch, not per trace; traces are
small trees so the walk is per-group bounded, and at 10^12 spans the
partition key is the trace id (no global state, no driver involvement).
"""

from __future__ import annotations

import fnmatch
import hashlib

import pandas as pd
from pyspark.sql import DataFrame

_STATS_INT = ("span_count", "duration_min_ns", "duration_max_ns",
              "duration_total_ns", "duration_avg_ns")


def _prune_trace(
    rows: list,
    min_spans: int,
    max_depth: int,
    patterns: tuple,
    prefix: str,
    outliers: str | None,
    iqr_multiplier: float,
    mad_threshold: float,
    preserve_outliers: bool,
) -> list:
    """One trace's span records → pruned records.  Takes plain dicts so
    the batch caller pays pandas' to_dict once per Arrow batch, not once
    per trace (the per-trace ``pdf.to_dict``/frame-construction overhead
    was ~ms per 5-row group — the same measured cost that dominated
    ``trace_proto_sizes`` before its batching)."""
    by_id = {r["span_id"]: r for r in rows}
    children: dict[str, list] = {}
    for r in rows:
        pid = r["parent_span_id"] or ""
        if pid and pid in by_id:
            children.setdefault(pid, []).append(r)

    def depth(r) -> int:
        d, pid = 0, r["parent_span_id"] or ""
        seen = set()
        while pid and pid in by_id and pid not in seen:
            seen.add(pid)
            d += 1
            pid = by_id[pid]["parent_span_id"] or ""
        return d

    def dur_ns(r) -> int:
        # pd.isna, not `is None`: records built by pandas' to_dict carry
        # NULL timestamps as pd.NaT, and NaT arithmetic would yield NaN
        # durations (all-False comparisons → order-dependent template
        # choice, 'nan' duration attributes)
        if pd.isna(r["end_ts"]) or pd.isna(r["start_ts"]):
            return 0
        d = r["end_ts"] - r["start_ts"]
        # exact µs decomposition — total_seconds() is float and loses
        # precision past ~2^53 ns
        return (d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds) * 1000

    def matched_attrs(r) -> tuple:
        attrs = r["attributes"] or {}
        hits = {
            k: v
            for k, v in attrs.items()
            if any(fnmatch.fnmatchcase(k, p) for p in patterns)
        }
        return tuple(sorted(hits.items()))

    def leaf_key(r) -> tuple:
        parent = by_id.get(r["parent_span_id"] or "")
        pname = parent["name"] if parent else ""
        return ("leaf", pname, depth(r), r["name"], r["kind"],
                r["status_code"], matched_attrs(r))

    def detect_outliers(group: list) -> set:
        ds = sorted(dur_ns(r) for r in group)
        s = pd.Series(ds, dtype=float)
        if outliers == "iqr":
            q1, q3 = s.quantile(0.25), s.quantile(0.75)
            iqr = q3 - q1
            lo, hi = q1 - iqr_multiplier * iqr, q3 + iqr_multiplier * iqr
        else:  # mad
            med = s.median()
            mad = (s - med).abs().median()
            if mad == 0:
                return set()
            lo, hi = med - mad_threshold * mad, med + mad_threshold * mad
        return {id(r) for r in group if not lo <= dur_ns(r) <= hi}

    marked: dict[int, tuple] = {}   # id(row) -> group key
    groups: dict[tuple, dict] = {}  # key -> {nodes, preserved}
    preserved: dict[int, tuple] = {}

    leaf_groups: dict[tuple, list] = {}
    for r in rows:
        if r["span_id"] not in children:  # no child links to it → leaf
            leaf_groups.setdefault(leaf_key(r), []).append(r)

    for key, nodes in leaf_groups.items():
        if len(nodes) < min_spans:
            continue
        agg, kept_out = nodes, []
        if outliers and preserve_outliers:
            out_ids = detect_outliers(nodes)
            if out_ids:
                agg = [r for r in nodes if id(r) not in out_ids]
                kept_out = [r for r in nodes if id(r) in out_ids]
                if len(agg) < min_spans:
                    continue
        groups[key] = {"nodes": agg, "preserved": kept_out}
        for r in agg:
            marked[id(r)] = key
        for r in kept_out:
            preserved[id(r)] = key

    # parent recursion (processor.go:285-380)
    level = 1
    frontier = [r for k in groups for r in groups[k]["nodes"]]
    while frontier and (max_depth < 0 or level <= max_depth):
        candidates = []
        seen_ids = set()
        for r in frontier:
            p = by_id.get(r["parent_span_id"] or "")
            if p is None or id(p) in seen_ids or id(p) in marked:
                continue
            if not (p["parent_span_id"] or "") or (
                p["parent_span_id"] not in by_id
            ):
                continue  # roots/orphans never aggregate
            kids = children.get(p["span_id"], [])
            if all(id(c) in marked for c in kids):
                candidates.append(p)
                seen_ids.add(id(p))
        pgroups: dict[tuple, list] = {}
        for p in candidates:
            pgroups.setdefault(
                ("parent", depth(p), p["name"], p["kind"], p["status_code"]), []
            ).append(p)
        newly = []
        for key, nodes in pgroups.items():
            if len(nodes) < 2:
                continue
            groups[key] = {"nodes": nodes, "preserved": []}
            for r in nodes:
                marked[id(r)] = key
            newly.extend(nodes)
        if not newly:
            break
        frontier = newly
        level += 1

    # summary ids + parent re-pointing
    # NULL trace_id (possible in caller-built frames; parse_otlp_traces
    # coalesces to "") must not crash the string concat below
    trace_id = (rows[0]["trace_id"] if rows else "") or ""

    def summary_id(key: tuple) -> str:
        return hashlib.md5(
            ("sp|" + trace_id + "|" + repr(key)).encode()
        ).hexdigest()[:16]

    out = []
    for r in rows:
        if id(r) in marked:
            continue
        c = dict(r)
        key = preserved.get(id(r))
        if key is not None:
            attrs = dict(c["attributes"] or {})
            attrs[prefix + "summary_span_id"] = summary_id(key)
            c["attributes"] = attrs
        out.append(c)

    for key, g in groups.items():
        nodes = g["nodes"]
        template = max(nodes, key=dur_ns)
        durs = [dur_ns(r) for r in nodes]
        tpl_parent = template["parent_span_id"] or ""
        parent_row = by_id.get(tpl_parent)
        if parent_row is not None and id(parent_row) in marked:
            tpl_parent = summary_id(marked[id(parent_row)])
        attrs = dict(template["attributes"] or {})
        attrs[prefix + "is_summary"] = "true"
        attrs[prefix + "span_count"] = str(len(nodes))
        attrs[prefix + "duration_min_ns"] = str(min(durs))
        attrs[prefix + "duration_max_ns"] = str(max(durs))
        attrs[prefix + "duration_total_ns"] = str(sum(durs))
        attrs[prefix + "duration_avg_ns"] = str(sum(durs) // len(nodes))
        if g["preserved"]:
            attrs[prefix + "preserved_outlier_count"] = str(len(g["preserved"]))
        s = dict(template)
        s["span_id"] = summary_id(key)
        s["parent_span_id"] = tpl_parent
        # skip NaT members: min/max over NaT is order-dependent (NaT
        # comparisons are all-False), and a summary spanning the union
        # of defined times matches the reference's nil-timestamp skip
        starts = [r["start_ts"] for r in nodes if not pd.isna(r["start_ts"])]
        ends = [r["end_ts"] for r in nodes if not pd.isna(r["end_ts"])]
        s["start_ts"] = min(starts) if starts else None
        s["end_ts"] = max(ends) if ends else None
        s["attributes"] = attrs
        out.append(s)

    return out


def span_pruning(
    df: DataFrame,
    min_spans_to_aggregate: int = 5,
    max_parent_depth: int = 2,
    group_by_attributes: tuple = (),
    prefix: str = "pruning.",
    outlier_method: str | None = None,
    iqr_multiplier: float = 1.5,
    mad_threshold: float = 3.0,
    preserve_outliers: bool = False,
) -> DataFrame:
    """Apply span pruning to the span frame (``parse_otlp_traces``
    output shape).  One shuffle on trace_id; the per-trace tree walk is
    a documented Arrow-batched Python path like the tail sampler's.

    Execution shape: hash-repartition on trace_id + partition-local sort,
    then ONE Python invocation per Arrow batch under ``mapInPandas`` with
    a tail-carry for the batch-straddling trace — NOT
    ``groupBy(trace_id).applyInPandas``, which pays a Spark↔Python round
    trip per trace (trace_id is data-scaled cardinality; see
    ``otlpproto.trace_proto_sizes`` for the measured per-group cost).
    Records are sorted by (trace_id, span_id) so the max-duration
    template tie-break is deterministic across reruns, matching the
    module's md5-replayability contract."""
    if outlier_method not in (None, "iqr", "mad"):
        raise ValueError(f"unknown outlier method {outlier_method!r}")
    patterns = tuple(group_by_attributes)
    cols = df.columns

    def prune_stream(it):
        import itertools

        from sparkotel.batching import iter_whole_key_groups

        for frame in iter_whole_key_groups(it, "trace_id"):
            out: list = []
            for _, g in itertools.groupby(
                frame.to_dict("records"), key=lambda r: r["trace_id"]
            ):
                out.extend(
                    _prune_trace(
                        list(g), min_spans_to_aggregate, max_parent_depth,
                        patterns, prefix, outlier_method, iqr_multiplier,
                        mad_threshold, preserve_outliers,
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=cols)

    from pyspark.sql import functions as F

    return (
        df.repartition(F.col("trace_id"))
        .sortWithinPartitions("trace_id", "span_id")
        .mapInPandas(prune_stream, df.schema)
    )
