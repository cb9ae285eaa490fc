"""Trace-to-logs/metrics connectors: slowsql + exceptions.

Reimplements (Spark-first, over the ``parse_otlp_traces`` /
``parse_otlp_spanevents`` frames):

- ``slowsqlconnector`` — emit one log record per CLIENT-kind database
  span whose duration crosses the configured threshold and whose
  ``db.system.name`` is in the allow-list
  (``connector/slowsqlconnector/connector_logs.go:51-86`` filter,
  ``attrToLogRecord`` at ``connector_logs.go:106-135``; constants
  ``connector.go:10-18``; defaults ``config.go:18-30`` — 500 ms, db
  systems h2/mongodb/mssql/mysql/oracle/progress/postgresql/mariadb).

- ``exceptionsconnector`` — for every span EVENT named ``exception``:
  a metrics arm counting by (service.name, span.name, span.kind,
  status.code + configured dimensions)
  (``connector/exceptionsconnector/connector_metrics.go:75-110``
  ConsumeTraces, ``buildDimensionKVs`` at 184-197) and a logs arm
  emitting one ERROR log record per event with the span's attributes
  plus the common keys and the stacktrace
  (``connector_logs.go:50-135``).

Dimension lookup order is the reference's ``pdatautil.GetDimensionValue``
(``internal/pdatautil/attributes.go:20-31``): span attrs, then (for
exceptions) event attrs, then resource attrs, then the configured
default — a ``coalesce`` chain here, no join, no UDF.

Scale shape: both logs arms are a single filter + projection (zero
shuffle, whole-stage codegen); the metrics arm is one map-side-combined
hash aggregate keyed on low-cardinality dimensions.  The reference's
wall-clock datapoint timestamps (``connector_metrics.go:135``) are not
cluster-reproducible; the batch analogue emits the min/max event
timestamp per group instead (documented divergence, same pattern as the
countconnector port).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# connector/slowsqlconnector/config.go:22 (default DBSystem list)
DEFAULT_DB_SYSTEMS = (
    "h2", "mongodb", "mssql", "mysql", "oracle", "progress", "postgresql", "mariadb",
)

# traceutil.SpanKindStr / StatusCodeStr
# (internal/coreinternal/traceutil/traceutil.go:16-47)
_SPAN_KINDS = (
    "SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL", "SPAN_KIND_SERVER",
    "SPAN_KIND_CLIENT", "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER",
)
_STATUS_CODES = ("STATUS_CODE_UNSET", "STATUS_CODE_OK", "STATUS_CODE_ERROR")

SPAN_KIND_CLIENT = 3


def span_kind_str(kind: Column) -> Column:
    """Numeric proto enum → reference's SpanKindStr ('' out of range)."""
    expr = F.lit("")
    for i, s in enumerate(_SPAN_KINDS):
        expr = F.when(kind == i, F.lit(s)).otherwise(expr)
    return expr


def status_code_str(code: Column) -> Column:
    expr = F.lit("")
    for i, s in enumerate(_STATUS_CODES):
        expr = F.when(code == i, F.lit(s)).otherwise(expr)
    return expr


def _dim_value(
    name: str, default: str | None, maps: Sequence[Column]
) -> Column:
    """GetDimensionValue precedence: each map in order, then default."""
    chain = [m[name] for m in maps]
    if default is not None:
        chain.append(F.lit(default))
    return F.coalesce(*chain) if len(chain) > 1 else chain[0]


def _overlay(base: Column, extra: Mapping[str, Column]) -> Column:
    """attributes-map union where ``extra`` wins (PutStr overwrite)."""
    keys, vals = zip(*extra.items())
    ex = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]), F.array(*vals)
    )
    return F.map_concat(F.map_filter(base, lambda k, _: ~k.isin(*keys)), ex)


def slow_sql_logs(
    spans: DataFrame,
    threshold_ms: float = 500.0,
    db_systems: Sequence[str] = DEFAULT_DB_SYSTEMS,
    dimensions: Sequence[tuple[str, str | None]] = (),
) -> DataFrame:
    """connector_logs.go:51-86: resource must carry service.name, span
    kind CLIENT, duration ≥ threshold, db.system.name ∈ allow-list →
    log record (ts = span start, severity ERROR/'SLOW', ids, span attrs
    + common keys + exec duration in nanoseconds)."""
    a = F.col("attributes")
    r = F.col("resource")
    dur_ns = (
        F.unix_micros(F.col("end_ts").cast("timestamp"))
        - F.unix_micros(F.col("start_ts").cast("timestamp"))
    ) * 1000
    out = spans.where(
        r["service.name"].isNotNull()
        & (F.col("kind") == SPAN_KIND_CLIENT)
        & (dur_ns >= F.lit(int(threshold_ms * 1_000_000)))
        & a["db.system.name"].isin(*db_systems)
    )
    common = {
        "span.name": F.col("name"),
        "span.kind": span_kind_str(F.col("kind")),
        "status.code": status_code_str(F.col("status_code")),
        "service.name": r["service.name"],
        # getValue(): missing db.statement → "" (connector_logs.go:139-144)
        "db.statement": F.coalesce(a["db.statement"], F.lit("")),
        "db.client.operation.duration": dur_ns.cast("string"),
    }
    for name, default in dimensions:
        common[name] = _dim_value(name, default, [a, r])
    return out.select(
        F.col("start_ts").alias("ts"),
        F.lit(17).alias("severity_number"),
        F.lit("SLOW").alias("severity_text"),
        F.col("trace_id"),
        F.col("span_id"),
        _overlay(a, common).alias("attributes"),
    )


def _exception_events(spanevents: DataFrame) -> DataFrame:
    """Shared gate: service.name present, event named 'exception'
    (connector_metrics.go:79-96)."""
    return spanevents.where(
        F.col("resource")["service.name"].isNotNull()
        & (F.col("event_name") == "exception")
    )


def exceptions_logs(
    spanevents: DataFrame,
    dimensions: Sequence[tuple[str, str | None]] = (),
) -> DataFrame:
    """One ERROR log record per exception event
    (connector_logs.go:98-135): ts = event time, span attrs copied,
    common keys overwrite, configured dims looked up span→event→
    resource, stacktrace always present ('' when missing)."""
    ev = _exception_events(spanevents)
    sa, ea, ra = F.col("span_attributes"), F.col("attributes"), F.col("resource")
    common = {
        "span.name": F.col("span_name"),
        "span.kind": span_kind_str(F.col("span_kind")),
        "status.code": status_code_str(F.col("status_code")),
        "service.name": ra["service.name"],
    }
    for name, default in dimensions:
        common[name] = _dim_value(name, default, [sa, ea, ra])
    # GetAttributeValue: missing stacktrace → "" (connector_logs.go:131-134)
    common["exception.stacktrace"] = F.coalesce(ea["exception.stacktrace"], F.lit(""))
    return ev.select(
        F.col("ts"),
        F.lit(17).alias("severity_number"),
        F.lit("ERROR").alias("severity_text"),
        F.col("trace_id"),
        F.col("span_id"),
        _overlay(sa, common).alias("attributes"),
    )


def exceptions_metrics(
    spanevents: DataFrame,
    dimensions: Sequence[tuple[str, str | None]] = (
        ("exception.type", None),
        ("exception.message", None),
    ),
    exemplars: bool = False,
) -> DataFrame:
    """The 'exceptions' monotonic-sum metric: count of exception events
    grouped by service.name/span.name/span.kind/status.code + dims
    (buildDimensionKVs, connector_metrics.go:184-197; default dims
    exception.type + exception.message per factory.go:28-36).  A dim
    that resolves nowhere is simply absent from the attr map — NULL
    group key here.  One hash aggregate; min/max event ts stand in for
    the reference's wall-clock stamps.

    ``exemplars`` mirrors ``config.Exemplars.Enabled``
    (connector_metrics.go:170-178: attach sampled span ids to the
    datapoint): the batch pick is the group member with the smallest
    md5(trace_id‖span_id) — one deterministic exemplar per group via
    min_by, never a collect_list, so group size doesn't matter."""
    ev = _exception_events(spanevents)
    sa, ea, ra = F.col("span_attributes"), F.col("attributes"), F.col("resource")
    keyed = ev.select(
        ra["service.name"].alias("service_name"),
        F.col("span_name").alias("span_name"),
        span_kind_str(F.col("span_kind")).alias("span_kind"),
        status_code_str(F.col("status_code")).alias("status_code"),
        *[
            _dim_value(name, default, [sa, ea, ra]).alias(name.replace(".", "_"))
            for name, default in dimensions
        ],
        F.col("ts"),
        F.col("trace_id"),
        F.col("span_id"),
    )
    dim_cols = [c for c in keyed.columns if c not in ("ts", "trace_id", "span_id")]
    aggs = [
        F.count(F.lit(1)).alias("exceptions_total"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    ]
    if exemplars:
        pick = F.md5(F.concat("trace_id", "span_id"))
        aggs += [
            F.min_by("trace_id", pick).alias("exemplar_trace_id"),
            F.min_by("span_id", pick).alias("exemplar_span_id"),
        ]
    return keyed.groupBy(*dim_cols).agg(*aggs)


def spanmetrics_events(
    spanevents: DataFrame,
    event_dimensions: Sequence[tuple[str, str | None]] = (),
    dimensions: Sequence[tuple[str, str | None]] = (),
) -> DataFrame:
    """spanmetricsconnector's 'events' sum metric
    (connector/spanmetricsconnector/connector.go:486-509): one count
    contribution per span EVENT, keyed by the standard span identity
    (service.name, span.name, span.kind, status.code) plus configured
    span dimensions and event dimensions.  Event-dimension lookup uses
    the span attributes first, then resource-and-event attributes
    merged with the EVENT winning on key conflicts (the manual Range
    copy at connector.go:489-497).  A dimension missing everywhere is
    simply absent (NULL group key) — the event still counts, unlike the
    countconnector's missing-dim drop.  One map-side-combined hash
    aggregate."""
    ev = spanevents.where(F.col("resource")["service.name"].isNotNull())
    sa, ea, ra = F.col("span_attributes"), F.col("attributes"), F.col("resource")
    merged = F.map_concat(
        F.map_filter(ra, lambda k, _: ~F.map_contains_key(ea, k)), ea
    )
    keyed = ev.select(
        ra["service.name"].alias("service_name"),
        F.col("span_name"),
        span_kind_str(F.col("span_kind")).alias("span_kind"),
        status_code_str(F.col("status_code")).alias("status_code"),
        *[
            _dim_value(name, default, [sa, merged]).alias(name.replace(".", "_"))
            for name, default in tuple(dimensions) + tuple(event_dimensions)
        ],
        F.col("ts"),
    )
    dim_cols = [c for c in keyed.columns if c != "ts"]
    return keyed.groupBy(*dim_cols).agg(
        F.count(F.lit(1)).alias("events_total"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
    )
