"""signaltometricsconnector: OTTL-driven metric generation from any
signal frame (spans / datapoints / logs / span events).

Reimplements ``connector/signaltometricsconnector`` — per metric
definition: OR-ed OTTL ``conditions``, ``attributes`` with
default_value/optional semantics, OTTL ``value``/``count`` extraction,
and one of four metric types (``connector.go:75-160`` dispatch,
``internal/aggregator/*.go`` datapoint math):

- sum    — running total of value per group (``sumdp.go:29-41``)
- gauge  — last value wins (``gaugedp.go:21-28``; arrival order is a
  batch non-concept, so "last" = max by an explicit order column,
  value-tiebroken for determinism — documented divergence)
- histogram — explicit bounds, upper-inclusive buckets via
  ``sort.SearchFloat64s`` (``explicithistogram.go:44-48``:
  sum += value·count, counts[search(bounds, value)] += count)
- exponential_histogram — base-2 bucket halves + zero bucket
  (``exphistogram.go``).  The reference's go-expohisto auto-downscales
  to fit ``max_size``; a per-group adaptive scale would make bucket
  identities data-dependent, so this port takes an explicit fixed
  ``scale`` (the steady-state of the auto-scaler) and validates that
  the observed bucket span fits ``max_size`` via the long-format
  output (callers can assert).

Attribute semantics (README "Attributes", ``model.go``): plain key →
signal must carry it (else the row is skipped); ``default_value`` →
coalesce; ``optional`` → pass through (NULL allowed, never gates).
``include_resource_attributes`` applies the same semantics against the
resource map; when empty the full resource map becomes one
deterministic identity column (sorted-key JSON), mirroring the
reference's resource-hash keying (``model.go`` attrhash).

Everything compiles to native column expressions through the OTTL
Compiler (``sparkotel/expr.py``) — conditions/value/count accept the
full converter registry incl. the connector's custom
``AdjustedCount()``.  Scale shape: condition+attribute gating is a
codegen filter; every metric type is exactly ONE map-side-combined
hash aggregate on low-cardinality keys (histogram bucket counts are
N+1 conditional sums, not a per-bucket shuffle).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce
from operator import or_

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkotel.expr import Compiler, _c, parse_expr

# config.go defaultHistogramBuckets
DEFAULT_BUCKETS = (
    2.0, 4.0, 6.0, 8.0, 10.0, 50.0, 100.0, 200.0, 400.0, 800.0,
    1000.0, 1400.0, 2000.0, 5000.0, 10_000.0, 15_000.0,
)

_DEFAULT_ORDER = {"span": "start_ts", "spanevent": "ts", "datapoint": "ts", "log": "ts"}


@dataclass(frozen=True)
class Attr:
    key: str
    default_value: str | None = None
    optional: bool = False


@dataclass(frozen=True)
class MetricDef:
    name: str
    metric_type: str = "sum"  # sum | gauge | histogram | exponential_histogram
    value: str = "1"  # OTTL value expression
    count: str | None = None  # OTTL count expression (histograms); default 1
    monotonic: bool = False
    buckets: tuple[float, ...] = DEFAULT_BUCKETS
    scale: int = 4
    max_size: int = 160
    attributes: tuple[Attr, ...] = ()
    include_resource_attributes: tuple[Attr, ...] = ()
    conditions: tuple[str, ...] = ()
    # README "Error Handling": propagate (default) lets a bad value
    # expression fail the job; ignore/silent skip the records whose
    # extraction came back NULL (the column engine's per-row error
    # form) and keep aggregating the rest
    error_mode: str = "propagate"


def _attr_cols(
    map_col: Column, attrs: tuple[Attr, ...]
) -> tuple[list[Column], list[Column]]:
    """(group columns, required-presence filters) per README semantics."""
    cols, gates = [], []
    for a in attrs:
        v = map_col[a.key]
        if a.default_value is not None:
            v = F.coalesce(v, F.lit(a.default_value))
        elif not a.optional:
            gates.append(map_col[a.key].isNotNull())
        cols.append(v.alias(a.key.replace(".", "_")))
    return cols, gates


def _resource_identity(d: MetricDef) -> tuple[list[Column], list[Column]]:
    if d.include_resource_attributes:
        return _attr_cols(F.col("resource"), d.include_resource_attributes)
    # full-resource keying: deterministic sorted-entry JSON of the map
    ent = F.array_sort(F.map_entries(F.col("resource")))
    return [F.to_json(ent).alias("resource_id")], []


def signal_to_metrics(
    df: DataFrame,
    d: MetricDef,
    ctx: str = "span",
    order_col: str | None = None,
) -> DataFrame:
    comp = Compiler(df, ctx=ctx)

    if d.conditions:
        conds = [
            F.coalesce(_c(comp.compile_bool(parse_expr(c))), F.lit(False))
            for c in d.conditions
        ]
        df = df.where(reduce(or_, conds))
        comp = Compiler(df, ctx=ctx)

    res_cols, res_gates = _resource_identity(d)
    attr_cols, attr_gates = _attr_cols(F.col("attributes"), d.attributes)
    for g in res_gates + attr_gates:
        df = df.where(g)
        comp = Compiler(df, ctx=ctx)

    val = _c(comp.compile(parse_expr(d.value)))
    cnt = (
        F.lit(1).cast("long")
        if d.count is None
        else _c(comp.compile(parse_expr(d.count))).cast("long")
    )
    keys = res_cols + attr_cols
    base = df.select(
        *keys,
        val.alias("_value"),
        cnt.alias("_count"),
        F.col(order_col or _DEFAULT_ORDER[ctx]).alias("_order"),
    )
    if d.error_mode in ("ignore", "silent"):
        base = base.where(F.col("_value").isNotNull() & F.col("_count").isNotNull())
    elif d.error_mode == "propagate":
        # README "Error Handling": propagate (the default) FAILS the
        # pipeline when a value/count expression errors on a record.  A
        # per-record extraction error is NULL in columnar form; letting
        # NULL-skipping aggregates drop it would silently vanish records
        # in the mode that promises loudness.  Surface it as a task
        # failure: both checked columns guard on BOTH nullities so the
        # check survives column pruning (sum/gauge never read _count).
        ok = F.col("_value").isNotNull() & F.col("_count").isNotNull()
        err = F.raise_error(
            F.lit(
                f"signaltometrics {d.name}: value/count expression produced "
                "NULL for a record (error_mode=propagate); set "
                "error_mode='ignore' to drop such records"
            )
        )
        base = base.withColumns({
            "_value": F.when(ok, F.col("_value")).otherwise(err),
            "_count": F.when(ok, F.col("_count")).otherwise(err).cast("long"),
        })
    else:
        raise ValueError(f"unknown error_mode: {d.error_mode}")
    key_names = [c for c in base.columns if c not in ("_value", "_count", "_order")]
    gb = base.groupBy(*key_names)
    name = F.lit(d.name).alias("metric_name")

    if d.metric_type == "sum":
        return gb.agg(F.sum("_value").alias("value")).select(name, "*")
    if d.metric_type == "gauge":
        # last-write-wins; batch "last" = max (order, value) pair
        return gb.agg(
            F.max(F.struct("_order", "_value")).getField("_value").alias("value")
        ).select(name, "*")
    if d.metric_type == "histogram":
        v = F.col("_value").cast("double")
        c = F.col("_count")
        # sort.SearchFloat64s(bounds, v): index of first bound >= v
        # == number of bounds strictly below v (upper-inclusive buckets)
        bucket_sums = [
            F.coalesce(
                F.sum(
                    F.when(
                        _bucket_idx(v, d.buckets) == i, c
                    )
                ),
                F.lit(0),
            )
            for i in range(len(d.buckets) + 1)
        ]
        return gb.agg(
            F.sum(c).alias("count"),
            F.sum(v * c).alias("sum"),
            F.array(*bucket_sums).alias("bucket_counts"),
        ).select(
            name,
            "*",
            F.array(*[F.lit(b) for b in d.buckets]).alias("explicit_bounds"),
        )
    if d.metric_type == "exponential_histogram":
        # long format: one row per (group, sign, bucket_index) plus the
        # zero bucket as sign='zero' (index NULL) — same shape as
        # operators/aggregate.exponential_histogram, weighted by count
        v = F.col("_value").cast("double")
        c = F.col("_count")
        is_zero = v == 0.0
        sign = (
            F.when(is_zero, F.lit("zero"))
            .when(v < 0, F.lit("negative"))
            .otherwise(F.lit("positive"))
        )
        idx = F.when(
            ~is_zero,
            (F.ceil(F.log2(F.abs(v)) * F.lit(float(2**d.scale))) - 1).cast("int"),
        )
        return (
            base.where(v.isNotNull())
            .groupBy(*key_names, sign.alias("sign"), idx.alias("bucket_index"))
            .agg(
                F.sum(c).alias("bucket_count"),
                F.round(F.min(v), 6).alias("min_value"),
                F.round(F.max(v), 6).alias("max_value"),
            )
            .select(name, "*", F.lit(d.scale).alias("scale"))
        )
    raise ValueError(f"unknown metric type: {d.metric_type}")


def _bucket_idx(v: Column, bounds: tuple[float, ...]) -> Column:
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.size(F.filter(arr, lambda b: b < v))
