"""metricsaslogsconnector: one structured log record per metric data
point.

Reimplements ``connector/metricsaslogsconnector/connector.go`` over the
parsed OTLP/JSON point frames: every data point becomes a log record
with body "metric converted to log", the point's timestamp (+ observed
timestamp = start timestamp when present, ``setLogRecordFromDataPoint``
at connector.go:206-219), the datapoint attributes copied first, then
the ``metric.*`` header attributes and a per-type value family:

- number points → ``gauge.value`` / ``sum.value`` (+ is_monotonic,
  aggregation_temporality for the sum arm, connector.go:163-177)
- histogram points → ``histogram.count/sum[/min/max]`` +
  ``histogram.bucket_counts`` / ``histogram.explicit_bounds``
  (slices rendered as JSON arrays in the string-valued attr map)
- summary points → ``summary.count/sum`` +
  ``summary.quantile_values`` as a JSON list of {quantile, value}

``include_resource_attributes`` / ``include_scope_info`` mirror the
config defaults (both true, config.go:20-24).  All three arms are pure
projections — zero shuffle, zero UDF.  Divergence: the pdata attr map
is typed (PutInt/PutDouble); this port's attribute maps are
string-valued throughout, so numeric values are canonical-cast strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TEMPORALITY = {0: "Unspecified", 1: "Delta", 2: "Cumulative"}


def _temporality_str(col: Column) -> Column:
    expr = F.lit("Unspecified")
    for n, s in _TEMPORALITY.items():
        expr = F.when(col == n, F.lit(s)).otherwise(expr)
    return expr


def _overlay(base: Column, extra: dict[str, Column]) -> Column:
    keys, vals = zip(*extra.items())
    ex = F.map_from_arrays(F.array(*[F.lit(k) for k in keys]), F.array(*vals))
    return F.map_concat(F.map_filter(base, lambda k, _: ~k.isin(*keys)), ex)


def _finish(
    df: DataFrame,
    attrs: Column,
    include_resource_attributes: bool,
    include_scope_info: bool,
) -> DataFrame:
    cols = [
        F.col("ts"),
        F.when(F.col("start_ts").isNotNull(), F.col("start_ts")).alias("observed_ts"),
        F.lit("metric converted to log").alias("body"),
        attrs.alias("attributes"),
    ]
    if include_resource_attributes:
        cols.append(F.col("resource"))
    if include_scope_info and "scope_name" in df.columns:
        cols.append(F.col("scope_name"))
    return df.select(*cols)


def number_points_as_logs(
    points: DataFrame,
    include_resource_attributes: bool = True,
    include_scope_info: bool = True,
) -> DataFrame:
    """Gauge + sum arms of parse_otlp_metrics' number-point frame."""
    is_sum = F.col("metric_type") == "sum"
    common = {
        "metric.name": F.col("metric_name"),
        "metric.type": F.when(is_sum, "Sum").otherwise("Gauge"),
        "metric.description": F.coalesce(
            F.col("description") if "description" in points.columns else F.lit(None),
            F.lit(""),
        ),
        "metric.unit": F.col("unit"),
    }
    attrs = _overlay(F.col("attributes"), common)
    sum_extra = {
        "metric.is_monotonic": F.when(F.col("is_monotonic"), "true").otherwise("false"),
        "metric.aggregation_temporality": _temporality_str(
            F.col("aggregation_temporality")
        ),
        "sum.value": F.col("value").cast("string"),
    }
    gauge_extra = {"gauge.value": F.col("value").cast("string")}
    attrs = F.when(is_sum, _overlay(attrs, sum_extra)).otherwise(
        _overlay(attrs, gauge_extra)
    )
    return _finish(points, attrs, include_resource_attributes, include_scope_info)


def histogram_points_as_logs(
    points: DataFrame,
    include_resource_attributes: bool = True,
    include_scope_info: bool = True,
) -> DataFrame:
    extra = {
        "metric.name": F.col("metric_name"),
        "metric.type": F.lit("Histogram"),
        "metric.description": F.lit(""),
        "metric.unit": F.lit(""),
        "metric.aggregation_temporality": _temporality_str(
            F.col("aggregation_temporality")
        ),
        "histogram.count": F.col("count").cast("string"),
        "histogram.sum": F.col("sum").cast("string"),
        "histogram.bucket_counts": F.to_json(F.col("bucket_counts")),
        "histogram.explicit_bounds": F.to_json(F.col("explicit_bounds")),
    }
    attrs = _overlay(F.col("attributes"), extra)
    # HasMin/HasMax gates (connector.go:234-241): only when present
    attrs = F.when(
        F.col("min").isNotNull(),
        _overlay(attrs, {"histogram.min": F.col("min").cast("string")}),
    ).otherwise(attrs)
    attrs = F.when(
        F.col("max").isNotNull(),
        _overlay(attrs, {"histogram.max": F.col("max").cast("string")}),
    ).otherwise(attrs)
    return _finish(points, attrs, include_resource_attributes, include_scope_info)


def summary_points_as_logs(
    points: DataFrame,
    include_resource_attributes: bool = True,
    include_scope_info: bool = True,
) -> DataFrame:
    extra = {
        "metric.name": F.col("metric_name"),
        "metric.type": F.lit("Summary"),
        "metric.description": F.lit(""),
        "metric.unit": F.col("unit"),
        "summary.count": F.col("count").cast("string"),
        "summary.sum": F.col("sum").cast("string"),
        "summary.quantile_values": F.to_json(F.col("quantiles")),
    }
    attrs = _overlay(F.col("attributes"), extra)
    return _finish(points, attrs, include_resource_attributes, include_scope_info)
