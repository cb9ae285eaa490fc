"""transformprocessor metric-context functions (ottlmetric editors).

The reference binds a second function registry at metric context —
editors that rewrite the *metric* (type / unit / name) or restructure
its data points, not just individual rows
(processor/transformprocessor/internal/metrics/functions.go).  The
engine's canonical frames are ``parse_otlp_metrics``'s number-point
rows (metric header columns repeated per point) and
``parse_otlp_histograms``'s histogram-point rows, so each function
here is a narrow-waist DataFrame→DataFrame transform over those
frames: a metric-level edit becomes a guarded column rewrite applied
to every row of the metric, and a point-restructuring function
becomes a select/union/groupBy.

All paths are pure Catalyst expressions — conversions and scaling are
`when/otherwise` projections (zero shuffle), `copy_metric` is a
union of two scans of the same frame (one stage each), and
`aggregate_on_attributes` is exactly one hash aggregate whose key is
the metric header + the kept attribute subset.  At 10^12-point scale
nothing here materializes per-metric state: the reference walks a
metric tree in memory; this walks columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_AGG_TEMPORALITY = {"delta": 1, "cumulative": 2}

# aggregation functions ConvertToAggregationFunction accepts
# (internal/coreinternal/aggregateutil/type.go:17-37)
_AGG_FUNCS = ("sum", "mean", "min", "max", "median", "count")


def _guard(df: DataFrame, cond: Column, updates: dict[str, Column]) -> DataFrame:
    """Apply column rewrites only where ``cond`` holds (rows of other
    metrics keep their values) — the per-metric dispatch the reference
    does with `metric.Type() != …: return` early-outs."""
    return df.withColumns(
        {c: F.when(cond, v).otherwise(F.col(c)) for c, v in updates.items()}
    )


def convert_sum_to_gauge(df: DataFrame) -> DataFrame:
    """``convert_sum_to_gauge()`` — sum metrics become gauges; points
    carry over; a gauge has no temporality or monotonicity in pdata so
    both header fields reset to their zero values
    (func_convert_sum_to_gauge.go:23-37)."""
    is_sum = F.col("metric_type") == "sum"
    return _guard(
        df,
        is_sum,
        {
            "metric_type": F.lit("gauge"),
            "aggregation_temporality": F.lit(0),
            "is_monotonic": F.lit(False),
        },
    )


def convert_gauge_to_sum(df: DataFrame, temporality: str, monotonic: bool) -> DataFrame:
    """``convert_gauge_to_sum(aggTemp, monotonic)`` — gauge metrics
    become sums with the requested temporality/monotonicity; unknown
    temporality is a plan-time error exactly like the factory's
    (func_convert_gauge_to_sum.go:37-45)."""
    if temporality not in _AGG_TEMPORALITY:
        raise ValueError(f"unknown aggregation temporality: {temporality}")
    is_gauge = F.col("metric_type") == "gauge"
    return _guard(
        df,
        is_gauge,
        {
            "metric_type": F.lit("sum"),
            "aggregation_temporality": F.lit(_AGG_TEMPORALITY[temporality]),
            "is_monotonic": F.lit(bool(monotonic)),
        },
    )


def scale_metric(
    df: DataFrame,
    multiplier: float,
    unit: str | None = None,
    where: Column | None = None,
) -> DataFrame:
    """``scale_metric(multiplier, unit)`` over the number-point frame:
    gauge/sum values multiply; the optional unit replaces the metric's
    (func_scale.go:36-69).  ``where`` narrows to a metric subset the
    way a transformprocessor statement condition does."""
    cond = where if where is not None else F.lit(True)
    updates: dict[str, Column] = {"value": F.col("value") * F.lit(float(multiplier))}
    if unit is not None:
        updates["unit"] = F.lit(unit)
    return _guard(df, cond, updates)


def scale_histogram(
    df: DataFrame, multiplier: float, where: Column | None = None
) -> DataFrame:
    """``scale_metric`` on the histogram-point frame: sum/min/max and
    every explicit bound multiply; counts do not (func_scale.go:93-117)."""
    m = F.lit(float(multiplier))
    cond = where if where is not None else F.lit(True)
    return _guard(
        df,
        cond,
        {
            "sum": F.col("sum") * m,
            "min": F.col("min") * m,
            "max": F.col("max") * m,
            "explicit_bounds": F.transform("explicit_bounds", lambda b: b * m),
        },
    )


def copy_metric(
    df: DataFrame,
    name: str | None = None,
    unit: str | None = None,
    where: Column | None = None,
) -> DataFrame:
    """``copy_metric(name=…, unit=…)`` — append a full copy of the
    matching metrics with optional new name/unit
    (func_copy_metric.go:34-62).  Two scans of the same frame unioned;
    Spark reuses the exchange-free subplan, no shuffle."""
    cond = where if where is not None else F.lit(True)
    copy = df.where(cond)
    if name is not None:
        copy = copy.withColumn("metric_name", F.lit(name))
    if unit is not None:
        copy = copy.withColumn("unit", F.lit(unit))
    return df.unionByName(copy)


_POINT_HEADER = [
    "metric_name",
    "unit",
    "metric_type",
    "aggregation_temporality",
    "is_monotonic",
    "resource",
    "scope_name",
]


def _merge_points(
    d: DataFrame,
    agg: str,
    rebuilt_attrs: Column,
    key_cols: list[str],
    rebuild_is_agg: bool = False,
) -> DataFrame:
    """Shared merge for the aggregate_on_* functions: one hash aggregate
    keyed on the metric header + attribute identity + timestamp; delta
    sums additionally key on start time (aggregateutil/aggregate.go:
    dataPointHashKey + groupByStartTime for delta temporality).

    ``resource`` is a map and can't be a group key either; its canonical
    sorted-entries string substitutes, with ``first(resource)`` carrying
    the value through.
    """
    if agg not in _AGG_FUNCS:
        raise ValueError(
            f"invalid aggregation function: '{agg}', valid options: "
            + ", ".join(_AGG_FUNCS)
        )
    start_key = F.when(
        (F.col("metric_type") == "sum") & (F.col("aggregation_temporality") == 1),
        F.col("start_ts"),
    )
    res_canon = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries("resource"),
                lambda e: F.concat_ws("\x01", e.getField("key"), e.getField("value")),
            )
        ),
        "\x02",
    )
    vals = {
        "sum": F.sum("value"),
        "mean": F.avg("value"),
        "min": F.min("value"),
        "max": F.max("value"),
        "median": F.median("value"),
        "count": F.count("value").cast("double"),
    }
    header_keys = [c for c in _POINT_HEADER if c != "resource"]
    aggs = [
        vals[agg].alias("value"),
        F.min("start_ts").alias("start_ts"),
        F.first("resource").alias("resource"),
    ]
    if rebuild_is_agg:
        aggs.append(rebuilt_attrs.alias("attributes"))
        out = (
            d.groupBy(
                *header_keys,
                res_canon.alias("_res_canon"),
                *key_cols,
                "ts",
                start_key.alias("_start_key"),
            )
            .agg(*aggs)
        )
    else:
        out = (
            d.groupBy(
                *header_keys,
                res_canon.alias("_res_canon"),
                *key_cols,
                "ts",
                start_key.alias("_start_key"),
            )
            .agg(*aggs)
            .withColumn("attributes", rebuilt_attrs)
        )
    return out.select(*_POINT_HEADER, "start_ts", "ts", "value", "attributes")


def aggregate_on_attributes(
    df: DataFrame, agg: str, attributes: list[str] | None = None
) -> DataFrame:
    """``aggregate_on_attributes(fn, [attrs])`` — keep only the named
    datapoint attributes (all dropped when the list is empty) and merge
    points that collide on (metric, kept attrs, timestamp); delta sums
    additionally key on start time (aggregateutil/aggregate.go:36-101,
    func_aggregate_on_attributes_metrics.go).  One hash aggregate.
    """
    kept = attributes or []
    # FilterAttrs: attributes not in the keep-list are removed before
    # grouping (aggregate.go:36-58).  Maps can't be Spark group keys, so
    # the kept subset is extracted to scalar key columns and the output
    # map rebuilt from them — same identity, hashable key.
    kept_vals = [F.col("attributes")[a].alias(f"_attr_{i}") for i, a in enumerate(kept)]
    rebuilt = (
        F.map_from_entries(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.lit(a).alias("key"),
                            F.col(f"_attr_{i}").alias("value"),
                        )
                        for i, a in enumerate(kept)
                    ]
                ),
                lambda e: e.getField("value").isNotNull(),
            )
        )
        if kept
        else F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
    )
    return _merge_points(df.select("*", *kept_vals), agg, rebuilt,
                         [f"_attr_{i}" for i in range(len(kept))])


def aggregate_on_attribute_value(
    df: DataFrame, agg: str, attribute: str, values: list[str], new_value: str
) -> DataFrame:
    """``aggregate_on_attribute_value(fn, attr, values, newValue)`` —
    rewrite the named attribute to ``new_value`` wherever its value is
    in ``values``, then merge points that now collide
    (func_agregate_on_attribute_value_metrics.go).  Points whose
    attribute is untouched still pass through the same groupBy with
    their original key, so the output is one aggregate either way."""
    hit = F.array_contains(
        F.array(*[F.lit(v) for v in values]), F.col("attributes")[attribute]
    )
    rewritten = F.map_from_entries(
        F.transform(
            F.map_entries("attributes"),
            lambda e: F.struct(
                e.getField("key").alias("key"),
                F.when(e.getField("key") == attribute, F.lit(new_value))
                .otherwise(e.getField("value"))
                .alias("value"),
            ),
        )
    )
    d = df.withColumn(
        "attributes", F.when(hit, rewritten).otherwise(F.col("attributes"))
    )
    # arbitrary attribute sets → canonical sorted-entries string as the
    # hashable stand-in for the map key (same trick as the count
    # connector's canonical dims string)
    canon = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries("attributes"),
                lambda e: F.concat_ws("\x01", e.getField("key"), e.getField("value")),
            )
        ),
        "\x02",
    )
    return _merge_points(
        d.select("*", canon.alias("_attr_canon")),
        agg,
        F.first("attributes"),
        ["_attr_canon"],
        rebuild_is_agg=True,
    )


def extract_sum_metric(
    hist: DataFrame, monotonic: bool, suffix: str = "_sum"
) -> DataFrame:
    """``extract_sum_metric(monotonic, suffix)`` — histogram points
    with a sum become number points of a new ``<name><suffix>`` sum
    metric carrying the histogram's temporality
    (func_extract_sum_metric.go:34-86).  Output is in the number-point
    frame so it unions straight into ``parse_otlp_metrics`` output."""
    return (
        hist.where(F.col("sum").isNotNull())
        .select(
            F.concat(F.col("metric_name"), F.lit(suffix)).alias("metric_name"),
            F.lit("").alias("unit"),
            F.lit("sum").alias("metric_type"),
            F.col("aggregation_temporality"),
            F.lit(bool(monotonic)).alias("is_monotonic"),
            "start_ts",
            "ts",
            F.col("sum").alias("value"),
            "attributes",
            "resource",
            F.lit("").alias("scope_name"),
        )
    )


def extract_count_metric(
    hist: DataFrame, monotonic: bool, suffix: str = "_count"
) -> DataFrame:
    """``extract_count_metric(monotonic, suffix)`` — histogram point
    counts as a new ``<name><suffix>`` sum metric
    (func_extract_count_metric.go, same shape as extract_sum)."""
    return (
        hist.where(F.col("count").isNotNull())
        .select(
            F.concat(F.col("metric_name"), F.lit(suffix)).alias("metric_name"),
            F.lit("").alias("unit"),
            F.lit("sum").alias("metric_type"),
            F.col("aggregation_temporality"),
            F.lit(bool(monotonic)).alias("is_monotonic"),
            "start_ts",
            "ts",
            F.col("count").cast("double").alias("value"),
            "attributes",
            "resource",
            F.lit("").alias("scope_name"),
        )
    )


def _summary_to_number(
    summ: DataFrame, value: Column, temporality: str, monotonic: bool, suffix: str
) -> DataFrame:
    if temporality not in _AGG_TEMPORALITY:
        raise ValueError(f"unknown aggregation temporality: {temporality}")
    return summ.select(
        F.concat(F.col("metric_name"), F.lit(suffix)).alias("metric_name"),
        "unit",
        F.lit("sum").alias("metric_type"),
        F.lit(_AGG_TEMPORALITY[temporality]).alias("aggregation_temporality"),
        F.lit(bool(monotonic)).alias("is_monotonic"),
        "start_ts",
        "ts",
        value.alias("value"),
        "attributes",
        "resource",
        "scope_name",
    )


def convert_summary_count_val_to_sum(
    summ: DataFrame, temporality: str, monotonic: bool, suffix: str = "_count"
) -> DataFrame:
    """``convert_summary_count_val_to_sum(aggTemp, monotonic)`` — every
    summary point's count becomes a point of a new ``<name>_count`` sum
    metric (func_convert_summary_count_val_to_sum.go:37-76).  Output is
    in the number-point frame."""
    return _summary_to_number(
        summ, F.col("count").cast("double"), temporality, monotonic, suffix
    )


def convert_summary_sum_val_to_sum(
    summ: DataFrame, temporality: str, monotonic: bool, suffix: str = "_sum"
) -> DataFrame:
    """``convert_summary_sum_val_to_sum(aggTemp, monotonic)`` — summary
    sums as a new ``<name>_sum`` sum metric
    (func_convert_summary_sum_val_to_sum.go, same shape as the count
    variant)."""
    return _summary_to_number(summ, F.col("sum"), temporality, monotonic, suffix)


def convert_summary_quantile_val_to_gauge(
    summ: DataFrame, attr_key: str = "quantile", suffix: str = ".quantiles"
) -> DataFrame:
    """``convert_summary_quantile_val_to_gauge(attr_key, suffix)`` —
    one gauge point per summary quantile value, the quantile recorded as
    a datapoint attribute (func_convert_summary_quantile_val_to_gauge.go:
    35-66; the reference PutDouble's the quantile — the engine's
    string-valued attribute map carries its decimal rendering)."""
    ex = summ.select("*", F.explode("quantiles").alias("_q"))
    return ex.select(
        F.concat(F.col("metric_name"), F.lit(suffix)).alias("metric_name"),
        "unit",
        F.lit("gauge").alias("metric_type"),
        F.lit(0).alias("aggregation_temporality"),
        F.lit(False).alias("is_monotonic"),
        "start_ts",
        "ts",
        F.col("_q").getField("value").alias("value"),
        F.map_concat(
            "attributes",
            F.map_from_arrays(
                F.array(F.lit(attr_key)),
                F.array(F.col("_q").getField("quantile").cast("string")),
            ),
        ).alias("attributes"),
        "resource",
        "scope_name",
    )


def extract_percentile_metric(
    hist: DataFrame, percentile: float, suffix: str | None = None
) -> DataFrame:
    """``extract_percentile_metric(percentile, suffix)`` — estimate a
    percentile per histogram point by linear interpolation inside the
    target bucket, emitted as a new ``<name>_p<q>`` gauge
    (func_extract_percentile_metric.go:46-185).

    Reference walk per point: target = ceil(count·p/100); scan buckets
    to the first whose cumulative count reaches target; lower bound is
    the previous explicit bound (or min/0 for the first bucket), upper
    the bucket's bound (or max for the overflow bucket); value =
    lower + (upper-lower)·(target-prevCum)/bucketCount.  Points the
    reference skips (zero count, no buckets, single unbounded bucket
    without min/max, overflow bucket without usable max → lowerBound,
    0 > first bound without min → upperBound) get the same treatment.
    All per-row array math — zero shuffle, no Python.
    """
    if not 0 < percentile < 100:
        raise ValueError(
            f"percentile must be greater than 0 and less than 100, got {percentile}"
        )
    name_suffix = suffix if suffix else f"_p{percentile:g}"
    counts, bounds = F.col("bucket_counts"), F.col("explicit_bounds")
    n = F.size(counts)
    well_formed = (F.size(bounds) + 1 == n) & (F.col("count") > 0) & (n > 0)

    target = F.ceil(F.col("count").cast("double") * F.lit(percentile / 100.0))
    # cumulative counts per bucket (buckets are few; O(n²) per row is fine)
    cum = F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.aggregate(
            F.slice(counts, 1, i + 1), F.lit(0).cast("long"), lambda a, x: a + x
        ),
    )
    # first bucket index whose cumulative count >= target (0-based)
    idx = (
        F.array_position(F.transform(cum, lambda c: c >= target), F.lit(True)) - 1
    ).cast("int")

    has_min = F.col("min").isNotNull()
    has_max = F.col("max").isNotNull()

    # single bucket spanning (-Inf, +Inf): needs min and max
    single = (n == 1) & (F.size(bounds) == 0)
    single_ok = single & has_min & has_max
    single_val = F.col("min") + (
        target.cast("double") / F.get(counts, 0)
    ) * (F.col("max") - F.col("min"))

    first_upper = F.get(bounds, 0)
    lower0 = F.when(has_min & (F.col("min") < first_upper), F.col("min")).otherwise(
        F.lit(0.0)
    )
    # 0 > upperBound and no valid min → return upperBound directly
    first_degenerate = (idx == 0) & ~(has_min & (F.col("min") < first_upper)) & (
        F.lit(0.0) > first_upper
    )

    last = idx == F.size(bounds)  # overflow bucket
    lower_k = F.get(bounds, idx - 1)
    # overflow bucket: use max, else return lowerBound
    last_degenerate = last & (~has_max | (F.col("max") <= lower_k))

    lower = F.when(idx == 0, lower0).otherwise(lower_k)
    upper = F.when(last, F.col("max")).otherwise(F.get(bounds, idx))
    prev_cum = F.when(idx == 0, F.lit(0).cast("long")).otherwise(F.get(cum, idx - 1))
    ratio = (target - prev_cum).cast("double") / F.get(counts, idx)
    interp = lower + ratio * (upper - lower)

    value = F.when(single, single_val).when(first_degenerate, first_upper).when(
        last_degenerate, lower_k
    ).otherwise(interp)
    keep = F.when(single, single_ok & (F.col("count") > 0)).otherwise(
        well_formed & (idx >= 0)
    )

    return (
        hist.withColumn("_pv", F.when(keep, value))
        .where(F.col("_pv").isNotNull())
        .select(
            F.concat(F.col("metric_name"), F.lit(name_suffix)).alias("metric_name"),
            F.lit("gauge").alias("metric_type"),
            F.lit(0).alias("aggregation_temporality"),
            F.lit(False).alias("is_monotonic"),
            "start_ts",
            "ts",
            F.col("_pv").alias("value"),
            "attributes",
            "resource",
        )
    )


def convert_exponential_hist_to_explicit_hist(
    df: DataFrame, distribution: str, explicit_bounds: list[float]
) -> DataFrame:
    """``convert_exponential_hist_to_explicit_hist(distribution,
    [bounds])`` — rebin base-2 exponential-histogram points onto fixed
    explicit bounds (func_convert_exponential_hist_to_explicit_hist.go:
    56-243).

    Input frame: one row per exponential datapoint with ``scale``,
    ``zero_count``, ``positive_offset``, ``positive_bucket_counts``
    (the OTLP ExponentialHistogramDataPoint positive half).  Output
    replaces those with ``bucket_counts`` / ``explicit_bounds`` in the
    explicit histogram-point shape.

    Per source bucket at index i: idx = offset+i, factor = ln2·2^-scale,
    bounds (exp(idx·factor), exp((idx+1)·factor)]; a bucket lying past
    the last boundary overflows, one nested between two adjacent
    boundaries lands exactly, anything else goes through the chosen
    distribution — ``upper`` (first boundary ≥ upper), ``midpoint``
    (boundary bracketing the bucket midpoint, off-by-one per the
    reference), or ``uniform`` (integer split with remainder to the
    leading cells).  ZeroCount lands in bucket 0 iff boundaries start
    at 0.  ``random`` is rejected: it draws from a process-local RNG —
    not reproducible across a cluster, and the reference itself
    documents it only as a smoothing variant of uniform.

    Everything is per-row array math over plan-time-constant
    boundaries — zero shuffle, no Python.
    """
    import math as _math

    if not explicit_bounds:
        raise ValueError(f"explicit bounds cannot be empty: {explicit_bounds}")
    if distribution == "random":
        raise ValueError(
            "random distribution is not reproducible on a cluster; "
            "use 'uniform' (random is uniform plus RNG jitter)"
        )
    if distribution not in ("upper", "midpoint", "uniform"):
        raise ValueError(
            f"invalid distribution algorithm: {distribution}, must be one of "
            "[upper, midpoint, random, uniform]"
        )
    bnd = [float(b) for b in explicit_bounds]
    nb = len(bnd)

    counts = F.col("positive_bucket_counts")
    off = F.col("positive_offset").cast("double")
    factor = F.lit(_math.log(2.0)) * F.pow(F.lit(2.0), -F.col("scale").cast("double"))
    zeros = F.array(*[F.lit(0).cast("long") for _ in range(nb)])

    def single(target: Column, c: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(nb - 1)),
            lambda j: F.when(j == target, c).otherwise(F.lit(0).cast("long")),
        )

    def contrib(i: Column) -> Column:
        lower = F.exp((off + i.cast("double")) * factor)
        upper = F.exp((off + i.cast("double") + 1) * factor)
        c = F.get(counts, i)

        # exact fit: nested between two adjacent boundaries (lines 133-140)
        fit = F.lit(None).cast("int")
        for b in range(nb - 1, 0, -1):
            fit = F.when(
                (lower > F.lit(bnd[b - 1])) & (upper <= F.lit(bnd[b])), F.lit(b - 1)
            ).otherwise(fit)

        if distribution == "upper":
            tgt = F.lit(nb - 1)
            for j in range(nb - 1, -1, -1):
                tgt = F.when(upper <= F.lit(bnd[j]), F.lit(j)).otherwise(tgt)
            dist = single(tgt, c)
        elif distribution == "midpoint":
            mid = (upper + lower) / 2
            tgt = F.lit(nb - 1)
            for j in range(nb - 1, -1, -1):
                tgt = F.when(
                    mid <= F.lit(bnd[j]), F.lit(max(j - 1, 0))
                ).otherwise(tgt)
            dist = single(tgt, c)
        else:  # uniform (lines 200-243)
            start = F.lit(nb - 1)
            for j in range(nb - 1, -1, -1):
                start = F.when(lower <= F.lit(bnd[j]), F.lit(j)).otherwise(start)
            end = F.lit(nb)
            for j in range(nb - 1, -1, -1):
                end = F.when(upper <= F.lit(bnd[j]), F.lit(j)).otherwise(end)
            end = F.least(end, F.lit(nb - 1))
            span = (end - start + 1).cast("long")
            per, rem = c / span, c % span
            dist = F.transform(
                F.sequence(F.lit(0), F.lit(nb - 1)),
                lambda j: F.when(
                    end > start,
                    F.when(
                        (j >= start) & (j <= end),
                        F.floor(per)
                        + F.when((j - start) < rem, F.lit(1)).otherwise(F.lit(0)),
                    ).otherwise(F.lit(0)),
                )
                .otherwise(F.when(j == start, c).otherwise(F.lit(0)))
                .cast("long"),
            )

        overflow = single(F.lit(nb - 1), c)
        fitted = single(fit, c)
        return (
            F.when(lower > F.lit(bnd[-1]), overflow)
            .when(fit.isNotNull(), fitted)
            .otherwise(dist)
        )

    contribs = F.transform(F.sequence(F.lit(0), F.size(counts) - 1), contrib)
    summed = F.aggregate(
        contribs, zeros, lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b)
    )
    if bnd[0] == 0.0:
        zc = F.when(F.col("zero_count") > 0, F.col("zero_count")).otherwise(
            F.lit(0).cast("long")
        )
        summed = F.transform(
            summed, lambda v, j: F.when(j == 0, v + zc).otherwise(v)
        )
    # empty positive half → all-zero buckets (sequence over empty array
    # yields an empty contribs list and aggregate returns the seed)
    summed = F.when(F.size(counts) > 0, summed).otherwise(
        zeros if bnd[0] != 0.0 else F.transform(
            zeros,
            lambda v, j: F.when(
                (j == 0) & (F.col("zero_count") > 0), F.col("zero_count")
            ).otherwise(v),
        )
    )
    keep = [
        c
        for c in df.columns
        if c not in ("scale", "zero_count", "zero_threshold",
                     "positive_offset", "positive_bucket_counts")
    ]
    return df.select(
        *keep,
        summed.alias("bucket_counts"),
        F.array(*[F.lit(b) for b in bnd]).alias("explicit_bounds"),
    )


def merge_histogram_buckets(
    hist: DataFrame, target_value: float, method: str = "remove_explicit_bound"
) -> DataFrame:
    """``merge_histogram_buckets(target_value, method)`` over the
    histogram-point frame (func_merge_histogram_buckets.go:42-199).

    ``remove_explicit_bound``: the bucket whose upper bound equals
    ``target_value`` folds into its right neighbour and the bound
    disappears (lines 117-144).  ``limit_buckets``: when a point has
    more than ``target_value`` buckets and strictly increasing bounds,
    counts compact in chunks of ``ceil(n/max)`` (sum per chunk) and
    every ``divisor``-th bound survives (lines 153-198).  Malformed
    points (len(bounds)+1 != len(counts), single bucket) pass through
    untouched, as in the reference.  Per-row array math — zero shuffle.
    """
    counts, bounds = F.col("bucket_counts"), F.col("explicit_bounds")
    well_formed = (F.size(bounds) + 1 == F.size(counts)) & (F.size(counts) > 1)

    if method == "remove_explicit_bound":
        # findBoundIndex: first bound exactly equal to the target
        t = F.array_position(bounds, F.lit(float(target_value))) - 1  # 0-based; -1 if absent
        apply = well_formed & (t >= 0)
        bumped = F.transform(
            counts, lambda c, i: F.when(i == t + 1, c + F.get(counts, t)).otherwise(c)
        )
        new_counts = F.filter(bumped, lambda _, i: i != t)
        new_bounds = F.filter(bounds, lambda _, i: i != t)
    elif method == "limit_buckets":
        max_b = int(target_value)
        if max_b < 1 or float(max_b) != float(target_value):
            raise ValueError(
                "target_value must be a positive integer when method is "
                f"'limit_buckets', got {target_value}"
            )
        # zip_with pads the shorter (shifted) side with null — the last
        # pair has no successor, which vacuously satisfies "increasing"
        increasing = F.forall(
            F.zip_with(
                bounds,
                F.slice(bounds, 2, 2147483646),
                lambda a, b: b.isNull() | (b > a),
            ),
            lambda x: x,
        )
        n = F.size(counts)
        apply = well_formed & (n > F.lit(max_b)) & increasing
        divisor = (F.floor((n - 1) / F.lit(max_b)) + 1).cast("int")  # ceilDiv
        chunks = F.sequence(F.lit(0), F.floor((n - 1) / divisor).cast("int"))
        new_counts = F.transform(
            chunks,
            lambda i: F.aggregate(
                F.slice(counts, i * divisor + 1, divisor),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
        )
        new_bounds = F.filter(bounds, lambda _, i: (i + 1) % divisor == 0)
    else:
        raise ValueError(
            f"unsupported method {method!r}, expected 'remove_explicit_bound' "
            "or 'limit_buckets'"
        )

    # both outputs derive from the same pre-merge arrays: compute them in
    # one struct so neither sees the other's update
    merged = F.when(
        apply, F.struct(new_counts.alias("c"), new_bounds.alias("b"))
    ).otherwise(F.struct(counts.alias("c"), bounds.alias("b")))
    return (
        hist.withColumn("_merged", merged)
        .withColumn("bucket_counts", F.col("_merged.c"))
        .withColumn("explicit_bounds", F.col("_merged.b"))
        .drop("_merged")
    )
