"""metricstarttimeprocessor: set start times for cumulative points that
arrive without one (processor/metricstarttimeprocessor/).

Strategies (README + internal/{truereset,subtractinitial,
starttimemetric}/adjuster.go), applied per time series — identity =
(metric header, attributes, resource, scope) — to cumulative sum points
whose start is missing (null) or degenerate (start == ts); all other
rows pass through untouched, and — like the reference, which ``continue``s
before touching its reference cache — valid-start points are transparent
to reset detection:

- ``true_reset_point``: the first point of each series becomes a True
  Reset point (start = its own ts); later points reuse that start until
  the value decreases (IsResetSum, timeseries_map.go:250-252), which
  starts a new segment anchored at ts − 1 ms (adjuster.go:218-227).
- ``subtract_initial_point``: the first point per series is DROPPED and
  becomes the reference; later points carry start = reference ts and
  value − reference value; a decrease re-anchors at ts − 1 ms with a
  zero reference (subtractinitial/adjuster.go:209-257).
- ``start_time_metric``: every missing-start cumulative point of a
  resource takes its start from that resource's
  ``process_start_time_seconds``-style metric (value = epoch seconds,
  starttimemetric/adjuster.go:24,64); resets still re-anchor at
  ts − 1 ms.  No wall-clock fallback in batch — rows in resources
  without the metric keep a null start.

Spark shape: ONE window partitioning per series (running ``last`` over
reset markers finds each row's segment head without a second shuffle);
``start_time_metric`` adds one broadcast-sized per-resource aggregate
joined back.  At 10^12 points the cost is one hash exchange on the
series key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_STRATEGIES = ("true_reset_point", "subtract_initial_point", "start_time_metric")

_SERIES_KEYS = ["metric_name", "unit", "metric_type", "scope_name"]

def _ms() -> Column:
    """1 ms interval (expr needs an active session — keep it lazy)."""
    return F.expr("INTERVAL 1 MILLISECOND")


def _canon(col: str) -> Column:
    return F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(col),
                lambda e: F.concat_ws("\x01", e.getField("key"), e.getField("value")),
            )
        ),
        "\x02",
    )


def adjust_start_time(
    df: DataFrame,
    strategy: str = "true_reset_point",
    start_time_metric_regex: str = "^process_start_time_seconds$",
) -> DataFrame:
    """Adjust cumulative-sum start times on the number-point frame
    (``parse_otlp_metrics`` output).  Histogram/summary points live in
    their own frames; the same segmentation recipe applies there (the
    reference's per-type adjusters differ only in which fields detect a
    reset)."""
    if strategy not in _STRATEGIES:
        raise ValueError(
            f"unknown strategy {strategy!r}, expected one of {_STRATEGIES}"
        )

    target = (
        (F.col("metric_type") == "sum")
        & (F.col("aggregation_temporality") == 2)
        & (F.col("start_ts").isNull() | (F.col("start_ts") == F.col("ts")))
    )
    adjust = df.where(target)
    passthrough = df.where(~F.coalesce(target, F.lit(False)))

    keys = [*_SERIES_KEYS, _canon("attributes").alias("_ak"), _canon("resource").alias("_rk")]
    a = adjust.select("*", *[k for k in keys if not isinstance(k, str)])
    part = [*_SERIES_KEYS, "_ak", "_rk"]
    w = Window.partitionBy(*part).orderBy("ts")
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    prev = F.lag("value").over(w)
    head = prev.isNull() | (F.col("value") < prev)  # series start or reset
    a = a.withColumn("_head", head)
    # running segment head: ts/value of the most recent head row
    seg_ts = F.last(F.when(F.col("_head"), F.col("ts")), ignorenulls=True).over(running)
    seg_val = F.last(F.when(F.col("_head"), F.col("value")), ignorenulls=True).over(running)
    first_seg = F.sum(F.col("_head").cast("int")).over(running) == 1

    if strategy == "true_reset_point":
        out = a.withColumn(
            "start_ts", F.when(first_seg, seg_ts).otherwise(seg_ts - _ms())
        )
    elif strategy == "subtract_initial_point":
        rn = F.row_number().over(w)
        out = (
            a.withColumn("_rn", rn)
            .withColumn(
                "start_ts", F.when(first_seg, seg_ts).otherwise(seg_ts - _ms())
            )
            .withColumn(
                "value",
                F.when(first_seg, F.col("value") - seg_val).otherwise(F.col("value")),
            )
            .where(F.col("_rn") > 1)
            .drop("_rn")
        )
    else:  # start_time_metric
        starts = (
            df.where(F.col("metric_name").rlike(start_time_metric_regex))
            .select(_canon("resource").alias("_rk"), F.col("value").alias("_st_sec"))
            .groupBy("_rk")
            .agg(F.min("_st_sec").alias("_st_sec"))
        )
        resource_start = F.timestamp_micros(
            (F.col("_st_sec") * 1_000_000).cast("long")
        ).cast("timestamp_ntz")
        out = (
            # one row per resource key: scales with resource cardinality
            # (millions at fleet scale), so no forced broadcast — AQE
            # picks the strategy from the measured size
            a.join(starts, "_rk", "left")
            .withColumn(
                "start_ts",
                F.when(~F.col("_head") & ~first_seg, seg_ts - _ms()).otherwise(
                    resource_start
                ),
            )
            .drop("_st_sec")
        )
        # reset rows themselves re-anchor too (adjuster.go:93)
        out = out.withColumn(
            "start_ts",
            F.when(F.col("_head") & ~first_seg, F.col("ts") - _ms()).otherwise(
                F.col("start_ts")
            ),
        )

    out = out.drop("_head", "_ak", "_rk")
    return out.unionByName(passthrough, allowMissingColumns=False).select(df.columns)
