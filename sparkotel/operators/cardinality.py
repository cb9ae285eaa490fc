"""Cardinality guardian: neutralize metric-label cardinality explosions
(processor/cardinalityguardianprocessor/).

Detection (processor.go:755-815, dual-epoch trackers): per
(metric, attribute key) the processor tracks distinct attribute VALUES
per epoch; an attribute whose per-epoch growth
``distinct(epoch) − distinct(epoch−1)`` exceeds the limit (global
``max_cardinality_delta_per_epoch`` or a per-metric override) is an
offender.  The reference estimates the counts with dual-epoch HLL++
sketches (±1-2%) and flags points from the moment the running estimate
crosses the threshold mid-epoch; the batch engine computes EXACT
per-epoch counts (``count(distinct)`` is one pass here) and applies the
epoch's final verdict to the whole epoch — deterministic and
replayable, with ``approx=True`` switching to ``approx_count_distinct``
(HyperLogLog++, the same sketch family) when the exact expand is too
expensive at extreme key counts.

Enforcement (processor.go:408-509, reaggregation.go):

- ``tag_only`` — keep everything, add ``otel.metric.overflow: true``
  on points carrying an offending attribute.
- ``overflow_attribute`` — replace the offending value with the
  ``otel.cardinality_overflow`` sentinel, then spatially reaggregate.
- ``strip_and_reaggregate`` — remove the offending attribute, then
  spatially reaggregate.

Reaggregation merges points that now share an attribute identity:
delta sums add values with timestamps spanning the union, gauges keep
the latest value; cumulative sums (and the histogram frames) fall back
to tag_only per the reference's support table.  ``never_drop_labels``
are exempt from all enforcement.

Spark shape: detection = one explode + one distinct-aggregate on
(metric, key, epoch) — the offender table is tiny (metrics × keys ×
epochs) and broadcasts back onto the points; reaggregation is one hash
aggregate.  Nothing is stateful across the batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OVERFLOW_TAG = "otel.metric.overflow"
OVERFLOW_SENTINEL = "otel.cardinality_overflow"

_MODES = ("tag_only", "overflow_attribute", "strip_and_reaggregate")

_HEADER = [
    "metric_name",
    "unit",
    "metric_type",
    "aggregation_temporality",
    "is_monotonic",
    "scope_name",
]


def _offenders(
    df: DataFrame,
    max_delta: int,
    epoch_seconds: int,
    never_drop: tuple,
    metric_overrides: dict | None,
    approx: bool,
) -> DataFrame:
    epoch = F.floor(F.unix_timestamp(F.col("ts")) / F.lit(epoch_seconds))
    ex = (
        df.select(
            "metric_name",
            epoch.alias("_epoch"),
            F.explode(F.map_entries("attributes")).alias("_e"),
        )
        .select(
            "metric_name",
            "_epoch",
            F.col("_e.key").alias("attr_key"),
            F.col("_e.value").alias("attr_value"),
        )
        .where(~F.col("attr_key").isin(*never_drop) if never_drop else F.lit(True))
    )
    counter = (
        F.approx_count_distinct("attr_value")
        if approx
        else F.count_distinct("attr_value")
    )
    counts = ex.groupBy("metric_name", "attr_key", "_epoch").agg(
        counter.alias("_cnt")
    )
    prev = counts.select(
        "metric_name",
        "attr_key",
        (F.col("_epoch") + 1).alias("_epoch"),
        F.col("_cnt").alias("_prev_cnt"),
    )
    limit = F.lit(int(max_delta))
    for name, v in (metric_overrides or {}).items():
        limit = F.when(F.col("metric_name") == name, F.lit(int(v))).otherwise(limit)
    return (
        counts.join(prev, ["metric_name", "attr_key", "_epoch"], "left")
        .withColumn("_delta", F.col("_cnt") - F.coalesce("_prev_cnt", F.lit(0)))
        .where(F.col("_delta") > limit)
        .select("metric_name", "attr_key", "_epoch", F.lit(True).alias("_offending"))
    )


def cardinality_guardian(
    df: DataFrame,
    max_cardinality_delta_per_epoch: int = 100,
    epoch_seconds: int = 300,
    enforcement_mode: str = "tag_only",
    never_drop_labels: tuple = (),
    metric_overrides: dict | None = None,
    approx: bool = False,
) -> DataFrame:
    """Apply the guardian to the number-point frame.  Histogram /
    summary frames take the tag_only path by the reference's own
    support table, so running this function on them with
    ``enforcement_mode="tag_only"`` is the complete behavior."""
    if enforcement_mode not in _MODES:
        raise ValueError(
            f"unknown enforcement mode {enforcement_mode!r}, expected one of {_MODES}"
        )
    nd = tuple(never_drop_labels)
    off = _offenders(
        df, max_cardinality_delta_per_epoch, epoch_seconds, nd,
        metric_overrides, approx,
    )
    # per (metric, epoch): the set of offending attribute keys — rare by
    # design (offenders exist only where cardinality exploded), but the
    # frame scales with #metrics × #epochs in the worst case, so the
    # join-back is left unhinted: AQE broadcasts it when it is genuinely
    # small and falls back to a shuffle join when a pathological window
    # makes it corpus-sized (same hazard class as the decontaminate
    # hits-frame fix).
    off_sets = off.groupBy("metric_name", "_epoch").agg(
        F.collect_set("attr_key").alias("_off_keys")
    )
    epoch = F.floor(F.unix_timestamp(F.col("ts")) / F.lit(epoch_seconds))
    pts = df.withColumn("_epoch", epoch).join(
        off_sets, ["metric_name", "_epoch"], "left"
    )

    hit_keys = F.filter(
        F.coalesce(F.col("_off_keys"), F.array().cast("array<string>")),
        lambda k: F.map_contains_key("attributes", k),
    )
    has_hit = F.size(hit_keys) > 0

    def tagged(attrs: Column) -> Column:
        return F.when(
            has_hit,
            F.map_concat(
                F.map_filter(attrs, lambda k, _: k != OVERFLOW_TAG),
                F.map_from_arrays(
                    F.array(F.lit(OVERFLOW_TAG)), F.array(F.lit("true"))
                ),
            ),
        ).otherwise(attrs)

    if enforcement_mode == "tag_only":
        out = pts.withColumn("attributes", tagged(F.col("attributes")))
        return out.drop("_epoch", "_off_keys").select(df.columns)

    # reaggregation modes: delta sums and gauges reaggregate; cumulative
    # sums fall back to tag_only (processor.go:332-341)
    reagg_ok = (F.col("metric_type") == "gauge") | (
        (F.col("metric_type") == "sum") & (F.col("aggregation_temporality") == 1)
    )
    if enforcement_mode == "strip_and_reaggregate":
        mutated = F.map_filter(
            "attributes", lambda k, _: ~F.array_contains(hit_keys, k)
        )
    else:  # overflow_attribute
        mutated = F.map_from_entries(
            F.transform(
                F.map_entries("attributes"),
                lambda e: F.struct(
                    e.getField("key").alias("key"),
                    F.when(
                        F.array_contains(hit_keys, e.getField("key")),
                        F.lit(OVERFLOW_SENTINEL),
                    )
                    .otherwise(e.getField("value"))
                    .alias("value"),
                ),
            )
        )
    pts = pts.withColumn(
        "attributes",
        F.when(~reagg_ok, tagged(F.col("attributes")))
        .when(has_hit, mutated)
        .otherwise(F.col("attributes")),
    )

    # spatial reaggregation (reaggregation.go:24-130): merge points that
    # now share (metric header, attribute identity, resource identity)
    def canon(col: str) -> Column:
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(col),
                    lambda e: F.concat_ws(
                        "\x01", e.getField("key"), e.getField("value")
                    ),
                )
            ),
            "\x02",
        )

    merge = pts.where(reagg_ok)
    passthrough = pts.where(~reagg_ok)
    merged = (
        merge.groupBy(
            *_HEADER, canon("attributes").alias("_ak"), canon("resource").alias("_rk")
        )
        .agg(
            # gauge: last-value-wins by timestamp; delta sum: values add,
            # timestamps span the union
            F.max_by("value", "ts").alias("_last_value"),
            F.sum("value").alias("_sum_value"),
            F.max_by("start_ts", "ts").alias("_last_start"),
            F.min("start_ts").alias("_min_start"),
            F.max("ts").alias("ts"),
            F.first("attributes").alias("attributes"),
            F.first("resource").alias("resource"),
        )
        .withColumn(
            "value",
            F.when(F.col("metric_type") == "gauge", F.col("_last_value")).otherwise(
                F.col("_sum_value")
            ),
        )
        .withColumn(
            # gauge keeps the winning (latest) point's start; delta sums
            # span the union (reaggregation.go:79-110)
            "start_ts",
            F.when(F.col("metric_type") == "gauge", F.col("_last_start")).otherwise(
                F.col("_min_start")
            ),
        )
        .drop("_last_value", "_sum_value", "_last_start", "_min_start", "_ak", "_rk")
    )
    return merged.select(df.columns).unionByName(
        passthrough.drop("_epoch", "_off_keys").select(df.columns)
    )
