"""Tail-sampling processor analogue (batch policy vote per trace).

The reference buffers spans per trace until ``decision_wait`` elapses, then
runs every configured policy over the complete trace and combines the
decisions (processor/tailsamplingprocessor/processor.go:774-840 makeDecision).
In batch the whole trace is already in the table, so the wait machinery
disappears: ONE ``groupBy(trace_id)`` computes every per-trace feature any
policy needs, each policy becomes a column expression over those features,
and the precedence fold is a ``when`` chain — no second shuffle, no UDF
except the probabilistic policy's byte-sequential FNV-1a hash.

Decision semantics mirrored exactly:

* precedence ``Dropped > Sampled > NotSampled``
  (processor.go:821-838; the ``Invert*`` decisions are deprecated and no
  evaluator in this reference version emits them — internal/sampling/*.go).
* the *first* policy (config order) whose decision equals the final decision
  is recorded as the deciding policy (processor.go:805-808).
* ``and`` — all sub-policies Sampled → Sampled (internal/sampling/and.go:36-46).
* ``not`` — flips Sampled/NotSampled (internal/sampling/not.go:27-36).
* ``drop`` — all sub-policies Sampled → **Dropped** (internal/sampling/drop.go:35-46).
* leaf evaluators (internal/sampling/):
  - always_sample  → Sampled (always_sample.go)
  - latency        → running min(start)/max(end) scan per span; with only a
    lower threshold this is whole-trace duration ≥ threshold_ms; with an
    upper threshold the reference samples iff ANY ingestion-order prefix has
    lower < duration ≤ upper (latency.go:34-52 hasSpanWithCondition)
  - status_code    → any span status in set (status_code.go:41-49)
  - string_attribute / numeric_attribute / boolean_attribute → any span has
    the key and matches; ``invert_match`` samples iff NO span matches
    (string_tag_filter.go:79-121, numeric_tag_filter.go:33-80,
    boolean_tag_filter.go:27-63; empty-string values never match —
    string_tag_filter.go:62-66)
  - span_count     → min_spans ≤ count (≤ max_spans when max_spans > 0)
    (span_count_sampler.go:22-34)
  - probabilistic  → FNV-1a-64(salt ‖ trace-id bytes) ≤
    floor((2^64-1) · pct/100) (probabilistic.go:46-79; salt default
    "default-hash-seed")

rate_limiting / bytes_limiting (internal/sampling/rate_limiting.go:28-53,
bytes_limiting.go:26-60) are wall-clock token buckets in the reference; the
batch analogue replays the bucket over the trace *completion* timeline (the
moment ``decision_wait`` would have elapsed = the trace's max end timestamp)
— see ``token_bucket_admit``.  Composite rate allocation (composite.go:
86-136) replays its per-second sub-policy span budgets over the same
timeline — see ``composite_sample``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sparkotel.functions.exacthash import fnv1a_64

DEFAULT_HASH_SALT = "default-hash-seed"  # probabilistic.go:19-21

# Decision codes (pkg/samplingpolicy/samplingpolicy.go:24-52); only the three
# the modern evaluators emit.
NOT_SAMPLED = 0
SAMPLED = 1
DROPPED = 2


@dataclass(frozen=True)
class TailPolicy:
    """One entry of the processor's ordered ``policies`` list
    (config.go PolicyCfg)."""

    name: str
    type: str
    # latency
    threshold_ms: int = 0
    upper_threshold_ms: int = 0
    # status_code: ints (0 UNSET, 1 OK, 2 ERROR) — ptrace.StatusCode
    status_codes: Sequence[int] = ()
    # *_attribute: `key` is a column of the span DataFrame
    key: str = ""
    values: Sequence[str] = ()
    bool_value: bool = True
    min_value: int | None = None
    max_value: int | None = None
    invert_match: bool = False
    # span_count
    min_spans: int = 0
    max_spans: int = 0
    # probabilistic
    sampling_percentage: float = 0.0
    hash_salt: str = DEFAULT_HASH_SALT
    # and / not / drop wrappers
    sub: Sequence["TailPolicy"] = field(default_factory=tuple)


def probabilistic_threshold(percentage: float) -> int:
    """calculateThreshold(probabilistic.go:62-70): big-float
    floor((2^64-1) · ratio), exact in Python integers for binary-exact
    ratios (the only ones we configure)."""
    num, den = (percentage / 100.0).as_integer_ratio()
    return ((2**64 - 1) * num) // den


def fnv64_trace_sampled(salt: str, percentage: float):
    """Arrow-batched predicate: FNV-1a-64(salt ‖ unhex(trace_id)) ≤ threshold
    (probabilistic.go:46-59, 73-79). trace_id is a 32-char hex string (the
    pdata TraceID's canonical form)."""
    thr = probabilistic_threshold(percentage)
    salt_b = salt.encode()

    def _batch(s: pd.Series) -> pd.Series:
        return s.map(lambda t: fnv1a_64(salt_b + bytes.fromhex(t)) <= thr)

    return F.pandas_udf(_batch, "boolean")


# ---------------------------------------------------------------------------
# feature collection: walk the policy tree once, emit named agg expressions
# ---------------------------------------------------------------------------


def _leaf_feature(p: TailPolicy, status_col: str) -> tuple[str, Column] | None:
    """(feature_name, agg_expr) for the per-trace boolean/number this leaf
    needs, or None when the leaf reads a shared/global feature."""
    if p.type == "status_code":
        cond = F.col(status_col).isin(*[int(c) for c in p.status_codes])
        return f"_f_{p.name}", F.max(cond)
    if p.type == "string_attribute":
        vals = [v for v in p.values if v != ""]  # string_tag_filter.go:62-66
        cond = F.col(p.key).isNotNull() & (F.col(p.key) != "") & F.col(p.key).isin(vals)
        return f"_f_{p.name}", F.max(cond)
    if p.type == "numeric_attribute":
        lo = p.min_value if p.min_value is not None else -(2**63)
        hi = p.max_value if p.max_value is not None else 2**63 - 1
        cond = F.col(p.key).isNotNull() & F.col(p.key).between(F.lit(lo), F.lit(hi))
        return f"_f_{p.name}", F.max(cond)
    if p.type == "boolean_attribute":
        cond = F.col(p.key).isNotNull() & (F.col(p.key) == F.lit(p.bool_value))
        return f"_f_{p.name}", F.max(cond)
    if p.type == "latency" and p.upper_threshold_ms > 0:
        # prefix flag computed pre-agg (see tail_sample); aggregate is any()
        return f"_f_{p.name}", F.max(F.col(f"_pfx_{p.name}"))
    return None


def _walk(policies: Sequence[TailPolicy]):
    for p in policies:
        yield p
        yield from _walk(p.sub)


def _decision(p: TailPolicy, start_col: str) -> Column:
    """Per-trace Decision column (int code) for one policy, evaluated over
    the aggregated per-trace feature row."""
    if p.type == "always_sample":
        matched = F.lit(True)
    elif p.type == "latency":
        if p.upper_threshold_ms > 0:
            matched = F.coalesce(F.col(f"_f_{p.name}"), F.lit(False))
        else:
            matched = F.col("_trace_duration_ms") >= F.lit(float(p.threshold_ms))
    elif p.type == "span_count":
        c = F.col("_trace_span_count")
        matched = (
            c >= F.lit(p.min_spans)
            if p.max_spans == 0
            else (c >= F.lit(p.min_spans)) & (c <= F.lit(p.max_spans))
        )
    elif p.type == "probabilistic":
        matched = F.col(f"_f_{p.name}")
    elif p.type in ("string_attribute", "numeric_attribute", "boolean_attribute", "status_code"):
        matched = F.coalesce(F.col(f"_f_{p.name}"), F.lit(False))
        if getattr(p, "invert_match", False) and p.type != "status_code":
            matched = ~matched
    elif p.type == "and":
        # and.go:36-46 — all Sampled, any Dropped from a sub bubbles as
        # "not Sampled" (subs of and are leaves in the reference config)
        m = F.lit(True)
        for s in p.sub:
            m = m & (_decision(s, start_col) == SAMPLED)
        return F.when(m, SAMPLED).otherwise(NOT_SAMPLED)
    elif p.type == "not":
        d = _decision(p.sub[0], start_col)
        return F.when(d == SAMPLED, NOT_SAMPLED).when(d == NOT_SAMPLED, SAMPLED).otherwise(d)
    elif p.type == "drop":
        m = F.lit(True)
        for s in p.sub:
            m = m & (_decision(s, start_col) == SAMPLED)
        return F.when(m, DROPPED).otherwise(NOT_SAMPLED)
    else:
        raise ValueError(f"unknown tail-sampling policy type {p.type!r}")
    return F.when(matched, SAMPLED).otherwise(NOT_SAMPLED)


def _policy_decision_frame(
    spans: DataFrame,
    policies: Sequence[TailPolicy],
    trace_col: str,
    start_col: str,
    end_col: str,
    status_col: str,
    span_order_col: str,
) -> DataFrame:
    """Shared feature-aggregation + per-policy decision stage: one
    ``groupBy(trace_id)`` collecting every feature any policy needs, then
    each policy's Decision as a column ``_d_i``.  Used by ``tail_sample``
    (precedence fold) and ``composite_sample`` (rate-allocated replay)."""
    pre_cols: list[Column] = []
    aggs: dict[str, Column] = {
        "_trace_span_count": F.count(F.lit(1)),
        "_trace_min_start": F.min(start_col),
        "_trace_max_end": F.max(end_col),
    }
    needs_prob = []
    for p in _walk(policies):
        if p.type == "latency" and p.upper_threshold_ms > 0:
            # latency.go:34-52: running min(start)/max(end) in ingestion
            # order; sample iff any prefix has lower < dur ≤ upper. Our
            # ingestion order is (start, span_order_col).
            w = (
                Window.partitionBy(trace_col)
                .orderBy(start_col, span_order_col)
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            dur_ms = (
                F.unix_micros(F.max(end_col).over(w).cast("timestamp"))
                - F.unix_micros(F.min(start_col).over(w).cast("timestamp"))
            ) / 1000.0
            pre_cols.append(
                ((F.lit(float(p.threshold_ms)) < dur_ms) & (dur_ms <= F.lit(float(p.upper_threshold_ms))))
                .alias(f"_pfx_{p.name}")
            )
        elif p.type == "probabilistic":
            needs_prob.append(p)
        else:
            feat = _leaf_feature(p, status_col)
            if feat is not None:
                aggs[feat[0]] = feat[1]
    if pre_cols:
        spans = spans.select("*", *pre_cols)
        for p in _walk(policies):
            feat = _leaf_feature(p, status_col)
            if feat is not None and feat[0] not in aggs:
                aggs[feat[0]] = feat[1]

    per_trace = spans.groupBy(F.col(trace_col).alias("trace_id")).agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    per_trace = per_trace.withColumn(
        "_trace_duration_ms",
        (
            F.unix_micros(F.col("_trace_max_end").cast("timestamp"))
            - F.unix_micros(F.col("_trace_min_start").cast("timestamp"))
        )
        / 1000.0,
    )
    for p in needs_prob:
        per_trace = per_trace.withColumn(
            f"_f_{p.name}",
            fnv64_trace_sampled(p.hash_salt, p.sampling_percentage)(F.col("trace_id")),
        )

    dec_cols = [_decision(p, start_col).alias(f"_d_{i}") for i, p in enumerate(policies)]
    return per_trace.select("*", *dec_cols)


def tail_sample(
    spans: DataFrame,
    policies: Sequence[TailPolicy],
    trace_col: str = "trace_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    status_col: str = "status_code",
    span_order_col: str = "span_id",
) -> DataFrame:
    """Per-trace policy vote. Returns one row per trace:
    ``(trace_id, final_decision, policy, span_count, duration_ms)``.

    ONE shuffle (the groupBy); every policy is a column expression over the
    aggregated features, so adding policies adds zero exchanges. At 10^12
    spans the group key (trace_id) is high-cardinality and unskewed by
    construction — AQE handles residual imbalance.
    """
    per_trace = _policy_decision_frame(
        spans, policies, trace_col, start_col, end_col, status_col, span_order_col
    )

    # precedence fold (processor.go:821-838) + first-policy attribution
    # (processor.go:805-808)
    def first_name(code: int) -> Column:
        out = F.lit(None).cast("string")
        for i in reversed(range(len(policies))):
            out = F.when(F.col(f"_d_{i}") == code, F.lit(policies[i].name)).otherwise(out)
        return out

    any_dropped = F.lit(False)
    any_sampled = F.lit(False)
    for i in range(len(policies)):
        any_dropped = any_dropped | (F.col(f"_d_{i}") == DROPPED)
        any_sampled = any_sampled | (F.col(f"_d_{i}") == SAMPLED)

    final = (
        F.when(any_dropped, F.lit("dropped"))
        .when(any_sampled, F.lit("sampled"))
        .otherwise(F.lit("not_sampled"))
    )
    policy = (
        F.when(any_dropped, first_name(DROPPED))
        .when(any_sampled, first_name(SAMPLED))
        .otherwise(F.lit(None).cast("string"))
    )
    return per_trace.select(
        "trace_id",
        final.alias("final_decision"),
        policy.alias("policy"),
        F.col("_trace_span_count").alias("span_count"),
        F.round(F.col("_trace_duration_ms"), 6).alias("duration_ms"),
    )


def _bucket_fold(
    arrivals_us: Sequence[int],
    costs: Sequence[int],
    rate_num: int,
    rate_den: int,
    burst: int,
    tok: int | None = None,
    last: int | None = None,
) -> tuple[list[bool], int, int | None]:
    """Resumable form of the bucket fold: starts from carried state
    (``tok`` in the 1/(10^6·rate_den)-token unit domain, ``last`` in µs)
    and returns the decisions plus the state after the batch — the
    streaming arm persists that pair across micro-batches."""
    cap = burst * 1_000_000 * rate_den
    unit = 1_000_000 * rate_den
    if tok is None:
        tok = cap
    out: list[bool] = []
    for arr, n in zip(arrivals_us, costs):
        arr = int(arr)
        if last is not None:
            tok = min(cap, tok + (arr - last) * rate_num)
        last = arr
        cost = int(n) * unit
        if cost <= tok:
            tok -= cost
            out.append(True)
        else:
            out.append(False)
    return out, tok, last


def bucket_replay(
    arrivals_us: Sequence[int],
    costs: Sequence[int],
    rate_num: int,
    rate_den: int,
    burst: int,
) -> list[bool]:
    """The pure integer bucket fold behind ``token_bucket_admit``, module
    level so its x/time/rate equivalence is property-testable without a
    Spark session.  ``arrivals_us`` must be non-decreasing (the caller
    sorts).  Unit domain: 1/(10^6·rate_den) token — see
    ``token_bucket_admit`` for the exactness argument."""
    return _bucket_fold(arrivals_us, costs, rate_num, rate_den, burst)[0]


def token_bucket_admit(
    per_trace: DataFrame,
    rate_num: int,
    rate_den: int,
    burst: int,
    n_col: str = "n",
    arrival_col: str = "arrival_us",
    key_col: str = "limiter_key",
    trace_col: str = "trace_id",
) -> DataFrame:
    """Batch replay of the reference's ``golang.org/x/time/rate`` token
    bucket (tailsamplingprocessor/internal/sampling/rate_limiting.go:28-53,
    bytes_limiting.go:26-60): traces are admitted in completion order while
    the bucket holds ≥ n tokens; tokens refill continuously at
    ``rate_num/rate_den`` tokens per second up to ``burst``.

    Exactness: the Go limiter carries float64 token counts; we define the
    batch semantics in *integer* arithmetic instead so Spark and any SQL
    oracle agree bit-for-bit.  The internal unit is ``1/(10^6·rate_den)``
    token: with arrivals in integer microseconds the refill is
    ``dt_us · rate_num`` units exactly, capacity is
    ``burst · 10^6 · rate_den``, and a trace costs ``n · 10^6 · rate_den``.
    x/time/rate behaviours preserved: the bucket starts full (a zero-value
    limiter's first advance clamps to burst), a denied request consumes
    nothing (reserveN only commits state when ok), and ``n > burst`` can
    never be admitted (cost > capacity ≥ tokens).  Persisting the refill on
    deny is equivalent to the reference's restore-on-fail because
    ``min(cap, t + d1·r)`` then ``+ d2·r`` folds to ``min(cap, t +
    (d1+d2)·r)`` — refill is monotone and commutes across the clamp.

    One shuffle (groupBy ``key_col``); each group replays sequentially in a
    single Arrow batch, mirroring one collector instance's limiter.  At
    fleet scale the key IS the collector-instance identity (shard/route), so
    parallelism = number of limiters, exactly like the reference deployment.

    Returns ``(key_col, trace_col, arrival_col, n_col, final_decision)``
    with the reference decision names Sampled/NotSampled lowercased.
    """
    if rate_num <= 0 or rate_den <= 0 or burst <= 0:
        raise ValueError("rate_num, rate_den and burst must be positive")

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        # a trace with NULL arrival (every span missing end_ts) has no
        # position in the completion-order replay — the reference
        # limiter is only ever asked about completed traces — so it is
        # denied without touching the bucket instead of crashing the
        # batch on int(NaN); same for a NULL cost (nothing to charge)
        ok = pdf[arrival_col].notna() & pdf[n_col].notna()
        live = pdf[ok].sort_values(
            [arrival_col, trace_col], kind="mergesort"
        ).reset_index(drop=True)
        out = bucket_replay(
            live[arrival_col].tolist(), live[n_col].tolist(), rate_num, rate_den, burst
        )
        live = live[[key_col, trace_col, arrival_col, n_col]].assign(
            final_decision=["sampled" if a else "not_sampled" for a in out]
        )
        dead = pdf[~ok][[key_col, trace_col, arrival_col, n_col]].assign(
            final_decision="not_sampled"
        )
        return pd.concat([live, dead], ignore_index=True) if len(dead) else live

    schema = (
        f"{key_col} string, {trace_col} string, {arrival_col} long, "
        f"{n_col} long, final_decision string"
    )
    return (
        # the output schema declares string key/trace and long
        # arrival/cost — cast here so an int shard key or a decimal
        # count from a caller doesn't fail the Arrow conversion
        per_trace.select(
            F.col(key_col).cast("string").alias(key_col),
            F.col(trace_col).cast("string").alias(trace_col),
            F.col(arrival_col).cast("long").alias(arrival_col),
            F.col(n_col).cast("long").alias(n_col),
        )
        .groupBy(key_col)
        .applyInPandas(replay, schema)
    )


def rate_limiting_decisions(
    spans: DataFrame,
    rate_num: int,
    rate_den: int,
    burst: int,
    key: Column,
    trace_col: str = "trace_id",
    end_col: str = "end_ts",
) -> DataFrame:
    """rate_limiting policy (rate_limiting.go:44-53): n = the trace's span
    count, arrival = trace completion time.  ``NewRateLimiting`` defaults
    burst to 2× spans-per-second (rate_limiting.go:29-31); pass it
    explicitly for the WithBurstCapacity form."""
    per_trace = spans.groupBy(
        key.alias("limiter_key"), F.col(trace_col).alias("trace_id")
    ).agg(
        F.unix_micros(F.max(end_col).cast("timestamp")).alias("arrival_us"),
        F.count(F.lit(1)).alias("n"),
    )
    return token_bucket_admit(per_trace, rate_num, rate_den, burst)


def bytes_limiting_decisions(
    trace_sizes: DataFrame,
    rate_num: int,
    rate_den: int,
    burst: int,
) -> DataFrame:
    """bytes_limiting policy (bytes_limiting.go:45-60): n = the trace's
    proto-marshaled size (``otlpproto.trace_proto_sizes``, the
    ptrace.ProtoMarshaler.TracesSize analogue at bytes_limiting.go:66-73).
    ``trace_sizes`` must carry (limiter_key, trace_id, arrival_us, n)."""
    return token_bucket_admit(trace_sizes, rate_num, rate_den, burst)


def composite_sample(
    spans: DataFrame,
    subs: Sequence[tuple[TailPolicy, int]],
    max_total_sps: int,
    key: Column,
    clock_us: int = 1_000_000,
    trace_col: str = "trace_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    status_col: str = "status_code",
    span_order_col: str = "span_id",
) -> DataFrame:
    """Composite rate-allocation policy (internal/sampling/composite.go:
    86-136): sub-policies are tried in order; the FIRST whose own decision
    is Sampled decides — the trace is admitted iff that sub's
    sampled-span counter for the current clock second stays within both
    its ``allocatedSPS`` and ``maxTotalSPS`` (composite.go:113-132, the
    max-total check is against the sub's counter, mirrored as-is), the
    counter is charged only on admit (composite.go:127-131 note), and all
    counters reset when the second rolls over (composite.go:93-101).

    The reference clock is pluggable (``TimeProvider``, time_provider.go:
    10-12; its own tests inject a fake) — ``clock_us`` is that hook: the
    batch second is ``arrival_us DIV clock_us`` over the trace-completion
    timeline, so a fixture can use coarser ticks exactly like
    composite_test.go's FakeTimeProvider.

    Same execution shape as ``token_bucket_admit``: the decision stage is
    ``_policy_decision_frame``'s single groupBy, the replay is one
    shuffle on ``key`` (the collector-instance identity) with a
    sequential Arrow-batch fold per limiter.  Returns ``(limiter_key,
    trace_id, arrival_us, n_spans, final_decision, policy)`` where
    ``policy`` is the deciding sub's name on admit (the
    ``tailsampling.composite_policy`` attribute, composite.go:120-123).
    """
    policies = [p for p, _ in subs]
    alloc = [int(a) for _, a in subs]
    names = [p.name for p in policies]
    k = len(policies)
    per = _policy_decision_frame(
        spans, policies, trace_col, start_col, end_col, status_col, span_order_col
    )
    per = per.select(
        key.cast("string").alias("limiter_key"),
        "trace_id",
        F.unix_micros(F.col("_trace_max_end").cast("timestamp")).alias("arrival_us"),
        F.col("_trace_span_count").alias("n_spans"),
        *[(F.col(f"_d_{i}") == SAMPLED).alias(f"_m_{i}") for i in range(k)],
    ).withColumn("_sec", F.expr(f"arrival_us DIV {clock_us}"))

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL arrival (no completed span) → no position on the
        # completion timeline: deny without charging any counter (NaN
        # ticks would otherwise reset the budget on every dirty row)
        dead = pdf[pdf["arrival_us"].isna()]
        pdf = pdf[pdf["arrival_us"].notna()]
        pdf = pdf.sort_values(["arrival_us", "trace_id"], kind="mergesort").reset_index(
            drop=True
        )
        secs = pdf["_sec"].tolist()
        ns = pdf["n_spans"].tolist()
        ms = [pdf[f"_m_{i}"].tolist() for i in range(k)]
        counters = [0] * k
        cur: int | None = None
        decs: list[str] = []
        pols: list[str | None] = []
        for j in range(len(pdf)):
            if cur is None or secs[j] != cur:
                cur = secs[j]
                counters = [0] * k
            dec, pol = "not_sampled", None
            for i in range(k):
                if ms[i][j]:
                    cand = counters[i] + int(ns[j])
                    if cand <= alloc[i] and cand <= max_total_sps:
                        counters[i] = cand
                        dec, pol = "sampled", names[i]
                    break  # first Sampled sub decides either way
            decs.append(dec)
            pols.append(pol)
        out = pdf[["limiter_key", "trace_id", "arrival_us", "n_spans"]].assign(
            final_decision=decs, policy=pols
        )
        if len(dead):
            out = pd.concat(
                [
                    out,
                    dead[["limiter_key", "trace_id", "arrival_us", "n_spans"]].assign(
                        final_decision="not_sampled", policy=None
                    ),
                ],
                ignore_index=True,
            )
        return out

    schema = (
        "limiter_key string, trace_id string, arrival_us long, "
        "n_spans long, final_decision string, policy string"
    )
    return per.groupBy("limiter_key").applyInPandas(replay, schema)


def sampled_spans(
    spans: DataFrame, decisions: DataFrame, trace_col: str = "trace_id"
) -> DataFrame:
    """Release phase: forward only spans of sampled traces
    (processor.go releaseSampledTrace). Semi-join on the trace key — both
    sides already partition on trace_id, so AQE plans a single co-located
    exchange pair."""
    keep = decisions.filter(F.col("final_decision") == "sampled").select(
        F.col("trace_id").alias(trace_col)
    )
    return spans.join(keep, on=trace_col, how="left_semi")
