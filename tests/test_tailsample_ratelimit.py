"""rate_limiting / bytes_limiting token-bucket semantics vs the reference
(processor/tailsamplingprocessor/internal/sampling/rate_limiting.go:28-53,
bytes_limiting.go:26-73, both built on golang.org/x/time/rate.Limiter)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from sparkotel.operators.tailsample import (
    rate_limiting_decisions,
    token_bucket_admit,
)
from sparkotel.otlpproto import trace_proto_sizes

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _per_trace(spark, rows):
    """rows: (key, trace_id, arrival_us, n)"""
    return spark.createDataFrame(
        rows, "limiter_key string, trace_id string, arrival_us long, n long"
    )


def _decisions(df):
    return {r["trace_id"]: r["final_decision"] for r in df.collect()}


def x_time_rate_reference(events, rate_num, rate_den, burst):
    """Independent restore-on-fail fold, shaped exactly like
    x/time/rate.Limiter.AllowN (reserveN commits last/tokens only when
    ok) — in exact Fraction arithmetic.  token_bucket_admit persists the
    refill on deny instead; this reference proves the two are
    observationally identical."""
    from fractions import Fraction

    rate = Fraction(rate_num, rate_den)
    tokens = Fraction(burst)
    last = None
    out = []
    for arr_us, n in events:
        advanced = (
            min(Fraction(burst), tokens + Fraction(arr_us - last, 10**6) * rate)
            if last is not None
            else Fraction(burst)
        )
        if n <= advanced:
            tokens = advanced - n
            last = arr_us
            out.append(True)
        else:
            out.append(False)  # state untouched (reserveN !ok path)
    return out


def test_bucket_starts_full_and_denies_without_consuming(spark):
    # burst 4, rate 1/s.  t=0: n=4 drains the full bucket.  t=1s: n=2 >
    # 1 refilled token → denied, and the denial must NOT consume the
    # token: t=2s has 2 tokens and n=2 passes.
    rows = [
        ("k", "t1", 0, 4),
        ("k", "t2", 1_000_000, 2),
        ("k", "t3", 2_000_000, 2),
    ]
    out = _decisions(token_bucket_admit(_per_trace(spark, rows), 1, 1, 4))
    assert out == {"t1": "sampled", "t2": "not_sampled", "t3": "sampled"}


def test_n_above_burst_never_admitted_even_after_long_idle(spark):
    # rate_limiting.go:33-36 — a trace whose span count exceeds the
    # burst capacity can never pass, regardless of elapsed time.
    rows = [("k", "t1", 0, 1), ("k", "t2", 3_600_000_000, 9)]
    out = _decisions(token_bucket_admit(_per_trace(spark, rows), 1000, 1, 8))
    assert out == {"t1": "sampled", "t2": "not_sampled"}


def test_refill_clamps_at_burst(spark):
    # After a huge gap the bucket holds exactly burst, not gap·rate:
    # n=5 > burst=4 at t=100s is denied, then two n=2 drain what must be
    # exactly 4 tokens — the second leaves 0, so a third n=1 at the same
    # instant is denied.
    rows = [
        ("k", "a", 0, 4),
        ("k", "b", 100_000_000, 5),
        ("k", "c", 100_000_001, 2),
        ("k", "d", 100_000_002, 2),
        ("k", "e", 100_000_003, 1),
    ]
    out = _decisions(token_bucket_admit(_per_trace(spark, rows), 1, 1, 4))
    assert out == {
        "a": "sampled",
        "b": "not_sampled",
        "c": "sampled",
        "d": "sampled",
        "e": "not_sampled",
    }


def test_keys_are_independent_limiters(spark):
    rows = [("k1", "a", 0, 4), ("k2", "b", 0, 4), ("k1", "c", 1, 1)]
    out = _decisions(token_bucket_admit(_per_trace(spark, rows), 1, 1, 4))
    assert out == {"a": "sampled", "b": "sampled", "c": "not_sampled"}


def test_fractional_rate_is_exact(spark):
    # rate 1/3 token/s, burst 1: refill after 2.999999s is 2999999/3e6
    # < 1 token → denied; at exactly 3s it is 1 token → admitted.  Float
    # arithmetic at these magnitudes could tip either way; the integer
    # unit domain (1/(10^6·den) token) cannot.
    rows = [
        ("k", "a", 0, 1),
        ("k", "b", 2_999_999, 1),
        ("k", "c", 5_999_999, 1),  # 5999999/3e6 < 2 but ≥ 1 → admitted
        ("k", "d", 5_999_999, 1),  # same instant, bucket just drained
    ]
    out = _decisions(token_bucket_admit(_per_trace(spark, rows), 1, 3, 1))
    assert out == {
        "a": "sampled",
        "b": "not_sampled",
        "c": "sampled",
        "d": "not_sampled",
    }


def test_matches_x_time_rate_restore_on_fail_reference(spark):
    # Adversarial sequence: alternating over/under-burst costs, repeated
    # same-timestamp arrivals, gaps straddling exact refill boundaries.
    events = [
        (0, 3),
        (500_000, 1),
        (500_000, 1),
        (1_000_000, 4),
        (4_500_000, 4),
        (4_500_001, 1),
        (7_000_000, 2),
        (7_000_000, 5),
        (30_000_000, 4),
        (30_000_001, 1),
    ]
    expect = x_time_rate_reference(events, 1, 2, 4)
    rows = [("k", f"t{i:02d}", a, n) for i, (a, n) in enumerate(events)]
    out = _decisions(token_bucket_admit(_per_trace(spark, rows), 1, 2, 4))
    assert [out[f"t{i:02d}"] == "sampled" for i in range(len(events))] == expect


def test_rate_limiting_decisions_counts_spans(spark):
    # Two traces completing 1s apart: 3 spans then 2 spans, rate 1/s,
    # burst 3 — the second trace finds only 1 refilled token.
    spans = spark.createDataFrame(
        [
            ("tA", i, T0 + timedelta(milliseconds=i), T0 + timedelta(seconds=1))
            for i in range(3)
        ]
        + [
            ("tB", i, T0 + timedelta(milliseconds=i), T0 + timedelta(seconds=2))
            for i in range(2)
        ],
        "trace_id string, span_id long, start_ts timestamp, end_ts timestamp",
    )
    out = _decisions(rate_limiting_decisions(spans, 1, 1, 3, key=F.lit("k")))
    assert out == {"tA": "sampled", "tB": "not_sampled"}


def test_trace_proto_sizes_equals_real_marshal_length(spark):
    # bytes_limiting.go:66-73 sizes via ProtoMarshaler.TracesSize; our
    # per-trace size must equal the actual marshaled TracesData length
    # produced by the same encoders (to_otlp_traces_proto restricted to
    # one trace = one resource identity here).
    from sparkotel.otlpproto import to_otlp_traces_proto

    def frame(trace_id, names_codes):
        return spark.createDataFrame(
            [
                (
                    trace_id,
                    f"{i + 1:016x}",
                    "",
                    "",
                    name,
                    2,
                    T0 + timedelta(seconds=i),
                    T0 + timedelta(seconds=i, milliseconds=5),
                    {"service.name": "svc", "host": trace_id},
                    {"k": str(i)} if i % 2 else {},
                    "app" if i % 3 else "db",
                    "boom" if code == 2 else "",
                    code,
                )
                for i, (name, code) in enumerate(names_codes)
            ],
            "trace_id string, span_id string, trace_state string, "
            "parent_span_id string, name string, kind int, "
            "start_ts timestamp, end_ts timestamp, "
            "resource map<string,string>, attributes map<string,string>, "
            "scope_name string, status_message string, status_code int",
        )

    df = frame("a" * 32, [("signup", 0), ("purchase", 1), ("error", 2)])
    [(tid, size)] = [
        (r["trace_id"], r["proto_bytes"]) for r in trace_proto_sizes(df).collect()
    ]
    [msg] = [r["msg"] for r in to_otlp_traces_proto(df).collect()]
    assert tid == "a" * 32 and size == len(msg) and size > 0


# --- composite rate allocation (internal/sampling/composite.go:86-136) ----


def _composite(spark, rows, subs, max_total, clock_us=1_000_000):
    """rows: (trace_id, arrival_offset_us, n_spans, status_code)"""
    from sparkotel.operators.tailsample import TailPolicy, composite_sample

    base = int(T0.timestamp()) * 1_000_000
    spans = spark.createDataFrame(
        [
            (tid, i, T0, datetime.fromtimestamp((base + off) / 1e6), code)
            for (tid, off, n, code) in rows
            for i in range(n)
        ],
        "trace_id string, span_id long, start_ts timestamp, "
        "end_ts timestamp, status_code int",
    )
    policies = [
        (TailPolicy("errors", "status_code", status_codes=(2,)), subs[0]),
        (TailPolicy("always", "always_sample"), subs[1]),
    ]
    out = composite_sample(
        spans, policies, max_total, key=F.lit("k"), clock_us=clock_us
    )
    return {r["trace_id"]: (r["final_decision"], r["policy"]) for r in out.collect()}


def test_composite_first_matching_sub_decides_even_when_over_budget(spark):
    # t1 (error, 3 spans) fills the errors budget; t2 (error, 2 spans)
    # exceeds it → NotSampled, and composite.go:113-132 returns without
    # trying later subs — the always sub may NOT catch it.
    out = _composite(
        spark,
        [("t1", 0, 3, 2), ("t2", 1, 2, 2), ("t3", 2, 2, 0)],
        subs=(3, 8),
        max_total=10,
    )
    assert out == {
        "t1": ("sampled", "errors"),
        "t2": ("not_sampled", None),
        "t3": ("sampled", "always"),
    }


def test_composite_denied_trace_does_not_charge_counter(spark):
    # t2's denial must leave the errors counter at 2 so the smaller t3
    # still fits (composite.go:127-131).
    out = _composite(
        spark,
        [("t1", 0, 2, 2), ("t2", 1, 3, 2), ("t3", 2, 2, 2)],
        subs=(4, 8),
        max_total=10,
    )
    assert out == {
        "t1": ("sampled", "errors"),
        "t2": ("not_sampled", None),
        "t3": ("sampled", "errors"),
    }


def test_composite_counters_reset_each_clock_second(spark):
    # Same shape as the over-budget test but t2 arrives in the next
    # second: counters reset (composite.go:93-101) and it passes.
    out = _composite(
        spark,
        [("t1", 0, 3, 2), ("t2", 1_000_001, 3, 2)],
        subs=(3, 8),
        max_total=10,
    )
    assert out == {"t1": ("sampled", "errors"), "t2": ("sampled", "errors")}


def test_composite_max_total_binds_below_sub_allocation(spark):
    # always-sub allocation 8 but max_total 4: a 5-span trace is denied
    # even though 5 ≤ 8 (composite.go:117 checks both bounds).
    out = _composite(spark, [("t1", 0, 5, 0)], subs=(3, 8), max_total=4)
    assert out == {"t1": ("not_sampled", None)}


def test_composite_coarse_clock_provider(spark):
    # clock_us is the TimeProvider hook: with 10-second ticks, arrivals
    # 5s apart share a window (second denial) and 15s apart do not.
    rows = [("t1", 0, 3, 2), ("t2", 5_000_000, 3, 2), ("t3", 15_000_000, 3, 2)]
    out = _composite(spark, rows, subs=(3, 8), max_total=10, clock_us=10_000_000)
    assert out == {
        "t1": ("sampled", "errors"),
        "t2": ("not_sampled", None),
        "t3": ("sampled", "errors"),
    }


# --- property: integer fold ≡ x/time/rate restore-on-fail (exact) -----------


def test_bucket_replay_property_vs_fraction_reference():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparkotel.operators.tailsample import bucket_replay

    @settings(max_examples=300, deadline=None)
    @given(
        gaps=st.lists(st.integers(min_value=0, max_value=5_000_000), min_size=1, max_size=40),
        costs_seed=st.data(),
        rate_num=st.integers(min_value=1, max_value=1000),
        rate_den=st.integers(min_value=1, max_value=10_000),
        burst=st.integers(min_value=1, max_value=50),
    )
    def check(gaps, costs_seed, rate_num, rate_den, burst):
        arrivals, t = [], 0
        for g in gaps:
            t += g
            arrivals.append(t)
        costs = costs_seed.draw(
            st.lists(
                st.integers(min_value=0, max_value=burst + 5),
                min_size=len(gaps),
                max_size=len(gaps),
            )
        )
        events = list(zip(arrivals, costs))
        assert bucket_replay(arrivals, costs, rate_num, rate_den, burst) == [
            bool(b) for b in x_time_rate_reference(events, rate_num, rate_den, burst)
        ]

    check()


def test_bytes_oracle_size_formula_property():
    """The tailsample_bytes_limit oracle derives proto sizes from a
    closed-form wire model (span = 50+len(name), +4 when status≠0,
    wrapped per varint-length arithmetic).  Property-check the formula
    against the REAL encoder over randomized fixture-shaped traces —
    far broader coverage than the registry's fixed table."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from sparkotel.otlpproto import _encode_traces_group

    NAMES = ["click", "view", "purchase", "error", "signup", "x" * 40]

    def formula(spans):
        inn = 7 + sum(
            52 + len(name) + (0 if code == 0 else 4) for name, code in spans
        )
        def vlen(x):
            # full 5-step varint ladder, matching the oracle SQL — a
            # ~37k-span trace pushes inn past 2^21 into 4-byte territory
            if x < 128:
                return 1
            if x < 16384:
                return 2
            if x < 2097152:
                return 3
            return 4 if x < 268435456 else 5
        rs = 26 + vlen(inn) + inn
        return 1 + vlen(rs) + rs

    @settings(max_examples=200, deadline=None)
    @given(
        spans=st.lists(
            st.tuples(st.sampled_from(NAMES), st.integers(0, 2)), min_size=1, max_size=300
        )
    )
    def check(spans):
        pdf = pd.DataFrame(
            {
                "trace_id": "ab" * 16,
                "span_id": [f"{i + 1:016x}" for i in range(len(spans))],
                "trace_state": "",
                "parent_span_id": "",
                "name": [n for n, _ in spans],
                "kind": 2,
                "start_ts": pd.Timestamp("2024-01-01"),
                "end_ts": pd.Timestamp("2024-01-01 00:00:01"),
                "_res": [[("service.name", "svc")]] * len(spans),
                "_attrs": [[]] * len(spans),
                "scope_name": "app",
                "status_message": "",
                "status_code": [c for _, c in spans],
            }
        )
        assert len(_encode_traces_group(pdf)) == formula(spans)

    check()

    # deterministic big-trace case beyond hypothesis's 300-span reach:
    # 22000 × (52+40+4) B spans push inn past 2^21, so the inner message
    # length needs a 4-byte varint — the arm the randomized cases never
    # hit (and the arm the oracle SQL mirrors)
    big = [("x" * 40, 1)] * 22000
    pdf = pd.DataFrame(
        {
            "trace_id": "ab" * 16,
            "span_id": [f"{i + 1:016x}" for i in range(len(big))],
            "trace_state": "",
            "parent_span_id": "",
            "name": [n for n, _ in big],
            "kind": 2,
            "start_ts": pd.Timestamp("2024-01-01"),
            "end_ts": pd.Timestamp("2024-01-01 00:00:01"),
            "_res": [[("service.name", "svc")]] * len(big),
            "_attrs": [[]] * len(big),
            "scope_name": "app",
            "status_message": "",
            "status_code": [c for _, c in big],
        }
    )
    assert 7 + sum(52 + 40 + 4 for _ in big) >= 2_097_152  # 4-byte arm reached
    assert len(_encode_traces_group(pdf)) == formula(big)


# --- dirty-data robustness: NULL arrival / NULL cost -------------------------


def test_null_arrival_denied_without_touching_bucket(spark):
    """A trace with no completion time (every span missing end_ts
    upstream) has no position in the completion-order replay — the
    reference limiter is only ever asked about completed traces.  It
    must be denied WITHOUT charging the bucket (live traces decide
    exactly as if the dirty row were absent), not crash the Arrow batch
    on int(NaN)."""
    rows = [
        ("k", "t-null", None, 1),
        ("k", "a", 0, 4),  # drains the full burst-4 bucket
        ("k", "b", 1_000_000, 1),  # 1 token refilled after 1 s → admitted
        ("k", "t-nullcost", 2_000_000, None),  # nothing chargeable → denied
    ]
    d = _decisions(token_bucket_admit(_per_trace(spark, rows), 1, 1, 4))
    assert d == {
        "t-null": "not_sampled",
        "a": "sampled",
        "b": "sampled",
        "t-nullcost": "not_sampled",
    }


def test_rate_limiting_null_end_ts_trace_is_denied(spark):
    spans = spark.createDataFrame(
        [("t1", T0), ("t1", T0 + timedelta(seconds=1)), ("tx", None)],
        "trace_id string, end_ts timestamp",
    )
    out = _decisions(rate_limiting_decisions(spans, 1, 1, 4, key=F.lit("k")))
    assert out == {"t1": "sampled", "tx": "not_sampled"}


def test_composite_null_arrival_denied_without_charging(spark):
    """NaN clock ticks sort last and would reset every counter if they
    entered the fold — a NULL-arrival trace must instead be denied
    outside it, with no policy attribution."""
    from sparkotel.operators.tailsample import TailPolicy, composite_sample

    base = int(T0.timestamp()) * 1_000_000
    rows = [("t1", 0, 3, 2), ("t2", 1, 2, 2)]  # t2 over the errors budget
    spans = spark.createDataFrame(
        [
            (tid, i, T0, datetime.fromtimestamp((base + off) / 1e6), code)
            for (tid, off, n, code) in rows
            for i in range(n)
        ]
        + [("tx", 0, T0, None, 2), ("tx", 1, T0, None, 2)],
        "trace_id string, span_id long, start_ts timestamp, "
        "end_ts timestamp, status_code int",
    )
    out = composite_sample(
        spans,
        [
            (TailPolicy("errors", "status_code", status_codes=(2,)), 3),
            (TailPolicy("always", "always_sample"), 8),
        ],
        10,
        key=F.lit("k"),
    )
    got = {r["trace_id"]: (r["final_decision"], r["policy"]) for r in out.collect()}
    assert got == {
        "t1": ("sampled", "errors"),
        "t2": ("not_sampled", None),
        "tx": ("not_sampled", None),
    }


def test_trace_proto_sizes_null_end_ts_gives_null_arrival(spark):
    """All-NULL end times → NULL arrival_us (never pd.NaT.value, which
    is i64 min and would place the trace FIRST in the replay)."""
    spans = spark.createDataFrame(
        [
            ("ab" * 16, "0000000000000001", "", "", "click", 2, T0, None,
             {"service.name": "svc"}, {}, "app", "", 0),
        ],
        "trace_id string, span_id string, trace_state string, "
        "parent_span_id string, name string, kind int, "
        "start_ts timestamp, end_ts timestamp, "
        "resource map<string,string>, attributes map<string,string>, "
        "scope_name string, status_message string, status_code int",
    )
    row = trace_proto_sizes(spans, with_arrival=True).collect()[0]
    assert row["arrival_us"] is None and row["proto_bytes"] > 0


def test_trace_proto_sizes_null_trace_id_one_row_across_batches(spark):
    """NULL trace_id is ONE group (the old groupBy semantics), even when
    its rows fill whole Arrow batches: the tail-carry mask must switch to
    isna() when the batch's last key is NULL (`== None` is all-False in
    pandas, which would emit one fragment row per batch)."""
    ddl = (
        "trace_id string, span_id string, trace_state string, "
        "parent_span_id string, name string, kind int, "
        "start_ts timestamp, end_ts timestamp, "
        "resource map<string,string>, attributes map<string,string>, "
        "scope_name string, status_message string, status_code int"
    )
    rows = [
        (None, f"{i + 1:016x}", "", "", "click", 2,
         T0 + timedelta(seconds=i), T0 + timedelta(seconds=i, milliseconds=5),
         {"service.name": "svc"}, {}, "app", "", 0)
        for i in range(7)
    ] + [
        ("ab" * 16, "00000000000000ff", "", "", "click", 2, T0,
         T0 + timedelta(milliseconds=5),
         {"service.name": "svc"}, {}, "app", "", 0),
    ]
    spans = spark.createDataFrame(rows, ddl)
    conf = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "2")
        small = {r["trace_id"]: r["proto_bytes"]
                 for r in trace_proto_sizes(spans).collect()}
    finally:
        spark.conf.set(conf, old)
    big = {r["trace_id"]: r["proto_bytes"]
           for r in trace_proto_sizes(spans).collect()}
    # exactly one row per key (incl. the NULL key), batch-size invariant
    assert len(small) == 2 and small == big
