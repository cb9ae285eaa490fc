"""Property-based differential testing of the OTTL compiler: random
well-typed expression trees (int arithmetic, string converters, boolean
lattice) are rendered to OTTL source, compiled to Spark columns, and
compared row-by-row against a direct Python evaluation of the same
tree.  Catches operator-precedence, parenthesization, and null/round
regressions the hand-picked e2e mirror can't enumerate."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sparkotel import expr as X

ROWS = [
    {"ia": 0, "ib": 1, "sa": "ab"},
    {"ia": 7, "ib": -3, "sa": "Xy"},
    {"ia": -9, "ib": 9, "sa": ""},
    {"ia": 4, "ib": 4, "sa": "zz z"},
]


@pytest.fixture(scope="module")
def pframe(spark):
    return spark.createDataFrame(
        [(r["ia"], r["ib"], r["sa"]) for r in ROWS], "ia long, ib long, sa string"
    )


# each node = (ottl_source, python_eval_fn)
def _lit_int():
    return st.integers(min_value=0, max_value=9).map(
        lambda n: (str(n), lambda r, n=n: n)
    )


def _int_leaf():
    return st.one_of(
        _lit_int(),
        st.sampled_from(
            [
                ('attributes["ia"]', lambda r: r["ia"]),
                ('attributes["ib"]', lambda r: r["ib"]),
            ]
        ),
    )


def _go_div(a, b):
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


def _int_expr(depth=3):
    if depth == 0:
        return _int_leaf()
    sub = st.deferred(lambda: _int_expr(depth - 1))
    nonzero = st.integers(min_value=1, max_value=9).map(
        lambda n: (str(n), lambda r, n=n: n)
    )
    return st.one_of(
        _int_leaf(),
        st.tuples(sub, st.sampled_from(["+", "-", "*"]), sub).map(
            lambda t: (
                f"({t[0][0]} {t[1]} {t[2][0]})",
                lambda r, t=t: {
                    "+": lambda a, b: a + b,
                    "-": lambda a, b: a - b,
                    "*": lambda a, b: a * b,
                }[t[1]](t[0][1](r), t[2][1](r)),
            )
        ),
        # Go integer division (trunc toward zero), nonzero divisor
        st.tuples(sub, nonzero).map(
            lambda t: (
                f"({t[0][0]} / {t[1][0]})",
                lambda r, t=t: _go_div(t[0][1](r), t[1][1](r)),
            )
        ),
    )


def _str_leaf():
    return st.one_of(
        st.sampled_from(["ab", "Q", ""]).map(lambda s: (f'"{s}"', lambda r, s=s: s)),
        st.just(('attributes["sa"]', lambda r: r["sa"])),
    )


def _str_expr(depth=2):
    if depth == 0:
        return _str_leaf()
    sub = st.deferred(lambda: _str_expr(depth - 1))
    return st.one_of(
        _str_leaf(),
        sub.map(lambda t: (f"ToUpperCase({t[0]})", lambda r, t=t: t[1](r).upper())),
        sub.map(lambda t: (f"ToLowerCase({t[0]})", lambda r, t=t: t[1](r).lower())),
        st.tuples(sub, sub).map(
            lambda t: (
                f'Concat([{t[0][0]}, {t[1][0]}], "-")',
                lambda r, t=t: t[0][1](r) + "-" + t[1][1](r),
            )
        ),
    )


def _bool_expr(depth=2):
    ints = _int_expr(2)
    strs = _str_expr(1)
    leaf = st.one_of(
        st.tuples(ints, st.sampled_from(["==", "!=", "<", "<=", ">", ">="]), ints).map(
            lambda t: (
                f"{t[0][0]} {t[1]} {t[2][0]}",
                lambda r, t=t: {
                    "==": lambda a, b: a == b,
                    "!=": lambda a, b: a != b,
                    "<": lambda a, b: a < b,
                    "<=": lambda a, b: a <= b,
                    ">": lambda a, b: a > b,
                    ">=": lambda a, b: a >= b,
                }[t[1]](t[0][1](r), t[2][1](r)),
            )
        ),
        st.tuples(strs, st.sampled_from(["==", "!="]), strs).map(
            lambda t: (
                f"{t[0][0]} {t[1]} {t[2][0]}",
                lambda r, t=t: (t[0][1](r) == t[2][1](r)) == (t[1] == "=="),
            )
        ),
    )
    if depth == 0:
        return leaf
    sub = st.deferred(lambda: _bool_expr(depth - 1))
    return st.one_of(
        leaf,
        st.tuples(sub, st.sampled_from(["and", "or"]), sub).map(
            lambda t: (
                f"({t[0][0]}) {t[1]} ({t[2][0]})",
                lambda r, t=t: (t[0][1](r) and t[2][1](r))
                if t[1] == "and"
                else (t[0][1](r) or t[2][1](r)),
            )
        ),
        sub.map(lambda t: (f"not ({t[0]})", lambda r, t=t: not t[1](r))),
    )


def _check(pframe, src, fn):
    col = X.compile_value(pframe, src, attrs_cols=["ia", "ib", "sa"])
    if not hasattr(col, "_jc"):  # plan-time constant fold
        got = [col] * len(ROWS)
    else:
        got = [r["__v"] for r in pframe.select(col.alias("__v")).collect()]
    want = [fn(r) for r in ROWS]
    assert got == want, f"{src}: {got} != {want}"


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(_int_expr())
def test_property_int_arithmetic(pframe, expr):
    _check(pframe, *expr)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_str_expr())
def test_property_string_converters(pframe, expr):
    _check(pframe, *expr)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(_bool_expr())
def test_property_boolean_lattice(pframe, expr):
    _check(pframe, *expr)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20),  # doc_id
            st.integers(min_value=1, max_value=100),  # tokens
        ),
        min_size=1,
        max_size=30,
    )
)
def test_property_pack_sequences_conservation(spark, chunks):
    """packing invariants for arbitrary inputs: token conservation, and
    every per-shard sequence except the last is exactly seq_len."""
    from collections import defaultdict

    from sparkotel.functions.text import pack_sequences

    rows = [(d, i, t) for i, (d, t) in enumerate(chunks)]
    df = spark.createDataFrame(
        rows, "doc_id long, chunk_index long, chunk_tokens long"
    )
    out = pack_sequences(df, seq_len=64, n_shards=4).collect()
    assert sum(r["piece_tokens"] for r in out) == sum(t for _, t in chunks)
    per_seq = defaultdict(int)
    for r in out:
        per_seq[(r["shard"], r["seq_id"])] += r["piece_tokens"]
        assert 0 <= r["seq_offset"] < 64 and r["piece_tokens"] >= 1
    last = {}
    for shard, seq in per_seq:
        last[shard] = max(last.get(shard, -1), seq)
    for (shard, seq), total in per_seq.items():
        if seq < last[shard]:
            assert total == 64, (shard, seq, total)
        else:
            assert 1 <= total <= 64
