"""Unit tests for sparkotel.batching.iter_whole_key_groups — the shared
whole-key-group tail-carry used by span_pruning and trace_proto_sizes.
Pure pandas; no SparkSession needed."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sparkotel.batching import iter_whole_key_groups


def _frames(rows, sizes):
    """Split a row list into consecutive frames of the given sizes."""
    out, i = [], 0
    for n in sizes:
        out.append(pd.DataFrame(rows[i : i + n], columns=["k", "v"]))
        i += n
    assert i == len(rows)
    return out


def _collect(frames, key="k"):
    return list(iter_whole_key_groups(frames, key))


def _groups_of(frame):
    """Distinct keys of a frame in first-appearance order (NULL-safe)."""
    seen, order = set(), []
    for k in frame["k"]:
        kk = "\x00NULL" if pd.isna(k) else k
        if kk not in seen:
            seen.add(kk)
            order.append(kk)
    return order


def test_groups_never_split_across_yields():
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4), ("b", 5), ("c", 6)]
    for sizes in [(6,), (1, 5), (2, 2, 2), (3, 3), (5, 1), (1, 1, 1, 1, 1, 1)]:
        got = _collect(_frames(rows, sizes))
        seen = []
        for frame in got:
            for k in _groups_of(frame):
                assert k not in seen, f"group {k!r} split under sizes {sizes}"
                seen.append(k)
        assert seen == ["a", "b", "c"]
        assert sum(len(f) for f in got) == len(rows)


def test_row_order_preserved():
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(5, 9)]
    got = pd.concat(_collect(_frames(rows, (3, 3, 3))), ignore_index=True)
    assert got["v"].tolist() == list(range(9))


def test_null_key_group_spans_many_batches_yields_once():
    # every row one NULL-key group, split over 4 batches: must come out
    # as ONE whole frame (pandas == is all-False for NULL, the bug the
    # NULL-aware mask exists for)
    rows = [(None, i) for i in range(10)]
    got = _collect(_frames(rows, (3, 3, 3, 1)))
    assert len(got) == 1
    assert len(got[0]) == 10
    assert got[0]["k"].isna().all()


def test_null_then_real_key():
    # Spark sorts NULLS FIRST: NULL group then real keys
    rows = [(None, 0), (None, 1), ("a", 2), ("a", 3), ("b", 4)]
    got = _collect(_frames(rows, (3, 2)))
    all_rows = pd.concat(got, ignore_index=True)
    assert len(all_rows) == 5
    seen = [k for f in got for k in _groups_of(f)]
    assert seen == ["\x00NULL", "a", "b"]


def test_nan_float_keys_group_together():
    # float frames carry NULL as NaN, not None — isna covers both
    f1 = pd.DataFrame({"k": [np.nan, np.nan], "v": [0, 1]})
    f2 = pd.DataFrame({"k": [np.nan, 1.0], "v": [2, 3]})
    got = _collect([f1, f2])
    assert [len(f) for f in got] == [3, 1]
    assert got[0]["k"].isna().all()


def test_boundary_exact_key_change():
    # carry key ends exactly at a batch boundary: flush before the new batch
    rows = [("a", 1), ("a", 2), ("b", 3), ("b", 4)]
    got = _collect(_frames(rows, (2, 2)))
    assert [f["k"].iloc[0] for f in got] == ["a", "b"]
    assert [len(f) for f in got] == [2, 2]


def test_empty_frames_skipped():
    f_empty = pd.DataFrame({"k": pd.Series([], dtype=object), "v": []})
    rows = [("a", 1), ("a", 2)]
    got = _collect([f_empty, *_frames(rows, (1, 1)), f_empty])
    assert len(got) == 1 and len(got[0]) == 2


def test_empty_input():
    assert _collect([]) == []


def test_single_giant_group_linear_concats(monkeypatch):
    # the O(n) contract: a one-key run over k batches must NOT
    # re-concat the accumulation per batch (O(k^2) copies); the carry
    # concatenates exactly once, at flush
    import sparkotel.batching as B

    calls = []
    real_concat = pd.concat

    def counting_concat(objs, *a, **kw):
        calls.append(sum(len(o) for o in objs))
        return real_concat(objs, *a, **kw)

    monkeypatch.setattr(B.pd, "concat", counting_concat)
    k = 50
    rows = [("x", i) for i in range(k * 4)]
    got = _collect(_frames(rows, tuple([4] * k)))
    assert len(got) == 1 and len(got[0]) == k * 4
    # exactly one concat, over the full group — not one per batch
    assert calls == [k * 4]


def test_multi_group_batches_with_straddles():
    # straddle in the middle of multi-key batches
    rows = [("a", 0), ("b", 1), ("b", 2), ("b", 3), ("c", 4), ("c", 5), ("d", 6)]
    got = _collect(_frames(rows, (2, 3, 2)))
    seen = [k for f in got for k in _groups_of(f)]
    assert seen == ["a", "b", "c", "d"]
    assert pd.concat(got, ignore_index=True)["v"].tolist() == list(range(7))


@pytest.mark.parametrize("sizes", [(7,), (1, 6), (6, 1), (2, 2, 2, 1), tuple([1] * 7)])
def test_equivalence_exhaustive_splits(sizes):
    rows = [("a", 0), ("a", 1), (None, 2), (None, 3), ("z", 4), ("z", 5), ("z", 6)]
    # NOTE: input is key-contiguous (the helper's contract), not sorted
    got = _collect(_frames(rows, sizes))
    seen = [k for f in got for k in _groups_of(f)]
    assert seen == ["a", "\x00NULL", "z"]
    assert pd.concat(got, ignore_index=True)["v"].tolist() == list(range(7))
