"""Whole-key-group regrouping for ``mapInPandas`` streams.

Several operators (span pruning, tail-sampling proto sizing) shuffle on
a key, sort within partitions, and then walk each key group in Python
under ``mapInPandas`` — ONE Python invocation per Arrow batch instead
of ``groupBy(key).applyInPandas``'s per-group round trip.  The one
subtlety is the batch-straddling group: the last key of an Arrow batch
may continue into the next batch, so its rows must be held back
(tail-carried) and only released once a different key appears.

``iter_whole_key_groups`` centralises that carry so the two call sites
(and future ones) share one tested implementation.  It is O(n) in rows:
the carry is kept as a LIST of single-key frame parts and concatenated
exactly once, when the group completes — not re-concatenated into every
incoming batch.  That matters because a single giant key run is a
realistic input (every malformed/NULL-trace span in a fleet shares one
key, hashes to one partition, and sorts contiguously); the per-batch
re-concat shape copies the accumulation each batch (O(k²) rows over k
batches), while this shape copies each row at most twice (once into its
part, once at flush).

NULL keys compare equal to each other (pandas ``==`` is all-False for
NaN/None, which would split a NULL-key group across yields;
``groupBy(key)`` keeps NULLs together as one group).

Memory is bounded by one Arrow batch + the largest single key group —
inherent to whole-group semantics; the consumer needs the whole group
at once either way.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

__all__ = ["iter_whole_key_groups"]

_UNSET = object()


def _keys_equal(a, b) -> bool:
    if a is _UNSET or b is _UNSET:
        return False
    a_na, b_na = pd.isna(a), pd.isna(b)
    if a_na or b_na:
        return bool(a_na and b_na)
    return bool(a == b)


def _concat(parts: list) -> pd.DataFrame:
    return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)


def iter_whole_key_groups(
    frames: Iterable[pd.DataFrame], key: str
) -> Iterator[pd.DataFrame]:
    """Regroup a key-sorted stream of pandas frames so that every key
    group appears whole in exactly one yielded frame.

    ``frames`` must come from a partition that was hash-partitioned and
    sorted on ``key`` (``repartition(key).sortWithinPartitions(key,
    ...)``), so equal keys are contiguous across the batch stream.
    Yielded frames preserve row order and may contain several complete
    groups (a batch head) or exactly one (a flushed carry); consumers
    iterate groups with ``itertools.groupby`` either way.
    """
    carry_parts: list = []
    carry_key = _UNSET
    for pdf in frames:
        if not len(pdf):
            continue
        keys = pdf[key]
        first, last = keys.iloc[0], keys.iloc[-1]
        if carry_parts and not _keys_equal(carry_key, first):
            # the carried group ended exactly at the previous batch
            # boundary — release it before touching this batch
            yield _concat(carry_parts)
            carry_parts, carry_key = [], _UNSET
        tail = keys.isna() if pd.isna(last) else keys == last
        if bool(tail.all()):
            # single-key batch: extend (or start) the carry without
            # copying what's already accumulated
            carry_parts.append(pdf)
            carry_key = last
            continue
        head = pdf[~tail]
        if carry_parts:
            # the carry's key continues into head's first rows; the
            # completed carry + this batch's complete groups go out as
            # one frame (groups stay contiguous for groupby consumers)
            carry_parts.append(head)
            yield _concat(carry_parts)
        else:
            yield head
        carry_parts, carry_key = [pdf[tail]], last
    if carry_parts:
        yield _concat(carry_parts)
