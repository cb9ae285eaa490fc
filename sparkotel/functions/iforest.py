"""Isolation-forest anomaly scoring
(processor/isolationforestprocessor/).

The reference embeds an ONLINE isolation forest (incremental per-sample
tree updates from a seeded PCG stream, isolation_forest.go:127-489).
That shape is wrong for a distributed batch engine — per-sample mutable
trees serialize the stream — so this module implements the batch
algorithm the online variant approximates: the original Isolation
Forest (Liu, Ting, Zhou 2008).  Semantics match the processor's
contract (README "How it Works"): per feature-group models, forest of
``num_trees`` trees each grown on a ``subsample`` of the window, score
``2^(−E[h(x)]/c(ψ))``, threshold either fixed or derived as the
``(1 − contamination)`` quantile of the batch's scores, enrich
(score + is_anomaly attributes) or filter (drop anomalies) modes.

Spark shape: the training set is tiny by construction (groups ×
window rows, deterministically chosen by hash rank) and collects to the
driver like the IVF centroids do; trees are built with a seeded numpy
generator (same seed → same forest → replayable scores) and broadcast;
scoring is one Arrow-batched pandas UDF doing vectorized tree
traversal — no shuffle on the scoring path.  The contamination
threshold is an exact percentile (one aggregate).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SCORE_ATTR = "anomaly.isolation_score"
FLAG_ATTR = "anomaly.is_anomaly"

_EULER = 0.5772156649015329


def _c(n: float) -> float:
    """Average unsuccessful-search path length in a BST of n nodes —
    the normalizer c(ψ) from the iForest paper (eq. 1)."""
    if n <= 1.0:
        return 0.0
    return 2.0 * (math.log(n - 1.0) + _EULER) - 2.0 * (n - 1.0) / n


def _build_tree(X: np.ndarray, rng: np.random.Generator, max_depth: int) -> list:
    """Grow one isolation tree over X; nodes as tuples —
    internal: ("i", feature, split, left_subtree, right_subtree),
    leaf: ("l", n_rows)."""
    def grow(idx: np.ndarray, depth: int):
        if depth >= max_depth or len(idx) <= 1:
            return ("l", len(idx))
        cols = [
            j
            for j in range(X.shape[1])
            if X[idx, j].min() < X[idx, j].max()
        ]
        if not cols:
            return ("l", len(idx))
        j = cols[rng.integers(0, len(cols))]
        lo, hi = X[idx, j].min(), X[idx, j].max()
        split = lo + rng.random() * (hi - lo)
        mask = X[idx, j] < split
        return ("i", j, float(split), grow(idx[mask], depth + 1), grow(idx[~mask], depth + 1))

    return grow(np.arange(len(X)), 0)


def _path_lengths(tree, X: np.ndarray) -> np.ndarray:
    """Vectorized traversal: path length h(x) per row, leaves of size
    n > 1 extended by c(n) per the paper."""
    out = np.zeros(len(X))

    def walk(node, idx: np.ndarray, depth: int):
        if not len(idx):
            return
        if node[0] == "l":
            out[idx] = depth + _c(float(node[1]))
            return
        _, j, split, left, right = node
        mask = X[idx, j] < split
        walk(left, idx[mask], depth + 1)
        walk(right, idx[~mask], depth + 1)

    walk(tree, np.arange(len(X)), 0)
    return out


def train_forest(
    X: np.ndarray, num_trees: int, subsample: int, seed: int
) -> tuple[list, float]:
    """Train a forest on X (already the per-group window); returns
    (trees, c(ψ)) — ψ is the realized subsample size."""
    rng = np.random.default_rng(seed)
    psi = min(subsample, len(X))
    max_depth = max(1, math.ceil(math.log2(max(psi, 2))))
    trees = []
    for _ in range(num_trees):
        take = rng.choice(len(X), size=psi, replace=False)
        trees.append(_build_tree(X[take], rng, max_depth))
    return trees, _c(float(psi))


def score_rows(forest: tuple[list, float], X: np.ndarray) -> np.ndarray:
    trees, c_psi = forest
    if not len(X):
        return np.zeros(0)
    if c_psi <= 0:
        return np.full(len(X), 0.5)
    total = np.zeros(len(X))
    for t in trees:
        total += _path_lengths(t, X)
    avg = total / len(trees)
    return np.power(2.0, -avg / c_psi)


def isolation_forest(
    df: DataFrame,
    features: list[str],
    group_by: tuple = (),
    num_trees: int = 100,
    subsample: int = 256,
    window_size: int = 1000,
    seed: int = 7,
    threshold: float | None = None,
    contamination_rate: float = 0.10,
    mode: str = "enrich",
    score_col: str = SCORE_ATTR.replace(".", "_"),
    flag_col: str = FLAG_ATTR.replace(".", "_"),
    approx_threshold: bool = False,
    rank_expr=None,
) -> DataFrame:
    """Score every row; ``mode="enrich"`` appends score + flag columns
    (the processor's score/classification attributes), ``mode="filter"``
    drops flagged rows (``drop_anomalous_data``), ``mode="both"`` does
    enrich-then-filter like the reference's ``both``.

    The training window is the ``window_size`` hash-lowest rows per
    group — deterministic under reruns and insensitive to input order,
    standing in for the reference's "most recent window" (a batch table
    has no arrival order).  Groups are the ``group_by`` columns
    (``features:`` config); empty = one global model.

    ``rank_expr`` optionally replaces the internal xxhash64 window rank
    with a caller-supplied Column (e.g. ``md5(cast(id as string))``)
    so the window selection is replayable outside Spark — the
    golden-fixture oracle (sparkotel/golden.py) uses this to reproduce
    the exact training window in a single-process twin.
    """
    if mode not in ("enrich", "filter", "both"):
        raise ValueError(f"unknown mode {mode!r}")
    if not features:
        raise ValueError("at least one feature column is required")
    gb = list(group_by)

    fcols = [F.col(c).cast("double") for c in features]
    rank_hash = (
        rank_expr
        if rank_expr is not None
        else F.xxhash64(*features, *(gb or []), F.lit(seed))
    )
    from pyspark.sql import Window

    base = df.select(
        *gb,
        *[c.alias(f"_f{i}") for i, c in enumerate(fcols)],
        rank_hash.alias("_h"),
    ).na.drop(subset=[f"_f{i}" for i in range(len(fcols))])
    if gb:
        # per-group hash-rank window: partitioned by the group key, so
        # no single-partition concentration
        w = Window.partitionBy(*gb).orderBy("_h")
        sample = (
            base.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= window_size)
            .drop("_rn", "_h")
            .collect()
        )
    else:
        # global model: distributed top-k (TakeOrderedAndProject), never
        # a single-partition window
        sample = base.orderBy("_h").limit(window_size).drop("_h").collect()
    nf = len(features)
    groups: dict = {}
    for r in sample:
        key = tuple(r[c] for c in gb) if gb else ()
        groups.setdefault(key, []).append([r[f"_f{i}"] for i in range(nf)])
    forests = {
        k: train_forest(np.asarray(v, dtype=float), num_trees, subsample, seed)
        for k, v in groups.items()
    }
    bc = df.sparkSession.sparkContext.broadcast(forests)

    @pandas_udf("double")
    def _score(*cols: pd.Series) -> pd.Series:
        keys = cols[:len(gb)] if gb else ()
        feats = cols[len(gb):]
        X = np.column_stack([c.astype(float).to_numpy() for c in feats])
        n = len(X)
        out = np.full(n, np.nan)
        if gb:
            key_frame = pd.DataFrame({i: k for i, k in enumerate(keys)})
            tuples = list(map(tuple, key_frame.itertuples(index=False, name=None)))
            arr = np.array(tuples, dtype=object)
            for k, forest in bc.value.items():
                mask = np.array([t == k for t in tuples])
                if mask.any():
                    out[mask] = score_rows(forest, X[mask])
        else:
            forest = bc.value.get(())
            if forest is not None:
                out = score_rows(forest, X)
        return pd.Series(out)

    scored = df.withColumn(score_col, _score(*gb, *fcols))
    if threshold is None:
        # (1 − contamination) quantile of the batch's scores (README
        # "Contamination rate").  Exact percentile buffers every
        # distinct score per partition — fine at test scale and fully
        # reproducible; at 10^9 rows pass approx_threshold=True for the
        # t-digest sketch (bounded memory, ±1e-4 rank accuracy).
        q = 1.0 - contamination_rate
        qexpr = (
            f"approx_percentile({score_col}, {q}, 10000)"
            if approx_threshold
            else f"percentile({score_col}, {q})"
        )
        thr = scored.select(F.expr(qexpr).alias("t")).collect()[0]["t"]
    else:
        thr = float(threshold)
    flagged = scored.withColumn(
        flag_col, F.coalesce(F.col(score_col) >= F.lit(thr), F.lit(False))
    )
    if mode == "enrich":
        return flagged
    if mode == "filter":
        return flagged.where(~F.col(flag_col)).drop(score_col, flag_col)
    return flagged.where(~F.col(flag_col))
