"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, and a
random-hyperplane LSH bucketing as the scale path (bucket first, search
within buckets — turns O(N·Q) into O(N·Q/2^planes) probes).

Engine notes: dot products run as ``F.aggregate``/``F.zip_with`` over
doubles (JVM, no UDF).  Scores are rounded to 4 decimals BEFORE ranking
so float summation-order noise between engines can't flip ranks; ties
break on candidate id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 4
_PLANE_MOD = 1997


def plane_weight(j: int, d: int) -> float:
    """deterministic pseudo-random hyperplane weights in [-0.5, 0.5)"""
    return ((1 + (j * 64 + d) * 2654435761) % _PLANE_MOD) / _PLANE_MOD - 0.5


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """exact top-k neighbors for a small query set.

    The query side is broadcast (a handful of rows), so the 'cross'
    join is really one scan of the corpus — the right baseline shape
    for a 10^12-row table."""
    q = df.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = df.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
        .withColumn("score", F.round(cosine(F.col("qvec"), F.col("cvec")), 4))
        .select("qid", "cid", "score")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def duck_brute_force_topk(query_ids: list[int], k: int = 5, table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM {table} WHERE vec_id IN ({ids})),
c AS (SELECT vec_id AS cid, embedding AS cvec FROM {table}),
scored AS (
  SELECT qid, cid,
    round(
      list_sum(list_transform(range(1, len(qvec) + 1),
        i -> CAST(qvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(qvec) + 1), i -> CAST(qvec[i] AS DOUBLE) * CAST(qvec[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, len(cvec) + 1), i -> CAST(cvec[i] AS DOUBLE) * CAST(cvec[i] AS DOUBLE))))),
    4) AS score
  FROM c JOIN q ON qid <> cid
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, cid) AS INT) AS rank
  FROM scored
)
SELECT qid, cid, score, rank FROM ranked WHERE rank <= {k}
"""


def lsh_bucket(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """random-hyperplane bucket id (sign bits of N_PLANES dots)."""
    acc = None
    for j in range(N_PLANES):
        w = F.array(*[F.lit(plane_weight(j, d)) for d in range(dim)])
        dot = _dot(F.col(vec_col), w)
        bit = F.when(dot >= 0, F.lit(2 ** j)).otherwise(F.lit(0))
        acc = bit if acc is None else acc + bit
    return df.select(F.col(id_col), acc.cast("int").alias("bucket"))


def lsh_bucket_counts(df: DataFrame, **kw) -> DataFrame:
    return lsh_bucket(df, **kw).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


def duck_lsh_bucket_counts(table: str = "embeddings", dim: int = 64) -> str:
    bits = []
    for j in range(N_PLANES):
        terms = " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * ({plane_weight(j, d)!r})" for d in range(dim)
        )
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN {2 ** j} ELSE 0 END)")
    bucket = " + ".join(bits)
    return f"""
WITH b AS (SELECT vec_id, CAST({bucket} AS INT) AS bucket FROM {table})
SELECT bucket, count(*) AS n FROM b GROUP BY 1
"""


def bucketed_topk(
    df: DataFrame, query_ids: list[int], k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """ANN: search only within the query's LSH bucket (the IVF-style
    scale path; recall < 1 by design, verified against brute force in
    tests)."""
    b = lsh_bucket(df, id_col, vec_col)
    dfb = df.join(b, id_col)
    q = dfb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"), F.col("bucket").alias("qb")
    )
    c = dfb.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"), F.col("bucket").alias("cb"))
    scored = (
        c.join(F.broadcast(q), (F.col("qb") == F.col("cb")) & (F.col("qid") != F.col("cid")))
        .withColumn("score", F.round(cosine(F.col("qvec"), F.col("cvec")), 4))
        .select("qid", "cid", "score")
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("cid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
