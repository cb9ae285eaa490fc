"""URL canonicalization and crawl-snapshot dedup for web-page tables.

A Common-Crawl-style corpus carries many fetches of the same logical
page: host-case variants, default ports, tracking query params,
fragments, and re-crawls at different ``warc_ts``.  These operators
collapse them:

- ``url_canonicalize`` — pure Column expression (RFC 3986 appendix-B
  component regexes, identical strings in Spark and DuckDB so the
  oracle replays them verbatim): lowercase scheme+authority, strip the
  scheme's default port, empty path -> "/", strip trailing slashes on
  non-root paths, drop the fragment, drop tracking params
  (``utm_*``/``gclid``/``fbclid``), sort surviving params byte-wise.
- ``crawl_latest`` — per canonical URL keep the latest snapshot
  (max ``warc_ts``, doc-id tiebreak) plus the snapshot count.

Reference anchor: the collector has no URL semantics beyond
``uri_parser`` (pkg/stanza/operator/parser/uri — mirrored at
operators/parse.py); these are brief-mandated web-corpus extensions
(SURVEY 2.16).

Scale shape: canonicalization is a projection (whole-stage codegen,
scan-speed at 100 TB).  ``crawl_latest`` is ONE map-side-combinable
groupBy(canonical_url) — max(struct) and count partials combine before
the shuffle, so a page re-crawled 10^6 times costs one reduce row, and
url keys are near-unique so the shuffle has no skew pivot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC 3986 appendix-B derived component patterns — kept as plain
# strings so the DuckDB mirror uses the exact same regexes
_SCHEME_RE = "^([^:/?#]+):"
_AUTH_RE = "^[^:/?#]+://([^/?#]*)"
_PATH_RE = "^[^:/?#]+://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_TRACKING_RE = "^(gclid|fbclid)="


def url_canonicalize(u: Column) -> Column:
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(u, _AUTH_RE, 1))
    auth = F.when(
        scheme == "http", F.regexp_replace(auth, ":80$", "")
    ).otherwise(auth)
    auth = F.when(
        scheme == "https", F.regexp_replace(auth, ":443$", "")
    ).otherwise(auth)
    path = F.regexp_extract(u, _PATH_RE, 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(F.length(path) > 1, F.regexp_replace(path, "/+$", "")).otherwise(
        path
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)  # was all slashes
    qs = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.rlike(_TRACKING_RE),
        )
    )
    qstr = F.concat_ws("&", params)
    return F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def duck_url_canonicalize(u: str) -> str:
    """the same canonicalization as a DuckDB SQL expression over ``u``"""
    scheme = f"lower(regexp_extract({u}, '{_SCHEME_RE}', 1))"
    auth = f"lower(regexp_extract({u}, '{_AUTH_RE}', 1))"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth}, ':443$', '') "
        f"ELSE {auth} END"
    )
    path = f"regexp_extract({u}, '{_PATH_RE}', 1)"
    path = (
        f"CASE WHEN {path} = '' THEN '/' "
        f"WHEN length({path}) > 1 AND regexp_replace({path}, '/+$', '') = '' THEN '/' "
        f"WHEN length({path}) > 1 THEN regexp_replace({path}, '/+$', '') "
        f"ELSE {path} END"
    )
    qs = f"regexp_extract({u}, '\\?([^#]*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({qs}, '&'), "
        f"p -> p <> '' AND NOT starts_with(p, 'utm_') "
        f"AND NOT regexp_matches(p, '{_TRACKING_RE}')))"
    )
    qstr = f"array_to_string({params}, '&')"
    return (
        f"({scheme} || '://' || {auth} || {path} || "
        f"CASE WHEN {qstr} <> '' THEN '?' || {qstr} ELSE '' END)"
    )


def crawl_latest(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """(canonical_url, warc_ts, doc_id, n_snapshots): the newest
    snapshot per canonical URL (doc-id tiebreak on equal timestamps)."""
    c = df.withColumn("_curl", url_canonicalize(F.col(url_col)))
    return (
        c.groupBy("_curl")
        .agg(
            F.max(
                F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))
            ).alias("top"),
            F.count(F.lit(1)).alias("n_snapshots"),
        )
        .select(
            F.col("_curl").alias("canonical_url"),
            F.col("top.ts").alias(ts_col),
            F.col("top.id").alias(id_col),
            "n_snapshots",
        )
    )


def host_quality(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    min_quality: float = 0.38,
) -> DataFrame:
    """(host, n_pages, mean_quality, blocked): the host-level spam
    filter a crawl pipeline applies before document-level rules — a
    host whose mean quality score falls below ``min_quality`` is
    blocked wholesale.

    Scale shape: quality is a projection; the host rollup is ONE
    map-side-combinable groupBy.  The mean is computed over the
    micro-unit integer sum (quality is already rounded to 1e-6, so
    sum(round(q*1e6)) is exact) — float summation order differs
    between engines/partitionings, an integer sum does not.
    """
    from sparkotel.functions.text import quality_score

    q = quality_score(df, text_col)
    q6 = F.round(F.col("quality") * 1000000, 0).cast("long")
    return (
        q.groupBy(host_col)
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(q6).alias("_sq6"),
        )
        .select(
            host_col,
            "n_pages",
            F.round(F.col("_sq6") / (F.col("n_pages") * 1e6), 6).alias(
                "mean_quality"
            ),
            (
                F.round(F.col("_sq6") / (F.col("n_pages") * 1e6), 6)
                < F.lit(min_quality)
            ).alias("blocked"),
        )
    )


# ---------------------------------------------------------------------------
# gap-based sessionization over parsed access logs
# ---------------------------------------------------------------------------


def sessionize(
    df: DataFrame,
    key_col: str = "ip",
    ts_col: str = "log_ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Classic web-log sessionization: per ``key_col``, order by time
    and start a new session whenever the gap since the previous request
    exceeds ``gap_minutes``.  Emits one row per session with request
    count, bounds, and error count.

    The lag→boundary→cumulative-sum form is engine-portable (the DuckDB
    oracle mirrors it verbatim), deterministic (tie-broken by doc_id),
    and equivalent to Spark's ``session_window`` for complete data.

    Scale shape: one shuffle by ``key_col`` + per-key sort.  Keys are
    visitor IPs — bounded per-key row counts (a single visitor emits
    what one client can emit), so per-key sort memory is bounded; the
    *number* of keys scales, which partitions handle.  Order-dependent
    per-key logic cannot be salted, so a synthetic hot key (a load
    balancer IP) should be pre-filtered — the same caveat the
    servicegraph pairing documents.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("doc_id"))
    gap_s = gap_minutes * 60
    prev = F.lag(F.col(ts_col)).over(w)
    # fractional-second epoch on BOTH engines (duck_sessionize uses
    # epoch(); unix_timestamp would truncate to whole seconds and split
    # sub-second gap-boundary sessions differently across engines)
    new_sess = (
        prev.isNull()
        | (F.col(ts_col).cast("double") - prev.cast("double") > gap_s)
    ).cast("bigint")
    sess_idx = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(key_col),
        F.col(ts_col),
        F.col("doc_id"),
        (F.col("status") >= 500).cast("bigint").alias("_err"),
    ).withColumn("session_idx", sess_idx)
    return (
        base.groupBy(key_col, "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.sum("_err").alias("n_errors"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("int"))
    )


def duck_sessionize(gap_minutes: int = 30) -> str:
    """DuckDB mirror over the pipeline CTE's ``parsed`` frame (callers
    prepend the CTE and a WHERE NOT _error filter)."""
    gap_s = gap_minutes * 60
    return f"""
b AS (
  SELECT ip, log_ts, doc_id,
         CASE WHEN status >= 500 THEN 1 ELSE 0 END AS err,
         CASE WHEN lag(log_ts) OVER w IS NULL
                OR epoch(log_ts) - epoch(lag(log_ts) OVER w) > {gap_s}
              THEN 1 ELSE 0 END AS new_sess
  FROM parsed WHERE NOT _error
  WINDOW w AS (PARTITION BY ip ORDER BY log_ts, doc_id)
),
s AS (
  SELECT ip, log_ts, doc_id, err,
         sum(new_sess) OVER (PARTITION BY ip ORDER BY log_ts, doc_id
                             ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM b
)
SELECT ip, CAST(session_idx AS INT) AS session_idx,
  CAST(count(*) AS BIGINT) AS n_requests,
  min(log_ts) AS session_start,
  max(log_ts) AS session_end,
  CAST(sum(err) AS BIGINT) AS n_errors
FROM s GROUP BY ip, session_idx
"""


# ---------------------------------------------------------------------------
# URL blocklist / keyword filtering (RefinedWeb, Penedo et al. 2023 §3.1)
# ---------------------------------------------------------------------------

# Stand-in for the UT1-style aggregated domain blocklist (the real list
# is ~4.6M domains; the mechanics — broadcast join on host, category
# attached — are what scale).  Hosts exist in the synthetic pages table;
# h1 is one of the three skew hosts (~20% of rows), exercising the
# "popular domain lands on the blocklist" case.
DEFAULT_BLOCKLIST = [
    ("h1.example.com", "ads"),
    ("h57.example.com", "adult"),
    ("h123.example.com", "malware"),
]
# Weighted URL keywords (soft matching on the raw URL string); the
# fixture's numeric path tail stands in for the paper's word lists.
DEFAULT_KW_WEIGHTS = {"/3": 1.0, "/5": 2.5, "tracker": 5.0}
DEFAULT_KW_THRESHOLD = 2.0


def url_blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    kw_weights: dict[str, float] | None = None,
    threshold: float = DEFAULT_KW_THRESHOLD,
    url_col: str = "url",
) -> DataFrame:
    """RefinedWeb-style URL filtering: a document is dropped when its
    host appears on a curated domain blocklist OR its URL accumulates
    too much weight from a keyword list (Penedo et al. 2023 §3.1 —
    public; the UT1 blocklist + word-list scoring design).

    Scale shape at 10^12 rows: the blocklist is a broadcast dim (UT1 is
    ~4.6M rows ≈ 100 MB — exactly the lookupprocessor shape,
    operators/enrich.py); keyword scoring is a pure projection (a
    fixed chain of ``contains`` tests, whole-stage codegen).  No
    shuffle anywhere — the filter rides the scan.

    Output keeps the evidence: (url, host, block_category, kw_score,
    blocked_host, keep).
    """
    kw = kw_weights if kw_weights is not None else DEFAULT_KW_WEIGHTS
    host = F.lower(F.regexp_extract(F.col(url_col), _AUTH_RE, 1))
    score: Column = F.lit(0.0)
    for k in sorted(kw):  # fixed fold order → bit-identical double sum
        score = score + F.when(
            F.col(url_col).contains(k), F.lit(float(kw[k]))
        ).otherwise(F.lit(0.0))
    bl = blocklist.select(
        F.lower(F.col("host")).alias("_bl_host"),
        F.col("category").alias("block_category"),
    )
    out = (
        df.select(F.col(url_col), host.alias("host"), score.alias("kw_score"))
        .join(F.broadcast(bl), F.col("host") == F.col("_bl_host"), "left")
        .drop("_bl_host")
    )
    return out.select(
        url_col,
        "host",
        "block_category",
        "kw_score",
        F.col("block_category").isNotNull().alias("blocked_host"),
        (
            F.col("block_category").isNull() & (F.col("kw_score") < F.lit(threshold))
        ).alias("keep"),
    )


def duck_url_blocklist_filter(
    pages_cte: str,
    blocklist: list[tuple[str, str]] | None = None,
    kw_weights: dict[str, float] | None = None,
    threshold: float = DEFAULT_KW_THRESHOLD,
) -> str:
    bl = blocklist if blocklist is not None else DEFAULT_BLOCKLIST
    kw = kw_weights if kw_weights is not None else DEFAULT_KW_WEIGHTS
    values = ", ".join(f"('{h}', '{c}')" for h, c in bl)
    score = " + ".join(
        f"(CASE WHEN contains(url, '{k}') THEN CAST({float(kw[k])!r} AS DOUBLE) ELSE 0.0 END)"
        for k in sorted(kw)
    )
    return f"""
WITH pages AS ({pages_cte}),
bl(bl_host, category) AS (VALUES {values}),
scored AS (
  SELECT url, lower(regexp_extract(url, '{_AUTH_RE}', 1)) AS host,
         ({score}) AS kw_score
  FROM pages
)
SELECT s.url, s.host, b.category AS block_category, s.kw_score,
       b.category IS NOT NULL AS blocked_host,
       (b.category IS NULL AND s.kw_score < {float(threshold)!r}) AS keep
FROM scored s LEFT JOIN bl b ON s.host = b.bl_host
"""
