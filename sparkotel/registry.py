"""Query registry: every implemented operator as a (Spark, DuckDB-oracle)
pair, consumed by ``__spark_entry__.py``.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame;
the oracle is ANSI-ish SQL DuckDB runs on the same parquet views.  All
computed columns are aliased identically on both sides (the driver's
compare hashes values under sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkotel import pages as P
from sparkotel import pipeline as PL

# ---------------------------------------------------------------------------
# DuckDB mirror of the flagship pipeline (pages → parsed → enriched → routed)
# ---------------------------------------------------------------------------

_PAT = P.LOG_PATTERN  # backslashes are literal inside DuckDB '...' strings


def duck_pipeline_cte() -> str:
    sev_num = "CASE severity_text WHEN 'error' THEN 17 WHEN 'warn' THEN 13 WHEN 'info' THEN 9 ELSE 0 END"
    return f"""
WITH pages AS ({P.duckdb_pages_sql()}),
geo AS ({P.duckdb_geo_sql()}),
langs AS ({P.LANG_NAMES_SQL}),
lines AS (
  SELECT url, warc_ts, text, lang, host, doc_id,
         split_part(text, chr(10), 1) AS _line,
         regexp_matches(split_part(text, chr(10), 1), '{_PAT}') AS _m
  FROM pages
),
parsed0 AS (
  SELECT url, warc_ts, lang, host, doc_id, text,
    NOT _m AS _error,
    CASE WHEN _m THEN regexp_extract(_line, '{_PAT}', 1) END AS ip,
    CASE WHEN _m AND regexp_extract(_line, '{_PAT}', 2) <> '-'
         THEN regexp_extract(_line, '{_PAT}', 2) END AS "user",
    CASE WHEN _m THEN regexp_extract(_line, '{_PAT}', 3) END AS ts_str,
    CASE WHEN _m THEN regexp_extract(_line, '{_PAT}', 4) END AS method,
    CASE WHEN _m THEN regexp_extract(_line, '{_PAT}', 5) END AS path,
    CASE WHEN _m THEN CAST(regexp_extract(_line, '{_PAT}', 6) AS INT) END AS status,
    CASE WHEN _m THEN CAST(regexp_extract(_line, '{_PAT}', 7) AS BIGINT) END AS nbytes
  FROM lines
),
parsed AS (
  SELECT *,
    CASE WHEN _error THEN NULL
         ELSE strptime(split_part(ts_str, ' ', 1), '%d/%b/%Y:%H:%M:%S') END AS log_ts,
    CASE WHEN status >= 500 AND status < 600 THEN 'error'
         WHEN status >= 400 AND status < 500 THEN 'warn'
         WHEN status >= 200 AND status < 300 THEN 'info'
         WHEN status >= 300 AND status < 400 THEN 'info'
         ELSE 'default' END AS severity_text
  FROM parsed0
),
parsed_sev AS (
  SELECT *, {sev_num} AS severity_number FROM parsed
),
enriched AS (
  SELECT p.*,
    coalesce(g.geo_country, '--') AS geo_country,
    coalesce(g.geo_city, '--') AS geo_city,
    g.geo_lat, g.geo_lon,
    l.lang_name, l.lang_family
  FROM parsed_sev p
  LEFT JOIN geo g ON p.ip = g.ip
  LEFT JOIN langs l ON p.lang = l.lang
),
routed AS (
  SELECT *,
    CASE WHEN lang = 'en' AND status >= 500 THEN 'errors_en'
         WHEN status >= 400 THEN 'errors_other'
         ELSE 'other' END AS route
  FROM enriched
)
"""


PARSED_COLS = [
    "url", "warc_ts", "lang", "host", "doc_id", "_error", "ip", "user",
    "ts_str", "method", "path", "status", "nbytes", "log_ts",
    "severity_text", "severity_number",
]
ENRICHED_COLS = PARSED_COLS + [
    "geo_country", "geo_city", "geo_lat", "geo_lon", "lang_name", "lang_family",
]
ROUTED_COLS = ENRICHED_COLS + ["route"]


@dataclass
class Query:
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check


def _pages_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.pages(spark, sf_dir).select("url", "warc_ts", "text", "lang", "host", "doc_id")


def _stage(name: str, cols: list[str]):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return PL.build(spark, sf_dir)[name].select(*cols)

    return fn


def _sink(sink: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return PL.build(spark, sf_dir)["sinks"][sink].select(*ROUTED_COLS)

    return fn


def _metric(sink: str, idx: int):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return PL.build(spark, sf_dir)["metrics"][sink][idx]

    return fn


def _sink_sql(cond: str) -> str:
    cols = ", ".join(f'"{c}"' if c == "user" else c for c in ROUTED_COLS)
    return f"{duck_pipeline_cte()} SELECT {cols} FROM routed WHERE {cond}"


def _agg_sql(src_cond: str, metric: str, dims: str, group: str, extra: str = "") -> str:
    return (
        f"{duck_pipeline_cte()} SELECT {dims}, count(*) AS value, "
        f"min(warc_ts) AS start_ts, max(warc_ts) AS end_ts, '{metric}' AS metric_name "
        f"FROM routed WHERE {src_cond} {extra} GROUP BY {group}"
    )


def build_registry() -> dict[str, Query]:
    q: dict[str, Query] = {}

    sel = lambda cols: ", ".join(f'"{c}"' if c == "user" else c for c in cols)  # noqa: E731

    q["pages_gen"] = Query(
        _pages_q,
        f"{duck_pipeline_cte()} SELECT url, warc_ts, text, lang, host, doc_id FROM pages",
    )
    q["parse_regex"] = Query(
        _stage("parsed", PARSED_COLS),
        f"{duck_pipeline_cte()} SELECT {sel(PARSED_COLS)} FROM parsed_sev",
    )
    q["parse_onerror_drop"] = Query(
        lambda spark, sf: PL.parse_stage(P.pages(spark, sf).drop("html"), on_error="drop").select(
            "url", "ip", "status", "nbytes", "method", "path"
        ),
        f"{duck_pipeline_cte()} SELECT url, ip, status, nbytes, method, path FROM parsed_sev WHERE NOT _error",
    )
    q["enrich_lookup"] = Query(
        _stage("enriched", ENRICHED_COLS),
        f"{duck_pipeline_cte()} SELECT {sel(ENRICHED_COLS)} FROM enriched",
    )
    q["route_assign"] = Query(
        _stage("routed", ROUTED_COLS),
        f"{duck_pipeline_cte()} SELECT {sel(ROUTED_COLS)} FROM routed",
    )
    q["sink_errors_en"] = Query(_sink("errors_en"), _sink_sql("route = 'errors_en'"))
    q["sink_errors_other"] = Query(_sink("errors_other"), _sink_sql("route = 'errors_other'"))
    q["sink_other"] = Query(_sink("other"), _sink_sql("route = 'other'"))
    q["sink_de_copy"] = Query(_sink("de"), _sink_sql("geo_country = 'DE'"))

    q["agg_count_all_errors_other"] = Query(
        _metric("errors_other", 0),
        _agg_sql("route = 'errors_other'", "page.count.all", "geo_country, status", "1, 2"),
    )
    q["agg_count_cond_big"] = Query(
        _metric("errors_other", 1),
        _agg_sql("route = 'errors_other'", "page.count.big", "host", "1", "AND nbytes > 4096"),
    )
    q["agg_count_default_dim"] = Query(
        _metric("other", 1),
        f"{duck_pipeline_cte()} SELECT coalesce(lang_name, 'unknown') AS lang_name, "
        f"count(*) AS value, min(warc_ts) AS start_ts, max(warc_ts) AS end_ts, "
        f"'page.count.by_lang_name' AS metric_name FROM routed WHERE route = 'other' GROUP BY 1",
    )
    q["agg_count_missing_dim"] = Query(
        _metric("other", 2),
        f'{duck_pipeline_cte()} SELECT "user", count(*) AS value, '
        f"min(warc_ts) AS start_ts, max(warc_ts) AS end_ts, "
        f"'page.count.matched_user' AS metric_name FROM routed "
        f'WHERE route = \'other\' AND "user" IS NOT NULL GROUP BY 1',
    )
    return q
