"""WARC record framing — the on-disk format Common Crawl ships
(ISO 28500; WARC/1.0 records: version line + CRLF header block + blank
line + payload, records separated by a blank line).  The reference
pipeline's receivers read framed log files (fileconsumer / the
fileexporter's framed outputs); this module is the web-corpus analogue:
marshal pages INTO WARC framing, split a multi-record WARC blob back
into records, and parse each record's headers/payload — all pure
column expressions with byte-identical DuckDB twins, so the round trip
is oracle-checked end to end.

Splitting note: a WARC blob is ``h1␣p1␣h2␣p2...`` once split on the
``\\r\\n\\r\\n`` delimiter (header block and payload alternate) — the
records are re-paired by index arithmetic instead of a lookahead
split (``(?=WARC/)``), because DuckDB's RE2 has no lookahead and the
index form is exactly mirrorable.  This assumes payloads carry no
embedded blank line (true for the single-line page text here; a
production splitter keys on Content-Length octets instead — noted in
``warc_split``'s docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\r\n\r\n"
_DATE_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_DATE_DUCK = "%Y-%m-%dT%H:%M:%SZ"


def warc_record(url: Column, warc_ts: Column, payload: Column) -> Column:
    """One WARC/1.0 response record for a page (headers + payload)."""
    return F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nWARC-Date: "),
        F.date_format(warc_ts, _DATE_SPARK),
        F.lit("\r\nContent-Length: "),
        F.length(payload).cast("string"),
        F.lit(_SEP),
        payload,
    )


def duck_warc_record(url: str, warc_ts: str, payload: str) -> str:
    return (
        f"'WARC/1.0' || chr(13)||chr(10) || 'WARC-Type: response' ||"
        f" chr(13)||chr(10) || 'WARC-Target-URI: ' || {url} ||"
        f" chr(13)||chr(10) || 'WARC-Date: ' || strftime({warc_ts}, '{_DATE_DUCK}') ||"
        f" chr(13)||chr(10) || 'Content-Length: ' || CAST(length({payload}) AS VARCHAR) ||"
        f" chr(13)||chr(10)||chr(13)||chr(10) || {payload}"
    )


def warc_files(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "text",
    per_file: int = 5,
) -> DataFrame:
    """Pack pages into multi-record WARC blobs, ``per_file`` records
    per file keyed by ``id DIV per_file``, records in id order (the
    deterministic analogue of a crawler appending to rotating .warc
    files).  One combinable shuffle on the file key."""
    rec = warc_record(F.col(url_col), F.col(ts_col), F.col(payload_col))
    keyed = df.select(
        F.expr(f"CAST({id_col} DIV {per_file} AS BIGINT)").alias("file_id"),
        F.struct(F.col(id_col).alias("i"), rec.alias("r")).alias("s"),
    )
    body = F.array_join(
        F.transform(F.array_sort(F.collect_list("s")), lambda x: x.getField("r")),
        _SEP,
    )
    return keyed.groupBy("file_id").agg(body.alias("warc"))


def warc_split(blob: Column) -> Column:
    """A multi-record WARC blob → array of record strings.  Split on
    the blank-line delimiter and re-pair (header-block, payload) by
    even/odd index — see the module docstring for why not a lookahead
    split and what a production (Content-Length-driven) splitter does
    differently."""
    parts = F.split(blob, _SEP)
    n = F.floor(F.size(parts) / 2).cast("int")
    # when(n > 0): sequence(0, -1) would DESCEND (Spark infers step -1)
    # and feed element_at(., 0), an ANSI error — empty blob → no records
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat(
                F.element_at(parts, (i * 2 + 1).cast("int")),
                F.lit(_SEP),
                F.element_at(parts, (i * 2 + 2).cast("int")),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def duck_warc_split(blob: str) -> str:
    sep = "chr(13)||chr(10)||chr(13)||chr(10)"
    parts = f"string_split({blob}, {sep})"
    return (
        f"list_transform(range(0, len({parts}) // 2),"
        f" i -> {parts}[2*i + 1] || {sep} || {parts}[2*i + 2])"
    )


def warc_parse(rec: Column) -> list[Column]:
    """Record string → (warc_version, target_uri, warc_date,
    content_length, payload, len_ok).  Missing headers parse to
    NULL/'' (``try_cast`` discipline — one malformed record in 10^12
    must not kill the job); ``len_ok`` cross-checks the declared
    Content-Length against the actual payload octets."""
    version = F.regexp_extract(rec, r"^WARC/([0-9.]+)", 1)
    uri = F.regexp_extract(rec, r"WARC-Target-URI: ([^\r\n]+)", 1)
    # try_to_timestamp: a record with a missing/garbled WARC-Date must
    # parse to NULL, not kill the job (ANSI to_timestamp('') throws)
    date = F.try_to_timestamp(
        F.regexp_extract(rec, r"WARC-Date: ([^\r\n]+)", 1), F.lit(_DATE_SPARK)
    )
    clen = F.regexp_extract(rec, r"Content-Length: ([0-9]+)", 1).try_cast("bigint")
    pos = F.instr(rec, _SEP)
    # substr length clamps at the string end, so len(rec) is a safe
    # "rest of the record" bound; pos == 0 (no blank line) → NULL payload
    payload = F.when(pos > 0, rec.substr(pos + 4, F.length(rec)))
    len_ok = F.length(payload) == clen
    return [
        version.alias("warc_version"),
        uri.alias("target_uri"),
        date.alias("warc_date"),
        clen.alias("content_length"),
        payload.alias("payload"),
        F.coalesce(len_ok, F.lit(False)).alias("len_ok"),
    ]


def warc_roundtrip(df: DataFrame, per_file: int = 5) -> DataFrame:
    """pages → WARC blobs → split → parse: the full framing round trip.
    Returns one row per record with the parsed fields and the payload
    hash (md5 keeps the compare row narrow)."""
    files = warc_files(df, per_file=per_file)
    recs = files.select(
        "file_id", F.explode(warc_split(F.col("warc"))).alias("rec")
    )
    cols = warc_parse(F.col("rec"))
    out = recs.select("file_id", *cols)
    return out.select(
        "file_id",
        "warc_version",
        "target_uri",
        "warc_date",
        "content_length",
        F.md5(F.col("payload")).alias("payload_md5"),
        "len_ok",
    )


def duck_warc_roundtrip(pages_sql: str, per_file: int = 5) -> str:
    rec = duck_warc_record("url", "warc_ts", "text")
    sep = "chr(13)||chr(10)||chr(13)||chr(10)"
    return f"""
WITH p AS ({pages_sql}),
r AS (SELECT CAST(doc_id // {per_file} AS BIGINT) AS file_id, doc_id, {rec} AS rec FROM p),
f AS (
  SELECT file_id,
    string_agg(rec, {sep} ORDER BY doc_id) AS warc
  FROM r GROUP BY file_id
),
recs AS (
  SELECT file_id, unnest({duck_warc_split('warc')}) AS rec FROM f
),
parsed AS (
  SELECT file_id,
    regexp_extract(rec, '^WARC/([0-9.]+)', 1) AS warc_version,
    regexp_extract(rec, 'WARC-Target-URI: ([^\\r\\n]+)', 1) AS target_uri,
    try_strptime(regexp_extract(rec, 'WARC-Date: ([^\\r\\n]+)', 1), '{_DATE_DUCK}') AS warc_date,
    TRY_CAST(regexp_extract(rec, 'Content-Length: ([0-9]+)', 1) AS BIGINT) AS content_length,
    CASE WHEN strpos(rec, {sep}) > 0
         THEN substring(rec, strpos(rec, {sep}) + 4) END AS payload
  FROM recs
)
SELECT file_id, warc_version, target_uri, warc_date, content_length,
  md5(payload) AS payload_md5,
  coalesce(length(payload) = content_length, false) AS len_ok
FROM parsed
"""
