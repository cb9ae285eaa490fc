"""Pure-Python row-at-a-time reference implementation (test oracle).

Mirrors the reference's per-record execution model (stanza
ParserOperator.ProcessBatch is a loop over single-entry Process —
/root/reference/pkg/stanza/operator/helper/transformer.go:81-87) so the
vectorized Spark stages can be differential-tested row by row:
byte-identical extracted text per url (BASELINE.json input_hint).

Must stay arithmetically identical to sparkotel.pages (the SQL
generator) — tests/test_differential.py enforces it.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

LOG_RE = re.compile(
    r'^(?P<ip>\S+) - (?P<user>\S+) \[(?P<ts_str>[^\]]+)\] '
    r'"(?P<method>\S+) (?P<path>\S+) HTTP/1\.1" (?P<status>\d+) (?P<nbytes>\d+)'
)

_BASE = datetime(2024, 3, 15, 0, 0, 0)
_COUNTRIES = ["US", "DE", "FR", "JP", "GB", "BR", "IN", "CN", "ES", "NL"]


def py_page(doc_id: int, doc_text: str, lang: str) -> dict:
    """One synthetic page row — the python twin of pages._tmpl()."""
    m10 = doc_id % 10
    host_id = 0 if m10 < 2 else 1 if m10 < 4 else 2 if m10 == 4 else 3 + doc_id % 197
    host = f"h{host_id}.example.com"
    path = f"/d/{doc_id}/{doc_id % 7}"
    ip_id = doc_id % 500
    ip = f"10.0.{ip_id // 250}.{ip_id % 250}"
    user = "frank" if doc_id % 17 == 0 else "alice" if doc_id % 17 == 1 else "-"
    method = "GET" if m10 < 7 else "POST" if m10 < 9 else "HEAD"
    m20 = doc_id % 20
    status = (
        200 if m20 < 12 else 301 if m20 < 14 else 304 if m20 == 14
        else 404 if m20 < 17 else 403 if m20 == 17 else 500 if m20 == 18 else 503
    )
    nbytes = (doc_id * 37) % 10000
    off = doc_id % 86400
    ts_str = f"15/Mar/2024:{off // 3600:02d}:{off % 3600 // 60:02d}:{off % 60:02d} +0000"
    if doc_id % 33 == 0:
        logline = f"MALFORMED {doc_id}"
    else:
        logline = f'{ip} - {user} [{ts_str}] "{method} {path} HTTP/1.1" {status} {nbytes}'
    return {
        "url": f"https://{host}{path}",
        "warc_ts": _BASE + timedelta(seconds=off),
        "text": logline + "\n" + doc_text,
        "lang": lang,
        "host": host,
        "doc_id": doc_id,
    }


def py_parse(page: dict) -> dict:
    """regex_parser + severity + time, row-at-a-time (on_error=send)."""
    line1 = page["text"].split("\n", 1)[0]
    m = LOG_RE.search(line1)
    out = dict(page)
    out["_error"] = m is None
    for g in ("ip", "user", "ts_str", "method", "path", "status", "nbytes"):
        out[g] = m.group(g) if m else None
    if m:
        out["status"] = int(out["status"])
        out["nbytes"] = int(out["nbytes"])
        out["user"] = None if out["user"] == "-" else out["user"]
        out["log_ts"] = datetime.strptime(out["ts_str"].split(" ")[0], "%d/%b/%Y:%H:%M:%S")
    else:
        out["log_ts"] = None
    s = out["status"]
    out["severity_text"] = (
        "error" if s is not None and 500 <= s < 600
        else "warn" if s is not None and 400 <= s < 500
        else "info" if s is not None and 200 <= s < 400
        else "default"
    )
    out["severity_number"] = {"error": 17, "warn": 13, "info": 9}.get(out["severity_text"], 0)
    return out


def py_geo(ip_id: int) -> dict | None:
    if ip_id % 10 == 7:
        return None
    return {
        "ip": f"10.0.{ip_id // 250}.{ip_id % 250}",
        "geo_country": _COUNTRIES[ip_id % 10],
        "geo_city": f"city{ip_id % 50}",
        "geo_lat": (ip_id % 180) - 90 + 0.25,
        "geo_lon": (ip_id % 360) - 180 + 0.5,
    }


def py_route(parsed: dict, geo_country: str) -> str:
    s = parsed["status"]
    if parsed["lang"] == "en" and s is not None and s >= 500:
        return "errors_en"
    if s is not None and s >= 400:
        return "errors_other"
    return "other"


# ---------------------------------------------------------------------------
# html synthesis + main-content extraction twins (north-rule invariant:
# byte-identical extracted text per url).  Patterns are imported from
# functions/htmltext.py so the twins cannot drift from the Spark chain.
# ---------------------------------------------------------------------------


def py_html(page: dict) -> str:
    """Python twin of pages.html_body_expr() — the page's html string."""
    esc = (
        page["text"].replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )
    return (
        f"<!DOCTYPE html><html><head><title>{page['url']}</title>"
        "<style>body{margin:0;font:14px sans-serif}</style>"
        '<script>if(1<2&&init){track("&")}</script>'
        f"</head><body><!-- crawl snapshot --><h1>{page['host']}</h1>"
        '<nav><a href="/">home</a> <a href="/about">about</a></nav>'
        f"<p>{esc}</p>"
        f"<footer>&copy; {page['host']} &amp; co</footer></body></html>"
    )


def py_extract_text(html: str) -> str:
    """Row-at-a-time twin of functions.htmltext.main_text."""
    from sparkotel.functions import htmltext as H

    s = re.sub(H.SCRIPT_RE, "", html)
    s = re.sub(H.STYLE_RE, "", s)
    s = re.sub(H.COMMENT_RE, "", s)
    t = "\n".join(m.group(1) for m in re.finditer(H.PARA_RE, s))
    t = re.sub(H.TAG_RE, "", t)
    for ent, ch in H.ENTITIES:
        t = t.replace(ent, ch)
    return t
