"""Arrow-batched pandas-UDF implementations of the OTTL converters whose
semantics genuinely need Python (exact non-JVM hash algorithms, Go
duration parsing, generic XML manipulation, CommunityID flow hashing,
multi-encoding Decode).

Everything else in the converter registry stays native
(pyspark.sql.functions, whole-stage codegen); these functions are the
documented slow path of SURVEY §2.14 and never appear in the flagship
parse pipeline.

Reference semantics:
- hashes: pkg/ottl/ottlfuncs/func_murmur3_hash.go, func_murmur3_hash128.go,
  func_fnv.go, func_xxh3.go, func_xxh128.go (exact, see
  sparkotel.functions.exacthash);
- Decode: func_decode.go (base64 family + text encodings);
- Duration: func_duration.go (Go time.ParseDuration grammar);
- CommunityID: func_community_id.go (v1 flow hash, RFC-draft spec);
- XML family: func_parse_xml.go, func_parse_simplified_xml.go,
  func_get_xml.go, func_remove_xml.go, func_insert_xml.go,
  func_convert_text_to_elements_xml.go,
  func_convert_attributes_to_elements_xml.go — implemented over the
  stdlib ElementTree XPath subset (//tag, tag/sub, [@attr] forms).
"""

from __future__ import annotations

import base64
import codecs
import hashlib
import json
import re
import socket
import struct
import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, MapType, StringType

from sparkotel.functions import exacthash as XH


def _series_udf(fn, ret):
    @F.pandas_udf(ret)
    def udf(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else fn(v))

    return udf


# -- exact hashes ------------------------------------------------------------

murmur3_hash = _series_udf(XH.murmur3_32_hex, StringType())
murmur3_hash128 = _series_udf(XH.murmur3_128_hex, StringType())
fnv_hash = _series_udf(XH.fnv1a_64_signed, LongType())
xxh3_hash = _series_udf(XH.xxh3_64_hex, StringType())
xxh128_hash = _series_udf(XH.xxh3_128_hex, StringType())


# -- Decode ------------------------------------------------------------------

_B64 = {
    "base64": lambda s: base64.b64decode(s),
    "base64-raw": lambda s: base64.b64decode(s + "=" * (-len(s) % 4)),
    "base64-url": lambda s: base64.urlsafe_b64decode(s),
    "base64-raw-url": lambda s: base64.urlsafe_b64decode(s + "=" * (-len(s) % 4)),
}


def _decode(value: str, encoding: str) -> str:
    if encoding in _B64:
        return _B64[encoding](value).decode("utf-8", errors="replace")
    data = value.encode("latin-1") if isinstance(value, str) else value
    return codecs.decode(data, encoding)


def decode_udf(col: Column, encoding: str) -> Column:
    return _series_udf(lambda v: _decode(v, encoding), StringType())(col)


@F.pandas_udf(StringType())
def decode_dyn_udf(col: pd.Series, encoding: pd.Series) -> pd.Series:
    """Decode with a runtime encoding argument (func_decode.go: the
    encoding getter is evaluated per row)."""
    return pd.Series(
        [None if v is None else _decode(v, e) for v, e in zip(col, encoding)]
    )


# -- Duration (Go time.ParseDuration grammar) --------------------------------

_DUR_UNITS = {"ns": 1e-9, "us": 1e-6, "µs": 1e-6, "ms": 1e-3, "s": 1.0, "m": 60.0, "h": 3600.0}
_DUR_RE = re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")


def parse_go_duration(s: str) -> float:
    """'1h2m3.5s' → seconds.  Mirrors time.ParseDuration (zero '0' ok)."""
    s = s.strip()
    neg = s.startswith("-")
    if s and s[0] in "+-":
        s = s[1:]
    if s == "0":
        return 0.0
    total, pos = 0.0, 0
    for m in _DUR_RE.finditer(s):
        if m.start() != pos:
            raise ValueError(f"invalid duration {s!r}")
        total += float(m.group(1)) * _DUR_UNITS[m.group(2)]
        pos = m.end()
    if pos != len(s) or pos == 0:
        raise ValueError(f"invalid duration {s!r}")
    return -total if neg else total


duration_seconds = _series_udf(parse_go_duration, DoubleType())


# -- CommunityID (v1) --------------------------------------------------------

# protocol-name table (func_community_id.go communityIDProtocols)
CID_PROTOCOLS = {"ICMP": 1, "TCP": 6, "UDP": 17, "RSVP": 46, "ICMP6": 58, "SCTP": 132}


def _ip_bytes(ip: str) -> bytes:
    if ":" in ip:
        return socket.inet_pton(socket.AF_INET6, ip)
    return socket.inet_aton(ip)


def community_id_v1(
    src_ip: str, dst_ip: str, src_port: int, dst_port: int, proto: int, seed: int = 0
) -> str:
    """'1:<base64(sha1(seed . ip1 . ip2 . proto . 0 . port1 . port2))>'
    with the (ip, port) pair ordered so the flow is direction-neutral
    (func_community_id.go normalize + compute; v4 before v6, bytewise)."""
    sip, dip = _ip_bytes(src_ip), _ip_bytes(dst_ip)
    sp, dp = int(src_port), int(dst_port)
    swap = (
        len(sip) > len(dip)
        if len(sip) != len(dip)
        else (sip > dip or (sip == dip and sp > dp))
    )
    if swap:
        sip, dip, sp, dp = dip, sip, dp, sp
    data = (
        struct.pack("!H", seed)
        + sip
        + dip
        + struct.pack("!BBHH", proto, 0, sp, dp)
    )
    return "1:" + base64.b64encode(hashlib.sha1(data).digest()).decode()


def community_id_udf(
    src_ip: Column,
    src_port: Column,
    dst_ip: Column,
    dst_port: Column,
    protocol: str = "TCP",
    seed: int = 0,
) -> Column:
    proto = CID_PROTOCOLS[protocol]

    @F.pandas_udf(StringType())
    def udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if si is None
                else community_id_v1(si, di, sp, dp, proto, seed)
                for si, sp, di, dp in zip(a, b, c, d)
            ]
        )

    return udf(src_ip, src_port, dst_ip, dst_port)


# -- XML family (ElementTree XPath subset) -----------------------------------

def _xml_to_obj(el: ET.Element) -> dict:
    """ParseXML shape (func_parse_xml.go): tag, attributes, content,
    children — serialized to JSON so the result stays one typed column."""
    out: dict = {"tag": el.tag}
    if el.attrib:
        out["attributes"] = dict(el.attrib)
    text = (el.text or "").strip()
    if text:
        out["content"] = text
    kids = [_xml_to_obj(c) for c in el]
    if kids:
        out["children"] = kids
    return out


def parse_xml_json(s: str) -> str:
    return json.dumps(_xml_to_obj(ET.fromstring(s)), sort_keys=True)


def _simplified(el: ET.Element, out: dict, prefix: str = "") -> None:
    """ParseSimplifiedXML: flattened element text by dotted tag path;
    attributes dropped (func_parse_simplified_xml.go)."""
    path = f"{prefix}.{el.tag}" if prefix else el.tag
    text = (el.text or "").strip()
    if text and len(el) == 0:
        out[path] = text
    for c in el:
        _simplified(c, out, path)


def parse_simplified_xml(s: str) -> dict:
    out: dict = {}
    _simplified(ET.fromstring(s), out)
    return out


def _tostr(el: ET.Element) -> str:
    # short_empty_elements=False: emptied elements serialize as
    # <a></a>, matching the Go xml encoder the reference uses
    return ET.tostring(el, encoding="unicode", short_empty_elements=False)


def _findall(root: ET.Element, xpath: str) -> list:
    """ElementTree XPath with absolute-path support: '/root', '/root/x',
    '/root//x' select from the document root like the reference's
    antchfx xpath does."""
    if xpath.startswith("//"):
        return root.findall("." + xpath)
    if xpath.startswith("/"):
        head, _, rest = xpath[1:].partition("/")
        if head != root.tag:
            return []
        if not rest:
            return [root]
        return root.findall(".//" + rest[1:] if rest.startswith("/") else rest)
    return root.findall(xpath)


def get_xml(s: str, xpath: str) -> str:
    """GetXML returns the matched nodes' serialized XML, concatenated
    (func_get_xml.go)."""
    root = ET.fromstring(s)
    return "".join(_tostr(m).strip() for m in _findall(root, xpath))


def remove_xml(s: str, xpath: str) -> str:
    root = ET.fromstring(s)
    doomed = set(map(id, _findall(root, xpath)))
    for parent in root.iter():
        for child in list(parent):
            if id(child) in doomed:
                parent.remove(child)
    return _tostr(root)


def insert_xml(s: str, xpath: str, sub: str) -> str:
    root = ET.fromstring(s)
    node = ET.fromstring(sub)
    for t in _findall(root, xpath):
        t.append(node)
    return _tostr(root)


def convert_attributes_to_elements_xml(s: str) -> str:
    root = ET.fromstring(s)
    for el in root.iter():
        for k in sorted(el.attrib):
            child = ET.Element(k)
            child.text = el.attrib[k]
            el.insert(0, child)
        el.attrib.clear()
    return _tostr(root)


def convert_text_to_elements_xml(
    s: str, xpath: str = "/", element_name: str = "value"
) -> str:
    """func_convert_text_to_elements_xml.go: within each xpath-selected
    subtree, wrap extraneous text nodes in <element_name> children — a
    node's text wraps only when it has >0 text chunks AND (elements +
    texts) > 1.  Accepts multi-root fragments like the reference's
    parseNodesXML."""
    wrapper = ET.fromstring(f"<__sparkotel__>{s}</__sparkotel__>")

    def process(el: ET.Element) -> None:
        for ch in list(el):
            process(ch)
        texts = (1 if (el.text or "").strip() else 0) + sum(
            1 for ch in el if (ch.tail or "").strip()
        )
        if texts == 0 or len(el) + texts <= 1:
            return
        if (el.text or "").strip():
            node = ET.Element(element_name)
            node.text = el.text
            el.insert(0, node)
            el.text = None
        for ch in list(el):
            if (ch.tail or "").strip():
                node = ET.Element(element_name)
                node.text = ch.tail
                ch.tail = None
                el.insert(list(el).index(ch) + 1, node)

    if xpath in ("/", ""):
        process(wrapper)
    else:
        # absolute paths resolve against the synthetic fragment wrapper
        if xpath.startswith("//"):
            nodes = wrapper.findall("." + xpath)
        elif xpath.startswith("/"):
            nodes = wrapper.findall(xpath[1:])
        else:
            nodes = wrapper.findall(xpath)
        for n in nodes:
            process(n)
    out = _tostr(wrapper)
    return out[len("<__sparkotel__>"):-len("</__sparkotel__>")]


parse_xml_udf = _series_udf(parse_xml_json, StringType())
parse_simplified_xml_udf = _series_udf(
    parse_simplified_xml, MapType(StringType(), StringType())
)
convert_attrs_xml_udf = _series_udf(convert_attributes_to_elements_xml, StringType())


def get_xml_udf(col: Column, xpath: str) -> Column:
    return _series_udf(lambda v: get_xml(v, xpath), StringType())(col)


def remove_xml_udf(col: Column, xpath: str) -> Column:
    return _series_udf(lambda v: remove_xml(v, xpath), StringType())(col)


def insert_xml_udf(col: Column, xpath: str, sub: str) -> Column:
    return _series_udf(lambda v: insert_xml(v, xpath, sub), StringType())(col)


def convert_text_xml_udf(
    col: Column, xpath: str = "/", element_name: str = "value"
) -> Column:
    return _series_udf(
        lambda v: convert_text_to_elements_xml(v, xpath, element_name), StringType()
    )(col)
