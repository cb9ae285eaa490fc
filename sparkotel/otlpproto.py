"""fileexporter proto arm: OTLP logs protobuf wire-format marshal,
4-byte big-endian length framing, and the unmarshal back.

Reference semantics:
- marshaller.go:20-44 — ``format: proto`` selects ``plog.ProtoMarshaler``,
  i.e. each consumed batch is serialized as one ``LogsData`` message;
- file_writer.go:43-52 — each message is preceded by its size as an
  unsigned 32-bit BIG-ENDIAN integer (exportMessageAsBuffer);
- config.go:55-64,132-140 — the only supported compression is zstd
  (gated here behind an import-try: no zstd module ships in this
  environment, so requesting it raises with the divergence note).

Field numbers / wire types come from the PUBLIC opentelemetry-proto
definitions (opentelemetry/proto/logs/v1/logs.proto,
common/v1/common.proto, resource/v1/resource.proto).  No protobuf
runtime exists in this environment, so the encoder/decoder is a
hand-rolled proto3 wire-format implementation of exactly the subset
the engine's flat log rows carry (string-valued attributes, string
body) — zero-valued scalars are omitted like every conforming proto3
encoder, including pdata's.

Spark-first shape: one ``LogsData`` message per RESOURCE IDENTITY —
the same batchperresourceattr grouping contract as the JSON marshal
(``to_otlp_logs_json``) — so the only shuffle is the hash exchange on
the resource key that the JSON path already pays.  Byte assembly is
not SQL-expressible, so groups encode inside an Arrow-batched
``applyInPandas``; the LENGTH FRAMING, however, is a pure column
expression (``unhex(lpad(hex(octet_length(msg)), 8, '0'))`` is the
4-byte big-endian prefix), so framed output stays a projection.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# proto3 wire-format primitives (encode)
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _f_varint(field: int, v: int) -> bytes:
    return b"" if not v else _tag(field, 0) + _varint(v)


def _f_fixed64(field: int, v: int) -> bytes:
    return b"" if not v else _tag(field, 1) + struct.pack("<Q", v)


def _f_fixed32(field: int, v: int) -> bytes:
    return b"" if not v else _tag(field, 5) + struct.pack("<I", v)


def _f_bytes(field: int, v: bytes) -> bytes:
    return b"" if not v else _tag(field, 2) + _varint(len(v)) + v


def _f_str(field: int, s: str) -> bytes:
    return _f_bytes(field, s.encode("utf-8")) if s else b""


def _f_msg(field: int, payload: bytes) -> bytes:
    """Embedded message — emitted even when empty iff payload non-empty;
    callers pass b'' to omit."""
    return b"" if not payload else _tag(field, 2) + _varint(len(payload)) + payload


def _anyvalue_str(s: str) -> bytes:
    # AnyValue{string_value=1} — an EMPTY string body still encodes as
    # an AnyValue with the default string (pdata emits body only when
    # the value is set; the engine's flat rows coalesce absent → "")
    return _f_str(1, s)


def _keyvalue(k: str, v: str) -> bytes:
    # KeyValue{key=1, value=2:AnyValue}
    return _f_str(1, k) + _f_msg(2, _anyvalue_str(v))


def _kv_pair(kv) -> tuple[str, str]:
    """Arrow hands struct<key,value> to pandas as a dict or a tuple
    depending on the conversion path — accept both."""
    if isinstance(kv, dict):
        return kv["key"], kv["value"]
    return kv[0], kv[1]


def _ts_ns(ts) -> int:
    """pandas Timestamp (µs precision in the engine) → epoch nanos."""
    if ts is None or ts is pd.NaT or pd.isna(ts):
        return 0
    return int(pd.Timestamp(ts).value)


_LOGS_FLAT_DDL = (
    "ts timestamp_ntz, observed_ts timestamp_ntz, severity_number int, "
    "severity_text string, body string, attributes map<string,string>, "
    "resource map<string,string>, scope_name string, scope_version string, "
    "trace_id string, span_id string, flags int, dropped_attributes_count int"
)


def _encode_log_record(r) -> bytes:
    """LogRecord per logs.proto: time=1 fixed64, observed=11 fixed64,
    severity_number=2, severity_text=3, body=5, attributes=6,
    dropped=7, flags=8 fixed32, trace_id=9 bytes, span_id=10 bytes."""
    out = bytearray()
    out += _f_fixed64(1, _ts_ns(r["ts"]))
    out += _f_varint(2, int(r["severity_number"] or 0))
    out += _f_str(3, r["severity_text"] or "")
    out += _f_msg(5, _anyvalue_str(r["body"] or ""))
    for kv in r["_attrs"]:  # pre-sorted entries, not the raw map
        out += _f_msg(6, _keyvalue(*_kv_pair(kv)))
    out += _f_varint(7, int(r["dropped_attributes_count"] or 0))
    out += _f_fixed32(8, int(r["flags"] or 0))
    out += _f_bytes(9, bytes.fromhex(r["trace_id"] or ""))
    out += _f_bytes(10, bytes.fromhex(r["span_id"] or ""))
    out += _f_fixed64(11, _ts_ns(r["observed_ts"]))
    return bytes(out)


def _encode_scope(name: str, version: str) -> bytes:
    # InstrumentationScope{name=1, version=2}
    return _f_str(1, name) + _f_str(2, version)


def _encode_resource(entries) -> bytes:
    # Resource{attributes=1 repeated KeyValue}
    out = bytearray()
    for kv in entries:
        out += _f_msg(1, _keyvalue(*_kv_pair(kv)))
    return bytes(out)


def to_otlp_logs_proto(df: DataFrame) -> DataFrame:
    """Flat record rows (``parse_otlp_logs`` shape) → one ``msg`` binary
    per resource identity, each a full ``LogsData`` proto message.

    Grouping/ordering contract is identical to ``to_otlp_logs_json``:
    one message per resource (batchperresourceattr), scopes sorted by
    (name, version), records by (ts, span_id) — deterministic bytes.
    """
    keyed = df.withColumns(
        {
            "_res": F.array_sort(F.map_entries("resource")),
            "_attrs": F.array_sort(F.map_entries("attributes")),
            "_rkey": F.to_json(F.array_sort(F.map_entries("resource"))),
        }
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["scope_name", "scope_version", "ts", "span_id"], kind="mergesort"
        )
        res = _encode_resource(pdf.iloc[0]["_res"])
        scope_logs = bytearray()
        for (name, version), g in pdf.groupby(
            ["scope_name", "scope_version"], sort=True
        ):
            body = bytearray(_f_msg(1, _encode_scope(name, version)))
            for _, r in g.iterrows():
                body += _f_msg(2, _encode_log_record(r))
            scope_logs += _f_msg(2, bytes(body))  # ResourceLogs.scope_logs=2
        rl = _f_msg(1, res) + bytes(scope_logs)  # ResourceLogs{resource=1,...}
        msg = _f_msg(1, rl)  # LogsData{resource_logs=1}
        return pd.DataFrame({"msg": [msg]})

    return keyed.groupBy("_rkey").applyInPandas(encode, "msg binary")


def frame_messages(df: DataFrame, msg_col: str = "msg") -> DataFrame:
    """Prepend each message's size as an unsigned 32-bit big-endian int
    (file_writer.go:43-52) — a pure column expression, no Python."""
    prefix = F.unhex(F.lpad(F.hex(F.octet_length(msg_col)), 8, "0"))
    return df.select(F.concat(prefix, F.col(msg_col)).alias("frame"))


def write_otlp_proto_file(df: DataFrame, path: str, compression: str | None = None) -> int:
    """Single framed file, the reference's on-disk layout.  The
    reference's writer is a single-node appender too; at scale the
    partitioned sink (one framed file per task) is the right layout and
    this driver-side concat exists for collector-replay parity.  Only
    zstd compression exists in the reference (config.go:132-140); no
    zstd module ships here, so requesting it raises (documented
    divergence) unless one is importable."""
    opener = open
    if compression is not None:
        if compression != "zstd":
            raise ValueError("compression is not supported")  # config.go:132
        try:
            import zstandard  # noqa: F401  (absent in this environment)
        except ImportError as e:  # pragma: no cover - env-bound
            raise NotImplementedError(
                "zstd compression requires the zstandard module, which this "
                "environment does not ship (documented divergence)"
            ) from e
        opener = None  # pragma: no cover - unreachable without zstandard
    n = 0
    with opener(path, "wb") as fh:
        for row in frame_messages(df).toLocalIterator():
            fh.write(row["frame"])
            n += 1
    return n


# ---------------------------------------------------------------------------
# decode (the unmarshal back — round-trip proof + proto source arm)
# ---------------------------------------------------------------------------


def _read_varint(b: bytes, i: int) -> tuple[int, int]:
    v = s = 0
    while True:
        c = b[i]
        v |= (c & 0x7F) << s
        i += 1
        if not c & 0x80:
            return v, i
        s += 7


def _fields(b: bytes):
    """Yield (field_number, wire_type, value) over a message's bytes."""
    i = 0
    while i < len(b):
        tag, i = _read_varint(b, i)
        fnum, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(b, i)
        elif wire == 1:
            v, i = struct.unpack_from("<Q", b, i)[0], i + 8
        elif wire == 5:
            v, i = struct.unpack_from("<I", b, i)[0], i + 4
        elif wire == 2:
            ln, i = _read_varint(b, i)
            v, i = b[i : i + ln], i + ln
        else:  # pragma: no cover - groups are proto2-only
            raise ValueError(f"unsupported wire type {wire}")
        yield fnum, wire, v


def _dec_anyvalue(b: bytes) -> str:
    for f, _, v in _fields(b):
        if f == 1:
            return v.decode("utf-8")
    return ""


def _dec_kvs(msgs: list[bytes]) -> dict[str, str]:
    out: dict[str, str] = {}
    for m in msgs:
        k, val = "", ""
        for f, _, v in _fields(m):
            if f == 1:
                k = v.decode("utf-8")
            elif f == 2:
                val = _dec_anyvalue(v)
        out[k] = val
    return out


def decode_logs_data(msg: bytes) -> list[dict]:
    """One LogsData message → flat record dicts (parse_otlp_logs shape)."""
    rows: list[dict] = []
    for f_rl, _, rl in _fields(msg):
        if f_rl != 1:
            continue
        res_attrs: dict[str, str] = {}
        scope_msgs: list[bytes] = []
        for f, _, v in _fields(rl):
            if f == 1:  # Resource
                res_attrs = _dec_kvs([kv for fn, _, kv in _fields(v) if fn == 1])
            elif f == 2:
                scope_msgs.append(v)
        for sl in scope_msgs:
            scope_name = scope_version = ""
            recs: list[bytes] = []
            for f, _, v in _fields(sl):
                if f == 1:
                    for fn, _, sv in _fields(v):
                        if fn == 1:
                            scope_name = sv.decode("utf-8")
                        elif fn == 2:
                            scope_version = sv.decode("utf-8")
                elif f == 2:
                    recs.append(v)
            for rec in recs:
                r = {
                    "ts": None,
                    "observed_ts": None,
                    "severity_number": 0,
                    "severity_text": "",
                    "body": "",
                    "attributes": {},
                    "resource": res_attrs,
                    "scope_name": scope_name,
                    "scope_version": scope_version,
                    "trace_id": "",
                    "span_id": "",
                    "flags": 0,
                    "dropped_attributes_count": 0,
                }
                attr_msgs: list[bytes] = []
                for f, _, v in _fields(rec):
                    if f == 1:
                        r["ts"] = pd.Timestamp(v // 1000, unit="us")
                    elif f == 11:
                        r["observed_ts"] = pd.Timestamp(v // 1000, unit="us")
                    elif f == 2:
                        r["severity_number"] = v
                    elif f == 3:
                        r["severity_text"] = v.decode("utf-8")
                    elif f == 5:
                        r["body"] = _dec_anyvalue(v)
                    elif f == 6:
                        attr_msgs.append(v)
                    elif f == 7:
                        r["dropped_attributes_count"] = v
                    elif f == 8:
                        r["flags"] = v
                    elif f == 9:
                        r["trace_id"] = v.hex()
                    elif f == 10:
                        r["span_id"] = v.hex()
                r["attributes"] = _dec_kvs(attr_msgs)
                rows.append(r)
    return rows


def parse_otlp_proto_logs(df: DataFrame, frame_col: str = "frame") -> DataFrame:
    """Framed proto messages → one row per log record, the proto twin of
    ``parse_otlp_logs`` (identical output schema).  Frame = 4-byte BE
    size prefix + LogsData; a short/corrupt frame raises (the
    reference's unmarshal errors the batch, it does not skip)."""

    def gen(batches):
        for pdf in batches:
            rows: list[dict] = []
            for buf in pdf[frame_col]:
                b = bytes(buf)
                n = struct.unpack(">I", b[:4])[0]
                if n != len(b) - 4:
                    raise ValueError(f"framing: declared {n}, got {len(b) - 4}")
                rows.extend(decode_logs_data(b[4:]))
            yield pd.DataFrame(
                rows,
                columns=[
                    "ts", "observed_ts", "severity_number", "severity_text",
                    "body", "attributes", "resource", "scope_name",
                    "scope_version", "trace_id", "span_id", "flags",
                    "dropped_attributes_count",
                ],
            )

    return df.mapInPandas(gen, _LOGS_FLAT_DDL)
