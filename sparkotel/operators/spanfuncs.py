"""transformprocessor trace-context functions (ottlspan editors).

``set_semconv_span_name`` re-derives span names from semantic-convention
attributes (processor/transformprocessor/internal/traces/
func_set_semconv_span_name.go), over the engine's canonical span frame
(``parse_otlp_traces`` output: name, kind, attributes map).  Every rule
is a ``when/coalesce`` chain over map lookups — one codegen projection,
zero shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# semver window the factory accepts (func_set_semconv_span_name.go:20-23)
_MIN_SEMCONV = (1, 37, 0)
_MAX_SEMCONV = (1, 40, 0)

# ptrace.SpanKind values (OTLP proto)
_SERVER, _CLIENT, _PRODUCER, _CONSUMER = 2, 3, 4, 5


def _av(key: str, alias: str | None = None) -> Column:
    """attributeValue: current semconv key, falling back to the
    deprecated alias (func_set_semconv_span_name.go:259-269)."""
    a = F.col("attributes")
    return F.coalesce(a[key], a[alias]) if alias else a[key]


def _http(subject_key: str) -> Column:
    """HTTP span name: ``<method> <subject>`` or bare method
    (httpSpanName, lines 121-130)."""
    method = _av("http.request.method", "http.method")
    subject = F.col("attributes")[subject_key]
    return F.when(
        method.isNotNull(),
        F.when(subject.isNotNull(), F.concat(method, F.lit(" "), subject)).otherwise(
            method
        ),
    )


def _rpc() -> Column:
    """RPC span name: service/method, method, service/*, or system
    (rpcSpanName, lines 132-149)."""
    system = _av("rpc.system.name", "rpc.system")
    method = _av("rpc.method", "rpc.grpc.method")
    service = _av("rpc.service", "rpc.grpc.service")
    return F.when(
        system.isNotNull(),
        F.when(
            method.isNotNull() & service.isNotNull(),
            F.concat(service, F.lit("/"), method),
        )
        .when(method.isNotNull(), method)
        .when(service.isNotNull(), F.concat(service, F.lit("/*")))
        .otherwise(system),
    )


def _server_addr() -> Column:
    addr = F.col("attributes")["server.address"]
    port = F.col("attributes")["server.port"]
    return F.when(
        addr.isNotNull(),
        F.when(port.isNotNull(), F.concat(addr, F.lit(":"), port)).otherwise(addr),
    )


def _db_target() -> Column:
    """databaseTarget: namespace[.collection|.stored_procedure] or
    server address (lines 178-209)."""
    ns = _av("db.namespace", "db.name")
    coll = F.col("attributes")["db.collection.name"]
    sp = F.col("attributes")["db.stored_procedure.name"]

    def dotted(part: Column) -> Column:
        return F.when(ns.isNotNull(), F.concat(ns, F.lit("."), part)).otherwise(part)

    return (
        F.when(coll.isNotNull(), dotted(coll))
        .when(sp.isNotNull(), dotted(sp))
        .when(ns.isNotNull(), ns)
        .otherwise(_server_addr())
    )


def _db() -> Column:
    """DB span name: query summary, ``<op> <target>``, op, target, or
    system (dbSpanName, lines 151-176)."""
    system = _av("db.system.name", "db.system")
    summary = F.col("attributes")["db.query.summary"]
    op = _av("db.operation.name", "db.operation")
    target = _db_target()
    return F.when(
        system.isNotNull(),
        F.when(summary.isNotNull(), summary)
        .when(op.isNotNull() & target.isNotNull(), F.concat(op, F.lit(" "), target))
        .when(op.isNotNull(), op)
        .when(target.isNotNull(), target)
        .otherwise(system),
    )


def _messaging_destination() -> Column:
    """(temporary)/(anonymous) markers, template, name, or server
    address (messagingDestination, lines 230-257)."""
    a = F.col("attributes")
    return (
        F.when(a["messaging.destination.temporary"] == "true", F.lit("(temporary)"))
        .when(a["messaging.destination.anonymous"] == "true", F.lit("(anonymous)"))
        .when(
            a["messaging.destination.template"].isNotNull(),
            a["messaging.destination.template"],
        )
        .when(
            _av("messaging.destination.name", "messaging.destination").isNotNull(),
            _av("messaging.destination.name", "messaging.destination"),
        )
        .otherwise(_server_addr())
    )


def _messaging() -> Column:
    """Messaging span name: ``<op> <destination>``, destination, op, or
    system (messagingSpanName, lines 211-228)."""
    system = F.col("attributes")["messaging.system"]
    op = _av("messaging.operation.name", "messaging.operation")
    dest = _messaging_destination()
    return F.when(
        system.isNotNull(),
        F.when(op.isNotNull() & dest.isNotNull(), F.concat(op, F.lit(" "), dest))
        .when(dest.isNotNull(), dest)
        .when(op.isNotNull(), op)
        .otherwise(system),
    )


def set_semconv_span_name(
    df: DataFrame,
    semconv_version: str,
    original_span_name_attribute: str | None = None,
) -> DataFrame:
    """``set_semconv_span_name(version, originalSpanNameAttribute)`` —
    rewrite span names per the semantic conventions: server spans try
    HTTP(http.route) → RPC → messaging, client spans HTTP(url.template)
    → RPC → DB → messaging, producer/consumer spans messaging; spans no
    rule matches keep their name (deriveSemconvSpanName, lines 73-119).
    When the optional attribute name is given and the name changed, the
    original lands there (setSemconvSpanName, lines 63-71)."""
    try:
        parts = tuple(int(p) for p in semconv_version.split("."))
        if len(parts) != 3:
            raise ValueError
    except ValueError:
        raise ValueError(f"failed to parse semconv version {semconv_version!r}")
    if not _MIN_SEMCONV <= parts <= _MAX_SEMCONV:
        raise ValueError(
            f"unsupported semconv version {semconv_version!r}: must be between "
            f"{'.'.join(map(str, _MIN_SEMCONV))} and {'.'.join(map(str, _MAX_SEMCONV))}"
        )
    if original_span_name_attribute == "":
        raise ValueError("originalSpanNameAttribute cannot be an empty string")

    kind = F.col("kind")
    # stage each convention's candidate in its own column: the combined
    # expression otherwise exceeds the JVM method-size limit and drops
    # the whole projection out of whole-stage codegen
    staged = df.withColumns(
        {
            "_sc_http_srv": _http("http.route"),
            "_sc_http_cli": _http("url.template"),
            "_sc_rpc": _rpc(),
            "_sc_db": _db(),
            "_sc_msg": _messaging(),
        }
    )
    derived = (
        F.when(
            kind == _SERVER,
            F.coalesce("_sc_http_srv", "_sc_rpc", "_sc_msg"),
        )
        .when(kind == _CONSUMER, F.col("_sc_msg"))
        .when(
            kind == _CLIENT,
            F.coalesce("_sc_http_cli", "_sc_rpc", "_sc_db", "_sc_msg"),
        )
        .when(kind == _PRODUCER, F.col("_sc_msg"))
    )
    # stage the new name in a temp column so the attribute rewrite below
    # still reads the ORIGINAL attributes/name
    out = staged.withColumn("_semconv_name", F.coalesce(derived, F.col("name"))).drop(
        "_sc_http_srv", "_sc_http_cli", "_sc_rpc", "_sc_db", "_sc_msg"
    )
    if original_span_name_attribute:
        out = out.withColumn(
            "attributes",
            F.when(
                F.col("_semconv_name") != F.col("name"),
                F.map_concat(
                    F.map_filter(
                        "attributes",
                        lambda k, _: k != original_span_name_attribute,
                    ),
                    F.map_from_arrays(
                        F.array(F.lit(original_span_name_attribute)),
                        F.array(F.col("name")),
                    ),
                ),
            ).otherwise(F.col("attributes")),
        )
    return out.withColumn("name", F.col("_semconv_name")).drop("_semconv_name")
