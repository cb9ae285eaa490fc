"""set_semconv_span_name — mirrors the reference's test table
(func_set_semconv_span_name_test.go:88-430)."""

from __future__ import annotations

import pytest

from sparkotel.operators.spanfuncs import set_semconv_span_name

_DDL = "name string, kind int, attributes map<string,string>"

SERVER, CLIENT, PRODUCER, CONSUMER = 2, 3, 4, 5

# (case id, current name, kind, attrs, want)
_CASES = [
    ("http-server-method-route", "GET /users/123", SERVER,
     {"http.request.method": "GET", "http.route": "/users/:id"}, "GET /users/:id"),
    ("http-server-deprecated-method", "GET /users/123", SERVER,
     {"http.method": "GET", "http.route": "/users/:id"}, "GET /users/:id"),
    ("http-server-method-only", "GET /users/123", SERVER,
     {"http.request.method": "GET"}, "GET"),
    ("http-server-deprecated-method-only", "GET /users/123", SERVER,
     {"http.method": "GET"}, "GET"),
    ("nextjs-54694", "GET /app/workspaces/7?_rsc=hn5g2", SERVER,
     {"http.method": "GET", "next.span_name": "GET /app/workspaces/7?_rsc=hn5g2",
      "next.span_type": "BaseServer.handleRequest",
      "http.target": "/app/workspaces/7?_rsc=hn5g2", "http.status": "200"}, "GET"),
    ("pyramid-1914", "GET /resource/9ea43cd7", SERVER,
     {"http.method": "GET", "http.target": "/resource/9ea43cd7"}, "GET"),
    ("http-client-method-template", "GET /users/123", CLIENT,
     {"http.request.method": "GET", "url.template": "/users/:id"}, "GET /users/:id"),
    ("http-client-deprecated", "GET /users/123", CLIENT,
     {"http.method": "GET", "url.template": "/users/:id"}, "GET /users/:id"),
    ("http-client-method-only", "GET /users/123", CLIENT,
     {"http.request.method": "GET"}, "GET"),
    ("no-semconv-attrs", "GET /users/123", CLIENT,
     {"some_attribute": "some_value"}, "GET /users/123"),
    # DB client spans (test lines 225-272)
    ("db-postgres", "INSERT webshop.orders", CLIENT,
     {"db.system.name": "postgresql", "db.namespace": "webshop",
      "db.operation.name": "INSERT", "db.collection.name": "orders",
      "db.query.text": "insert into orders (date_created,status) values (?,?)"},
     "INSERT webshop.orders"),
    ("db-redis-server-address", "HGET", CLIENT,
     {"db.redis.database_index": "0", "db.redis.flags": "None",
      "db.statement": "HGET 7175d9c6", "db.system": "redis",
      "server.address": "valkey-cart"}, "valkey-cart"),
    ("db-deprecated-name", "otel", CLIENT,
     {"db.system": "postgresql", "db.connection_id": "54",
      "db.connection_string": "Host=postgresql;Username=otelu;Database=otel",
      "db.name": "otel", "db.statement": "SELECT 1", "db.user": "otelu"}, "otel"),
    # RPC spans (test lines 277-301)
    ("rpc-grpc-server", "oteldemo.CartService/GetCart", SERVER,
     {"rpc.grpc.status_code": "0", "rpc.grpc.method": "GetCart",
      "rpc.grpc.service": "oteldemo.CartService", "rpc.system": "grpc",
      "server.address": "127.18.0.18"}, "oteldemo.CartService/GetCart"),
    ("rpc-grpc-client", "oteldemo.AdService/GetAds", CLIENT,
     {"rpc.grpc.status_code": "0", "rpc.grpc.method": "GetAds",
      "rpc.grpc.service": "oteldemo.AdService", "rpc.system": "grpc",
      "server.address": "ad"}, "oteldemo.AdService/GetAds"),
    # Messaging (test lines 305-430)
    ("kafka-consumer-receive", "orders receive", CONSUMER,
     {"messaging.client_id": "rdkafka#consumer-1",
      "messaging.destination.name": "orders",
      "messaging.kafka.consumer.group": "accounting",
      "messaging.kafka.destination.partition": "0",
      "messaging.operation": "receive", "messaging.system": "kafka"},
     "receive orders"),
    ("kafka-consumer-process", "orders process", CONSUMER,
     {"messaging.client_id": "consumer-fraud-detection-1",
      "messaging.destination.name": "orders",
      "messaging.destination.partition.id": "0",
      "messaging.operation": "process", "messaging.system": "kafka"},
     "process orders"),
    ("kafka-producer-publish", "orders publish", PRODUCER,
     {"messaging.destination.name": "orders",
      "messaging.kafka.producer.success": "true",
      "messaging.operation": "publish", "messaging.system": "kafka"},
     "publish orders"),
    ("client-messaging", "receive orders", CLIENT,
     {"messaging.destination.name": "orders", "messaging.operation": "receive",
      "messaging.system": "kafka"}, "receive orders"),
    ("server-messaging", "process orders", SERVER,
     {"messaging.destination.name": "orders", "messaging.operation": "process",
      "messaging.system": "kafka"}, "process orders"),
    ("rabbitmq-exchange", "process ecommerce-exchange", CONSUMER,
     {"messaging.system": "rabbitmq",
      "messaging.destination.name": "ecommerce-exchange",
      "messaging.operation": "process",
      "messaging.rabbitmq.destination.routing_key": "queue.order"},
     "process ecommerce-exchange"),
    # temporary/anonymous destination markers
    ("msg-temporary-dest", "send", PRODUCER,
     {"messaging.system": "kafka", "messaging.operation.name": "send",
      "messaging.destination.temporary": "true",
      "messaging.destination.name": "q1"}, "send (temporary)"),
    ("msg-anonymous-dest", "send", PRODUCER,
     {"messaging.system": "kafka", "messaging.operation.name": "send",
      "messaging.destination.anonymous": "true"}, "send (anonymous)"),
    # internal span (kind 1): untouched
    ("internal-untouched", "do-work", 1,
     {"http.request.method": "GET"}, "do-work"),
]


@pytest.mark.parametrize("cid,cur,kind,attrs,want", _CASES, ids=[c[0] for c in _CASES])
def test_reference_vectors(spark, cid, cur, kind, attrs, want):
    df = spark.createDataFrame([(cur, kind, attrs)], _DDL)
    out = set_semconv_span_name(df, "1.40.0").collect()
    assert out[0]["name"] == want


def test_original_span_name_attribute(spark):
    df = spark.createDataFrame(
        [
            ("GET /users/123", SERVER, {"http.request.method": "GET",
                                        "http.route": "/users/:id"}),
            ("unchanged", 1, {"a": "b"}),
        ],
        _DDL,
    )
    out = {r["name"]: r for r in
           set_semconv_span_name(df, "1.38.0", "original_name").collect()}
    assert out["GET /users/:id"]["attributes"]["original_name"] == "GET /users/123"
    # unchanged span: no attribute added
    assert "original_name" not in out["unchanged"]["attributes"]


def test_version_validation(spark):
    df = spark.createDataFrame([("n", 1, {})], _DDL)
    for bad in ("1.36.0", "1.41.0"):
        with pytest.raises(ValueError, match="unsupported semconv version"):
            set_semconv_span_name(df, bad)
    with pytest.raises(ValueError, match="failed to parse"):
        set_semconv_span_name(df, "not-a-version")
    with pytest.raises(ValueError, match="cannot be an empty string"):
        set_semconv_span_name(df, "1.40.0", "")
