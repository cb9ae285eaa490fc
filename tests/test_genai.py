"""GenAI normalizer — mirrors processor/genainormalizerprocessor's
processor_test.go and internal/openinference/messages_test.go semantics
over the string-attribute-map frame."""

from __future__ import annotations

import json

import pytest

from sparkotel.operators.genai import SCHEMA_URL, genai_normalizer

_DDL = "name string, attributes map<string,string>"


def _run(spark, attrs, sources, schema_url=None):
    if schema_url is None:
        df = spark.createDataFrame([("s", attrs)], _DDL)
    else:
        df = spark.createDataFrame(
            [("s", attrs, schema_url)], _DDL + ", schema_url string"
        )
    return genai_normalizer(df, sources).collect()[0]


def test_openinference_end_to_end(spark):
    # TestNormalize_OpenInferenceEndToEnd (processor_test.go:544-597)
    r = _run(
        spark,
        {
            "llm.token_count.prompt": "100",
            "llm.token_count.completion": "20",
            "llm.model_name": "gpt-4",
            "llm.provider": "anthropic",
            "openinference.span.kind": "LLM",
            "session.id": "sess-1",
            "agent.name": "helper",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    a = r["attributes"]
    assert a["gen_ai.usage.input_tokens"] == "100"
    assert a["gen_ai.usage.output_tokens"] == "20"
    assert a["gen_ai.request.model"] == "gpt-4"
    assert a["gen_ai.provider.name"] == "anthropic"
    assert a["gen_ai.operation.name"] == "chat"
    assert a["gen_ai.conversation.id"] == "sess-1"
    assert a["gen_ai.agent.name"] == "helper"
    assert "llm.model_name" not in a  # originals removed
    assert r["schema_url"] == SCHEMA_URL


def test_openinference_span_kind_folding(spark):
    # valuemappings.go: case-insensitive span-kind → operation-name enum
    for kind, want in [
        ("LLM", "chat"), ("EMBEDDING", "embeddings"), ("CHAIN", "invoke_agent"),
        ("RETRIEVER", "retrieval"), ("RERANKER", "retrieval"),
        ("TOOL", "execute_tool"), ("AGENT", "invoke_agent"),
        ("PROMPT", "text_completion"), ("something_else", "something_else"),
    ]:
        r = _run(spark, {"openinference.span.kind": kind},
                 [{"name": "openinference"}])
        assert r["attributes"]["gen_ai.operation.name"] == want, kind


def test_openllmetry_finish_reason_wraps_to_slice(spark):
    # TestNormalize_OpenLLMetry_FinishReasonWrapsToSlice: single string
    # finish_reason → one-element string[] (coerceStringSlice)
    r = _run(spark, {"llm.response.finish_reason": "stop"},
             [{"name": "openllmetry", "remove_originals": True}])
    assert json.loads(r["attributes"]["gen_ai.response.finish_reasons"]) == ["stop"]
    assert "llm.response.finish_reason" not in r["attributes"]


def test_openllmetry_operation_name_folding(spark):
    # TestNormalize_OpenLLMetry_OperationNameFolding
    for src_key, val, want in [
        ("traceloop.span.kind", "workflow", "invoke_workflow"),
        ("traceloop.span.kind", "task", "invoke_agent"),
        ("traceloop.span.kind", "tool", "execute_tool"),
        ("llm.request.type", "chat", "chat"),
        ("llm.request.type", "completion", "text_completion"),
        ("llm.request.type", "rerank", "retrieval"),
        ("llm.request.type", "embedding", "embeddings"),
    ]:
        r = _run(spark, {src_key: val}, [{"name": "openllmetry"}])
        assert r["attributes"]["gen_ai.operation.name"] == want, (src_key, val)


def test_int_coercion_drops_unparseable(spark):
    # coerce.go coerceInt: non-integer string cannot coerce → rename dropped
    r = _run(spark, {"llm.token_count.prompt": "many"},
             [{"name": "openinference", "remove_originals": True}])
    assert "gen_ai.usage.input_tokens" not in r["attributes"]
    # source retained: the rename never fired
    assert r["attributes"]["llm.token_count.prompt"] == "many"
    assert r["schema_url"] is None


def test_overwrite_semantics(spark):
    # overwrite=false skips when target exists; =true replaces
    attrs = {"llm.model_name": "new", "gen_ai.request.model": "existing"}
    r = _run(spark, attrs, [{"name": "openinference"}])
    assert r["attributes"]["gen_ai.request.model"] == "existing"
    r = _run(spark, attrs, [{"name": "openinference", "overwrite": True}])
    assert r["attributes"]["gen_ai.request.model"] == "new"


def test_no_match_no_schema_url(spark):
    # TestProcessTraces_LeavesSchemaURLWhenNoMappingFires
    r = _run(spark, {"http.method": "GET"}, [{"name": "openllmetry"}])
    assert r["attributes"] == {"http.method": "GET"}
    assert r["schema_url"] is None


def test_existing_schema_url_preserved(spark):
    # TestProcessTraces_PreservesExistingSchemaURL
    r = _run(spark, {"llm.model_name": "m"}, [{"name": "openinference"}],
             schema_url="https://example.com/schemas/1.0")
    assert r["schema_url"] == "https://example.com/schemas/1.0"
    assert r["attributes"]["gen_ai.request.model"] == "m"


def test_user_defined_source(spark):
    # TestNormalize_Custom_RenamesUserDefinedAttribute + value_mappings
    r = _run(
        spark,
        {"my_vendor.model": "m1", "my_vendor.op": "chat_completion",
         "my_vendor.cost": "0.02"},
        [{
            "name": "my_vendor",
            "remove_originals": True,
            "mappings": {
                "my_vendor.model": "gen_ai.request.model",
                "my_vendor.op": "gen_ai.operation.name",
                "my_vendor.cost": "internal.cost",
            },
            "value_mappings": {
                "gen_ai.operation.name": {"chat_completion": "chat"},
            },
        }],
    )
    a = r["attributes"]
    assert a["gen_ai.request.model"] == "m1"
    assert a["gen_ai.operation.name"] == "chat"
    assert a["internal.cost"] == "0.02"
    assert "my_vendor.model" not in a


def test_sources_applied_in_order(spark):
    # TestProcessTraces_AppliesSourcesInSliceOrder: two sources to the
    # same destination, overwrite=true on both → LAST source wins
    r = _run(
        spark,
        {"vendor_a.model": "va", "vendor_b.model": "vb"},
        [
            {"name": "vendor_a", "overwrite": True,
             "mappings": {"vendor_a.model": "gen_ai.request.model"}},
            {"name": "vendor_b", "overwrite": True,
             "mappings": {"vendor_b.model": "gen_ai.request.model"}},
        ],
    )
    assert r["attributes"]["gen_ai.request.model"] == "vb"


def test_config_validation(spark):
    df = spark.createDataFrame([("s", {"k": "v"})], _DDL)
    with pytest.raises(ValueError, match="at least one source"):
        genai_normalizer(df, [])
    with pytest.raises(ValueError, match="duplicate source name"):
        genai_normalizer(df, [{"name": "openllmetry"}, {"name": "openllmetry"}])
    with pytest.raises(ValueError, match="mappings not allowed"):
        genai_normalizer(df, [{"name": "openinference", "mappings": {"a": "b"}}])
    with pytest.raises(ValueError, match="mappings required"):
        genai_normalizer(df, [{"name": "custom"}])


# --- message aggregator (messages_test.go) ----------------------------------

def test_messages_basic_input(spark):
    r = _run(
        spark,
        {
            "llm.input_messages.0.message.role": "system",
            "llm.input_messages.0.message.content": "You are helpful.",
            "llm.input_messages.1.message.role": "user",
            "llm.input_messages.1.message.content": "Hello",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    msgs = json.loads(r["attributes"]["gen_ai.input.messages"])
    assert msgs == [
        {"role": "system", "parts": [{"type": "text", "content": "You are helpful."}]},
        {"role": "user", "parts": [{"type": "text", "content": "Hello"}]},
    ]
    assert "llm.input_messages.0.message.role" not in r["attributes"]
    assert r["schema_url"] == SCHEMA_URL


def test_messages_output_finish_reason(spark):
    r = _run(
        spark,
        {
            "llm.output_messages.0.message.role": "assistant",
            "llm.output_messages.0.message.content": "Hi there!",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    msgs = json.loads(r["attributes"]["gen_ai.output.messages"])
    assert msgs == [
        {"role": "assistant", "parts": [{"type": "text", "content": "Hi there!"}],
         "finish_reason": ""},
    ]


def test_messages_tool_calls(spark):
    r = _run(
        spark,
        {
            "llm.output_messages.0.message.role": "assistant",
            "llm.output_messages.0.message.tool_calls.0.tool_call.id": "call_abc",
            "llm.output_messages.0.message.tool_calls.0.tool_call.function.name": "get_weather",
            "llm.output_messages.0.message.tool_calls.0.tool_call.function.arguments": '{"city":"Berlin"}',
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    msgs = json.loads(r["attributes"]["gen_ai.output.messages"])
    (msg,) = msgs
    assert msg["role"] == "assistant"
    (tc,) = msg["parts"]
    assert tc == {"type": "tool_call", "id": "call_abc", "name": "get_weather",
                  "arguments": {"city": "Berlin"}}


def test_messages_tool_response(spark):
    # tool_call_id message → tool role, tool_call_response part
    r = _run(
        spark,
        {
            "llm.input_messages.2.message.role": "user",
            "llm.input_messages.2.message.content": "sunny, 22C",
            "llm.input_messages.2.message.tool_call_id": "call_abc",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    msgs = json.loads(r["attributes"]["gen_ai.input.messages"])
    (msg,) = msgs
    assert msg["role"] == "tool"
    assert msg["parts"] == [
        {"type": "tool_call_response", "id": "call_abc", "response": "sunny, 22C"}
    ]


def test_messages_aggregator_runs_before_renames(spark):
    # TestNormalizeAttributes_AggregatorRunsBeforeRenames: both the JSON
    # reconstruction and the plain rename land in one pass
    r = _run(
        spark,
        {
            "llm.input_messages.0.message.role": "user",
            "llm.input_messages.0.message.content": "hello",
            "llm.model_name": "gpt-4",
        },
        [{"name": "openinference", "remove_originals": True}],
    )
    a = r["attributes"]
    assert "gen_ai.input.messages" in a
    assert a["gen_ai.request.model"] == "gpt-4"
    assert set(a) == {"gen_ai.input.messages", "gen_ai.request.model"}
