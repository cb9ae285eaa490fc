"""GenAI normalizer: rewrite span attributes from non-OTel GenAI
instrumentation (OpenInference, OpenLLMetry, user-defined) onto the OTel
GenAI semantic conventions (processor/genainormalizerprocessor/).

Per source, in config order (processor.go:79-156):

1. aggregators — OpenInference's flattened ``llm.input_messages.N.
   message.*`` / ``llm.output_messages.N.message.*`` keys reconstruct
   into the GenAI messages JSON (internal/openinference/messages.go).
   Genuinely row-iterative (dynamic indices, nested tool calls, JSON
   assembly) → one Arrow-batched pandas UDF over the attribute map.
2. renames — source key → target key with spec-type coercion
   (internal/otelsemconv/coerce.go) and per-source value folding
   (span-kind enums → ``gen_ai.operation.name``).  The mapping tables
   are plan-time constants, so this phase is pure column expressions:
   one candidate struct per table entry, conflicts resolved
   first-in-table-order (the reference's map-iteration order is
   nondeterministic; ours is documented-deterministic), final map
   rebuilt with ``map_from_entries`` — zero shuffle, no Python.

Type collapse: the engine's attribute maps are string-valued, so
coercion VALIDATES against the spec type and keeps the original string
(int targets must parse as integers, double targets as numbers —
failures drop the rename exactly like Coerce returning false); the
spec's ``string[]`` targets (finish_reasons, stop_sequences) wrap the
value as a one-element JSON array, mirroring coerceStringSlice's
single-string arm.

When any source wrote, ``schema_url`` is set to the targeted semconv
schema (processor.go:94-96) unless already present.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SCHEMA_URL = "https://opentelemetry.io/schemas/1.40.0"

# spec types per gen_ai.* target (internal/otelsemconv/otelsemconv.go);
# keys absent here have spec type "any" and pass through unvalidated
TARGET_TYPES = {
    "gen_ai.agent.name": "string",
    "gen_ai.conversation.id": "string",
    "gen_ai.request.frequency_penalty": "double",
    "gen_ai.request.max_tokens": "int",
    "gen_ai.request.model": "string",
    "gen_ai.request.presence_penalty": "double",
    "gen_ai.request.stop_sequences": "string[]",
    "gen_ai.request.temperature": "double",
    "gen_ai.request.top_k": "int",
    "gen_ai.request.top_p": "double",
    "gen_ai.response.finish_reasons": "string[]",
    "gen_ai.response.model": "string",
    "gen_ai.tool.call.id": "string",
    "gen_ai.tool.description": "string",
    "gen_ai.tool.name": "string",
    "gen_ai.usage.input_tokens": "int",
    "gen_ai.usage.output_tokens": "int",
}

# internal/openinference/mappings.go (key strings from the public
# OpenInference semantic-conventions spec)
OPENINFERENCE_MAPPINGS = {
    "llm.token_count.prompt": "gen_ai.usage.input_tokens",
    "llm.token_count.completion": "gen_ai.usage.output_tokens",
    "llm.model_name": "gen_ai.request.model",
    "llm.provider": "gen_ai.provider.name",
    "embedding.model_name": "gen_ai.request.model",
    "tool.name": "gen_ai.tool.name",
    "tool.description": "gen_ai.tool.description",
    "tool_call.function.arguments": "gen_ai.tool.call.arguments",
    "tool_call.id": "gen_ai.tool.call.id",
    "reranker.model_name": "gen_ai.request.model",
    "agent.name": "gen_ai.agent.name",
    "session.id": "gen_ai.conversation.id",
    "openinference.span.kind": "gen_ai.operation.name",
}

# internal/openinference/valuemappings.go (span kinds lowercased)
OPENINFERENCE_VALUES = {
    "llm": "chat",
    "embedding": "embeddings",
    "chain": "invoke_agent",
    "retriever": "retrieval",
    "reranker": "retrieval",
    "tool": "execute_tool",
    "agent": "invoke_agent",
    "prompt": "text_completion",
}

# internal/openllmetry/mappings.go (key strings from the public
# semconv_ai package)
OPENLLMETRY_MAPPINGS = {
    "gen_ai.usage.prompt_tokens": "gen_ai.usage.input_tokens",
    "gen_ai.usage.completion_tokens": "gen_ai.usage.output_tokens",
    "gen_ai.request.model": "gen_ai.request.model",
    "gen_ai.response.model": "gen_ai.response.model",
    "gen_ai.request.max_tokens": "gen_ai.request.max_tokens",
    "llm.request.temperature": "gen_ai.request.temperature",
    "llm.request.top_p": "gen_ai.request.top_p",
    "llm.top_k": "gen_ai.request.top_k",
    "llm.frequency_penalty": "gen_ai.request.frequency_penalty",
    "llm.presence_penalty": "gen_ai.request.presence_penalty",
    "llm.chat.stop_sequences": "gen_ai.request.stop_sequences",
    "llm.request.functions": "gen_ai.tool.definitions",
    "llm.response.finish_reason": "gen_ai.response.finish_reasons",
    "llm.response.stop_reason": "gen_ai.response.finish_reasons",
    "llm.request.type": "gen_ai.operation.name",
    "traceloop.span.kind": "gen_ai.operation.name",
    "traceloop.entity.name": "gen_ai.agent.name",
    "traceloop.entity.input": "gen_ai.input.messages",
    "traceloop.entity.output": "gen_ai.output.messages",
}

# internal/openllmetry/valuemappings.go
OPENLLMETRY_VALUES = {
    "workflow": "invoke_workflow",
    "task": "invoke_agent",
    "agent": "invoke_agent",
    "tool": "execute_tool",
    "completion": "text_completion",
    "chat": "chat",
    "rerank": "retrieval",
    "embedding": "embeddings",
}

_BUILTIN = {
    "openinference": (OPENINFERENCE_MAPPINGS, OPENINFERENCE_VALUES, True),
    "openllmetry": (OPENLLMETRY_MAPPINGS, OPENLLMETRY_VALUES, False),
}

_INT_RE = r"^[+-]?[0-9]+$"


def _coerced(val: Column, target: str) -> Column:
    """Validate ``val`` against the target's spec type; null = drop the
    rename (Coerce returning false).  String values keep their original
    rendering; string[] targets wrap into a one-element JSON array."""
    typ = TARGET_TYPES.get(target)
    if typ is None or typ == "string":
        return val
    if typ == "int":
        return F.when(val.rlike(_INT_RE), val)
    if typ == "double":
        return F.when(val.try_cast("double").isNotNull(), val)
    if typ == "string[]":
        return F.to_json(F.array(val))
    raise AssertionError(typ)


def _value_fold(target: str, val: Column, values: dict) -> Column:
    """Per-source value folding (Transform): case-insensitive enum map
    on gen_ai.operation.name, verbatim otherwise."""
    if not values:
        return val
    folded = val
    if target == "gen_ai.operation.name":
        fold_map = F.map_from_arrays(
            F.array(*[F.lit(k) for k in values]),
            F.array(*[F.lit(v) for v in values.values()]),
        )
        folded = F.coalesce(fold_map[F.lower(val)], val)
    return folded


def _user_value_fold(target: str, val: Column, value_mappings: dict) -> Column:
    """User-defined value_mappings: per-target exact-match fold tables
    (internal/custom)."""
    table = (value_mappings or {}).get(target)
    if not table:
        return val
    fold_map = F.map_from_arrays(
        F.array(*[F.lit(k) for k in table]),
        F.array(*[F.lit(v) for v in table.values()]),
    )
    return F.coalesce(fold_map[val], val)


def _make_messages_udf(remove_originals: bool, overwrite: bool):
    """OpenInference MessageAggregator (messages.go:78-137): rebuild
    llm.{input,output}_messages.N.message.* flat keys into the GenAI
    messages JSON.  remove/overwrite flags come from the source config
    (processor.go:108-112)."""

    @pandas_udf("struct<attrs:map<string,string>,wrote:boolean>")
    def _reconstruct(attrs: pd.Series) -> pd.DataFrame:
        out_attrs, out_wrote = [], []
        for m in attrs:
            out_attrs.append(_reconstruct_one(m, remove_originals, overwrite))
            out_wrote.append(out_attrs[-1] is not m and out_attrs[-1] is not None)
        return pd.DataFrame({"attrs": out_attrs, "wrote": out_wrote})

    return _reconstruct


def _reconstruct_one(m, remove_originals: bool, overwrite: bool):
    """Returns the updated attribute dict, or the ORIGINAL object
    unchanged when nothing was written (identity marks wrote=False)."""
    if m is None:
        return None
    wrote = False
    out = dict(m)
    for prefix, target, is_output in (
        ("llm.input_messages.", "gen_ai.input.messages", False),
        ("llm.output_messages.", "gen_ai.output.messages", True),
    ):
        if target in out and not overwrite:
            continue
        messages: dict[int, dict] = {}
        remove = []
        for k, v in out.items():
            if not k.startswith(prefix):
                continue
            rest = k[len(prefix):]
            dot = rest.find(".")
            if dot < 0:
                continue
            try:
                idx = int(rest[:dot])
            except ValueError:
                continue
            field = rest[dot + 1 :]
            if not field.startswith("message.") or field == "message.":
                continue
            field = field[len("message."):]
            mf = messages.setdefault(
                idx,
                {"role": "", "content": "", "name": "",
                 "tool_call_id": "", "tool_calls": {}},
            )
            # every index-parsed message key is removal-eligible, even
            # when the sub-field is unrecognized (applyField is a no-op
            # but keysToRemove still gains the key, messages.go:98-117)
            if remove_originals:
                remove.append(k)
            if field in ("role", "content", "name", "tool_call_id"):
                mf[field] = v
            elif field.startswith("tool_calls."):
                tc_rest = field[len("tool_calls."):]
                tdot = tc_rest.find(".")
                if tdot < 0:
                    continue
                try:
                    tidx = int(tc_rest[:tdot])
                except ValueError:
                    continue
                tfield = tc_rest[tdot + 1 :]
                if not tfield.startswith("tool_call."):
                    continue
                tfield = tfield[len("tool_call."):]
                tc = mf["tool_calls"].setdefault(
                    tidx, {"id": "", "name": "", "arguments": ""}
                )
                if tfield == "id":
                    tc["id"] = v
                elif tfield == "function.name":
                    tc["name"] = v
                elif tfield == "function.arguments":
                    tc["arguments"] = v
        if not messages:
            continue
        result = []
        for idx in sorted(messages):
            mf = messages[idx]
            # inferRole (messages.go:295-307)
            if mf["tool_call_id"] and not is_output:
                role = "tool"
            elif mf["role"] in ("system", "user", "assistant", "tool") and (
                not is_output or mf["role"] != "tool"
            ):
                role = mf["role"]
            elif mf["tool_calls"]:
                role = "assistant"
            else:
                role = "user"
            # buildParts (messages.go:236-275)
            if mf["tool_call_id"]:
                parts = [
                    {
                        "type": "tool_call_response",
                        **({"id": mf["tool_call_id"]} if mf["tool_call_id"] else {}),
                        "response": mf["content"],
                    }
                ]
            elif mf["tool_calls"]:
                parts = []
                for tidx in sorted(mf["tool_calls"]):
                    tc = mf["tool_calls"][tidx]
                    part = {"type": "tool_call"}
                    if tc["id"]:
                        part["id"] = tc["id"]
                    part["name"] = tc["name"]
                    if tc["arguments"]:
                        try:
                            part["arguments"] = json.loads(tc["arguments"])
                        except ValueError:
                            part["arguments"] = tc["arguments"]
                    parts.append(part)
            elif mf["content"]:
                parts = [{"type": "text", "content": mf["content"]}]
            else:
                parts = []
            msg: dict = {"role": role}
            if mf["name"]:
                msg["name"] = mf["name"]
            msg["parts"] = parts
            if is_output:
                msg["finish_reason"] = ""
            result.append(msg)
        out[target] = json.dumps(result, separators=(",", ":"))
        for k in remove:
            out.pop(k, None)
        wrote = True
    return out if wrote else m


def _apply_source(
    df: DataFrame,
    mappings: dict,
    values: dict | None,
    value_mappings: dict | None,
    remove_originals: bool,
    overwrite: bool,
    use_aggregator: bool,
) -> DataFrame:
    if use_aggregator:
        agg_udf = _make_messages_udf(remove_originals, overwrite)
        df = df.withColumn("_agg", agg_udf(F.col("attributes")))
        df = (
            df.withColumn(
                "attributes",
                F.coalesce(F.col("_agg.attrs"), F.col("attributes")),
            )
            .withColumn("_wrote", F.col("_wrote") | F.col("_agg.wrote"))
            .drop("_agg")
        )

    a = F.col("attributes")
    items = list(mappings.items())
    candidates: list[Column] = []
    fired: list[Column] = []
    for i, (src, tgt) in enumerate(items):
        val = a[src]
        exists = a[tgt].isNotNull()
        gate = val.isNotNull() & (F.lit(bool(overwrite)) | ~exists)
        coerced = _coerced(val, tgt)
        if values is not None:
            coerced = F.when(
                coerced.isNotNull(), _value_fold(tgt, coerced, values)
            )
        if value_mappings:
            coerced = F.when(
                coerced.isNotNull(), _user_value_fold(tgt, coerced, value_mappings)
            )
        fire = gate & coerced.isNotNull()
        # first-in-table-order wins among mappings sharing a target
        # (GetOrPutEmpty sees the earlier write's key)
        for j in range(i):
            if items[j][1] == tgt:
                fire = fire & ~fired[j]
        fired.append(fire)
        candidates.append(
            F.when(
                fire,
                F.struct(F.lit(tgt).alias("key"), coerced.alias("value")),
            )
        )

    writes = F.filter(F.array(*candidates), lambda e: e.isNotNull())
    write_keys = F.transform(writes, lambda e: e.getField("key"))
    if remove_originals:
        removed = F.filter(
            F.array(
                *[
                    F.when(fired[i], F.lit(src))
                    for i, (src, _) in enumerate(items)
                ]
            ),
            lambda e: e.isNotNull(),
        )
    else:
        removed = F.array().cast("array<string>")
    kept = F.filter(
        F.map_entries(a),
        lambda e: ~F.array_contains(write_keys, e.getField("key"))
        & ~F.array_contains(removed, e.getField("key")),
    )
    new_attrs = F.map_from_entries(F.concat(kept, writes))
    wrote_any = F.size(writes) > 0
    return (
        df.withColumn("_new_attrs", new_attrs)
        .withColumn("_wrote", F.col("_wrote") | wrote_any)
        .withColumn("attributes", F.col("_new_attrs"))
        .drop("_new_attrs")
    )


def genai_normalizer(df: DataFrame, sources: list[dict]) -> DataFrame:
    """Apply the normalizer's ordered source list to a span frame
    (columns: ``attributes`` map, optional ``schema_url``).  Each source
    dict: ``name`` (built-in ``openinference``/``openllmetry`` or
    user-defined), ``remove_originals``, ``overwrite``, and for
    user-defined sources ``mappings`` + optional ``value_mappings``
    (config.go Source fields)."""
    if not sources:
        raise ValueError("at least one source must be specified")
    seen = set()
    for s in sources:
        name = s.get("name")
        if not name:
            raise ValueError("source name is required")
        if name in seen:
            raise ValueError(f"duplicate source name: {name}")
        seen.add(name)
        if name in _BUILTIN and s.get("mappings"):
            raise ValueError(f"mappings not allowed on built-in source {name}")
        if name not in _BUILTIN and not s.get("mappings"):
            raise ValueError(f"mappings required for user-defined source {name}")

    out = df.withColumn("_wrote", F.lit(False))
    for s in sources:
        name = s["name"]
        if name in _BUILTIN:
            mappings, values, agg = _BUILTIN[name]
            vm = None
        else:
            mappings, values, agg = s["mappings"], None, False
            vm = s.get("value_mappings")
        out = _apply_source(
            out,
            mappings,
            values,
            vm,
            bool(s.get("remove_originals", False)),
            bool(s.get("overwrite", False)),
            agg,
        )
    if "schema_url" in df.columns:
        out = out.withColumn(
            "schema_url",
            F.when(
                F.col("_wrote") & (F.coalesce(F.col("schema_url"), F.lit("")) == ""),
                F.lit(SCHEMA_URL),
            ).otherwise(F.col("schema_url")),
        )
    else:
        out = out.withColumn(
            "schema_url", F.when(F.col("_wrote"), F.lit(SCHEMA_URL))
        )
    return out.drop("_wrote")
