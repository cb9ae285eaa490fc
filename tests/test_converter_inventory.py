"""Inventory parity: every OTTL function the reference registers
(pkg/ottl/ottlfuncs/functions.go:11-141) must exist here — converters
in ``sparkotel.expr.FUNCS``, editors in ``apply_statement``.

Reads the reference file directly so the check tracks upstream drift.
"""

from __future__ import annotations

import os
import re

import pytest

from sparkotel import expr as X

REF = "/root/reference/pkg/ottl/ottlfuncs/functions.go"

# factory symbol → registered OTTL name, where they differ
_SPECIAL = {"Fnv": "FNV"}

# editors are snake_case statements handled by apply_statement, not FUNCS
_EDITOR_SYMBOLS = {
    "DeleteKey", "DeleteMatchingKeys", "KeepMatchingKeys", "Flatten",
    "KeepKeys", "Limit", "MergeMaps", "ReplaceAllMatches",
    "ReplaceAllPatterns", "ReplaceMatch", "ReplacePattern", "Set",
    "StringifyAll", "TruncateAll",
}

_EDITOR_IMPLS = {
    "set", "delete_key", "delete_matching_keys", "keep_matching_keys",
    "keep_keys", "flatten", "limit", "merge_maps", "replace_match",
    "replace_all_matches", "replace_pattern", "replace_all_patterns",
    "stringify_all", "truncate_all",
}


def _camel_to_snake(s: str) -> str:
    return re.sub(r"(?<!^)(?=[A-Z])", "_", s).lower()


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_every_reference_function_is_implemented(spark):
    src = open(REF).read()
    symbols = re.findall(r"New([A-Za-z0-9]+)Factory\[K\]\(\)", src)
    assert len(symbols) >= 100  # editors + converters
    missing = []
    for sym in sorted(set(symbols)):
        if sym in _EDITOR_SYMBOLS:
            assert _camel_to_snake(sym) in _EDITOR_IMPLS, sym
            continue
        name = _SPECIAL.get(sym, sym)
        if name not in X.FUNCS:
            missing.append(name)
    assert not missing, f"unimplemented converters: {missing}"


def test_editor_statements_dispatch(spark):
    """each editor name actually dispatches (no NameError) on a trivial
    frame — guards against registry typos."""
    df = spark.createDataFrame(
        [({"a": "1"},)], "attributes map<string,string>"
    )
    stmts = [
        'set(x, "v")',
        'delete_key(attributes, "a")',
        'delete_matching_keys(attributes, "z.*")',
        'keep_matching_keys(attributes, ".*")',
        'keep_keys(attributes, "a")',
        "flatten(attributes)",
        "limit(attributes, 5)",
        'merge_maps(attributes, attributes, "upsert")',
        'replace_match(x, "v*", "w")',
        'replace_all_matches(attributes, "1*", "2")',
        'replace_pattern(x, "v", "w")',
        'replace_all_patterns(attributes, "value", "1", "2")',
        "stringify_all(attributes)",
        "truncate_all(attributes, 10)",
    ]
    out = df.withColumn("x", df["attributes"].getItem("a"))
    for s in stmts:
        out = X.apply_statement(out, s)
    out.collect()  # executes the whole chain
