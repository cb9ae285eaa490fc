"""OTTL-subset compiler tests — parser unit tests plus executed
statement semantics over tiny DataFrames (modelled on the reference's
e2e corpus, pkg/ottl/e2e/e2e_test.go)."""

from __future__ import annotations

import pytest

from sparkotel import expr as X


# -- parser ------------------------------------------------------------------

def test_parse_condition_ast():
    e = X.parse_expr('lang == "en" and status >= 500')
    assert isinstance(e, X.BinOp) and e.op == "and"
    assert e.left.op == "==" and e.left.left.parts == ["lang"]
    assert e.right.op == ">=" and e.right.right.value == 500


def test_parse_statement_where():
    s = X.parse_statement('set(attributes["k"], "v") where severity_number > 13')
    assert s.editor.name == "set"
    assert s.editor.args[0].parts == ["attributes", ("key", "k")]
    assert s.where.op == ">"


def test_parse_nested_calls_and_math():
    e = X.parse_expr('Len(Concat(host, path, "-")) * 2 + 1')
    assert e.op == "+" and e.left.op == "*"


def test_parse_errors():
    with pytest.raises(SyntaxError):
        X.parse_expr("lang == ")
    # dynamic map indexes are legal (e2e: attributes[attributes["flags"]])
    st = X.parse_statement('set(attributes[k], 1)')
    seg = st.editor.args[0].parts[1]
    assert seg[0] == "expr"
    with pytest.raises(SyntaxError):
        X.parse_expr('{"unterminated": 1')


def test_constant_folding():
    comp = X.Compiler()
    assert comp.compile(X.parse_expr("1 + 2 * 3")) == 7
    assert comp.compile(X.parse_expr('"a" == "b"')) is False


# -- executed semantics -------------------------------------------------------


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            ("https://a/x", "en", 500, {"k1": "v1", "k2": "verbose-value"}),
            ("https://b/y", "de", 200, {"k2": "v2", "secret_token": "s"}),
        ],
        "url string, lang string, status int, attributes map<string,string>",
    )


def test_condition_compile(spark, tiny):
    cond = X.compile_condition(tiny, 'lang == "en" and status >= 500')
    assert tiny.filter(cond).count() == 1


def test_set_where(spark, tiny):
    out = X.apply_statement(tiny, 'set(severity, "ERROR") where status >= 500')
    rows = {r["url"]: r["severity"] for r in out.collect()}
    assert rows["https://a/x"] == "ERROR" and rows["https://b/y"] is None


def test_set_converter_value(spark, tiny):
    out = X.apply_statement(tiny, "set(path_len, Len(url))")
    assert {r["path_len"] for r in out.collect()} == {11}


def test_delete_and_keep_keys(spark, tiny):
    out = X.apply_statement(tiny, 'delete_key(attributes, "k2")')
    m = {r["url"]: r["attributes"] for r in out.collect()}
    assert "k2" not in m["https://a/x"] and "k1" in m["https://a/x"]

    out2 = X.apply_statement(tiny, 'keep_keys(attributes, "k1")')
    m2 = {r["url"]: r["attributes"] for r in out2.collect()}
    assert m2["https://a/x"] == {"k1": "v1"} and m2["https://b/y"] == {}


def test_delete_matching_keys(spark, tiny):
    out = X.apply_statement(tiny, 'delete_matching_keys(attributes, "secret.*")')
    m = {r["url"]: r["attributes"] for r in out.collect()}
    assert "secret_token" not in m["https://b/y"] and "k2" in m["https://b/y"]


def test_replace_pattern(spark, tiny):
    out = X.apply_statement(tiny, 'replace_pattern(url, "^https://", "")')
    assert {r["url"] for r in out.collect()} == {"a/x", "b/y"}


def test_replace_all_patterns_values(spark, tiny):
    out = X.apply_statement(tiny, 'replace_all_patterns(attributes, "value", "v", "V")')
    m = {r["url"]: r["attributes"] for r in out.collect()}
    assert m["https://a/x"]["k1"] == "V1"


def test_truncate_all_and_limit(spark, tiny):
    out = X.apply_statement(tiny, "truncate_all(attributes, 2)")
    m = {r["url"]: r["attributes"] for r in out.collect()}
    assert m["https://a/x"]["k2"] == "ve"

    out2 = X.apply_statement(tiny, "limit(attributes, 1)")
    m2 = {r["url"]: r["attributes"] for r in out2.collect()}
    assert list(m2["https://a/x"].keys()) == ["k1"]  # lexicographically first


def test_merge_maps(spark, tiny):
    out = X.apply_statement(
        tiny.withColumn("extra", X.F.create_map(X.F.lit("k1"), X.F.lit("NEW"))),
        'merge_maps(attributes, extra, "insert")',
    )
    m = {r["url"]: r["attributes"] for r in out.collect()}
    assert m["https://a/x"]["k1"] == "v1"  # insert: existing key untouched
    assert m["https://b/y"]["k1"] == "NEW"  # absent key added

    out2 = X.apply_statement(
        tiny.withColumn("extra", X.F.create_map(X.F.lit("k1"), X.F.lit("NEW"))),
        'merge_maps(attributes, extra, "upsert")',
    )
    m2 = {r["url"]: r["attributes"] for r in out2.collect()}
    assert m2["https://a/x"]["k1"] == "NEW"


def test_converters(spark, tiny):
    df = X.apply_statements(
        tiny,
        [
            'set(up, ToUpperCase(lang))',
            'set(hashval, SHA256(url))',
            'set(num, Int("42"))',
            'set(bad, Int("xx"))',
            'set(joined, Concat(lang, url, "-"))',
        ],
    )
    r = {x["url"]: x for x in df.collect()}
    a = r["https://a/x"]
    assert a["up"] == "EN" and len(a["hashval"]) == 64 and a["num"] == 42
    assert a["bad"] is None and a["joined"] == "en-https://a/x"


def test_replace_match_glob(spark, tiny):
    out = X.apply_statement(tiny, 'replace_match(lang, "e*", "EN-GLOB")')
    langs = {r["url"]: r["lang"] for r in out.collect()}
    assert langs["https://a/x"] == "EN-GLOB"  # 'en' matches e*
    assert all(v == "EN-GLOB" or not v.startswith("e") for v in langs.values())
    # '?' matches exactly one char; non-matches untouched
    out2 = X.apply_statement(tiny, 'replace_match(lang, "??", "TWO")')
    assert all(
        (len(orig) == 2) == (new == "TWO")
        for orig, new in zip(
            [r["lang"] for r in tiny.collect()], [r["lang"] for r in out2.collect()]
        )
    )


def test_replace_all_matches_map(spark, tiny):
    out = X.apply_statement(tiny, 'replace_all_matches(attributes, "v*", "MASKED")')
    m = {r["url"]: r["attributes"] for r in out.collect()}
    for url, attrs in m.items():
        for k, v in attrs.items():
            assert not v.startswith("v") or v == "MASKED"


def test_flatten_editor(spark):
    df = spark.createDataFrame(
        [(
            {"a": {"x": "1", "y": "2"}, "b": {"z": "3"}},
        )],
        "nested map<string,map<string,string>>",
    )
    out = X.apply_statement(df, "flatten(nested)")
    assert out.first()["nested"] == {"a.x": "1", "a.y": "2", "b.z": "3"}
    # prefix arg
    out2 = X.apply_statement(df, 'flatten(nested, "pre")')
    assert out2.first()["nested"] == {"pre.a.x": "1", "pre.a.y": "2", "pre.b.z": "3"}
    # arrays get index keys (func_flatten.go resolveValue slice branch)
    df2 = spark.createDataFrame([({"l": ["p", "q"]},)], "nested map<string,array<string>>")
    assert X.apply_statement(df2, "flatten(nested)").first()["nested"] == {
        "l.0": "p",
        "l.1": "q",
    }
    # depth cap stops expansion (stringifies the remainder)
    out3 = X.apply_statement(df, 'flatten(nested, "", 1)')
    flat = out3.first()["nested"]
    assert set(flat) == {"a", "b"} and "x" in flat["a"]


def test_stringify_all(spark):
    df = spark.createDataFrame([({"n": 1, "m": 2},)], "attrs map<string,int>")
    out = X.apply_statement(df, "stringify_all(attrs)")
    assert out.first()["attrs"] == {"n": "1", "m": "2"}


def test_math_rules_match_reference_implementation():
    """pkg/ottl/math.go — int/int division follows Go (truncates toward
    zero), mixed int64/float64 coerces to float64 (math.go:130-148;
    LANGUAGE.md's mixing-is-an-error note is stale vs the code),
    division by zero errors gracefully."""
    import pytest as _pytest

    from sparkotel.expr import Compiler, parse_expr

    c = Compiler(None)
    assert c.compile(parse_expr("7 / 2")) == 3
    assert c.compile(parse_expr("-7 / 2")) == -3
    assert c.compile(parse_expr("7 / -2")) == -3
    assert c.compile(parse_expr("10 / 1")) == 10
    assert c.compile(parse_expr("3.0 / 2.0")) == 1.5
    assert c.compile(parse_expr("1 + 1.5")) == 2.5
    assert c.compile(parse_expr("2.0 * 3")) == 6.0
    assert c.compile(parse_expr("7 / 2.0")) == 3.5
    with _pytest.raises(ZeroDivisionError):
        c.compile(parse_expr("1 / 0"))


def test_integral_column_division(spark):
    """column-typed int/int division also truncates toward zero."""
    from sparkotel.expr import compile_value

    df = spark.createDataFrame([(7, 2), (-7, 2)], "a long, b long")
    col = compile_value(df, 'attributes["a"] / attributes["b"]', attrs_cols=["a", "b"])
    assert [r["v"] for r in df.select(col.alias("v")).collect()] == [3, -3]


def test_comparison_lattice_literals():
    """LANGUAGE.md:263-291: mismatched base types are 'not equal' (only
    != true); bool is not numeric; mixed numerics compare as float64;
    nil equals only nil; bools order false < true."""
    from sparkotel.expr import Compiler, parse_expr

    c = Compiler(None)
    cases = [
        ("true == 1", False), ("true != 1", True), ("1 == 1.0", True),
        ('"1" == 1', False), ('"1" != 1', True), ("true > false", True),
        ("nil == nil", True), ("nil != nil", False), ('1 < "2"', False),
        ("1.5 > 1", True), ('"a" < "b"', True),
    ]
    for src, want in cases:
        assert c.compile(parse_expr(src)) is want, src


def test_time_duration_math_rules(spark):
    """LANGUAGE.md:203-209: Time ± Duration → Time (either operand
    order for +), Duration ± Duration → Duration, Time − Time →
    Duration (seconds-double engine form)."""
    import datetime as dt

    from sparkotel.expr import compile_value

    df = spark.createDataFrame([("x",)], "s string")

    def run(src):
        col = compile_value(df, src)
        return df.select(col.alias("v")).first()["v"] if hasattr(col, "_jc") else col

    base = dt.datetime(2023, 1, 1)
    assert run('Time("2023-01-01", "%Y-%m-%d") + Duration("10m")') == base + dt.timedelta(minutes=10)
    assert run('Time("2023-01-01", "%Y-%m-%d") - Duration("10m")') == base - dt.timedelta(minutes=10)
    assert run('Duration("10m") + Time("2023-01-01", "%Y-%m-%d")') == base + dt.timedelta(minutes=10)
    assert run('Duration("10m") + Duration("5m")') == 900.0
    assert run('Time("2023-01-02", "%Y-%m-%d") - Time("2023-01-01", "%Y-%m-%d")') == 86400.0
    assert run('Time("2023-01-01", "%Y-%m-%d") + (Duration("10m") - Duration("5m"))') == base + dt.timedelta(minutes=5)


def test_math_rejects_non_numeric_literals():
    """math.go attemptMathOperation: arithmetic on strings/bools errors
    (no Python-style concat/repeat/bool-int coercion)."""
    import pytest as _pytest

    from sparkotel.expr import Compiler, parse_expr

    c = Compiler(None)
    for src in ['"a" + "b"', "true + true", '"5" * 2', 'true - 1']:
        with _pytest.raises(TypeError):
            c.compile(parse_expr(src))
    assert c.compile(parse_expr("-1 + 2")) == 1  # unary minus fine


def test_math_rejects_string_arithmetic():
    """math.go: '+' on strings errors ('must be int64, float64,
    time.Time or time.Duration') — no Python-style concatenation; the
    OTTL way to join strings is Concat()."""
    import pytest as _pytest

    from sparkotel.expr import Compiler, parse_expr

    c = Compiler(None)
    with _pytest.raises(TypeError):
        c.compile(parse_expr('"a" + "b"'))
