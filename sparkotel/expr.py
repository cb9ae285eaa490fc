"""OTTL-subset → pyspark.sql.Column compiler.

A plan-time compiler from a restricted OTTL statement set
(``editor(args) where <bool-expr>``) to native Spark Column
expressions — no Catalyst extension, no UDFs.  Mirrors:

- grammar: /root/reference/pkg/ottl/grammar.go:16-31 (statement =
  editor invocation + optional where clause; boolean expression with
  and/or/not, comparison ops, converter calls, paths, literals);
- execution: pkg/ottl/parser.go:33-51 (condition gates editor);
- log-context paths: pkg/ottl/contexts/internal/ctxlog/log.go:27-78;
- editors/converters: pkg/ottl/ottlfuncs/functions.go:11-141;
- error modes: pkg/ottl/parser.go:407-428 (propagate|ignore|silent →
  here: propagate = plain expressions that may fail the task;
  ignore/silent = try_* variants).

Divergences (documented, deliberate): OTTL's dynamic any-typed values
become typed columns, so the cross-type "not equal" lattice
(pkg/ottl/LANGUAGE.md:263-291) reduces to Spark's typed comparisons;
``limit()`` keeps the lexicographically-first keys (deterministic)
rather than arbitrary ones.  Mixed int/float arithmetic is allowed
(OTTL errors — LANGUAGE.md:198-228 — but Spark's widening is strictly
more useful and the fixtures never rely on the error).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<hex>0x[0-9a-fA-F]+)
  | (?P<float>-?\d+\.\d+)
  | (?P<int>-?\d+)
  | (?P<op>=>|==|!=|>=|<=|\band\b|\bor\b|\bnot\b|[><+\-*/(),\[\].={}:])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass
class Tok:
    kind: str
    text: str


def tokenize(src: str) -> list[Tok]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"OTTL: bad token at {src[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(Tok(kind, m.group()))
    out.append(Tok("eof", ""))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Path:
    parts: list  # list of str segments; str or ("key", k) map index


@dataclass
class Call:
    name: str
    args: list
    kwargs: dict = None  # named arguments: flatten(x, depth=1)

    def __post_init__(self):
        if self.kwargs is None:
            self.kwargs = {}


@dataclass
class Lit:
    value: object


@dataclass
class BinOp:
    op: str
    left: object
    right: object


@dataclass
class Not:
    operand: object


@dataclass
class ListLit:
    items: list


@dataclass
class Index:
    target: object
    key: object


@dataclass
class MapLit:
    entries: list  # [(key_str, value_node), ...] — keys are string literals


@dataclass
class Lambda:
    params: list  # parameter names ("_" = blank)
    body: object


@dataclass
class Statement:
    editor: Call
    where: object | None


# ---------------------------------------------------------------------------
# parser (recursive descent; precedence: or < and < not < cmp < add < mul)
# ---------------------------------------------------------------------------


class Parser:
    def __init__(self, toks: list[Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> Tok:
        return self.toks[self.i]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str) -> Tok:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"OTTL: expected {text!r}, got {t.text!r}")
        return t

    # -- expressions --------------------------------------------------------
    def expr(self):
        return self.or_()

    def or_(self):
        left = self.and_()
        while self.peek().text == "or":
            self.next()
            left = BinOp("or", left, self.and_())
        return left

    def and_(self):
        left = self.not_()
        while self.peek().text == "and":
            self.next()
            left = BinOp("and", left, self.not_())
        return left

    def not_(self):
        if self.peek().text == "not":
            self.next()
            return Not(self.not_())
        return self.cmp()

    def cmp(self):
        left = self.add()
        if self.peek().text in ("==", "!=", ">", ">=", "<", "<="):
            op = self.next().text
            return BinOp(op, left, self.add())
        return left

    def add(self):
        left = self.mul()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            left = BinOp(op, left, self.mul())
        return left

    def mul(self):
        left = self.unary()
        while self.peek().text in ("*", "/"):
            op = self.next().text
            left = BinOp(op, left, self.unary())
        return left

    def unary(self):
        if self.peek().text == "-":
            self.next()
            return BinOp("-", Lit(0), self.unary())
        return self.primary()

    def primary(self):
        node = self._primary_inner()
        # postfix indexing: Split(x, "|")[1], SliceToMap(xs)["k"] —
        # grammar.go's key access on any value expression.  (Plain
        # paths handle their own [..] segments inside self.path().)
        while not isinstance(node, Path) and self.peek().text == "[":
            self.next()
            key = self.expr()
            self.expect("]")
            node = Index(node, key)
        return node

    def _is_lambda_ahead(self) -> bool:
        """lookahead for ``([ident[, ident]*]) =>`` from a ``(`` token."""
        j = self.i + 1
        if self.toks[j].text == ")":  # zero-parameter lambda: () =>
            return self.toks[j + 1].text == "=>"
        if self.toks[j].kind != "ident":
            return False
        j += 1
        while self.toks[j].text == ",":
            j += 1
            if self.toks[j].kind != "ident":
                return False
            j += 1
        return self.toks[j].text == ")" and self.toks[j + 1].text == "=>"

    def _primary_inner(self):
        t = self.peek()
        if t.text == "(":
            if self._is_lambda_ahead():
                return self.lambda_()
            self.next()
            e = self.expr()
            self.expect(")")
            return e
        if t.text == "[":  # list literal: ["a", attributes["x"], 3]
            self.next()
            items = []
            if self.peek().text != "]":
                items.append(self.expr())
                while self.peek().text == ",":
                    self.next()
                    items.append(self.expr())
            self.expect("]")
            return ListLit(items)
        if t.text == "{":  # map literal: {"k": v, ...} (grammar.go mapValue)
            self.next()
            entries = []
            if self.peek().text != "}":
                while True:
                    key = self.next()
                    if key.kind != "string":
                        raise SyntaxError("OTTL: map-literal key must be a string")
                    self.expect(":")
                    entries.append((_unescape(key.text), self.expr()))
                    if self.peek().text != ",":
                        break
                    self.next()
                    if self.peek().text == "}":  # trailing comma
                        break
            self.expect("}")
            return MapLit(entries)
        if t.kind == "string":
            self.next()
            return Lit(_unescape(t.text))
        if t.kind == "hex":
            self.next()
            return Lit(bytes.fromhex(t.text[2:]))
        if t.kind == "int":
            self.next()
            return Lit(int(t.text))
        if t.kind == "float":
            self.next()
            return Lit(float(t.text))
        if t.kind == "ident":
            if t.text in ("true", "false"):
                self.next()
                return Lit(t.text == "true")
            if t.text == "nil":
                self.next()
                return Lit(None)
            if t.text in _ENUMS:  # enum symbol (grammar.go Enum)
                self.next()
                return Lit(_ENUMS[t.text])
            # Converter call (Uppercase initial) or path
            if self.toks[self.i + 1].text == "(" and t.text[0].isupper():
                return self.call()
            return self.path()
        raise SyntaxError(f"OTTL: unexpected {t.text!r}")

    def lambda_(self) -> Lambda:
        self.expect("(")
        params = []
        if self.peek().text != ")":
            params.append(self.next().text)
            while self.peek().text == ",":
                self.next()
                params.append(self.next().text)
        self.expect(")")
        self.expect("=>")
        # the reference's lambda validation (ottl lambda feature gate)
        seen = set()
        for p in params:
            if p != "_" and p in seen:
                raise SyntaxError(f'duplicate local identifier "{p}"')
            seen.add(p)
        if self.peek().text == "(" and self._is_lambda_ahead():
            raise SyntaxError("lambda body cannot result into another lambda expression")
        return Lambda(params, self.expr())

    def call(self) -> Call:
        name = self.next().text
        self.expect("(")
        args, kwargs = [], {}

        def one():
            t = self.peek()
            # named argument: ident=expr ('==' excluded by tokenizer order)
            if (
                t.kind == "ident"
                and self.toks[self.i + 1].text == "="
                and self.toks[self.i + 2].text != "="
            ):
                k = self.next().text
                self.next()
                kwargs[k] = self.expr()
            else:
                args.append(self.expr())

        if self.peek().text != ")":
            one()
            while self.peek().text == ",":
                self.next()
                one()
        self.expect(")")
        return Call(name, args, kwargs)

    def path(self) -> Path:
        parts: list = [self.next().text]
        while True:
            t = self.peek()
            if t.text == ".":
                self.next()
                parts.append(self.next().text)
            elif t.text == "[":
                self.next()
                key = self.expr()
                self.expect("]")
                if isinstance(key, Lit) and isinstance(key.value, str):
                    parts.append(("key", key.value))
                elif isinstance(key, Lit) and isinstance(key.value, bool):
                    raise TypeError("OTTL: bool cannot index a map or slice")
                elif isinstance(key, Lit) and isinstance(key.value, int):
                    parts.append(("idx", key.value))
                elif isinstance(key, Lit) and isinstance(key.value, float):
                    # float index — the reference rejects it at resolve time
                    # ("expecting 'int64' but got 'float64'")
                    parts.append(("badidx", key.value))
                else:
                    if isinstance(key, Lambda):
                        raise SyntaxError("expression has invalid syntax: lambda as index key")
                    parts.append(("expr", key))
            else:
                return Path(parts)


# severity enum symbols (grammar.go Enum path; ctxlog severity enums —
# plog.SeverityNumber values, TRACE=1 … FATAL4=24)
_ENUMS: dict[str, int] = {"SEVERITY_NUMBER_UNSPECIFIED": 0}
for _i, _base in enumerate(("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")):
    for _j in range(4):
        _ENUMS[f"SEVERITY_NUMBER_{_base}" + ("" if _j == 0 else str(_j + 1))] = _i * 4 + _j + 1


_ESCAPES = {'"': '"', "\\": "\\", "n": "\n", "t": "\t", "r": "\r"}


def _unescape(s: str) -> str:
    """proper escape scanner (the old pair of str.replace calls mangled
    runs of backslashes like ``"\\\\\\"``)."""
    body, out, i = s[1:-1], [], 0
    while i < len(body):
        ch = body[i]
        if ch == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def parse_expr(src: str):
    p = Parser(tokenize(src))
    e = p.expr()
    if p.peek().kind != "eof":
        raise SyntaxError(f"OTTL: trailing input at {p.peek().text!r}")
    return e


def parse_statement(src: str) -> Statement:
    toks = tokenize(src)
    # split on top-level 'where' ident
    p = Parser(toks)
    ed = p.call()
    where = None
    t = p.peek()
    if t.kind == "ident" and t.text == "where":
        p.next()
        where = p.expr()
    if p.peek().kind != "eof":
        raise SyntaxError(f"OTTL: trailing input at {p.peek().text!r}")
    return Statement(ed, where)


# ---------------------------------------------------------------------------
# compiler
# ---------------------------------------------------------------------------

# log-context path → column resolver (ctxlog/log.go:27-78).  The engine
# promotes hot attributes to typed columns; `attributes["k"]` resolves
# to the promoted column when present, else to the `attributes` map.
_CTX_ALIASES = {
    "body": "text",
    "time": "log_ts",
    "observed_time": "warc_ts",
    "time_unix_nano": "log_ts",
    "observed_time_unix_nano": "warc_ts",
}

# span-context paths (pkg/ottl/contexts/ottlspan/span.go): the engine's
# canonical span frame is parse_otlp_traces' output, so single-segment
# paths alias to its columns and the reference's struct-valued paths
# (status.code / status.message, instrumentation_scope.name) resolve as
# two-segment flattened columns.  time paths alias the timestamp columns
# (the *_unix_nano and friendly forms name the same value, as in the
# log context above).
_SPAN_ALIASES = {
    "start_time": "start_ts",
    "end_time": "end_ts",
    "start_time_unix_nano": "start_ts",
    "end_time_unix_nano": "end_ts",
    "trace_state": "trace_state",
}
_SPAN_TWO_PART = {
    ("status", "code"): "status_code",
    ("status", "message"): "status_message",
    ("instrumentation_scope", "name"): "scope_name",
}

# datapoint-context paths (pkg/ottl/contexts/ottldatapoint/datapoint.go):
# over parse_otlp_metrics' number-point frame.  value_int and
# value_double both read the canonical double `value` column (proto
# NumberDataPoint oneof collapsed at parse time); metric.* paths are
# the enclosing-metric header columns.
_DP_ALIASES = {
    "time": "ts",
    "start_time": "start_ts",
    "time_unix_nano": "ts",
    "start_time_unix_nano": "start_ts",
    "value_double": "value",
    "value_int": "value",
}
_DP_TWO_PART = {
    ("metric", "name"): "metric_name",
    ("metric", "unit"): "unit",
    ("metric", "type"): "metric_type",
    ("metric", "aggregation_temporality"): "aggregation_temporality",
    ("metric", "is_monotonic"): "is_monotonic",
    ("instrumentation_scope", "name"): "scope_name",
}

# spanevent-context paths (pkg/ottl/contexts/ottlspanevent/
# span_events.go): over parse_otlp_spanevents' frame.  Bare paths name
# the EVENT (name/time/attributes/event_index); the enclosing span's
# fields resolve through `span.*` two- and three-segment paths.
_SPANEVENT_ALIASES = {
    "name": "event_name",
    "time": "ts",
    "time_unix_nano": "ts",
}
_SPANEVENT_TWO_PART = {
    ("span", "name"): "span_name",
    ("span", "kind"): "span_kind",
    ("span", "trace_id"): "trace_id",
    ("span", "span_id"): "span_id",
    ("span", "attributes"): "span_attributes",
    ("instrumentation_scope", "name"): "scope_name",
}
_SPANEVENT_THREE_PART = {
    ("span", "status", "code"): "status_code",
}

_CTX_TABLES = {
    "log": (_CTX_ALIASES, {}, {}),
    "span": (_SPAN_ALIASES, _SPAN_TWO_PART, {}),
    "datapoint": (_DP_ALIASES, _DP_TWO_PART, {}),
    "spanevent": (_SPANEVENT_ALIASES, _SPANEVENT_TWO_PART, _SPANEVENT_THREE_PART),
}


class Compiler:
    def __init__(
        self,
        df: DataFrame | None = None,
        error_mode: str = "propagate",
        attrs_cols: list[str] | None = None,
        ctx: str = "log",
    ):
        self.df = df
        self.columns = set(df.columns) if df is not None else None
        self.error_mode = error_mode
        self.ctx = ctx
        self.ctx_aliases, self.ctx_two_part, self.ctx_three_part = _CTX_TABLES[ctx]
        # promoted attribute columns: logical members of `attributes`
        # beyond the flat map (heterogeneous values live here)
        self.attrs_cols = list(attrs_cols or [])
        self.bindings: dict[str, object] = {}  # lambda params

    def _strip_ctx(self, parts: list) -> list:
        """Drop an explicit context-name prefix: since collector 0.120 the
        grammar requires `span.name` / `datapoint.value_double` / `log.body`
        (pkg/ottl/LANGUAGE.md "Context" section); both the prefixed and the
        historical bare form resolve to the same column."""
        if len(parts) >= 2 and parts[0] == self.ctx:
            return parts[1:]
        return parts

    def _col_dtype(self, name: str):
        if self.df is not None and name in self.df.columns:
            return self.df.schema[name].dataType
        return None

    def _apply_seg(self, base: Column, dt, seg):
        """apply one path segment to a column, tracking the schema type
        when known.  Mirrors the reference's key-type errors
        (pkg/ottl/contexts/internal/ctxutil key resolution)."""
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(seg, str):
            seg = ("key", seg)
        kind, val = seg[0], seg[1]
        if kind == "badidx":
            raise TypeError(
                "could not resolve key for map/slice, expecting 'int64' but got 'float64'"
            )
        if isinstance(dt, ArrayType):
            if kind == "key":
                # a string key into a slice of structs/maps is invalid in
                # the reference too — but arr[i]["name"] arrives as idx
                # then key; key-on-array only happens via bad statements
                raise TypeError("unable to resolve a string index in slice")
            if kind == "idx":
                return base.getItem(val), dt.elementType
            return F.get(base, _c(self.compile(val)).cast("int")), dt.elementType
        if isinstance(dt, MapType):
            if kind == "idx":
                raise TypeError("unable to resolve a string index in map: invalid key type")
            if kind == "key":
                return base.getItem(val), dt.valueType
            return F.element_at(base, _c(self.compile(val)).cast("string")), dt.valueType
        if isinstance(dt, StructType):
            if kind == "key":
                sub = next((f.dataType for f in dt.fields if f.name == val), None)
                return base.getItem(val), sub
            if kind == "idx":
                raise TypeError("unable to resolve an integer index in map: invalid key type")
            raise TypeError(
                "dynamic keys into struct-typed attributes are not supported "
                "(documented divergence: promoted heterogeneous trees are structs)"
            )
        if dt is not None:
            # known SCALAR type: indexing into it is a runtime nil in the
            # reference ("complex indexing not found", e2e features table)
            return F.lit(None), None
        # unknown type: best effort (pre-schema compile)
        if kind == "key":
            return base.getItem(val), None
        if kind == "idx":
            return base.getItem(val), None
        return F.element_at(base, _c(self.compile(val)).cast("string")), None

    # path → Column
    def resolve_path(self, p: Path) -> Column:
        parts = self._strip_ctx(p.parts)
        head = parts[0]
        if head == "_":
            raise SyntaxError("expression has invalid syntax: blank identifier in body")
        if head in self.bindings:  # lambda parameter
            v = self.bindings[head]
            for seg in parts[1:]:
                v, _dt = self._apply_seg(_c(v), None, seg)
            return v if len(parts) > 1 else v
        if head == "cache":
            assert len(parts) == 2 and isinstance(parts[1], tuple)
            return F.col(f"_cache_{parts[1][1]}")
        if head == "resource" and len(parts) >= 2 and parts[1] == "attributes":
            if len(parts) == 2:
                return F.col("resource")
            seg = parts[2]
            if isinstance(seg, tuple) and seg[0] == "key":
                name = f"resource_{seg[1]}"
                if self.columns is None or name in self.columns:
                    base, dt = F.col(name), self._col_dtype(name)
                else:
                    base, dt = F.col("resource").getItem(seg[1]), None
            else:
                base, dt = self._apply_seg(
                    F.col("resource"), self._col_dtype("resource"), seg
                )
            for s in parts[3:]:
                base, dt = self._apply_seg(base, dt, s)
            return base
        if head == "attributes":
            if len(parts) == 1:
                return F.col("attributes")
            seg = parts[1]
            if isinstance(seg, tuple) and seg[0] == "key":
                key = seg[1]
                if self.columns is None or key in self.columns:
                    base, dt = F.col(key), self._col_dtype(key)
                else:
                    mdt = self._col_dtype("attributes")
                    base, dt = (
                        F.col("attributes").getItem(key),
                        mdt.valueType if mdt is not None else None,
                    )
            else:
                base, dt = self._apply_seg(
                    F.col("attributes"), self._col_dtype("attributes"), seg
                )
            for s in parts[2:]:
                base, dt = self._apply_seg(base, dt, s)
            return base
        if (
            len(parts) >= 3
            and isinstance(parts[1], str)
            and isinstance(parts[2], str)
            and (head, parts[1], parts[2]) in self.ctx_three_part
        ):
            name = self.ctx_three_part[(head, parts[1], parts[2])]
            base, dt = F.col(name), self._col_dtype(name)
            for s in parts[3:]:
                if isinstance(s, tuple):
                    base, dt = self._apply_seg(base, dt, s)
                else:
                    base, dt = self._apply_seg(base, dt, ("key", s))
            return base
        if (
            len(parts) >= 2
            and isinstance(parts[1], str)
            and (head, parts[1]) in self.ctx_two_part
        ):
            name = self.ctx_two_part[(head, parts[1])]
            base, dt = F.col(name), self._col_dtype(name)
            for s in parts[2:]:
                if isinstance(s, tuple):
                    base, dt = self._apply_seg(base, dt, s)
                else:
                    base, dt = self._apply_seg(base, dt, ("key", s))
            return base
        name = self.ctx_aliases.get(head, head)
        # alias targets assume the flagship frame (log `body` → pages
        # `text`); a frame carrying the OTTL name itself (the OTLP/JSON
        # log frame's literal `body` column) wins when the alias target
        # is absent
        if (
            self.columns is not None
            and name != head
            and name not in self.columns
            and head in self.columns
        ):
            name = head
        if len(parts) == 2 and parts[1] == "string":  # body.string / trace_id.string
            return F.col(name).cast("string")
        base, dt = F.col(name), self._col_dtype(name)
        for s in parts[1:]:
            if isinstance(s, tuple):
                base, dt = self._apply_seg(base, dt, s)
            else:
                base, dt = self._apply_seg(base, dt, ("key", s))
        return base

    def path_target_name(self, p: Path) -> str:
        """Column a `set()` writes to (promoted-column model)."""
        parts = self._strip_ctx(p.parts)
        head = parts[0]
        if head == "attributes" and len(parts) == 2:
            return parts[1][1]
        if head == "resource" and len(parts) > 2:
            return f"resource_{parts[2][1]}"
        if head == "cache" and len(parts) == 2:
            return f"_cache_{parts[1][1]}"
        if (
            len(parts) == 3
            and isinstance(parts[1], str)
            and isinstance(parts[2], str)
            and (head, parts[1], parts[2]) in self.ctx_three_part
        ):
            return self.ctx_three_part[(head, parts[1], parts[2])]
        if (
            len(parts) == 2
            and isinstance(parts[1], str)
            and (head, parts[1]) in self.ctx_two_part
        ):
            return self.ctx_two_part[(head, parts[1])]
        name = self.ctx_aliases.get(head, head)
        # alias targets assume the flagship frame's column names (log
        # `body` → pages `text`); a frame carrying the OTTL name itself
        # (the OTLP/JSON log frame has a literal `body` column) wins
        # when the alias target is absent
        if (
            self.columns is not None
            and name != head
            and name not in self.columns
            and head in self.columns
        ):
            return head
        return name

    def compile(self, node) -> Column | object:
        """Returns a Column, or a python literal for Lit nodes."""
        if isinstance(node, Lit):
            return node.value
        if isinstance(node, Path):
            return self.resolve_path(node)
        if isinstance(node, Call):
            return self.compile_call(node)
        if isinstance(node, Not):
            return ~_c(self.compile(node.operand))
        if isinstance(node, BinOp):
            return self.compile_binop(node)
        if isinstance(node, ListLit):
            items = [self.compile(i) for i in node.items]
            if any(isinstance(i, Column) for i in items):
                return F.array(*[_c(i) for i in items])
            return items  # python list — converters can inspect elements
        if isinstance(node, MapLit):
            entries = [(k, self.compile(v)) for k, v in node.entries]
            if all(not isinstance(v, Column) for _, v in entries):
                return dict(entries)  # plan-time constant (compile-time map)
            # column-valued entries: struct keeps heterogeneous field types
            return F.struct(*[_c(v).alias(k) for k, v in entries])
        if isinstance(node, Lambda):
            return node  # consumed by Eval
        if isinstance(node, Index):
            target = _c(self.compile(node.target))
            key = self.compile(node.key)
            if self.df is not None:
                from pyspark.sql.types import ArrayType, MapType, StructType

                tdt = self.df.select(target).schema[0].dataType
                if not isinstance(tdt, (ArrayType, MapType, StructType)):
                    # indexing into a scalar value: runtime nil in the
                    # reference ("complex indexing not found")
                    return None
            if isinstance(key, int):
                return target.getItem(key)  # 0-based slice access
            if isinstance(key, str):
                return target.getItem(key)  # map key
            # dynamic (column) key: map-producing converters take string
            # keys via element_at; everything else is a 0-based slice
            is_map = isinstance(node.target, Call) and node.target.name in _MAP_PRODUCERS
            if is_map:
                return F.element_at(target, key.cast("string"))
            return F.get(target, key.cast("int"))
        raise TypeError(node)

    def compile_bool(self, node) -> Column:
        return _c(self.compile(node))

    def compile_binop(self, node: BinOp) -> Column:
        left, right = self.compile(node.left), self.compile(node.right)
        if not isinstance(left, Column) and not isinstance(right, Column):
            # constant folding, like the reference's Go-compile-time consts;
            # stays a python literal (no SparkContext needed at plan time).
            # OTTL math rules (LANGUAGE.md:198-220): mixing int64 and
            # float64 is an ERROR, and int/int division follows Go
            # (truncates toward zero).
            if node.op in ("+", "-", "*", "/"):
                li = isinstance(left, int) and not isinstance(left, bool)
                ri = isinstance(right, int) and not isinstance(right, bool)
                lnum = li or isinstance(left, float)
                rnum = ri or isinstance(right, float)
                if not (lnum and rnum):
                    # math.go attemptMathOperation default branch:
                    # strings/bools/maps/slices don't do arithmetic
                    # (mixed int64/float64 DOES coerce to float64 —
                    # math.go:130-148; LANGUAGE.md's "mixing is an
                    # error" note is stale vs the implementation)
                    raise TypeError(
                        f"unsupported math operation on type "
                        f"{type(left).__name__}/{type(right).__name__}"
                    )
                if node.op == "/" and li and ri:
                    if right == 0:
                        raise ZeroDivisionError("math expression divide by zero")
                    q = abs(left) // abs(right)
                    return q if (left < 0) == (right < 0) else -q
            if node.op in ("==", "!=", "<", "<=", ">", ">="):
                return _lattice_compare(node.op, left, right)
            return _PYOPS[node.op](left, right)
        # timestamp - timestamp → Duration (seconds double), so
        # `Time(..) - Time(..) < Duration("10m")` compares in one unit
        # (Go: time.Sub yields time.Duration)
        if node.op == "-" and _is_ts_node(node.left) and _is_ts_node(node.right):
            return (
                F.unix_micros(_c(left).cast("timestamp"))
                - F.unix_micros(_c(right).cast("timestamp"))
            ).cast("double") / F.lit(1000000.0)
        # time.Time ± time.Duration → time.Time (LANGUAGE.md:203-209);
        # durations are seconds-double in this engine
        if node.op in ("+", "-"):
            lt, rt = _is_ts_node(node.left), _is_ts_node(node.right)
            ld, rd = _is_dur_node(node.left), _is_dur_node(node.right)
            if (lt and rd) or (node.op == "+" and ld and rt):
                ts_v, dur_v = (left, right) if lt else (right, left)
                us = (_c(dur_v) * F.lit(1000000.0)).cast("long")
                base = F.unix_micros(_c(ts_v).cast("timestamp"))
                return F.timestamp_micros(
                    base + us if node.op == "+" else base - us
                )
        # `x == nil` / `x != nil`: OTTL nil equality is a null test, not
        # SQL three-valued NULL comparison (LANGUAGE.md nil semantics)
        if right is None and node.op in ("==", "!="):
            col = _c(left)
            return col.isNull() if node.op == "==" else col.isNotNull()
        if left is None and node.op in ("==", "!="):
            col = _c(right)
            return col.isNull() if node.op == "==" else col.isNotNull()
        lc, rc = _c(left), _c(right)
        if node.op == "/" and self.df is not None:
            # Go integer division when both sides are integral
            # (LANGUAGE.md:220); Spark's `/` always yields double, so
            # truncate toward zero via the double→long cast (documented
            # precision caveat above 2^53)
            from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

            ints = (ByteType, ShortType, IntegerType, LongType)

            def _dt(v, node_side):
                if isinstance(v, Column):
                    try:
                        return self.df.select(v).schema[0].dataType
                    except Exception:
                        return None
                return (
                    LongType()
                    if isinstance(v, int) and not isinstance(v, bool)
                    else None
                )

            ldt, rdt = _dt(left, node.left), _dt(right, node.right)
            if isinstance(ldt, ints) and isinstance(rdt, ints):
                # Documented divergence (error form, not value): the
                # reference errors on x/0 wherever it occurs.  Plan-time
                # constant folding mirrors that exactly (ZeroDivisionError
                # at compile); a RUNTIME zero divisor yields NULL — the
                # engine's per-row error form (non-ANSI Spark `/`), the
                # same form every other per-row OTTL error takes here.
                # NULL then propagates/drops per the statement's error
                # mode, matching the reference's ignore/silent modes;
                # callers needing propagate-parity run under ANSI mode
                # (spark.sql.ansi.enabled), which raises instead.
                return (lc / rc).cast("long")
        return _COLOPS[node.op](lc, rc)

    def compile_call(self, node: Call) -> Column:
        if node.name == "Eval":
            return self._compile_eval(node)
        special = _AST_FUNCS.get(node.name)
        if special is not None:
            out = special(self, node)
            if out is not NotImplemented:
                return out
        args = [self.compile(a) for a in node.args]
        kwargs = {k: self.compile(v) for k, v in node.kwargs.items()}
        fold = _PYFOLD.get(node.name)
        if fold is not None and not kwargs and all(
            not isinstance(a, Column) for a in args
        ):
            # compile-time constant evaluation, like the reference's
            # Go-side literal arguments (exprs resolved at parse time)
            if node.name in _PYFOLD_SOFT:
                try:
                    return fold(*args)
                except (ValueError, TypeError):
                    pass  # → column path (try_cast null-on-error)
            else:
                return fold(*args)
        fn = FUNCS.get(node.name)
        if fn is None:
            raise NameError(f"OTTL converter not implemented: {node.name}")
        if kwargs:
            return fn(self, args, **kwargs)
        return fn(self, args)

    def _compile_eval(self, node: Call) -> Column:
        """Eval((params) => body, [args]) — inline beta-reduction; the
        reference gates this behind a feature flag
        (e2e_test.go Test_e2e_lambda_expression)."""
        lam = node.args[0]
        if not isinstance(lam, Lambda):
            raise SyntaxError("Eval: first argument must be a lambda")
        vals = node.args[1]
        vals = vals.items if isinstance(vals, ListLit) else [vals]
        if len(lam.params) != len(vals):
            raise SyntaxError(
                f"lambda should be defined with exactly {len(vals)} formal(s), "
                f"but has {len(lam.params)}"
            )
        saved = dict(self.bindings)
        try:
            for p, v in zip(lam.params, vals):
                if p != "_":
                    self.bindings[p] = self.compile(v)
            return self.compile(lam.body)
        finally:
            self.bindings = saved


# converters whose result is a map (for dynamic-key postfix indexing)
_MAP_PRODUCERS = {
    "SliceToMap", "ParseKeyValue", "ParseJSON", "UserAgent",
    "ExtractPatterns", "ExtractGrokPatterns", "ParseCSV",
    "ParseSimplifiedXML",
}


_TS_CALLS = {"Time", "Now", "TruncateTime", "Time_", "ObservedTime"}
_TS_PATHS = {"time", "observed_time", "start_time", "end_time"}


def _is_dur_node(node) -> bool:
    """static check: does this AST node produce a time.Duration
    (seconds-double in this engine)?  Duration(...) calls, ts − ts
    differences, and ±-combinations of durations."""
    if isinstance(node, Call):
        return node.name == "Duration"
    if isinstance(node, BinOp):
        if node.op == "-" and _is_ts_node(node.left) and _is_ts_node(node.right):
            return True
        if node.op in ("+", "-") and _is_dur_node(node.left) and _is_dur_node(node.right):
            return True
    return False


def _is_ts_node(node) -> bool:
    """static check: does this AST node produce a timestamp?  Covers the
    bare paths and their context-prefixed spellings (span.start_time −
    span.end_time is the signaltometrics README's canonical duration
    expression)."""
    if isinstance(node, Call):
        return node.name in _TS_CALLS
    if isinstance(node, Path):
        parts = [p for p in node.parts if isinstance(p, str)]
        if len(parts) == 2 and parts[0] in ("span", "log", "spanevent", "datapoint"):
            parts = parts[1:]
        return len(parts) == 1 and parts[0] in _TS_PATHS
    return False


def _go_str(v) -> str:
    """pcommon.Value.AsString, for plan-time folding (bools lowercase,
    bytes → "[1,2,3]" like the Go fmt of []byte via String())."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (bytes, bytearray)):
        return "[" + ",".join(str(b) for b in v) + "]"
    if isinstance(v, float):
        return repr(v) if v != int(v) else str(int(v))
    if isinstance(v, list):
        return "[" + ",".join(_go_str(x) for x in v) + "]"
    if isinstance(v, dict):
        import json

        return json.dumps(v, separators=(",", ":"))
    return str(v)


def _py_sort(lst: list, order: str = "asc") -> list:
    """func_sort.go: common type int → int sort; numeric mix → double;
    any str/bool/nil present → string sort on AsString keys, original
    values preserved."""
    if not lst:
        return lst
    if any(isinstance(v, (str, bool)) or v is None for v in lst):
        key = _go_str
    elif any(isinstance(v, float) for v in lst):
        key = float
    else:
        key = int
    return sorted(lst, key=key, reverse=(order == "desc"))


def _py_slice_to_map(lst: list, key_path=None, value_path=None):
    out = {}
    for i, v in enumerate(lst):
        if key_path:
            if not isinstance(v, dict) or key_path[0] not in v:
                raise ValueError("could not extract key from element")
            k = str(v[key_path[0]])
        else:
            k = str(i)
        if value_path:
            if not isinstance(v, dict) or value_path[0] not in v:
                raise ValueError("provided object does not contain the path")
            out[k] = v[value_path[0]]
        else:
            out[k] = v
    return out


def _py_bool(v):
    """strconv.ParseBool semantics (func_boolean.go)."""
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0
    s = str(v)
    if s in ("1", "t", "T", "true", "TRUE", "True"):
        return True
    if s in ("0", "f", "F", "false", "FALSE", "False"):
        return False
    raise ValueError(f"invalid bool syntax: {s!r}")


def _py_parse_json(s: str):
    """pcommon JSON parsing: numbers land as f64 (PutDouble)."""
    import json

    def conv(v):
        if isinstance(v, bool):
            return v
        if isinstance(v, int):
            return float(v)
        if isinstance(v, list):
            return [conv(x) for x in v]
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        return v

    return conv(json.loads(s))


# plan-time implementations used when every argument is a python
# literal — mirrors the reference evaluating literal args eagerly
_PYFOLD = {
    "Concat": lambda vals, delim: delim.join(_go_str(v) for v in vals),
    "Len": lambda v: len(v),
    "IsMap": lambda v: isinstance(v, dict),
    "IsList": lambda v: isinstance(v, list),
    "IsBool": lambda v: isinstance(v, bool),
    "IsDouble": lambda v: isinstance(v, float) and not isinstance(v, bool),
    "IsString": lambda v: isinstance(v, str),
    "IsInt": lambda v: isinstance(v, int) and not isinstance(v, bool),
    "Sort": _py_sort,
    "String": _go_str,
    "Keys": lambda m: list(m.keys()),
    "Values": lambda m: list(m.values()),
    "ContainsValue": lambda lst, v: v in lst,
    "SliceToMap": _py_slice_to_map,
    "ParseJSON": _py_parse_json,
    "Split": lambda s, d: s.split(d),
    "Index": lambda t, v: (t.find(v) if isinstance(t, str) else (t.index(v) if v in t else -1)),
    "Int": lambda v: int(v) if not isinstance(v, str) else int(v, 10),
    "Double": lambda v: float(v),
    "Bool": _py_bool,
}

# folds whose failure falls through to the column path (try_cast null
# semantics) instead of erroring at plan time
_PYFOLD_SOFT = {"Int", "Double", "Bool"}


def _ast_len(comp: "Compiler", node: Call):
    """Len needs the logical attribute set: Len(attributes) counts map
    keys + promoted columns; Len of a promoted struct column is its
    field count (plan-time schema fact)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if len(node.args) != 1 or not isinstance(node.args[0], Path):
        return NotImplemented
    p = node.args[0]
    if p.parts == ["attributes"]:
        if comp.attrs_cols:
            return F.size(F.col("attributes")) + F.lit(len(comp.attrs_cols))
        return F.size(F.col("attributes"))
    col = comp.resolve_path(p)
    # typed targets: struct → field count (plan-time schema fact);
    # array/map → size
    if comp.df is not None and len(p.parts) == 2 and p.parts[0] == "attributes":
        seg = p.parts[1]
        if isinstance(seg, tuple) and seg[0] == "key" and seg[1] in comp.df.columns:
            dt = comp.df.schema[seg[1]].dataType
            if isinstance(dt, StructType):
                return len(dt.fields)
            if isinstance(dt, (ArrayType, MapType)):
                return F.size(col)
    return NotImplemented


def _ast_substring(comp: "Compiler", node: Call):
    """Substring 4-arg byte mode (func_substring.go: offsets are BYTES,
    result truncated to whole runes; out-of-range errors)."""
    if len(node.args) != 4:
        return NotImplemented
    args = [comp.compile(a) for a in node.args]
    if any(isinstance(a, Column) for a in args):
        return NotImplemented
    s, start, length, by_bytes = args
    if not by_bytes:
        return s[start : start + length]
    raw = s.encode("utf-8")
    if start < 0 or length < 0 or start + length > len(raw):
        raise ValueError("invalid range for substring function")
    return raw[start : start + length].decode("utf-8", errors="ignore")


def _ast_index(comp: "Compiler", node: Call):
    """Index(target, value) — position of value in a slice / substring
    offset in a string, -1 when absent (func_index.go).  Resolves the
    target's Spark type via a plan-time schema probe."""
    from pyspark.sql.types import ArrayType, StringType

    if len(node.args) != 2:
        return NotImplemented
    t = comp.compile(node.args[0])
    v = comp.compile(node.args[1])
    if not isinstance(t, Column):
        return NotImplemented  # python literal → _PYFOLD
    if comp.df is None:
        return NotImplemented
    dt = comp.df.select(_c(t)).schema[0].dataType
    if isinstance(dt, ArrayType):
        return (
            F.array_position(t, _c(v).cast(dt.elementType.simpleString())) - 1
        ).cast("bigint")
    if isinstance(dt, StringType):
        return (F.instr(t, _c(v).cast("string")) - 1).cast("bigint")
    return NotImplemented


# converters that need the raw AST (schema facts, plan-time byte math);
# NotImplemented falls through to the normal compile path
def _bytes_as_string(col: Column) -> Column:
    """pcommon String() of a byte id: "[1,2,3,...]" (Go []byte fmt)."""
    pairs = F.regexp_extract_all(F.hex(col), F.lit("(..)"), F.lit(1))
    return F.concat(
        F.lit("["),
        F.array_join(F.transform(pairs, lambda p: F.conv(p, 16, 10)), ","),
        F.lit("]"),
    )


def _ast_string(comp: "Compiler", node: Call):
    """String() of binary ids renders the Go byte-slice form; the
    hex-string id columns (trace_id/span_id paths) take the same form
    (pkg/ottl String() via pcommon.Value AsString)."""
    from pyspark.sql.types import BinaryType

    if len(node.args) != 1:
        return NotImplemented
    arg = node.args[0]
    if isinstance(arg, Path) and arg.parts[0] in ("trace_id", "span_id"):
        return _bytes_as_string(F.unhex(comp.resolve_path(arg)))
    if isinstance(arg, Call) and arg.name in ("SpanID", "TraceID", "ProfileID"):
        return _bytes_as_string(F.unhex(_c(comp.compile(arg))))
    v = comp.compile(arg)
    if isinstance(v, Column) and comp.df is not None:
        if isinstance(comp.df.select(v).schema[0].dataType, BinaryType):
            return _bytes_as_string(v)
    return NotImplemented


def _ast_truncate_time(comp: "Compiler", node: Call):
    """TruncateTime(ts, Duration(lit)) — fold the duration literal into
    a date_trunc unit at plan time (func_truncate_time.go)."""
    if len(node.args) != 2:
        return NotImplemented
    d = node.args[1]
    if (
        isinstance(d, Call)
        and d.name == "Duration"
        and len(d.args) == 1
        and isinstance(d.args[0], Lit)
    ):
        return F.date_trunc(_duration_unit(d.args[0].value), _c(comp.compile(node.args[0])))
    return NotImplemented


def _ast_hex(comp: "Compiler", node: Call):
    """Hex() of an id value: the reference hex-encodes the raw id bytes
    (func_hex.go []byte branch); the engine already models ids as
    lowercase hex strings, so the id form passes through unchanged."""
    if len(node.args) != 1:
        return NotImplemented
    arg = node.args[0]
    if isinstance(arg, Path) and arg.parts[0] in ("trace_id", "span_id"):
        return F.lower(comp.resolve_path(arg))
    if isinstance(arg, Call) and arg.name in ("SpanID", "TraceID", "ProfileID"):
        return _c(comp.compile(arg))
    return NotImplemented


_AST_FUNCS = {
    "Hex": _ast_hex,
    "Len": _ast_len,
    "Substring": _ast_substring,
    "Index": _ast_index,
    "TruncateTime": _ast_truncate_time,
    "String": _ast_string,
}


def _het_class(x) -> str:
    """type class for slice-homogeneity: numeric int/float unify, bool
    does not (it would silently become 0/1)."""
    if isinstance(x, bool):
        return "bool"
    if isinstance(x, (int, float)):
        return "num"
    if isinstance(x, dict):
        import json

        return "map:" + json.dumps(
            sorted((k, _het_class(val)) for k, val in x.items())
        )
    if isinstance(x, list):
        return "slice"
    return type(x).__name__


def _c(v) -> Column:
    if isinstance(v, Column):
        return v
    if isinstance(v, list):
        # heterogeneous literal slices can't exist in Spark — their
        # elements take the pcommon AsString form (documented divergence;
        # typed pcommon slices keep per-element types in the reference)
        if len({_het_class(x) for x in v if x is not None}) > 1:
            return F.array(*[F.lit(_go_str(x)) for x in v])
        return F.array(*[_c(x) for x in v])
    if isinstance(v, dict):
        vals = list(v.values())
        types = {type(x) for x in vals}
        if len(types) == 1 and types != {dict} and types != {list}:
            return F.create_map(*[x for k, val in v.items() for x in (F.lit(k), _c(val))])
        if not v:
            return F.create_map().cast("map<string,string>")
        # heterogeneous values → struct (field per key, typed)
        return F.struct(*[_c(val).alias(k) for k, val in v.items()])
    return F.lit(v)


def _lattice_compare(op: str, a, b) -> bool:
    """LANGUAGE.md:263-291 comparison table for plan-time literals:
    mismatched base types are 'not equal' (only != is true); mixed
    numerics compare as float64; bool is NOT a numeric (true == 1 is
    not equal, unlike Python); same-type values compare normally with
    bools ordered T>F; maps/slices support equality only."""

    def cls(v):
        if isinstance(v, bool):
            return "bool"
        if isinstance(v, (int, float)):
            return "num"
        if isinstance(v, str):
            return "str"
        if isinstance(v, (bytes, bytearray)):
            return "bytes"
        if v is None:
            return "nil"
        return "other"

    ca, cb = cls(a), cls(b)
    if ca != cb:
        return op == "!="
    if ca == "nil":  # "true for equality only"
        return op == "=="
    if ca == "other":  # maps/slices: deep equality only
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        return False
    if ca == "bool":
        a, b = int(a), int(b)  # false < true
    return _PYOPS[op](a, b)


_PYOPS = {
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    "+": lambda a, b: a + b, "-": lambda a, b: a - b,
    "*": lambda a, b: a * b, "/": lambda a, b: a / b,
    "and": lambda a, b: a and b, "or": lambda a, b: a or b,
}
_COLOPS = {
    "==": lambda a, b: a.eqNullSafe(b) if False else a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    "+": lambda a, b: a + b, "-": lambda a, b: a - b,
    "*": lambda a, b: a * b, "/": lambda a, b: a / b,
    "and": lambda a, b: a & b, "or": lambda a, b: a | b,
}


# ---------------------------------------------------------------------------
# converter registry (pkg/ottl/ottlfuncs/functions.go:11-141 subset)
# ---------------------------------------------------------------------------

def _lit_arg(v, what: str) -> object:
    if isinstance(v, Column):
        raise ValueError(f"OTTL: {what} must be a literal")
    return v


FUNCS: dict = {}


def _reg(name):
    def deco(f):
        FUNCS[name] = f
        return f

    return deco


def _is_root_span(c, a):
    """IsRootSpan() — true when the span's parent id is empty
    (pkg/ottl/ottlfuncs/func_is_root_span.go: ParentSpanID().IsEmpty()).
    Over the span frame the empty pdata id is an absent, empty, or
    all-zero hex string."""
    if c.ctx != "span":
        raise NameError("IsRootSpan is only available in the span context")
    p = F.col("parent_span_id")
    return p.isNull() | (p == "") | (p == "0000000000000000")


_reg("IsRootSpan")(_is_root_span)


def _adjusted_count(c, a):
    """AdjustedCount() — signaltometricsconnector's custom span
    converter (connector/signaltometricsconnector/internal/customottl/
    adjustedcount.go): the inverse sampling probability encoded as the
    OTel ``th`` T-value inside the W3C tracestate's ``ot`` member
    (pkg/sampling/threshold.go: AdjustedCount =
    2^56 / (2^56 − threshold)).  Missing tracestate / ot member / empty
    T-value → 1 (non-probabilistic).  The reference errors (→ 0) on a
    syntactically invalid W3C tracestate; here an unparseable
    tracestate is treated as absent (→ 1) — regex extraction can't
    distinguish 'no ot member' from 'malformed list'."""
    if c.ctx != "span":
        raise NameError("AdjustedCount is only available in the span context")
    ts = (
        F.coalesce(F.col("trace_state"), F.lit(""))
        if c.columns and "trace_state" in c.columns
        else F.lit("")
    )
    ot = F.regexp_extract(ts, r"(?:^|,)\s*ot=([^,]*)", 1)
    tv = F.regexp_extract(ot, r"(?:^|;)th:([0-9a-f]{1,14})", 1)
    # exact integer threshold (≤ 2^56 fits a long), then one
    # double-divide like the Go float64(max)/float64(max−unsigned)
    unsigned = F.conv(F.rpad(tv, 14, "0"), 16, 10).cast("long")
    two56 = 1 << 56
    return F.when(tv == "", F.lit(1.0)).otherwise(
        F.lit(float(two56)) / (F.lit(two56) - unsigned).cast("double")
    )


_reg("AdjustedCount")(_adjusted_count)


def _concat(c, a):
    """Concat([values], delimiter) — the reference signature
    (func_concat.go, delimiter may be dynamic) — plus the legacy
    varargs+literal-delimiter form used by older statements here."""
    if len(a) == 2 and isinstance(a[0], (list, Column)):
        arr = _c(a[0]) if isinstance(a[0], list) else a[0]
        arr = F.transform(arr, lambda x: x.cast("string"))
        delim = a[1]
        if isinstance(delim, Column):
            return F.call_function("array_join", arr, delim)
        return F.array_join(arr, delim)
    return F.concat_ws(
        _lit_arg(a[-1], "delimiter"), *[_c(x).cast("string") for x in a[:-1]]
    )


_reg("Concat")(_concat)
_reg("Len")(lambda c, a: F.length(_c(a[0])))
_reg("Substring")(lambda c, a: F.substring(_c(a[0]), _lit_arg(a[1], "start") + 1, _lit_arg(a[2], "length")))
def _split(c, a):
    # dynamic delimiter: regex-quote with \Q..\E so the JVM regex treats
    # the runtime value literally (func_split.go splits on a plain string)
    if isinstance(a[1], Column):
        return F.split(_c(a[0]), F.concat(F.lit("\\Q"), a[1], F.lit("\\E")))
    return F.split(_c(a[0]), re.escape(_lit_arg(a[1], "delimiter")))


_reg("Split")(_split)
_reg("Trim")(lambda c, a: F.btrim(_c(a[0]), _c(a[1]) if len(a) > 1 else F.lit(" ")))
_reg("ToUpperCase")(lambda c, a: F.upper(_c(a[0])))
_reg("ToLowerCase")(lambda c, a: F.lower(_c(a[0])))
_reg("ToSnakeCase")(lambda c, a: F.lower(F.regexp_replace(_c(a[0]), r"([a-z0-9])([A-Z])", r"$1_$2")))
_reg("HasPrefix")(lambda c, a: F.startswith(_c(a[0]), _c(a[1])))
_reg("HasSuffix")(lambda c, a: F.endswith(_c(a[0]), _c(a[1])))
_reg("IsMatch")(
    lambda c, a: F.regexp_like(_c(a[0]), a[1])
    if isinstance(a[1], Column)
    else _c(a[0]).rlike(_lit_arg(a[1], "pattern"))
)
_reg("IsString")(lambda c, a: F.lit(True))  # typed columns: statically known
def _coalesce(c, a):
    """Coalesce([a, b, ...]) list form (func_coalesce.go) + varargs."""
    if len(a) == 1 and isinstance(a[0], list):
        return F.coalesce(*[_c(x) for x in a[0]])
    if len(a) == 1 and isinstance(a[0], Column):
        # list literal with column members compiles to an array column:
        # first non-null element
        return F.element_at(F.array_compact(a[0]), 1)
    return F.coalesce(*[_c(x) for x in a])


_reg("Coalesce")(_coalesce)
_reg("Int")(lambda c, a: _c(a[0]).try_cast("bigint"))
_reg("Double")(lambda c, a: _c(a[0]).try_cast("double"))
_reg("String")(lambda c, a: _c(a[0]).cast("string"))
_reg("Bool")(lambda c, a: _c(a[0]).try_cast("boolean"))
_reg("SHA256")(lambda c, a: F.sha2(_c(a[0]).cast("string"), 256))
_reg("SHA512")(lambda c, a: F.sha2(_c(a[0]).cast("string"), 512))
_reg("SHA1")(lambda c, a: F.sha1(_c(a[0]).cast("string")))
_reg("MD5")(lambda c, a: F.md5(_c(a[0]).cast("string")))
def _hex(c, a):
    """Hex() — Go encoding semantics per input type (func_hex.go):
    float64 → IEEE-754 bits, bool → 00/01, int → 8 BE bytes, string →
    utf8 bytes.  Literals get the exact Go encoding; column inputs use
    Spark's hex (string/binary bytes), the dominant telemetry case."""
    v = a[0]
    if not isinstance(v, Column):
        import struct as _struct

        if isinstance(v, bool):
            return F.lit("01" if v else "00")
        if isinstance(v, float):
            return F.lit(_struct.pack(">d", v).hex())
        if isinstance(v, int):
            return F.lit(v.to_bytes(8, "big", signed=True).hex())
        return F.lit(str(v).encode("utf-8").hex())
    if c is not None and getattr(c, "df", None) is not None:
        from pyspark.sql.types import IntegerType, LongType

        dt = c.df.select(v).schema[0].dataType
        if isinstance(dt, (IntegerType, LongType)):
            # Go encodes int64 as 8 BE bytes — zero-pad to 16 hex chars
            return F.lpad(F.lower(F.hex(v.cast("bigint"))), 16, "0")
    return F.lower(F.hex(v))


_reg("Hex")(_hex)
_reg("FNV")(lambda c, a: _U().fnv_hash(_c(a[0]).cast("string")))  # exact FNV-1a 64 (func_fnv.go)
_reg("Log")(lambda c, a: F.log(_c(a[0])))
_reg("Year")(lambda c, a: F.year(_c(a[0])))
_reg("Month")(lambda c, a: F.month(_c(a[0])))
_reg("Day")(lambda c, a: F.dayofmonth(_c(a[0])))
_reg("Hour")(lambda c, a: F.hour(_c(a[0])))
_reg("Minute")(lambda c, a: F.minute(_c(a[0])))
_reg("Second")(lambda c, a: F.second(_c(a[0])))
_reg("Weekday")(lambda c, a: F.dayofweek(_c(a[0])) - 1)
_reg("TruncateTime")(lambda c, a: F.date_trunc(_duration_unit(_lit_arg(a[1], "duration")), _c(a[0])))
_reg("Time")(lambda c, a: F.try_to_timestamp(_c(a[0]), F.lit(_strp(_lit_arg(a[1], "format")))))
_reg("FormatTime")(lambda c, a: F.date_format(_c(a[0]), _strp(_lit_arg(a[1], "format"))))
_reg("UnixSeconds")(lambda c, a: F.unix_timestamp(_c(a[0])))
_reg("UnixMilli")(lambda c, a: F.unix_millis(_c(a[0])))
_reg("UnixMicro")(lambda c, a: F.unix_micros(_c(a[0])))
_reg("UnixNano")(lambda c, a: F.unix_micros(_c(a[0])) * 1000)
def _parse_int(c, a):
    """ParseInt(target[, base]) — Go strconv.ParseInt semantics
    (func_parse_int.go): base 0 auto-detects 0x/0o/0b prefixes."""
    base = _lit_arg(a[1], "base") if len(a) > 1 else 10
    col = _c(a[0]).cast("string")
    if base == 10:
        return col.try_cast("bigint")
    if base == 0:
        hexed = F.conv(F.substring(col, 3, 2 ** 31 - 1), 16, 10).cast("bigint")
        octed = F.conv(F.substring(col, 3, 2 ** 31 - 1), 8, 10).cast("bigint")
        bined = F.conv(F.substring(col, 3, 2 ** 31 - 1), 2, 10).cast("bigint")
        return (
            F.when(col.rlike("^0[xX]"), hexed)
            .when(col.rlike("^0[oO]"), octed)
            .when(col.rlike("^0[bB]"), bined)
            .otherwise(col.try_cast("bigint"))
        )
    return F.conv(col, base, 10).cast("bigint")


_reg("ParseInt")(_parse_int)
_reg("Base64Encode")(lambda c, a: F.base64(_c(a[0]).cast("binary")))
_reg("Base64Decode")(lambda c, a: F.unbase64(_c(a[0])).cast("string"))
_reg("URL")(lambda c, a: F.parse_url(_c(a[0]), _c(a[1]) if len(a) > 1 else F.lit("HOST")))
_reg("Keys")(lambda c, a: F.array_sort(F.map_keys(_c(a[0]))))
_reg("Values")(lambda c, a: F.map_values(_c(a[0])))
_reg("Sort")(
    lambda c, a: F.sort_array(
        _c(a[0]), asc=(len(a) < 2 or _lit_arg(a[1], "order") != "desc")
    )
)
_reg("ParseJSON")(lambda c, a: F.from_json(_c(a[0]), "map<string,string>"))
def _parse_key_value(c, a):
    """ParseKeyValue(target[, kvDelim][, pairDelim]) — quote-aware pair
    split (func_parse_key_value.go → parseutils.ParseKeyValuePairs:
    double-quoted values may contain both delimiters; quotes strip)."""
    kv = re.escape(_lit_arg(a[1], "delimiter") if len(a) > 1 else "=")
    pd_ = re.escape(_lit_arg(a[2], "pair delimiter") if len(a) > 2 else " ")
    col = _c(a[0])
    pairs = F.regexp_extract_all(col, F.lit(f'(?:"[^"]*"|[^{pd_}])+'), F.lit(0))

    def unq(s):
        return F.when(s.rlike('^".*"$'), F.regexp_replace(s, '^"|"$', "")).otherwise(s)

    def ent(p):
        key = F.regexp_extract(p, f'^((?:"[^"]*"|[^{kv}])*?){kv}', 1)
        val = F.regexp_replace(p, f'^(?:"[^"]*"|[^{kv}])*?{kv}', "")
        return F.struct(
            unq(F.btrim(key)).alias("key"), unq(F.btrim(val)).alias("value")
        )

    return F.map_from_entries(F.transform(pairs, ent))


_reg("ParseKeyValue")(_parse_key_value)


def _trim_prefix(c, a):
    t, p = _c(a[0]), _lit_arg(a[1], "prefix")
    return F.when(t.startswith(p), F.substring(t, len(p) + 1, 2 ** 31 - 1)).otherwise(t)


def _trim_suffix(c, a):
    t, s = _c(a[0]), _lit_arg(a[1], "suffix")
    return F.when(t.endswith(s), F.substring(t, 1, F.length(t) - len(s))).otherwise(t)


_reg("TrimPrefix")(_trim_prefix)
_reg("TrimSuffix")(_trim_suffix)
def _format(c, a):
    args = a[1:]
    if len(args) == 1 and isinstance(args[0], list):  # Format(fmt, [args])
        args = args[0]
    return F.format_string(_lit_arg(a[0], "format"), *[_c(x) for x in args])


_reg("Format")(_format)
_reg("ToCamelCase")(
    lambda c, a: F.concat_ws(
        "", F.transform(F.split(_c(a[0]), "[_ ]"), lambda w: F.initcap(w))
    )
)
_reg("ToTitleCase")(lambda c, a: F.initcap(_c(a[0])))
_reg("IsInt")(lambda c, a: _c(a[0]).try_cast("bigint").isNotNull())
_reg("IsDouble")(lambda c, a: _c(a[0]).try_cast("double").isNotNull())
_reg("IsBool")(lambda c, a: _c(a[0]).try_cast("boolean").isNotNull())
_reg("IsList")(lambda c, a: F.lit(True))  # typed columns: statically known
_reg("IsMap")(lambda c, a: F.lit(True))
_reg("ContainsValue")(lambda c, a: F.array_contains(_c(a[0]), _c(a[1])))
# exact hash converters (hex/int64 outputs match the reference byte for
# byte — func_murmur3_hash{,128}.go, func_xxh3.go, func_xxh128.go; the
# golden vectors from the reference's *_test.go files are asserted in
# tests/test_ottl_converters.py)
_reg("Murmur3Hash")(lambda c, a: _U().murmur3_hash(_c(a[0]).cast("string")))
_reg("Murmur3Hash128")(lambda c, a: _U().murmur3_hash128(_c(a[0]).cast("string")))
_reg("XXH3")(lambda c, a: _U().xxh3_hash(_c(a[0]).cast("string")))
_reg("XXH128")(lambda c, a: _U().xxh128_hash(_c(a[0]).cast("string")))
_reg("Now")(lambda c, a: F.current_timestamp())  # nondeterministic — keep out of golden paths
_reg("UUID")(lambda c, a: F.expr("uuid()"))  # nondeterministic
_reg("Append")(lambda c, a: F.array_append(_c(a[0]), _c(a[1])))
_reg("Index")(lambda c, a: (F.array_position(_c(a[0]), _c(a[1])) - 1).cast("bigint"))
_reg("DeleteIndex")(
    lambda c, a: F.filter(
        _c(a[0]), lambda x, i: i != F.lit(_lit_arg(a[1], "index"))
    )
)
def _slice_to_map(c, a):
    """SliceToMap(target[, keyPath][, valuePath]) — func_slice_to_map.go:
    no keyPath → index keys "0","1",…; keyPath/valuePath walk struct
    fields of the elements (missing field → the reference's error)."""
    from pyspark.sql.types import ArrayType, StructType

    col = _c(a[0])
    key_path = a[1] if len(a) > 1 and a[1] else None
    val_path = a[2] if len(a) > 2 and a[2] else None
    elem_dt = None
    if c is not None and getattr(c, "df", None) is not None:
        dt = c.df.select(col).schema[0].dataType
        if isinstance(dt, ArrayType):
            elem_dt = dt.elementType

    def _walk(path, err):
        path = path if isinstance(path, list) else [path]
        et = elem_dt
        for seg in path:
            fld = None
            if isinstance(et, StructType):
                fld = next((f for f in et.fields if f.name == seg), None)
            if fld is None:
                raise ValueError(err)
            et = fld.dataType

        def getter(x):
            out = x
            for seg in path:
                out = out.getField(seg)
            return out

        return getter

    keyf = _walk(key_path, "could not extract key from element") if key_path else None
    valf = _walk(val_path, "provided object does not contain the path") if val_path else None
    return F.map_from_entries(
        F.transform(
            col,
            lambda x, i: F.struct(
                (keyf(x).cast("string") if keyf else i.cast("string")).alias("key"),
                (valf(x) if valf else x).alias("value"),
            ),
        )
    )


_reg("SliceToMap")(_slice_to_map)


def _ip2int(ip: Column) -> Column:
    return (
        F.split_part(ip, F.lit("."), F.lit(1)).cast("bigint") * 16777216
        + F.split_part(ip, F.lit("."), F.lit(2)).cast("bigint") * 65536
        + F.split_part(ip, F.lit("."), F.lit(3)).cast("bigint") * 256
        + F.split_part(ip, F.lit("."), F.lit(4)).cast("bigint")
    )


def _is_in_cidr(c, a):
    """IsInCIDR(ip, cidr | [cidrs]) — true if the address falls in ANY
    of the given IPv4 ranges (func_is_in_cidr.go)."""
    cidrs = _lit_arg(a[1], "cidr")
    cidrs = cidrs if isinstance(cidrs, list) else [cidrs]
    ip = _ip2int(_c(a[0]))
    out = F.lit(False)
    for cidr in cidrs:
        net, bits = cidr.split("/")
        bits = int(bits)
        mask = (0xFFFFFFFF << (32 - bits)) & 0xFFFFFFFF if bits else 0
        net_int = 0
        for part in net.split("."):
            net_int = net_int * 256 + int(part)
        out = out | (ip.bitwiseAND(F.lit(mask)) == F.lit(net_int & mask))
    return out


_reg("IsInCIDR")(_is_in_cidr)


def _is_valid_luhn(c, a):
    digits = F.reverse(F.regexp_extract_all(_c(a[0]).cast("string"), F.lit(r"\d"), F.lit(0)))
    total = F.aggregate(
        F.zip_with(
            digits,
            F.sequence(F.lit(0), F.size(digits) - 1),
            lambda d, i: F.struct(d.cast("int").alias("d"), i.alias("i")),
        ),
        F.lit(0),
        lambda acc, x: acc
        + F.when(x.getField("i") % 2 == 1,
                 F.when(x.getField("d") * 2 > 9, x.getField("d") * 2 - 9).otherwise(x.getField("d") * 2))
        .otherwise(x.getField("d")),
    )
    return (total % 10 == 0) & (F.size(digits) > 1)


_reg("IsValidLuhn")(_is_valid_luhn)


def _U():
    """lazy import of the pandas-UDF converter module (keeps plain
    expression compilation importable without pandas)."""
    from sparkotel.functions import udfconv

    return udfconv


# -- ConvertCase / string-shape converters (func_convert_case.go) ------------

def _to_snake(col: Column) -> Column:
    return F.lower(F.regexp_replace(col, r"([a-z0-9])([A-Z])", r"$1_$2"))


def _to_camel(col: Column) -> Column:
    return F.concat_ws("", F.transform(F.split(col, "[_ ]"), lambda w: F.initcap(w)))


def _convert_case(c, a):
    case = _lit_arg(a[1], "toCase")
    col = _c(a[0])
    if case == "lower":
        return F.lower(col)
    if case == "upper":
        return F.upper(col)
    if case == "snake":
        return _to_snake(col)
    if case == "camel":
        return _to_camel(col)
    raise ValueError(f"ConvertCase: invalid case {case!r} (lower|upper|snake|camel)")


_reg("ConvertCase")(_convert_case)


def _to_key_value_string(c, a):
    """map → 'k=v k2=v2' (func_to_key_value_string.go).  Divergence
    (documented): output is ALWAYS key-sorted — Go map iteration order is
    random, so the reference is only deterministic with sortOutput=true;
    a distributed engine cannot reproduce nondeterminism anyway."""
    delim = _lit_arg(a[1], "delimiter") if len(a) > 1 else "="
    pair_delim = _lit_arg(a[2], "pair delimiter") if len(a) > 2 else " "

    def quoted(s: Column) -> Column:
        # escapeAndQuoteKV: values containing either delimiter get
        # double-quoted, embedded quotes escaped
        needs = s.contains(delim) | s.contains(pair_delim) | s.contains('"')
        return F.when(
            needs, F.concat(F.lit('"'), F.replace(s, F.lit('"'), F.lit('\\"')), F.lit('"'))
        ).otherwise(s)

    return F.concat_ws(
        pair_delim,
        F.transform(
            F.array_sort(F.map_entries(_c(a[0]))),
            lambda e: F.concat(
                quoted(e.getField("key")), F.lit(delim), quoted(e.getField("value"))
            ),
        ),
    )


_reg("ToKeyValueString")(_to_key_value_string)
def _decode_conv(c, a):
    if isinstance(a[1], Column):
        return _U().decode_dyn_udf(_c(a[0]).cast("string"), a[1].cast("string"))
    return _U().decode_udf(_c(a[0]), _lit_arg(a[1], "encoding"))


_reg("Decode")(_decode_conv)


# -- UserAgent (func_useragent.go) -------------------------------------------
#
# The reference embeds the full ua-parser/uap-core regex database via
# uap-go; this is a curated subset covering the major browser/OS/bot
# families, evaluated natively (ordered when-chain, no UDF).  Returns
# the same semconv keys: user_agent.name/original/version, os.name,
# os.version.

_UA_BROWSERS = [
    # (detect regex, family, version-extract regex)
    (r"Edg(?:e|A|iOS)?/", "Edge", r"Edg(?:e|A|iOS)?/([\d.]+)"),
    (r"OPR/", "Opera", r"OPR/([\d.]+)"),
    (r"Opera[/ ]", "Opera", r"Opera[/ ]([\d.]+)"),
    (r"CriOS/", "Chrome Mobile iOS", r"CriOS/([\d.]+)"),
    (r"FxiOS/", "Firefox iOS", r"FxiOS/([\d.]+)"),
    (r"Chrome/.*Mobile", "Chrome Mobile", r"Chrome/([\d.]+)"),
    (r"Chrome/", "Chrome", r"Chrome/([\d.]+)"),
    (r"Firefox/", "Firefox", r"Firefox/([\d.]+)"),
    (r"Version/.*Mobile.*Safari", "Mobile Safari", r"Version/([\d.]+)"),
    (r"Version/.*Safari", "Safari", r"Version/([\d.]+)"),
    (r"MSIE ", "IE", r"MSIE ([\d.]+)"),
    (r"Trident/.*rv:", "IE", r"rv:([\d.]+)"),
    (r"Googlebot/", "Googlebot", r"Googlebot/([\d.]+)"),
    (r"bingbot/", "bingbot", r"bingbot/([\d.]+)"),
    (r"curl/", "curl", r"curl/([\d.]+)"),
    (r"Wget/", "Wget", r"Wget/([\d.]+)"),
    (r"python-requests/", "Python Requests", r"python-requests/([\d.]+)"),
]

_UA_OS = [
    (r"Windows NT 10\.0", "Windows", r"Windows NT (10\.0)"),
    (r"Windows NT", "Windows", r"Windows NT ([\d.]+)"),
    (r"iPhone OS", "iOS", r"iPhone OS ([\d_]+)"),
    (r"Mac OS X", "Mac OS X", r"Mac OS X ([\d_.]+)"),
    (r"Android", "Android", r"Android ([\d.]+)"),
    (r"CrOS", "Chrome OS", r"CrOS \S+ ([\d.]+)"),
    (r"Linux", "Linux", None),
]


def _user_agent(c, a):
    ua = _c(a[0])
    fam = None
    ver = None
    for detect, family, vre in _UA_BROWSERS:
        cond = ua.rlike(detect)
        fam = (F.when(cond, family) if fam is None else fam.when(cond, family))
        v = F.regexp_extract(ua, vre, 1)
        ver = (F.when(cond, v) if ver is None else ver.when(cond, v))
    fam = fam.otherwise(F.lit("Other"))
    ver = ver.otherwise(F.lit(""))
    os_name = None
    os_ver = None
    for detect, name, vre in _UA_OS:
        cond = ua.rlike(detect)
        os_name = (F.when(cond, name) if os_name is None else os_name.when(cond, name))
        v = (
            F.regexp_replace(F.regexp_extract(ua, vre, 1), "_", ".")
            if vre
            else F.lit("")
        )
        os_ver = (F.when(cond, v) if os_ver is None else os_ver.when(cond, v))
    # uap-go returns family "Other" for an unmatched OS (the reference's
    # e2e pins os.name="Other" for curl)
    os_name = os_name.otherwise(F.lit("Other"))
    os_ver = os_ver.otherwise(F.lit(""))
    return F.map_filter(
        F.create_map(
            F.lit("user_agent.name"), fam,
            F.lit("user_agent.original"), ua,
            F.lit("user_agent.version"), ver,
            F.lit("os.name"), os_name,
            F.lit("os.version"), os_ver,
        ),
        lambda k, v: v != "",
    )


_reg("UserAgent")(_user_agent)


# -- durations & time fields (func_duration.go, func_hours.go, …) ------------

_reg("Duration")(lambda c, a: _U().duration_seconds(_c(a[0])))
_reg("Hours")(lambda c, a: _c(a[0]) / 3600.0)
_reg("Minutes")(lambda c, a: _c(a[0]) / 60.0)
_reg("Seconds")(lambda c, a: _c(a[0]).cast("double"))
_reg("Milliseconds")(lambda c, a: (_c(a[0]) * 1000).cast("bigint"))
_reg("Microseconds")(lambda c, a: (_c(a[0]) * 1000000).cast("bigint"))
_reg("Nanoseconds")(lambda c, a: (_c(a[0]) * 1000000000).cast("bigint"))
_reg("Nanosecond")(
    lambda c, a: (F.unix_micros(_c(a[0])) % 1000000) * 1000
)
_reg("Unix")(
    lambda c, a: F.timestamp_micros(
        (_c(a[0]).cast("bigint") * 1000000)
        + ((_c(a[1]).cast("bigint") / 1000).cast("bigint") if len(a) > 1 else F.lit(0))
    )
)


def _uuid_v7(c, a):
    """UUIDv7 layout (unix-ms timestamp + random) — nondeterministic,
    like UUID(); keep out of golden paths."""
    ms = F.lpad(F.lower(F.hex(F.unix_millis(F.current_timestamp()))), 12, "0")
    r = lambda n: F.substring(F.md5(F.rand().cast("string")), 1, n)  # noqa: E731
    return F.concat_ws(
        "-",
        F.substring(ms, 1, 8),
        F.substring(ms, 9, 4),
        F.concat(F.lit("7"), r(3)),
        F.concat(F.lit("8"), r(3)),
        r(12),
    )


_reg("UUIDv7")(_uuid_v7)


# -- ids (func_span_id.go, func_trace_id.go, func_profile_id.go) -------------

def _hex_id(n_hex: int):
    """SpanID/TraceID/ProfileID: the engine models ids as lowercase hex
    strings (the trace_parser convention); 0x… literals arrive as ints
    and zero-pad to the id width."""

    def f(c, a):
        v = a[0]
        if isinstance(v, (bytes, bytearray)):  # 0x… literal
            return F.lit(v.hex().rjust(n_hex, "0"))
        if isinstance(v, int) and not isinstance(v, bool):
            return F.lit(format(v, f"0{n_hex}x"))
        col = _c(v)
        return F.when(col.rlike(f"^[0-9a-fA-F]{{{n_hex}}}$"), F.lower(col))

    return f


_reg("SpanID")(_hex_id(16))
_reg("TraceID")(_hex_id(32))
_reg("ProfileID")(_hex_id(32))


# -- ParseCSV / ParseSeverity / pattern extractors ---------------------------

def _parse_csv(c, a, **kw):
    """ParseCSV(target, header[, delimiter][, headerDelimiter][, mode])
    → map (func_parse_csv.go; header delimiter defaults to the field
    delimiter, either may arrive as a named argument)."""
    header = _lit_arg(a[1], "header")
    sep = _lit_arg(a[2], "delimiter") if len(a) > 2 else kw.get("delimiter", ",")
    hsep = _lit_arg(a[3], "headerDelimiter") if len(a) > 3 else kw.get("headerDelimiter", sep)
    _ = _lit_arg(a[4], "mode") if len(a) > 4 else kw.get("mode", "strict")
    cols = header.split(hsep)
    schema = ", ".join(f"`c{i}` STRING" for i in range(len(cols)))
    parsed = F.from_csv(_c(a[0]), schema, {"sep": sep})
    return F.map_from_arrays(
        F.array(*[F.lit(h) for h in cols]),
        F.array(*[parsed.getField(f"c{i}") for i in range(len(cols))]),
    )


_reg("ParseCSV")(_parse_csv)

# severity alias table (pkg/stanza/operator/helper/severity_builder.go +
# ParseSeverity's default registry): text aliases → canonical level
_SEV_ALIASES = {
    "trace": "trace", "trc": "trace",
    "debug": "debug", "dbg": "debug",
    "info": "info", "information": "info", "notice": "info",
    "warn": "warn", "warning": "warn",
    "error": "error", "err": "error",
    "fatal": "fatal", "crit": "fatal", "critical": "fatal",
    "alert": "fatal", "emerg": "fatal", "emergency": "fatal",
}


def _parse_severity(c, a):
    # custom mapping argument (func_parse_severity.go): an ordered
    # {level: [criteria]} map where criteria are {"equals": [...]} /
    # {"range": {"min": m, "max": M}}
    if len(a) > 1 and isinstance(a[1], dict):
        val = _c(a[0])
        sval = F.lower(F.btrim(val.cast("string")))
        nval = val.try_cast("bigint")
        out = None
        for level, criteria in a[1].items():
            cond = F.lit(False)
            for crit in criteria:
                if "equals" in crit:
                    for eq in crit["equals"]:
                        cond = cond | (sval == _go_str(eq).lower())
                if "range" in crit:
                    r = crit["range"]
                    cond = cond | nval.between(int(r["min"]), int(r["max"]))
            out = F.when(cond, level) if out is None else out.when(cond, level)
        return out
    col = F.lower(F.btrim(_c(a[0]).cast("string")))
    out = None
    for alias, level in _SEV_ALIASES.items():
        cond = col == alias
        out = F.when(cond, level) if out is None else out.when(cond, level)
    # OTel SeverityNumber bands for numeric input (severity.go enum)
    n = col.try_cast("int")
    for lo, hi, level in [
        (1, 4, "trace"), (5, 8, "debug"), (9, 12, "info"),
        (13, 16, "warn"), (17, 20, "error"), (21, 24, "fatal"),
    ]:
        out = out.when(n.between(lo, hi), level)
    return out


_reg("ParseSeverity")(_parse_severity)


def _capture_group_indexes(pattern: str) -> list[tuple[str | None, int]]:
    """[(name-or-None, group_index)] in order, python/RE2 syntax."""
    out = []
    idx = 0
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if ch == "(":
            named = None
            if pattern[i : i + 4] == "(?P<":
                named = i + 4
            elif pattern[i : i + 2] == "(?<" and pattern[i + 3 : i + 4] not in ("=", "!") and pattern[i + 2] not in ("=", "!"):
                named = i + 3
            if named is not None:
                j = pattern.index(">", i)
                idx += 1
                out.append((pattern[named:j], idx))
                i = j + 1
                continue
            if pattern[i : i + 2] == "(?":
                i += 2
                continue
            idx += 1
            out.append((None, idx))
        i += 1
    return out


def _strip_group_names(pattern: str) -> str:
    """python `(?P<n>` / java `(?<n>` named groups → plain groups, so the
    pattern runs on the JVM regex engine (extraction is by index)."""
    return re.sub(r"\(\?P?<([A-Za-z][A-Za-z0-9_]*)>", "(", pattern)


def _extract_patterns(c, a):
    """ExtractPatterns(target, pattern) → map of NAMED captures
    (func_extract_patterns.go: errors when no named groups)."""
    pattern = _lit_arg(a[1], "pattern")
    named = [(n, i) for n, i in _capture_group_indexes(pattern) if n]
    if not named:
        raise ValueError("ExtractPatterns: pattern has no named capture groups")
    col = _c(a[0])
    jpat = _strip_group_names(pattern)
    return F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n, _ in named]),
            F.array(*[F.regexp_extract(col, jpat, i) for _, i in named]),
        ),
        lambda k, v: v != "",
    )


_reg("ExtractPatterns")(_extract_patterns)


def _extract_grok(c, a):
    """ExtractGrokPatterns(target, pattern) → map
    (func_extract_grok_patterns.go); shares the operator-side grok
    dictionary (sparkotel.operators.grok)."""
    from sparkotel.operators.grok import expand_grok

    regex, captures = expand_grok(_lit_arg(a[1], "pattern"))
    col = _c(a[0])
    return F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(n) for n, _ in captures]),
            F.array(
                *[F.regexp_extract(col, regex, i + 1) for i in range(len(captures))]
            ),
        ),
        lambda k, v: v != "",
    )


_reg("ExtractGrokPatterns")(_extract_grok)


# -- XML family (ElementTree XPath subset; see udfconv) ----------------------

_reg("ParseXML")(lambda c, a: _U().parse_xml_udf(_c(a[0])))
_reg("ParseSimplifiedXML")(lambda c, a: _U().parse_simplified_xml_udf(_c(a[0])))
_reg("GetXML")(lambda c, a: _U().get_xml_udf(_c(a[0]), _lit_arg(a[1], "xpath")))
_reg("RemoveXML")(lambda c, a: _U().remove_xml_udf(_c(a[0]), _lit_arg(a[1], "xpath")))
_reg("InsertXML")(
    lambda c, a: _U().insert_xml_udf(
        _c(a[0]), _lit_arg(a[1], "xpath"), _lit_arg(a[2], "subdocument")
    )
)
_reg("ConvertTextToElementsXML")(
    lambda c, a: _U().convert_text_xml_udf(
        _c(a[0]),
        _lit_arg(a[1], "xpath") if len(a) > 1 else "/",
        _lit_arg(a[2], "elementName") if len(a) > 2 else "value",
    )
)
_reg("ConvertAttributesToElementsXML")(
    lambda c, a: _U().convert_attrs_xml_udf(_c(a[0]))
)

# CommunityID(source_ip, source_port, dest_ip, dest_port[, protocol="TCP"][, seed=0])
_reg("CommunityID")(
    lambda c, a: _U().community_id_udf(
        _c(a[0]),
        _c(a[1]),
        _c(a[2]),
        _c(a[3]),
        _lit_arg(a[4], "protocol") if len(a) > 4 else "TCP",
        _lit_arg(a[5], "seed") if len(a) > 5 else 0,
    )
)


def _duration_unit(d: str) -> str:
    return {"1h": "hour", "1m": "minute", "1s": "second", "24h": "day", "1d": "day"}[d]


def _strp(fmt: str) -> str:
    from sparkotel.operators.parse import strptime_to_spark

    return strptime_to_spark(fmt)


# ---------------------------------------------------------------------------
# editors (statement application over a DataFrame)
# ---------------------------------------------------------------------------


def _glob_to_regex(glob: str) -> str:
    """gobwas/glob subset (`*`, `?`) → anchored regex (full-value match,
    as replace_match requires)."""
    out = "^"
    for ch in glob:
        if ch == "*":
            out += ".*"
        elif ch == "?":
            out += "."
        else:
            out += re.escape(ch)
    return out + "$"


def _join_key(prefix_col: Column, name_col: Column) -> Column:
    return F.when(prefix_col == "", name_col).otherwise(
        F.concat(prefix_col, F.lit("."), name_col)
    )


def _flatten_entries(col: Column, dt, prefix_col: Column, depth: int) -> Column:
    """array<struct<key,value>> of dotted-key leaves — the schema-driven
    recursion behind the flatten editor (type recursion is static, key
    paths are data-driven)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, StructType) and depth > 0 and dt.fields:
        arrs = [
            _flatten_entries(
                col.getField(f.name), f.dataType, _join_key(prefix_col, F.lit(f.name)), depth - 1
            )
            for f in dt.fields
        ]
        return arrs[0] if len(arrs) == 1 else F.concat(*arrs)
    if isinstance(dt, MapType) and depth > 0:
        vt = dt.valueType
        return F.flatten(
            F.transform(
                F.map_entries(col),
                lambda e: _flatten_entries(
                    e.getField("value"), vt, _join_key(prefix_col, e.getField("key")), depth - 1
                ),
            )
        )
    if isinstance(dt, ArrayType) and depth > 0:
        et = dt.elementType
        return F.flatten(
            F.transform(
                col,
                lambda x, i: _flatten_entries(
                    x, et, _join_key(prefix_col, i.cast("string")), depth - 1
                ),
            )
        )
    return F.array(
        F.struct(prefix_col.alias("key"), col.cast("string").alias("value"))
    )


def flatten_column(df: DataFrame, col_name: str, prefix: str = "", depth: int = 100) -> Column:
    """flatten editor body: nested struct/map/array column → flat
    map<string,string> with dotted (and array-indexed) keys."""
    dt = df.schema[col_name].dataType
    return F.map_from_entries(
        _flatten_entries(F.col(col_name), dt, F.lit(prefix), depth)
    )


def compile_condition(df: DataFrame, src: str) -> Column:
    """OTTL boolean expression (a `where` clause / filterprocessor
    condition) → Column<bool>."""
    return Compiler(df).compile_bool(parse_expr(src))


def compile_value(df: DataFrame, src: str, attrs_cols: list[str] | None = None) -> Column | object:
    """OTTL value expression (ParseValueExpression,
    pkg/ottl/parser.go ValueExpression) → Column or python constant."""
    return Compiler(df, attrs_cols=attrs_cols).compile(parse_expr(src))


def _pcol(name: str) -> Column:
    """column ref that survives dots in promoted attribute names
    (`conflict.conflict1` is a single key, not nested access)."""
    return F.col("`" + name + "`") if "." in name else F.col(name)


def _canon_leaf(col: Column, dt) -> Column:
    """canonical string form of a flattened leaf: scalars cast, complex
    values JSON-encoded (documented divergence: the engine's flat maps
    are map<string,string>, so non-string leaf types canonicalize)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, (ArrayType, MapType, StructType)):
        return F.to_json(col)
    return col.cast("string")


def _ref_flatten_entries(col: Column, dt, key: Column, depth: int, max_depth: int, resolve: bool) -> Column:
    """array<struct<key,value>> leaves per the reference's exact
    algorithm (func_flatten.go flattenValue): maps/structs recurse while
    depth < max; slices emit `key.i` per element (bare `key` under
    resolveConflicts — the suffix counter is applied globally later);
    map/slice values AT the depth boundary stay whole (JSON-encoded
    here)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def leaf(k: Column, c: Column, d) -> Column:
        return F.array(F.struct(k.alias("key"), _canon_leaf(c, d).alias("value")))

    if isinstance(dt, StructType) and depth < max_depth:
        arrs = [
            _ref_flatten_entries(
                col.getField(f.name), f.dataType,
                F.concat(key, F.lit("." + f.name)), depth + 1, max_depth, resolve,
            )
            for f in dt.fields
        ]
        return F.concat(*arrs) if len(arrs) > 1 else arrs[0]
    if isinstance(dt, MapType) and depth < max_depth:
        vt = dt.valueType
        return F.flatten(
            F.transform(
                F.map_entries(col),
                lambda e: _ref_flatten_entries(
                    e.getField("value"), vt,
                    F.concat(key, F.lit("."), e.getField("key")),
                    depth + 1, max_depth, resolve,
                ),
            )
        )
    if isinstance(dt, ArrayType) and depth < max_depth:
        et = dt.elementType
        if isinstance(et, (MapType, StructType)) and depth + 1 < max_depth:
            return F.flatten(
                F.transform(
                    col,
                    lambda x, i: _ref_flatten_entries(
                        x, et, F.concat(key, F.lit("."), i.cast("string")),
                        depth + 2, max_depth, resolve,
                    ),
                )
            )
        if isinstance(et, ArrayType) and depth + 1 < max_depth:
            return F.flatten(
                F.transform(
                    col,
                    lambda x, i: _ref_flatten_entries(
                        x, et, F.concat(key, F.lit("."), i.cast("string")),
                        depth + 2, max_depth, resolve,
                    ),
                )
            )
        # leaf elements (or depth boundary): key.i, or bare key when
        # resolveConflicts (global suffix counter disambiguates)
        return F.transform(
            col,
            lambda x, i: F.struct(
                (key if resolve else F.concat(key, F.lit("."), i.cast("string"))).alias("key"),
                _canon_leaf(x, et).alias("value"),
            ),
        )
    return leaf(key, col, dt)


def _dedup_last_wins(entries: Column) -> Column:
    """pcommon.Map.Put overwrites — keep each key's LAST occurrence,
    preserving first-occurrence order (bounded per-row array, O(n²)
    element ops in one JVM expression)."""
    return F.filter(
        entries,
        lambda e, i: ~F.exists(
            F.slice(entries, i + 2, F.size(entries)),
            lambda x: x.getField("key") == e.getField("key"),
        ),
    )


def _suffix_conflicts(entries: Column) -> Column:
    """resolveConflicts=true: repeated keys get `.N` suffixes in
    occurrence order (func_flatten.go handleConflict)."""
    return F.transform(
        entries,
        lambda e, i: F.struct(
            F.when(
                F.exists(
                    F.slice(entries, 1, i),
                    lambda x: x.getField("key") == e.getField("key"),
                ),
                F.concat(
                    e.getField("key"),
                    F.lit("."),
                    (
                        F.size(
                            F.filter(
                                F.slice(entries, 1, i),
                                lambda x: x.getField("key") == e.getField("key"),
                            )
                        )
                        - 1
                    ).cast("string"),
                ),
            )
            .otherwise(e.getField("key"))
            .alias("key"),
            e.getField("value").alias("value"),
        ),
    )


def apply_statement(
    df: DataFrame, src: str, attrs_cols: list[str] | None = None, ctx: str = "log"
) -> DataFrame:
    """Execute one `editor(args) where cond` statement (parser.go:33-51):
    rows failing the condition keep their original values.

    ``attrs_cols`` names the promoted attribute columns — typed columns
    that are logical members of ``attributes`` beyond the flat
    map<string,string> (the engine's representation of heterogeneous
    OTel attribute values).  Editors whose target is bare ``attributes``
    then operate on the UNION of the map and those columns."""
    stmt = parse_statement(src)
    comp = Compiler(df, attrs_cols=attrs_cols, ctx=ctx)
    cond = comp.compile_bool(stmt.where) if stmt.where is not None else None
    ed = stmt.editor
    attrs_cols = [c for c in (attrs_cols or []) if c in df.columns]

    def gated(new: Column, old: Column) -> Column:
        if cond is None:
            return new
        return F.when(cond, new).otherwise(old)

    def _struct_set(struct_name: str, field_segs: list, value: Column) -> DataFrame:
        """write into a nested field of a promoted struct column via
        withField (attributes["foo"]["test"] = ...)."""
        base = _pcol(struct_name)
        if len(field_segs) != 1:
            raise NotImplementedError("only one nested level of struct writes")
        fld = field_segs[0][1]
        old = _pcol(struct_name)
        return df.withColumn(struct_name, gated(base.withField(fld, value), old))

    name = ed.name
    if name == "set":
        target = ed.args[0]
        assert isinstance(target, Path)
        value_raw = comp.compile(ed.args[1])
        # set() does nothing when the value is nil (func_set.go:30-33) —
        # including runtime nil from reading a missing attribute.  The
        # null-skip applies to PATH values only (converter results keep
        # overwrite behavior, as the engine's pipelines rely on it).
        if value_raw is None:
            return df
        value = _c(value_raw)
        keep_old_on_null = isinstance(ed.args[1], (Path, Index))
        parts = comp._strip_ctx(target.parts)
        # dynamic-key writes: set(attributes[<expr>], v) → map update
        if parts[0] in ("attributes",) and len(parts) == 2 and isinstance(parts[1], tuple) and parts[1][0] in ("expr", "idx"):
            if parts[1][0] == "idx":
                raise TypeError("unable to resolve a string index in map: invalid key type")
            key = _c(comp.compile(parts[1][1])).cast("string")
            m = F.col("attributes")
            new = F.map_concat(
                F.map_filter(m, lambda k, _v: k != key),
                F.create_map(key, value.cast("string")),
            )
            return df.withColumn("attributes", gated(new, m))
        if (
            parts[0] == "resource"
            and len(parts) == 3
            and isinstance(parts[2], tuple)
            and parts[2][0] == "expr"
        ):
            key = _c(comp.compile(parts[2][1])).cast("string")
            m = F.col("resource")
            new = F.map_concat(
                F.map_filter(m, lambda k, _v: k != key),
                F.create_map(key, value.cast("string")),
            )
            return df.withColumn("resource", gated(new, m))
        # nested struct write: set(attributes["foo"]["test"], v)
        if (
            parts[0] == "attributes"
            and len(parts) >= 3
            and isinstance(parts[1], tuple)
            and parts[1][0] == "key"
            and parts[1][1] in df.columns
        ):
            from pyspark.sql.types import ArrayType, StructType

            dt = df.schema[parts[1][1]].dataType
            if isinstance(dt, ArrayType):
                # slice element write: only an int64 index resolves
                # (ottl/parser.go key resolution; float/string error)
                seg = parts[2]
                idx = None
                if seg[0] == "idx" and isinstance(seg[1], int) and not isinstance(seg[1], bool):
                    idx = F.lit(seg[1])
                elif seg[0] == "expr":
                    kcol = comp.compile(seg[1])
                    if isinstance(kcol, Column):
                        from pyspark.sql.types import IntegerType, LongType

                        kdt = df.select(kcol).schema[0].dataType
                        if isinstance(kdt, (IntegerType, LongType)):
                            idx = kcol.cast("int")
                    elif isinstance(kcol, int) and not isinstance(kcol, bool):
                        idx = F.lit(kcol)
                if idx is None:
                    raise TypeError("unable to resolve an integer index in slice")
                arr_name = parts[1][1]
                base = _pcol(arr_name)
                et = dt.elementType.simpleString()
                new_arr = F.transform(
                    base, lambda x, i: F.when(i == idx, value.cast(et)).otherwise(x)
                )
                return df.withColumn(arr_name, gated(new_arr, base))
            if isinstance(dt, StructType):
                return _struct_set(parts[1][1], parts[2:], value)
        # whole-attribute-set replacement: set(attributes, {...})
        if parts == ["attributes"]:
            out = df.withColumn("attributes", gated(value, F.col("attributes")))
            for c in attrs_cols:
                out = out.drop(c)
            return out
        col_name = comp.path_target_name(target)
        exists = col_name in df.columns
        old = _pcol(col_name) if exists else F.lit(None)
        if exists:
            from pyspark.sql.types import ArrayType, MapType, StructType

            old_dt = df.schema[col_name].dataType
            new_dt = df.select(value).schema[0].dataType
            if old_dt != new_dt and (
                isinstance(old_dt, (ArrayType, MapType, StructType))
                or isinstance(new_dt, (ArrayType, MapType, StructType))
            ):
                # type-changing set: Spark columns are monomorphic, so the
                # untaken branch takes the canonical string form of a
                # complex old value / null for a simple one (documented
                # divergence; the reference's pcommon values re-type freely)
                if isinstance(old_dt, (ArrayType, MapType, StructType)):
                    old = _canon_leaf(_pcol(col_name), old_dt)
                    if isinstance(new_dt, (ArrayType, MapType, StructType)):
                        old = F.lit(None).cast(new_dt.simpleString())
                else:
                    old = F.lit(None).cast(new_dt.simpleString())
        if keep_old_on_null:
            value = F.when(value.isNull(), old).otherwise(value)
        return df.withColumn(col_name, gated(value, old))
    if name in ("delete_key", "delete_matching_keys", "keep_keys", "keep_matching_keys"):
        import re as _re

        from pyspark.sql.types import StructType

        target = ed.args[0]
        col_name = comp.path_target_name(target)

        def _key_list() -> list[str]:
            ks = [comp.compile(a) for a in ed.args[1:]]
            if len(ks) == 1 and isinstance(ks[0], list):
                ks = ks[0]
            return [_lit_arg(k, "key") for k in ks]

        def _keeps(names: list[str]) -> list[str]:
            if name == "delete_key":
                key = _lit_arg(comp.compile(ed.args[1]), "key")
                return [n for n in names if n != key]
            if name == "keep_keys":
                ks = set(_key_list())
                return [n for n in names if n in ks]
            pat = _lit_arg(comp.compile(ed.args[1]), "pattern")
            rx = _re.compile(pat)
            if name == "delete_matching_keys":
                return [n for n in names if not rx.search(n)]
            return [n for n in names if rx.search(n)]

        # struct-typed target (promoted heterogeneous map) — plan-time
        # field projection
        if col_name in df.columns and isinstance(df.schema[col_name].dataType, StructType):
            base = _pcol(col_name)
            keep = _keeps([f.name for f in df.schema[col_name].dataType.fields])
            new = F.struct(*[base.getField(f).alias(f) for f in keep])
            return df.withColumn(col_name, gated(new, base))
        m = _pcol(col_name)
        if name == "delete_key":
            key = _lit_arg(comp.compile(ed.args[1]), "key")
            new = F.map_filter(m, lambda k, v: k != F.lit(key))
        elif name == "keep_keys":
            arr = F.array(*[F.lit(k) for k in _key_list()])
            new = F.map_filter(m, lambda k, v: F.array_contains(arr, k))
        elif name == "delete_matching_keys":
            pat = _lit_arg(comp.compile(ed.args[1]), "pattern")
            new = F.map_filter(m, lambda k, v: ~k.rlike(pat))
        else:
            pat = _lit_arg(comp.compile(ed.args[1]), "pattern")
            new = F.map_filter(m, lambda k, v: k.rlike(pat))
        out = df.withColumn(col_name, gated(new, m))
        # union semantics: bare-`attributes` key edits also apply to the
        # promoted columns (plan-time drop — key args are literals)
        if target.parts == ["attributes"] and attrs_cols:
            if cond is not None:
                raise NotImplementedError("gated promoted-column drops")
            for c in attrs_cols:
                if c not in _keeps(attrs_cols):
                    out = out.drop(c)
        return out
    def _map_entry(target: Path):
        """attributes["k"] / resource.attributes["k"] where k is a plain
        map key (not a promoted column) → (map column, key)."""
        parts = comp._strip_ctx(target.parts)
        if (
            parts[0] == "attributes"
            and len(parts) == 2
            and isinstance(parts[1], tuple)
            and parts[1][0] == "key"
            and parts[1][1] not in df.columns
        ):
            return "attributes", parts[1][1]
        if (
            parts[0] == "resource"
            and len(parts) == 3
            and isinstance(parts[2], tuple)
            and parts[2][0] == "key"
        ):
            return "resource", parts[2][1]
        return None

    def _entry_update(map_name: str, key: str, tx) -> DataFrame:
        m = F.col(map_name)
        new = F.transform_values(
            m, lambda k, v: F.when(k == key, tx(v)).otherwise(v)
        )
        return df.withColumn(map_name, gated(new, m))

    if name in ("replace_pattern", "replace_all_patterns"):
        target = ed.args[0]
        if name == "replace_pattern":
            pat = _lit_arg(comp.compile(ed.args[1]), "pattern")
            rep = _lit_arg(comp.compile(ed.args[2]), "replacement")
            if len(ed.args) > 3:
                # optional function arg (func_replace_pattern.go fn):
                # each match is replaced by fn(replacement)
                fname = ed.args[3].parts[0] if isinstance(ed.args[3], Path) else ed.args[3].name
                import hashlib as _hl

                _hashers = {"SHA256": "sha256", "SHA1": "sha1", "MD5": "md5", "SHA512": "sha512"}
                if fname not in _hashers:
                    raise NameError(f"replace_pattern: unsupported function {fname}")
                rep = _hl.new(_hashers[fname], rep.encode()).hexdigest()
            me = _map_entry(target)
            if me is not None:
                return _entry_update(*me, lambda v: F.regexp_replace(v, pat, rep))
            old = F.col(comp.path_target_name(target))
            return df.withColumn(
                comp.path_target_name(target), gated(F.regexp_replace(old, pat, rep), old)
            )
        # map-valued: mode arg ("value"|"key") then pattern, replacement
        col_name = comp.path_target_name(target)
        old = F.col(col_name)
        mode = _lit_arg(comp.compile(ed.args[1]), "mode")
        pat = _lit_arg(comp.compile(ed.args[2]), "pattern")
        rep = _lit_arg(comp.compile(ed.args[3]), "replacement")
        if mode == "value":
            new = F.transform_values(old, lambda k, v: F.regexp_replace(v, pat, rep))
        else:
            new = F.map_from_entries(
                F.transform(
                    F.map_entries(old),
                    lambda e: F.struct(
                        F.regexp_replace(e.getField("key"), pat, rep).alias("key"),
                        e.getField("value").alias("value"),
                    ),
                )
            )
        return df.withColumn(col_name, gated(new, old))
    if name in ("replace_match", "replace_all_matches"):
        # glob (full-value) match → whole-value replacement
        # (func_replace_match.go / func_replace_all_matches.go; the Go
        # side compiles gobwas/glob — `*` and `?` wildcards)
        pat = _glob_to_regex(_lit_arg(comp.compile(ed.args[1]), "pattern"))
        rep = _lit_arg(comp.compile(ed.args[2]), "replacement")
        if name == "replace_match":
            me = _map_entry(ed.args[0])
            if me is not None:
                return _entry_update(
                    *me, lambda v: F.when(v.rlike(pat), F.lit(rep)).otherwise(v)
                )
            col_name = comp.path_target_name(ed.args[0])
            old = F.col(col_name)
            new = F.when(old.rlike(pat), F.lit(rep)).otherwise(old)
        else:
            col_name = comp.path_target_name(ed.args[0])
            old = F.col(col_name)  # map-valued: every string value matching the glob
            new = F.transform_values(
                old, lambda k, v: F.when(v.rlike(pat), F.lit(rep)).otherwise(v)
            )
        return df.withColumn(col_name, gated(new, old))
    if name == "truncate_all":
        from pyspark.sql.types import StringType

        col_name = comp.path_target_name(ed.args[0])
        n = _lit_arg(comp.compile(ed.args[1]), "limit")
        old = _pcol(col_name)
        new = F.transform_values(old, lambda k, v: F.substring(v, 1, n))
        out = df.withColumn(col_name, gated(new, old))
        if ed.args[0].parts == ["attributes"] and attrs_cols:
            # only STRING values truncate (func_truncate_all.go ignores
            # non-string); promoted string columns are part of the set
            for c in attrs_cols:
                if isinstance(df.schema[c].dataType, StringType):
                    out = out.withColumn(c, gated(F.substring(_pcol(c), 1, n), _pcol(c)))
        return out
    if name == "limit":
        col_name = comp.path_target_name(ed.args[0])
        n = _lit_arg(comp.compile(ed.args[1]), "limit")
        prio = comp.compile(ed.args[2]) if len(ed.args) > 2 else []
        prio = [_lit_arg(p, "priority") for p in (prio if isinstance(prio, list) else [prio])]
        old = _pcol(col_name)
        out = df
        # deterministic union variant (documented divergence from the
        # reference's map-order limit): priority keys always kept;
        # promoted columns consume the remaining budget first (attrs_cols
        # order), then map keys fill the rest lexicographically
        budget = n - len(prio)
        kept_promoted = 0
        if ed.args[0].parts == ["attributes"] and attrs_cols:
            if cond is not None:
                raise NotImplementedError("gated promoted-column drops")
            for c in attrs_cols:
                if c in prio or kept_promoted < budget:
                    kept_promoted += 1
                else:
                    out = out.drop(c)
        prio_arr = F.array(*[F.lit(p) for p in prio]) if prio else F.array().cast("array<string>")
        ranked = F.array_sort(
            F.map_entries(F.map_filter(old, lambda k, v: ~F.array_contains(prio_arr, k)))
        )
        new = F.map_from_entries(
            F.concat(
                F.filter(F.map_entries(old), lambda e: F.array_contains(prio_arr, e.getField("key"))),
                F.slice(ranked, 1, max(0, budget - kept_promoted)),
            )
        )
        return out.withColumn(col_name, gated(new, old))
    if name == "flatten":
        # flatten(target[, prefix][, depth][, resolveConflicts]) —
        # plan-time recursive expansion driven by the Spark schema,
        # mirroring func_flatten.go's exact key/depth/conflict rules
        col_name = comp.path_target_name(ed.args[0])
        kw = {k: comp.compile(v) for k, v in ed.kwargs.items()}
        prefix = _lit_arg(comp.compile(ed.args[1]), "prefix") if len(ed.args) > 1 else kw.get("prefix", "")
        depth = _lit_arg(comp.compile(ed.args[2]), "depth") if len(ed.args) > 2 else int(kw.get("depth", 2 ** 31))
        resolve = bool(kw.get("resolveConflicts", False))
        old = _pcol(col_name)
        if ed.args[0].parts == ["attributes"] and attrs_cols:
            # union flatten: the flat map's entries are depth-1 leaves;
            # promoted columns flatten per their schema.  pcommon maps
            # iterate in insertion order — map entries first, then
            # attrs_cols order.
            pre = F.lit(prefix + ".") if prefix else F.lit("")
            ents = [
                F.transform(
                    F.map_entries(F.col("attributes")),
                    lambda e: F.struct(
                        F.concat(pre, e.getField("key")).alias("key"),
                        e.getField("value").alias("value"),
                    ),
                )
            ]
            for c in attrs_cols:
                ents.append(
                    _ref_flatten_entries(
                        _pcol(c), df.schema[c].dataType,
                        F.concat(pre, F.lit(c)), 0, depth, resolve,
                    )
                )
            entries = F.concat(*ents)
            entries = _suffix_conflicts(entries) if resolve else _dedup_last_wins(entries)
            out = df.withColumn("attributes", gated(F.map_from_entries(entries), old))
            if cond is not None and any(True for _ in attrs_cols):
                raise NotImplementedError("gated promoted-column drops")
            for c in attrs_cols:
                out = out.drop(c)
            return out
        new = flatten_column(df, col_name, prefix, depth)
        return df.withColumn(col_name, gated(new, old))
    if name == "stringify_all":
        # StringifyAll: every value → its string form
        # (func_stringify_all.go); complex promoted columns take their
        # pcommon-JSON encoding
        col_name = comp.path_target_name(ed.args[0])
        old = _pcol(col_name)
        new = F.transform_values(old, lambda k, v: v.cast("string"))
        out = df.withColumn(col_name, gated(new, old))
        if ed.args[0].parts == ["attributes"] and attrs_cols:
            for c in attrs_cols:
                out = out.withColumn(
                    c, gated(_canon_leaf(_pcol(c), df.schema[c].dataType), _pcol(c))
                )
        return out
    if name == "merge_maps":
        from pyspark.sql.types import StructType

        col_name = comp.path_target_name(ed.args[0])
        src_raw = comp.compile(ed.args[1])
        mode = _lit_arg(comp.compile(ed.args[2]), "mode")
        old = _pcol(col_name)
        # union path: source is a promoted struct column or a map
        # literal, whose members land as promoted columns / map updates
        src_fields = None
        src_node = ed.args[1]
        if (
            isinstance(src_node, Path)
            and src_node.parts[0] == "attributes"
            and len(src_node.parts) == 2
            and isinstance(src_node.parts[1], tuple)
            and src_node.parts[1][1] in df.columns
            and isinstance(df.schema[src_node.parts[1][1]].dataType, StructType)
        ):
            src_name = src_node.parts[1][1]
            src_fields = [
                (f.name, _pcol(src_name).getField(f.name), f.dataType)
                for f in df.schema[src_name].dataType.fields
            ]
        elif isinstance(src_raw, dict):
            src_fields = [(k, _c(v), None) for k, v in src_raw.items()]
        if src_fields is not None and ed.args[0].parts == ["attributes"]:
            from pyspark.sql.types import StringType

            out = df
            existing = set(attrs_cols)
            m = old
            for k, colv, dt in src_fields:
                in_promoted = k in existing
                in_map = None  # row-wise
                is_string = dt is None or isinstance(dt, StringType)
                if mode in ("update", "upsert"):
                    # update existing map key (row-wise) / promoted col
                    if is_string:
                        def _upd(_k, _v):
                            return lambda mk, mv: F.when(mk == _k, _v.cast("string")).otherwise(mv)

                        m = F.transform_values(m, _upd(k, colv))
                    if in_promoted:
                        out = out.withColumn(k, gated(colv, _pcol(k)))
                if mode in ("insert", "upsert") and not in_promoted:
                    # new key: promote as a typed column, unless the map
                    # already has it (insert skips row-wise… map keys are
                    # checked row-wise below for insert)
                    present_in_map = F.array_contains(F.map_keys(old), k)
                    if mode == "insert":
                        newcol = F.when(~present_in_map, colv)
                    else:
                        newcol = colv

                        def _drop(_k):
                            return lambda mk, mv: mk != _k

                        m = F.map_filter(m, _drop(k))
                    out = out.withColumn(k, gated(newcol, F.lit(None)))
            out = out.withColumn(col_name, gated(m, old))
            return out
        src_col = _c(src_raw)
        if mode == "upsert":
            new = F.map_concat(F.map_filter(old, lambda k, v: ~F.array_contains(F.map_keys(src_col), k)), src_col)
        elif mode == "insert":
            new = F.map_concat(old, F.map_filter(src_col, lambda k, v: ~F.array_contains(F.map_keys(old), k)))
        else:  # update
            new = F.map_zip_with(old, src_col, lambda k, v1, v2: F.when(v1.isNotNull(), F.coalesce(v2, v1)))
        return df.withColumn(col_name, gated(new, old))
    if name == "append":
        # append(target, value | values=[..]) — func_append.go: missing
        # target → new slice; scalar target → [old, new…]; slice target
        # → extended
        target = ed.args[0]
        vals = [comp.compile(a) for a in ed.args[1:]]
        if "values" in ed.kwargs:
            more = comp.compile(ed.kwargs["values"])
            vals.extend(more if isinstance(more, list) else [more])
        parts = comp._strip_ctx(target.parts)
        if (
            parts[0] == "attributes"
            and len(parts) == 3
            and isinstance(parts[1], tuple)
            and parts[1][1] in df.columns
        ):
            from pyspark.sql.types import ArrayType, StructType

            struct_name = parts[1][1]
            dt = df.schema[struct_name].dataType
            if isinstance(dt, StructType):
                fld = parts[2][1]
                fdt = next((f.dataType for f in dt.fields if f.name == fld), None)
                base = _pcol(struct_name)
                if fdt is None:
                    new_f = F.array(*[_c(v) for v in vals])
                elif isinstance(fdt, ArrayType):
                    et = fdt.elementType.simpleString()
                    new_f = F.concat(
                        base.getField(fld), F.array(*[_c(v).cast(et) for v in vals])
                    )
                else:  # scalar → slice [old, new…] (canonicalized to the
                    # scalar's type, documented: pcommon slices are
                    # heterogeneous, Spark arrays are not)
                    st = fdt.simpleString()
                    new_f = F.concat(
                        F.array(base.getField(fld)),
                        F.array(*[_c(v).cast(st) for v in vals]),
                    )
                return df.withColumn(
                    struct_name, gated(base.withField(fld, new_f), base)
                )
        col_name = comp.path_target_name(target)
        old = _pcol(col_name) if col_name in df.columns else None
        if old is None:
            new = F.array(*[_c(v) for v in vals])
            return df.withColumn(col_name, gated(new, F.lit(None)))
        new = F.concat(old, F.array(*[_c(v) for v in vals]))
        return df.withColumn(col_name, gated(new, old))
    if name == "delete_index":
        # delete_index(slice, i [, endIndex=j]) — removes [i, j) (j
        # defaults to i+1); index may be dynamic (Len(..)-1, Index(..))
        col_name = comp.path_target_name(ed.args[0])
        start = _c(comp.compile(ed.args[1])).cast("int")
        if len(ed.args) > 2:
            end = _c(comp.compile(ed.args[2])).cast("int")
        elif "endIndex" in ed.kwargs:
            end = _c(comp.compile(ed.kwargs["endIndex"])).cast("int")
        else:
            end = start + F.lit(1)
        old = _pcol(col_name)
        new = F.filter(old, lambda x, i: (i < start) | (i >= end))
        return df.withColumn(col_name, gated(new, old))
    raise NameError(f"OTTL editor not implemented: {name}")


# Context inference (pkg/ottl/context_inferrer.go): the lower the index,
# the higher the priority.  Only the contexts the engine has a path
# table for are *selectable*; metric-rooted paths select the datapoint
# table (the point frame carries the enclosing metric header).
_INFER_PRIORITY = {
    name: i
    for i, name in enumerate([
        "log", "exemplar", "datapoint", "metric", "spanevent", "span",
        "profile", "scope", "instrumentation_scope", "resource",
    ])
}
_INFER_TABLE = {
    "log": "log",
    "datapoint": "datapoint",
    "metric": "datapoint",
    "spanevent": "spanevent",
    "span": "span",
}


def _walk_paths(node, out: list) -> None:
    if isinstance(node, Path):
        out.append(node)
    elif isinstance(node, Statement):
        _walk_paths(node.editor, out)
        if node.where is not None:
            _walk_paths(node.where, out)
    elif isinstance(node, Call):
        for a in node.args:
            _walk_paths(a, out)
        for v in node.kwargs.values():
            _walk_paths(v, out)
    elif isinstance(node, BinOp):
        _walk_paths(node.left, out)
        _walk_paths(node.right, out)
    elif isinstance(node, Not):
        _walk_paths(node.operand, out)
    elif isinstance(node, ListLit):
        for x in node.items:
            _walk_paths(x, out)
    elif isinstance(node, Index):
        _walk_paths(node.target, out)
        _walk_paths(node.key, out)
    elif isinstance(node, MapLit):
        for _, v in node.entries:
            _walk_paths(v, out)
    elif isinstance(node, Lambda):
        _walk_paths(node.body, out)
    # Lit carries no paths


def infer_context(
    statements: list[str] | tuple = (), conditions: list[str] | tuple = ()
) -> str | None:
    """Pick the narrowest OTTL context from the paths used, so configs
    can omit the explicit context argument (pkg/ottl/context_inferrer.go
    newPriorityContextInferrer: every path's leading segment that names
    a known context is a candidate; the one with the highest priority —
    lowest index in defaultContextInferPriority — wins).

    Returns the ENGINE table name (``log`` / ``span`` / ``datapoint`` /
    ``spanevent``); ``metric.*``-rooted paths infer the datapoint table.
    Returns ``None`` when nothing pins a signal table: bare paths, or
    paths rooted only at resource / scope / instrumentation_scope (every
    signal frame here carries those columns, so they don't discriminate)
    — callers apply their own fallback, mirroring the routingconnector's
    retry with resource semantics (routingconnector/router.go:248-259).
    The reference's function/enum-support validation pass is a no-op
    here: the engine has ONE function registry shared by all contexts.
    Unknown leading segments (the reference's "non-prioritized contexts")
    are not selectable — there is no table to select."""
    paths: list[Path] = []
    for s in statements:
        _walk_paths(parse_statement(s), paths)
    for c in conditions:
        _walk_paths(parse_expr(c), paths)
    best: tuple[int, str] | None = None
    for p in paths:
        head = p.parts[0] if p.parts else None
        if not isinstance(head, str):
            continue
        pr = _INFER_PRIORITY.get(head)
        if pr is not None and (best is None or pr < best[0]):
            best = (pr, head)
    return _INFER_TABLE.get(best[1]) if best else None


def apply_statements(
    df: DataFrame, statements: list[str], ctx: str | None = "log"
) -> DataFrame:
    """transformprocessor: ordered statement sequence
    (processor/transformprocessor/internal/logs/processor.go:53-67).
    ``ctx`` picks the path→column table: ``log`` (default),
    ``span`` (trace pipelines, ottlspan paths over parse_otlp_traces'
    frame), ``datapoint`` (metric pipelines, ottldatapoint paths over
    parse_otlp_metrics' frame), or ``spanevent`` (ottlspanevent paths
    over parse_otlp_spanevents' frame, span.* parent paths included).
    ``ctx=None`` infers the context from the statements' paths
    (``infer_context``); statements whose paths don't pin a context
    need the explicit argument."""
    if ctx is None:
        ctx = infer_context(statements)
        if ctx is None:
            raise ValueError(
                "cannot infer OTTL context: no path names a known context "
                "(log/span/datapoint/metric/spanevent) — pass ctx= explicitly"
            )
    for s in statements:
        df = apply_statement(df, s, ctx=ctx)
    return df
