"""spanprocessor: span-name ⇄ attributes surgery + status rewrite.

Reimplements ``processor/spanprocessor/span.go``:

- ``name.from_attributes`` + ``separator``
  (``processFromAttributes``, span.go:96-146): new name = configured
  attribute values joined by the separator, in order; if ANY key is
  missing the name is left unchanged.
- ``name.to_attributes`` (``processToAttributes``, span.go:148-215):
  ordered regex rules with named capture groups run against the span
  name; each matching rule writes every named submatch into the
  attributes and replaces the submatch text inside the name with
  ``{group_name}`` (unless ``keep_original_name``);
  ``break_after_match`` stops at the first matching rule.  The
  submatch-index surgery (splice between arbitrary group boundaries) is
  not expressible with SQL regexp_replace, so this one transform runs
  as an Arrow-vectorized pandas UDF executing the reference algorithm
  with Python ``re`` — one batch pass, no shuffle, no per-row Python.
- ``status`` (``processUpdateStatus``, span.go:217-235): set the code
  unconditionally; the message only for Error (Ok/Unset clear it).
- the include/exclude gate becomes an optional OTTL ``where``
  condition: non-matching spans pass through untouched.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_STATUS_CODES = {"Unset": 0, "Ok": 1, "Error": 2}


def span_name_from_attributes(
    spans: DataFrame, keys: Sequence[str], separator: str = "", where: str | None = None
) -> DataFrame:
    """name.from_attributes: join attribute values; any miss → no-op."""
    a = F.col("attributes")
    have_all = F.lit(True)
    for k in keys:
        have_all = have_all & a[k].isNotNull()
    new_name = F.concat_ws(separator, *[a[k] for k in keys])
    gate = have_all & (F.size(F.map_keys(a)) > 0)
    if where is not None:
        from sparkotel.expr import Compiler, _c, parse_expr

        comp = Compiler(spans, ctx="span")
        gate = gate & F.coalesce(_c(comp.compile_bool(parse_expr(where))), F.lit(False))
    return spans.withColumn("name", F.when(gate, new_name).otherwise(F.col("name")))


def _to_attributes_fn(rules: Sequence[str], keep_original_name: bool, break_after_match: bool):
    compiled = [re.compile(p) for p in rules]
    # Go re.SubexpNames(): "" for unnamed groups — mirrored exactly
    names = [[_inv(r).get(i, "") for i in range(r.groups + 1)] for r in compiled]

    def run(batch: pd.Series) -> pd.DataFrame:
        out_names, out_maps = [], []
        for name in batch:
            extracted: dict[str, str] = {}
            if name:
                for rule, rnames in zip(compiled, names):
                    m = rule.search(name)
                    if m is None:
                        continue
                    sb, idx = [], 0
                    for i in range(1, rule.groups + 1):
                        if m.start(i) == -1:
                            # non-participating group (e.g. (?P<x>a)?b):
                            # no submatch to extract or splice — Go's
                            # ReplaceAllString skips -1 index pairs too
                            continue
                        gname = rnames[i]
                        extracted[gname] = m.group(i) or ""
                        sb.append(name[idx : m.start(i)] + "{" + gname + "}")
                        idx = m.end(i)
                    if idx < len(name):
                        sb.append(name[idx:])
                    if not keep_original_name:
                        name = "".join(sb)
                    if break_after_match:
                        break
            out_names.append(name)
            out_maps.append(extracted)
        return pd.DataFrame({"name": out_names, "extracted": out_maps})

    return run


def _inv(r: re.Pattern) -> dict[int, str]:
    return {v: k for k, v in r.groupindex.items()}


def span_name_to_attributes(
    spans: DataFrame,
    rules: Sequence[str],
    keep_original_name: bool = False,
    break_after_match: bool = False,
) -> DataFrame:
    fn = _to_attributes_fn(tuple(rules), keep_original_name, break_after_match)
    udf = pandas_udf(fn, "struct<name:string,extracted:map<string,string>>")
    out = spans.withColumn("_ta", udf(F.col("name")))
    return (
        out.withColumn("name", F.col("_ta.name"))
        .withColumn(
            "attributes",
            F.when(
                F.size(F.map_keys(F.col("_ta.extracted"))) > 0,
                F.map_concat(
                    F.map_filter(
                        "attributes",
                        lambda k, _: ~F.array_contains(
                            F.map_keys(F.col("_ta.extracted")), k
                        ),
                    ),
                    F.col("_ta.extracted"),
                ),
            ).otherwise(F.col("attributes")),
        )
        .drop("_ta")
    )


def span_set_status(
    spans: DataFrame, code: str, description: str = "", where: str | None = None
) -> DataFrame:
    """status: set code; message only carried for Error (span.go:217-235)."""
    code_num = _STATUS_CODES[code]
    msg = description if code == "Error" else ""
    gate = F.lit(True)
    if where is not None:
        from sparkotel.expr import Compiler, _c, parse_expr

        comp = Compiler(spans, ctx="span")
        gate = F.coalesce(_c(comp.compile_bool(parse_expr(where))), F.lit(False))
    return spans.withColumns(
        {
            "status_code": F.when(gate, F.lit(code_num)).otherwise(F.col("status_code")),
            "status_message": F.when(gate, F.lit(msg)).otherwise(F.col("status_message")),
        }
    )
