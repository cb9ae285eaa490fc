"""Record reassembly — recombine (multiline join) without any state.

Reference: operator/transformer/recombine/config.go:52-63,
transformer.go — stateful buffers keyed by source, flushed on
is_first/is_last boundaries or timeout.  In batch Spark the timeout
disappears: a window partitioned by the source identifier, ordered by
the record offset, computes a running count of boundary markers as the
group id, then one groupBy concatenates each group (SURVEY §2.11).

Scale note: the window + groupBy share the same partitioning key
(source), so AQE plans a single shuffle; per-source data must fit a
task, which holds because sources are individual files/documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recombine(
    df: DataFrame,
    source_col: str,
    order_col: str,
    line_col: str,
    is_first: Column,
    combine_with: str = "\n",
    max_batch_size: int | None = None,
) -> DataFrame:
    """Collapse consecutive rows into one per boundary group.

    ``is_first`` marks the first line of each logical record
    (is_last_entry configs invert to a shifted is_first via lead()).
    Returns (source, group_id, combined, n_lines, first_<order_col>).
    """
    w = Window.partitionBy(source_col).orderBy(order_col)
    grouped = df.withColumn(
        "_gid",
        F.sum(is_first.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    out = (
        grouped.groupBy(source_col, "_gid")
        .agg(
            F.concat_ws(
                combine_with, F.transform(F.array_sort(F.collect_list(F.struct(order_col, line_col))), lambda s: s.getField(line_col))
            ).alias("combined"),
            F.count(F.lit(1)).alias("n_lines"),
            F.min(order_col).alias(f"first_{order_col}"),
        )
        .withColumnRenamed("_gid", "group_id")
    )
    if max_batch_size is not None:
        out = out.filter(F.col("n_lines") <= max_batch_size)
    return out


def split_lines(
    df: DataFrame,
    text_col: str = "text",
    keep: list[str] | None = None,
    encoding: str | None = None,
    trim: str | None = None,
) -> DataFrame:
    """Line splitter (pkg/stanza/split/ + trim.go + decode.go) — text →
    one row per line with its offset, the fileconsumer reader's emit
    shape.

    ``encoding``: decode a binary payload column first (fileconsumer's
    encoding config; ``F.decode`` handles the charsets the JVM knows —
    UTF-8/16, ISO-8859-*, windows-125*).  ``trim`` ∈
    {'leading','trailing','both'} mirrors trim.Config.
    """
    keep = keep or [c for c in df.columns if c != text_col]
    src = F.col(text_col)
    if encoding is not None:
        src = F.decode(src.cast("binary"), encoding)
    line = F.col("line")
    if trim == "leading":
        line = F.ltrim(line)
    elif trim == "trailing":
        line = F.rtrim(line)
    elif trim == "both":
        line = F.btrim(line)
    out = df.select(
        *keep,
        F.posexplode(F.split(src, "\n")).alias("line_offset", "line"),
    )
    if trim is not None:
        out = out.withColumn("line", line)
    return out


def split_by_pattern(
    df: DataFrame,
    text_col: str = "text",
    line_start_pattern: str | None = None,
    line_end_pattern: str | None = None,
    omit_pattern: bool = False,
    keep: list[str] | None = None,
) -> DataFrame:
    """Pattern-based tokenization (pkg/stanza/split/split.go Config:
    exactly one of line_start_pattern / line_end_pattern; omit_pattern
    drops the matched delimiter from the token).

    - line_end_pattern: a token ends AT THE END of each match
      (LineEndSplitFunc); a trailing remainder is the flush-at-EOF
      token — a batch table is always "at EOF".
    - line_start_pattern: a token runs from one match start to the
      next (LineStartSplitFunc); a non-matching prefix before the
      first match flushes as its own token.

    Implementation: one regexp_replace pass inserts a NUL sentinel at
    each boundary, one split + posexplode emits tokens — scan-speed,
    no UDF.  Multiline mode ((?m)) like the reference's compile.
    Caveat: source text containing NUL bytes would split spuriously
    (NUL never appears in line-oriented logs).  Documented divergence:
    two IMMEDIATELY adjacent start-pattern matches (zero bytes between
    them) emit two tokens here, where the reference's LineStartSplitFunc
    merges them into one — the blanket empty-token filter below drops
    the zero-width token between the boundaries.  Real log corpora have
    at least a newline between records, so the shapes agree in practice.
    """
    if (line_start_pattern is None) == (line_end_pattern is None):
        raise ValueError(
            "exactly one of line_start_pattern or line_end_pattern must be set"
        )
    keep = keep or [c for c in df.columns if c != text_col]
    src = F.col(text_col)
    if line_end_pattern is not None:
        pat = f"(?m)({line_end_pattern})"
        marked = F.regexp_replace(src, pat, "\x00" if omit_pattern else "$1" + "\x00")
    else:
        pat = f"(?m)({line_start_pattern})"
        marked = F.regexp_replace(src, pat, "\x00" + ("" if omit_pattern else "$1"))
    out = df.select(
        *keep, F.posexplode(F.split(marked, "\x00")).alias("token_offset", "line")
    )
    # empty artifacts: a leading boundary (start-pattern at position 0)
    # or a trailing boundary (end-pattern at end of text) yields an
    # empty token — the reference emits neither
    return out.where(F.col("line") != "")
