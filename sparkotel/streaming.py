"""Structured Streaming front end — the filelog-tailing analogue.

The reference's "stream" is a polling loop over files
(/root/reference/pkg/stanza/fileconsumer/file.go:436, design.md:98-183:
glob match → fingerprint → restore offsets → read new data).  Spark's
file-source streaming is the same contract done by the engine:
directory listing + exactly-once file tracking in the checkpoint (the
offset store), so the stanza persister/fingerprint machinery maps to
``readStream`` + ``checkpointLocation``.

The batch stages compose unchanged: parse/enrich are stateless
projections + stream-static broadcast joins, routing is a projection —
all streaming-compatible.  Stateful pieces:

- windowed per-host counts with a watermark (late-data bound) — the
  intervalprocessor under event time instead of wall clock
  (processor/intervalprocessor/processor.go:73-209);
- streaming dedup via ``dropDuplicates`` within the watermark — the
  logdedupprocessor's interval-scoped identity collapse
  (processor/logdedupprocessor/processor.go:32-140);
- fan-out via ``foreachBatch`` writing each route partition — the
  routingconnector in micro-batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkotel.pipeline import ROUTES, enrich_stage, parse_stage
from sparkotel.operators.route import assign_routes

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string, "
    "host string, doc_id bigint"
)


def stream_pages(spark: SparkSession, input_dir: str, max_files: int = 10) -> DataFrame:
    """file-source stream over a pages parquet directory; maxFilesPerTrigger
    is the micro-batch analogue of the fileconsumer poll batch."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
        .drop("html")
    )


def routed_stream(spark: SparkSession, pages: DataFrame, engine: str = "native") -> DataFrame:
    parsed = parse_stage(pages, engine=engine)
    enriched = enrich_stage(spark, parsed)
    return assign_routes(enriched, ROUTES, "other")


def windowed_counts(
    df: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """event-time interval rollup with a late-data bound."""
    return (
        df.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("host"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("interval_start"), "host", "n")
    )


def dedup_stream(df: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """streaming logdedup: first occurrence per url within the watermark."""
    return df.withWatermark("warc_ts", watermark).dropDuplicates(["url"])


def stateful_recombine(
    df: DataFrame,
    is_first_pattern: str,
    source_col: str = "host",
    order_col: str = "ord",
    line_col: str = "line",
    timeout_ms: int = 0,
):
    """CUSTOM stateful operator via ``applyInPandasWithState`` — the
    true streaming analogue of the stanza recombine transformer
    (operator/transformer/recombine/transformer.go): per-source
    buffered lines persist in the state store ACROSS micro-batches,
    a record flushes when the next is_first boundary arrives, and
    ``timeout_ms`` > 0 force-flushes idle buffers
    (``forceFlushTimeout``) via a processing-time timeout.

    Emits (source, combined, n_lines, first_ord) in append mode.
    Incomplete trailing records stay buffered until a boundary or
    timeout — exactly the reference's behavior.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("source", StringType()),
            StructField("combined", StringType()),
            StructField("n_lines", LongType()),
            StructField("first_ord", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("lines", ArrayType(StringType())),
            StructField("ords", ArrayType(LongType())),
        ]
    )
    cols = ["source", "combined", "n_lines", "first_ord"]

    def fn(key, pdf_iter, state):
        import re

        first_re = re.compile(is_first_pattern)
        source = key[0]
        if state.hasTimedOut:
            lines, ords = state.get
            state.remove()
            if lines:
                yield pd.DataFrame(
                    [(source, "\n".join(lines), len(lines), ords[0])], columns=cols
                )
            return
        lines, ords = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        out_rows = []
        frames = [p for p in pdf_iter]
        rows = pd.concat(frames).sort_values(order_col) if frames else pd.DataFrame()
        for _, r in rows.iterrows():
            line = r[line_col]
            if first_re.match(str(line)) and lines:
                out_rows.append((source, "\n".join(lines), len(lines), ords[0]))
                lines, ords = [], []
            lines.append(str(line))
            ords.append(int(r[order_col]))
        state.update((lines, ords))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        if out_rows:
            yield pd.DataFrame(out_rows, columns=cols)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return df.groupBy(source_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def start_routed_sink(
    routed: DataFrame, out_dir: str, checkpoint: str, available_now: bool = True
):
    """routingconnector fan-out in micro-batch form: one partitioned
    write per micro-batch; the checkpoint dir is the offset/commit store
    (the stanza persister analogue)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("append")
            .partitionBy("route")
            .parquet(f"{out_dir}/routed")
        )

    writer = (
        routed.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_counts_sink(counts: DataFrame, query_name: str, available_now: bool = True):
    """windowed aggregate → in-memory sink (test/monitoring surface)."""
    writer = (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
