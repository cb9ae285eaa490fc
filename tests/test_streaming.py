"""Structured Streaming pipeline: micro-batch fan-out equals the batch
result; windowed counts and streaming dedup behave."""

from __future__ import annotations

from conftest import SF_DIR

from sparkotel import pages as P
from sparkotel import pipeline as PL
from sparkotel import streaming as S


def _stage_input(spark, tmp_path) -> str:
    src = str(tmp_path / "pages_in")
    P.pages(spark, SF_DIR).repartition(4).write.mode("overwrite").parquet(src)
    return src


def test_streaming_routed_equals_batch(spark, tmp_path):
    src = _stage_input(spark, tmp_path)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    pages_stream = S.stream_pages(spark, src, max_files=2)
    assert pages_stream.isStreaming
    routed = S.routed_stream(spark, pages_stream)
    q = S.start_routed_sink(routed, out, ck)
    q.awaitTermination(300)

    got = spark.read.parquet(f"{out}/routed")
    batch = PL.build(spark, SF_DIR)["routed"]
    assert got.count() == batch.count()
    a = sorted(r["url"] + "|" + r["route"] for r in got.select("url", "route").collect())
    b = sorted(r["url"] + "|" + r["route"] for r in batch.select("url", "route").collect())
    assert a == b

    # exactly-once across restart: re-running with the same checkpoint
    # adds nothing (all files committed — the fileconsumer offset-restore
    # contract)
    q2 = S.start_routed_sink(S.routed_stream(spark, S.stream_pages(spark, src)), out, ck)
    q2.awaitTermination(300)
    assert spark.read.parquet(f"{out}/routed").count() == batch.count()


def test_streaming_windowed_counts(spark, tmp_path):
    src = _stage_input(spark, tmp_path)
    counts = S.windowed_counts(S.stream_pages(spark, src))
    q = S.start_counts_sink(counts, "wc_test")
    q.awaitTermination(300)
    got = {
        (r["interval_start"], r["host"]): r["n"]
        for r in spark.sql("SELECT * FROM wc_test").collect()
    }
    from sparkotel.operators.aggregate import interval_agg

    exp = {
        (r["interval_start"], r["host"]): r["n"]
        for r in interval_agg(P.pages(spark, SF_DIR), "1 hour", dims=("host",)).collect()
    }
    assert got == exp


def test_streaming_dedup(spark, tmp_path):
    # duplicate the input: two copies of every page file
    src = str(tmp_path / "dup_in")
    df = P.pages(spark, SF_DIR).repartition(2)
    df.write.mode("overwrite").parquet(src)
    df.write.mode("append").parquet(src)

    deduped = S.dedup_stream(S.stream_pages(spark, src))
    out = str(tmp_path / "dedup_out")

    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    n = P.pages(spark, SF_DIR).count()
    assert got.count() == n
    assert got.select("url").distinct().count() == n


def test_stateful_recombine_across_microbatches(spark, tmp_path):
    """applyInPandasWithState recombine: a logical record whose lines
    span TWO micro-batches must reassemble through the state store
    (recombine/transformer.go stateful buffer semantics)."""
    import glob
    import os
    import shutil
    import time

    schema = "host string, ord long, line string"
    os.makedirs(str(tmp_path / "lines"))

    def stage_file(df, name):
        """the file stream source lists FILES — stage a bare part file,
        not a Spark output directory."""
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
        part = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
        shutil.copy(part, str(tmp_path / "lines" / name))

    # record A starts in batch 1 and continues there; record B starts in
    # batch 2 (flushing A), record B's tail stays buffered (no boundary
    # after it) — exactly the reference's pending-buffer behavior.
    stage_file(
        spark.createDataFrame(
            [("h1", 1, "REC one"), ("h1", 2, " cont-a"), ("h1", 3, " cont-b")], schema
        ),
        "batch1.parquet",
    )
    time.sleep(1.1)  # distinct mod times -> deterministic batch order
    stage_file(
        spark.createDataFrame([("h1", 4, "REC two"), ("h1", 5, " cont-c")], schema),
        "batch2.parquet",
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "lines"))
    )
    out = S.stateful_recombine(stream, r"^REC", source_col="host")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("recombined")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {r["first_ord"]: r for r in spark.sql("SELECT * FROM recombined").collect()}
    # record A flushed when 'REC two' arrived in the SECOND micro-batch
    assert rows[1]["combined"] == "REC one\n cont-a\n cont-b"
    assert rows[1]["n_lines"] == 3
    # record B has no terminating boundary -> still buffered, not emitted
    assert 4 not in rows


def test_streaming_otlpjson_source_equals_batch(spark, tmp_path):
    """the OTLP/JSON parse is stateless column logic, so it runs
    unchanged over a file stream (the otlpjsonfilereceiver's tail-mode
    analogue): readStream.text -> parse_otlp_logs -> watermarked
    windowed severity counts == the same aggregation over a batch read."""
    from pyspark.sql import functions as F

    from sparkotel.otlpjson import parse_otlp_logs

    src = str(tmp_path / "otlp_in")
    P.load_tables(spark, SF_DIR, ["events"])
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    lines = spark.table("events").select(
        F.format_string(
            '{"resourceLogs":[{"resource":{"attributes":[]},"scopeLogs":['
            '{"scope":{"name":"g"},"logRecords":[{"timeUnixNano":"%d",'
            '"severityNumber":%d,"body":{"stringValue":"evt %d"}}]}]}]}',
            tus * 1000,
            (F.col("event_id") % 3 + 1) * 5,
            F.col("event_id"),
        ).alias("value")
    )
    # single time-ordered file: unordered multi-file input would make
    # the watermark drop genuinely-late rows (correct stream semantics,
    # but then stream != batch by design)
    lines.coalesce(1).write.mode("overwrite").text(src)

    def agg(df):
        return (
            parse_otlp_logs(df, line_col="value")
            .withColumn("ts_tz", F.col("ts").cast("timestamp"))
            .withWatermark("ts_tz", "2 hours")
            .groupBy(F.window("ts_tz", "6 hours"), "severity_number")
            .count()
        )

    stream = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(src)
    assert stream.isStreaming
    out = str(tmp_path / "otlp_out")
    q = (
        agg(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "otlp_ck"))
        .outputMode("append")
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(300)

    got = {
        (r["window"]["start"], r["severity_number"]): r["count"]
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r["window"]["start"], r["severity_number"]): r["count"]
        for r in agg(spark.read.text(src)).collect()
    }
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch result exactly
    assert got and all(want[k] == v for k, v in got.items())


def test_streaming_exp_histogram_source_equals_batch(spark, tmp_path):
    """the exponentialHistogram ingest arm is the same stateless
    from_json + explode shape, so it runs unchanged over a file stream:
    readStream.text -> parse_otlp_exp_histograms -> watermarked windowed
    bucket-mass sums == the batch aggregation."""
    from pyspark.sql import functions as F

    from sparkotel.otlpjson import parse_otlp_exp_histograms

    src = str(tmp_path / "exph_in")
    P.load_tables(spark, SF_DIR, ["events"])
    tus = F.unix_micros(F.col("ts").cast("timestamp"))
    lines = spark.table("events").select(
        F.format_string(
            '{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":['
            '{"scope":{"name":"g"},"metrics":[{"name":"e.lat",'
            '"exponentialHistogram":{"aggregationTemporality":1,"dataPoints":['
            '{"timeUnixNano":"%d","count":"%d","scale":1,"zeroCount":"%d",'
            '"positive":{"offset":0,"bucketCounts":["%d","%d"]}}]}}]}]}]}',
            tus * 1000,
            F.col("event_id") % 7,
            F.col("user_id") % 3,
            F.col("event_id") % 4,
            F.col("user_id") % 5,
        ).alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(src)

    def agg(df):
        return (
            parse_otlp_exp_histograms(df, line_col="value")
            .withColumn("ts_tz", F.col("ts").cast("timestamp"))
            .withWatermark("ts_tz", "2 hours")
            .groupBy(F.window("ts_tz", "6 hours"), "scale")
            .agg(
                F.sum("zero_count").alias("zeros"),
                F.sum(F.aggregate(
                    "positive_bucket_counts",
                    F.lit(0).cast("long"),
                    lambda a, x: a + x,
                )).alias("mass"),
            )
        )

    stream = spark.readStream.format("text").option("maxFilesPerTrigger", 1).load(src)
    out = str(tmp_path / "exph_out")
    q = (
        agg(stream)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "exph_ck"))
        .outputMode("append")
        .format("parquet")
        .start(out)
    )
    q.awaitTermination(300)
    key = lambda r: (r["window"]["start"], r["scale"])
    got = {key(r): (r["zeros"], r["mass"]) for r in spark.read.parquet(out).collect()}
    want = {key(r): (r["zeros"], r["mass"]) for r in agg(spark.read.text(src)).collect()}
    # append mode emits only watermark-closed windows; every emitted
    # window must match the batch result exactly
    assert got and all(want[k] == v for k, v in got.items())
    assert len(got) >= len(want) - 1  # at most the unclosed tail window differs


def test_streaming_crawl_latest_equals_batch(spark, tmp_path):
    """weburl.crawl_latest is streaming-compatible AS-IS: the
    canonicalization is a projection and the groupBy is an incremental
    max/count, so the same function runs on a readStream frame.  Two
    snapshot generations arrive as separate micro-batch files; the
    complete-mode result equals the batch run over the union."""
    from pyspark.sql import functions as F

    from sparkotel.functions import weburl as W

    p = P.pages(spark, SF_DIR).select("doc_id", "url", "warc_ts").limit(200)
    messy = F.concat(
        F.lit("HTTPS://"),
        F.upper(F.regexp_extract("url", "^https://([^/]+)", 1)),
        F.lit(":443"),
        F.regexp_extract("url", "^https://[^/]+(/.*)$", 1),
        F.lit("?utm_source=x#f"),
    )
    v2 = p.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        messy.alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")).alias("warc_ts"),
    )
    src = str(tmp_path / "snaps")
    p.coalesce(1).write.mode("overwrite").parquet(src)
    v2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, url string, warc_ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    assert stream.isStreaming
    out = W.crawl_latest(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("crawl_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r.canonical_url: (r.doc_id, r.n_snapshots)
        for r in spark.sql("SELECT * FROM crawl_stream").collect()
    }
    exp = {
        r.canonical_url: (r.doc_id, r.n_snapshots)
        for r in W.crawl_latest(p.unionByName(v2)).collect()
    }
    assert got == exp and len(got) == 200
    # every keeper is the +1h generation
    assert all(d >= 1000000 for d, _ in got.values())


def test_streaming_html_extraction_equals_batch(spark, tmp_path):
    """htmltext.main_text is streaming-compatible AS-IS: a stateless
    projection (regexp/replace chain over the html binary), so the same
    Column expression runs on a readStream frame — the receive→extract
    front of the WET pipeline as a stream.  Append mode, no state."""
    from sparkotel.functions.htmltext import main_text

    src = str(tmp_path / "html_in")
    P.pages(spark, SF_DIR).select("url", "html", "text").repartition(
        3
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("url string, html binary, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    assert stream.isStreaming
    out = stream.select("url", "text", main_text("html").alias("got"))
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wet_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM wet_stream").collect()
    batch_n = P.pages(spark, SF_DIR).count()
    assert len(rows) == batch_n
    # byte-identical extraction, per url, on every micro-batched row
    assert all(r.got == r.text for r in rows)


def test_streaming_rate_limit_equals_batch(spark, tmp_path):
    """Token-bucket state must persist across micro-batches: feeding the
    same arrival-ordered traces in three micro-batches yields exactly
    the batch replay's decisions (token_bucket_admit)."""
    import glob
    import os
    import shutil
    import time

    from sparkotel.operators.tailsample import token_bucket_admit

    schema = "limiter_key string, trace_id string, arrival_us long, n long"
    # rate 1 span/s, burst 4: admits/denies interleave across the batch
    # boundaries (t04 is denied only because t03 drained the bucket in
    # the PREVIOUS micro-batch).
    rows = [
        ("k", "t01", 0, 4),
        ("k", "t02", 1_000_000, 1),
        ("k", "t03", 2_000_000, 2),
        ("k", "t04", 3_000_000, 3),
        ("k", "t05", 6_000_000, 4),
        ("k", "t06", 7_000_000, 5),
        ("k2", "t07", 0, 3),
        ("k2", "t08", 500_000, 2),
    ]
    batch = {
        r["trace_id"]: r["final_decision"]
        for r in token_bucket_admit(
            spark.createDataFrame(rows, schema), 1, 1, 4
        ).collect()
    }

    os.makedirs(str(tmp_path / "traces"))

    def stage_file(data, name):
        df = spark.createDataFrame(data, schema)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stage"))
        part = glob.glob(str(tmp_path / "stage" / "part-*.parquet"))[0]
        shutil.copy(part, str(tmp_path / "traces" / name))

    stage_file(rows[:3] + rows[6:7], "b1.parquet")
    time.sleep(1.1)
    stage_file(rows[3:5] + rows[7:8], "b2.parquet")
    time.sleep(1.1)
    stage_file(rows[5:6], "b3.parquet")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "traces"))
    )
    out = S.stream_rate_limit(stream, 1, 1, 4)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_limited")
        .option("checkpointLocation", str(tmp_path / "ck_rl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = {
        r["trace_id"]: r["final_decision"]
        for r in spark.sql("SELECT * FROM rate_limited").collect()
    }
    assert streamed == batch
    # sanity on the fixture itself: both paths must exercise both sides
    assert set(batch.values()) == {"sampled", "not_sampled"}


def test_streaming_rate_limit_null_arrival_denied(spark, tmp_path):
    """A trace with NULL arrival (no completed span) or NULL cost must be
    DENIED without touching the bucket — same guard as the batch twin —
    not crash the micro-batch on int(NaN)."""
    from sparkotel.operators.tailsample import token_bucket_admit

    schema = "limiter_key string, trace_id string, arrival_us long, n long"
    rows = [
        ("k", "t01", None, 2),  # NULL arrival → denied, bucket untouched
        ("k", "t02", 0, None),  # NULL cost → denied, bucket untouched
        ("k", "t03", 0, 4),  # drains the full burst
        ("k", "t04", 1_000_000, 2),  # only 1 token refilled → denied
    ]
    batch = {
        r["trace_id"]: r["final_decision"]
        for r in token_bucket_admit(
            spark.createDataFrame(rows, schema), 1, 1, 4
        ).collect()
    }
    src = spark.createDataFrame(rows, schema)
    src.write.mode("overwrite").parquet(str(tmp_path / "traces"))
    stream = spark.readStream.schema(schema).parquet(str(tmp_path / "traces"))
    q = (
        S.stream_rate_limit(stream, 1, 1, 4)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("rate_limited_nulls")
        .option("checkpointLocation", str(tmp_path / "ck_rln"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["trace_id"]: r["final_decision"]
        for r in spark.sql("SELECT * FROM rate_limited_nulls").collect()
    }
    assert got == batch
    assert got["t01"] == "not_sampled" and got["t02"] == "not_sampled"
    assert got["t03"] == "sampled" and got["t04"] == "not_sampled"


def test_streaming_c4_and_blocklist_equal_batch(spark, tmp_path):
    """c4_line_scrub and url_blocklist_filter are streaming-compatible
    AS-IS: stateless projections (the blocklist side is a broadcast
    dim, legal against a stream), so the same operators run on a
    readStream frame and must emit exactly the batch rows."""
    from sparkotel.functions.text import c4_line_scrub
    from sparkotel.functions.weburl import DEFAULT_BLOCKLIST, url_blocklist_filter

    docs_src = str(tmp_path / "docs_in")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(docs_src)
    stream_docs = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_src)
    )
    q = (
        c4_line_scrub(stream_docs)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("c4_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_text"], r["keep"])
        for r in spark.sql("SELECT * FROM c4_stream").collect()
    }
    want = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_text"], r["keep"])
        for r in c4_line_scrub(docs).collect()
    }
    assert got == want

    pages_src = str(tmp_path / "pages_in")
    pages = P.pages(spark, SF_DIR).select("url")
    pages.repartition(3).write.mode("overwrite").parquet(pages_src)
    bl = spark.createDataFrame(DEFAULT_BLOCKLIST, "host string, category string")
    stream_pages = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(pages_src)
    )
    q2 = (
        url_blocklist_filter(stream_pages, bl)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bl_stream")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    got2 = {
        r["url"]: (r["block_category"], r["kw_score"], r["keep"])
        for r in spark.sql("SELECT * FROM bl_stream").collect()
    }
    want2 = {
        r["url"]: (r["block_category"], r["kw_score"], r["keep"])
        for r in url_blocklist_filter(pages, bl).collect()
    }
    assert got2 == want2
