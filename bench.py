#!/usr/bin/env python
"""sparkotel benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric", "value" (total sec), "unit": "sec", "queries":
{name: sec}, "sf", "docs", "docs_per_sec"}.

--dual: run the end-to-end pipeline at two parallelism levels
(local[8] vs local[32] — the sandbox stand-in for N vs 4N executors,
per BASELINE.json's two-cluster-size rule), compute scaling
efficiency = (thr@4N / thr@N) / 4, and write BENCH/BASELINE.md.

The bench input is pages_scaled(replicate=$SPARKOTEL_BENCH_REPLICATE,
default 100) — row content is a pure function of doc_id, so the scaled
table keeps the skew/malformed distributions of the small fixtures.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPLICATE = int(os.environ.get("SPARKOTEL_BENCH_REPLICATE", "100"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def bench_pipeline(spark, sf_dir: str, replicate: int) -> tuple[dict, int]:
    """Full parse→enrich→route→aggregate at bench scale.

    One cached enriched prefix feeds the routed write, the copy sink,
    and every aggregate — the production shape (cache instead of an
    intermediate table because this is a single-job bench).
    """
    from pyspark import StorageLevel

    from sparkotel.pages import geo_table, lang_table, pages_scaled
    from sparkotel.pipeline import ROUTES, SINK_METRICS, enrich_stage, parse_stage
    from sparkotel.operators.aggregate import connector_metric
    from sparkotel.operators.route import assign_routes, route_outputs

    timings: dict[str, float] = {}
    t0 = time.time()
    src = pages_scaled(spark, sf_dir, replicate).drop("html")
    n_docs = src.count()
    timings["generate_count"] = time.time() - t0

    t0 = time.time()
    enriched = enrich_stage(spark, parse_stage(src))
    enriched = enriched.persist(StorageLevel.MEMORY_AND_DISK)
    routed = assign_routes(enriched, ROUTES, "other")
    _noop(routed)  # parse+enrich+route, one pass
    timings["parse_enrich_route"] = time.time() - t0

    t0 = time.time()
    sinks = route_outputs(enriched, ROUTES, "other")
    for name, sdf in sinks.items():
        _noop(sdf)
    timings["sink_fanout"] = time.time() - t0

    t0 = time.time()
    for sink, defs in SINK_METRICS.items():
        for m in defs:
            _noop(connector_metric(sinks[sink], m))
    timings["aggregates"] = time.time() - t0

    enriched.unpersist()
    return timings, n_docs


def bench_trainingdata(spark, sf_dir: str) -> dict:
    from sparkotel.functions.dedup import minhash_lsh_pairs
    from sparkotel.functions.similarity import brute_force_topk
    from sparkotel.functions.text import quality_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timings = {}
    t0 = time.time()
    _noop(quality_score(docs))
    timings["text_quality"] = time.time() - t0
    t0 = time.time()
    _noop(minhash_lsh_pairs(docs))
    timings["dedup_minhash_lsh"] = time.time() - t0
    t0 = time.time()
    _noop(brute_force_topk(emb, [0, 1, 2, 3, 4]))
    timings["ann_cosine_topk"] = time.time() - t0
    return timings


def run_once(cpus: str) -> dict:
    from sparkotel.session import get_spark

    spark = get_spark(app="sparkotel-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    pipeline_t, n_docs = bench_pipeline(spark, SF_DIR, REPLICATE)
    td_t = bench_trainingdata(spark, SF_DIR)
    spark.stop()
    queries = {**pipeline_t, **td_t}
    pipeline_sec = sum(v for k, v in pipeline_t.items() if k != "generate_count")
    return {
        "metric": "parse->enrich->route->aggregate pipeline, sf-scaled pages",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "docs": n_docs,
        "pipeline_sec": round(pipeline_sec, 3),
        "docs_per_sec": round(n_docs / pipeline_sec, 1),
        "cpus": cpus,
    }


def run_dual() -> None:
    """two-parallelism scaling evidence → BENCH/BASELINE.md"""
    results = {}
    for cpus in ("8", "32"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    thr8 = results["8"]["docs_per_sec"]
    thr32 = results["32"]["docs_per_sec"]
    eff = (thr32 / thr8) / 4.0
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            "# BENCH — two-parallelism scaling evidence\n\n"
            "Same input, same job, two parallelism levels (sandbox stand-in\n"
            "for N vs 4N executors per BASELINE.json's north rule).\n\n"
            f"| parallelism | docs | pipeline sec | docs/sec |\n|---|---|---|---|\n"
            f"| local[8]  | {results['8']['docs']} | {results['8']['pipeline_sec']} | {thr8} |\n"
            f"| local[32] | {results['32']['docs']} | {results['32']['pipeline_sec']} | {thr32} |\n\n"
            f"**Scaling efficiency (thr@32 / thr@8) / 4 = {eff:.3f}** "
            f"(target ≥ 0.8)\n\n"
            f"Per-stage timings at local[32]: "
            f"`{json.dumps(results['32']['queries'])}`\n"
        )
    summary = dict(results["32"])
    summary["scaling_efficiency_8_to_32"] = round(eff, 3)
    summary["docs_per_sec_local8"] = thr8
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--dual" in sys.argv:
        run_dual()
    else:
        print(json.dumps(run_once(CPUS)))
