"""Multimodal columns — binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns.  The Spark-side
plumbing (schema, Arrow batch shape, mapInPandas partitioning) is real
and tested; the actual codec step is STUBBED (this container has no
image/audio libraries): ``decode_stub`` raises ``NotImplementedError``
for real formats and produces a deterministic fake feature vector for
the synthetic payloads, so the pipeline shape can be exercised
end-to-end.

At scale: mapInPandas streams Arrow batches through the Python worker —
the binary column is pruned everywhere else, and batch size is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch, so executor memory
stays flat regardless of blob sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"GIF8": "gif",
    b"RIFF": "riff",
    b"<htm": "html",
    b"<HTM": "html",
    b"<!DO": "html",  # doctype-prefixed pages (pages.html_body_expr)
}

FEATURE_DIM = 4
FEATURE_SCHEMA = "url string, media_type string, n_bytes bigint, features array<double>"


def sniff_media_type(df: DataFrame, bin_col: str = "html", out: str = "media_type") -> DataFrame:
    """magic-byte detection as a native expression (no UDF).

    Compares hex of the binary prefix (a binary→string cast would mangle
    non-UTF-8 magic bytes like \\x89PNG)."""
    expr = None
    for magic, name in MAGIC.items():
        cond = F.hex(F.substring(F.col(bin_col), 1, len(magic))) == magic.hex().upper()
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(out, expr.otherwise(F.lit("unknown")))


def decode_stub(payload: bytes, media_type: str) -> list[float]:
    """STUB codec.  Real decode (PIL/ffmpeg) is not available in this
    container; synthetic/html payloads get a deterministic fake feature
    (byte-prefix statistics) so tests exercise the full data path."""
    if media_type in ("png", "jpeg", "gif", "riff"):
        raise NotImplementedError(
            f"real {media_type} decoding requires imaging libraries not present here"
        )
    n = len(payload)
    prefix = payload[:64]
    return [
        float(n),
        float(sum(prefix) % 997),
        float(prefix[0]) if n else 0.0,
        float(prefix[-1]) if n else 0.0,
    ]


def extract_features(df: DataFrame, bin_col: str = "html", url_col: str = "url") -> DataFrame:
    """mapInPandas feature extraction — Arrow-batched, never per-row
    Python at the Spark API level; the batch loop is pandas-side."""
    df = sniff_media_type(df.select(url_col, bin_col), bin_col)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pd.DataFrame(
                {
                    "url": pdf[url_col],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf[bin_col].map(len),
                    "features": [
                        decode_stub(bytes(p), m)
                        for p, m in zip(pdf[bin_col], pdf["media_type"])
                    ],
                }
            )
            yield out

    return df.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, bin_col: str = "video", every_n: int = 30) -> DataFrame:
    """video frame-sampling plumbing: one row per sampled frame index.
    The decode is stubbed; the explode/partition shape is the real
    thing a frame-sampling pipeline needs."""
    n_frames = (F.length(F.col(bin_col)) / 1024).cast("int")  # fake frame count
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_idx", F.explode(idx))
