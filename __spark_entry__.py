"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship parse→enrich→route→aggregate
pipeline at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle (see
``sparkotel/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sparkotel.registry import build_registry  # noqa: E402

_REGISTRY = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _REGISTRY["agg_count_all_errors_other"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.spark for name, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in _REGISTRY.items() if q.oracle is not None}
