"""convert_exponential_hist_to_explicit_hist — mirrors the reference's
test tables (func_convert_exponential_hist_to_explicit_hist_test.go:
TestUpper/TestMidpoint/TestUniform) vector for vector."""

from __future__ import annotations

import datetime as dt

import pytest

from sparkotel.operators import metricfuncs as MF

_TS = dt.datetime(2024, 1, 1)

_DDL = (
    "metric_name string, aggregation_temporality int, start_ts timestamp_ntz,"
    " ts timestamp_ntz, count long, sum double, min double, max double,"
    " scale int, zero_count long, positive_offset int,"
    " positive_bucket_counts array<long>,"
    " attributes map<string,string>, resource map<string,string>"
)

# TestUpper fixture: count=2, scale=7, offset=944,
# buckets [1, 0×28, 1] (test lines 25-77)
_UPPER_COUNTS = [1] + [0] * 28 + [1]


def _df(spark, scale, offset, counts, zero_count=0, count=2):
    return spark.createDataFrame(
        [("m", 1, _TS, _TS, count, 361.0, 166.0, 195.0, scale, zero_count,
          offset, counts, {"metric_type": "timing"}, {})],
        _DDL,
    )


@pytest.mark.parametrize(
    "dist,scale,offset,counts,zero,bounds,want",
    [
        # --- TestUpper (scale=7, offset=944) ---
        ("upper", 7, 944, _UPPER_COUNTS, 0, [1.0, 2.0, 3.0, 4.0, 5.0],
         [0, 0, 0, 0, 2]),
        ("upper", 7, 944, _UPPER_COUNTS, 0,
         [1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [2, 0, 0, 0, 0]),
        ("upper", 7, 944, _UPPER_COUNTS, 0,
         [160.0, 170.0, 180.0, 190.0, 200.0], [1, 0, 0, 1, 0]),
        # scale forced to 0 → bounds astronomically large → overflow
        ("upper", 0, 944, _UPPER_COUNTS, 0,
         [160.0, 170.0, 180.0, 190.0, 200.0], [0, 0, 0, 0, 2]),
        # --- TestMidpoint (scale=0, offset=5, counts [10,22,12]) ---
        ("midpoint", 0, 5, [10, 22, 12], 0, [1.0, 2.0, 3.0, 4.0, 5.0],
         [0, 0, 0, 0, 44]),
        ("midpoint", 0, 5, [10, 22, 12], 0,
         [1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [44, 0, 0, 0, 0]),
        ("midpoint", 0, 5, [10, 22, 12], 0,
         [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0],
         [0, 0, 0, 10, 0, 0, 0, 0, 22, 12]),
        # zero-count lands in bucket 0 when boundaries start at 0
        ("midpoint", 0, 5, [10, 22, 12], 5,
         [0.0, 10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0],
         [5, 0, 0, 0, 10, 0, 0, 0, 0, 22, 12]),
        # --- TestUniform (same fixture) ---
        ("uniform", 0, 5, [10, 22, 12], 0, [1.0, 2.0, 3.0, 4.0, 5.0],
         [0, 0, 0, 0, 44]),
        ("uniform", 0, 5, [10, 22, 12], 0,
         [1000.0, 2000.0, 3000.0, 4000.0, 5000.0], [44, 0, 0, 0, 0]),
        ("uniform", 0, 5, [10, 22, 12], 0,
         [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0],
         [0, 0, 0, 3, 3, 2, 8, 6, 5, 17]),
    ],
)
def test_reference_vectors(spark, dist, scale, offset, counts, zero, bounds, want):
    df = _df(spark, scale, offset, counts, zero_count=zero,
             count=sum(counts) + zero)
    rows = MF.convert_exponential_hist_to_explicit_hist(df, dist, bounds).collect()
    assert len(rows) == 1
    assert rows[0]["bucket_counts"] == want
    assert rows[0]["explicit_bounds"] == bounds
    # header passthrough, exp-specific columns dropped
    assert rows[0]["count"] == sum(counts) + zero
    assert "positive_offset" not in rows[0].asDict()


def test_empty_positive_half(spark):
    df = _df(spark, 0, 0, [], zero_count=0, count=0)
    rows = MF.convert_exponential_hist_to_explicit_hist(
        df, "upper", [160.0, 200.0]
    ).collect()
    assert rows[0]["bucket_counts"] == [0, 0]


def test_validation(spark):
    df = _df(spark, 0, 5, [1], 0, 1)
    with pytest.raises(ValueError, match="explicit bounds cannot be empty"):
        MF.convert_exponential_hist_to_explicit_hist(df, "upper", [])
    with pytest.raises(ValueError, match="invalid distribution"):
        MF.convert_exponential_hist_to_explicit_hist(df, "sideways", [1.0])
    with pytest.raises(ValueError, match="not reproducible"):
        MF.convert_exponential_hist_to_explicit_hist(df, "random", [1.0])
