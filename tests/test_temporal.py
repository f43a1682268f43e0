"""Temporal operators: as-of join, interval-point range join,
multi-resolution rollup (pipeline/temporal.py)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from graph_data_science_spark.pipeline.temporal import (
    asof_join,
    range_join,
    time_rollup,
)


def _ts(m, s=0):
    return datetime(2024, 1, 1, 0, m, s)


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [(1, _ts(0), 10.0), (1, _ts(3), 30.0), (1, _ts(5), 50.0), (2, _ts(4), 40.0)],
        "k long, ts timestamp, px double",
    )


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [(1, _ts(2), "a"), (1, _ts(3), "b"), (1, _ts(4), "c"), (2, _ts(1), "d"),
         (3, _ts(1), "e")],
        "k long, ts timestamp, tag string",
    )


def test_asof_backward(spark, quotes, trades):
    got = {
        r["tag"]: (r["r_ts"], r["r_px"])
        for r in asof_join(trades, quotes, on="ts", by="k").collect()
    }
    assert got["a"] == (_ts(0), 10.0)
    assert got["b"] == (_ts(3), 30.0)  # inclusive at equality
    assert got["c"] == (_ts(3), 30.0)
    assert got["d"] == (None, None)    # no quote at or before 00:01 for k=2
    assert got["e"] == (None, None)    # key absent from right side entirely


def test_asof_forward_and_tolerance(spark, quotes, trades):
    fwd = {
        r["tag"]: (r["r_ts"], r["r_px"])
        for r in asof_join(trades, quotes, on="ts", by="k",
                           direction="forward").collect()
    }
    assert fwd["a"] == (_ts(3), 30.0)
    assert fwd["b"] == (_ts(3), 30.0)  # inclusive at equality
    assert fwd["c"] == (_ts(5), 50.0)
    assert fwd["d"] == (_ts(4), 40.0)
    tol = {
        r["tag"]: r["r_px"]
        for r in asof_join(trades, quotes, on="ts", by="k",
                           tolerance_sec=60.0).collect()
    }
    # 'a' at 00:02 is 120s from the 00:00 quote -> nulled by 60s tolerance
    assert tol["a"] is None and tol["b"] == 30.0 and tol["c"] == 30.0


def test_asof_right_ties_pick_max_payload(spark):
    left = spark.createDataFrame([(1, _ts(5))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(2), 7.0), (1, _ts(2), 9.0)], "k long, ts timestamp, v double"
    )
    rows = asof_join(left, right, on="ts", by="k").collect()
    assert rows[0]["r_v"] == 9.0  # max right payload struct wins


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, _ts(0)), (2, _ts(2)), (3, _ts(4)), (4, _ts(9))],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(100, _ts(0), _ts(4)), (200, _ts(4), _ts(5))],
        "iid long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["r_iid"])
        for r in range_join(pts, iv, "ts", "start_ts", "end_ts",
                            bucket_sec=60.0).collect()
    }
    # half-open [start, end): start inclusive, end exclusive
    assert got == {(1, 100), (2, 100), (3, 200)}
    left = range_join(pts, iv, "ts", "start_ts", "end_ts",
                      bucket_sec=60.0, how="left")
    assert left.count() == 4
    assert left.where(F.col("pid") == 4).first()["r_iid"] is None


def test_range_join_keyed_and_guard(spark):
    pts = spark.createDataFrame(
        [(1, 5, _ts(1)), (2, 6, _ts(1))], "pid long, k long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(9, 5, _ts(0), _ts(2))], "iid long, k long, start_ts timestamp, end_ts timestamp"
    )
    got = range_join(pts, iv, "ts", "start_ts", "end_ts", by="k",
                     bucket_sec=60.0).collect()
    assert [(r["pid"], r["r_iid"]) for r in got] == [(1, 9)]
    with pytest.raises(ValueError, match="spans"):
        range_join(pts, iv, "ts", "start_ts", "end_ts", by="k",
                   bucket_sec=0.001, max_buckets_per_interval=10)


def test_time_rollup(spark):
    df = spark.createDataFrame(
        [(_ts(0, 10), 1.0), (_ts(0, 50), 3.0), (_ts(1, 0), 5.0)],
        "ts timestamp, value double",
    )
    out = {
        (r["resolution"], r["bucket_start"]): (r["n"], r["sum_value"], r["avg_value"])
        for r in time_rollup(df, resolutions=("minute", "hour")).collect()
    }
    assert out[("minute", _ts(0))] == (2, 4.0, 2.0)
    assert out[("minute", _ts(1))] == (1, 5.0, 5.0)
    assert out[("hour", datetime(2024, 1, 1, 0, 0))] == (3, 9.0, 3.0)
    with pytest.raises(ValueError, match="unsupported"):
        time_rollup(df, resolutions=("fortnight",))
