"""Property-based parity tests for the temporal operators: pandas
``merge_asof`` as an independent oracle for asof_join (backward /
forward / tolerance over arbitrary keyed event streams), and a plain
O(n*m) python sweep for range_join. Right-side timestamps are unique
per key (the documented determinism precondition — tie resolution
differs by design: max payload struct vs pandas positional)."""

import itertools
from datetime import datetime, timedelta

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_data_science_spark.pipeline.temporal import asof_join, range_join

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow],
)
_IDS = itertools.count()

_T0 = datetime(2024, 1, 1)

# (key, offset_seconds) event streams; right offsets deduped per key
left_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120)), min_size=1, max_size=12
)
right_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 120)), min_size=1, max_size=12
).map(lambda xs: sorted(set(xs)))


@given(left=left_strategy, right=right_strategy,
       direction=st.sampled_from(["backward", "forward"]),
       tolerance=st.sampled_from([None, 30.0]))
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(
    spark, left, right, direction, tolerance
):
    ldf = spark.createDataFrame(
        [(i, k, _T0 + timedelta(seconds=s)) for i, (k, s) in enumerate(left)],
        "lid long, k long, ts timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, _T0 + timedelta(seconds=s), float(100 * k + s)) for k, s in right],
        "k long, ts timestamp, v double",
    )
    got = {
        r["lid"]: (r["r_ts"], r["r_v"])
        for r in asof_join(
            ldf, rdf, on="ts", by="k", direction=direction,
            tolerance_sec=tolerance,
        ).collect()
    }

    lp = pd.DataFrame(
        {"lid": range(len(left)),
         "k": [k for k, _ in left],
         "ts": [pd.Timestamp(_T0 + timedelta(seconds=s)) for _, s in left]}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _ in right],
         "ts": [pd.Timestamp(_T0 + timedelta(seconds=s)) for _, s in right],
         "v": [float(100 * k + s) for k, s in right]}
    ).sort_values("ts", kind="stable")
    exp = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        tolerance=None if tolerance is None else pd.Timedelta(seconds=tolerance),
        suffixes=("", "_r"), allow_exact_matches=True,
    )
    # pandas drops the matched right ts; recover it from v's encoding
    for _, row in exp.iterrows():
        lid = int(row["lid"])
        if pd.isna(row["v"]):
            assert got[lid] == (None, None)
        else:
            k, s = divmod(int(row["v"]), 100)
            assert got[lid] == (_T0 + timedelta(seconds=s), row["v"])


@given(points=left_strategy,
       intervals=st.lists(
           st.tuples(st.integers(0, 2), st.integers(0, 100), st.integers(1, 40)),
           min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_range_join_matches_python_sweep(spark, points, intervals):
    pdf = spark.createDataFrame(
        [(i, k, _T0 + timedelta(seconds=s)) for i, (k, s) in enumerate(points)],
        "pid long, k long, ts timestamp",
    )
    idf = spark.createDataFrame(
        [
            (j, k, _T0 + timedelta(seconds=s), _T0 + timedelta(seconds=s + w))
            for j, (k, s, w) in enumerate(intervals)
        ],
        "iid long, k long, start_ts timestamp, end_ts timestamp",
    )
    got = {
        (r["pid"], r["r_iid"])
        for r in range_join(
            pdf, idf, "ts", "start_ts", "end_ts", by="k", bucket_sec=7.0
        ).collect()
    }
    exp = {
        (i, j)
        for i, (pk, ps) in enumerate(points)
        for j, (ik, s, w) in enumerate(intervals)
        if pk == ik and s <= ps < s + w
    }
    assert got == exp
