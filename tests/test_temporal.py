"""Temporal operator semantics on hand-built frames: session boundaries
at exactly-gap vs over-gap, as-of inclusivity/tie/no-prior cases, range
join boundary and bin-crossing pairs — plus plan-shape checks (no
nested-loop joins anywhere; these operators exist precisely to avoid
them)."""

import datetime


from sgp_sketch.temporal import asof_join, sessionize, windowed_range_join


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, 0, minute, second)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_sessionize_gap_boundaries(spark):
    """Gap strictly-greater starts a new session; a gap of exactly
    gap_seconds does NOT."""
    rows = [(1, 1, _ts(0)), (1, 2, _ts(10)),      # 600s gap == gap: same
            (1, 3, _ts(20, 1)),                   # 601s: new session
            (2, 4, _ts(0))]                       # other key: own session
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r.event_id: r.session_idx
           for r in sessionize(df, gap_seconds=600,
                               order_col="event_id").collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_sessionize_is_deterministic_on_ts_ties(spark):
    rows = [(1, 2, _ts(0)), (1, 1, _ts(0)), (1, 3, _ts(30))]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {r.event_id: r.session_idx
           for r in sessionize(df, gap_seconds=600,
                               order_col="event_id").collect()}
    assert got == {1: 1, 2: 1, 3: 2}


def test_asof_join_semantics(spark):
    """Inclusive at equal ts; latest-not-just-any prior; NULL when no
    prior right row; keys never cross."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5)),     # matches right at ts(5) — inclusive
         (1, 11, _ts(9)),     # latest prior is ts(5), not ts(1)
         (1, 12, _ts(0)),     # before any right row → NULL
         (2, 13, _ts(9))],    # other key: no right rows → NULL
        "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(1), 100.0), (1, _ts(5), 200.0), (1, _ts(30), 900.0)],
        "user_id long, ts timestamp, value double")
    out = asof_join(left, right, value_cols=("value",))
    got = {r.event_id: r.value_asof for r in out.collect()}
    assert got == {10: 200.0, 11: 200.0, 12: None, 13: None}
    # left schema passes through plus the one appended column
    assert out.columns == ["user_id", "event_id", "ts", "value_asof"]


def test_asof_join_plan_is_window_not_nested_loop(spark):
    left = spark.createDataFrame([(1, _ts(1))], "user_id long, ts timestamp")
    right = spark.createDataFrame([(1, _ts(0), 1.0)],
                                  "user_id long, ts timestamp, value double")
    p = _plan(asof_join(left, right, value_cols=("value",)))
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "Window" in p


def test_windowed_range_join_boundaries_and_bins(spark):
    """|Δt| == w is included, |Δt| just over w is not, and pairs whose
    bins differ by one are found (the explode-to-neighbor-bins case)."""
    left = spark.createDataFrame(
        [(1, 100, _ts(10, 0))], "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(9, 0)),    # 60s before: in (and in the PREVIOUS bin)
         (1, _ts(11, 0)),   # exactly +w: in
         (1, _ts(11, 1)),   # w+1s: out
         (2, _ts(10, 0))],  # other key: out
        "user_id long, ts timestamp")
    pairs = windowed_range_join(left, right, 60)
    assert pairs.count() == 2
    p = _plan(pairs)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_windowed_range_join_no_duplicate_pairs(spark):
    """A right row exploded to 3 bins must still pair with a left row at
    most once (the left row's single bin matches exactly one of them)."""
    left = spark.createDataFrame(
        [(1, 100, _ts(10))], "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(10, 30))], "user_id long, ts timestamp")
    assert windowed_range_join(left, right, 3600).count() == 1


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Two right rows with identical (key, ts): order_col breaks the tie —
    the greatest order_col value wins (last in ascending sort), and the
    choice is stable under repartitioning."""
    left = spark.createDataFrame(
        [(1, 10, _ts(5))], "user_id long, event_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, 7, _ts(1), 100.0), (1, 3, _ts(1), 300.0)],
        "user_id long, event_id long, ts timestamp, value double")
    for r in (right, right.repartition(5)):
        out = asof_join(left, r, value_cols=("value",),
                        order_col="event_id").collect()
        assert out[0].value_asof == 100.0  # event_id 7 > 3 → its value


def test_asof_join_no_row_tearing_on_null_values(spark):
    """The as-of values must come from ONE right row: a newer right row
    with a NULL field must not resurrect the older row's value for that
    field while taking the newer row's other fields."""
    from sgp_sketch.temporal import asof_join

    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10", 5.0, 2.0),
         ("u", "2024-01-01 00:00:20", None, 3.0)],
        "user_id string, ts string, a double, b double")
    left = spark.createDataFrame(
        [("u", "2024-01-01 00:00:30")], "user_id string, ts string")
    row = asof_join(left, right, value_cols=("a", "b")).first()
    assert row["a_asof"] is None  # the LATEST right row's a, which is NULL
    assert row["b_asof"] == 3.0


def test_windowed_range_join_zero_window_is_equality(spark):
    from sgp_sketch.temporal import windowed_range_join

    left = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10"), ("u", "2024-01-01 00:00:20")],
        "user_id string, ts string")
    right = spark.createDataFrame(
        [("u", "2024-01-01 00:00:10", 1), ("u", "2024-01-01 00:00:11", 2)],
        "user_id string, ts string, v int")
    got = windowed_range_join(left, right, 0, right_cols=("v",)).collect()
    assert len(got) == 1 and got[0]["r_v"] == 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match=">= 0"):
        windowed_range_join(left, right, -1)
