"""As-of join + sessionization (sparkft.temporal): hand-computed semantics
and the plan shapes that make them scale (no range-join explosion, one
Exchange for the session windows)."""

from datetime import datetime

import pytest


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("sparkft-temporal-tests")
        .getOrCreate()
    )
    yield s


def _ts(m, s=0):
    return datetime(2024, 1, 1, 12, m, s)


def test_asof_join_semantics(spark):
    from sparkft.temporal import asof_join

    left = spark.createDataFrame(
        [
            (1, 100, _ts(10)),   # after two views -> latest (ts 9) wins
            (2, 100, _ts(5)),    # exactly AT a view ts -> eligible (<=)
            (3, 200, _ts(1)),    # user with no views at all -> NULLs
            (4, 100, _ts(3)),    # before every view of the user -> NULLs
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(5), 1.0),
            (100, _ts(5), 7.0),   # duplicate (key, ts): max(value) wins
            (100, _ts(9), 2.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    rows = {r["event_id"]: r
            for r in asof_join(left, right, "user_id", "ts", ["value"]).collect()}
    assert rows[1]["ts_asof"] == _ts(9) and rows[1]["value_asof"] == 2.0
    assert rows[2]["ts_asof"] == _ts(5) and rows[2]["value_asof"] == 7.0
    assert rows[3]["ts_asof"] is None and rows[3]["value_asof"] is None
    assert rows[4]["ts_asof"] is None and rows[4]["value_asof"] is None


def test_asof_join_no_range_join_in_plan(spark):
    """The whole point of the union+window form: the physical plan must be
    shuffle+sort+window, never a nested-loop/cartesian range join."""
    from sparkft.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 1, _ts(1))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "user_id long, ts timestamp, value double")
    plan = (
        asof_join(left, right, "user_id", "ts", ["value"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_sessionize_gap_boundary(spark):
    from sparkft.temporal import sessionize

    events = spark.createDataFrame(
        [
            # user 1: 0 -> +30:00 exactly (same session: strict >) -> +90
            (1, _ts(0)), (1, datetime(2024, 1, 1, 12, 30)),
            (1, datetime(2024, 1, 1, 14, 0)),
            # user 2: a single event
            (2, _ts(7)),
        ],
        "user_id long, ts timestamp",
    )
    out = sorted(
        ((r["user_id"], r["session_start"], r["session_end"], r["n_events"])
         for r in sessionize(events, "user_id", "ts", 30.0).collect())
    )
    assert out == [
        (1, _ts(0), datetime(2024, 1, 1, 12, 30), 2),
        (1, datetime(2024, 1, 1, 14, 0), datetime(2024, 1, 1, 14, 0), 1),
        (2, _ts(7), _ts(7), 1),
    ]


def test_sessionize_single_exchange(spark):
    """lag and the running sum must share one (key, ts) sort: exactly one
    Exchange below the final aggregation's own shuffle."""
    from sparkft.temporal import sessionize

    events = spark.createDataFrame(
        [(1, _ts(0))], "user_id long, ts timestamp")
    plan = (
        sessionize(events, "user_id", "ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one Exchange for the windows; the groupBy on (key, _session_no) is
    # partition-local after that shuffle, so Catalyst plans NO second one
    assert plan.count("Exchange") == 1


def test_asof_join_null_value_rows_fill_from_one_row(spark):
    """ADVICE r5: when the most recent right row carries a NULL value, the
    as-of output must take BOTH ts and value from that row (value NULL),
    not mix the newest ts with an older row's value."""
    from pyspark.sql import functions as F

    from sparkft.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100, 10.0)], "k long, ts long, x double")
    right = spark.createDataFrame(
        [(1, 50, 5.0), (1, 90, None)], "k long, ts long, v double")
    out = asof_join(left, right, "k", "ts", ["v"]).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["ts_asof"] == 90 and row["v_asof"] is None


def test_asof_join_rejects_reserved_columns(spark):
    import pytest

    from sparkft.temporal import asof_join

    left = spark.createDataFrame([(1, 1, 2)], "k long, ts long, _side long")
    right = spark.createDataFrame([(1, 1, 2.0)], "k long, ts long, v double")
    with pytest.raises(ValueError, match="reserved"):
        asof_join(left, right, "k", "ts", ["v"])


def test_asof_join_null_right_ts_ignored(spark):
    from sparkft.temporal import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, 50, 5.0)], "k long, ts long, v double")
    out = asof_join(left, right, "k", "ts", ["v"]).collect()[0].asDict()
    assert out["ts_asof"] == 50 and out["v_asof"] == 5.0
