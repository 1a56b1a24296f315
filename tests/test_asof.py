"""asof_join — backward temporal join semantics (operators/asof.py):
inclusive-at-equal-ts matching (DuckDB ASOF parity), NULL on no prior
match, per-key isolation, tolerance staleness cutoff, and the plan
contract (one Exchange on the key, a window, no join node at all)."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(5), lid=1),
            Row(k="a", ts=_ts(10), lid=2),   # equal-ts right row must match
            Row(k="a", ts=_ts(30), lid=3),
            Row(k="b", ts=_ts(7), lid=4),    # no prior right row for b
            Row(k="b", ts=_ts(100), lid=5),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(3), price=1.0),
            Row(k="a", ts=_ts(10), price=2.0),
            Row(k="a", ts=_ts(20), price=3.0),
            Row(k="b", ts=_ts(50), price=9.0),
        ]
    )
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, keys=["k"], ts="ts", value_cols=["price"])
    got = {r["lid"]: r["price"] for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: None, 5: 9.0}
    assert out.columns == ["k", "ts", "lid", "price"]


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, keys=["k"], ts="ts", value_cols=["price"],
        tolerance="5 seconds",
    )
    got = {r["lid"]: r["price"] for r in out.collect()}
    # lid=3 (ts=30) last match at ts=20 is 10s stale -> NULL;
    # lid=5 (ts=100) match at ts=50 is 50s stale -> NULL
    assert got == {1: 1.0, 2: 2.0, 3: None, 4: None, 5: None}


def test_asof_rejects_column_clash(spark):
    left, right = _frames(spark)
    try:
        asof_join(
            left.withColumn("price", F.lit(0.0)), right,
            keys=["k"], ts="ts", value_cols=["price"],
        )
        raise AssertionError("expected ValueError on column clash")
    except ValueError:
        pass


def test_asof_plan_is_single_shuffle_window(spark):
    """The scale contract: union + one hash Exchange on the key + window —
    never a join operator (a range-condition join would be a per-key
    O(n*m) nested loop)."""
    left, right = _frames(spark)
    out = asof_join(left, right, keys=["k"], ts="ts", value_cols=["price"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    for bad in ("SortMergeJoin", "BroadcastNestedLoopJoin", "CartesianProduct",
                "BroadcastHashJoin", "ShuffledHashJoin"):
        assert bad not in plan, bad
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange <= 2  # one per input pre-union collapses to the key
