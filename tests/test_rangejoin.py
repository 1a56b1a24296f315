"""range_join_binned — overlapping-interval containment semantics
(operators/rangejoin.py): half-open [start, end) bounds, multi-match
fan-out for overlapping intervals, no duplicate matches when an interval
spans many bins, empty/degenerate intervals drop out, and the plan
contract (BroadcastHashJoin on the bin, the fact side never shuffles)."""

import pytest
from pyspark.sql import Row

from runyoro_llm_data_pipeline_spark.operators.rangejoin import range_join_binned


def _frames(spark):
    facts = spark.createDataFrame(
        [
            Row(fid=1, t=5),
            Row(fid=2, t=10),    # boundary: matches [10, 20) not [0, 10)
            Row(fid=3, t=15),    # inside the overlap of iv A and iv B
            Row(fid=4, t=95),    # matched by the bin-spanning interval only
            Row(fid=5, t=200),   # outside everything
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(iid="A", lo=0, hi=10),     # [0, 10)
            Row(iid="B", lo=10, hi=20),    # adjacent, half-open
            Row(iid="C", lo=12, hi=18),    # overlaps B
            Row(iid="D", lo=3, hi=100),    # spans many bins at bin_width=8
            Row(iid="E", lo=50, hi=50),    # empty: end == start
            Row(iid="F", lo=60, hi=40),    # degenerate: end < start
        ]
    )
    return facts, intervals


EXPECT = {
    (1, "A"), (1, "D"),
    (2, "B"), (2, "D"),
    (3, "B"), (3, "C"), (3, "D"),
    (4, "D"),
}


@pytest.mark.parametrize("bin_width", [1, 8, 64])
def test_containment_across_bin_widths(spark, bin_width):
    """The result is bin-width-invariant: bins are an execution detail."""
    facts, intervals = _frames(spark)
    out = range_join_binned(
        facts, intervals, ts="t", start="lo", end="hi", bin_width=bin_width
    )
    got = {(r.fid, r.iid) for r in out.collect()}
    assert got == EXPECT
    # exactly one row per (fact, interval) even when D spans many bins
    assert out.count() == len(EXPECT)


def test_shuffle_path_matches_broadcast_path(spark):
    facts, intervals = _frames(spark)
    out = range_join_binned(
        facts, intervals, ts="t", start="lo", end="hi",
        bin_width=8, broadcast_intervals=False,
    )
    assert {(r.fid, r.iid) for r in out.collect()} == EXPECT


def test_rejects_bad_inputs(spark):
    facts, intervals = _frames(spark)
    with pytest.raises(ValueError, match="bin_width"):
        range_join_binned(facts, intervals, "t", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError, match="overlap"):
        range_join_binned(
            facts.withColumnRenamed("fid", "iid"), intervals,
            "t", "lo", "hi", bin_width=8,
        )


def test_plan_broadcasts_intervals(spark):
    """Facts side must not shuffle: the only join is a BroadcastHashJoin
    and no Exchange hashpartitioning appears on the fact branch."""
    facts, intervals = _frames(spark)
    out = range_join_binned(
        facts, intervals, ts="t", start="lo", end="hi", bin_width=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "hashpartitioning" not in plan
