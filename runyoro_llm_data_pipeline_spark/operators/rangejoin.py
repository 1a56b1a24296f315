"""Interval (range) join — bin-bucketed, broadcast-first.

Complements the as-of join (``operators/asof.py``): as-of answers "the
latest right row at or before t"; a range join answers "every interval
that *contains* t" when intervals may overlap (tariff regimes, experiment
windows, maintenance windows, rollout cohorts). The reference pairs
artifacts only by exact key equality (``scripts/orchestrator.py:118-156``);
range containment is the time-dimension generalization a transcript/event
store needs.

Why not write the predicate directly: a non-equi ``ts >= start AND ts <
end`` join gives Catalyst only BroadcastNestedLoopJoin (O(|facts|·|iv|)
comparisons) or a cartesian. The scale-correct plan — what Databricks'
range-join bin hints and KDB's window joins do — is to discretize time
into fixed bins: each interval is exploded into the bins it covers, each
fact row computes its single containing bin, and the join becomes a hash
equi-join on the bin id followed by the exact containment filter. A fact
row has exactly ONE bin, so no post-join dedup is needed; an interval of
width w costs ceil(w/bin)+1 exploded rows, so the caller picks ``bin`` on
the order of the typical interval width.

Physical shape at 100 TB: interval tables (regimes, configs, windows) are
dims — exploded and **broadcast**, the fact side never shuffles and the
exact filter runs inside the same WholeStageCodegen stage as the join.
When the interval side is too large to broadcast, pass
``broadcast_intervals=False`` for a shuffle hash equi-join on the bin id,
which AQE can skew-split like any other shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def range_join_binned(
    facts: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bin_width: int,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Inner join: every ``facts`` row paired with every ``intervals`` row
    whose half-open range ``[start, end)`` contains the fact's ``ts``.

    ``ts``, ``start``, ``end`` are integer-valued columns on a shared axis
    (epoch micros, sequence numbers — anything totally ordered and
    divisible); ``bin_width`` is the bucketing granule in the same unit
    (> 0). Intervals with ``end <= start`` match nothing. Column sets must
    be disjoint apart from the join mechanics; both inputs pass through.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be a positive integer")
    overlap = set(facts.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"facts/intervals column overlap: {sorted(overlap)}")

    w = F.lit(int(bin_width)).cast("long")
    # one exploded row per bin the half-open interval touches;
    # sequence() is inclusive on both ends so the last bin is (end-1)//w
    iv = intervals.filter(F.col(end) > F.col(start)).withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(start).cast("long") / w),
                F.floor((F.col(end).cast("long") - F.lit(1)) / w),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    fx = facts.withColumn(_BIN, F.floor(F.col(ts).cast("long") / w))
    return (
        fx.join(iv, on=_BIN, how="inner")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop(_BIN)
    )
