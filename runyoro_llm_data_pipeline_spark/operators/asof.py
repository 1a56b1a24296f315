"""As-of (temporal latest-prior) join — single-shuffle union+window form.

The CDC side of this engine answers "what is the latest state per key"
(``cdc/dedup.py``); the as-of join answers the query-side twin: "for each
left row, what was the right side's latest state at or before that row's
time". The reference pairs artifacts by exact basename equality
(``scripts/orchestrator.py:118-156``); an as-of join is the time-keyed
generalization a transcript/event store needs (attach the last config
change, the last page view, the prevailing price).

Why not a range join: expressing ``l.ts >= r.ts`` as a join condition
gives Catalyst a broadcast-nested-loop or an O(n·m) range explosion per
key. The scale-correct plan — the one Flink/QuestDB/kdb use conceptually —
is a single hash shuffle on the key: tag both sides, union, sort each
key's partition once by (ts, side), and carry the right side's values
forward with a running ``last(..., ignorenulls)`` window. Cost is one
Exchange + one in-partition sort over |L|+|R| rows, independent of match
fan-out; at 1000 executors the union co-partitions both inputs in the
same shuffle, and AQE skew-split applies because it is a plain window
shuffle, not a join build side.

Tie semantics match DuckDB ``ASOF JOIN`` (inclusive: a right row at the
exact left timestamp matches) by ordering right rows (side 0) before left
rows (side 1) at equal ``ts``. Rows with several right entries at the
same (key, ts) are ambiguous in any as-of semantics — collapse them first
(e.g. ``max_by``) if the input allows duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_RTS = "__asof_rts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of left join: every ``left`` row, with each ``right``
    ``value_cols`` filled from the right row of the same ``keys`` with the
    greatest ``ts`` ≤ the left row's ``ts`` (NULL when no such row).

    ``tolerance``: optional maximum staleness as an INTERVAL string (e.g.
    ``"1 hour"``); matches older than it resolve to NULL, mirroring
    pandas ``merge_asof(tolerance=...)``.

    Column contract: ``left`` and ``right`` share exactly ``keys`` + ``ts``;
    ``value_cols`` exist only on ``right``; all other left columns pass
    through untouched.
    """
    overlap = (set(left.columns) & set(right.columns)) - set(keys) - {ts}
    if overlap:
        raise ValueError(
            f"left/right share non-key columns {sorted(overlap)}; "
            "rename before asof_join"
        )
    r_types = dict(right.dtypes)
    l_types = dict(left.dtypes)

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn(
        _RTS, F.lit(None).cast(l_types[ts])
    )
    for vc in value_cols:
        lhs = lhs.withColumn(vc, F.lit(None).cast(r_types[vc]))

    rhs = right.select(*keys, ts, *value_cols).withColumn(
        _SIDE, F.lit(0)
    ).withColumn(_RTS, F.col(ts))
    for c in left.columns:
        if c not in keys and c != ts:
            rhs = rhs.withColumn(c, F.lit(None).cast(l_types[c]))

    # Running frame (unboundedPreceding → currentRow): Spark evaluates
    # last(ignorenulls) in one forward pass per partition — O(|L|+|R|).
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = rhs.unionByName(lhs.select(*rhs.columns))
    for vc in value_cols:
        filled = filled.withColumn(vc, F.last(vc, ignorenulls=True).over(w))
    filled = filled.withColumn(_RTS, F.last(_RTS, ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        fresh = F.col(_RTS) >= F.col(ts) - F.expr(f"INTERVAL {tolerance}")
        for vc in value_cols:
            out = out.withColumn(vc, F.when(fresh, F.col(vc)))
    return out.select(*left.columns, *value_cols)
