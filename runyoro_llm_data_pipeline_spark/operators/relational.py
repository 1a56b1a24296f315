"""Relational query operators over the star schema (SURVEY.md §2.3-2.6).

The reference's joins are J1 (equi-join on basename,
``scripts/audio_text_processing.py:26-49``) and J2 (anti-join vs the ledger,
``scripts/orchestrator.py:88-101``); its aggregates are counts/hashes
(§2.4). These generalize them onto the driver's TPC-H-ish tables, with the
physical plan chosen deliberately:

* dimension joins (`customer`, `nation`, …) are **broadcast** — no shuffle
  of the fact side; at 100 TB the fact table streams through map tasks;
* money aggregates run in **decimal** (exact, order-independent) and cast to
  double at the edge, so parallel sum order can never drift from a
  single-threaded oracle;
* anti-joins express admission control (J2) — Catalyst picks broadcast
  anti-join when the right side is small, shuffle-hash otherwise; AQE
  rewrites at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dec(col, prec=18, scale=2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregate with all-decimal money
    math. The scan should show PushedFilters on l_shipdate and a pruned
    ReadSchema; the aggregate partial-combines map-side."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount", 18, 4))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 generalization: fact ⋈ broadcast(dim) + grouped decimal sum."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


def shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into a two-fact join,
    grouped decimal revenue, deterministic top-10 (tie-broken by key)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount", 18, 4))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey")), orders.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def users_without_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 anti-join (admission-control shape): users with no *severe*
    (value > 90) 'error' event, with their event counts. At CDC scale the
    right side is the applied-key ledger; here it's the severe-error user
    set (broadcast by AQE)."""
    ev = _t(spark, sf_dir, "events")
    err_users = (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .select("user_id")
        .distinct()
    )
    return (
        ev.join(err_users, on="user_id", how="left_anti")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )


def nation_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained broadcast dims: customer→nation→region, grouped counts."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        )
    )


def customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join shape: every customer with order count/revenue,
    zero-filled for order-less customers (null-handling coverage). The
    aggregate runs BEFORE the join, so the outer join is dim ⋈ tiny-agg —
    broadcastable — instead of dim ⋈ fact."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(_dec("o_totalprice")).alias("rev"),
        )
    )
    return cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("rev").cast("double"), F.lit(0.0)).alias("revenue"),
    )


def suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): suppliers that shipped at least once after
    a date — the positive-membership twin of the J2 anti-join."""
    sup = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    )
    return (
        sup.join(li, sup.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
    )


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate, no join — the pushdown
    showcase (every predicate reaches the parquet scan)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 18, 4))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate (region → nation → grand total) — the
    grouping-sets family the reference lacks entirely; one pass, subtotal
    rows carry nulls per ANSI semantics."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    orders = _t(spark, sf_dir, "orders")
    joined = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    out = joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
    )
    # subtotal NULLs → 'ALL' sentinel: keeps the result null-free for
    # comparators that sort raw tuples
    return out.select(
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        "n_orders",
        "revenue",
    )


def event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (p50/p90/p99 of event value) — the
    distribution half of the A4 quality gate: a validity *scan* says how
    many rows are bad, quantiles say where the bulk sits. Uses Spark's
    exact ``percentile`` (linear interpolation, ANSI ``quantile_cont``
    semantics) so a single-threaded oracle agrees bit-for-bit after a
    6-dp round that absorbs the one-ulp interpolation-order difference.
    Exact percentiles sort each group once post-shuffle; at 100 TB swap
    in ``approx_percentile`` (t-digest, map-side combinable) — same call
    shape, bounded error, no per-group sort."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    pct = lambda p, name: F.round(F.percentile("value", F.lit(p)), 6).alias(name)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        pct(0.5, "p50"),
        pct(0.9, "p90"),
        pct(0.99, "p99"),
    )


def top_orders_per_segment(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Per-group top-k (O6 generalized from global top-k to grouped):
    highest-value orders per market segment via row_number over a
    deterministic (price desc, key) order. One shuffle on the group key;
    rank predicate ``<= k`` pushes into the window node (Spark's
    WindowGroupLimit) so each partition keeps a k-row heap instead of
    materializing the full sort — the shape that survives hot groups."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("c_mktsegment", "rank", "o_orderkey", "o_totalprice")
    )


def quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 generalization (NaN/validity scan, ``scripts/train_llm.py:210-224``):
    per-event-type counts of null / NaN / non-positive values — the
    pre-commit data-quality gate, all JVM predicates."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
        F.sum(F.isnan("value").cast("long")).alias("n_nan"),
        F.sum((F.col("value") <= 0).cast("long")).alias("n_nonpos"),
    )


def listing_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — order-sensitive directory-listing hash per group
    (``scripts/orchestrator.py:72-78``: MD5 over sorted names):
    ``md5(concat_ws(',', sort_array(collect_list(id))))`` per source."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.md5(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.col("doc_id").cast("string")))
            )
        ).alias("listing_md5"),
        F.count("*").alias("n_docs"),
    )


def rolling_event_avg(spark: SparkSession, sf_dir: str, window_s: int = 3600) -> DataFrame:
    """Time-RANGE sliding aggregate: per user, the mean event value over
    the trailing hour (frame = RANGE BETWEEN window_s PRECEDING AND
    CURRENT ROW on epoch seconds). The streaming twin is the tumbling
    ``event_rate_1h``; this is the *overlapping* form a feature pipeline
    uses for "activity in the last hour at each event".

    One shuffle on user_id, then a single sort per partition serves both
    frame aggregates. The mean is computed as exact decimal sum ÷ count
    (both order-independent) and divided in double at the edge, so the
    parallel frame evaluation can never drift from a single-threaded
    oracle. At 100 TB: user_id partitioning is the natural key
    distribution; a hot user degrades one task only (and the frame walk
    is O(rows in window), not O(rows²))."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & ~F.isnan("value")
    )
    eps = F.timestamp_diff(
        "SECOND", F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00")), F.col("ts")
    )
    ev = ev.withColumn("eps", eps)
    w = (
        Window.partitionBy("user_id")
        .orderBy("eps")
        .rangeBetween(-window_s, Window.currentRow)
    )
    vsum = F.sum(F.col("value").cast("decimal(18,6)")).over(w)
    vcnt = F.count("*").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "eps",
        vcnt.alias("n_1h"),
        F.round(vsum.cast("double") / vcnt, 6).alias("avg_1h"),
    )


def order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): order counts per market segment × priority as
    one row per segment with one column per priority. Spark's ``pivot``
    with an explicit value list compiles to a single grouped aggregate of
    conditional counts — one shuffle of 5×5 partial cells, no second pass
    to discover the pivot domain (never call ``pivot`` without the value
    list at scale: it runs an extra distinct job over the fact table)."""
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    wide = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderpriority", pris)
        .count()
    )
    renames = {
        "1-URGENT": "n_urgent",
        "2-HIGH": "n_high",
        "3-MEDIUM": "n_medium",
        "4-NOT SPECIFIED": "n_notspec",
        "5-LOW": "n_low",
    }
    return wide.select(
        "c_mktsegment",
        *[F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(renames[p]) for p in pris],
    )


def balance_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranking inside groups: per-nation account-balance
    decile (``ntile(10)``) and cumulative distribution for every
    customer. The order key is (c_acctbal, c_custkey) — fully tie-broken,
    so both rank functions are deterministic and engine-portable. One
    shuffle on the nation key; ranking is a single sorted pass per
    partition.

    The cumulative distribution is emitted as INTEGER micro-units,
    ``cume_micros = (10⁶ · row_number) div n`` (≡ floor(10⁶ ·
    cume_dist) under a unique order key), not as ``round(k/n, 6)``: with
    a power-of-two-times-five partition size, k/n lands EXACTLY on
    7th-decimal halves and Spark's HALF_UP-on-shortest-string rounding
    disagrees with DuckDB's raw-double rounding (found at sf0.1 where a
    nation has 640 customers: 41/640 = .0640625 → 0.064063 vs 0.064062).
    Integer division is exact in both engines at every scale."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    w = Window.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    wp = Window.partitionBy("n_name")
    rn = F.row_number().over(w).cast("long")
    n = F.count("*").over(wp).cast("long")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "n_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.ntile(10).over(w).alias("decile"),
            (F.lit(1000000).cast("long") * rn).alias("__num"),
            n.alias("__den"),
        )
        .select(
            "c_custkey",
            "n_name",
            "acctbal",
            "decile",
            F.expr("__num div __den").alias("cume_micros"),
        )
    )
