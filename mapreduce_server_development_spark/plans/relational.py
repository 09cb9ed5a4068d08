"""Relational query library (SURVEY.md §2.3 additive surface).

The reference's query plane is two executables (word count, grep —
SURVEY.md §2.2 E1-E4); everything else here is the additive relational
surface the rebuild provides: scans, projections/filters, joins (inner/
semi/anti/broadcast), aggregations (hash, distinct, rollup/cube),
windows (ranking, running), sorts/top-k, set ops, scalar functions
(string/date/math/json).

Cross-engine parity rules (every query must hash-match its DuckDB
oracle at sf0.01):
- Money/ratio doubles are cast to DECIMAL(16,4) before arithmetic and
  aggregation: the data is generated with <=2 decimal places, so the
  cast is exact in both engines and decimal aggregation is exact, then
  the final value is cast to DOUBLE (deterministic in both engines).
- Averages are computed as CAST(decimal_sum AS DOUBLE)/count so both
  engines do the same double division.
- Timestamps are output as 'yyyy-MM-dd HH:mm:ss' strings (Spark is
  pinned to UTC; DuckDB is UTC-naive).
- Orderings that feed LIMIT/row_number always carry a unique tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

from .money import DEC, _dec, _ts_str  # noqa: F401 - shared money idiom


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(16,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(16,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(16,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan -> filter -> hash agg -> sort.

    Reference parity: subsumes the sorted-group count contract
    (reference wc_reduce.sh `uniq -c` over the F4+F5 sorted merge) with
    Spark's partial+final hash aggregation — no global sort needed.
    The filter and 7-column projection are pushed into the parquet scan.
    """
    one = F.lit(1).cast("decimal(8,4)")
    disc_price = _dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(8,4)"))
    charge = disc_price * (one + F.col("l_tax").cast("decimal(8,4)"))
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                    * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: highly selective conjunctive filter -> global agg.

    All four predicates push down to the parquet scan; the aggregate is
    a single-pass partial+final sum with no shuffle of raw rows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * F.col("l_discount").cast("decimal(8,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_distinct_agg",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation (expand + two-phase agg under the hood)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(16,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(16,4))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over orders."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total"), F.count("*").alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first()
        )
    )


@query(
    "q_case_agg",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END) AS BIGINT)
               AS big_orders,
           CAST(SUM(CASE WHEN o_totalprice <= 200000 THEN 1 ELSE 0 END) AS BIGINT)
               AS small_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(16,4))
                         ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE) AS finished_value
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (TPC-H Q12 pattern)."""
    zero = F.lit(0).cast(DEC)
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_totalprice") > 200000, 1).otherwise(0)).alias("big_orders"),
            F.sum(F.when(F.col("o_totalprice") <= 200000, 1).otherwise(0)).alias("small_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", _dec("o_totalprice")).otherwise(zero))
            .cast("double")
            .alias("finished_value"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts by priority x status. Explicit pivot values
    keep the plan a single two-phase hash agg (no extra distinct-values
    job, stable schema at any scale)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        # Lowercase aliases: the driver's value-hash is case-sensitive on
        # column names, and the oracle emits f/o/p.
        .select(
            "o_orderpriority",
            F.col("F").alias("f"),
            F.col("O").alias("o"),
            F.col("P").alias("p"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles per group (Spark ``percentile`` =
    DuckDB ``quantile_cont``, both linear-interpolation). Exact
    percentile buffers per group — tolerable here (3 bounded groups),
    a hot-group hazard at 100 TB. Two scale drop-ins exist:
    ``percentile_approx`` (t-digest, mergeable) for sketchy pipelines,
    and ``q_group_percentiles`` (relational_ext.py) for EXACT
    interpolated percentiles with no group-sized buffer — order
    statistics off the distributed row_number."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
               AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join -> agg -> top-10.

    customer grows with SF, so it carries no broadcast hint: Catalyst's
    size estimate (with AQE) broadcasts the filtered side while it fits
    and falls back to a shuffle join at scale. orders->lineitem joins
    on the orderkey. The tiebreak on l_orderkey makes LIMIT
    deterministic.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(8,4)")
    revenue = _dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(8,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DOUBLE)
               AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'AMERICA')
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-table star join -> agg.

    Broadcast decisions follow ``BROADCAST_DIMS`` (sources/tables.py):
    supplier/nation/region are bounded and broadcast; customer grows
    with SF (at 100 TB broadcasting it would OOM the driver), so
    orders<->customer and orders<->lineitem are shuffle joins on their
    keys — AQE handles skew.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    one = F.lit(1).cast("decimal(8,4)")
    revenue = _dec("l_extendedprice") * (one - F.col("l_discount").cast("decimal(8,4)"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q_semi_anti_join",
    oracle="""
    SELECT 'has_orders' AS tag, COUNT(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'no_orders' AS tag, COUNT(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY tag
    """,
)
def q_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi and left-anti joins (EXISTS / NOT EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count("*").alias("n"))
        .select(F.lit("has_orders").alias("tag"), "n")
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count("*").alias("n"))
        .select(F.lit("no_orders").alias("tag"), "n")
    )
    return semi.unionAll(anti).orderBy("tag")


@query(
    "q_outer_join_agg",
    oracle="""
    SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS order_count,
           CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(16,4))),
                         CAST(0 AS DECIMAL(16,4))) AS DOUBLE) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    ORDER BY c.c_custkey
    """,
)
def q_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spent"),
        )
        # No trailing global sort: output is customer-linear and the
        # driver compare is order-insensitive — a full range-partitioned
        # sort at 100 TB would buy nothing.
    )


@query(
    "q_salted_join_agg",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))) AS DOUBLE) AS total_price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_salted_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join: lineitem salted on a ROW-UNIQUE derived key
    (orderkey*8 + linenumber — linenumber alone has only 7 values, so
    a hot orderkey could reach at most 7 of the 8 salt buckets) spreads
    any hot orderkey across all 8 sub-partitions; orders is replicated
    8x. Result is provably identical to the plain join — the oracle IS
    the plain join.
    """
    from ..functions.skew import salted_join

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"), "l_linenumber", "l_extendedprice"
        )
        .withColumn("rid", F.col("okey") * 8 + F.col("l_linenumber"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on="okey", num_salts=8, salt_src="rid")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "q_asof_join",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, event_id FROM events
          WHERE event_type = 'click'),
    best AS (
        SELECT p.event_id, c.event_id AS prev_event_id, c.ts AS prev_ts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY c.ts DESC, c.event_id DESC) AS rk
        FROM p JOIN c ON c.user_id = p.user_id AND c.ts < p.ts
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
           b.prev_event_id,
           strftime(b.prev_ts, '%Y-%m-%d %H:%M:%S') AS prev_ts
    FROM p LEFT JOIN (SELECT * FROM best WHERE rk = 1) b
      ON b.event_id = p.event_id
    ORDER BY p.event_id
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the user's most recent strictly
    prior click (left-outer temporal point lookup).

    Spark has no ASOF JOIN built-in; ``functions.joins.asof_join``
    composes it from union + last-non-null window: one shuffle on
    user_id, O(|L|+|R|) — no range-join explosion. The oracle is an
    explicit windowed pick with the SAME tie-break as the operator
    (latest ts, then highest event_id) — DuckDB's native ASOF JOIN
    leaves same-timestamp ties unspecified, which would be a latent
    nondeterministic mismatch if two clicks ever share a microsecond.
    """
    from ..functions.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    res = asof_join(
        purchases, clicks, by="user_id", left_ts="ts", right_ts="ts",
        right_cols=["event_id", "ts"], prefix="prev_",
    )
    return res.select(
        "event_id",
        "user_id",
        _ts_str("ts").alias("ts"),
        "prev_event_id",
        F.date_format("prev_ts", "yyyy-MM-dd HH:mm:ss").alias("prev_ts"),
    )  # no trailing sort: purchase-linear output


# ---------------------------------------------------------------------------
# Windows, sorts, top-k
# ---------------------------------------------------------------------------


@query(
    "q_window_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    ORDER BY c_custkey, rn
    """,
)
def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking window (one shuffle on the
    partition key; at scale this beats a self-join top-k by far)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        # No trailing global sort — output is customer-linear.
    )


@query(
    "q_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(16,4)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_total,
           LAG(o_orderkey) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_orderkey
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum + lag — analytic window frame."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(_dec("o_totalprice")).over(frame).cast("double").alias("running_total"),
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        )
        # No trailing global sort — output is order-linear; the window's
        # own partition-local ordering is all the semantics need.
    )


@query(
    "q_topk_global",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject
    (per-partition heap + driver merge — no full sort at scale)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "q_set_operations",
    oracle="""
    SELECT 'both' AS tag, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    UNION ALL
    SELECT 'building_only' AS tag, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    )
    ORDER BY tag, c_custkey
    """,
)
def q_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over key sets."""
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    both = building.intersect(rich).select(F.lit("both").alias("tag"), "c_custkey")
    only = building.subtract(rich).select(F.lit("building_only").alias("tag"), "c_custkey")
    return both.unionAll(only)  # no trailing sort: customer-linear output


# ---------------------------------------------------------------------------
# Scalar functions (string / date / math / json)
# ---------------------------------------------------------------------------


@query(
    "q_scalar_string_math",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           upper(p_brand) AS brand_upper,
           length(p_name) AS name_len,
           substr(p_type, 1, 5) AS type_prefix,
           concat(p_brand, ':', p_type) AS brand_type,
           abs(p_size - 25) AS size_dist,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(sqrt(CAST(p_size AS DOUBLE)), 4) AS size_sqrt
    FROM part
    ORDER BY p_partkey
    """,
)
def q_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String and math scalar functions (all whole-stage-codegen'd)."""
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.lower("p_name").alias("name_lower"),
            F.upper("p_brand").alias("brand_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.abs(F.col("p_size") - 25).alias("size_dist"),
            F.ceil("p_retailprice").alias("price_ceil"),
            F.floor("p_retailprice").alias("price_floor"),
            F.round(F.sqrt(F.col("p_size").cast("double")), 4).alias("size_sqrt"),
        )
        # No trailing global sort — output is part-linear, all scalar
        # expressions stay in one codegen stage with zero shuffles.
    )


@query(
    "q_date_functions",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
           EXTRACT(MONTH FROM o_orderdate) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(16,4))) AS DOUBLE) AS month_value
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date part extraction + time-bucketed aggregation."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("month_value"),
        )
        .orderBy("order_year", "order_month")
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.get_json_object("props", "$.k").cast("bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Events: time-bucket aggregation and sessionization
# ---------------------------------------------------------------------------


@query(
    "q_events_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(16,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window (hourly) aggregation over the events table —
    the batch twin of the streaming query in streaming_queries.py."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        # No trailing global sort — output grows with the time range.
    )


@query(
    "q_events_sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessions AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap flag + running sum = session ids.

    Single shuffle on user_id; both window functions share the same
    partitioning/ordering so Spark evaluates them in one Window node.
    The gap compares microsecond epochs on both sides (the fixture has
    sub-second timestamps; second-truncated deltas can flip boundaries).
    Boundary: a gap of EXACTLY 30 minutes starts a new session (>=) —
    the same closed/open convention as Spark's native session_window,
    so this query, q_session_window and q_bounce_rate all split the
    same event stream identically.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap >= 1800 * 1_000_000), 1).otherwise(0).alias("new_session"),
    )
    return (
        flagged.select(
            "user_id", "ts", "event_id", F.sum("new_session").over(frame).alias("session_id")
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        # No trailing global sort — output is session-linear.
    )
