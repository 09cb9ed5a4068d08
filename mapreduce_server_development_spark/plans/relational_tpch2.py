"""TPC-H suite completion: the six remaining query patterns (Q2, Q8,
Q9, Q16, Q20, Q21), adapted to the fixture schema (no ``partsupp``
table, no ``l_commitdate``/``l_receiptdate`` columns — lineitem itself
serves as the part<->supplier cost/quantity relation).

What each one exercises (reference parity: the reference's SQL surface
is exhausted by wc/grep — these queries cover SURVEY.md §2.3's additive
relational categories at the hardest end: correlated subqueries in
every decorrelation shape Catalyst produces):

- Q2  — correlated MIN subquery -> decorrelated aggregate + join-back
- Q8  — conditional market-share ratio over a 7-table join
- Q9  — multi-table profit expression, grouped two ways
- Q16 — NOT IN -> broadcast anti-join + COUNT(DISTINCT)
- Q20 — correlated threshold subquery -> semi-join chain
- Q21 — EXISTS + NOT EXISTS -> per-group stats (single shuffle), not
        the naive double self-join

Cross-engine parity rules as in ``relational.py``: decimal-exact money
arithmetic, ``CAST(... AS DOUBLE)`` only at the output boundary,
COUNT stays BIGINT on both engines, division done in double on both
sides (IEEE-deterministic).

Scale posture (100 TB): part/supplier/nation are bounded dims ->
broadcast; every other join/agg shuffles on its natural key
(partkey / orderkey / suppkey), which are uniform in TPC-H-style data.
The Q21 formulation aggregates per-order stats in ONE pass over
lineitem instead of two correlated self-joins — at 100 TB that's one
shuffle of (orderkey) instead of three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

from .money import DEC, _dec, _rev  # noqa: F401 - shared money idiom


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier (correlated MIN subquery, decorrelated)
# ---------------------------------------------------------------------------


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE))
                   AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    rc AS (
        SELECT c.l_partkey, c.l_suppkey, c.unit_cost
        FROM costs c
        JOIN supplier s ON s.s_suppkey = c.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'ASIA'
    )
    SELECT p.p_partkey AS partkey, p.p_name AS part_name,
           s.s_name AS supp_name,
           CAST(s.s_acctbal AS DOUBLE) AS supp_acctbal,
           rc.unit_cost
    FROM rc
    JOIN part p ON p.p_partkey = rc.l_partkey
    JOIN supplier s ON s.s_suppkey = rc.l_suppkey
    WHERE p.p_size BETWEEN 10 AND 30 AND p.p_type = 'STANDARD'
      AND rc.unit_cost = (SELECT MIN(rc2.unit_cost) FROM rc rc2
                          WHERE rc2.l_partkey = rc.l_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style: for each mid-size STANDARD part, the ASIA-region
    supplier(s) offering the minimum observed unit cost.

    The reference pattern is a correlated MIN subquery over partsupp;
    here lineitem plays the part<->supplier cost relation
    (unit cost = min extendedprice/quantity ever shipped). Decorrelated
    by hand into: per-(part,supplier) agg -> per-part MIN -> join back
    on (partkey, cost) — exactly the plan Catalyst rewrites the
    subquery into. Supplier/nation/region and part are bounded dims ->
    broadcast; the only big shuffle is the (partkey, suppkey) agg.
    MIN selects an existing IEEE double, so the equality join-back is
    engine-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    costs = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("unit_cost")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    rc = costs.join(
        F.broadcast(asia_supp), costs.l_suppkey == asia_supp.s_suppkey
    ).select("l_partkey", "l_suppkey", "unit_cost", "s_name", "s_acctbal")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 30) & (F.col("p_type") == "STANDARD")
    )
    min_cost = rc.groupBy(F.col("l_partkey").alias("mc_partkey")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        rc.join(
            min_cost,
            (rc.l_partkey == min_cost.mc_partkey)
            & (rc.unit_cost == min_cost.min_cost),
        )
        .join(F.broadcast(part), rc.l_partkey == part.p_partkey)
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_name").alias("supp_name"),
            F.col("s_acctbal").cast("double").alias("supp_acctbal"),
            F.col("unit_cost"),
        )
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(CAST(SUM(CASE WHEN ns.n_name = 'NATION_2'
                    THEN CAST(l_extendedprice AS DECIMAL(16,4))
                         * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
                / CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                           * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))))
                      AS DOUBLE)
               AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc  ON nc.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY year(o.o_orderdate)
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style: NATION_2's share of ASIA-region ECONOMY-part
    revenue per order year.

    Eight-relation join (nation twice). Conditional aggregation
    (CASE inside SUM) computes numerator and denominator in ONE pass —
    no second scan, no self-join. All dims broadcast; the
    lineitem<->orders chain is the only shuffle. Decimal sums on both
    engines; the final ratio is a double division of identical decimal
    sums, so it is bit-identical.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = nation.alias("nc")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = _rev()
    zero = F.lit(0).cast(DEC)
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nc), cust.c_nationkey == F.col("nc.n_nationkey"))
        .join(F.broadcast(region), F.col("nc.n_regionkey") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(ns), supp.s_nationkey == ns.ns_key)
    )
    return (
        joined.groupBy(
            F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(zero)
            ).alias("num_dec"),
            F.sum(rev).alias("den_dec"),
        )
        .select(
            "o_year",
            (
                F.col("num_dec").cast("double") / F.col("den_dec").cast("double")
            ).alias("mkt_share"),
        )
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit
# ---------------------------------------------------------------------------


@query(
    "q9_product_profit",
    oracle="""
    SELECT ns.n_name AS nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(16,4))
                    * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))
                    - CAST(p.p_retailprice AS DECIMAL(16,4))
                      * CAST(l.l_quantity AS DECIMAL(8,4))) AS DOUBLE)
               AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY ns.n_name, year(l.l_shipdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style: profit on widget parts by supplier nation and
    ship year. Profit = revenue - retailprice*quantity (the fixture has
    no partsupp.ps_supplycost; retail cost plays the supply-cost role).

    The LIKE filter prunes part before the broadcast; profit is a pure
    decimal expression — decimal(25,8) products, decimal(26,8)
    difference — summed identically by both engines, cast to double
    only at the boundary. One shuffle: the (nation, year) agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev() - _dec("p_retailprice") * F.col("l_quantity").cast(
        "decimal(8,4)"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q16 — supplier count by part descriptor (NOT IN -> anti-join)
# ---------------------------------------------------------------------------


@query(
    "q16_supplier_count",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 1000)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style: distinct supplier count per (brand, type, size)
    for qualifying parts, excluding low-balance ("complaint") suppliers.

    NOT IN over a non-nullable key decorrelates to a broadcast
    left-anti join — never a full-table NOT-IN scan. COUNT(DISTINCT)
    is the one agg Spark expands (distinct-first shuffle); the group
    key space is bounded (brand x type x 11 sizes), so the expansion
    is cheap at any scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
    )
    bad_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 1000)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 — suppliers over a shipped-quantity threshold (semi-join chain)
# ---------------------------------------------------------------------------


@query(
    "q20_qty_threshold_suppliers",
    oracle="""
    WITH ps AS (
        SELECT l.l_partkey, l.l_suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(16,4))) AS qty_dec
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    pt AS (SELECT l_partkey AS pt_key, SUM(qty_dec) AS total_dec
           FROM ps GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey AS suppkey, s.s_name AS supp_name,
           n.n_name AS nation
    FROM ps
    JOIN pt ON pt.pt_key = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE CAST(ps.qty_dec AS DOUBLE) > 0.3 * CAST(pt.total_dec AS DOUBLE)
    """,
)
def q20_qty_threshold_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style: suppliers who shipped more than 30% of a small
    part's 1997 volume (availqty-threshold analog; the fixture has no
    partsupp, so shipped quantity is the stock proxy).

    The correlated threshold subquery decorrelates into: one
    (part,supplier) agg -> per-part total (re-aggregated from the
    SMALL relation, not the fact table) -> join + filter -> DISTINCT
    semi into supplier. Part filter is broadcast and prunes the scan;
    decimal quantity sums keep the 0.3*total threshold engine-exact
    (double multiply of identical doubles on both sides).
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    ps = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
    )
    pt = ps.groupBy(F.col("l_partkey").alias("pt_key")).agg(
        F.sum("qty_dec").alias("total_dec")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        ps.join(pt, ps.l_partkey == pt.pt_key)
        .filter(
            F.col("qty_dec").cast("double")
            > F.lit(0.3) * F.col("total_dec").cast("double")
        )
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation"),
        )
        .distinct()
    )


# ---------------------------------------------------------------------------
# Q21 — the sole late supplier on multi-supplier orders
#        (EXISTS + NOT EXISTS via per-order stats)
# ---------------------------------------------------------------------------


@query(
    "q21_waiting_supplier",
    oracle="""
    WITH lines AS (
        SELECT l.l_orderkey, l.l_suppkey,
               CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                    THEN 1 ELSE 0 END AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
    ),
    stats AS (
        SELECT l_orderkey,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
                   AS n_late
        FROM lines GROUP BY l_orderkey
    )
    SELECT s.s_name AS supp_name,
           COUNT(DISTINCT li.l_orderkey) AS numwait
    FROM lines li
    JOIN stats st ON st.l_orderkey = li.l_orderkey
    JOIN supplier s ON s.s_suppkey = li.l_suppkey
    WHERE li.is_late = 1 AND st.n_supp > 1 AND st.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, supp_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style: suppliers who were the ONLY late shipper on a
    finished multi-supplier order ("late" = shipped >90 days after the
    order date; the fixture has no commit/receipt dates).

    Q21's EXISTS (another supplier on the order) + NOT EXISTS (another
    LATE supplier) is computed as per-order stats — one pass, one
    (orderkey) shuffle — instead of the textbook double lineitem
    self-join, which at 100 TB would be two extra fact-fact shuffles.
    Semantically identical: n_supp > 1 <=> EXISTS other supplier;
    n_late = 1 with this row late <=> NOT EXISTS other late supplier.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    lines = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            )
            .cast("int")
            .alias("is_late"),
        )
    )
    stats = lines.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        lines.filter(F.col("is_late") == 1)
        .join(stats, lines.l_orderkey == stats.st_orderkey)
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), lines.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("s_name").alias("supp_name"))
        .agg(F.count_distinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("supp_name"))
        .limit(20)
    )
