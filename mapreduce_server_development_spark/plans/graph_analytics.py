"""Graph-analytics depth queries over the part co-purchase graph:
synchronous label-propagation community detection, resource-allocation
link prediction, and item-item collaborative filtering.

No reference counterpart (the reference engine's data model is text
lines, SURVEY.md §1.2); all three are public-knowledge algorithms:

- **Label propagation** (Raghavan et al. 2007, "Near linear time
  algorithm to detect community structures in large-scale networks"):
  each vertex repeatedly adopts the most frequent label among its
  neighbors. We run the SYNCHRONOUS variant with a self-vote and a
  deterministic min-label tie-break, which makes every round a pure
  function of the previous label relation — reproducible across
  engines and partitionings (async LPA is order-dependent and cannot
  be oracle-checked).
- **Resource-allocation index** (Zhou, Lü, Zhang 2009, "Predicting
  missing links via local information"): for a non-adjacent pair
  (u, w), score = Σ_z 1/deg(z) over common neighbors z. Chosen over
  Adamic–Adar (1/ln deg) deliberately: 1/deg is exact in integer
  fixed point (``10^12 DIV deg``), so the score is bit-reproducible
  in both engines with no libm-log cross-engine risk.
- **Item-item CF** (Sarwar et al. 2001; Linden et al. 2003 Amazon
  item-to-item): cosine similarity between items' customer-incidence
  vectors. For binary baskets cos² = c(a,b)² / (pop(a)·pop(b)) is an
  exact rational — scored as ``1e6·c² DIV (pa·pb)`` so ranking needs
  no floats at all.

Scale posture (the 100 TB story, per family):

- LPA: each round is one neighbor-keyed equi-join plus two
  partial-agg'd shuffles; rounds are FIXED (4) and each round's label
  relation is localCheckpoint()ed so lineage stays O(1). The argmax
  is ``max(struct(count, -label))`` — a partial-aggregable exact-
  integer agg, never a per-vertex sort or window.
- RA link prediction: the wedge join through z is quadratic in
  deg(z), so hubs are EXCLUDED above ``_RA_DEG_CAP`` — the standard
  prune, and principled here because a hub's per-wedge weight 1/deg
  is the smallest in the graph (the dropped mass is the score floor,
  not the signal). The cap makes per-vertex wedge fan-out O(cap²)
  regardless of skew; the same rule is applied in the oracle, so the
  check is exact, not approximate.
- Item CF: pair generation is keyed by customer with fan-out bounded
  by ``_CF_BASKET_CAP`` (whale baskets excluded — the DIMSUM-style
  alternative is noted in SCALE.md); the per-item top-3 is a window
  PARTITIONED BY the high-cardinality item key (parallelism follows
  items, never one task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

# ---------------------------------------------------------------------------
# Shared co-purchase edge relation (same construction as q_triangle_count:
# parts linked when some order contains both).
# ---------------------------------------------------------------------------

def _edges_sql(min_support: int = 1) -> str:
    """CTE prefix defining e(a<b) and sym(src,dst) with a co-purchase
    support threshold (>= min_support orders containing both parts)."""
    return f"""
    po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
        SELECT a.l_partkey AS a, b.l_partkey AS b
        FROM po a JOIN po b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {min_support}
    ),
    sym AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e)
"""


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, min_support: int = 1
) -> DataFrame:
    """Distinct undirected co-purchase edges (a < b) with optional
    support threshold, checkpointed so both directions / degree / join
    consumers reuse one physical scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    po = li.select("l_orderkey", "l_partkey").distinct()
    return (
        po.alias("x")
        .join(po.alias("y"), "l_orderkey")
        .filter(F.col("x.l_partkey") < F.col("y.l_partkey"))
        .groupBy(
            F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b")
        )
        .agg(F.count("*").alias("sup"))
        .filter(F.col("sup") >= min_support)
        .select("a", "b")
        .localCheckpoint(eager=True)
    )


def _sym(e: DataFrame) -> DataFrame:
    return e.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        e.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


# ---------------------------------------------------------------------------
# q_label_propagation — synchronous LPA communities, 4 rounds
# ---------------------------------------------------------------------------

_LPA_ROUNDS = 4


def _lpa_oracle() -> str:
    parts = [f"WITH {_edges_sql(2)},",
             "l0 AS (SELECT DISTINCT src AS v, src AS lbl FROM sym)"]
    for r in range(1, _LPA_ROUNDS + 1):
        p = r - 1
        parts.append(f""",
    c{r} AS (
        SELECT v, lbl, SUM(c) AS c FROM (
            SELECT s.src AS v, l.lbl AS lbl, COUNT(*) AS c
            FROM sym s JOIN l{p} l ON l.v = s.dst
            GROUP BY 1, 2
            UNION ALL
            SELECT v, lbl, 1 FROM l{p}
        ) GROUP BY 1, 2
    ),
    l{r} AS (
        SELECT v, MIN(lbl) AS lbl FROM (
            SELECT v, lbl, c, MAX(c) OVER (PARTITION BY v) AS mc FROM c{r}
        ) WHERE c = mc GROUP BY v
    )""")
    parts.append(f""",
    fin AS (
        SELECT CAST(lbl AS BIGINT) AS community,
               CAST(COUNT(*) AS BIGINT) AS size
        FROM l{_LPA_ROUNDS} GROUP BY lbl
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_communities FROM fin)
    SELECT f.community, f.size, t.n_communities
    FROM fin f CROSS JOIN tot t
    ORDER BY f.size DESC, f.community LIMIT 10""")
    return "".join(parts)


@query("q_label_propagation", oracle=_lpa_oracle())
def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the support-2 co-purchase graph (parts
    co-bought in >= 2 orders, the same density filter q_kcore uses —
    the support-1 graph is near-complete and collapses to one
    community): 4 rounds of synchronous label propagation (self-vote,
    min-label tie-break), then the 10 largest communities plus the
    community count.

    Scale: each round = one dst-keyed equi-join (neighbor label
    lookup) + a (v, lbl)-keyed partial-agg count + a v-keyed
    ``max(struct(c, -lbl))`` argmax — all hash-partitioned on
    high-cardinality vertex keys; no windows, no per-vertex sort, no
    driver data. Rounds fixed at 4; labels localCheckpoint()ed
    per round so the plan never grows. The sync + deterministic
    tie-break variant is what makes the fixpoint a pure relation
    function (and hence DuckDB-oracle-checkable).
    """
    e = _copurchase_edges(spark, sf_dir, min_support=2)
    sym = _sym(e)
    labels = sym.select(F.col("src").alias("v")).distinct().select(
        "v", F.col("v").alias("lbl")
    )
    for rnd in range(1, _LPA_ROUNDS + 1):
        nbr_votes = (
            sym.join(labels.withColumnRenamed("v", "dst"), "dst")
            .select(F.col("src").alias("v"), "lbl")
            .groupBy("v", "lbl")
            .agg(F.count("*").alias("c"))
        )
        votes = nbr_votes.unionAll(
            labels.select("v", "lbl", F.lit(1).cast("long").alias("c"))
        )
        counts = votes.groupBy("v", "lbl").agg(F.sum("c").alias("c"))
        labels = (
            counts.groupBy("v")
            .agg(
                F.max(
                    F.struct(
                        F.col("c").alias("c"), (-F.col("lbl")).alias("nl")
                    )
                ).alias("m")
            )
            .select("v", (-F.col("m.nl")).alias("lbl"))
        )
        # Checkpoint every SECOND round: lineage stays O(1) but the
        # per-round materialization barrier (the dominant fixed cost —
        # an eager job per round) is halved. A/B at sf0.01: 14.0s
        # every-round -> see STATUS for the measured delta.
        if rnd % 2 == 0:
            labels = labels.localCheckpoint(eager=True)
    fin = labels.groupBy("lbl").agg(F.count("*").cast("long").alias("size"))
    tot = fin.agg(F.count("*").cast("long").alias("n_communities"))
    return (
        fin.select(F.col("lbl").cast("long").alias("community"), "size")
        .crossJoin(F.broadcast(tot))
        .orderBy(F.col("size").desc(), "community")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q_link_prediction — resource-allocation index, hub-capped, top 20
# ---------------------------------------------------------------------------

_RA_DEG_CAP = 64
_RA_SCALE = 10**12


@query(
    "q_link_prediction",
    oracle=f"""
    WITH {_edges_sql()},
    deg AS (SELECT src AS z, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY 1),
    mid AS (
        SELECT s.src AS z, s.dst AS u, d.d
        FROM sym s JOIN deg d ON d.z = s.src
        WHERE d.d BETWEEN 2 AND {_RA_DEG_CAP}
    ),
    wedge AS (
        SELECT m1.u AS u, m2.u AS w,
               CAST(COUNT(*) AS BIGINT) AS common_neighbors,
               CAST(SUM({_RA_SCALE} // m1.d) AS BIGINT) AS ra_score_e12
        FROM mid m1 JOIN mid m2 ON m1.z = m2.z AND m1.u < m2.u
        GROUP BY 1, 2
    ),
    cand AS (
        SELECT w.* FROM wedge w
        ANTI JOIN e ON e.a = w.u AND e.b = w.w
    )
    SELECT CAST(u AS BIGINT) AS part_a, CAST(w AS BIGINT) AS part_b,
           common_neighbors, ra_score_e12
    FROM cand
    ORDER BY ra_score_e12 DESC, part_a, part_b LIMIT 20
    """,
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: top-20 non-adjacent
    part pairs by the resource-allocation index Σ_z 1/deg(z) over
    common neighbors z (exact integer fixed point: 1e12 DIV deg).

    Scale: wedges are generated through the common neighbor z via a
    z-keyed self-join, so fan-out per z is deg(z)² — hubs above
    ``_RA_DEG_CAP`` (64) are excluded, which (a) bounds the join
    quadratically at cap² per vertex no matter how skewed the graph
    and (b) drops only the graph's smallest per-wedge weights (1/deg
    is minimal at hubs). Non-adjacency is a broadcast-able anti-join
    against the edge list on the pair key. Scoring never leaves exact
    integers, so cross-engine ranking ties are impossible except on
    true ties, which the (part_a, part_b) tie-break resolves.
    """
    e = _copurchase_edges(spark, sf_dir)
    sym = _sym(e)
    deg = sym.groupBy(F.col("src").alias("z")).agg(
        F.count("*").cast("long").alias("d")
    )
    mid = (
        sym.join(deg, sym["src"] == deg["z"])
        .filter((F.col("d") >= 2) & (F.col("d") <= _RA_DEG_CAP))
        .select("z", F.col("dst").alias("u"), "d")
    )
    m1, m2 = mid.alias("m1"), mid.alias("m2")
    wedge = (
        m1.join(m2, (F.col("m1.z") == F.col("m2.z")) & (F.col("m1.u") < F.col("m2.u")))
        .select(
            F.col("m1.u").alias("u"),
            F.col("m2.u").alias("w"),
            F.col("m1.d").alias("d"),
        )
        .groupBy("u", "w")
        .agg(
            F.count("*").cast("long").alias("common_neighbors"),
            F.sum(F.expr(f"{_RA_SCALE} DIV d")).cast("long").alias("ra_score_e12"),
        )
    )
    cand = wedge.join(
        e,
        (wedge["u"] == e["a"]) & (wedge["w"] == e["b"]),
        "left_anti",
    )
    return (
        cand.select(
            F.col("u").cast("long").alias("part_a"),
            F.col("w").cast("long").alias("part_b"),
            "common_neighbors",
            "ra_score_e12",
        )
        .orderBy(F.col("ra_score_e12").desc(), "part_a", "part_b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q_item_cf — item-item cosine² top-3 neighbors per part
# ---------------------------------------------------------------------------

_CF_BASKET_CAP = 256
_CF_TOPK = 3
_CF_MIN_SUPPORT = 2  # classic min-support: singleton co-occurrences are noise


@query(
    "q_item_cf",
    oracle=f"""
    WITH bought AS (
        SELECT DISTINCT o.o_custkey AS cust, l.l_partkey AS part
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    basket_sz AS (
        SELECT cust, COUNT(*) AS n FROM bought GROUP BY cust
    ),
    kept AS (
        SELECT b.cust, b.part FROM bought b
        JOIN basket_sz s ON s.cust = b.cust AND s.n <= {_CF_BASKET_CAP}
    ),
    pop AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS p FROM kept GROUP BY part),
    pairs AS (
        SELECT x.part AS pa, y.part AS pb, CAST(COUNT(*) AS BIGINT) AS c
        FROM kept x JOIN kept y ON x.cust = y.cust AND x.part < y.part
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CF_MIN_SUPPORT}
    ),
    scored AS (
        SELECT pr.pa, pr.pb, pr.c,
               ((1000000 * pr.c // pa_pop.p) * pr.c) // pb_pop.p AS cos2_e6
        FROM pairs pr
        JOIN pop pa_pop ON pa_pop.part = pr.pa
        JOIN pop pb_pop ON pb_pop.part = pr.pb
    ),
    both_dirs AS (
        SELECT pa AS item, pb AS neighbor, c, cos2_e6 FROM scored
        UNION ALL
        SELECT pb, pa, c, cos2_e6 FROM scored
    ),
    ranked AS (
        SELECT item, neighbor, c, cos2_e6,
               ROW_NUMBER() OVER (
                   PARTITION BY item
                   ORDER BY cos2_e6 DESC, c DESC, neighbor
               ) AS rk
        FROM both_dirs
    )
    SELECT CAST(item AS BIGINT) AS item, CAST(neighbor AS BIGINT) AS neighbor,
           c AS common_customers, CAST(cos2_e6 AS BIGINT) AS cos2_e6,
           CAST(rk AS INTEGER) AS rk
    FROM ranked WHERE rk <= {_CF_TOPK}
    ORDER BY item, rk
    """,
)
def q_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering: for every part, its top-3
    most-similar parts by cosine² between customer-incidence vectors
    (exact rational ``1e6·c² DIV (pop_a·pop_b)`` — float-free ranking).

    Scale: pair generation is keyed by customer, with whale baskets
    (> 256 distinct parts) excluded so per-customer fan-out is
    bounded at cap² — the deterministic analogue of DIMSUM sampling
    (noted in SCALE.md). Popularities and pair counts are partial-agg
    shuffles on item keys; the top-3 is a window PARTITIONED BY the
    high-cardinality item key (parallelism follows items). Integer
    scoring means Spark and DuckDB rank identically with the
    (cos2 desc, c desc, neighbor) tie-break. The score is computed as
    ``(1e6·c DIV pa)·c DIV pb`` — c ≤ min(pa, pb) keeps every
    intermediate ≤ 1e6·c, int64-safe even at 1e10 customers (a naive
    1e6·c² overflows there); both engines truncate identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    bought = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select(F.col("o_custkey").alias("cust"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    sz = bought.groupBy("cust").agg(F.count("*").alias("n"))
    kept = (
        bought.join(sz, "cust")
        .filter(F.col("n") <= _CF_BASKET_CAP)
        .select("cust", "part")
        .localCheckpoint(eager=True)
    )
    pop = kept.groupBy("part").agg(F.count("*").cast("long").alias("p"))
    x, y = kept.alias("x"), kept.alias("y")
    pairs = (
        x.join(y, (F.col("x.cust") == F.col("y.cust")) & (F.col("x.part") < F.col("y.part")))
        .groupBy(F.col("x.part").alias("pa"), F.col("y.part").alias("pb"))
        .agg(F.count("*").cast("long").alias("c"))
        # Min-support prune (c >= 2): singleton co-occurrences are CF
        # noise AND 97% of the pair relation (12.7M -> 413k at sf0.1)
        # — dropping them shrinks the scoring joins and the per-item
        # ranking window 30x. Applied identically in the oracle.
        .filter(F.col("c") >= _CF_MIN_SUPPORT)
    )
    scored = (
        pairs.join(pop.withColumnRenamed("part", "pa").withColumnRenamed("p", "p_a"), "pa")
        .join(pop.withColumnRenamed("part", "pb").withColumnRenamed("p", "p_b"), "pb")
        .select(
            "pa",
            "pb",
            "c",
            F.expr("((1000000 * c DIV p_a) * c) DIV p_b").alias("cos2_e6"),
        )
    )
    both = scored.select(
        F.col("pa").alias("item"), F.col("pb").alias("neighbor"), "c", "cos2_e6"
    ).unionAll(
        scored.select(
            F.col("pb").alias("item"), F.col("pa").alias("neighbor"), "c", "cos2_e6"
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("item").orderBy(
        F.col("cos2_e6").desc(), F.col("c").desc(), "neighbor"
    )
    return (
        both.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CF_TOPK)
        .select(
            F.col("item").cast("long").alias("item"),
            F.col("neighbor").cast("long").alias("neighbor"),
            F.col("c").alias("common_customers"),
            F.col("cos2_e6").cast("long").alias("cos2_e6"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("item", "rk")
    )
