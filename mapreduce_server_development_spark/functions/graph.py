"""Iterative graph analytics: fixed-point integer PageRank.

Rank propagation over a document graph (near-dup edges, link edges,
citation edges) is the standard way to turn graph structure into
per-document quality weights for corpus curation. The float
formulation is NOT reproducible across engines (summation order), so
ranks here live in integer MICRO-units with floor division everywhere:

    r_0(v)   = 1_000_000
    r_k(v)   = BASE + (damping_pct * inflow_k(v)) div 100
    inflow_k = sum over in-neighbors u of  r_{k-1}(u) div deg(u)
    BASE     = (100 - damping_pct) * 1_000_000 div 100

Every operation is exact integer arithmetic — any engine reproduces
the ranks bit-for-bit (the repo's fixed-point oracle pattern). Mass is
only approximately conserved (floors shave remainders); that is part
of the operator's defined semantics, not an accuracy bug.

Scale posture: each round is one (edges ⋈ degrees ⋈ ranks) join plus a
destination-keyed sum — two shuffles, the same per-round cost as
connected components — with ``localCheckpoint`` per round to keep the
plan O(1) in the iteration count. Rank values stay ~10^6-scale, so the
BIGINT inflow sum is safe past 10^12 nodes. Fixed iteration count (no
convergence probe): deterministic output, bounded wall-clock.

Public-knowledge algorithm (Brin/Page 1998); no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: One unit of rank mass, in micro-units.
RANK_SCALE = 1_000_000


def pagerank_micro(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    damping_pct: int = 85,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Fixed-point PageRank. ``nodes(node)``, ``edges(a, b)`` undirected
    (symmetrized here) → ``(node, rank_micro)``.

    ``damping_pct`` is an integer percentage (85 = the classic 0.85)
    so the damping step stays in integer arithmetic.
    ``checkpoint_every`` trades lineage depth against materialization
    overhead: a checkpoint every round costs ~2x the wall-clock of one
    every 3 rounds (measured), while 3 rounds of lineage (6 joins) is
    still trivially analyzable — unlike an unbounded plan.
    """
    base = (100 - damping_pct) * RANK_SCALE // 100
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    r = nodes.select(
        "node", F.lit(RANK_SCALE).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for k in range(iters):
        contrib = (
            sym.join(deg, "src")
            .join(r, sym.src == r.node)
            .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            )
            .cast("long")
            .alias("r"),
        )
        if (k + 1) % checkpoint_every == 0 or k == iters - 1:
            r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("rank_micro"))


def orient_edges_by_degree(e: DataFrame) -> DataFrame:
    """Orient each undirected canonical edge (a < b) from its
    (degree, id)-smaller endpoint to the larger — the classic
    preparation for triangle counting (Schank/Wagner; MapReduce form
    in Suri & Vassilvitskii, "Counting Triangles and the Curse of the
    Last Reducer", WWW'11 — public knowledge): after orientation every
    vertex's OUT-degree is O(sqrt(m)), bounding the wedge self-join
    regardless of raw hub degrees.

    Returns (u, v, dv): edge oriented u -> v with dv = degree(v).
    The (degree, id) order is compared column-wise — never packed into
    one integer, which would overflow once degree * id_range passes
    2^63 (a hub with 2^23 neighbors at 40-bit ids would wrap).
    """
    sym = e.select(F.col("a").alias("x")).unionAll(
        e.select(F.col("b").alias("x"))
    )
    deg = sym.groupBy("x").agg(F.count("*").alias("d"))
    ke = e.join(
        deg.select(F.col("x").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("x").alias("b"), F.col("d").alias("db")), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    return ke.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )


def count_triangles(e: DataFrame) -> DataFrame:
    """Exact triangle count of the undirected graph given as canonical
    edges (a < b, deduplicated): 1-row DataFrame with column ``t``.

    Each triangle has exactly one vertex with out-edges to the other
    two under the degree orientation, and its third edge appears in
    the oriented list in exactly one direction — so wedges (two
    out-edges of one vertex, ordered by the oriented (degree, id)
    order to avoid double counting) equi-joined against the oriented
    edges count every triangle once.
    """
    oriented = orient_edges_by_degree(e).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    lex = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    wedges = (
        o1.join(o2, "u")
        .filter(lex)
        .select(F.col("o1.v").alias("wa"), F.col("o2.v").alias("wb"))
    )
    closing = oriented.select(F.col("u").alias("wa"), F.col("v").alias("wb"))
    return wedges.join(closing, ["wa", "wb"]).agg(F.count("*").alias("t"))


def triangles_per_vertex(e: DataFrame) -> DataFrame:
    """Per-vertex triangle counts (x, t) of the undirected graph given
    as canonical edges (a < b, deduplicated); vertices in no triangle
    are absent.

    Same degree-oriented wedge join as :func:`count_triangles` (each
    triangle materialized exactly once), then every found triangle is
    exploded to its three corners and hash-counted per vertex — the
    per-node generalization at the same O(m^{3/2}) wedge bound.
    """
    oriented = orient_edges_by_degree(e).localCheckpoint(eager=True)
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    lex = (F.col("o1.dv") < F.col("o2.dv")) | (
        (F.col("o1.dv") == F.col("o2.dv")) & (F.col("o1.v") < F.col("o2.v"))
    )
    wedges = (
        o1.join(o2, "u")
        .filter(lex)
        .select("u", F.col("o1.v").alias("wa"), F.col("o2.v").alias("wb"))
    )
    closing = oriented.select(F.col("u").alias("wa"), F.col("v").alias("wb"))
    tri = wedges.join(closing, ["wa", "wb"])
    corners = tri.select(
        F.explode(F.array(F.col("u"), F.col("wa"), F.col("wb"))).alias("x")
    )
    return corners.groupBy("x").agg(F.count("*").cast("long").alias("t"))


def personalized_pagerank_micro(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 8,
    damping_pct: int = 85,
    checkpoint_every: int = 3,
    seed_col: str = "is_seed",
) -> DataFrame:
    """Fixed-point PERSONALIZED PageRank (random walk with restart):
    the teleport mass returns only to the seed set, so rank measures
    proximity to the seeds instead of global centrality (Jeh & Widom
    2003, "Scaling Personalized Web Search" — public knowledge).

    ``nodes(node, is_seed in {0,1})``, ``edges(a, b)`` undirected →
    ``(node, ppr_micro)``. Same integer micro-unit / floor-division
    discipline as :func:`pagerank_micro`:

        r_0(v) = 1_000_000 * is_seed(v)
        r_k(v) = is_seed(v) * BASE + (damping_pct * inflow_k(v)) div 100

    Non-seed nodes with no inflow stay at exactly 0 — PPR's defining
    sparsity, which also keeps the per-round join volume bounded by
    the seed set's reachable frontier in early rounds.
    """
    base = (100 - damping_pct) * RANK_SCALE // 100
    sym = (
        edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("src").agg(F.count("*").alias("deg"))
    seeds = nodes.select("node", F.col(seed_col).cast("long").alias("sd"))
    r = seeds.select(
        "node", (F.lit(RANK_SCALE) * F.col("sd")).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for k in range(iters):
        contrib = (
            sym.join(deg, "src")
            .join(r, sym.src == r.node)
            .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
        )
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = seeds.join(inflow, "node", "left").select(
            "node",
            (
                F.lit(base) * F.col("sd")
                + F.expr(f"({damping_pct} * coalesce(s, 0L)) div 100")
            )
            .cast("long")
            .alias("r"),
        )
        if (k + 1) % checkpoint_every == 0 or k == iters - 1:
            r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("ppr_micro"))
